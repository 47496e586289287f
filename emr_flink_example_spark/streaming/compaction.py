"""Small-file compaction for partitioned parquet layouts.

The reference declares `sink.partition-commit... auto-compaction='true'` but
the feature is non-functional in its Flink version (Kafka2S3Hive.scala:107,
comment :87). Here it is a working periodic batch job: find leaf partition
directories whose parquet files are smaller/more numerous than the target,
rewrite them coalesced, and swap atomically (write-then-rename).

Scale notes: each partition compacts independently — schedule the job over
recently-committed partitions only (the commit ledger from
partition_commit.py gives exactly that list), so cost tracks ingest rate,
not table size. The rewrite itself is a single narrow `coalesce` (no
shuffle): files are combined within the partition, never moved across
partitions. On an object store, replace the directory swap with a
manifest/metastore location flip.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024  # ≙ sink.rolling-policy.file-size


@dataclass
class CompactionStats:
    partition_dir: str
    files_before: int
    files_after: int
    bytes_total: int
    compacted: bool


def _leaf_parquet_dirs(root: str) -> list[str]:
    leaves = []
    for dirpath, _dirnames, filenames in os.walk(root):
        if any(f.endswith(".parquet") for f in filenames):
            leaves.append(dirpath)
    return sorted(leaves)


def _parquet_files(d: str) -> list[str]:
    return [os.path.join(d, f) for f in os.listdir(d) if f.endswith(".parquet")]


def compact_partition(
    spark: SparkSession,
    partition_dir: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> CompactionStats:
    """Rewrite one partition directory's parquet files coalesced to the
    target size. No-op when already at/below the ideal file count."""
    files = _parquet_files(partition_dir)
    total = sum(os.path.getsize(f) for f in files)
    ideal = max(1, math.ceil(total / target_file_bytes))
    if len(files) <= ideal:
        return CompactionStats(partition_dir, len(files), len(files), total, False)

    tmp = os.path.join(
        os.path.dirname(partition_dir.rstrip("/")),
        f".compact-{uuid.uuid4().hex[:8]}",
    )
    (
        spark.read.parquet(partition_dir)
        .coalesce(ideal)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    new_files = _parquet_files(tmp)
    # swap: old data files out, compacted files in (same directory path, so
    # catalog partition locations stay valid)
    for f in files:
        os.remove(f)
    for f in new_files:
        shutil.move(f, os.path.join(partition_dir, os.path.basename(f)))
    shutil.rmtree(tmp, ignore_errors=True)
    return CompactionStats(partition_dir, len(files), len(new_files), total, True)


def compact_path(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> list[CompactionStats]:
    """Compact every leaf partition directory under `root`."""
    return [
        compact_partition(spark, d, target_file_bytes) for d in _leaf_parquet_dirs(root)
    ]


def compact_partition_atomic(
    spark: SparkSession,
    partition_dir: str,
    gen: int,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
) -> CompactionStats:
    """Crash-safe, replay-idempotent variant of `compact_partition` for use
    INSIDE a streaming foreachBatch (PartitionCommitter auto-compaction),
    where a checkpoint replay re-runs the same `gen` after any crash point.

    Protocol (the cms_stream compaction discipline):
      * sources are every data file NOT belonging to this generation —
        a crashed attempt's own ``compacted-<gen>-*`` output is stale
        state, never an input (older generations' compacted files ARE
        legitimate sources);
      * the coalesced rewrite publishes via deterministic
        ``compacted-<gen>-<i>.parquet`` renames, overwriting stale
        same-gen output byte-for-byte (sources unchanged -> same ideal
        file count -> same names);
      * a ``_compact-<gen>.committed`` marker (listing the kept names) is
        written only AFTER publication, and source deletion happens only
        AFTER the marker — so a replay either recomputes from intact
        sources (no marker) or just finishes the recorded cleanup.
    """
    own_prefix = f"compacted-{gen}-"
    marker = os.path.join(partition_dir, f"_compact-{gen}.committed")
    if os.path.exists(marker):
        keep = set(open(marker).read().split())
        _finish_compact(partition_dir, keep, marker)
        kept = _parquet_files(partition_dir)
        total = sum(os.path.getsize(f) for f in kept)
        return CompactionStats(partition_dir, len(keep), len(keep), total, True)

    files = [
        f for f in _parquet_files(partition_dir)
        if not os.path.basename(f).startswith(own_prefix)
    ]
    total = sum(os.path.getsize(f) for f in files)
    ideal = max(1, math.ceil(total / target_file_bytes))
    if len(files) <= ideal:
        return CompactionStats(partition_dir, len(files), len(files), total, False)

    tmp = os.path.join(
        os.path.dirname(partition_dir.rstrip("/")), f".compact-{gen}"
    )
    (
        spark.read.parquet(*files)
        .coalesce(ideal)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    new_files = sorted(_parquet_files(tmp))
    keep = set()
    for i, f in enumerate(new_files):
        name = f"{own_prefix}{i:05d}.parquet"
        os.replace(f, os.path.join(partition_dir, name))
        keep.add(name)
    shutil.rmtree(tmp, ignore_errors=True)
    mtmp = marker + ".tmp"
    with open(mtmp, "w") as fh:
        fh.write("\n".join(sorted(keep)))
    os.replace(mtmp, marker)
    _finish_compact(partition_dir, keep, marker)
    return CompactionStats(partition_dir, len(files), len(keep), total, True)


def _finish_compact(partition_dir: str, keep: set[str], marker: str) -> None:
    """Idempotent post-publication sweep: remove every data file the
    published generation superseded, then the marker."""
    for f in os.listdir(partition_dir):
        fp = os.path.join(partition_dir, f)
        if not os.path.isfile(fp) or f.startswith(".") or f.startswith("_"):
            continue
        if f not in keep:
            os.remove(fp)
    if os.path.exists(marker):
        os.remove(marker)
