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
partitions. All file operations go through the `fsio.FSIO` seam, so the
same protocol runs on local disk (`LocalFS`) or any Hadoop FileSystem
(`HadoopFS` — HDFS/S3A/file://); on stores whose rename is
delete+rename, the deterministic `compacted-<gen>-<i>` names plus the
`_compact-<gen>.committed` marker keep the protocol replay-safe (see
fsio module docstring).
"""

from __future__ import annotations

import math
import uuid
from dataclasses import dataclass

from pyspark.sql import SparkSession

from .fsio import FSIO, LocalFS

DEFAULT_TARGET_FILE_BYTES = 128 * 1024 * 1024  # ≙ sink.rolling-policy.file-size


@dataclass
class CompactionStats:
    partition_dir: str
    files_before: int
    files_after: int
    bytes_total: int
    compacted: bool


def _leaf_parquet_dirs(fs: FSIO, root: str) -> list[str]:
    return sorted(
        d
        for d, files in fs.walk_files(root)
        if any(f.endswith(".parquet") for f in files)
    )


def _parquet_files(fs: FSIO, d: str) -> list[str]:
    return [
        fs.join(d, f) for f in fs.list_files(d) if f.endswith(".parquet")
    ]


def compact_partition(
    spark: SparkSession,
    partition_dir: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    fs: FSIO | None = None,
) -> CompactionStats:
    """Rewrite one partition directory's parquet files coalesced to the
    target size. No-op when already at/below the ideal file count."""
    fs = fs or LocalFS()
    files = _parquet_files(fs, partition_dir)
    total = sum(fs.size(f) for f in files)
    ideal = max(1, math.ceil(total / target_file_bytes))
    if len(files) <= ideal:
        return CompactionStats(partition_dir, len(files), len(files), total, False)

    tmp = fs.join(
        fs.parent(partition_dir), f".compact-{uuid.uuid4().hex[:8]}"
    )
    (
        spark.read.parquet(partition_dir)
        .coalesce(ideal)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    new_files = _parquet_files(fs, tmp)
    # swap: old data files out, compacted files in (same directory path, so
    # catalog partition locations stay valid)
    for f in files:
        fs.remove(f)
    for f in new_files:
        fs.rename_overwrite(f, fs.join(partition_dir, fs.basename(f)))
    fs.rmtree(tmp)
    return CompactionStats(partition_dir, len(files), len(new_files), total, True)


def compact_path(
    spark: SparkSession,
    root: str,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    fs: FSIO | None = None,
) -> list[CompactionStats]:
    """Compact every leaf partition directory under `root`."""
    fs = fs or LocalFS()
    return [
        compact_partition(spark, d, target_file_bytes, fs=fs)
        for d in _leaf_parquet_dirs(fs, root)
    ]


def compact_partition_atomic(
    spark: SparkSession,
    partition_dir: str,
    gen: int,
    target_file_bytes: int = DEFAULT_TARGET_FILE_BYTES,
    fs: FSIO | None = None,
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
    fs = fs or LocalFS()
    own_prefix = f"compacted-{gen}-"
    marker = fs.join(partition_dir, f"_compact-{gen}.committed")
    if fs.exists(marker):
        keep = set(fs.read_text(marker).split())
        _finish_compact(fs, partition_dir, keep, marker)
        kept = _parquet_files(fs, partition_dir)
        total = sum(fs.size(f) for f in kept)
        return CompactionStats(partition_dir, len(keep), len(keep), total, True)

    files = [
        f
        for f in _parquet_files(fs, partition_dir)
        if not fs.basename(f).startswith(own_prefix)
    ]
    total = sum(fs.size(f) for f in files)
    ideal = max(1, math.ceil(total / target_file_bytes))
    if len(files) <= ideal:
        return CompactionStats(partition_dir, len(files), len(files), total, False)

    tmp = fs.join(fs.parent(partition_dir), f".compact-{gen}")
    (
        spark.read.parquet(*files)
        .coalesce(ideal)
        .write.mode("overwrite")
        .parquet(tmp)
    )
    new_files = sorted(_parquet_files(fs, tmp))
    keep = set()
    for i, f in enumerate(new_files):
        name = f"{own_prefix}{i:05d}.parquet"
        fs.rename_overwrite(f, fs.join(partition_dir, name))
        keep.add(name)
    fs.rmtree(tmp)
    fs.write_text_atomic(marker, "\n".join(sorted(keep)))
    _finish_compact(fs, partition_dir, keep, marker)
    return CompactionStats(partition_dir, len(files), len(keep), total, True)


def _finish_compact(
    fs: FSIO, partition_dir: str, keep: set[str], marker: str
) -> None:
    """Idempotent post-publication sweep: remove every data file the
    published generation superseded, then the marker."""
    for f in fs.list_files(partition_dir):
        if f.startswith(".") or f.startswith("_"):
            continue
        if f not in keep:
            fs.remove(fs.join(partition_dir, f))
    if fs.exists(marker):
        fs.remove(marker)
