"""Streaming heavy-hitters: the streaming twin of
`operators.textstats.q_sketch_countmin_heavy_hitters` — each micro-batch
contributes (a) a tiny count-min cell table and (b) its own exact top
candidate keys, and the running "heaviest keys so far" answer estimates
the merged candidate set against the SUM-merged cells.

Why this shape (the hll_stream discipline, applied to a frequency
sketch):

  * the D x W cell table is MERGEABLE BY SUM — partial cell counts from
    any partitioning of the stream add up to the union's cells, the
    property that lets a 100 TB ingest maintain one tiny table per
    batch/day and fold them at read time;
  * writes are idempotent BY CONSTRUCTION: a batch's cells/candidates
    are pure functions of the batch's rows, and each batch overwrites
    its own `batch_id=N` directory, so checkpoint replay rewrites
    identical bytes (sum-merge reads each batch directory once, so a
    replay cannot double-count);
  * candidate tracking is the standard practical compromise
    (Space-Saving-flavored): the CELLS are exact mergeable sums, so any
    candidate's estimate is exact count-min semantics (never an
    undercount); the CANDIDATE SET is the union of per-batch exact
    top-CAND_M keys, so a key that is never near the top of ANY batch
    can be missed — the documented recall caveat every practical
    streaming heavy-hitter system (CMS + heap) carries. A key's
    reported estimate does NOT depend on when it entered the candidate
    set (estimates come from the cells, not the candidate counts).

Cell/hash definitions are IDENTICAL to the batch op (CMS_D x CMS_W,
portable hash, same per-row salts), so a candidate's streaming estimate
equals the batch op's estimate over the same union of rows — pinned in
tests/test_cms_stream.py.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.hashing import portable_hash
from ..operators.textstats import CMS_D, CMS_TOP, CMS_W
from .fsio import FSIO, LocalFS, fs_for_path

#: per-batch exact top-M candidate keys kept (recall knob: larger M
#: catches keys that are heavy overall but diluted within single batches)
CAND_M = 4 * CMS_TOP


def _cell_keys(key_col: str) -> list[F.Column]:
    """The D cell ids a key hashes to — bit-identical to the batch op."""
    return [
        (
            F.lit(d * CMS_W)
            + portable_hash(F.concat(F.lit(f"cms{d}:"), F.col(key_col))) % CMS_W
        )
        for d in range(CMS_D)
    ]


class StreamingCountMin:
    """foreachBatch sink maintaining per-batch CMS cell + candidate
    partitions under two sibling directories."""

    def __init__(
        self,
        state_path: str,
        key_col: str = "token",
        compact_every: int = 16,
        fs: FSIO | None = None,
    ) -> None:
        self.cells_path = posixpath.join(state_path, "cells")
        self.cands_path = posixpath.join(state_path, "cands")
        self.key_col = key_col
        self.compact_every = compact_every
        #: fsio seam — LocalFS for plain paths, HadoopFS resolved lazily
        #: for URI-scheme paths (needs the SparkSession's JVM gateway)
        self.fs = fs if fs is not None else (
            LocalFS() if "://" not in state_path else None
        )

    # ---------------------------------------------------------- per batch

    def _batch_cells(self, batch_df: DataFrame) -> DataFrame:
        keyed = batch_df.select(F.col(self.key_col).cast("string").alias("k"))
        return (
            keyed.select(F.explode(F.array(*_cell_keys("k"))).alias("cell"))
            .groupBy("cell")
            .agg(F.count("*").alias("cnt"))
        )

    def _batch_cands(self, batch_df: DataFrame) -> DataFrame:
        keyed = batch_df.select(F.col(self.key_col).cast("string").alias("k"))
        return (
            keyed.groupBy("k")
            .agg(F.count("*").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("k").asc())
            .limit(CAND_M)
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if self.fs is None:
            self.fs = fs_for_path(spark, self.cells_path)
        self._batch_cells(batch_df).coalesce(1).write.mode("overwrite").parquet(
            posixpath.join(self.cells_path, f"batch_id={batch_id}")
        )
        self._batch_cands(batch_df).coalesce(1).write.mode("overwrite").parquet(
            posixpath.join(self.cands_path, f"batch_id={batch_id}")
        )
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            self._compact(spark, batch_id)

    # ---------------------------------------------------------- compaction

    def _compact(self, spark: SparkSession, current_batch_id: int) -> None:
        """Sum-merge every partition OLDER than the current batch into the
        oldest one (cells: exact; candidates: exact union of the kept
        keys — NOT re-pruned, so compaction never loses a key that some
        batch promoted).

        Replay safety differs from the HLL/dedup compactions because SUM
        is NOT duplicate-insensitive, so a same-batch_id replay after a
        mid-compaction crash must neither re-read its own prior output
        nor recompute from half-deleted sources:

          * the merge read EXCLUDES this run's own ``compact-<id>-*``
            files (a crashed prior attempt's output is stale state, not
            a source — folding it in would double-count every cell);
            older-generation compact files in the target ARE legitimate
            sources and are included;
          * publication is a single atomic rename (the merged output is
            ``coalesce(1)``, so exactly one parquet file) into a
            deterministic destination name, overwriting any stale
            same-id output byte-for-byte;
          * a ``_compact-<id>.committed`` marker is created only AFTER
            publication and all source deletions happen only AFTER the
            marker, so a replay either recomputes from fully-intact
            sources (no marker → nothing was deleted) or, seeing the
            marker, skips the merge and just finishes the idempotent
            cleanup (the published sum already covers every superseded
            file)."""
        fs = self.fs
        for path, keycols in (
            (self.cells_path, ("cell",)),
            (self.cands_path, ("k",)),
        ):
            old = sorted(
                (int(d.split("=", 1)[1]), fs.join(path, d))
                for d in fs.list_dirs(path)
                if d.startswith("batch_id=")
                and int(d.split("=", 1)[1]) < current_batch_id
            )
            if not old:
                continue
            target_id, target_dir = old[0]
            own_prefix = f"compact-{current_batch_id}-"
            marker = fs.join(
                target_dir, f"_compact-{current_batch_id}.committed"
            )
            if fs.exists(marker):
                self._finish_cleanup(old, target_dir, own_prefix, marker)
                continue
            if len(old) <= 1:
                continue
            src_files = [
                fs.join(p, f)
                for _, p in old
                for f in fs.list_files(p)
                if f.endswith(".parquet")
                and not f.startswith(".")
                and not f.startswith(own_prefix)
            ]
            merged = (
                spark.read.option("basePath", path)
                .parquet(*src_files)
                .drop("batch_id")
                .groupBy(*keycols)
                .agg(F.sum("cnt").alias("cnt"))
            )
            tmp = fs.join(path, f".compact-{current_batch_id}")
            merged.coalesce(1).write.mode("overwrite").parquet(tmp)
            parts = [
                f
                for f in fs.list_files(tmp)
                if f.endswith(".parquet") and not f.startswith(".")
            ]
            for i, fname in enumerate(parts):
                fs.rename_overwrite(
                    fs.join(tmp, fname),
                    fs.join(target_dir, f"{own_prefix}{i:05d}.parquet"),
                )
            fs.rmtree(tmp)
            fs.write_text_atomic(marker, "committed\n")
            self._finish_cleanup(old, target_dir, own_prefix, marker)

    def _finish_cleanup(
        self, old: list[tuple[int, str]], target_dir: str, own_prefix: str, marker: str
    ) -> None:
        """Idempotent post-publication sweep: retire every source the
        published compact generation already covers (older batch dirs,
        superseded files in the target, stale older markers), then the
        marker itself. Safe to re-run after a crash at any point."""
        fs = self.fs
        marker_name = fs.basename(marker)
        for _, p in old[1:]:
            fs.rmtree(p)
        for f in fs.list_files(target_dir):
            if f.startswith("."):
                continue
            if f.startswith(own_prefix) or f == marker_name:
                continue
            fs.remove(fs.join(target_dir, f))
        if fs.exists(marker):
            fs.remove(marker)

    # ---------------------------------------------------------- read side

    def cells(self, spark: SparkSession) -> DataFrame:
        """The SUM-merged D x W cell table over everything streamed."""
        return (
            spark.read.parquet(self.cells_path)
            .groupBy("cell")
            .agg(F.sum("cnt").alias("cnt"))
        )

    def heavy_hitters(self, spark: SparkSession, k: int = CMS_TOP) -> DataFrame:
        """Top-k candidate keys by their count-min estimate against the
        merged cells (min over the D hashed cells — never an
        undercount), with the candidate lower bound attached."""
        cands = (
            spark.read.parquet(self.cands_path)
            .groupBy("k")
            .agg(F.sum("cnt").alias("seen_cnt"))
        )
        cm = self.cells(spark).agg(
            F.map_from_entries(F.collect_list(F.struct("cell", "cnt"))).alias("cm")
        )
        est = F.least(
            *[F.element_at("cm", c) for c in _cell_keys("k")]
        )
        return (
            cands.crossJoin(F.broadcast(cm))
            .select(
                F.col("k").alias(self.key_col),
                "seen_cnt",
                est.alias("cms_estimate"),
            )
            .orderBy(F.col("cms_estimate").desc(), F.col(self.key_col).asc())
            .limit(k)
        )


def heavy_hitters_sink(
    rows: DataFrame,
    state_path: str,
    checkpoint: str,
    key_col: str = "token",
    compact_every: int = 16,
) -> StreamingQuery:
    """Attach the count-min heavy-hitters sink to a stream of keyed rows."""
    sink = StreamingCountMin(state_path, key_col, compact_every)
    return (
        rows.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
