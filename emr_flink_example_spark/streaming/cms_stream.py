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

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.hashing import portable_hash
from ..operators.textstats import CMS_D, CMS_TOP, CMS_W

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
        self, state_path: str, key_col: str = "token", compact_every: int = 16
    ) -> None:
        self.cells_path = os.path.join(state_path, "cells")
        self.cands_path = os.path.join(state_path, "cands")
        self.key_col = key_col
        self.compact_every = compact_every

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
        self._batch_cells(batch_df).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.cells_path, f"batch_id={batch_id}")
        )
        self._batch_cands(batch_df).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(self.cands_path, f"batch_id={batch_id}")
        )
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            self._compact(spark, batch_id)

    # ---------------------------------------------------------- compaction

    def _compact(self, spark: SparkSession, current_batch_id: int) -> None:
        """Sum-merge every partition OLDER than the current batch into the
        oldest one (cells: exact; candidates: exact union of the kept
        keys — NOT re-pruned, so compaction never loses a key that some
        batch promoted). Crash ordering identical to the HLL/ES
        compactions: publish into the visible target via per-file
        renames BEFORE deleting any source; this run's own rename
        destinations are excluded from the superseded sweep so a
        same-batch_id replay cannot delete its own output."""
        for path, keycols in (
            (self.cells_path, ("cell",)),
            (self.cands_path, ("k",)),
        ):
            old = sorted(
                (int(d.split("=", 1)[1]), os.path.join(path, d))
                for d in os.listdir(path)
                if d.startswith("batch_id=")
                and int(d.split("=", 1)[1]) < current_batch_id
            )
            if len(old) <= 1:
                continue
            merged = (
                spark.read.option("basePath", path)
                .parquet(*[p for _, p in old])
                .drop("batch_id")
                .groupBy(*keycols)
                .agg(F.sum("cnt").alias("cnt"))
            )
            target_id, target_dir = old[0]
            tmp = os.path.join(path, f".compact-{current_batch_id}")
            merged.coalesce(1).write.mode("overwrite").parquet(tmp)
            own_prefix = f"compact-{current_batch_id}-"
            superseded = [
                os.path.join(target_dir, f)
                for f in os.listdir(target_dir)
                if not f.startswith(".") and not f.startswith(own_prefix)
            ]
            for i, fname in enumerate(sorted(os.listdir(tmp))):
                if fname.endswith(".parquet"):
                    os.rename(
                        os.path.join(tmp, fname),
                        os.path.join(target_dir, f"{own_prefix}{i:05d}.parquet"),
                    )
            shutil.rmtree(tmp)
            for _, p in old[1:]:
                shutil.rmtree(p)
            for f in superseded:
                if os.path.isfile(f):
                    os.remove(f)

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
