"""Streaming incremental near-dup dedup: the streaming twin of
`operators.dedup.q_dedup_incremental_minhash` — each micro-batch of
documents is MinHash-probed against the band-bucket index of everything
accepted so far; near-dups are dropped, survivors land in the output
corpus AND extend the index.

This composes the engine's streaming discipline (foreachBatch, restart
safety) with the LLM-dedup surface: a continuous crawl where the corpus
must never re-pair with itself. State is an explicit parquet band index
(doc_id, band, bucket, sig) rather than a state store:

  * it is exactly the structure the batch operator would pre-materialize
    at 100 TB (bucketed by `bucket`, so a probe is a co-located join);
  * it is readable by ANY consumer (the batch queries, audits), not only
    the stream's own state backend;
  * writes are idempotent BY CONSTRUCTION: each micro-batch overwrites its
    own `batch_id=N` partition directory in both the corpus and the index
    (a checkpoint replay simply rewrites the same directories), and the
    probe excludes the current batch's own index rows so a replay never
    self-pairs a document with its first attempt.

In-batch duplicates are intentionally out of scope here — run the batch
LSH operator inside the micro-batch first if needed; cross-batch is the
part plain Spark cannot express without this component.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.dedup import (
    BAND_ROWS,
    CC_EST_JACCARD,
    N_PERMS,
    _band_buckets,
    minhash_signatures_for,
)


class NearDupStreamFilter:
    """foreachBatch sink: drop micro-batch docs that are near-dups of any
    previously accepted doc, append survivors to `out_path` and their
    band-bucket rows to `index_path`."""

    def __init__(
        self,
        out_path: str,
        index_path: str,
        est_threshold: float = CC_EST_JACCARD,
        compact_every: int = 16,
    ) -> None:
        self.out_path = out_path
        self.index_path = index_path
        self.est_threshold = est_threshold
        #: every N batches, merge the accumulated one-dir-per-batch index
        #: partitions into one — unbounded small-file accretion otherwise
        #: (a 100 TB stream is millions of micro-batches). 0 disables.
        self.compact_every = compact_every

    def _existing_index(self, spark) -> DataFrame | None:
        """The accumulated band index, or None ONLY when none exists yet.

        Path-absent / no-data-files means first batch — proceed unfiltered.
        Any other read failure (corrupt footer, transient IO) re-raises so
        the micro-batch FAILS and the checkpoint retries: silently treating
        a broken index as empty would admit near-dups — the one failure
        mode this component exists to prevent. (Local-FS walk matches the
        sandbox; a real lake would ask the Hadoop FileSystem API instead.)"""
        if not os.path.isdir(self.index_path):
            return None
        has_data = any(
            f.endswith(".parquet")
            for _, _, files in os.walk(self.index_path)
            for f in files
        )
        if not has_data:
            return None
        return spark.read.parquet(self.index_path)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        bands = _band_buckets(minhash_signatures_for(batch_df))
        index = self._existing_index(spark)
        if index is not None:
            # a replayed batch must not probe its own first attempt's rows
            index = index.where(F.col("batch_id") != batch_id)
            # probe: same exact band-slice verify + est threshold as the
            # batch operator — xxhash64 bucket collisions only add
            # candidates, the verify removes them (hash-independent)
            band_eq = F.expr(
                f"slice(sig, band * {BAND_ROWS} + 1, {BAND_ROWS})"
                f" = slice(old_sig, band * {BAND_ROWS} + 1, {BAND_ROWS})"
            )
            est = F.expr(
                f"size(filter(zip_with(sig, old_sig, (p, q) -> p = q), z -> z))"
            ) / N_PERMS
            dups = (
                bands.join(
                    index.select(
                        "band", "bucket", F.col("sig").alias("old_sig")
                    ),
                    ["band", "bucket"],
                )
                .where(band_eq & (est >= self.est_threshold))
                .select("doc_id")
                .distinct()
            )
            survivors = batch_df.join(dups, "doc_id", "left_anti")
            surviving_bands = bands.join(dups, "doc_id", "left_anti")
        else:
            survivors, surviving_bands = batch_df, bands
        survivors.write.mode("overwrite").parquet(
            os.path.join(self.out_path, f"batch_id={batch_id}")
        )
        surviving_bands.write.mode("overwrite").parquet(
            os.path.join(self.index_path, f"batch_id={batch_id}")
        )
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            self._compact_index(spark, batch_id)

    def _compact_index(self, spark, current_batch_id: int) -> None:
        """Merge every index partition OLDER than the current batch into the
        oldest one (fewer dirs/files, same rows).

        Replay-safe: streaming replays only the LATEST batch, so rewriting
        strictly-older partitions can never collide with a replay, and the
        merged rows keep a batch_id (the oldest) that no replay will ever
        exclude. Orphan-safe ordering: the merged dir lands BEFORE the other
        old dirs are removed — a crash in between leaves duplicate index
        rows, which the probe's distinct() makes harmless, and the next
        compaction sweeps them up. Running the same compaction twice (batch
        replay of the triggering batch) is a no-op second time around."""
        old = sorted(
            (
                int(d.split("=", 1)[1]),
                os.path.join(self.index_path, d),
            )
            for d in os.listdir(self.index_path)
            if d.startswith("batch_id=") and int(d.split("=", 1)[1]) < current_batch_id
        )
        if len(old) <= 1:
            return
        # Merged rows all take the oldest dir's batch_id (partition-derived
        # on read). Per-row original ids are disposable: replay exclusion
        # only ever targets the CURRENT batch, and merged rows are strictly
        # older by construction.
        merged = (
            spark.read.option("basePath", self.index_path)
            .parquet(*[p for _, p in old])
            .drop("batch_id")
        )
        target_id, target_dir = old[0]
        tmp = os.path.join(self.index_path, f".compact-{current_batch_id}")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        shutil.rmtree(target_dir)
        os.rename(tmp, target_dir)
        for _, p in old[1:]:
            shutil.rmtree(p)


def near_dup_filter_sink(
    docs: DataFrame,
    out_path: str,
    index_path: str,
    checkpoint_dir: str,
    est_threshold: float = CC_EST_JACCARD,
    trigger_seconds: int = 1,
) -> StreamingQuery:
    """Start the streaming near-dup filter over a (doc_id, text) stream."""
    sink = NearDupStreamFilter(out_path, index_path, est_threshold)
    return (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
