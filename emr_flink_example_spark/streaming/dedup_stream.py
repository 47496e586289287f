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
    ) -> None:
        self.out_path = out_path
        self.index_path = index_path
        self.est_threshold = est_threshold

    def _existing_index(self, spark) -> DataFrame | None:
        if not os.path.isdir(self.index_path):
            return None
        try:
            return spark.read.parquet(self.index_path)
        except Exception:
            return None

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
