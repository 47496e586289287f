"""Streaming incremental near-dup filter: cross-batch dedup against the
parquet band index (streaming twin of dedup_incremental_minhash)."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from emr_flink_example_spark.streaming.dedup_stream import (
    NearDupStreamFilter,
    near_dup_filter_sink,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "by the warm fire and the rain falls softly outside the window"
)
NEAR = BASE.replace("softly", "gently")  # one-token change: near-dup
DISTINCT = (
    "completely different content about distributed query engines and "
    "columnar storage formats with vectorized execution and shuffles"
)


def _write_doc(path: str, doc_id: int, text: str, name: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        f.write(f"{doc_id}\t{text}\n")


def test_cross_batch_near_dup_dropped(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "corpus")
    idx = str(tmp_path / "index")
    _write_doc(src, 1, BASE, "b0.txt")

    stream = (
        spark.readStream.format("text")
        .load(src)
        .select(F.split("value", "\t").alias("p"))
        .select(
            F.col("p")[0].cast("bigint").alias("doc_id"),
            F.col("p")[1].alias("text"),
        )
    )
    query = near_dup_filter_sink(stream, out, idx, str(tmp_path / "ckpt"))
    try:
        query.processAllAvailable()
        # batch 2: one near-dup of batch 1's doc, one genuinely new doc
        _write_doc(src, 2, NEAR, "b1.txt")
        _write_doc(src, 3, DISTINCT, "b2.txt")
        query.processAllAvailable()
    finally:
        query.stop()
        query.awaitTermination(30)

    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert 1 in kept and 3 in kept
    assert 2 not in kept  # near-dup of doc 1 across batches -> dropped
    # the index holds only survivors' bands, N_BANDS rows per doc
    index = spark.read.parquet(idx)
    assert {r.doc_id for r in index.collect()} == {1, 3}
    assert index.count() == 2 * 4


def test_replayed_batch_is_idempotent(spark, tmp_path):
    out, idx = str(tmp_path / "c"), str(tmp_path / "i")
    sink = NearDupStreamFilter(out, idx)
    batch = spark.createDataFrame([(1, BASE)], "doc_id bigint, text string")
    sink(batch, 0)
    sink(batch, 0)  # checkpoint replay of the same micro-batch id
    assert spark.read.parquet(out).count() == 1
    assert spark.read.parquet(idx).count() == 4  # one row per band, once
