"""Streaming curation pipeline: Gopher gate + reject audit + cross-batch
near-dup filter composed in one foreachBatch sink (streaming twin of the
batch curation gate chain)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from emr_flink_example_spark.operators.textstats import gopher_flags
from emr_flink_example_spark.streaming.curation_stream import (
    CurationStreamSink,
    curation_filter_sink,
)

# a doc that PASSES every Gopher rule: 60 words, mean length ~4,
# several distinct stopwords, no symbols
_GOOD_WORDS = (
    "the data table is a fast join of the query plan and the scan reads "
    "rows from the sorted file while the merge keeps keys in order and "
    "the filter drops nulls so the output stays small and the shuffle "
    "moves bytes to the right node where the agg sums values into groups"
)
GOOD = _GOOD_WORDS
NEAR_GOOD = _GOOD_WORDS.replace("sorted", "bucketed")  # near-dup of GOOD
TOO_SHORT = "the quick brown fox is a fast runner"  # fails word count
NO_STOPS = " ".join(["zzzz"] * 60)  # 60 words, zero stopword hits


def _write_doc(path: str, doc_id: int, text: str, name: str) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        f.write(f"{doc_id}\t{text}\n")


def test_stream_gate_matches_batch_flags_and_dedup(spark, tmp_path):
    src = str(tmp_path / "in")
    out = str(tmp_path / "corpus")
    rej = str(tmp_path / "rejects")
    idx = str(tmp_path / "index")
    _write_doc(src, 1, GOOD, "b0.txt")

    stream = (
        spark.readStream.format("text")
        .load(src)
        .select(F.split("value", "\t").alias("p"))
        .select(
            F.col("p")[0].cast("bigint").alias("doc_id"),
            F.col("p")[1].alias("text"),
        )
    )
    query = curation_filter_sink(stream, out, rej, idx, str(tmp_path / "ckpt"))
    try:
        query.processAllAvailable()
        _write_doc(src, 2, NEAR_GOOD, "b1.txt")  # near-dup of accepted doc 1
        _write_doc(src, 3, TOO_SHORT, "b2.txt")  # fails word-count rule
        _write_doc(src, 4, NO_STOPS, "b3.txt")  # fails stopword rule
        query.processAllAvailable()
    finally:
        query.stop()
        query.awaitTermination(30)

    kept = {r.doc_id for r in spark.read.parquet(out).collect()}
    assert kept == {1}  # 2 near-dup-dropped, 3 & 4 quality-rejected
    rejects = {r.doc_id: r.reject_reason for r in spark.read.parquet(rej).collect()}
    assert rejects[3] == "word_count"
    assert rejects[4] == "stopwords"
    assert 1 not in rejects and 2 not in rejects
    # the index holds only the accepted doc's bands
    assert {r.doc_id for r in spark.read.parquet(idx).collect()} == {1}

    # the stream's verdicts equal the batch operator's on the same frame
    batch = spark.createDataFrame(
        [(1, GOOD), (2, NEAR_GOOD), (3, TOO_SHORT), (4, NO_STOPS)],
        "doc_id bigint, text string",
    )
    batch_pass = {
        r.doc_id for r in gopher_flags(batch).collect() if r.passes_gopher
    }
    assert batch_pass == {1, 2}  # 2 passes quality; only dedup removes it


def test_replayed_curation_batch_is_idempotent(spark, tmp_path):
    out, rej, idx = (
        str(tmp_path / "c"),
        str(tmp_path / "r"),
        str(tmp_path / "i"),
    )
    sink = CurationStreamSink(out, rej, idx)
    batch = spark.createDataFrame(
        [(1, GOOD), (3, TOO_SHORT)], "doc_id bigint, text string"
    )
    sink(batch, 0)
    sink(batch, 0)  # checkpoint replay of the same micro-batch
    assert spark.read.parquet(out).count() == 1
    assert spark.read.parquet(rej).count() == 1
    assert spark.read.parquet(idx).count() == 4  # one row per band, once


def test_clean_batch_skips_reject_write_and_observes_stats(spark, tmp_path):
    """r10: gate stats ride the probe job via observe(); an all-clean
    micro-batch spends ZERO jobs on the audit channel (no reject
    partition is written at all), while a dirty batch still writes its
    partition and both record accurate observed counts."""
    out, rej, idx = (
        str(tmp_path / "c"),
        str(tmp_path / "r"),
        str(tmp_path / "i"),
    )
    sink = CurationStreamSink(out, rej, idx)
    clean = spark.createDataFrame([(1, GOOD)], "doc_id bigint, text string")
    sink(clean, 0)
    assert not os.path.isdir(rej)  # skip-when-empty: no dir, no job
    assert sink.last_gate_stats == {"batch_id": 0, "n_input": 1, "n_rejected": 0}
    dirty = spark.createDataFrame(
        [(3, TOO_SHORT), (4, NO_STOPS)], "doc_id bigint, text string"
    )
    sink(dirty, 1)
    assert sink.last_gate_stats == {"batch_id": 1, "n_input": 2, "n_rejected": 2}
    assert {r.doc_id for r in spark.read.parquet(rej).collect()} == {3, 4}
    # replay of the clean batch observes the same zero and skips again
    sink(clean, 0)
    assert os.listdir(rej) == ["batch_id=1"]


def test_every_input_doc_is_accounted_for(spark, tmp_path):
    out, rej, idx = (
        str(tmp_path / "c"),
        str(tmp_path / "r"),
        str(tmp_path / "i"),
    )
    sink = CurationStreamSink(out, rej, idx)
    b0 = spark.createDataFrame([(1, GOOD)], "doc_id bigint, text string")
    b1 = spark.createDataFrame(
        [(2, NEAR_GOOD), (3, TOO_SHORT), (4, NO_STOPS)],
        "doc_id bigint, text string",
    )
    sink(b0, 0)
    sink(b1, 1)
    accepted = {r.doc_id for r in spark.read.parquet(out).collect()}
    rejected = {r.doc_id for r in spark.read.parquet(rej).collect()}
    # near-dups (doc 2) are dropped by the dedup half: accounted for as
    # input - accepted - rejected, never silently lost to a gate bug
    assert accepted == {1}
    assert rejected == {3, 4}
    assert {1, 2, 3, 4} - accepted - rejected == {2}
