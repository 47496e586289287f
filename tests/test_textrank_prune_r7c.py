"""Property tests for the r7-continuation TextRank and manifest-pruning
operators. The DuckDB differential proves value equality; these pin the
semantic invariants — keyword well-formedness and positive integer rank
mass for TextRank, and the safety/effectiveness contract of min/max
pruning (never misses a matching row; actually prunes)."""

from __future__ import annotations

from pyspark.sql import functions as F

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators.analytics import (
    PRUNE_N_PROBES,
    q_manifest_prune_stats,
)
from emr_flink_example_spark.operators.textstats import (
    TEXTRANK_MIN_LEN,
    TEXTRANK_SCALE,
    q_keyword_textrank,
)

from conftest import SF_DIR


def test_textrank_keywords_are_content_words_with_positive_rank(spark):
    rows = q_keyword_textrank(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert len(r.keyword) >= TEXTRANK_MIN_LEN
        assert r.keyword == r.keyword.lower()
        assert 0 < r.textrank_e12 < TEXTRANK_SCALE
    ranks = [r.textrank_e12 for r in rows]
    assert ranks == sorted(ranks, reverse=True)


def test_manifest_pruning_is_safe_and_effective(spark):
    rows = q_manifest_prune_stats(spark, SF_DIR).collect()
    assert len(rows) == 2 * PRUNE_N_PROBES
    orders = load(spark, SF_DIR, "orders")
    mck = orders.agg(F.max("o_custkey")).collect()[0][0]
    total = orders.count()
    pruned_somewhere = False
    for r in rows:
        assert 0 <= r.n_files_touched <= r.n_files
        assert 0 <= r.n_rows_touched <= total
        if r.n_files_touched < r.n_files:
            pruned_somewhere = True
        # safety: every row matching the probe predicate must be in a
        # touched file, so n_rows_touched is an upper bound on the match
        if r.dim == "custkey":
            lo = (r.probe_id * mck) // PRUNE_N_PROBES
            hi = lo + mck // (2 * PRUNE_N_PROBES)
            exact = orders.where(
                (F.col("o_custkey") >= lo) & (F.col("o_custkey") <= hi)
            ).count()
        else:
            exact = orders.where(
                (F.col("o_orderdate") >= F.expr(f"add_months(DATE'1994-01-01', {3 * r.probe_id})"))
                & (
                    F.col("o_orderdate")
                    <= F.expr(
                        f"date_sub(add_months(DATE'1994-01-01', {3 * (r.probe_id + 1)}), 1)"
                    )
                )
            ).count()
        assert r.n_rows_touched >= exact, (r.dim, r.probe_id)
    assert pruned_somewhere, "no probe pruned any file — layout audit is vacuous"
