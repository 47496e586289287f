"""Property tests for the r7-continuation NDCG and compaction-planner
operators: a pure-Python NDCG replication over the engine's own retrieved
list, and the planner's bin invariants (contiguity, fill bound, coverage)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators.analytics import q_compaction_plan
from emr_flink_example_spark.operators.textstats import (
    BM25_TERMS,
    NDCG_GRADE_CUTS,
    NDCG_K,
    TOKEN_RE,
    _ndcg_discounts,
    q_bm25_topk,
    q_retrieval_ndcg,
)

from conftest import SF_DIR


def test_ndcg_matches_pure_python_replication(spark):
    import re

    got = q_retrieval_ndcg(spark, SF_DIR).collect()
    assert len(got) == 1
    r = got[0]
    retrieved = sorted(
        q_bm25_topk(spark, SF_DIR).collect(),
        key=lambda x: (-x.bm25, x.doc_id),
    )[:NDCG_K]
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    c1, c2, c3 = NDCG_GRADE_CUTS
    rel = {}
    for d in docs:
        tot = sum(1 for t in re.findall(TOKEN_RE, d.text) if t in BM25_TERMS)
        g = 3 if tot >= c3 else 2 if tot >= c2 else 1 if tot >= c1 else 0
        if g > 0:
            rel[d.doc_id] = g
    disc = dict(_ndcg_discounts())
    gain = {0: 0, 1: 1, 2: 3, 3: 7}
    dcg = sum(
        gain[rel.get(row.doc_id, 0)] * disc[i + 1]
        for i, row in enumerate(retrieved)
    )
    ideal = sorted(rel.items(), key=lambda kv: (-kv[1], kv[0]))[:NDCG_K]
    idcg = sum(gain[g] * disc[i + 1] for i, (_, g) in enumerate(ideal))
    assert (r.n_rel_corpus, r.dcg_scaled, r.idcg_scaled) == (len(rel), dcg, idcg)
    assert r.ndcg_micro == math.floor(dcg / idcg * 1e6 + 0.5)
    assert 0 <= r.ndcg_micro <= 1_000_000


def test_compaction_plan_bins_are_contiguous_and_bounded(spark):
    sf01 = "/root/testdata/sf0.01"  # sf0.001 is too sparse to need compaction
    plan = sorted(q_compaction_plan(spark, sf01).collect(), key=lambda r: r.bin_id)
    assert plan, "no merge bins at sf0.01 — planner is vacuous"
    mf = (
        load(spark, sf01, "events")
        .groupBy(F.date_trunc("hour", "ts").alias("h"))
        .agg(F.count("*").alias("n"))
        .collect()
    )
    total = sum(r.n for r in mf)
    avg = total // len(mf)
    small = sorted((r.h, r.n) for r in mf if r.n < avg)
    # coverage: every small file appears in exactly one bin
    assert sum(r.n_files_merged for r in plan) == len(small)
    assert sum(r.rows_total for r in plan) == sum(n for _, n in small)
    # bins tile the hour axis in order and fill to ~4x average
    for a, b in zip(plan, plan[1:]):
        assert a.hour_max < b.hour_min
    for r in plan[:-1]:
        assert r.rows_total >= 4 * avg - avg  # filled (can't stop early)
        assert r.rows_total < 4 * avg + avg  # never overshoots by a file
