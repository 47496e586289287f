"""Semantic property tests for the LLM-pipeline operators added on top of
the oracle-differential catalog checks (SURVEY.md §2 Part C rows: chunking,
packing, quantization, gap-fill, fuzzy linkage, BM25).

The DuckDB differential proves Spark computes the same values as the SQL
oracle; these tests prove the *definitions* have the properties users rely
on (coverage, bounds, monotonicity) — the reference repo's test style of
asserting behavioral invariants rather than golden values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from emr_flink_example_spark.operators.dedup import (
    FUZZY_MAX_EDITS,
    SIMHASH_MAX_HAMMING,
    q_dedup_fuzzy_levenshtein,
    q_simhash_hamming_pairs,
)
from emr_flink_example_spark.operators.sampling import (
    SHARD_TOKEN_BUDGET,
    q_pack_token_shards,
)
from emr_flink_example_spark.operators.similarity import q_embedding_quantize_int8
from emr_flink_example_spark.operators.textstats import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    q_bm25_topk,
    q_chunk_documents,
)
from emr_flink_example_spark.operators.timeseries import q_timeseries_resample_gapfill

from conftest import SF_DIR


def test_chunks_cover_every_token_with_bounded_size(spark):
    chunks = q_chunk_documents(spark, SF_DIR).cache()
    try:
        # every chunk is 1..CHUNK_TOKENS tokens
        bad = chunks.where(
            (F.col("n_chunk_tokens") < 1) | (F.col("n_chunk_tokens") > CHUNK_TOKENS)
        ).count()
        assert bad == 0
        # chunk_ids are dense from 1 per doc, and consecutive chunks overlap:
        # total tokens across chunks = n_tokens + (n_chunks-1)*overlap_actual
        # weaker invariant, exact per doc: last chunk ends at n_tokens, i.e.
        # (n_chunks-1)*stride < n_tokens  for every doc
        per_doc = chunks.groupBy("doc_id").agg(
            F.count("*").alias("n_chunks"),
            F.max("chunk_id").alias("max_id"),
            F.min("chunk_id").alias("min_id"),
            F.sum("n_chunk_tokens").alias("tok_in_chunks"),
        )
        assert per_doc.where(
            (F.col("min_id") != 0) | (F.col("max_id") != F.col("n_chunks") - 1)
        ).count() == 0
        # chunked token mass >= original tokens (overlap re-counts some)
        orig = (
            spark.read.parquet(f"{SF_DIR}/documents.parquet")
            .select(
                "doc_id",
                F.expr("size(regexp_extract_all(text, '[a-zA-Z0-9]+', 0))").alias("n_tokens"),
            )
            .where(F.col("n_tokens") > 0)
        )
        joined = per_doc.join(orig, "doc_id")
        assert joined.where(F.col("tok_in_chunks") < F.col("n_tokens")).count() == 0
        assert joined.where(
            ((F.col("n_chunks") - 1) * CHUNK_STRIDE) >= F.col("n_tokens")
        ).count() == 0
    finally:
        chunks.unpersist()


def test_pack_token_shards_budget_and_monotonicity(spark):
    packed = q_pack_token_shards(spark, SF_DIR).cache()
    try:
        # shard ids are positive and non-decreasing in doc_id order per lang
        from pyspark.sql.window import Window

        w = Window.partitionBy("lang").orderBy("doc_id")
        regress = packed.withColumn("prev", F.lag("shard_id").over(w)).where(
            F.col("prev").isNotNull() & (F.col("shard_id") < F.col("prev"))
        )
        assert regress.count() == 0
        # every shard except a lang's last holds > 0 and spans <= budget + one
        # straddling doc (the doc that closes the shard may overflow it)
        spans = packed.groupBy("lang", "shard_id").agg(
            F.sum("n_tokens").alias("shard_tokens"), F.max("n_tokens").alias("max_doc")
        )
        over = spans.where(
            F.col("shard_tokens") > SHARD_TOKEN_BUDGET + F.col("max_doc")
        )
        assert over.count() == 0
    finally:
        packed.unpersist()


def test_quantization_bounds_and_error(spark):
    q = q_embedding_quantize_int8(spark, SF_DIR).cache()
    try:
        assert q.where((F.col("q_min") < -127) | (F.col("q_max") > 127)).count() == 0
        assert q.where(F.col("scale") <= 0).count() == 0
        # reconstruction error bounded by sqrt(dim) * (scale/254) * safety 2
        bad = q.where(
            F.col("l2_err") > 2 * F.sqrt(F.lit(64.0)) * F.col("scale") / 254
        ).count()
        assert bad == 0
    finally:
        q.unpersist()


def test_gapfill_grid_dense_and_locf(spark):
    g = q_timeseries_resample_gapfill(spark, SF_DIR).cache()
    try:
        # dense grid: every event_type has the same number of hourly buckets
        per_type = g.groupBy("event_type").agg(F.count("*").alias("n"))
        assert per_type.select(F.count_distinct("n")).first()[0] == 1
        # gaps carry no sum but (after the first observation) a LOCF value
        assert g.where(F.col("is_gap") & F.col("sum_value").isNotNull()).count() == 0
        from pyspark.sql.window import Window

        w = Window.partitionBy("event_type").orderBy("bucket")
        seen = g.withColumn(
            "any_prior",
            F.count("sum_value").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        assert seen.where(
            (F.col("any_prior") > 0) & F.col("locf_value").isNull()
        ).count() == 0
    finally:
        g.unpersist()


def test_fuzzy_and_simhash_pair_predicates(spark):
    fuzzy = q_dedup_fuzzy_levenshtein(spark, SF_DIR)
    rows = fuzzy.collect()
    for r in rows:
        assert r.key_a < r.key_b
        assert 0 <= r.edit_dist <= FUZZY_MAX_EDITS
    sh = q_simhash_hamming_pairs(spark, SF_DIR)
    assert sh.where(
        (F.col("hamming") < 0) | (F.col("hamming") > SIMHASH_MAX_HAMMING)
    ).count() == 0
    assert sh.where(F.col("doc_a") >= F.col("doc_b")).count() == 0


def test_bm25_scores_rank_and_hit_counts(spark):
    top = q_bm25_topk(spark, SF_DIR).collect()
    assert 0 < len(top) <= 20
    # scores are positive, sorted output is consistent with rank definition
    scores = [r.bm25 for r in top]
    assert all(s > 0 for s in scores)
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r.n_terms_hit <= 3 for r in top)


def test_cc_algorithms_agree(spark):
    """Label propagation and alternating large-star/small-star must produce
    the identical component assignment (they share the output contract and
    the same DuckDB oracle)."""
    from emr_flink_example_spark.operators.dedup import (
        q_dedup_cc_alternating_stars,
        q_dedup_connected_components,
    )

    a = {tuple(r) for r in q_dedup_connected_components(spark, SF_DIR).collect()}
    b = {tuple(r) for r in q_dedup_cc_alternating_stars(spark, SF_DIR).collect()}
    assert a == b


def test_leakproof_split_group_integrity(spark):
    """Every source maps to exactly one split — the property that makes the
    source-hashed split leakage-proof."""
    from emr_flink_example_spark.operators.sampling import q_split_leakproof_by_source

    s = q_split_leakproof_by_source(spark, SF_DIR)
    per_source = s.groupBy("source").agg(F.count_distinct("split").alias("n_splits"))
    assert per_source.where(F.col("n_splits") != 1).count() == 0


def test_span_trim_rebuild_matches_python_reference(spark):
    """ExactSubstr cut: re-derive the owner/mask/rebuild chain in pure
    Python over the raw fixture text and require byte-identical trimmed
    output, plus the structural invariants (n_removed >= 1, trimmed token
    count = n_tokens - n_removed, affected docs are exactly the non-owner
    dup-span docs)."""
    import re

    from emr_flink_example_spark.operators.dedup import (
        SPAN_TOKENS,
        q_dedup_span_trim,
    )
    from emr_flink_example_spark.operators.textstats import TOKEN_RE

    rows = {
        r["doc_id"]: r["text"]
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet").collect()
    }
    tok = {d: re.findall(TOKEN_RE, t) for d, t in rows.items()}
    span_owner: dict[tuple, int] = {}
    span_docs: dict[tuple, set] = {}
    for d in sorted(tok):
        ts = tok[d]
        for i in range(len(ts) - SPAN_TOKENS + 1):
            key = tuple(ts[i : i + SPAN_TOKENS])
            span_owner.setdefault(key, d)
            span_docs.setdefault(key, set()).add(d)
    expected = {}
    for d in sorted(tok):
        ts = tok[d]
        bad = set()
        for i in range(len(ts) - SPAN_TOKENS + 1):
            key = tuple(ts[i : i + SPAN_TOKENS])
            if len(span_docs[key]) >= 2 and span_owner[key] != d:
                bad.update(range(i, i + SPAN_TOKENS))
        if bad:
            kept = [t for i, t in enumerate(ts) if i not in bad]
            expected[d] = (len(ts), len(bad), " ".join(kept))
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["trimmed_text"])
        for r in q_dedup_span_trim(spark, SF_DIR).collect()
    }
    assert got == expected
    assert all(nr >= 1 for _, nr, _ in got.values())
    for nt, nr, txt in got.values():
        n_kept = len(txt.split()) if txt else 0
        assert n_kept == nt - nr


def test_triangle_count_matches_python_reference(spark):
    """Degree-oriented wedge join vs a brute-force pure-Python triangle
    census over the SAME dup-edge list: per-node counts must agree
    exactly, and the global triangle total must be sum/3."""
    from itertools import combinations

    from emr_flink_example_spark.operators.dedup import (
        CC_EST_JACCARD,
        q_dedup_minhash_lsh,
        q_graph_triangle_count,
    )

    edges = {
        (r["doc_a"], r["doc_b"])
        for r in q_dedup_minhash_lsh(spark, SF_DIR)
        .where(F.col("est_jaccard") >= CC_EST_JACCARD)
        .collect()
    }
    adj: dict[int, set] = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    expected = {
        n: sum(
            1
            for x, y in combinations(sorted(nbrs), 2)
            if y in adj.get(x, ())
        )
        for n, nbrs in adj.items()
    }
    got = {
        r["doc_id"]: (r["degree"], r["n_triangles"])
        for r in q_graph_triangle_count(spark, SF_DIR).collect()
    }
    assert {n: t for n, (_, t) in got.items()} == expected
    assert {n: d for n, (d, _) in got.items()} == {
        n: len(v) for n, v in adj.items()
    }
    assert sum(expected.values()) % 3 == 0


def test_bloom_probe_no_false_negatives(spark):
    """Bloom membership: every member probe MUST hit (false negatives are
    impossible by construction), is_false_positive is exactly
    bloom_hit AND NOT exact_member, and derived probes are never exact
    members."""
    from emr_flink_example_spark.operators.dedup import q_dedup_bloom_probe

    rows = q_dedup_bloom_probe(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        if r["exact_member"]:
            assert r["bloom_hit"], f"false negative at probe {r['probe_id']}"
        assert r["is_false_positive"] == (r["bloom_hit"] and not r["exact_member"])
        if r["kind"] == "member":
            assert r["exact_member"]
        else:
            assert not r["exact_member"]
