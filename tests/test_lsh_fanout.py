"""LSH bucket fan-out parameterization (VERDICT r1 item 3).

The round-1 plane count was a fixed N_PLANES=4 (16 buckets): in-bucket pair
cost is O(sum bucket^2) ~ n^2/16 and parallelism caps at 16 tasks — fine at
test SFs, quadratic death at 100 TB. The knob `n_planes` now threads through
`_with_bucket` and both embedding-dedup queries, with `n_planes_for(n_rows)`
deriving the fan-out from corpus size. These tests pin the three properties
that make scaling the knob SAFE:

  * plane-stream prefix: more planes never change the first k hyperplanes,
    so the 4-plane oracle bucketing is bit-stable forever;
  * fan-out derivation: plane count grows ~log2(corpus/target), floored at
    the oracle default;
  * bucket refinement: the k-plane bucket id is the low-k-bit prefix of any
    larger fan-out's id — raising the knob only SPLITS buckets (candidate
    sets shrink monotonically; no pair ever moves between unrelated buckets).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators.similarity import (
    N_PLANES,
    PLANES,
    _with_bucket,
    make_planes,
    n_planes_for,
)

SF = "/root/testdata/sf0.001"


def test_plane_stream_prefix_is_stable():
    eight = make_planes(8)
    assert eight[:N_PLANES] == PLANES
    assert len(eight) == 8 and len(set(map(tuple, eight))) == 8


def test_n_planes_for_scales_with_corpus():
    # floor: anything at-or-below the target keeps the oracle default
    assert n_planes_for(1_000) == N_PLANES
    assert n_planes_for(100_000) == N_PLANES
    # grows ~log2(n/target): 1e11 rows @ 1e5 target -> 20 planes / ~1M buckets
    assert n_planes_for(100_000_000_000) == 20
    # monotone in corpus size
    sizes = [10**k for k in range(3, 12)]
    planes = [n_planes_for(n) for n in sizes]
    assert planes == sorted(planes)
    # tighter target -> more planes
    assert n_planes_for(10**9, target_bucket_rows=10_000) > n_planes_for(10**9)


def test_bucket_ids_refine_under_larger_fanout(spark):
    emb = load(spark, SF, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    b4 = _with_bucket(emb).select("vec_id", F.col("bucket").alias("b4"))
    b6 = _with_bucket(emb, n_planes=6).select("vec_id", F.col("bucket").alias("b6"))
    joined = b4.join(b6, "vec_id")
    # low-4-bit prefix property: every 6-plane bucket folds onto its 4-plane bucket
    assert joined.where(F.col("b6").bitwiseAND(F.lit(15)) != F.col("b4")).count() == 0
    # and the fan-out actually splits: strictly more distinct buckets
    n4 = b4.select("b4").distinct().count()
    n6 = b6.select("b6").distinct().count()
    assert n4 <= 16 < n6


def test_dedup_accepts_fanout_knob(spark):
    from emr_flink_example_spark.operators.dedup import q_dedup_embedding_cosine

    base = {r["dup_vec_id"] for r in q_dedup_embedding_cosine(spark, SF).collect()}
    split = {
        r["dup_vec_id"]
        for r in q_dedup_embedding_cosine(spark, SF, n_planes=6).collect()
    }
    # splitting buckets can only LOSE candidate pairs, never invent them: any
    # pair co-bucketed under 6 planes is co-bucketed under its 4-bit prefix
    assert split <= base


def test_jaccard_df_cap_prunes_hot_shingles(spark):
    """The inverted-index df cap actually gates the join: with cap=1 every
    shared shingle (df >= 2 by definition of a pair) leaves the index, so no
    pair survives; the default cap reproduces the exact top-20."""
    from emr_flink_example_spark.operators.dedup import q_dedup_jaccard_pairs

    assert q_dedup_jaccard_pairs(spark, SF, max_shingle_df=1).count() == 0
    assert q_dedup_jaccard_pairs(spark, SF).count() == 20
