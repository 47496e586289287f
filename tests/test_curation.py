"""End-to-end curation pipeline: quality gate -> exact dedup -> near-dup
removal -> lang-partitioned curated corpus."""

from __future__ import annotations

import os

from emr_flink_example_spark.operators.curation import curate_documents

SF_DIR = "/root/testdata/sf0.01"


def test_curation_pipeline(spark, tmp_path):
    out = str(tmp_path / "curated")
    stats = curate_documents(spark, SF_DIR, out, min_quality=0.5, min_tokens=10)

    # monotonically non-increasing through the stages, nothing degenerate
    assert stats.n_input >= stats.n_after_quality >= stats.n_after_boilerplate
    assert stats.n_after_boilerplate >= stats.n_after_exact_dedup >= stats.n_after_near_dedup
    assert 0 < stats.n_after_near_dedup < stats.n_input
    # the boilerplate gate fires on this corpus (fully-duplicated docs exist)
    assert stats.n_after_boilerplate < stats.n_after_quality

    curated = spark.read.parquet(out)
    assert curated.count() == stats.n_after_near_dedup
    # lang partition layout on disk, readable back with partition pruning
    lang_dirs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert len(lang_dirs) >= 2
    assert curated.where("lang = 'en'").count() > 0
    # curated corpus has no exact duplicates left
    n_distinct = curated.selectExpr("md5(lower(trim(text))) AS f").distinct().count()
    assert n_distinct == stats.n_after_near_dedup


def test_training_pipeline(spark, tmp_path):
    from pyspark.sql import functions as F

    from emr_flink_example_spark.operators.curation import curate_for_training
    from emr_flink_example_spark.operators.sampling import SHARD_TOKEN_BUDGET
    from emr_flink_example_spark.operators.textstats import CHUNK_TOKENS

    out = str(tmp_path / "training")
    stats = curate_for_training(spark, SF_DIR, out, min_quality=0.5, min_tokens=10)

    # stage monotonicity through curation + rebalance
    assert stats.n_input >= stats.n_after_quality >= stats.n_after_boilerplate
    assert stats.n_after_boilerplate >= stats.n_after_exact_dedup
    assert stats.n_after_exact_dedup >= stats.n_after_near_dedup >= stats.n_after_rebalance
    assert 0 < stats.n_after_rebalance
    # every surviving doc has >= min_tokens tokens, so >= 1 chunk each
    assert stats.n_chunks >= stats.n_after_rebalance
    assert 0 < stats.n_shards <= stats.n_chunks

    packed = spark.read.parquet(out)
    assert packed.count() == stats.n_chunks
    # chunk and shard invariants hold in the written corpus
    assert packed.where(
        (F.col("n_chunk_tokens") < 1) | (F.col("n_chunk_tokens") > CHUNK_TOKENS)
    ).count() == 0
    spans = packed.groupBy("lang", "shard_id").agg(
        F.sum("n_chunk_tokens").alias("t"), F.max("n_chunk_tokens").alias("m")
    )
    assert spans.where(F.col("t") > SHARD_TOKEN_BUDGET + F.col("m")).count() == 0
    assert packed.select("lang", "shard_id").distinct().count() == stats.n_shards
