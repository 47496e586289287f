"""Bucketed co-located joins: pre-bucketing both sides on the join key makes
the join shuffle-free (the 100 TB pattern for repeated fact-fact joins)."""

from __future__ import annotations

import re

import pytest


@pytest.fixture
def bucketed_tables(spark):
    orders = spark.range(0, 1000).selectExpr(
        "id AS o_orderkey", "id % 100 AS o_custkey", "cast(id * 1.5 AS double) AS o_totalprice"
    )
    cust = spark.range(0, 100).selectExpr("id AS c_custkey", "concat('c', id) AS c_name")
    for name, df, key in (("b_orders", orders, "o_custkey"), ("b_cust", cust, "c_custkey")):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        df.write.bucketBy(8, key).sortBy(key).mode("overwrite").saveAsTable(name)
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_cust")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("b_orders").join(
            spark.table("b_cust"),
            spark.table("b_orders").o_custkey == spark.table("b_cust").c_custkey,
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # bucketed SMJ: zero shuffle exchanges (word-boundary, so
        # BroadcastExchange would not be silently accepted either)
        assert not re.search(r"\bExchange hashpartitioning", plan), plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
