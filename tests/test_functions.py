"""Unit tests for expression-level helpers (SURVEY.md §5 item 3) using the
reference's own sample record (README.md:8-11) as the fixture."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from emr_flink_example_spark.functions.hashing import portable_hash, portable_hash_sql_duckdb
from emr_flink_example_spark.functions.timeutils import (
    event_day_bucket,
    event_time_from_millis,
    hour_part,
    logday,
    minute_part,
)

# The canonical sample record (reference README.md:11).
SAMPLE_TS = 1617171790593
SAMPLE_DATE = "2021-04-13T06:23:10.593Z"


def test_event_time_from_millis_truncates_to_second(spark):
    row = (
        spark.range(1)
        .select(event_time_from_millis(F.lit(SAMPLE_TS)).alias("et"))
        .collect()[0]
    )
    # 1617171790593 ms -> 2021-03-31 06:23:10 UTC, millis discarded
    # (reference: TO_TIMESTAMP(FROM_UNIXTIME(ts/1000,'yyyy-MM-dd HH:mm:ss')),
    # Kafka2S3Hive.scala:69).
    assert row.et.strftime("%Y-%m-%d %H:%M:%S") == "2021-03-31 06:23:10"
    assert row.et.microsecond == 0


def test_partition_projections(spark):
    df = spark.range(1).select(event_time_from_millis(F.lit(SAMPLE_TS)).alias("et"))
    row = df.select(
        logday(F.col("et")).alias("d"),
        hour_part(F.col("et")).alias("h"),
        minute_part(F.col("et")).alias("m"),
    ).collect()[0]
    assert (row.d, row.h, row.m) == ("2021-03-31", "06", "23")


def test_event_day_bucket_and_error_fallback(spark):
    df = spark.createDataFrame(
        [(SAMPLE_DATE,), ("",), (None,), ("   ",)], ["date"]
    ).select(event_day_bucket(F.col("date")).alias("b"))
    assert [r.b for r in df.collect()] == ["20210413", "error", "error", "error"]


def test_portable_hash_matches_duckdb(spark):
    samples = ["", "abc", "the quick brown fox", SAMPLE_DATE]
    sdf = spark.createDataFrame([(s,) for s in samples], ["s"])
    got = [r.h for r in sdf.select(portable_hash(F.col("s")).alias("h")).collect()]
    for s, h in zip(samples, got):
        expect = duckdb.execute(
            f"SELECT {portable_hash_sql_duckdb('?')} AS h", [s]
        ).fetchone()[0]
        assert h == expect, s
        assert 0 <= h < (1 << 60)
