"""Small-file compaction (A15's declared-but-inert auto-compaction, made real)
and the kafka sink payload contract."""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from emr_flink_example_spark.sources.streams import as_kafka_payload
from emr_flink_example_spark.streaming.compaction import compact_path


def test_compaction_merges_small_files(spark, tmp_path):
    out = str(tmp_path / "tbl")
    df = spark.range(0, 1000).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("part"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    # 8 writer tasks per partition -> lots of small files
    df.repartition(8).write.partitionBy("part").parquet(out)
    before = spark.read.parquet(out)
    before_rows = sorted(r.id for r in before.collect())

    stats = compact_path(spark, out, target_file_bytes=64 * 1024 * 1024)

    assert len(stats) == 3
    assert all(s.compacted for s in stats)
    assert all(s.files_after == 1 and s.files_before > 1 for s in stats)
    after = spark.read.parquet(out)
    assert sorted(r.id for r in after.collect()) == before_rows
    assert after.schema == before.schema


def test_compaction_noop_when_already_compact(spark, tmp_path):
    out = str(tmp_path / "tbl")
    spark.range(0, 10).coalesce(1).write.parquet(out)
    stats = compact_path(spark, out)
    assert len(stats) == 1 and not stats[0].compacted
    assert stats[0].files_before == stats[0].files_after == 1


def test_kafka_payload_roundtrip(spark):
    df = spark.createDataFrame(
        [(1, "click", 2.5)], "event_id bigint, event_type string, value double"
    )
    out = as_kafka_payload(df, key_col="event_id").collect()[0]
    assert out.key == "1"
    assert json.loads(out.value) == {"event_type": "click", "value": 2.5}

    no_key = as_kafka_payload(df).columns
    assert no_key == ["value"]
