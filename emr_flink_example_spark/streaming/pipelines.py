"""The three reference pipelines, restated on Structured Streaming.

| pipeline      | reference                  | shape |
|---------------|----------------------------|-------|
| text_sink     | Kafka2S3Text.scala:61-76   | raw strings -> processing-time daily dirs |
| parquet_sink  | Kafka2S3Parquet.scala:57-75| JSON -> typed parquet, event-date dirs    |
| hive_sink     | Kafka2S3Hive.scala:20-130  | SQL projection -> day/hour/minute dirs + partition commit |

Flink->Spark mappings (SURVEY.md §2 Part A):
  * checkpointing/EXACTLY_ONCE (A17) -> `checkpointLocation`; Spark file
    sinks are exactly-once via the offset log + _spark_metadata manifest.
  * DefaultRollingPolicy (A9) -> trigger interval plays rollover-interval;
    `maxRecordsPerFile` caps file size. Inactivity-based rolling has no
    Spark equivalent and is strictly unnecessary here: files close every
    micro-batch, which is always at least as fresh.
  * bulk roll-on-checkpoint (A10) -> per-micro-batch file finalization.
  * RocksDB state backend (A18) -> RocksDB state store provider
    (session.py).

All builders take (df) -> query so tests can inject bounded file streams.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..config import PipelineConfig
from ..functions.timeutils import (
    event_day_bucket,
    event_time_from_millis,
    hour_part,
    logday,
    minute_part,
    processing_day_bucket,
)


def text_sink(
    raw: DataFrame, cfg: PipelineConfig, clock: Column | None = None
) -> StreamingQuery:
    """Raw strings -> `logday=YYYYMMDD/` text files (≙ Kafka2S3Text).

    `clock` injects a deterministic timestamp column for tests; production
    default is the processing-time wall clock at UTC+8
    (CustomBucketAssigner, Kafka2S3Text.scala:53-59).
    """
    day = (
        F.date_format(F.from_utc_timestamp(clock, "+08:00"), "yyyyMMdd")
        if clock is not None
        else processing_day_bucket()
    )
    out = raw.withColumn("logday", day)
    return (
        out.writeStream.format("text")
        .option("path", cfg.output_path)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .option("maxRecordsPerFile", str(max(cfg.max_part_size // 256, 1)))
        .partitionBy("logday")
        .trigger(processingTime=f"{cfg.checkpoint_interval} seconds")
        .start()
    )


def parquet_sink(parsed: DataFrame, cfg: PipelineConfig) -> StreamingQuery:
    """Typed events -> event-date-partitioned parquet (≙ Kafka2S3Parquet).

    Partition = date string split on 'T', dashes removed, literal 'error'
    fallback for empty dates (DateBucketAssigner, Kafka2S3Parquet.scala:26-35).
    """
    out = parsed.withColumn("logday", event_day_bucket(F.col("date")))
    return (
        out.writeStream.format("parquet")
        .option("path", cfg.output_path)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .partitionBy("logday")
        .trigger(processingTime=f"{cfg.checkpoint_interval} seconds")
        .start()
    )


def hive_projection(parsed: DataFrame) -> DataFrame:
    """The continuous INSERT's SELECT (Kafka2S3Hive.scala:114-129): derive
    event_time from epoch millis, watermark 5s, project day/hour/minute."""
    return (
        parsed.withColumn("event_time", event_time_from_millis(F.col("timestamp")))
        .withWatermark("event_time", "5 seconds")
        .select(
            "uuid",
            "date",
            "ad_type",
            "ad_type_name",
            "timestamp",
            logday(F.col("event_time")).alias("logday"),
            hour_part(F.col("event_time")).alias("h"),
            minute_part(F.col("event_time")).alias("m"),
        )
    )


def hive_sink(parsed: DataFrame, cfg: PipelineConfig) -> StreamingQuery:
    """Continuous insert into a day/hour/minute-partitioned external parquet
    table with watermark-gated partition commit (≙ Kafka2S3Hive).

    The commit-to-catalog step runs in foreachBatch (see partition_commit.py)
    because Spark's file sink tracks files in _spark_metadata, not the
    metastore (SURVEY.md §7 hard part 2).
    """
    from .partition_commit import PartitionCommitter

    projected = hive_projection(parsed)
    committer = PartitionCommitter(
        table=f"{cfg.database}.{cfg.hive_table_name}",
        path=cfg.hive_s3_path,
        partition_cols=("logday", "h", "m"),
        commit_delay_seconds=60,  # sink.partition-commit.delay='1 min' (:103)
    )
    return (
        projected.writeStream.foreachBatch(committer)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(processingTime=f"{cfg.checkpoint_interval} seconds")
        .start()
    )
