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


#: fallback when the source can't be sampled (e.g. a Kafka topic before any
#: poll): the reference workload's ad-event JSON lines run ~120-180 bytes;
#: 256 is a conservative round-up so the cap errs toward SMALLER files.
DEFAULT_RECORD_BYTES = 256


def estimate_record_bytes(
    raw_source_path: str, spark=None, sample_rows: int = 10_000
) -> int:
    """Observed average record size (bytes, incl. newline) from a bounded
    sample of the source files — sizes the bytes->records conversion for
    `maxRecordsPerFile` (the reference rolls on BYTES via
    DefaultRollingPolicy.withMaxPartSize, Kafka2S3Text.scala:43-46; Spark's
    text sink caps RECORDS per file, so the cap must be derived).

    Driver cost is one bounded read of `sample_rows` lines at stream build
    time — not per batch. Kafka/unsampleable sources fall back to
    DEFAULT_RECORD_BYTES."""
    if not raw_source_path or spark is None:
        return DEFAULT_RECORD_BYTES
    try:
        sample = (
            spark.read.format("text")
            .load(raw_source_path)
            .limit(sample_rows)
            .agg(F.avg(F.length("value")).alias("b"))
            .collect()[0]["b"]
        )
    except Exception:
        return DEFAULT_RECORD_BYTES
    if sample is None:
        return DEFAULT_RECORD_BYTES
    return max(int(sample) + 1, 1)  # +1 newline


def text_sink(
    raw: DataFrame, cfg: PipelineConfig, clock: Column | None = None
) -> StreamingQuery:
    """Raw strings -> `logday=YYYYMMDD/` text files (≙ Kafka2S3Text).

    `clock` injects a deterministic timestamp column for tests; production
    default is the processing-time wall clock at UTC+8
    (CustomBucketAssigner, Kafka2S3Text.scala:53-59).

    File-size roll: `maxRecordsPerFile = max_part_size / avg_record_bytes`,
    with the average measured from the source when it's sampleable
    (estimate_record_bytes) — ≙ withMaxPartSize(1 GiB). Inactivity-based
    rolling has no Spark equivalent and is strictly unnecessary here (files
    close every micro-batch).
    """
    day = (
        F.date_format(F.from_utc_timestamp(clock, "+08:00"), "yyyyMMdd")
        if clock is not None
        else processing_day_bucket()
    )
    rec_bytes = estimate_record_bytes(
        cfg.source_path if cfg.source_format == "file" else "", raw.sparkSession
    )
    out = raw.withColumn("logday", day)
    return (
        out.writeStream.format("text")
        .option("path", cfg.output_path)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .option("maxRecordsPerFile", str(max(cfg.max_part_size // rec_bytes, 1)))
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


def hive_sink(
    parsed: DataFrame,
    cfg: PipelineConfig,
    auto_compact_every: int = 0,
    stage_ms: dict | None = None,
) -> StreamingQuery:
    """Continuous insert into a day/hour/minute-partitioned external parquet
    table with watermark-gated partition commit (≙ Kafka2S3Hive).

    The commit-to-catalog step runs in foreachBatch (see partition_commit.py)
    because Spark's file sink tracks files in _spark_metadata, not the
    metastore (SURVEY.md §7 hard part 2). The external table is created
    before the stream starts (≙ the reference's pre-stream DDL,
    Kafka2S3Hive.scala:85-111) so the committer's ALTER TABLE ADD PARTITION
    lands in the session catalog, not just the ledger.
    """
    from ..catalog_ddl import create_external_table
    from .partition_commit import PartitionCommitter

    table = create_external_table(parsed.sparkSession, cfg)
    projected = hive_projection(parsed)
    committer = PartitionCommitter(
        table=table,
        path=cfg.hive_s3_path,
        partition_cols=("logday", "h", "m"),
        commit_delay_seconds=60,  # sink.partition-commit.delay='1 min' (:103)
        auto_compact_every=auto_compact_every,
        stage_ms=stage_ms,
    )
    return (
        projected.writeStream.foreachBatch(committer)
        .option("checkpointLocation", cfg.checkpoint_dir)
        .trigger(processingTime=f"{cfg.checkpoint_interval} seconds")
        .start()
    )
