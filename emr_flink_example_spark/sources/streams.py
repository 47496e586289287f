"""Streaming source builders.

The reference consumes one topic as a string stream
(`createKafkaSource`, Kafka2S3Text.scala:27-33 / Kafka2S3Parquet.scala:37-43)
or as a SQL table with JSON format (Kafka2S3Hive.scala:62-82). Spark-side:
one kafka `readStream` builder, plus a file-stream twin with the same output
schema (`value: string`) so every pipeline runs unchanged in environments
without a broker (the test harness).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..config import PipelineConfig

#: The ad-event record schema (≙ case class Data, Kafka2S3Parquet.scala:22;
#: SQL DDL Kafka2S3Hive.scala:63-68). One explicit StructType shared by
#: from_json and every sink, replacing reflection-derived schemas.
AD_EVENT_SCHEMA = StructType(
    [
        StructField("uuid", StringType()),
        StructField("date", StringType()),
        StructField("timestamp", LongType()),
        StructField("ad_type", IntegerType()),
        StructField("ad_type_name", StringType()),
    ]
)


def kafka_reader_options(cfg: PipelineConfig) -> dict[str, str]:
    """The kafka reader's option contract as a pure, broker-free function —
    the exact mirror of the reference's consumer Properties
    (Kafka2S3Text.scala:27-33 via Config.scala:29-33):

    * ``bootstrap.servers`` <- ``-b brokerList``  ->  prefixed
      ``kafka.bootstrap.servers`` (Spark forwards ``kafka.*`` options to the
      underlying consumer verbatim);
    * the subscribed topic   <- ``-t sourceTopic`` ->  ``subscribe``;
    * ``group.id``           <- ``-g groupId``     ->  ``kafka.group.id``,
      forwarded only when set (Spark manages offsets in the checkpoint; the
      group id serves broker-side quota/ACL accounting);
    * start position: the reference defaults to the group's committed
      offsets, which has no Spark equivalent — ``startingOffsets`` defaults
      to "earliest" (checkpoint-first on restart either way; "latest" would
      silently skip pre-launch data).

    The sandbox has no broker, so this contract is what
    tests/test_kafka_contract.py pins (the ``format("kafka")`` branch
    itself needs the connector JAR + a broker to execute).
    """
    opts = {
        "kafka.bootstrap.servers": cfg.broker_list,
        "subscribe": cfg.source_topic,
        "startingOffsets": cfg.starting_offsets or "earliest",
    }
    if cfg.group_id:
        opts["kafka.group.id"] = cfg.group_id
    return opts


def raw_string_stream(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """Unbounded stream of raw record strings, column `value: string`.

    Kafka path ≙ FlinkKafkaConsumer + SimpleStringSchema; Spark tracks
    offsets in the checkpoint rather than the consumer group (the group.id
    is still forwarded for broker-side quota/ACL accounting). Start
    position: checkpoint-first always; `cfg.starting_offsets` (default
    "earliest") only governs a FRESH start — the reference's
    committed-group-offset default (Kafka2S3Text.scala:27-33) has no Spark
    equivalent, and "latest" would silently skip pre-launch data.
    """
    if cfg.source_format == "kafka":
        reader = spark.readStream.format("kafka").options(**kafka_reader_options(cfg))
        return reader.load().select(F.col("value").cast("string").alias("value"))
    return spark.readStream.format("text").load(cfg.source_path).select(
        F.col("value").cast("string").alias("value")
    )


def as_kafka_payload(df: DataFrame, key_col: str | None = None) -> DataFrame:
    """Serialize a typed DataFrame to the kafka sink contract
    (`key`/`value` binary-compatible string columns): value = JSON of all
    non-key columns. Pure transform — unit-testable without a broker."""
    value_cols = [c for c in df.columns if c != key_col]
    out = df.select(
        *([F.col(key_col).cast("string").alias("key")] if key_col else []),
        F.to_json(F.struct(*value_cols)).alias("value"),
    )
    return out


def kafka_sink_options(cfg: PipelineConfig) -> dict[str, str]:
    """The sink half of the option contract, as a pure broker-free function
    (tests/test_kafka_contract.py): bootstrap servers, the target topic
    (sink topic falling back to the source topic), and the checkpoint
    location that carries exactly-once."""
    return {
        "kafka.bootstrap.servers": cfg.broker_list,
        "topic": cfg.sink_topic or cfg.source_topic,
        "checkpointLocation": cfg.checkpoint_dir,
    }


def kafka_sink_writer(df: DataFrame, cfg: PipelineConfig, key_col: str | None = None):
    """writeStream builder for the kafka sink (≙ the reverse of A1: engine ->
    topic). Offsets/exactly-once ride the same checkpoint mechanism as the
    file sinks."""
    return (
        as_kafka_payload(df, key_col)
        .writeStream.format("kafka")
        .options(**kafka_sink_options(cfg))
    )


def parse_ad_events(raw: DataFrame) -> DataFrame:
    """Permissive JSON parse of a `value: string` frame into typed ad
    events — the pure transform half of `parsed_ad_stream`, reusable over
    any reader (tests and tools/streambench.py inject their own bounded
    file streams).

    `from_json` PERMISSIVE mode: missing fields -> NULL (≙
    'json.fail-on-missing-field'='false') and fully unparseable records ->
    all-NULL struct, dropped below (≙ 'json.ignore-parse-errors'='true');
    Kafka2S3Hive.scala:77-78.
    """
    parsed = raw.select(F.from_json("value", AD_EVENT_SCHEMA).alias("j"))
    # from_json yields an all-NULL struct (not NULL) for malformed records in
    # PERMISSIVE mode, so 'ignore-parse-errors' = drop rows with no parsed
    # field at all; records with only some fields missing are kept.
    any_field = F.coalesce(
        *[F.col(f"j.{f.name}").cast("string") for f in AD_EVENT_SCHEMA.fields]
    )
    return parsed.where(any_field.isNotNull()).select("j.*")


def parsed_ad_stream(spark: SparkSession, cfg: PipelineConfig) -> DataFrame:
    """Typed ad-event stream via permissive JSON parsing (see
    `parse_ad_events`) over the configured source."""
    return parse_ad_events(raw_string_stream(spark, cfg))
