"""SparkSession factory with scale-oriented defaults.

The reference configures its runtime per job (checkpointing, RocksDB state
backend, event-time mode — e.g. Kafka2S3Text.scala:63-70, Kafka2S3Hive.scala:25-33).
Spark's equivalents are session-level configs, centralized here.

Defaults are chosen for the 100 TB posture:
  * AQE on (runtime re-planning: partition coalescing, skew-join splitting,
    dynamic broadcast conversion) — replaces hand-tuned shuffle sizing.
  * RocksDB state store (≙ reference's RocksDBStateBackend) so streaming
    state spills to local disk instead of the JVM heap.
  * UTC session timezone pinned — the reference mixes UTC event strings with
    UTC+8 processing time (Kafka2S3Text.scala:56); we normalize to UTC and
    expose explicit tz conversion in functions/timeutils.
  * Arrow enabled for the (rare) pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def build_session(
    app_name: str = "emr-flink-example-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    streaming: bool = False,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Create (or reuse) a SparkSession with the engine's defaults.

    ``shuffle_partitions`` should be sized so post-shuffle partitions fit in
    executor memory at the target scale; with AQE coalescing enabled the value
    acts as an upper bound, so a generous default is safe at any SF.
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
    )
    if master:
        builder = builder.master(master)
    if streaming:
        builder = builder.config(
            "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
        )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    # Runtime-settable knobs are (re)applied even when an existing session is
    # reused (e.g. the driver hands us its own session).
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def local_test_session(cpus: int | None = None) -> SparkSession:
    """local[N] session for tests/bench (single JVM, N executor threads)."""
    n = cpus or default_parallelism()
    return build_session(
        app_name="emr-flink-example-spark-test",
        master=f"local[{n}]",
        shuffle_partitions=n,
        streaming=True,
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")},
    )
