"""External-table DDL for the hive pipeline (A13).

≙ Kafka2S3Hive.scala:85-111: the reference switches to the HIVE SQL dialect
and issues `CREATE EXTERNAL TABLE IF NOT EXISTS <t> (...) PARTITIONED BY
(logday STRING, h STRING, m STRING) STORED AS parquet LOCATION <s3>
TBLPROPERTIES (...)` before starting the continuous INSERT, so the
watermark-gated partition commits have a catalog table to land in.

Spark restatement: the same Hive DDL when the session catalog IS Hive
(`spark.sql.catalogImplementation=hive`, see session.build_session); a
datasource `USING parquet` external table (CREATE ... LOCATION) when the
session runs the in-memory catalog — identical partition layout, and
`ALTER TABLE ... ADD PARTITION` / `SHOW PARTITIONS` behave the same, which
is what the committer (streaming/partition_commit.py) needs. The reference's
Flink-connector TBLPROPERTIES (rolling policy, commit trigger/delay/policy)
are recorded verbatim as table properties for parity/documentation; their
BEHAVIOR lives in the Spark components (trigger interval, PartitionCommitter,
compaction.py) rather than in the table.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from .config import PipelineConfig

#: reference log schema (Kafka2S3Hive.scala:92-97); `date`/`timestamp` are
#: reserved-ish words in both engines, hence the backticks.
AD_EVENT_COLS_DDL = (
    "`uuid` STRING, `date` STRING, `ad_type` INT, "
    "`ad_type_name` STRING, `timestamp` BIGINT"
)

PARTITION_COLS_DDL = "`logday` STRING, `h` STRING, `m` STRING"

#: Kafka2S3Hive.scala:102-109, kept as inert metadata (see module docstring).
REFERENCE_TBLPROPERTIES = {
    "partition.time-extractor.timestamp-pattern": "$logday $h:$m:00",
    "sink.partition-commit.trigger": "partition-time",
    "sink.partition-commit.delay": "1 min",
    "sink.partition-commit.policy.kind": "metastore",
    "sink.rolling-policy.rollover-interval": "1 min",
    "sink.rolling-policy.file-size": "128MB",
    "auto-compaction": "true",
}


def _props_sql() -> str:
    return ", ".join(f"'{k}'='{v}'" for k, v in REFERENCE_TBLPROPERTIES.items())


def create_external_table_sql(
    table: str, location: str, hive_catalog: bool
) -> str:
    """The CREATE statement for either catalog implementation."""
    props = _props_sql()
    if hive_catalog:
        return (
            f"CREATE EXTERNAL TABLE IF NOT EXISTS {table} "
            f"({AD_EVENT_COLS_DDL}) "
            f"PARTITIONED BY ({PARTITION_COLS_DDL}) "
            f"STORED AS parquet LOCATION '{location}' "
            f"TBLPROPERTIES ({props})"
        )
    # datasource form: partition columns appear in the column list and are
    # named (not typed) in PARTITIONED BY; LOCATION makes it external.
    return (
        f"CREATE TABLE IF NOT EXISTS {table} "
        f"({AD_EVENT_COLS_DDL}, {PARTITION_COLS_DDL}) "
        f"USING parquet PARTITIONED BY (logday, h, m) "
        f"LOCATION '{location}' "
        f"TBLPROPERTIES ({props})"
    )


def create_external_table(spark: SparkSession, cfg: PipelineConfig) -> str:
    """Create `cfg.database.cfg.hive_table_name` over `cfg.hive_s3_path`
    (idempotent), returning the fully-qualified table name.

    Mirrors the reference's pre-stream DDL sequence: ensure the database,
    then CREATE EXTERNAL TABLE IF NOT EXISTS. (The reference also DROPs and
    re-CREATEs its Kafka *source* table, Kafka2S3Hive.scala:61-83 — Spark
    streams don't register the source in a catalog, so only the sink table
    exists here.)
    """
    hive_catalog = (
        spark.conf.get("spark.sql.catalogImplementation", "in-memory") == "hive"
    )
    spark.sql(f"CREATE DATABASE IF NOT EXISTS {cfg.database}")
    table = f"{cfg.database}.{cfg.hive_table_name}"
    spark.sql(create_external_table_sql(table, cfg.hive_s3_path, hive_catalog))
    return table
