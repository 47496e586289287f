"""CLI configuration mirroring the reference's scopt parser.

Reference: conf/Config.scala:25-69 — shared options `-b brokerList,
-t sourceTopic, -g groupId, -c checkpointDir, -l checkpointInterval`
(Config.scala:29-33), per-job options switched on program name
(Config.scala:35-56), defaults at Config.scala:3-20, exit(-1) on parse
failure (Config.scala:62-66).

Here: one argparse parser with `text` / `parquet` / `hive` subcommands,
same flags, same defaults. `--source-format file` swaps Kafka for a file
stream so every pipeline is testable without a broker.
"""

from __future__ import annotations

import argparse
from dataclasses import dataclass, field

GIB = 1024 * 1024 * 1024


@dataclass
class PipelineConfig:
    """Union of all job options (≙ the single Config case class, Config.scala:3-20)."""

    job: str = ""
    broker_list: str = ""
    source_topic: str = ""
    group_id: str = ""
    checkpoint_dir: str = ""
    checkpoint_interval: int = 60  # seconds (Config.scala:9)
    # text job (Config.scala:10-12,46-49)
    rollover_interval: int = 10  # minutes
    inactivity_interval: int = 2  # minutes
    max_part_size: int = GIB  # bytes
    output_path: str = ""
    # hive job (Config.scala:13-15,37-42)
    metastore_uris: str = ""
    database: str = "default"
    kafka_table_name: str = "log_kafka_flink"
    hive_table_name: str = "source_log"
    hive_s3_path: str = ""
    hive_conf_dir: str = ""
    # engine extension: run against a bounded/unbounded file source instead
    # of Kafka (the test harness has no broker)
    source_format: str = "kafka"
    source_path: str = ""
    # Kafka start position on a FRESH start (no checkpoint). The reference
    # defaults to the consumer group's committed offsets
    # (Kafka2S3Text.scala:27-33, no explicit setStartFromX call); Spark has
    # no committed-group-offset mode, so the safe parity default is
    # "earliest" — a fresh start re-reads the topic instead of silently
    # skipping everything before launch ("latest" was the old hardcoded
    # behavior). Once a checkpoint exists it ALWAYS wins; this knob only
    # governs the first start. Accepts earliest/latest or a per-partition
    # offsets JSON string, passed through to `startingOffsets`.
    starting_offsets: str = "earliest"
    # engine extension: kafka sink topic (engine -> topic, reverse of A1)
    sink_topic: str = ""
    extra: dict = field(default_factory=dict)


def _shared(p: argparse.ArgumentParser) -> None:
    p.add_argument("-b", "--brokerList", dest="broker_list", default="")
    p.add_argument("-t", "--sourceTopic", dest="source_topic", default="")
    p.add_argument("-g", "--groupId", dest="group_id", default="")
    p.add_argument("-c", "--checkpointDir", dest="checkpoint_dir", default="")
    p.add_argument("-l", "--checkpointInterval", dest="checkpoint_interval", type=int, default=60)
    p.add_argument("--source-format", dest="source_format", default="kafka", choices=["kafka", "file"])
    p.add_argument("--source-path", dest="source_path", default="")
    p.add_argument(
        "--starting-offsets",
        dest="starting_offsets",
        default="earliest",
        help="kafka start position for a fresh start (earliest/latest/offsets-JSON); "
        "an existing checkpoint always wins",
    )


def parse_config(args: list[str] | None = None) -> PipelineConfig:
    parser = argparse.ArgumentParser(prog="emr-flink-example-spark")
    sub = parser.add_subparsers(dest="job", required=True)

    text = sub.add_parser("text", help="raw stream -> partitioned text files (≙ Kafka2S3Text)")
    _shared(text)
    text.add_argument("-r", "--rolloverInterval", dest="rollover_interval", type=int, default=10)
    text.add_argument("-i", "--inactivityInterval", dest="inactivity_interval", type=int, default=2)
    text.add_argument("-m", "--maxPartSize", dest="max_part_size", type=int, default=GIB)
    text.add_argument("-o", "--output", dest="output_path", required=True)

    parquet = sub.add_parser("parquet", help="JSON stream -> typed parquet (≙ Kafka2S3Parquet)")
    _shared(parquet)
    parquet.add_argument("-o", "--output", dest="output_path", required=True)

    hive = sub.add_parser("hive", help="SQL pipeline -> Hive-partitioned table (≙ Kafka2S3Hive)")
    _shared(hive)
    hive.add_argument("-m", "--metastore", dest="metastore_uris", default="")
    hive.add_argument("-d", "--database", dest="database", default="default")
    hive.add_argument("-k", "--kafkaTableName", dest="kafka_table_name", default="log_kafka_flink")
    hive.add_argument("-n", "--hiveTableName", dest="hive_table_name", default="source_log")
    hive.add_argument("-p", "--hiveS3Path", dest="hive_s3_path", required=True)
    hive.add_argument("-v", "--hiveConfDir", dest="hive_conf_dir", default="")

    ns = parser.parse_args(args)
    return PipelineConfig(**{k: v for k, v in vars(ns).items()})
