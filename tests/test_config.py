"""CLI parity with the reference's scopt Config (Config.scala:3-20,25-69)."""

from __future__ import annotations

import pytest

from emr_flink_example_spark.config import GIB, parse_config


def test_text_defaults_match_reference():
    cfg = parse_config(["text", "-o", "/tmp/out"])
    assert cfg.job == "text"
    assert cfg.checkpoint_interval == 60  # Config.scala:9
    assert cfg.rollover_interval == 10  # Config.scala:10
    assert cfg.inactivity_interval == 2  # Config.scala:11
    assert cfg.max_part_size == GIB  # Config.scala:12
    assert cfg.output_path == "/tmp/out"


def test_hive_defaults_match_reference():
    cfg = parse_config(["hive", "-p", "/tmp/warehouse", "-b", "broker:9092", "-t", "topic"])
    assert cfg.database == "default"  # Config.scala:13
    assert cfg.kafka_table_name == "log_kafka_flink"  # Config.scala:14
    assert cfg.hive_table_name == "source_log"  # Config.scala:15
    assert cfg.broker_list == "broker:9092"
    assert cfg.source_topic == "topic"


def test_parquet_requires_output():
    with pytest.raises(SystemExit):  # ≙ System.exit(-1) on parse failure
        parse_config(["parquet"])


def test_file_source_switch():
    cfg = parse_config(["parquet", "-o", "/tmp/o", "--source-format", "file", "--source-path", "/tmp/in"])
    assert cfg.source_format == "file"
    assert cfg.source_path == "/tmp/in"
