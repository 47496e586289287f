"""Kafka option-contract tests (VERDICT r5 item 6): the sandbox has no
broker, so the `format("kafka")` branch has never executed — what CAN be
pinned without one is the exact reader-option contract produced from a
`PipelineConfig`, against the reference's consumer properties
(Kafka2S3Text.scala:27-33, Config.scala:29-33). No SparkSession needed:
`kafka_reader_options` is a pure function.
"""

from __future__ import annotations

from emr_flink_example_spark.config import parse_config
from emr_flink_example_spark.sources.streams import kafka_reader_options


def _cfg(argv):
    return parse_config(argv)


def test_reference_cli_maps_to_kafka_reader_options():
    """The reference's required flags -b/-t/-g (Config.scala:29-31) land on
    the three consumer-facing reader options, with bootstrap.servers and
    group.id under the `kafka.` passthrough prefix."""
    cfg = _cfg(
        ["text", "-b", "h1:9092,h2:9092", "-t", "ad-events", "-g", "cg-1",
         "-c", "/tmp/ckpt", "-o", "/tmp/out"]
    )
    opts = kafka_reader_options(cfg)
    assert opts["kafka.bootstrap.servers"] == "h1:9092,h2:9092"
    assert opts["subscribe"] == "ad-events"
    assert opts["kafka.group.id"] == "cg-1"


def test_starting_offsets_defaults_earliest():
    """The reference starts from the group's committed offsets by default —
    no Spark equivalent exists, and the documented parity default is
    'earliest' (a fresh start re-reads the topic; 'latest' would silently
    skip pre-launch data). Restarts are checkpoint-first regardless."""
    cfg = _cfg(["text", "-b", "h:9092", "-t", "x", "-g", "g", "-c", "/tmp/c", "-o", "/tmp/out"])
    assert kafka_reader_options(cfg)["startingOffsets"] == "earliest"
    cfg2 = _cfg(
        ["text", "-b", "h:9092", "-t", "x", "-g", "g", "-c", "/tmp/c", "-o", "/tmp/out",
         "--starting-offsets", "latest"]
    )
    assert kafka_reader_options(cfg2)["startingOffsets"] == "latest"


def test_group_id_forwarded_only_when_set():
    """Spark tracks offsets in the checkpoint, not the consumer group; the
    group id is forwarded for broker-side quota/ACL accounting ONLY when
    the user provided one (an empty kafka.group.id option would make the
    connector register a bogus group)."""
    cfg = _cfg(["text", "-b", "h:9092", "-t", "x", "-c", "/tmp/c", "-o", "/tmp/out"])
    opts = kafka_reader_options(cfg)
    assert "kafka.group.id" not in opts
    assert set(opts) == {"kafka.bootstrap.servers", "subscribe", "startingOffsets"}


def test_kafka_sink_payload_and_options(spark):
    """Sink half of the contract: `as_kafka_payload` serializes non-key
    columns to a JSON `value` (with the key cast to string when given),
    and `kafka_sink_writer` wires bootstrap.servers / topic (sink topic
    falling back to the source topic) / checkpointLocation. The payload
    transform is pure and batch-testable; the writer options are read off
    the built DataStreamWriter without a broker."""
    import json

    from emr_flink_example_spark.config import PipelineConfig
    from emr_flink_example_spark.sources.streams import (
        as_kafka_payload,
        kafka_sink_options,
    )

    df = spark.createDataFrame([(1, "a", 2.5)], "id bigint, name string, score double")
    out = as_kafka_payload(df, key_col="id").collect()[0]
    assert out.key == "1"
    assert json.loads(out.value) == {"name": "a", "score": 2.5}
    # keyless form: every column rides the JSON value
    out2 = as_kafka_payload(df).collect()[0]
    assert json.loads(out2.value) == {"id": 1, "name": "a", "score": 2.5}

    cfg = PipelineConfig(
        broker_list="h:9092", source_topic="src", sink_topic="",
        checkpoint_dir="/tmp/ck",
    )
    opts = kafka_sink_options(cfg)
    assert opts["kafka.bootstrap.servers"] == "h:9092"
    assert opts["topic"] == "src"  # sink topic falls back to the source topic
    assert opts["checkpointLocation"] == "/tmp/ck"
    cfg2 = PipelineConfig(broker_list="h:9092", source_topic="src",
                          sink_topic="out", checkpoint_dir="/tmp/ck")
    assert kafka_sink_options(cfg2)["topic"] == "out"
