"""Streaming-semantics tests (SURVEY.md §5 item 2): the three reference
pipelines on bounded file streams, partition layouts, permissive-JSON
behavior, the 'error' bucket, watermark late-row dropping, and the
watermark-gated partition commit."""

from __future__ import annotations

import json
import os
import time

import pytest

from pyspark.sql import functions as F

from emr_flink_example_spark.config import PipelineConfig
from emr_flink_example_spark.sources.streams import AD_EVENT_SCHEMA
from emr_flink_example_spark.streaming import pipelines
from emr_flink_example_spark.streaming.partition_commit import PartitionCommitter

SAMPLE = {
    "uuid": "999d0f4f-9d49-4ad0-9826-7a01600ed0b8",
    "date": "2021-04-13T06:23:10.593Z",
    "timestamp": 1617171790593,
    "ad_type": 1203,
    "ad_type_name": "udxyt",
}


def _write_lines(path: str, lines: list[str], name: str = "part0.txt") -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, name), "w") as f:
        f.write("\n".join(lines) + "\n")


def _file_cfg(tmp, **kw) -> PipelineConfig:
    return PipelineConfig(
        source_format="file",
        source_path=str(tmp / "in"),
        checkpoint_dir=str(tmp / "ckpt"),
        output_path=str(tmp / "out"),
        checkpoint_interval=1,
        **kw,
    )


def _run_to_completion(query) -> None:
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(30)


def test_text_sink_daily_partitions(spark, tmp_path):
    """≙ Kafka2S3Text: raw strings land under logday=YYYYMMDD (UTC+8 clock)."""
    cfg = _file_cfg(tmp_path)
    _write_lines(cfg.source_path, ["line-a", "line-b", "not json at all"])
    raw = spark.readStream.format("text").load(cfg.source_path)
    # injected clock: 2021-04-13 23:00 UTC == 2021-04-14 07:00 UTC+8 -> bucket
    # 20210414, proving the +08:00 conversion (Kafka2S3Text.scala:56)
    clock = F.lit("2021-04-13 23:00:00").cast("timestamp")
    _run_to_completion(pipelines.text_sink(raw, cfg, clock=clock))

    assert os.path.isdir(os.path.join(cfg.output_path, "logday=20210414"))
    out = spark.read.text(cfg.output_path).collect()
    assert sorted(r.value for r in out) == ["line-a", "line-b", "not json at all"]


def test_parquet_sink_event_date_and_error_bucket(spark, tmp_path):
    """≙ Kafka2S3Parquet: event-date dirs + 'error' fallback + parse-drop."""
    cfg = _file_cfg(tmp_path)
    bad_date = dict(SAMPLE, date="", uuid="u2")
    missing_field = {"uuid": "u3", "date": "2021-04-14T01:02:03.000Z"}
    _write_lines(
        cfg.source_path,
        [json.dumps(SAMPLE), json.dumps(bad_date), json.dumps(missing_field), "{not-json"],
    )
    from emr_flink_example_spark.sources.streams import parsed_ad_stream

    parsed = parsed_ad_stream(spark, cfg)
    _run_to_completion(pipelines.parquet_sink(parsed, cfg))

    out = spark.read.parquet(cfg.output_path)
    rows = {r.uuid: r for r in out.collect()}
    # non-JSON line dropped (ignore-parse-errors), missing fields -> NULL
    assert set(rows) == {SAMPLE["uuid"], "u2", "u3"}
    assert rows["u3"].ad_type is None
    by_bucket = {r.uuid: r.logday for r in out.select("uuid", "logday").collect()}
    assert by_bucket[SAMPLE["uuid"]] == "20210413"
    assert by_bucket["u2"] == "error"  # empty date -> literal error bucket
    assert by_bucket["u3"] == "20210414"


def test_hive_sink_partitions_and_commit(spark, tmp_path):
    """≙ Kafka2S3Hive: day/hour/minute layout + watermark-gated commit, with
    committed partitions visible in the session CATALOG (SHOW PARTITIONS),
    not just the ledger — the external table is created pre-stream (A13) so
    the committer's ALTER TABLE ADD PARTITION has a target (A11)."""
    cfg = _file_cfg(
        tmp_path,
        hive_s3_path=str(tmp_path / "warehouse"),
        hive_table_name=f"source_log_{int(time.time() * 1000)}",
    )
    base = 1617171790593  # 2021-03-31 06:23:10 UTC
    events = [
        dict(SAMPLE, uuid="e0", timestamp=base),
        dict(SAMPLE, uuid="e1", timestamp=base + 60_000),  # next minute
        dict(SAMPLE, uuid="e2", timestamp=base + 10 * 60_000),  # +10 min
    ]
    _write_lines(cfg.source_path, [json.dumps(e) for e in events])
    from emr_flink_example_spark.sources.streams import parsed_ad_stream

    _run_to_completion(pipelines.hive_sink(parsed_ad_stream(spark, cfg), cfg))

    root = cfg.hive_s3_path
    assert os.path.isdir(os.path.join(root, "logday=2021-03-31", "h=06", "m=23"))
    assert os.path.isdir(os.path.join(root, "logday=2021-03-31", "h=06", "m=33"))
    with open(os.path.join(root, "_partition_commits.json")) as f:
        ledger = json.load(f)
    committed = {(p["logday"], p["h"], p["m"]) for p in ledger["committed"]}
    pending = {(p["logday"], p["h"], p["m"]) for p in ledger["pending"]}
    # watermark = max(06:33:10) - 5s; commit delay 1 min: 06:23 and 06:24
    # are committed, the newest partition (06:33) is still pending
    assert ("2021-03-31", "06", "23") in committed
    assert ("2021-03-31", "06", "24") in committed
    assert ("2021-03-31", "06", "33") in pending

    # catalog visibility: exactly the committed partitions are registered
    table = f"default.{cfg.hive_table_name}"
    assert spark.catalog.tableExists(table)
    shown = {
        tuple(kv.split("=")[1] for kv in r.partition.split("/"))
        for r in spark.sql(f"SHOW PARTITIONS {table}").collect()
    }
    assert shown == committed
    # and the registered partitions are queryable through the table
    n = spark.sql(
        f"SELECT count(*) AS n FROM {table} WHERE logday='2021-03-31' AND h='06' AND m='23'"
    ).collect()[0]["n"]
    assert n == 1
    spark.sql(f"DROP TABLE {table}")


def test_watermark_drops_late_rows(spark, tmp_path):
    """withWatermark + tumbling window drops rows later than the watermark
    (≙ the declared 5s bounded out-of-orderness, Kafka2S3Hive.scala:70)."""
    src = str(tmp_path / "in")
    _write_lines(src, [json.dumps(dict(SAMPLE, uuid="w0", timestamp=1617171790593))])
    stream = (
        spark.readStream.schema("value string")
        .format("text")
        .load(src)
        .select(F.from_json("value", AD_EVENT_SCHEMA).alias("j"))
        .select("j.*")
        .withColumn("event_time", F.timestamp_seconds(F.floor(F.col("timestamp") / 1000)))
        .withWatermark("event_time", "5 seconds")
        .groupBy(F.window("event_time", "1 minute"))
        .agg(F.count("*").alias("n"))
    )
    qname = f"wm_{int(time.time()*1000)}"
    query = (
        stream.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    query.processAllAvailable()
    # batch 2: an event 1 hour ahead advances the watermark far past batch 1
    _write_lines(src, [json.dumps(dict(SAMPLE, uuid="w1", timestamp=1617171790593 + 3_600_000))], "p1.txt")
    query.processAllAvailable()
    # batch 3: a late event back in the first window -> dropped by watermark
    _write_lines(src, [json.dumps(dict(SAMPLE, uuid="w2", timestamp=1617171790593 + 1))], "p2.txt")
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(30)

    rows = spark.sql(f"SELECT n FROM {qname}").collect()
    # the late row never re-emits the first window with n=2
    assert sorted(r.n for r in rows) == [1, 1]


def test_exactly_once_restart_no_duplicates(spark, tmp_path):
    """Restarting from the checkpoint with no new input produces no dupes
    (≙ EXACTLY_ONCE checkpointing, Kafka2S3Text.scala:64-68)."""
    cfg = _file_cfg(tmp_path)
    _write_lines(cfg.source_path, ["r1", "r2"])
    raw = spark.readStream.format("text").load(cfg.source_path)
    clock = F.lit("2021-04-13 10:00:00").cast("timestamp")
    _run_to_completion(pipelines.text_sink(raw, cfg, clock=clock))
    n1 = spark.read.text(cfg.output_path).count()

    raw2 = spark.readStream.format("text").load(cfg.source_path)
    _run_to_completion(pipelines.text_sink(raw2, cfg, clock=clock))
    n2 = spark.read.text(cfg.output_path).count()
    assert n1 == n2 == 2


def test_streaming_dedup_within_watermark(spark, tmp_path):
    """dropDuplicates on keyed state bounded by the watermark: replayed uuids
    inside the horizon are emitted once."""
    from emr_flink_example_spark.streaming.stateful import streaming_dedup

    src = str(tmp_path / "in")
    dupes = [
        json.dumps(dict(SAMPLE, uuid="d1")),
        json.dumps(dict(SAMPLE, uuid="d1")),
        json.dumps(dict(SAMPLE, uuid="d2")),
        json.dumps(dict(SAMPLE, uuid="d1")),
    ]
    _write_lines(src, dupes)
    parsed = (
        spark.readStream.schema("value string")
        .format("text")
        .load(src)
        .select(F.from_json("value", AD_EVENT_SCHEMA).alias("j"))
        .select("j.*")
        .withColumn("event_time", F.timestamp_seconds(F.floor(F.col("timestamp") / 1000)))
    )
    deduped = streaming_dedup(parsed, ["uuid"], "event_time", "5 seconds")
    qname = f"dedup_{int(time.time()*1000)}"
    query = (
        deduped.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(30)
    rows = spark.sql(f"SELECT uuid FROM {qname}").collect()
    assert sorted(r.uuid for r in rows) == ["d1", "d2"]


def test_running_stats_custom_state_across_batches(spark, tmp_path):
    """applyInPandasWithState: cumulative per-key totals persist across
    micro-batches (file-per-trigger), emitting updated counts each batch."""
    from emr_flink_example_spark.streaming.stateful import running_ad_type_stats

    src = str(tmp_path / "in")
    t0 = SAMPLE["timestamp"]
    _write_lines(src, [json.dumps(dict(SAMPLE, uuid="a", ad_type=7, timestamp=t0))], "b0.txt")
    parsed = (
        spark.readStream.schema("value string")
        .format("text")
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .select(F.from_json("value", AD_EVENT_SCHEMA).alias("j"))
        .select("j.*")
    )
    stats = running_ad_type_stats(parsed)
    qname = f"state_{int(time.time()*1000)}"
    query = (
        stats.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    query.processAllAvailable()
    # second batch: same key again + a new key -> state for 7 must accumulate
    _write_lines(
        src,
        [
            json.dumps(dict(SAMPLE, uuid="b", ad_type=7, timestamp=t0 + 1000)),
            json.dumps(dict(SAMPLE, uuid="c", ad_type=9, timestamp=t0 + 2000)),
        ],
        "b1.txt",
    )
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(30)
    rows = spark.sql(f"SELECT * FROM {qname}").collect()
    latest = {r.ad_type: r for r in sorted(rows, key=lambda r: r.n_events)}
    assert latest[7].n_events == 2, rows
    assert latest[7].ts_min == t0 and latest[7].ts_max == t0 + 1000
    assert latest[9].n_events == 1
    # the key seen in both batches emitted an update each time
    assert sum(1 for r in rows if r.ad_type == 7) == 2


def test_session_window_streaming_matches_batch(spark, tmp_path):
    """The session_window aggregation (batch-checked in the catalog) runs
    unchanged as a streaming query and produces the same sessions."""
    src = str(tmp_path / "in")
    t0 = 1617171790593
    lines = [
        json.dumps(dict(SAMPLE, uuid=f"s{i}", ad_type=1, timestamp=ts))
        for i, ts in enumerate(
            [t0, t0 + 60_000, t0 + 10 * 60_000, t0 + 60 * 60_000]  # 2 sessions (gap 30m)
        )
    ]
    _write_lines(src, lines)

    def sessions(df):
        return (
            df.withColumn("event_time", F.timestamp_seconds(F.floor(F.col("timestamp") / 1000)))
            .withWatermark("event_time", "5 seconds")
            .groupBy("ad_type", F.session_window("event_time", "30 minutes").alias("w"))
            .agg(F.count("*").alias("n_events"))
            .select("ad_type", F.col("w.start").alias("s"), F.col("w.end").alias("e"), "n_events")
        )

    stream = (
        spark.readStream.schema("value string")
        .format("text")
        .load(src)
        .select(F.from_json("value", AD_EVENT_SCHEMA).alias("j"))
        .select("j.*")
    )
    qname = f"sess_{int(time.time()*1000)}"
    query = (
        sessions(stream)
        .writeStream.format("memory")
        .queryName(qname)
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(30)

    batch_df = (
        spark.read.schema("value string").text(src)
        .select(F.from_json("value", AD_EVENT_SCHEMA).alias("j"))
        .select("j.*")
    )
    expected = sorted(
        (r.s, r.e, r.n_events) for r in sessions(batch_df).collect()
    )
    got = sorted((r.s, r.e, r.n_events) for r in spark.sql(f"SELECT * FROM {qname}").collect())
    assert got == expected and len(got) == 2


def test_running_stats_transform_with_state(spark, tmp_path):
    """The transformWithStateInPandas twin accumulates identically across
    micro-batches (Spark 4 StatefulProcessor surface).

    The runtime needs google.protobuf for its state-server protocol; this
    container doesn't ship it, so the test runs wherever the dependency
    exists and skips here (operator code is still import-checked)."""
    pytest.importorskip("google.protobuf")
    from emr_flink_example_spark.streaming.stateful import running_ad_type_stats_tws

    src = str(tmp_path / "in")
    t0 = SAMPLE["timestamp"]
    _write_lines(src, [json.dumps(dict(SAMPLE, uuid="a", ad_type=7, timestamp=t0))], "b0.txt")
    parsed = (
        spark.readStream.schema("value string")
        .format("text")
        .option("maxFilesPerTrigger", 1)
        .load(src)
        .select(F.from_json("value", AD_EVENT_SCHEMA).alias("j"))
        .select("j.*")
    )
    stats = running_ad_type_stats_tws(parsed)
    qname = f"tws_{int(time.time()*1000)}"
    query = (
        stats.writeStream.format("memory")
        .queryName(qname)
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    query.processAllAvailable()
    _write_lines(
        src,
        [
            json.dumps(dict(SAMPLE, uuid="b", ad_type=7, timestamp=t0 + 1000)),
            json.dumps(dict(SAMPLE, uuid="c", ad_type=9, timestamp=t0 + 2000)),
        ],
        "b1.txt",
    )
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(30)
    rows = spark.sql(f"SELECT * FROM {qname}").collect()
    latest = {r.ad_type: r for r in sorted(rows, key=lambda r: r.n_events)}
    assert latest[7].n_events == 2, rows
    assert latest[7].ts_min == t0 and latest[7].ts_max == t0 + 1000
    assert latest[9].n_events == 1


def test_stream_stream_interval_join(spark, tmp_path):
    """Click attribution: stream-stream inner join with watermarks on both
    sides and a two-sided event-time bound (state expires past the horizon).
    A click outside the 10-minute window must not match."""
    from emr_flink_example_spark.streaming.joins import click_attribution

    imp_dir, clk_dir = str(tmp_path / "imp"), str(tmp_path / "clk")
    base = 1617171790
    _write_lines(
        imp_dir,
        [
            json.dumps({"imp_uuid": "ad1", "imp_epoch": base}),
            json.dumps({"imp_uuid": "ad2", "imp_epoch": base}),
        ],
        "i0.txt",
    )
    _write_lines(
        clk_dir,
        [
            json.dumps({"click_uuid": "ad1", "click_epoch": base + 120}),   # in window
            json.dumps({"click_uuid": "ad2", "click_epoch": base + 3600}),  # past horizon
        ],
        "c0.txt",
    )

    def stream(path, schema, ts_out, epoch_col):
        return (
            spark.readStream.schema("value string")
            .format("text")
            .load(path)
            .select(F.from_json("value", schema).alias("j"))
            .select("j.*")
            .withColumn(ts_out, F.timestamp_seconds(F.col(epoch_col)))
            .drop(epoch_col)
        )

    imps = stream(imp_dir, "imp_uuid string, imp_epoch long", "imp_ts", "imp_epoch")
    clks = stream(clk_dir, "click_uuid string, click_epoch long", "click_ts", "click_epoch")
    joined = click_attribution(imps, clks, horizon="10 minutes", watermark="1 minute")
    qname = f"ssj_{int(time.time()*1000)}"
    query = (
        joined.writeStream.format("memory")
        .queryName(qname)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    query.processAllAvailable()
    query.stop()
    query.awaitTermination(30)
    rows = spark.sql(f"SELECT * FROM {qname}").collect()
    assert [r.imp_uuid for r in rows] == ["ad1"]
    assert (rows[0].click_ts - rows[0].imp_ts).total_seconds() == 120


def test_partition_committer_honors_custom_partition_cols(spark, tmp_path):
    """The committer's time extraction derives from timestamp_pattern over
    partition_cols (≙ partition.time-extractor.timestamp-pattern) — not a
    hardcoded (logday, h, m): a (day, hh) hourly layout commits correctly."""
    import pytest

    path = str(tmp_path / "hourly")
    committer = PartitionCommitter(
        table=f"default.hourly_{int(time.time() * 1000)}",
        path=path,
        partition_cols=("day", "hh"),
        commit_delay_seconds=60,
        timestamp_pattern="$day $hh:00:00",
    )
    df = spark.createDataFrame(
        [("a", "2021-03-31", "06"), ("b", "2021-03-31", "08")],
        "uuid string, day string, hh string",
    )
    committer(df, 0)
    with open(os.path.join(path, "_partition_commits.json")) as f:
        ledger = json.load(f)
    committed = {(p["day"], p["hh"]) for p in ledger["committed"]}
    pending = {(p["day"], p["hh"]) for p in ledger["pending"]}
    # watermark = 08:00:00 - 5s lag; 06:00 + 1 min delay <= wm -> committed,
    # the watermark-carrying 08:00 partition itself still pending
    assert committed == {("2021-03-31", "06")}
    assert pending == {("2021-03-31", "08")}
    # 2-col layouts have no default pattern: explicit pattern is required
    with pytest.raises(ValueError, match="timestamp pattern"):
        PartitionCommitter(table="t", path=path, partition_cols=("day", "hh"))


def test_estimate_record_bytes_measures_source(spark, tmp_path):
    """The text sink's bytes->records cap uses an OBSERVED average record
    size (≙ withMaxPartSize rolls on bytes), not a fixed constant."""
    from emr_flink_example_spark.streaming.pipelines import (
        DEFAULT_RECORD_BYTES,
        estimate_record_bytes,
    )

    src = str(tmp_path / "in")
    _write_lines(src, ["x" * 99] * 10)  # 99 chars + newline
    assert estimate_record_bytes(src, spark) == 100
    # unsampleable sources fall back to the documented conservative default
    assert estimate_record_bytes("", spark) == DEFAULT_RECORD_BYTES
    assert estimate_record_bytes(str(tmp_path / "missing"), spark) == DEFAULT_RECORD_BYTES


def test_partition_commit_batches_alter_statements(tmp_path):
    """A commit wave covering many partitions must land in O(n/chunk)
    catalog round-trips, not O(n): Hive DDL accepts many PARTITION clauses
    per ALTER, and at minute granularity a backfill batch can make
    thousands of partitions due at once (the dominant cost of the hive
    pipeline in streambench before batching)."""
    pc = PartitionCommitter(table="t", path=str(tmp_path))
    parts = [
        {"logday": f"2024-01-{d:02d}", "h": "00", "m": f"{m:02d}"}
        for d in (1, 2)
        for m in range(60)
    ]
    sqls = pc._add_partitions_sql(parts)
    assert len(sqls) == 2  # ceil(120 / ALTER_CHUNK=100)
    assert all(s.startswith("ALTER TABLE t ADD IF NOT EXISTS PARTITION") for s in sqls)
    assert sqls[0].count("PARTITION (") == 100 and sqls[1].count("PARTITION (") == 20
    joined = " ".join(sqls)
    assert joined.count("logday='2024-01-01'") == 60
    assert f"LOCATION '{tmp_path}/logday=2024-01-01/h=00/m=05'" in joined
