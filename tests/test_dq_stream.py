"""Streaming DQ monitor: per-batch mergeable metrics, planted violations
counted exactly, replay idempotency (the hll/cms sink contract)."""

from __future__ import annotations

from emr_flink_example_spark.streaming.dq_stream import StreamingDQMonitor

SCHEMA = "uuid string, date string, timestamp bigint"


def _batch(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_planted_violations_counted(spark, tmp_path):
    mon = StreamingDQMonitor(str(tmp_path / "m"))
    b0 = [
        ("a", "2021-04-13", 1000),
        ("b", "2021-04-13", 2000),
        (None, "2021-04-13", 1500),      # null id
        ("b", "", 0),                     # dup id + empty date + bad ts
        ("c", None, -5),                  # null date + bad ts
    ]
    mon(_batch(spark, b0), 0)
    row = mon.metrics(spark).collect()[0]
    assert row.n_rows == 5
    assert row.n_null_id == 1
    assert row.n_dup_id == 1
    assert row.n_bad_ts == 2
    assert row.n_empty_date == 2
    assert row.min_ts == -5 and row.max_ts == 2000


def test_summary_merges_batches_exactly(spark, tmp_path):
    mon = StreamingDQMonitor(str(tmp_path / "m"))
    mon(_batch(spark, [("a", "d", 10), ("b", "d", 20)]), 0)
    mon(_batch(spark, [("c", "d", 5), (None, "d", 30)]), 1)
    s = mon.summary(spark).collect()[0]
    assert s.n_batches == 2
    assert s.n_rows == 4 and s.n_null_id == 1
    assert s.min_ts == 5 and s.max_ts == 30
    alerts = mon.alerts(spark).collect()
    assert [r.batch_id for r in alerts] == [1]


def test_replay_is_idempotent(spark, tmp_path):
    mon = StreamingDQMonitor(str(tmp_path / "m"))
    b1 = _batch(spark, [("a", "d", 10), ("a", "d", 11)])
    mon(_batch(spark, [("z", "d", 1)]), 0)
    mon(b1, 1)
    before = sorted(map(tuple, mon.metrics(spark).collect()))
    mon(b1, 1)  # checkpoint replay
    after = sorted(map(tuple, mon.metrics(spark).collect()))
    assert after == before
    assert mon.summary(spark).collect()[0].n_rows == 3


def test_streaming_end_to_end(spark, tmp_path):
    import json

    src = str(tmp_path / "in")
    import os

    os.makedirs(src)
    with open(os.path.join(src, "p0.json"), "w") as f:
        for i in range(4):
            f.write(json.dumps({"uuid": f"u{i}", "date": "2021-04-13", "timestamp": 1000 + i}) + "\n")
    from emr_flink_example_spark.streaming.dq_stream import dq_monitor_sink
    from pyspark.sql import functions as F

    rows = (
        spark.readStream.schema("value string")
        .format("text")
        .load(src)
        .select(F.from_json("value", SCHEMA).alias("j"))
        .select("j.*")
    )
    q = dq_monitor_sink(rows, str(tmp_path / "m"), str(tmp_path / "ckpt"))
    q.processAllAvailable()
    q.stop()
    q.awaitTermination(30)
    mon = StreamingDQMonitor(str(tmp_path / "m"))
    s = mon.summary(spark).collect()[0]
    assert s.n_rows == 4 and s.n_null_id == 0
    assert mon.alerts(spark).count() == 0
