"""Regression: events loader must adapt to the parquet encoding of `ts`.

Round-3/4 defect: the loader hard-coded one physical encoding (raw int64
epoch-nanos) and broke when the testdata was regenerated with
TIMESTAMP_MICROS. The loader now branches on the observed dtype; both
encodings must produce identical timestamp_ntz values.
"""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from emr_flink_example_spark.io import load

SF_DIR = "/root/testdata/sf0.001"

ROWS = [
    ("u1", "click", datetime.datetime(2024, 1, 1, 0, 0, 0, 123456)),
    ("u2", "view", datetime.datetime(2024, 6, 15, 12, 30, 45, 654321)),
    ("u3", "click", datetime.datetime(2025, 12, 31, 23, 59, 59, 999999)),
]


def _write(tmpdir, ts_array, name):
    path = f"{tmpdir}/{name}/events.parquet"
    table = pa.table(
        {
            "user_id": pa.array([r[0] for r in ROWS]),
            "event_type": pa.array([r[1] for r in ROWS]),
            "ts": ts_array,
        }
    )
    pq.write_table(table, path)
    return f"{tmpdir}/{name}"


@pytest.fixture()
def encoded_dirs(tmp_path_factory):
    tmpdir = tmp_path_factory.mktemp("events_enc")
    (tmpdir / "micros").mkdir()
    (tmpdir / "nanos_int").mkdir()
    micros_dir = _write(
        tmpdir,
        pa.array([r[2] for r in ROWS], type=pa.timestamp("us")),
        "micros",
    )
    # raw int64 epoch-nanos (no logical type) — the legacy testdata encoding
    nanos = [int(r[2].replace(tzinfo=datetime.timezone.utc).timestamp() * 1e6) * 1000 for r in ROWS]
    nanos_dir = _write(tmpdir, pa.array(nanos, type=pa.int64()), "nanos_int")
    return micros_dir, nanos_dir


def test_micros_and_nanos_encodings_agree(spark, encoded_dirs):
    micros_dir, nanos_dir = encoded_dirs
    a = load(spark, str(micros_dir), "events")
    b = load(spark, str(nanos_dir), "events")
    assert a.schema["ts"].dataType.typeName() == "timestamp_ntz"
    assert b.schema["ts"].dataType.typeName() == "timestamp_ntz"
    va = sorted((r.user_id, r.ts) for r in a.collect())
    vb = sorted((r.user_id, r.ts) for r in b.collect())
    assert va == vb
    assert va[0][1] == ROWS[0][2]


def test_millis_encoding_loads(spark, tmp_path):
    """Third writer encoding: parquet TIMESTAMP_MILLIS also normalizes to
    timestamp_ntz (values truncated to the millisecond by the writer)."""
    millis = pa.array(
        [r[2].replace(microsecond=r[2].microsecond // 1000 * 1000) for r in ROWS],
        type=pa.timestamp("ms"),
    )
    d = _write(tmp_path, millis, ".")
    df = load(spark, str(tmp_path), "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    got = sorted(r.ts for r in df.collect())
    want = sorted(r[2].replace(microsecond=r[2].microsecond // 1000 * 1000) for r in ROWS)
    assert got == want


def test_real_testdata_loads_and_matches_duckdb(spark):
    df = load(spark, SF_DIR, "events")
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    n = df.count()
    assert n > 0

    import duckdb

    expect = duckdb.sql(
        f"select count(*), min(ts), max(ts) from '{SF_DIR}/events.parquet'"
    ).fetchone()
    from pyspark.sql import functions as F

    got = df.agg(F.count("*"), F.min("ts"), F.max("ts")).first()
    assert (got[0], got[1], got[2]) == expect
