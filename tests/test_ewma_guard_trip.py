"""EWMA-crossover headroom guard trip (VERDICT r9 #6): a user whose daily
cents exceed the 2^52 exact-double bound must NULL their signals LOUDLY
(headroom_ok = false) on BOTH engines, while every other user's rows are
untouched. The guard is log2(max_v) + N_DAYS - 2 < 52, so max_v >= 2^24
cents (~$168k/day) trips it on the 30-day grid.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from emr_flink_example_spark.io import TABLES
from emr_flink_example_spark.plans import catalog
from emr_flink_example_spark.testing import compare, connect_oracle

from conftest import SF_DIR

#: dollars; floor(1e9 * 100) = 1e11 cents, log2 ~ 36.5 >> 24
HUGE_VALUE = 1_000_000_000.0


@pytest.fixture(scope="module")
def huge_value_dir(tmp_path_factory):
    """sf0.001 clone where ONE user's first event carries a guard-tripping
    value; returns (dir, tripped_user_id)."""
    d = tmp_path_factory.mktemp("sf_huge")
    tripped_user = None
    for t in TABLES:
        src = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "events":
            pdf = src.to_pandas()
            tripped_user = int(pdf["user_id"].iloc[0])
            pdf.loc[pdf.index[:1], "value"] = HUGE_VALUE
            src = pa.Table.from_pandas(pdf, preserve_index=False, schema=src.schema)
        pq.write_table(src, d / f"{t}.parquet")
    return str(d), tripped_user


def test_ewma_guard_trips_loudly_and_engines_agree(spark, huge_value_dir):
    d, tripped = huge_value_dir
    qs, os_ = catalog.all_queries(), catalog.all_oracles()
    name = "timeseries_ewma_crossover"

    # engines agree on the guard-tripping fixture (the guard is mirrored)
    ok, msg = compare(spark, connect_oracle(d), qs[name], os_[name], d)
    assert ok, f"{name} parity on guard-trip fixture: {msg}"

    rows = qs[name](spark, d).collect()
    tripped_rows = [r for r in rows if r.user_id == tripped]
    other_rows = [r for r in rows if r.user_id != tripped]
    assert tripped_rows and other_rows
    for r in tripped_rows:  # loud NULLs, never a silently-wrong number
        assert r.headroom_ok is False
        assert r.ewma_micro is None
        assert r.above_sma is None
        assert r.is_crossover is None
    assert all(r.headroom_ok for r in other_rows)
    assert any(r.ewma_micro is not None for r in other_rows)
