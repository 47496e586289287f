"""SAX day-domain pin (ADVICE r9): the statistic is defined on the 1..30
grid; a day-31 event must be EXCLUDED from the z-norm moments and the PAA
segments alike — not silently dropped from segments while feeding s1/s2.

Proven two ways on a day-31-bearing fixture:
  1. cross-engine parity still holds (the oracle carries the same guard);
  2. the result is IDENTICAL to the same fixture with the day-31 rows
     deleted — i.e. out-of-grid events have zero influence.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from emr_flink_example_spark.io import TABLES
from emr_flink_example_spark.plans import catalog
from emr_flink_example_spark.testing import compare, connect_oracle

from conftest import SF_DIR


@pytest.fixture(scope="module")
def day31_dirs(tmp_path_factory):
    """Two sf0.001 clones: one with every 10th event RELOCATED to Jan 31
    (out-of-grid), one with those same rows DELETED."""
    d_with = tmp_path_factory.mktemp("sf_day31")
    d_without = tmp_path_factory.mktemp("sf_noday31")
    for t in TABLES:
        src = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t != "events":
            pq.write_table(src, d_with / f"{t}.parquet")
            pq.write_table(src, d_without / f"{t}.parquet")
            continue
        pdf = src.to_pandas()
        moved = pdf.index % 10 == 0
        pdf_with = pdf.copy()
        pdf_with.loc[moved, "ts"] = dt.datetime(2024, 1, 31, 12, 0, 0)
        pdf_without = pdf.loc[~moved]
        pq.write_table(
            pa.Table.from_pandas(pdf_with, preserve_index=False, schema=src.schema),
            d_with / f"{t}.parquet",
        )
        pq.write_table(
            pa.Table.from_pandas(pdf_without, preserve_index=False, schema=src.schema),
            d_without / f"{t}.parquet",
        )
    return str(d_with), str(d_without)


def _canon(rows):
    return sorted(tuple(r) for r in rows)


def test_sax_day31_excluded_and_parity(spark, day31_dirs):
    d_with, d_without = day31_dirs
    qs, os_ = catalog.all_queries(), catalog.all_oracles()
    name = "timeseries_sax_words"

    # (1) engines agree on the day-31-bearing fixture
    ok, msg = compare(spark, connect_oracle(d_with), qs[name], os_[name], d_with)
    assert ok, f"{name} parity on day-31 fixture: {msg}"

    # (2) day-31 events have no influence: relocated == deleted.
    # NOTE: users whose ONLY events moved to day 31 still appear (with a
    # NULL word is wrong — they must vanish entirely, same as deletion).
    rows_with = _canon(qs[name](spark, d_with).collect())
    rows_without = _canon(qs[name](spark, d_without).collect())
    assert rows_with == rows_without
