"""Permutation-test degenerate-split pin (ADVICE r10): when the observed
k=0 split (user_id % 2) leaves an arm empty — a one-sided population of
all-even user_ids — stat_obs_micro is NULL and BOTH engines must report
NULL n_ge and NULL p_micro. Before the guard, Spark's
``if(stat_micro >= NULL, 1, 0)`` silently returned 0 per row (n_ge=0,
p_micro non-NULL) while DuckDB's sum over all-NULL comparisons returned
NULL — an engine-equality break on degenerate input.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from emr_flink_example_spark.io import TABLES
from emr_flink_example_spark.plans import catalog
from emr_flink_example_spark.testing import compare, connect_oracle

from conftest import SF_DIR


@pytest.fixture(scope="module")
def one_sided_dir(tmp_path_factory):
    """sf0.001 clone where every events.user_id is forced even, so the
    observed (k=0) arm assignment user_id % 2 never produces arm 1."""
    d = tmp_path_factory.mktemp("sf_onesided")
    for t in TABLES:
        src = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t != "events":
            pq.write_table(src, d / f"{t}.parquet")
            continue
        pdf = src.to_pandas()
        pdf["user_id"] = pdf["user_id"] * 2
        pq.write_table(
            pa.Table.from_pandas(pdf, preserve_index=False, schema=src.schema),
            d / f"{t}.parquet",
        )
    return str(d)


def test_degenerate_split_is_null_in_both_engines(spark, one_sided_dir):
    qs, os_ = catalog.all_queries(), catalog.all_oracles()
    name = "abtest_permutation_test"

    ok, msg = compare(
        spark, connect_oracle(one_sided_dir), qs[name], os_[name], one_sided_dir
    )
    assert ok, f"{name} parity on one-sided fixture: {msg}"

    row = qs[name](spark, one_sided_dir).collect()[0]
    assert row.stat_obs_micro is None
    assert row.n_ge is None
    assert row.p_micro is None
    assert row.n_perms > 0
