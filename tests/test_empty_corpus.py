"""Robustness: every catalog query must run (possibly to an empty result)
against 0-row tables with the production schemas.

On a real lake, partition pruning or a fresh ingest regularly hands an
operator zero rows; a query that crashes on empty input is a paging
incident, not a wrong answer. Schemas are cloned from the sf0.001 fixtures
so column types match exactly.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from emr_flink_example_spark.io import TABLES
from emr_flink_example_spark.plans import catalog

from conftest import SF_DIR


@pytest.fixture(scope="module")
def empty_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("sf_empty")
    for t in TABLES:
        src = pq.read_table(f"{SF_DIR}/{t}.parquet")
        pq.write_table(src.slice(0, 0), d / f"{t}.parquet")
    return str(d)


def test_all_queries_survive_empty_corpus(spark, empty_sf_dir):
    failures = {}
    for name, fn in catalog.all_queries().items():
        try:
            rows = fn(spark, empty_sf_dir).collect()
            assert isinstance(rows, list)
        except Exception as exc:  # collect everything, report once
            failures[name] = f"{type(exc).__name__}: {exc}"[:160]
    assert not failures, f"{len(failures)} queries crash on empty input: {failures}"
