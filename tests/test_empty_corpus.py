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


@pytest.fixture(scope="module")
def nully_sf_dir(tmp_path_factory):
    """sf0.001 clone with every 5th document's text NULL'd — the routine
    dirty-lake input the ingestion contract (io.load coalesces text to '')
    must absorb."""
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_nulls")
    for t in TABLES:
        src = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "documents":
            import pandas as pd

            pdf = src.to_pandas()
            pdf.loc[pdf.index % 5 == 0, "text"] = None
            src = pa.Table.from_pandas(pdf, preserve_index=False, schema=src.schema)
        pq.write_table(src, d / f"{t}.parquet")
    return str(d)


def test_all_queries_survive_null_text(spark, nully_sf_dir):
    """The whole catalog runs on null-bearing text (empty docs included),
    and the size(NULL) = -1 sentinel never surfaces as a token count."""
    qs = catalog.all_queries()
    failures = {}
    for name, fn in qs.items():
        try:
            fn(spark, nully_sf_dir).collect()
        except Exception as exc:
            failures[name] = f"{type(exc).__name__}: {exc}"[:160]
    assert not failures, f"{len(failures)} queries crash on null text: {failures}"
    rows = qs["text_quality"](spark, nully_sf_dir).collect()
    assert all(r.n_tokens >= 0 for r in rows)


def test_audio_oracle_parity_on_empty_payloads(spark, nully_sf_dir):
    """ADVICE r9: an empty text payload must emit ZERO audio windows in
    BOTH engines. The Spark kernels' `while start < n` loop emits nothing
    for n=0; the oracles' generate_series(0, greatest(n-1,0)) used to emit
    a phantom win_idx=0 row until the `WHERE n > 0` guard. Cross-engine
    hash parity on the null-text fixture (io.load coalesces NULL -> '')
    proves the guard closes the divergence."""
    from emr_flink_example_spark.plans import catalog
    from emr_flink_example_spark.testing import compare, connect_oracle

    qs, os_ = catalog.all_queries(), catalog.all_oracles()
    con = connect_oracle(nully_sf_dir)
    for name in ("multimodal_audio_windows", "multimodal_audio_fingerprint"):
        ok, msg = compare(spark, con, qs[name], os_[name], nully_sf_dir)
        assert ok, f"{name}: {msg}"


@pytest.fixture(scope="module")
def null_embedding_dir(tmp_path_factory):
    """sf0.001 clone with every 7th embedding NULL'd — excluded by the
    io.load ingestion contract (a NULL vector has no meaningful coalesce)."""
    import pandas as pd
    import pyarrow as pa

    d = tmp_path_factory.mktemp("sf_null_emb")
    for t in TABLES:
        src = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "embeddings":
            pdf = src.to_pandas()
            pdf.loc[pdf.index % 7 == 0, "embedding"] = None
            src = pa.Table.from_pandas(pdf, preserve_index=False, schema=src.schema)
        pq.write_table(src, d / f"{t}.parquet")
    return str(d)


def test_embedding_queries_survive_null_vectors(spark, null_embedding_dir):
    emb_queries = [
        n
        for n in catalog.all_queries()
        if n.startswith(("ann_", "knn_", "embedding_")) or "cosine" in n
    ]
    assert len(emb_queries) >= 15
    qs = catalog.all_queries()
    failures = {}
    for name in emb_queries:
        try:
            qs[name](spark, null_embedding_dir).collect()
        except Exception as exc:
            failures[name] = f"{type(exc).__name__}: {exc}"[:160]
    assert not failures, failures
