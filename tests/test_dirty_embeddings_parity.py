"""Dirty-EMBEDDINGS engine parity (r12, VERDICT r11 #4): the embeddings
axis of the dirty-fixture discipline — NULL vectors, all-zero vectors,
and SHORT (wrong-dimension) vectors.

io.load's ingestion contract excludes NULL and wrong-dim vectors (a
fixed-dim index cannot score them; ANSI element_at would throw mid-fold)
and `testing.connect_oracle` mirrors the predicate; all-zero vectors
pass the contract and are handled per-operator by the cosine family's
documented exclusion. This test keeps a representative embedding-family
set green per run; re-run the full sweep (tools/dirty_fixtures.py
embeddings + selfcheck) when touching similarity operators.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from emr_flink_example_spark.plans import catalog
from emr_flink_example_spark.testing import compare, connect_oracle

from conftest import SF_DIR

#: exact + every ANN tier family + quantization + clustering diagnostics
PARITY_SET = (
    "knn_bruteforce",
    "ann_lsh_topk",
    "ann_ivf_topk",
    "ann_pq_adc_topk",
    "embedding_quantize_pq",
    "embedding_quantize_int8",
    "embedding_centroids",
    "embedding_hard_negatives",
    "dedup_embedding_cosine",
)


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    from tools.dirty_fixtures import make_dirty_embeddings

    d = tmp_path_factory.mktemp("sf_dirty_embeddings")
    make_dirty_embeddings(SF_DIR, str(d))
    return str(d)


@pytest.mark.parametrize("name", PARITY_SET)
def test_dirty_embeddings_parity(spark, dirty_dir, name):
    qs, os_ = catalog.all_queries(), catalog.all_oracles()
    ok, msg = compare(spark, connect_oracle(dirty_dir), qs[name], os_[name], dirty_dir)
    assert ok, f"{name} engine parity on dirty embeddings: {msg}"


def test_null_and_short_vectors_excluded_by_contract(spark, dirty_dir):
    from emr_flink_example_spark.io import EMB_DIM, load

    df = load(spark, dirty_dir, "embeddings")
    n_spark = df.count()
    con = connect_oracle(dirty_dir)
    assert n_spark == con.execute("SELECT count(*) FROM embeddings").fetchone()[0]
    raw = pq.read_table(f"{dirty_dir}/embeddings.parquet").num_rows
    assert n_spark < raw  # nulls and short vectors really were dropped
    from pyspark.sql import functions as F

    assert df.where(F.size("embedding") != EMB_DIM).count() == 0
