"""Sample-bounded codebook training pins (VERDICT r6 #4).

`subspace_kmeans_fit` trains on a deterministic hash-sample of at most
~TRAIN_SAMPLE_CAP vectors (rate = ceil(n/cap), keep hash(vec_id) % rate
== 0), and the DuckDB oracle chain (`_train_ctes`) computes the identical
rate and predicate in SQL. Every fixture is far below the default cap, so
the production queries never sample (rate == 1, row-identical on both
sides); these tests FORCE rate > 1 with a small cap and pin:

  * cross-engine bit-equality — Spark's sampled training == the oracle
    chain's sampled re-train, float for float;
  * numpy bit-equality — an independent Lloyd over the same hash-sampled
    subset reproduces the codebook;
  * the sample itself — exact membership of the hash predicate, and the
    identity shortcut when the corpus fits the cap.
"""

from __future__ import annotations

import hashlib

import numpy as np
from pyspark.sql import functions as F

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators import similarity as S
from emr_flink_example_spark.testing import connect_oracle

from conftest import SF_DIR
from test_pq_training import _np_subspace_lloyd

CAP = 100  # sf0.001 has 500 embeddings -> rate = 5


def _py_hash(v: int) -> int:
    """portable_hash in pure python (functions/hashing.py contract)."""
    return int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)


def _base(spark):
    return load(spark, SF_DIR, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )


def test_default_cap_is_identity_on_fixtures(spark):
    base = _base(spark)
    assert S._train_sample(base) is base  # rate == 1: no filter, no barrier


def test_sample_membership_is_exact(spark):
    base = _base(spark)
    n = base.count()
    rate = (n + CAP - 1) // CAP
    assert rate > 1
    got = {r.vec_id for r in S._train_sample(base, CAP).select("vec_id").collect()}
    want = {i for i in range(n) if _py_hash(i) % rate == 0}
    assert got == want and 0 < len(got) < n


def test_sampled_training_cross_engine(spark):
    """The load-bearing pin: with rate > 1, Spark's sampled codebook must
    equal the oracle chain's sampled re-train float-for-float — this is
    what keeps every PQ/ADC/IVF oracle hash-green the day a corpus
    actually exceeds TRAIN_SAMPLE_CAP."""
    con = connect_oracle(SF_DIR)
    for (n_sub, sub_dim, k) in [(1, S.DIM, S.N_CENTROIDS), (S.PQ_M, S.PQ_SUB_DIM, S.PQ_K)]:
        got = S.subspace_kmeans_fit(_base(spark), n_sub, sub_dim, k, sample_cap=CAP)
        sql = f"""
            WITH base AS (
                SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
            ), {S._train_ctes(n_sub, sub_dim, k, prefix="s_", sample_cap=CAP)}
            SELECT k, cvec FROM s_cwk ORDER BY k
        """
        want = [list(r[1]) for r in con.execute(sql).fetchall()]
        assert got == want, (n_sub, sub_dim, k)


def test_sampled_training_matches_numpy(spark):
    rows = (
        load(spark, SF_DIR, "embeddings")
        .select("vec_id", "embedding")
        .orderBy("vec_id")
        .collect()
    )
    n = len(rows)
    rate = (n + CAP - 1) // CAP
    X = np.stack(
        [np.array(r.embedding, dtype=float) for r in rows if _py_hash(r.vec_id) % rate == 0]
    )
    got = np.array(S.subspace_kmeans_fit(_base(spark), 1, S.DIM, S.N_CENTROIDS, sample_cap=CAP))
    want = _np_subspace_lloyd(X, 1, S.DIM, S.N_CENTROIDS, S.PQ_TRAIN_ITERS)
    assert got.shape == want.shape
    assert np.abs(got - want).max() <= 2e-6
