"""Independent value pin for the power-iteration PCA trainer.

`q_embedding_pca_power` HAS a DuckDB oracle (the fixed rounds unroll into
CTEs), but like the Lloyd trainers it also deserves an engine-independent
check: this replays the exact protocol — uniform 1/8 init, per-round
64-scalar avg rounded to 6 dp, left-assoc normalize, Rayleigh eigenvalue —
in numpy and compares, then sanity-checks the result against numpy's own
eigendecomposition of the sample covariance.
"""

from __future__ import annotations

import numpy as np

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators.similarity import (
    PCA_ITERS,
    q_embedding_pca_power,
)

from conftest import SF_DIR


def _numpy_power(M: np.ndarray, iters: int) -> tuple[np.ndarray, float, float]:
    mu = np.round(M.mean(axis=0), 6)
    X = M - mu
    v = np.full(M.shape[1], 0.125)
    for _ in range(iters):
        dot = X @ v
        s = np.round((X * dot[:, None]).mean(axis=0), 6)
        norm = np.sqrt((s * s).sum())
        v = np.round(s / norm, 6)
    dot = X @ v
    lam = round(float((dot * dot).mean()), 6)
    total_var = float(np.round((X * X).mean(axis=0), 6).sum())
    return v, lam, total_var


def test_pca_power_matches_numpy(spark):
    rows = load(spark, SF_DIR, "embeddings").select("embedding").collect()
    M = np.stack([np.array(r.embedding, dtype=float) for r in rows])

    out = {r.dim: r for r in q_embedding_pca_power(spark, SF_DIR).collect()}
    assert len(out) == M.shape[1]
    v, lam, total_var = _numpy_power(M, PCA_ITERS)
    got_v = np.array([out[d].loading for d in range(M.shape[1])])
    # 6-dp rounding each round synchronizes the implementations; 2e-6
    # tolerates a final-ulp flutter in the last round's mean
    assert np.abs(got_v - v).max() <= 2e-6
    assert abs(out[0].eigenvalue - lam) <= 2e-6
    assert abs(out[0].explained_frac - lam / total_var) <= 2e-6

    # the fitted vector is unit-norm and its Rayleigh quotient approaches
    # the true top eigenvalue of the sample covariance from below
    assert abs((got_v * got_v).sum() - 1.0) <= 1e-4
    X = M - np.round(M.mean(axis=0), 6)
    cov = (X.T @ X) / len(M)
    top = float(np.linalg.eigvalsh(cov)[-1])
    assert out[0].eigenvalue <= top + 1e-6
    # power iteration should have captured a nontrivial share of the top
    # eigendirection even on near-isotropic synthetic data
    assert out[0].eigenvalue >= 0.5 * top
