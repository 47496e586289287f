"""DATA CONTRACTS on the embeddings fixture (ADVICE r6).

Two latent couplings in the ANN/dedup family are guaranteed only by fixture
properties, so pin them here (the events.value non-negativity pattern,
test_interp_identity.py):

  * NO ALL-ZERO VECTORS — the Spark queries exclude all-zero embeddings
    (cosine undefined) while several oracles (`_mmr_oracle`,
    `_ivf_cent_ctes`, `_ivfpq_residual_oracle`) build candidates from the
    unfiltered table; a zero vector would yield NaN cosine in DuckDB,
    which sorts first under ORDER BY DESC and would silently diverge the
    shortlists.
  * CONTIGUOUS vec_ids 0..n-1 — the k-means id mapping itself is now
    gap-safe by construction (both engines renumber the k smallest seed
    ids positionally — `subspace_kmeans_fit` / `_train_ctes`, ADVICE r6),
    but the `vec_id < 10` query-set convention and the bit-equality pins
    against numpy (which index fixtures positionally) still assume the
    generated fixtures keep dense ids; this pin makes a generator change
    fail loudly here instead of as a cryptic hash mismatch.

Checked at every generated SF, since the driver's gate and the selfcheck
sweeps run at different SFs.
"""

from __future__ import annotations

import os

import duckdb
import pytest

SFS = [
    d
    for d in ("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1")
    if os.path.exists(os.path.join(d, "embeddings.parquet"))
]


@pytest.mark.parametrize("sf", SFS)
def test_no_all_zero_embeddings(sf):
    con = duckdb.connect()
    n = con.execute(
        f"""
        SELECT count(*) FROM read_parquet('{sf}/embeddings.parquet')
        WHERE NOT EXISTS (SELECT 1 FROM unnest(embedding) AS t(x) WHERE x <> 0)
        """
    ).fetchone()[0]
    assert n == 0, f"{n} all-zero embedding vectors at {sf}"


@pytest.mark.parametrize("sf", SFS)
def test_vec_ids_contiguous_from_zero(sf):
    con = duckdb.connect()
    lo, hi, nd, n = con.execute(
        f"""
        SELECT min(vec_id), max(vec_id), count(DISTINCT vec_id), count(*)
        FROM read_parquet('{sf}/embeddings.parquet')
        """
    ).fetchone()
    assert (lo, hi, nd) == (0, n - 1, n), (lo, hi, nd, n)
