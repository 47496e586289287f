"""Property tests for the r7-continuation statistics operators: CUSUM
changepoints, autocorrelation, the equi-depth histogram, and the KS drift
audit.

The DuckDB differential (tools/selfcheck.py) proves value equality with the
oracle SQL; these pin the semantic identities each restatement relies on —
the prefix-sum form of the CUSUM recurrence, ACF against a direct numpy
reference, equi-depth bucket mass bounds, and KS against a brute-force ECDF
scan.
"""

from __future__ import annotations

import numpy as np

from emr_flink_example_spark.operators.relational import (
    HIST_EQD_K,
    q_histogram_equidepth,
)
from emr_flink_example_spark.operators.sampling import q_quality_drift_ks
from emr_flink_example_spark.operators.timeseries import (
    ACF_LAGS,
    CUSUM_REL_DEN,
    q_timeseries_acf,
    q_timeseries_cusum_changepoint,
)

from conftest import SF_DIR


def test_cusum_matches_the_sequential_recurrence(spark):
    """The window restatement C_i = P_i - min_{j<=i} P_j must equal the
    textbook fold C_i = max(0, C_{i-1} + (x_i - mu)), scaled by L."""
    rows = q_timeseries_cusum_changepoint(spark, SF_DIR).collect()
    assert rows
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, series in by_type.items():
        series.sort(key=lambda r: r.bucket)
        ln = len(series)
        tot = sum(r.n_events for r in series)
        c_up = 0
        c_down = 0
        for r in series:
            # scaled residual: L*x - T == L*(x - mu)
            resid = ln * r.n_events - tot
            c_up = max(0, c_up + resid)
            c_down = max(0, c_down - resid)
            assert r.cusum_up == c_up, (et, r.bucket)
            assert r.cusum_down == c_down, (et, r.bucket)
            assert r.is_shift_up == (c_up * CUSUM_REL_DEN > ln * tot)
            assert r.is_shift_down == (c_down * CUSUM_REL_DEN > ln * tot)
        # a CUSUM against the series' own mean ends at exactly zero drift:
        # the final prefix sum is zero, so up-excursion = -min(prefix)
        assert series[-1].cusum_up >= 0 and series[-1].cusum_down >= 0


def test_acf_matches_numpy_reference(spark):
    rows = q_timeseries_acf(spark, SF_DIR).collect()
    assert rows
    # rebuild each dense series from the CUSUM query (same grid)
    dense = q_timeseries_cusum_changepoint(spark, SF_DIR).collect()
    by_type: dict[str, list] = {}
    for r in dense:
        by_type.setdefault(r.event_type, []).append(r)
    series = {
        et: np.array(
            [r.n_events for r in sorted(v, key=lambda r: r.bucket)], dtype=float
        )
        for et, v in by_type.items()
    }
    assert {r.lag for r in rows} == set(ACF_LAGS)
    for r in rows:
        x = series[r.event_type]
        m = x.mean()
        den = ((x - m) ** 2).sum()
        num = ((x[: -r.lag] - m) * (x[r.lag :] - m)).sum()
        assert r.n_pairs == len(x) - r.lag
        ref = num / den
        assert abs(r.acf_micro / 1e6 - ref) < 2e-6, (r.event_type, r.lag)
        assert -1_100_000 <= r.acf_micro <= 1_000_000


def test_equidepth_buckets_have_near_equal_mass_and_ordered_ranges(spark):
    rows = sorted(q_histogram_equidepth(spark, SF_DIR).collect(), key=lambda r: r.bucket)
    assert [r.bucket for r in rows] == list(range(HIST_EQD_K))
    n = sum(r.n_orders for r in rows)
    lo, hi = n // HIST_EQD_K, -(-n // HIST_EQD_K)
    for r in rows:
        assert lo <= r.n_orders <= hi, r
        assert r.bucket_min <= r.bucket_max
    # bucket value ranges must tile the axis in order (ties may share a
    # boundary value but never invert)
    for a, b in zip(rows, rows[1:]):
        assert a.bucket_max <= b.bucket_min


def test_ks_matches_bruteforce_ecdf(spark):
    from emr_flink_example_spark.operators.sampling import (
        SPLIT_SALT,
        TRAIN_PCT,
        VAL_PCT,
        q_split_train_val_test,
    )
    from emr_flink_example_spark.io import load

    out = q_quality_drift_ks(spark, SF_DIR).collect()
    assert len(out) == 1
    r = out[0]
    split = {
        row.doc_id: row.split for row in q_split_train_val_test(spark, SF_DIR).collect()
    }
    docs = load(spark, SF_DIR, "documents").select("doc_id", "n_chars").collect()
    a = sorted(d.n_chars for d in docs if split[d.doc_id] == "train")
    b = sorted(d.n_chars for d in docs if split[d.doc_id] == "val")
    assert (r.n_a, r.n_b) == (len(a), len(b))
    na, nb = len(a), len(b)
    best = -1
    best_v = None
    for v in sorted(set(a) | set(b)):
        ca = sum(1 for x in a if x <= v)
        cb = sum(1 for x in b if x <= v)
        d = abs(ca * nb - cb * na)
        if d > best:
            best, best_v = d, v
    assert r.ks_scaled == best
    assert r.ks_at_n_chars == best_v or best == 0
    assert r.ks_micro == int(np.floor(best / (na * nb) * 1e6 + 0.5))
