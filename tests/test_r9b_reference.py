"""Independent value pins for the r9 continuation operators (Spearman,
Gini/Lorenz, Cramér's V): pure-Python reference implementations so a
formula transcribed identically into BOTH engines cannot hide a shared
mistake (the test_r8_reference discipline).
"""

from __future__ import annotations

import math
from collections import Counter

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators.analytics import (
    LORENZ_BUCKETS,
    q_abtest_cramers_v,
    q_revenue_gini_lorenz,
    q_stats_spearman_corr,
)

from conftest import SF_DIR


def _avg_ranks_doubled(values: list[int]) -> dict[int, int]:
    """value -> doubled average rank (2 * mean rank of its tie block)."""
    out: dict[int, int] = {}
    cum = 0
    for v, t in sorted(Counter(values).items()):
        out[v] = 2 * cum + t + 1
        cum += t
    return out


def test_spearman_matches_pure_python(spark):
    rows = (
        load(spark, SF_DIR, "events")
        .select("user_id", "value")
        .collect()
    )
    agg: dict[int, list[int]] = {}
    for r in rows:
        x, y = agg.setdefault(r.user_id, [0, 0])
        agg[r.user_id] = [x + 1, y + math.floor(r.value * 1000000 + 0.5)]
    xs = [v[0] for v in agg.values()]
    ys = [v[1] for v in agg.values()]
    rx, ry = _avg_ranks_doubled(xs), _avg_ranks_doubled(ys)
    r2x = [rx[x] for x in xs]
    r2y = [ry[y] for y in ys]
    n = len(agg)
    sx, sy = sum(r2x), sum(r2y)
    sxx = sum(v * v for v in r2x)
    syy = sum(v * v for v in r2y)
    sxy = sum(a * b for a, b in zip(r2x, r2y))
    got = q_stats_spearman_corr(spark, SF_DIR).first()
    assert got.n_users == n
    assert got.headroom_ok is True
    assert got.sxy == sxy
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = math.sqrt(
        (float(n) * float(sxx) - float(sx) * float(sx))
        * (float(n) * float(syy) - float(sy) * float(sy))
    )
    rho = num / den
    assert got.rho_micro == math.floor(rho * 1000000.0 + 0.5)
    # sanity: doubled ranks of n items always sum to n*(n+1)
    assert sx == n * (n + 1) and sy == n * (n + 1)
    assert -1_000_000 <= got.rho_micro <= 1_000_000


def test_gini_lorenz_matches_pure_python(spark):
    rows = load(spark, SF_DIR, "orders").select("o_custkey", "o_totalprice").collect()
    rev: dict[int, int] = {}
    for r in rows:
        rev[r.o_custkey] = rev.get(r.o_custkey, 0) + math.floor(
            r.o_totalprice * 100 + 0.5
        )
    ordered = sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))
    xs = [c for _, c in ordered]
    n, total = len(xs), sum(xs)
    g2 = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    gini = g2 / (n * total)
    got = {r.bucket: r for r in q_revenue_gini_lorenz(spark, SF_DIR).collect()}
    assert len(got) == LORENZ_BUCKETS
    assert all(r.headroom_ok for r in got.values())
    assert got[1].gini_micro == math.floor(gini * 1000000.0 + 0.5)
    # ntile(k) bucket b holds rows (b-1)*n//k+1 .. b*n//k with the first
    # n % k buckets one longer — recompute the bucket sums independently
    base, extra = divmod(n, LORENZ_BUCKETS)
    start = 0
    cum = 0
    for b in range(1, LORENZ_BUCKETS + 1):
        size = base + (1 if b <= extra else 0)
        chunk = xs[start : start + size]
        start += size
        cum += sum(chunk)
        assert got[b].n_customers == size
        assert got[b].revenue_cents == sum(chunk)
        assert got[b].cum_share_micro == math.floor(
            cum / total * 1000000.0 + 0.5
        )
    assert got[LORENZ_BUCKETS].cum_share_micro == 1_000_000
    # Lorenz curve is convex from below: shares weakly increase by bucket
    shares = [got[b].revenue_cents / got[b].n_customers for b in range(1, 11)]
    assert shares == sorted(shares)


def test_cramers_v_matches_pure_python(spark):
    rows = (
        load(spark, SF_DIR, "events").select("event_type", "user_id").collect()
    )
    cells: Counter = Counter((r.event_type, r.user_id % 2) for r in rows)
    types = sorted({t for t, _ in cells})
    arms = sorted({a for _, a in cells})
    n = sum(cells.values())
    row_n = {t: sum(cells[(t, a)] for a in arms) for t in types}
    col_n = {a: sum(cells[(t, a)] for t in types) for t in types for a in arms}
    chi2_micro = 0
    for t in types:
        for a in arms:
            e = row_n[t] * col_n[a] / n
            o = cells.get((t, a), 0)
            chi2_micro += math.floor((o - e) * (o - e) / e * 1000000.0 + 0.5)
    got = q_abtest_cramers_v(spark, SF_DIR).first()
    assert (got.n_rows, got.n_cols, got.n_total) == (len(types), len(arms), n)
    assert got.chi2_micro == chi2_micro
    v = math.sqrt(
        chi2_micro / 1000000.0 / (n * (min(len(types), len(arms)) - 1))
    )
    assert got.cramers_v_micro == math.floor(v * 1000000.0 + 0.5)
    assert 0 <= got.cramers_v_micro <= 1_000_000
