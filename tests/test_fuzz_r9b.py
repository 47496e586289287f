"""Property tests for the r9-continuation statistics: each new oracle
form fuzzed against a pure-Python exact reference over synthetic corpora
(tie-heavy, degenerate, and gap cases the fixtures never produce) — the
test_fuzz_r9 discipline, DuckDB-side so hypothesis can run hundreds of
tiny cases without a Spark round-trip per example.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from emr_flink_example_spark.operators.analytics import (
    ORACLES as A_ORACLES,
)
from emr_flink_example_spark.operators.analytics import (
    LORENZ_BUCKETS,
)
from emr_flink_example_spark.operators.textstats import (
    ORACLES as T_ORACLES,
)

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _events_con(rows: list[tuple[int, int, str, float]]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE,"
        " ts TIMESTAMP DEFAULT TIMESTAMP '2024-01-01 00:00:00')"
    )
    if rows:
        con.executemany(
            "INSERT INTO events (event_id, user_id, event_type, value)"
            " VALUES (?, ?, ?, ?)",
            rows,
        )
    return con


def _row(con, sql) -> dict:
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return dict(zip(cols, cur.fetchone()))


def _avg_ranks_doubled(values):
    out, cum = {}, 0
    for v, t in sorted(Counter(values).items()):
        out[v] = 2 * cum + t + 1
        cum += t
    return out


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=9),
                  st.integers(min_value=1, max_value=3)),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_spearman_ties_fuzz(user_events):
    """Users emit 1-3 events with single-digit values — dense ties in
    BOTH rank sets. The oracle must equal the exact doubled-rank
    reference, including the all-tied degenerate (zero rank variance ->
    NULL rho)."""
    rows = []
    eid = 0
    for uid, (val, cnt) in enumerate(user_events):
        for _ in range(cnt):
            rows.append((eid, uid, "view", float(val)))
            eid += 1
    con = _events_con(rows)
    got = _row(con, A_ORACLES["stats_spearman_corr"])
    xs = [cnt for _, cnt in user_events]
    ys = [val * 1000000 * cnt for val, cnt in user_events]
    rx, ry = _avg_ranks_doubled(xs), _avg_ranks_doubled(ys)
    r2x = [rx[x] for x in xs]
    r2y = [ry[y] for y in ys]
    n = len(user_events)
    sx, sy = sum(r2x), sum(r2y)
    sxx = sum(v * v for v in r2x)
    syy = sum(v * v for v in r2y)
    sxy = sum(a * b for a, b in zip(r2x, r2y))
    assert got["n_users"] == n
    assert got["headroom_ok"] is True
    assert got["sxy"] == sxy
    vx = n * sxx - sx * sx
    vy = n * syy - sy * sy
    if n > 1 and vx > 0 and vy > 0:
        rho = (float(n) * sxy - float(sx) * sy) / math.sqrt(float(vx) * float(vy))
        assert got["rho_micro"] == math.floor(rho * 1000000.0 + 0.5)
    else:
        assert got["rho_micro"] is None


@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=4),
                  st.integers(min_value=0, max_value=2)),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_kendall_tau_fuzz(users):
    """(n_events, n_purchases) drawn from tiny domains — heavy ties and
    many identical cells. The contingency-cell pair count must equal the
    brute-force O(n^2) user-pair reference."""
    rows = []
    eid = 0
    for uid, (n_ev, n_pur) in enumerate(users):
        n_pur = min(n_pur, n_ev)
        for k in range(n_ev):
            rows.append((eid, uid, "purchase" if k < n_pur else "view", 1.0))
            eid += 1
    con = _events_con(rows)
    got = _row(con, A_ORACLES["stats_kendall_tau"])
    pts = [(x, min(y, x)) for x, y in users]
    n = len(pts)
    nc = nd = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1])
            nc += s > 0
            nd += s < 0
    ties_x = sum(t * (t - 1) // 2 for t in Counter(p[0] for p in pts).values())
    ties_y = sum(t * (t - 1) // 2 for t in Counter(p[1] for p in pts).values())
    assert got["n_users"] == n
    assert got["headroom_ok"] is True
    assert got["n_concordant"] == nc
    assert got["n_discordant"] == nd
    assert (got["ties_x"], got["ties_y"]) == (ties_x, ties_y)
    n0 = n * (n - 1) // 2
    if n > 1 and n0 - ties_x > 0 and n0 - ties_y > 0:
        tau = (nc - nd) / math.sqrt(float(n0 - ties_x) * float(n0 - ties_y))
        assert got["tau_b_micro"] == math.floor(tau * 1000000.0 + 0.5)
    else:
        assert got["tau_b_micro"] is None


@given(
    st.lists(
        st.integers(min_value=0, max_value=500_00),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_gini_lorenz_fuzz(cents):
    """Random customer revenues (including all-equal and zero-total
    cases): the oracle's Gini and bucket table must equal the sorted
    exact reference."""
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT,"
        " o_orderstatus VARCHAR, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP, o_orderpriority VARCHAR)"
    )
    con.executemany(
        "INSERT INTO orders VALUES (?, ?, 'O', ?,"
        " TIMESTAMP '2024-01-01', 'x')",
        [(i, i, c / 100.0) for i, c in enumerate(cents)],
    )
    cur = con.execute(A_ORACLES["revenue_gini_lorenz"])
    cols = [d[0] for d in cur.description]
    got = {r[0]: dict(zip(cols, r)) for r in cur.fetchall()}
    ordered = sorted(enumerate(cents), key=lambda kv: (kv[1], kv[0]))
    xs = [c for _, c in ordered]
    n, total = len(xs), sum(xs)
    # ntile semantics: first n % k buckets get the extra row
    base, extra = divmod(n, LORENZ_BUCKETS)
    start, cum = 0, 0
    for b in range(1, LORENZ_BUCKETS + 1):
        size = base + (1 if b <= extra else 0)
        if size == 0:
            assert b not in got
            continue
        chunk = xs[start : start + size]
        start += size
        cum += sum(chunk)
        row = got[b]
        assert row["n_customers"] == size
        assert row["revenue_cents"] == sum(chunk)
        if total > 0:
            assert row["cum_share_micro"] == math.floor(
                cum / total * 1000000.0 + 0.5
            )
        else:
            assert row["cum_share_micro"] is None
        assert row["headroom_ok"] is True
        if n > 1 and total > 0:
            g2 = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
            assert row["gini_micro"] == math.floor(
                g2 / (n * total) * 1000000.0 + 0.5
            )
        else:
            assert row["gini_micro"] is None


@given(
    st.lists(
        st.tuples(st.sampled_from(["view", "click", "purchase"]),
                  st.integers(min_value=0, max_value=1)),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_cramers_v_zero_cells_fuzz(evs):
    """Random event streams where whole (type, arm) cells are often
    empty: the completed-grid chi-square must equal the reference that
    iterates ALL type x arm combinations including o=0."""
    rows = [(i, 2 * i + arm, t, 1.0) for i, (t, arm) in enumerate(evs)]
    con = _events_con(rows)
    got = _row(con, A_ORACLES["abtest_cramers_v"])
    cells = Counter((t, a) for t, a in evs)
    types = sorted({t for t, _ in evs})
    arms = sorted({a for _, a in evs})
    n = len(evs)
    row_n = {t: sum(cells[(t, a)] for a in arms) for t in types}
    col_n = {a: sum(cells[(t, a)] for t in types) for a in arms}
    chi2 = 0
    for t in types:
        for a in arms:
            e = row_n[t] * col_n[a] / n
            o = cells.get((t, a), 0)
            chi2 += math.floor((o - e) * (o - e) / e * 1000000.0 + 0.5)
    assert (got["n_rows"], got["n_cols"], got["n_total"]) == (
        len(types), len(arms), n,
    )
    assert got["chi2_micro"] == chi2
    if min(len(types), len(arms)) > 1:
        v = math.sqrt(chi2 / 1000000.0 / (n * (min(len(types), len(arms)) - 1)))
        assert got["cramers_v_micro"] == math.floor(v * 1000000.0 + 0.5)
    else:
        assert got["cramers_v_micro"] is None


@given(st.lists(st.integers(min_value=1, max_value=6), min_size=1, max_size=80))
@settings(**_SETTINGS)
def test_good_turing_gaps_fuzz(counts):
    """Token count multisets with forced gaps in the frequency spectrum:
    N_{r+1} lookups must resolve exactly (NULL r* at gaps, never a
    dense-r assumption)."""
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR,"
                " lang VARCHAR, source VARCHAR, n_chars BIGINT)")
    # one doc whose tokens realize the requested count multiset exactly
    toks = []
    for i, c in enumerate(counts):
        toks.extend([f"w{i}"] * c)
    con.execute(
        "INSERT INTO documents VALUES (0, ?, 'en', 's', 1)",
        [" ".join(toks)],
    )
    cur = con.execute(T_ORACLES["lm_good_turing_counts"])
    cols = [d[0] for d in cur.description]
    got = {r[0]: dict(zip(cols, r)) for r in cur.fetchall()}
    cc = Counter(counts)
    n_tokens = sum(counts)
    assert set(got) == set(cc)
    for r, n_r in cc.items():
        row = got[r]
        assert row["n_types"] == n_r
        nxt = cc.get(r + 1)
        assert row["n_types_next"] == nxt
        if nxt is None:
            assert row["r_star_micro"] is None
        else:
            assert row["r_star_micro"] == math.floor(
                (r + 1) * nxt / n_r * 1000000.0 + 0.5
            )
        assert row["unseen_mass_micro"] == math.floor(
            cc.get(1, 0) / n_tokens * 1000000.0 + 0.5
        )


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=20),
                  st.integers(min_value=0, max_value=20)),
        min_size=1,
        max_size=40,
    )
)
@settings(**_SETTINGS)
def test_kaplan_meier_death_and_censor_fuzz(spans):
    """User lifetimes with random (start, end) days inside a 21-day
    window: the KM table must equal the exact reference, including the
    e=n death row (NULL cum + survival_zero STICKY for every later
    duration)."""
    rows = []
    eid = 0
    for uid, (a, b) in enumerate(spans):
        lo, hi = min(a, b), max(a, b)
        for d in {lo, hi}:
            rows.append((eid, uid, d))
            eid += 1
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT, ts TIMESTAMP)"
    )
    con.executemany(
        "INSERT INTO events VALUES (?, ?, TIMESTAMP '2024-01-01' + INTERVAL (?) DAY)",
        rows,
    )
    cur = con.execute(A_ORACLES["survival_kaplan_meier"])
    cols = [d[0] for d in cur.description]
    got = {r[0]: dict(zip(cols, r)) for r in cur.fetchall()}
    from emr_flink_example_spark.operators.analytics import KM_CHURN_GAP_DAYS

    anchor = max(max(a, b) for a, b in spans)
    users = [
        (abs(b - a), 1 if anchor - max(a, b) > KM_CHURN_GAP_DAYS else 0)
        for a, b in spans
    ]
    durs = sorted({d for d, _ in users})
    assert set(got) == set(durs)
    cum = 0
    dead = False
    for d in durs:
        n_risk = sum(1 for dd, _ in users if dd >= d)
        ev = sum(o for dd, o in users if dd == d)
        tot = sum(1 for dd, _ in users if dd == d)
        row = got[d]
        assert row["n_at_risk"] == n_risk
        assert row["d_events"] == ev
        assert row["n_censored"] == tot - ev
        if ev == n_risk and ev > 0:
            dead = True
        if dead:
            assert row["cum_neg_log_micro"] is None
            assert row["survival_zero"] is True
            continue
        if ev > 0:
            cum += math.floor(-math.log(1.0 - ev / n_risk) * 1000000.0 + 0.5)
        assert row["cum_neg_log_micro"] == cum
        assert row["survival_zero"] is False


@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=30),
                  st.integers(min_value=-500_00, max_value=500_00)),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_ewma_prefix_sum_equals_float_recurrence_fuzz(day_values):
    """Random sparse (day, cents) series, including negative values: the
    oracle's integer prefix-sum EWMA must equal the textbook float
    recurrence bit for bit (alpha = 1/2 halving of integer cents is
    exact in binary), and the crossover signal must match the direct
    compare."""
    from emr_flink_example_spark.operators.timeseries import (
        EWMA_SMA_DAYS,
        N_DAYS,
        ORACLES as TS_ORACLES,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, ts TIMESTAMP)"
    )
    rows = []
    for i, (day, cents) in enumerate(day_values):
        rows.append(
            (i, 0, "view", cents / 100.0, f"2024-01-{day:02d} 03:00:00")
        )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    cur = con.execute(TS_ORACLES["timeseries_ewma_crossover"])
    cols = [d[0] for d in cur.description]
    got = {r[1]: dict(zip(cols, r)) for r in cur.fetchall()}
    daily = [0] * (N_DAYS + 1)
    for day, cents in day_values:
        daily[day] += cents
    e = float(daily[1])
    prev_above = None
    for d in range(1, N_DAYS + 1):
        if d > 1:
            e = (daily[d] + e) / 2.0
        row = got[d]
        assert row["headroom_ok"] is True
        assert row["ewma_micro"] == math.floor(e * 1000000.0 + 0.5)
        if d >= EWMA_SMA_DAYS:
            s3 = sum(daily[d - EWMA_SMA_DAYS + 1 : d + 1])
            assert row["sma3_cents"] == s3
            above = e > s3 / EWMA_SMA_DAYS
            assert row["above_sma"] == above
            if prev_above is not None:
                assert row["is_crossover"] == (above != prev_above)
            prev_above = above


@given(
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.sampled_from(["view", "click", "purchase"]),
            st.integers(min_value=0, max_value=100_000),
        ),
        min_size=1,
        max_size=60,
    )
)
@settings(**_SETTINGS)
def test_funnel_windowed_deadline_fuzz(evs):
    """Random event streams with second-resolution timestamps: the
    oracle's deadline funnel must equal the per-user reference,
    including streams where the click lands exactly ON the deadline
    (inclusive) or one second past it (excluded)."""
    from datetime import datetime, timedelta

    from emr_flink_example_spark.operators.analytics import (
        FUNNEL_WINDOW_SECONDS,
        ORACLES as A_ORC,
    )

    base = datetime(2024, 1, 1)
    rows = [
        (i, uid, et, 1.0, base + timedelta(seconds=secs))
        for i, (uid, et, secs) in enumerate(evs)
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE, ts TIMESTAMP)"
    )
    con.executemany("INSERT INTO events VALUES (?, ?, ?, ?, ?)", rows)
    got = _row(con, A_ORC["funnel_windowed"])
    by_user: dict[int, list] = {}
    for _, uid, et, _, ts in rows:
        by_user.setdefault(uid, []).append((ts, et))
    n_v = n_c = n_p = 0
    for evl in by_user.values():
        views = [t for t, e in evl if e == "view"]
        if not views:
            continue
        n_v += 1
        tv = min(views)
        clicks = [
            t for t, e in evl
            if e == "click" and t > tv
            and (t - tv).total_seconds() <= FUNNEL_WINDOW_SECONDS
        ]
        if not clicks:
            continue
        n_c += 1
        tc = min(clicks)
        if any(
            e == "purchase" and t > tc
            and (t - tc).total_seconds() <= FUNNEL_WINDOW_SECONDS
            for t, e in evl
        ):
            n_p += 1
    if n_v == 0:
        # zero viewers: the census divides by n_viewed — engines return
        # one row of NULL/0; just require no crash and zero counts
        assert (got["n_viewed"] or 0) == 0
        return
    assert (got["n_viewed"], got["n_clicked_in_window"],
            got["n_purchased_in_window"]) == (n_v, n_c, n_p)
    assert got["view_to_click_micro"] == (2_000_000 * n_c + n_v) // (2 * n_v)
    assert got["click_to_purchase_micro"] == (
        (2_000_000 * n_p + n_c) // (2 * n_c) if n_c else 0
    )


@given(
    st.lists(
        st.sampled_from(
            ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
        ),
        min_size=1,
        max_size=50,
    )
)
@settings(**_SETTINGS)
def test_null_safe_eq_fuzz(priorities):
    """Random priority mixes (URGENT rows derive a NULL key): the
    null-safe join must count the NULL-NULL group while plain `=`
    reports zero for it, on every mix including all-NULL and no-NULL."""
    from emr_flink_example_spark.operators.relational import (
        ORACLES as R_ORC,
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE orders (o_orderkey BIGINT, o_custkey BIGINT,"
        " o_orderstatus VARCHAR, o_totalprice DOUBLE,"
        " o_orderdate TIMESTAMP, o_orderpriority VARCHAR)"
    )
    con.executemany(
        "INSERT INTO orders VALUES (?, 1, 'O', 1.0, TIMESTAMP '2024-01-01', ?)",
        list(enumerate(priorities)),
    )
    cur = con.execute(R_ORC["join_null_safe_eq"])
    cols = [d[0] for d in cur.description]
    got = {r[0]: dict(zip(cols, r)) for r in cur.fetchall()}
    keys = [None if "URGENT" in p else p[0] for p in priorities]
    cnt = Counter(keys)
    assert set(got) == set(cnt)
    for k, n in cnt.items():
        assert got[k]["n_pairs_null_safe"] == n * n
        assert got[k]["n_pairs_plain_eq"] == (0 if k is None else n * n)
