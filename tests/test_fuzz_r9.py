"""Property tests for the r9 overflow-guard audit (VERDICT r8 #6):
Mann-Whitney exact tie handling fuzzed against a pure-Python reference
through the DuckDB oracle form, the guard predicate's engine parity at
the int64-headroom boundary, and one Spark end-to-end tie-heavy case.
"""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from emr_flink_example_spark.operators.analytics import (
    ABTEST_Z_CRIT_MICRO,
    ORACLES,
)

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _mw_ref(pairs: list[tuple[int, bool]]) -> dict:
    """Exact-integer Mann-Whitney over (value, is_arm_a) observations —
    the doubled-rank-sum formulation of q_abtest_mann_whitney, floats
    only in the final z (the identical IEEE expression)."""
    if not pairs:
        return dict(
            n_a=None, n_b=None, u2_a=None, tie_t=None, z_micro=None,
            significant=False, headroom_ok=True,
        )
    t: Counter = Counter(v for v, _ in pairs)
    ta: Counter = Counter(v for v, a in pairs if a)
    n_a = sum(ta.values())
    n = len(pairs)
    n_b = n - n_a
    cum = r2_a = tie_t = 0
    for v in sorted(t):
        r2_a += ta[v] * (2 * cum + t[v] + 1)
        tie_t += t[v] ** 3 - t[v]
        cum += t[v]
    u2_a = r2_a - n_a * (n_a + 1)
    t_max = max(t.values())
    ok = (
        2.0 * math.log2(float(t_max)) + math.log2(float(n)) < 62.0
        and 1.0 + 2.0 * math.log2(float(n)) < 62.0
    )
    z_micro = None
    if ok and n_a > 0 and n_b > 0:
        tt = (n + 1.0) - float(tie_t) / (float(n) * (n - 1.0))
        if tt > 0.0:
            z = float(u2_a - n_a * n_b) / math.sqrt(
                (float(n_a) * float(n_b) / 3.0) * tt
            )
            z_micro = math.floor(z * 1000000.0 + 0.5)
    return dict(
        n_a=n_a,
        n_b=n_b,
        u2_a=u2_a if ok else None,
        tie_t=tie_t if ok else None,
        z_micro=z_micro,
        significant=(z_micro is not None and abs(z_micro) >= ABTEST_Z_CRIT_MICRO),
        headroom_ok=ok,
    )


def _oracle_row(pairs: list[tuple[int, bool]]) -> dict:
    con = duckdb.connect()
    rows = [
        (i, 2 * i + (0 if a else 1), "purchase", float(v))
        for i, (v, a) in enumerate(pairs)
    ]
    con.execute(
        "CREATE TABLE events (event_id BIGINT, user_id BIGINT,"
        " event_type VARCHAR, value DOUBLE)"
    )
    if rows:
        con.executemany("INSERT INTO events VALUES (?, ?, ?, ?)", rows)
    cur = con.execute(ORACLES["abtest_mann_whitney"])
    cols = [d[0] for d in cur.description]
    return dict(zip(cols, cur.fetchone()))


@given(
    st.lists(
        st.tuples(st.integers(min_value=1, max_value=4), st.booleans()),
        max_size=80,
    )
)
@settings(**_SETTINGS)
def test_mann_whitney_ties_fuzz_oracle_matches_reference(pairs):
    """Tie-heavy corpora (values drawn from only 4 levels, so nearly every
    observation is tied): the oracle's windowed doubled-rank formulation
    must equal the pure-Python exact-integer reference on every field —
    including all-one-arm, all-tied (zero variance -> NULL z), and empty
    inputs the fixtures never produce."""
    ref = _mw_ref(pairs)
    got = _oracle_row(pairs)
    for k, v in ref.items():
        assert got[k] == v, (k, got, ref)


#: (t_max, n) pairs straddling the guard bounds: 2*log2(t_max) + log2(n)
#: vs 62 and 1 + 2*log2(n) vs 62 — exact powers of two sit EXACTLY on
#: the boundary, where an engine disagreement would flip the verdict
_GUARD_CASES = [
    (1, 1),
    (1, 2),
    (2**21 - 1, 2**20 - 1),
    (2**21, 2**20),
    (2**26, 2**10),
    (2**26, 2**9),
    (2**31 - 1, 2**31 - 1),
    (2**30, 2**30),
    (2**30 + 1, 2**30 + 1),
    (3, 2**62 - 1),
    (2**20 + 7, 2**21 + 3),
]


def test_mann_whitney_guard_predicate_engine_parity(spark):
    """The headroom predicate reads log2 over integer-fed doubles — the
    repo's portability rule says that is engine-stable; pin it at the
    boundary: Spark SQL and DuckDB must agree on every case, including
    exact powers of two landing ON the bound."""
    pred = (
        "2.0 * log2(cast({t} as double)) + log2(cast({n} as double)) < 62.0"
        " and 1.0 + 2.0 * log2(cast({n} as double)) < 62.0"
    )
    con = duckdb.connect()
    for t_max, n in _GUARD_CASES:
        d = con.execute("SELECT " + pred.format(t=t_max, n=n)).fetchone()[0]
        s = spark.sql("SELECT " + pred.format(t=t_max, n=n)).first()[0]
        assert bool(d) == bool(s), (t_max, n, d, s)


def test_mann_whitney_spark_end_to_end_ties(spark, tmp_path):
    """One Spark run over a synthetic tie-heavy events table (3 distinct
    spend levels across 300 users): builder row == oracle row == pure
    reference, with the guard reporting headroom_ok=true."""
    from emr_flink_example_spark.operators.analytics import q_abtest_mann_whitney

    pairs = [((i * 7) % 3 + 1, i % 2 == 0) for i in range(300)]
    rows = [
        (i, 2 * i + (0 if a else 1), "purchase", float(v), "2024-01-01T00:00:00")
        for i, (v, a) in enumerate(pairs)
    ]
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array(
                    [0] * len(rows), type=pa.timestamp("us")
                ),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([r[3] for r in rows], type=pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = q_abtest_mann_whitney(spark, str(tmp_path)).first().asDict()
    ref = _mw_ref(pairs)
    assert got == ref
    assert got["headroom_ok"] is True
    assert got["tie_t"] > 0  # the corpus is genuinely tie-heavy
