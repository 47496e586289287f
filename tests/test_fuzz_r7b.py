"""Property tests for the r7-continuation sketch/classifier machinery:
the explicit-register HLL estimator and the hashed fastText-style gate —
pure-Python references checked against the DuckDB oracle forms on
adversarial inputs (duplicates, singletons, huge ids, empty-ish token
sets) that the fixtures never produce.
"""

from __future__ import annotations

import hashlib
import math

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from emr_flink_example_spark.operators.textstats import (
    FT_BUCKETS,
    FT_MARGIN_MILLI,
    HLL_ALPHA,
    HLL_M,
    HLL_P,
    _HLL_RHO_CAP,
)

_SETTINGS = dict(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _phash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _rho(h: int) -> int:
    rest = h >> HLL_P
    if rest == 0:
        return _HLL_RHO_CAP
    return len(bin(rest & -rest)) - 2  # '0b1000...' -> t+1


def _hll_ref(ids: list[int]) -> float:
    regs: dict[int, int] = {}
    for uid in ids:
        h = _phash(str(uid))
        b = h % HLL_M
        regs[b] = max(regs.get(b, 0), _rho(h))
    s = sum(1 << (_HLL_RHO_CAP - m) for m in regs.values())
    s += (HLL_M - len(regs)) * (1 << _HLL_RHO_CAP)
    v0 = HLL_M - len(regs)
    raw = HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RHO_CAP) / s
    if raw <= 2.5 * HLL_M and v0 > 0:
        return round(float(HLL_M) * math.log(float(HLL_M) / v0), 2)
    return round(raw, 2)


_HLL_SQL = f"""
    WITH hashed AS (
        SELECT (('0x' || substr(md5(CAST(uid AS VARCHAR)), 1, 15))::BIGINT) AS h
        FROM ids
    ), regs AS (
        SELECT h % {HLL_M} AS bucket,
               max(CASE WHEN (h >> {HLL_P}) = 0 THEN {_HLL_RHO_CAP}
                        ELSE length(bin((h >> {HLL_P}) & -(h >> {HLL_P}))) END) AS m_j
        FROM hashed GROUP BY 1
    ), agg AS (
        SELECT sum((1::BIGINT << ({_HLL_RHO_CAP} - m_j)))::BIGINT AS sne,
               count(*) AS vne
        FROM regs
    )
    SELECT round(CASE WHEN {HLL_ALPHA} * {HLL_M} * {HLL_M} * {float(1 << _HLL_RHO_CAP)!r}
                           / (sne + ({HLL_M} - vne) * (1::BIGINT << {_HLL_RHO_CAP}))
                           <= 2.5 * {HLL_M}
                       AND {HLL_M} - vne > 0
                      THEN {float(HLL_M)!r} * ln({float(HLL_M)!r} / ({HLL_M} - vne))
                      ELSE {HLL_ALPHA} * {HLL_M} * {HLL_M} * {float(1 << _HLL_RHO_CAP)!r}
                           / (sne + ({HLL_M} - vne) * (1::BIGINT << {_HLL_RHO_CAP}))
                 END, 2) AS est
    FROM agg
"""


@given(
    ids=st.lists(
        st.integers(min_value=0, max_value=2**62), min_size=1, max_size=400
    )
)
@settings(**_SETTINGS)
def test_hll_sql_matches_reference(ids):
    con = duckdb.connect()
    con.execute("CREATE TABLE ids(uid BIGINT)")
    con.executemany("INSERT INTO ids VALUES (?)", [(i,) for i in ids])
    est = con.execute(_HLL_SQL).fetchone()[0]
    assert est == _hll_ref(ids)
    # duplicates never move the registers: estimate is a function of the SET
    con.execute("INSERT INTO ids SELECT uid FROM ids")
    assert con.execute(_HLL_SQL).fetchone()[0] == est


def test_hll_accuracy_envelope():
    """Over disjoint id ranges the estimate tracks the true cardinality
    within the ~4/sqrt(m) HLL error envelope (m=64 -> 13% sigma)."""
    for n in (10, 100, 1000, 10000):
        ids = list(range(n))
        est = _hll_ref(ids)
        assert abs(est - n) / n <= 0.5, (n, est)


_token = st.text(
    alphabet="abcdefghijklmnop", min_size=1, max_size=8
)


@given(tokens=st.lists(_token, min_size=1, max_size=60))
@settings(**_SETTINGS)
def test_fasttext_gate_sql_matches_reference(tokens):
    # NOTE: the first version of the gate reported round(mean, 6); this
    # fuzz found a literal half-boundary (mean is a ratio of small ints)
    # where Python/DuckDB/Spark rounding modes split. The shipped form is
    # floor(x + 0.5) in integer micro units — exact in all three.
    half = (FT_BUCKETS - 1) // 2
    sum_w = sum(_phash(t) % FT_BUCKETS - half for t in tokens)
    n = len(tokens)
    want_score = math.floor(sum_w * 1000000.0 / (1000.0 * n) + 0.5)
    want_keep = sum_w > FT_MARGIN_MILLI * n
    con = duckdb.connect()
    con.execute("CREATE TABLE tok(token VARCHAR)")
    con.executemany("INSERT INTO tok VALUES (?)", [(t,) for t in tokens])
    got = con.execute(f"""
        SELECT floor(sum(w) * 1000000.0 / (1000.0 * count(*)) + 0.5)::BIGINT,
               sum(w) > {FT_MARGIN_MILLI} * count(*)
        FROM (SELECT (('0x' || substr(md5(token), 1, 15))::BIGINT) % {FT_BUCKETS}
                     - {half} AS w FROM tok)
    """).fetchone()
    assert got == (want_score, want_keep)
