"""Independent value pin for `timeseries_dtw` (VERDICT r4 #9).

The query has no DuckDB oracle (DTW is not SQL-expressible), so the driver
only rows-checks it. This test recomputes every user's value through a fully
independent path: DuckDB for the daily sums, pure Python for the dense grid
+ z-score (sequential arithmetic, no numpy), and a TOP-DOWN memoized DTW —
a different formulation from the module's bottom-up rolling-array kernel.
"""

from __future__ import annotations

import math
import sys
from functools import lru_cache

import duckdb
import pytest

from emr_flink_example_spark.operators.timeseries import (
    N_DAYS,
    REF_PATTERN,
    q_timeseries_dtw,
)

from conftest import SF_DIR


def _dtw_topdown(a: tuple, b: tuple) -> float:
    @lru_cache(maxsize=None)
    def d(i: int, j: int) -> float:
        if i < 0 and j < 0:
            return 0.0
        if i < 0 or j < 0:
            return math.inf
        return abs(a[i] - b[j]) + min(d(i - 1, j), d(i, j - 1), d(i - 1, j - 1))

    return d(len(a) - 1, len(b) - 1)


def test_dtw_values_match_independent_reference(spark):
    sys.setrecursionlimit(10_000)
    daily = duckdb.sql(
        f"""
        SELECT user_id, day(ts) AS day, round(sum("value"), 2) AS v
        FROM '{SF_DIR}/events.parquet'
        GROUP BY user_id, day(ts)
        """
    ).fetchall()
    by_user: dict[int, dict[int, float]] = {}
    for uid, day, v in daily:
        by_user.setdefault(uid, {})[day] = v

    expected = {}
    for uid, days in by_user.items():
        series = [days.get(d, 0.0) for d in range(1, N_DAYS + 1)]
        mean = sum(series) / N_DAYS
        var = sum((x - mean) ** 2 for x in series) / N_DAYS
        sd = math.sqrt(var)
        if sd <= 0:
            continue
        z = tuple((x - mean) / sd for x in series)
        expected[uid] = round(_dtw_topdown(z, tuple(REF_PATTERN)), 4)

    got = {r.user_id: r.dtw_dist for r in q_timeseries_dtw(spark, SF_DIR).collect()}
    assert set(got) == set(expected)
    assert len(got) > 0
    for uid in expected:
        # 1.5e-4 absorbs a single round-at-4-decimals boundary step between
        # numpy's pairwise and this test's sequential summation
        assert got[uid] == pytest.approx(expected[uid], abs=1.5e-4), uid
