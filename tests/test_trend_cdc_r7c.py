"""Property tests for the r7-continuation Theil-Sen and CDC change-log
operators: a numpy median-of-slopes replication, and full accounting of the
synthesized diff against merge_upsert's own output."""

from __future__ import annotations

import math

from emr_flink_example_spark.operators.analytics import (
    CDC_DELETE_MOD,
    q_merge_upsert,
    q_table_change_log,
)
from emr_flink_example_spark.operators.timeseries import (
    N_DAYS,
    _dense_daily,
    q_timeseries_theil_sen,
)

from conftest import SF_DIR


def test_theil_sen_matches_median_of_slopes(spark):
    dense = _dense_daily(spark, SF_DIR).collect()
    series: dict[int, dict[int, float]] = {}
    for r in dense:
        series.setdefault(r.user_id, {})[r.day] = r.v
    got = {r.user_id: r for r in q_timeseries_theil_sen(spark, SF_DIR).collect()}
    assert set(got) == set(series)
    for uid, days in series.items():
        c = [int(math.floor(days[d] * 100 + 0.5)) for d in range(1, N_DAYS + 1)]
        slopes = []
        for i in range(N_DAYS):
            for j in range(i + 1, N_DAYS):
                slopes.append(((c[j] - c[i]), (j - i)))
        # sort by exact rational value (cross-multiply), matching the
        # integer-key order; the (d1, d2) tie-break only reorders equal
        # values so the selected VALUE is the true lower median
        slopes.sort(key=lambda t: (t[0] * (math.lcm(*range(1, N_DAYS)) // t[1])))
        n = len(slopes)
        cd, dd = slopes[(n + 1) // 2 - 1]
        r = got[uid]
        assert r.n_pairs == n
        assert r.slope_micro == math.floor(cd * 10000.0 / dd + 0.5)


def test_change_log_accounts_for_every_key(spark):
    rows = {r.change_type: r for r in q_table_change_log(spark, SF_DIR).collect()}
    assert set(rows) <= {"inserted", "deleted", "updated", "unchanged"}
    base = {
        r.o_orderkey: (r.o_orderstatus, r.o_totalprice)
        for r in spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
        .collect()
    }
    snap_b = {
        r.o_orderkey: (r.o_orderstatus, r.o_totalprice)
        for r in q_merge_upsert(spark, SF_DIR).collect()
        if r.o_orderkey % CDC_DELETE_MOD != 0
    }
    expected = {"inserted": 0, "deleted": 0, "updated": 0, "unchanged": 0}
    for k in set(base) | set(snap_b):
        if k not in base:
            expected["inserted"] += 1
        elif k not in snap_b:
            expected["deleted"] += 1
        elif base[k] != snap_b[k]:
            expected["updated"] += 1
        else:
            expected["unchanged"] += 1
    for ct, n in expected.items():
        got_n = rows[ct].n_rows if ct in rows else 0
        assert got_n == n, (ct, got_n, n)
    # the census covers the full key universe exactly once
    assert sum(r.n_rows for r in rows.values()) == len(set(base) | set(snap_b))
