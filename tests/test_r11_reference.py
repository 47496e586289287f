"""r11 independent-reference tests: each new operator checked against a
hand-rolled Python reference or planted ground truth, in addition to the
DuckDB oracle parity the selfcheck already enforces."""

from __future__ import annotations

import math
from collections import Counter

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from emr_flink_example_spark.io import TABLES
from emr_flink_example_spark.plans import catalog
from emr_flink_example_spark.testing import compare, connect_oracle

from conftest import SF_DIR


def _daily_revenue_py():
    """The fixture's zero-filled daily milli-revenue series, derived
    independently via DuckDB scalar SQL (not the oracle under test)."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT datediff('day', DATE '1970-01-01', ts::DATE) AS day,
               sum(floor(value * 1000 + 0.5)::BIGINT) AS y
        FROM '{SF_DIR}/events.parquet' WHERE event_type = 'purchase'
        GROUP BY day
        """
    ).fetchall()
    lo, hi = con.execute(
        f"""SELECT min(datediff('day', DATE '1970-01-01', ts::DATE)),
                   max(datediff('day', DATE '1970-01-01', ts::DATE))
            FROM '{SF_DIR}/events.parquet'"""
    ).fetchone()
    by_day = dict(rows)
    return [int(by_day.get(d, 0)) for d in range(lo, hi + 1)]


def test_mann_kendall_matches_bruteforce(spark):
    y = _daily_revenue_py()
    n = len(y)
    s = sum(
        (0 if y[j] == y[i] else (1 if y[j] > y[i] else -1))
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties = Counter(y).values()
    var18 = n * (n - 1) * (2 * n + 5) - sum(t * (t - 1) * (2 * t + 5) for t in ties)
    row = catalog.all_queries()["stats_mann_kendall"](spark, SF_DIR).collect()[0]
    assert row.n_days == n
    assert row.s_stat == s
    assert row.var18 == var18
    if s != 0 and var18 > 0:
        z = (s - (1 if s > 0 else -1)) / math.sqrt(var18 / 18.0)
        assert row.z_micro == math.floor(z * 1_000_000 + 0.5)
        assert row.trend == ("up" if s > 0 else "down")


def test_dau_wau_hll_error_and_ordering(spark):
    rows = catalog.all_queries()["event_dau_wau_hll"](spark, SF_DIR).collect()
    assert rows
    for r in rows:
        # a day's actives are a subset of its trailing week's actives
        assert r.wau >= r.dau
        # the 64-register sketch stays within its design error on this
        # fixture (1.04/sqrt(64) ~ 13% standard error; 0.5 is a loose
        # regression fence, not a tight bound)
        if r.dau > 0:
            assert r.dau_rel_err is not None and r.dau_rel_err < 0.5
        if r.wau > 0:
            assert r.wau_rel_err is not None and r.wau_rel_err < 0.5


@pytest.fixture(scope="module")
def corrupted_dir(tmp_path_factory):
    """sf0.001 clone with PLANTED violations: 3 orders deleted (their
    lineitems orphaned), the first remaining order duplicated (pk dup),
    2 lineitem quantities negated, 1 discount pushed to 1.5."""
    d = tmp_path_factory.mktemp("sf_dq")
    victims = planted = None
    for t in TABLES:
        src = pq.read_table(f"{SF_DIR}/{t}.parquet")
        if t == "orders":
            pdf = src.to_pandas()
            victims = set(pdf["o_orderkey"].iloc[:3])
            pdf = pdf.iloc[3:]
            dup = pdf.iloc[[0]]
            planted = {"dup_key": int(dup["o_orderkey"].iloc[0])}
            pdf = __import__("pandas").concat([pdf, dup], ignore_index=True)
            pq.write_table(
                pa.Table.from_pandas(pdf, preserve_index=False, schema=src.schema),
                d / f"{t}.parquet",
            )
        else:
            pq.write_table(src, d / f"{t}.parquet")
    # second pass for lineitem (needs victims from orders)
    src = pq.read_table(f"{SF_DIR}/lineitem.parquet")
    pdf = src.to_pandas()
    n_orphans = int((pdf["l_orderkey"].isin(victims)).sum())
    pdf.loc[pdf.index[:2], "l_quantity"] = -5.0
    pdf.loc[pdf.index[2], "l_discount"] = 1.5
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False, schema=src.schema),
        d / "lineitem.parquet",
    )
    return str(d), n_orphans


def test_dq_constraint_checks_find_planted_violations(spark, corrupted_dir):
    d, n_orphans = corrupted_dir
    qs, os_ = catalog.all_queries(), catalog.all_oracles()
    name = "dq_constraint_checks"
    ok, msg = compare(spark, connect_oracle(d), qs[name], os_[name], d)
    assert ok, f"{name} parity on corrupted fixture: {msg}"
    got = {r.check_name: r for r in qs[name](spark, d).collect()}
    assert got["lineitem_orphan_orderkey"].n_violations == n_orphans
    assert got["orders_duplicate_pk"].n_violations == 1
    assert got["lineitem_nonpositive_quantity"].n_violations == 2
    assert got["lineitem_discount_range"].n_violations == 1
    assert not got["lineitem_orphan_orderkey"].passes
    assert got["lineitem_null_orderkey"].passes


def test_dq_clean_fixture_profile_parity(spark):
    """On the clean fixture the referential checks pass and the profile's
    null/distinct counts match an independent pandas computation."""
    qs = catalog.all_queries()
    checks = {r.check_name: r for r in qs["dq_constraint_checks"](spark, SF_DIR).collect()}
    assert checks["lineitem_orphan_orderkey"].passes
    assert checks["orders_duplicate_pk"].passes

    prof = {r.column: r for r in qs["dq_profile_columns"](spark, SF_DIR).collect()}
    pdf = pq.read_table(f"{SF_DIR}/lineitem.parquet").to_pandas()
    assert prof["l_returnflag"].n_distinct == pdf["l_returnflag"].nunique()
    assert prof["l_orderkey"].n_nulls == int(pdf["l_orderkey"].isna().sum())
    assert prof["l_quantity"].min_milli == int(
        math.floor(pdf["l_quantity"].min() * 1000 + 0.5)
    )
