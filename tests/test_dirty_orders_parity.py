"""Dirty-ORDERS/LINEITEM engine parity (r12, the fourth dirty axis):
NULL status/priority/price on orders and NULL shipdate/discount/
quantity/returnflag on lineitem.

The first full sweep read 305/306 — the relational surface's SQL-null
semantics (group-by null keys, sum-skips-null, null-never-joins) agreed
across the engines everywhere except `histogram_equidepth`, whose depth
ranking sorted NULL prices on opposite ends; it now filters NULL prices
complete-case in both engines (a NULL price has no depth position).
This test pins a representative TPC-H + windows + aggregates set per
run; re-run the full sweep (tools/dirty_fixtures.py orders + selfcheck)
when touching relational operators.
"""

from __future__ import annotations

import pytest

from emr_flink_example_spark.plans import catalog
from emr_flink_example_spark.testing import compare, connect_oracle

from conftest import SF_DIR

#: the fixed query + TPC-H shapes over the dirtied columns + rank/window
#: and aggregate families that null values could skew
PARITY_SET = (
    "histogram_equidepth",
    "histogram_equiwidth",
    "pricing_summary_q1",
    "forecast_revenue_q6",
    "order_priority_q4",
    "promo_revenue_q14",
    "agg_percentiles",
    "agg_weighted_median",
    "agg_stats",
    "window_topk_per_group",
    "window_rank_dense_ntile",
    "global_topk",
    "agg_mode_per_group",
    "dq_profile_columns",
    "dq_constraint_checks",
)


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    from tools.dirty_fixtures import make_dirty_orders

    d = tmp_path_factory.mktemp("sf_dirty_orders")
    make_dirty_orders(SF_DIR, str(d))
    return str(d)


@pytest.mark.parametrize("name", PARITY_SET)
def test_dirty_orders_parity(spark, dirty_dir, name):
    qs, os_ = catalog.all_queries(), catalog.all_oracles()
    ok, msg = compare(spark, connect_oracle(dirty_dir), qs[name], os_[name], dirty_dir)
    assert ok, f"{name} engine parity on dirty orders/lineitem: {msg}"
