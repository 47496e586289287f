"""Dirty-EVENTS engine parity (r12, VERDICT r11 #4): the full-catalog
sweep on an events clone with NULL ts/user_id/value/event_type plus one
out-of-range 9e9 value ran 303/303 green after the r12 fixes this test
pins per failure class:

* ANSI overflow vs guard — the headroom guards now NULL LOUDLY instead
  of throwing: try_multiply/try_sum on the Spark side, HUGEINT products
  with guard-gated casts in the oracles (cuped/cohens_d/f_oneway/
  brown_forsythe/kruskal/mann_whitney/sax; theil_sen gained a per-user
  GUARDED_COLUMN; cohort_ltv an inline micro-scaling guard).
* NULL keys — SQL join-key semantics for the as-of family (NULL keys
  never match), edge/channel/map-key/path NULL exclusion for
  graph_hits / markov / scalar_map_funcs / path_trigrams.
* NULL values — complete-case filters for the rank/median statistics
  (mann_whitney/kruskal/brown_forsythe/MAD/moving_median), where the
  engines sort NULLs on opposite ends of the rank windows.
* sub-ulp rounding — window_sliding's avg now uses the exact integer
  micro identity in both engines (float round(x, 6) fluttered at 1e9+).

io.load's events contract (NULL-ts rows excluded — an event-time engine
cannot place a timeless event) is mirrored by `testing.connect_oracle`.
Re-run the full sweep (tools/dirty_fixtures.py events + selfcheck) when
touching event operators.
"""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from emr_flink_example_spark.plans import catalog
from emr_flink_example_spark.testing import compare, connect_oracle

from conftest import SF_DIR

#: one representative per fixed failure class (overflow-guard, rank
#: window, as-of NULL key, NULL channel/map-key/path/edge, micro avg)
PARITY_SET = (
    "abtest_cuped",
    "abtest_mann_whitney",
    "stats_kruskal_wallis",
    "timeseries_theil_sen",
    "events_cohort_ltv",
    "asof_join",
    "asof_join_nearest",
    "attribution_markov_removal",
    "scalar_map_funcs",
    "events_path_trigrams",
    "graph_hits",
    "outlier_robust_mad",
    "window_moving_median",
    "window_sliding",
    "timeseries_holt_forecast",
)


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    """sf0.001 clone with the r12 dirty-events pattern (see
    tools/dirty_fixtures.py — kept in sync by construction here)."""
    from tools.dirty_fixtures import make_dirty_events

    d = tmp_path_factory.mktemp("sf_dirty_events")
    make_dirty_events(SF_DIR, str(d))
    return str(d)


@pytest.mark.parametrize("name", PARITY_SET)
def test_dirty_events_parity(spark, dirty_dir, name):
    qs, os_ = catalog.all_queries(), catalog.all_oracles()
    ok, msg = compare(spark, connect_oracle(dirty_dir), qs[name], os_[name], dirty_dir)
    assert ok, f"{name} engine parity on dirty events: {msg}"


def test_null_ts_rows_excluded_by_contract(spark, dirty_dir):
    """The ingestion contract itself: io.load(events) drops NULL-ts rows
    and the oracle view mirrors it."""
    from emr_flink_example_spark.io import load

    n_spark = load(spark, dirty_dir, "events").count()
    con = connect_oracle(dirty_dir)
    assert n_spark == con.execute("SELECT count(*) FROM events").fetchone()[0]
    raw = pq.read_table(f"{dirty_dir}/events.parquet").num_rows
    assert n_spark < raw  # some NULL-ts rows really were planted and dropped
