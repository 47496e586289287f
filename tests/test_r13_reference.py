"""Hand-rolled references for the r13 statistical additions: Bayesian
Beta A/B comparison, Wilcoxon signed-rank, and Holt-Winters seasonal
smoothing. Each test computes the expected result independently (closed
form, hand-ranked example, or an exact algebraic invariant) — never by
re-running the engine's own code path."""

from __future__ import annotations

import math

from emr_flink_example_spark.operators.analytics import (
    bayes_beta,
    wilcoxon_signed_rank,
)
from emr_flink_example_spark.operators.timeseries import holt_winters_daily


# -- Bayesian Beta comparison --------------------------------------------------


def _exact_prob_b_gt_a(ca, na, cb, nb, grid=20000):
    """P(B>A) for Beta(1+c, 1+n-c) posteriors by brute-force numeric
    integration (trapezoid over the unit interval) — the independent
    reference the engine's logistic approximation must land near."""
    from math import lgamma

    def logpdf(x, a, b):
        return (
            lgamma(a + b) - lgamma(a) - lgamma(b)
            + (a - 1) * math.log(x) + (b - 1) * math.log(1 - x)
        )

    aA, bA = 1 + ca, 1 + na - ca
    aB, bB = 1 + cb, 1 + nb - cb
    # P(B>A) = int f_B(x) * F_A(x) dx
    xs = [(i + 0.5) / grid for i in range(grid)]
    cdfA = 0.0
    total = 0.0
    for x in xs:
        cdfA += math.exp(logpdf(x, aA, bA)) / grid
        total += math.exp(logpdf(x, aB, bB)) * min(cdfA, 1.0) / grid
    return total


def test_bayes_beta_posterior_means(spark):
    rows = spark.createDataFrame(
        [(0, 1)] * 10 + [(0, 0)] * 90 + [(1, 1)] * 20 + [(1, 0)] * 80,
        "arm int, converted int",
    )
    r = bayes_beta(rows).collect()[0]
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (100, 10, 100, 20)
    assert r.post_mean_a_micro == math.floor(11 / 102 * 1e6 + 0.5)
    assert r.post_mean_b_micro == math.floor(21 / 102 * 1e6 + 0.5)
    exact = _exact_prob_b_gt_a(10, 100, 20, 100)
    got = r.prob_b_beats_a_micro / 1e6
    assert abs(got - exact) < 0.012, (got, exact)


def test_bayes_beta_symmetric_is_half(spark):
    rows = spark.createDataFrame(
        [(0, 1), (0, 0), (1, 1), (1, 0)], "arm int, converted int"
    )
    r = bayes_beta(rows).collect()[0]
    assert r.prob_b_beats_a_micro == 500000
    assert r.post_mean_a_micro == r.post_mean_b_micro == 500000


def test_bayes_beta_empty_reports_prior(spark):
    rows = spark.createDataFrame([], "arm int, converted int")
    r = bayes_beta(rows).collect()[0]
    assert (r.n_a, r.n_b) == (0, 0)
    assert r.post_mean_a_micro == 500000  # Beta(1,1) mean
    assert r.prob_b_beats_a_micro == 500000


# -- Wilcoxon signed-rank ------------------------------------------------------


def test_wilcoxon_hand_ranked_example(spark):
    # diffs (after-before): [5, -3, 8, 8, -2, 12]
    # |d| ranks: 2->1, 3->2, 5->3, 8->{4,5}->4.5 each, 12->6
    # W+ = 3 + 4.5 + 4.5 + 6 = 18 -> 2W+ = 36; n = 6
    # E[2W+] = n(n+1)/2 = 21; Var(2W+) = 6*7*13/6 - (2^3-2)/12 = 90.5
    pairs = spark.createDataFrame(
        [(0, 5), (0, -3), (0, 8), (0, 8), (0, -2), (0, 12)],
        "before bigint, after bigint",
    )
    r = wilcoxon_signed_rank(pairs).collect()[0]
    assert (r.n_pairs, r.n_eff) == (6, 6)
    assert r.w2_pos == 36
    assert r.tie_t == 6  # one tied block of 2: 2^3 - 2
    z = (36 - 21) / math.sqrt(6 * 7 * 13 / 6 - 6 / 12)
    assert r.z_micro == math.floor(z * 1e6 + 0.5)
    assert r.headroom_ok and not r.significant


def test_wilcoxon_zero_diffs_dropped(spark):
    pairs = spark.createDataFrame(
        [(3, 3), (3, 3), (1, 9)], "before bigint, after bigint"
    )
    r = wilcoxon_signed_rank(pairs).collect()[0]
    assert (r.n_pairs, r.n_eff) == (3, 1)


def test_wilcoxon_all_tied_pairs(spark):
    pairs = spark.createDataFrame(
        [(0, 0), (5, 5)], "before bigint, after bigint"
    )
    r = wilcoxon_signed_rank(pairs).collect()[0]
    assert (r.n_pairs, r.n_eff) == (2, None)  # nothing rankable
    assert r.z_micro is None and not r.significant


# -- Holt-Winters --------------------------------------------------------------


def _dense(spark, values):
    rows = [(1, d + 1, float(v)) for d, v in enumerate(values)]
    return spark.createDataFrame(rows, "user_id bigint, day int, v double")


def test_holt_winters_constant_series(spark):
    r = holt_winters_daily(_dense(spark, [7.5] * 30)).collect()[0]
    assert (r.level, r.trend, r.season_next, r.forecast_h) == (7.5, 0.0, 0.0, 7.5)


def test_holt_winters_pure_weekly_pattern_is_fixed_point(spark):
    # an exactly periodic series is a fixed point of the recurrence:
    # level = pattern mean, trend = 0, forecast = the day-37 pattern value
    pattern = [10.0, 20.0, 5.0, 40.0, 15.0, 25.0, 25.0]
    series = [pattern[d % 7] for d in range(30)]
    mean = sum(pattern) / 7.0
    r = holt_winters_daily(_dense(spark, series)).collect()[0]
    assert r.level == round(mean, 4)
    assert r.trend == 0.0
    # day 37 -> 0-based pos (37-1) % 7 = 1 -> pattern[1]
    assert r.season_next == round(pattern[1] - mean, 4)
    assert r.forecast_h == pattern[1]


def test_holt_winters_linear_trend_recovered(spark):
    # v_t = 2t: after 30 steps the trend estimate must be near 2/day and
    # the 7-day-ahead forecast near v_37 = 74
    series = [2.0 * (d + 1) for d in range(30)]
    r = holt_winters_daily(_dense(spark, series)).collect()[0]
    # seasonal init absorbs part of the ramp, so the trend oscillates
    # around the true slope while converging (observed 2.40 at t=30)
    assert abs(r.trend - 2.0) < 0.5
    assert abs(r.forecast_h - 74.0) < 3.0
