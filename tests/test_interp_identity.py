"""Property pin for the integer rounding identity behind
timeseries_interpolate_linear: (200*M + b) div (2*b) must equal the exact
round-half-up of M*100/b for every non-negative numerator — the identity is
what lets both engines interpolate without any float-rounding boundary."""

from __future__ import annotations

from fractions import Fraction

from hypothesis import given, strategies as st


@given(
    pv_c=st.integers(min_value=0, max_value=10**12),
    nv_c=st.integers(min_value=0, max_value=10**12),
    a=st.integers(min_value=1, max_value=10**6),
    gap=st.integers(min_value=0, max_value=10**6),
)
def test_integer_half_up_identity(pv_c, nv_c, a, gap):
    b = a + gap  # b >= a >= 1, mirroring next_rn - prev_rn >= rn - prev_rn
    m = pv_c * (b - a) + nv_c * a
    got = (200 * m + b) // (2 * b)
    exact = Fraction(m * 100, b)
    lo = exact.__floor__()
    expected = lo + (1 if exact - lo >= Fraction(1, 2) else 0)
    assert got == expected


def test_events_value_nonnegative_contract(spark):
    """DATA CONTRACT (ADVICE r5): the cents conversion floor(v*100 + 0.5)
    and the div identity above are half-UP only for non-negative values —
    this pins the contract on the fixtures so a source change that
    introduces negative event values fails here, not as a silent
    mis-rounding inside timeseries_interpolate_linear."""
    from pyspark.sql import functions as F

    from emr_flink_example_spark.io import load
    from conftest import SF_DIR

    lo = load(spark, SF_DIR, "events").agg(F.min("value")).first()[0]
    assert lo is not None and lo >= 0, lo
