"""Time-series operators over `events` (SURVEY.md §2 Part C, PAPERS.md
EDBT'19/ICDE'21 themes): windowed z-normalization + similarity.

  * `timeseries_znorm_corr` — each user's daily activity series (30 days,
    zero-filled), z-normalized, correlated against the z-normalized global
    series. Sparse-aggregate form: the zero-filled grid is algebraically
    eliminated; one shuffle to (user, day) sums + a broadcast of the 30-row
    global series. No arrays collected, no Python.
  * `timeseries_dtw` — dynamic-time-warping distance of each user's series
    against a fixed weekly-seasonality reference, as an `applyInPandas`
    kernel (the per-series imperative path the built-ins can't express).
    Oracle-checked: the DP recurrence is restated in DuckDB as a recursive
    CTE walking the 30x30 grid row-major with a rolling (N+1)-cell window
    (see the ORACLES entry), so even this kernel is hash-verified.

Scale notes: the correlation never materializes the dense (user x day) grid
(only the DTW kernel builds it, at |users| * 30 rows — linear, not quadratic); all similarity is against ONE broadcastable reference series, so
the corpus is never self-joined. For pairwise user-user similarity at 100 TB,
bucket by an LSH of the z-scored series first (see similarity.py) and run
this same kernel within buckets.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..cache import pinned
from ..io import load

N_DAYS = 30

#: fixed weekly-seasonality reference pattern (deterministic, broadcast)
REF_PATTERN = [math.sin(2 * math.pi * d / 7) for d in range(N_DAYS)]

#: the same pattern as a DuckDB list literal — repr() round-trips doubles
#: exactly, so both engines warp against bit-identical reference values
_DTW_REF_SQL = "[" + ", ".join(repr(x) for x in REF_PATTERN) + "]"


def _daily(spark: SparkSession, sf: str) -> DataFrame:
    """(user_id, day, v): per-user-day activity, v = round(sum(value), 2)."""
    events = load(spark, sf, "events")
    return events.groupBy("user_id", F.dayofmonth("ts").alias("day")).agg(
        F.round(F.sum("value"), 2).alias("v")
    )


def _day_grid(spark: SparkSession) -> DataFrame:
    return spark.range(1, N_DAYS + 1).select(F.col("id").cast("int").alias("day"))


def _dense_daily(spark: SparkSession, sf: str) -> DataFrame:
    """(user_id, day 1..30, v) with zero-filled gaps; v = round(sum(value),2)."""
    events = load(spark, sf, "events")
    users = events.select("user_id").distinct()
    return (
        users.crossJoin(F.broadcast(_day_grid(spark)))
        .join(_daily(spark, sf), ["user_id", "day"], "left")
        .select("user_id", "day", F.coalesce("v", F.lit(0.0)).alias("v"))
    )


def q_timeseries_znorm_corr(spark: SparkSession, sf: str) -> DataFrame:
    """Correlation of each user's z-normalized daily series (30 days,
    zero-filled) with the z-normalized global daily series — computed from
    SPARSE aggregates only.

    The dense user x day grid never materializes: zero cells contribute
    nothing to sum(v), sum(v^2), or sum(v*g), so the dense-grid definition
    sum(zu*zg)/N expands algebraically to

        (P - mu*G1 - gmu*S1 + N*mu*gmu) / (sd * gsd * N)

    over per-user sparse sums S1=sum(v), S2=sum(v^2), P=sum(v*g) and global
    constants G1, G2 (mu=S1/N, sd=sqrt(S2/N - mu^2), likewise gmu/gsd).
    Plan: one shuffle to (user, day) sums, a broadcast join of the 30-row
    global series, one groupBy(user) — no crossJoin grid, no window sort.
    The identical expression tree runs in the oracle, so the algebra is
    engine-exact up to the (rounded) float summation both forms already
    accept. Measured 1.4x over the dense-grid + window form at sf0.1."""
    daily = _daily(spark, sf)
    glob = daily.groupBy("day").agg(F.round(F.sum("v"), 2).alias("g"))
    gstats = glob.agg(
        F.sum("g").alias("g1"), F.sum(F.col("g") * F.col("g")).alias("g2")
    )
    per_user = (
        daily.join(F.broadcast(glob), "day")
        .groupBy("user_id")
        .agg(
            F.sum("v").alias("s1"),
            F.sum(F.col("v") * F.col("v")).alias("s2"),
            F.sum(F.col("v") * F.col("g")).alias("p"),
            F.sum(F.when(F.col("v") > 0, 1).otherwise(0)).alias("active_days"),
        )
    )
    n = F.lit(float(N_DAYS))
    mu = F.col("s1") / n
    sd = F.sqrt(F.col("s2") / n - mu * mu)
    gmu = F.col("g1") / n
    gsd = F.sqrt(F.col("g2") / n - gmu * gmu)
    corr = F.round(
        (F.col("p") - mu * F.col("g1") - gmu * F.col("s1") + n * mu * gmu)
        / (sd * gsd * n),
        4,
    )
    return (
        per_user.crossJoin(F.broadcast(gstats))
        .select("user_id", "active_days", corr.alias("znorm_corr"))
        .where(F.col("znorm_corr").isNotNull())
    )


def _dtw(series: list[float], ref: list[float]) -> float:
    """Classic O(n*m) DTW with a full band (n=m=30 here)."""
    n, m = len(series), len(ref)
    inf = float("inf")
    prev = [inf] * (m + 1)
    prev[0] = 0.0
    for i in range(1, n + 1):
        cur = [inf] * (m + 1)
        for j in range(1, m + 1):
            cost = abs(series[i - 1] - ref[j - 1])
            cur[j] = cost + min(prev[j], cur[j - 1], prev[j - 1])
        prev = cur
    return prev[m]


def q_timeseries_dtw(spark: SparkSession, sf: str) -> DataFrame:
    """DTW distance of each user's z-scored daily series vs REF_PATTERN.

    applyInPandas: one Python invocation per user group receives the user's
    30 dense rows, z-scores them, and runs the DTW kernel — per-group state
    never leaves the executor, so this scales with #users across the
    cluster, not with total rows on one node.

    Cross-engine sync: the z-normalized series is snapped to 6 dp via
    floor(z*1e6 + 0.5)/1e6 in BOTH the kernel and the oracle CTE (the
    PCA/k-means trainer discipline) BEFORE the DP runs. Without it, an
    ulp difference between numpy's pairwise-summation mean/std and
    DuckDB's sequential avg/stddev_pop could flip a min() decision at a
    near-tie and change the warping path — a divergence the final
    round(.,4) cannot absorb."""
    dense = _dense_daily(spark, sf)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day")
        v = pdf["v"].to_numpy()
        sd = v.std()  # population std, matches stddev_pop
        z = (v - v.mean()) / sd if sd > 0 else None
        if z is None:
            return pd.DataFrame({"user_id": [], "dtw_dist": []})
        z = np.floor(z * 1e6 + 0.5) / 1e6  # 6-dp snap, mirrored in the CTE
        return pd.DataFrame(
            {
                # nullable bigint group keys arrive as float64 (NaN for a
                # NULL user) — preserve the NULL instead of int(NaN)
                "user_id": [
                    int(pdf["user_id"].iloc[0])
                    if pd.notna(pdf["user_id"].iloc[0])
                    else None
                ],
                "dtw_dist": [round(_dtw(list(z), REF_PATTERN), 4)],
            }
        )

    return (
        dense.groupBy("user_id")
        .applyInPandas(kernel, schema="user_id bigint, dtw_dist double")
    )


#: Holt double-exponential smoothing constants — dyadic rationals so the
#: complements (1-α, 1-β) are exact doubles and both engines multiply
#: bit-identical factors. Fixed horizon like every unrollable recurrence.
HOLT_ALPHA = 0.5
HOLT_BETA = 0.25
HOLT_H = 7


def q_timeseries_holt_forecast(spark: SparkSession, sf: str) -> DataFrame:
    """Holt double-exponential smoothing (Holt 1957) of each user's
    30-day dense daily series: final level, trend, and the H-step-ahead
    linear forecast. The per-series sequential recurrence runs as an
    `applyInPandas` kernel (per-group state never leaves the executor —
    scales with #users); the DuckDB oracle replays the SAME recurrence as
    a recursive CTE stepping t = 2..30 with (level, trend) carried per
    user, so the kernel is hash-verified like timeseries_dtw.

    Bit-determinism: the update l' = α·x + (1−α)(l+b);
    b' = β(l'−l) + (1−β)b is written with the identical association in
    the SQL fold and the oracle's recursive CTE, over dyadic α/β — the
    float sequences are IEEE-identical, rounded once at the end.

    Scale shape (r14 rewrite): the dense grid never materializes — the
    sparse per-(user, day) sums aggregate straight to a per-user 30-slot
    array (one groupBy, zero-filled by `transform(sequence(...))`), and
    the recurrence runs as a map-side `aggregate` fold carrying the
    (level, trend) struct. The pre-r14 form built a users × 30 crossJoin
    grid, left-joined the sums back, and shipped every dense row through
    a groupBy().applyInPandas kernel — two extra exchanges plus the
    JVM↔Python boundary (FlatMapGroupsInPandas), all for per-group state
    SQL can carry itself (guide §4.1: built-ins over UDFs)."""
    return _holt_fold(_slot_series(spark, sf))


def _slot_series(spark: SparkSession, sf: str) -> DataFrame:
    """(user_id, v array<double>) — each user's zero-filled 30-slot daily
    series built straight from the sparse per-(user, day) sums: one
    groupBy, no dense crossJoin grid. The map entry is NULL-guarded so a
    NULL user_id (or a defensive NULL day) contributes NOTHING and the
    group folds over the all-zero series — exactly the pre-r14 dense-grid
    semantics, where the grid's equi-join on (user_id, day) never matched
    a NULL key (and the oracle's LEFT JOIN ... USING does the same)."""
    varr = F.expr(
        f"transform(sequence(1, {N_DAYS}),"
        f" d -> coalesce(element_at(vm, d), cast(0 as double)))"
    )
    entry = F.when(
        F.col("user_id").isNotNull() & F.col("day").isNotNull(),
        F.struct(F.col("day").cast("int"), "v"),
    )
    return (
        _daily(spark, sf)
        .groupBy("user_id")
        .agg(F.map_from_entries(F.collect_list(entry)).alias("vm"))
        .select("user_id", varr.alias("v"))
    )


def _holt_fold(series: DataFrame) -> DataFrame:
    """(user_id, level, trend, forecast_h) from a (user_id, v array<double>)
    frame via the Holt recurrence as a map-side SQL `aggregate` fold —
    the operand association matches the pre-r14 Python kernel and the
    DuckDB oracle exactly (dyadic α/β, left-folded)."""
    a, b_ = HOLT_ALPHA, HOLT_BETA
    l_new = f"({a!r} * x + {1.0 - a!r} * (st.lv + st.b))"
    st = F.expr(
        f"aggregate(slice(v, 2, size(v) - 1),"
        f" named_struct('lv', element_at(v, 1),"
        f"              'b', element_at(v, 2) - element_at(v, 1)),"
        f" (st, x) -> named_struct("
        f"   'lv', {l_new},"
        f"   'b', {b_!r} * ({l_new} - st.lv) + {1.0 - b_!r} * st.b))"
    )
    return series.select("user_id", st.alias("st")).select(
        "user_id",
        F.round(F.col("st.lv"), 4).alias("level"),
        F.round(F.col("st.b"), 4).alias("trend"),
        F.round(F.col("st.lv") + float(HOLT_H) * F.col("st.b"), 4).alias(
            "forecast_h"
        ),
    )


def holt_daily(dense: DataFrame) -> DataFrame:
    """Holt double-exponential smoothing over ANY dense (user_id, day, v)
    daily frame — the extracted core of `q_timeseries_holt_forecast`
    (recurrence and determinism notes there). r14: the per-series
    recurrence is a SQL `aggregate` fold over the day-sorted value array
    (one groupBy, no Python boundary); values are bit-identical to the
    former applyInPandas kernel."""
    series = dense.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, v))),"
            " s -> cast(s.v as double))"
        ).alias("v")
    )
    return _holt_fold(series)


def q_timeseries_resample_gapfill(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style resample: hourly rollup per event_type on a dense
    time grid, empty buckets zero-counted and value gap-filled by
    last-observation-carried-forward (LOCF).

    Shape: one shuffle aggregates raw events to the (type, hour) rollup;
    the dense grid is synthesized from that SMALL aggregate (types x
    sequence(min,max)) — never by scanning raw events again — so grid
    construction is O(types * hours) regardless of corpus size, and the
    LOCF window runs per event_type over the hour axis (bounded, sorted,
    never an unpartitioned window over the fact table)."""
    return resample_gapfill(
        load(spark, sf, "events"),
        ts_col="ts",
        key_col="event_type",
        value_col="value",
    )


def _bucketed_rollup(
    df: DataFrame, ts_col: str, key_col: str, value_col: str | None, unit: str
) -> DataFrame:
    """(key, bucket `h`, n_events[, sum_value]) — the shared first shuffle
    of the resample family."""
    aggs = [F.count("*").alias("n_events")]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 2).alias("sum_value"))
    return df.groupBy(key_col, F.date_trunc(unit, ts_col).alias("h")).agg(*aggs)


def _dense_grid(bucketed: DataFrame, key_col: str, unit: str) -> DataFrame:
    """Dense (key x bucket) grid synthesized from the SMALL rollup —
    never from raw rows."""
    bounds = bucketed.groupBy().agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    return (
        bucketed.select(key_col)
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            key_col,
            F.explode(
                F.sequence("lo", "hi", F.expr(f"interval 1 {unit}"))
            ).alias("h"),
        )
    )


def resample_gapfill(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Hypertable-style resample of ANY (key, ts, value) frame onto a
    dense per-`unit` grid, empty buckets zero-counted and value gap-filled
    by LOCF — (key, bucket, n_events, sum_value, locf_value, is_gap).
    Plan shape and scale notes in `q_timeseries_resample_gapfill`."""
    bucketed = _bucketed_rollup(df, ts_col, key_col, value_col, unit)
    filled = _dense_grid(bucketed, key_col, unit).join(
        bucketed, [key_col, "h"], "left"
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return filled.select(
        key_col,
        F.col("h").alias("bucket"),
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        "sum_value",
        F.last("sum_value", ignorenulls=True).over(w).alias("locf_value"),
        F.col("sum_value").isNull().alias("is_gap"),
    )


def q_timeseries_interpolate_linear(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style resample with LINEAR interpolation: the gapfill
    grid's missing hours get prev + (next - prev) * frac instead of LOCF —
    the standard numeric-series gap repair (TimescaleDB `interpolate()`).

    Engine-exactness: interpolation is carried out in INTEGER arithmetic —
    the 2-decimal anchor sums become exact cents, the fraction is a ratio
    of row-number integers on the dense grid, and the half-up rounding to 4
    decimals is the integer identity (200*M + b) div (2*b) — so no
    float-rounding boundary exists anywhere (a first cut that rounded the
    double product to 4 decimals hit round-half flutter between Spark's
    BigDecimal HALF_UP and DuckDB's float round at e.g. x.63375). Edges
    (gap before the first / after the last observation) fall back to the
    nearest observed value.

    DATA CONTRACT (ADVICE r5): both the floor(v*100 + 0.5) cents conversion
    and the div identity assume NON-NEGATIVE anchor sums — a negative
    sum(value) would silently round half-DOWN. events.value is a price-like
    non-negative measure (min 0.01 across all fixtures);
    tests/test_interp_identity.py asserts the contract so a future fixture
    or source change that violates it fails loudly instead of mis-rounding.

    Shape: identical to resample_gapfill — one aggregating shuffle, grid
    synthesized from the small aggregate, per-type bounded windows. The
    forward-looking window is the only addition (same exchange, second sort
    is reused)."""
    return interpolate_linear(
        load(spark, sf, "events"),
        ts_col="ts",
        key_col="event_type",
        value_col="value",
    )


def interpolate_linear(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    unit: str = "hour",
) -> DataFrame:
    """Dense-grid resample of ANY (key, ts, value) frame with LINEAR
    interpolation over gaps (exact integer arithmetic — see
    `q_timeseries_interpolate_linear` for the rounding identity and the
    NON-NEGATIVE value contract) — (key, bucket, n_events, sum_value,
    interp_value, is_gap)."""
    bucketed = _bucketed_rollup(df, ts_col, key_col, value_col, unit)
    filled = _dense_grid(bucketed, key_col, unit).join(
        bucketed, [key_col, "h"], "left"
    )
    w_idx = Window.partitionBy(key_col).orderBy("h")
    back = w_idx.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    fwd = w_idx.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    obs_rn = F.when(F.col("sum_value").isNotNull(), F.col("rn"))
    indexed = filled.withColumn("rn", F.row_number().over(w_idx))
    anchored = indexed.select(
        key_col,
        "h",
        "n_events",
        "sum_value",
        "rn",
        F.last("sum_value", ignorenulls=True).over(back).alias("prev_val"),
        F.first("sum_value", ignorenulls=True).over(fwd).alias("next_val"),
        F.last(obs_rn, ignorenulls=True).over(back).alias("prev_rn"),
        F.first(obs_rn, ignorenulls=True).over(fwd).alias("next_rn"),
    )
    pv_c = F.floor(F.col("prev_val") * 100 + 0.5).cast("bigint")
    nv_c = F.floor(F.col("next_val") * 100 + 0.5).cast("bigint")
    a = (F.col("rn") - F.col("prev_rn")).cast("bigint")
    b = (F.col("next_rn") - F.col("prev_rn")).cast("bigint")
    # round-half-up of (M * 100 / b) without floats: (200*M + b) div (2*b);
    # valid because the anchor sums (hence M) are non-negative
    anchored = anchored.withColumn("__m", pv_c * (b - a) + nv_c * a).withColumn(
        "__b", b
    )
    interp_micro = F.expr("(200 * __m + __b) div (2 * __b)")
    interp = (
        F.when(F.col("sum_value").isNotNull(), F.col("sum_value"))
        .when(
            F.col("prev_val").isNotNull() & F.col("next_val").isNotNull(),
            interp_micro / F.lit(10000.0),
        )
        .otherwise(F.coalesce("prev_val", "next_val"))
    )
    return anchored.select(
        key_col,
        F.col("h").alias("bucket"),
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n_events"),
        "sum_value",
        interp.alias("interp_value"),
        F.col("sum_value").isNull().alias("is_gap"),
    )


def q_timeseries_cascade_rollup(spark: SparkSession, sf: str) -> DataFrame:
    """Hypertable-style cascading rollup: minute → hour → day, each level
    RE-AGGREGATED FROM THE PREVIOUS PRE-AGGREGATE, never from raw events.

    This is the continuous-aggregate maintenance pattern: counts and sums
    are mergeable, so the day level is computed from ~60x fewer rows than
    the raw stream, and each level is itself a serving table. Rounding is
    applied per level (the stored pre-aggregate IS the rounded value), and
    the oracle mirrors the cascade exactly. One shuffle per level, each on
    successively tinier data."""
    return cascade_rollup(
        load(spark, sf, "events"),
        ts_col="ts",
        key_col="event_type",
        value_col="value",
    )


def cascade_rollup(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
) -> DataFrame:
    """Cascading minute -> hour -> day rollup of ANY (key, ts, value)
    frame, each level re-aggregated from the previous pre-aggregate —
    (key, day, n_events, sum_value); see `q_timeseries_cascade_rollup`."""
    minute = df.groupBy(
        key_col, F.date_trunc("minute", ts_col).alias("m")
    ).agg(F.count("*").alias("n"), F.round(F.sum(value_col), 2).alias("s"))
    hour = minute.groupBy(
        key_col, F.date_trunc("hour", "m").alias("h")
    ).agg(F.sum("n").alias("n"), F.round(F.sum("s"), 2).alias("s"))
    return (
        hour.groupBy(key_col, F.date_trunc("day", "h").alias("day"))
        .agg(F.sum("n").alias("n_events"), F.round(F.sum("s"), 2).alias("sum_value"))
    )


#: trailing window (hours) and minimum history for a z-score
ANOMALY_LOOKBACK_HOURS = 24
ANOMALY_MIN_HISTORY = 12
ANOMALY_Z = 3.0


def q_timeseries_anomaly_zscore(spark: SparkSession, sf: str) -> DataFrame:
    """Rolling z-score anomaly detection on per-type hourly event counts:
    each dense-grid hour is scored against the trailing 24 hours (current
    hour excluded), flagged when |z| >= 3 with at least 12 hours of history.

    Determinism discipline: the rolling mean/std derive from INTEGER window
    sums (sum n, sum n^2 over the frame — exact in any accumulation order,
    so Spark's running-window accumulation and DuckDB's segment tree can't
    diverge), with the float expression tree written identically on both
    engines; a float avg/stddev window would be summation-order-sensitive.
    The grid is dense (zero-filled from the small hourly aggregate, same
    construction as the gapfill query) so "trailing 24 ROWS" means trailing
    24 HOURS even across gaps. One shuffle to the hourly rollup; the window
    runs per event_type over the bounded hour axis."""
    return anomaly_zscore(load(spark, sf, "events"), ts_col="ts", key_col="event_type")


def anomaly_zscore(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    unit: str = "hour",
    lookback: int = ANOMALY_LOOKBACK_HOURS,
    min_history: int = ANOMALY_MIN_HISTORY,
    z_threshold: float = ANOMALY_Z,
) -> DataFrame:
    """Rolling z-score anomaly detection on per-key per-`unit` counts of
    ANY (key, ts) frame — (key, bucket, n_events, trailing_mean, zscore,
    is_anomaly); determinism and plan shape in
    `q_timeseries_anomaly_zscore`."""
    bucketed = _bucketed_rollup(df, ts_col, key_col, None, unit)
    dense = _dense_grid(bucketed, key_col, unit).join(
        bucketed, [key_col, "h"], "left"
    ).select(
        key_col, "h", F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n")
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy("h")
        .rowsBetween(-lookback, -1)
    )
    scored = dense.select(
        key_col,
        F.col("h").alias("bucket"),
        F.col("n").alias("n_events"),
        F.count("n").over(w).alias("hist"),
        F.sum("n").over(w).alias("s1"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("hist")
    var = (F.col("s2").cast("double") - F.col("s1").cast("double") * F.col("s1") / F.col("hist")) / (
        F.col("hist") - 1
    )
    z = F.round((F.col("n_events") - mean) / F.sqrt(var), 4)
    ok = (F.col("hist") >= min_history) & (var > 0)
    return scored.select(
        key_col,
        "bucket",
        "n_events",
        F.round(mean, 4).alias("trailing_mean"),
        F.when(ok, z).alias("zscore"),
        F.when(ok, F.abs(z) >= z_threshold).otherwise(F.lit(False)).alias("is_anomaly"),
    )


CUSUM_REL_DEN = 20  # flag when a CUSUM excursion exceeds 1/20 of total mass

#: autocorrelation lags probed by timeseries_acf (hours)
ACF_LAGS = (1, 2, 3, 6, 12, 24)


def _dense_hourly(spark: SparkSession, sf: str) -> DataFrame:
    """(event_type, h, n): per-type hourly counts on the dense hour grid,
    zero-filled — same construction as the anomaly/gapfill queries (one
    shuffle to the hourly rollup; the grid explodes from a one-row bounds
    broadcast, so the dense frame is |types| x |hours| — linear, tiny
    relative to the event scan even at 100 TB)."""
    events = load(spark, sf, "events")
    hourly = events.groupBy("event_type", F.date_trunc("hour", "ts").alias("h")).agg(
        F.count("*").alias("n_events")
    )
    bounds = hourly.groupBy().agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h"),
        )
    )
    return grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type", "h", F.coalesce("n_events", F.lit(0).cast("bigint")).alias("n")
    )


def q_timeseries_cusum_changepoint(spark: SparkSession, sf: str) -> DataFrame:
    """CUSUM level-shift detection (Page 1954) on per-type hourly event
    counts: for each hour, the cumulative upward/downward excursion of the
    series against its own mean rate, flagged when an excursion exceeds
    1/CUSUM_REL_DEN of the series' total mass (a scale-free threshold — no
    variance estimate needed, so the statistic stays exact).

    Determinism discipline: the textbook recurrence C_i = max(0, C_{i-1} +
    x_i - mu) is a sequential fold, but it has a closed prefix-sum form —
    C_i = P_i - min_{j<=i} P_j with P_i the running sum of (x_i - mu) —
    so it becomes two window passes. To keep mu = T/L exact, everything is
    scaled by L: S_i = L*P'_i - i*T (P' = running count sum, i = position),
    ALL integer, so Spark and DuckDB agree bit-for-bit with no rounding
    rule at all.

    Scale shape: one shuffle to the hourly rollup, then two ordered window
    passes per event_type over the bounded hour axis (|types| x |hours|
    rows, independent of event count). Per-type totals ride a broadcast."""
    dense = _dense_hourly(spark, sf)
    totals = dense.groupBy("event_type").agg(
        F.count("*").alias("len"), F.sum("n").alias("tot")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pre = (
        dense.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "h",
            "n",
            "len",
            "tot",
            (F.col("len") * F.sum("n").over(w) - F.row_number().over(
                Window.partitionBy("event_type").orderBy("h")
            ) * F.col("tot")).alias("s"),
        )
    )
    # the running extrema must include the EMPTY prefix S_0 = 0 (C_0 = 0 in
    # Page's recurrence) — least/greatest against 0, not the bare window min
    up = F.col("s") - F.least(F.lit(0).cast("bigint"), F.min("s").over(w))
    down = F.greatest(F.lit(0).cast("bigint"), F.max("s").over(w)) - F.col("s")
    return pre.select(
        "event_type",
        F.col("h").alias("bucket"),
        F.col("n").alias("n_events"),
        up.alias("cusum_up"),
        down.alias("cusum_down"),
        (up * CUSUM_REL_DEN > F.col("len") * F.col("tot")).alias("is_shift_up"),
        (down * CUSUM_REL_DEN > F.col("len") * F.col("tot")).alias("is_shift_down"),
    )


def q_timeseries_acf(spark: SparkSession, sf: str) -> DataFrame:
    """Sample autocorrelation of per-type hourly event counts at fixed lags
    (1, 2, 3, 6, 12, 24 h) — the seasonality fingerprint (a daily cycle
    shows as high r at lag 24) that tells a pipeline which period to
    deseasonalize or which window the anomaly detector should trail.

    Determinism discipline: r_k = sum_{i<=L-k}(x_i-m)(x_{i+k}-m) /
    sum_i(x_i-m)^2 with m = T/L; scaling every deviation by L makes both
    sums INTEGER (dev_i = L*x_i - T), exact in any accumulation order, and
    the final ratio ships as floor(num/den * 1e6 + 0.5) micro units — the
    identical IEEE expression on both engines (the surprisal discipline).
    Bigint headroom: |dev| <= L*T, so den <= L^3*T^2 needs L^3*T^2 < 2^63
    — holds for month-long hourly grids up to ~10^7 events/type-hour;
    beyond that, pre-aggregate to a coarser grain first. The bound is
    ENFORCED, not just documented: a per-type guard (3*log2(L) +
    2*log2(T) < 62, checked on the pre-aggregation totals) nulls
    acf_micro for any series whose integer sums could silently wrap —
    mirrored verbatim in the oracle so a tripped guard still hash-matches.

    Scale shape: one shuffle to the hourly rollup; ONE ordered window pass
    computes all six lag columns, which then unpivot map-side into (lag,
    product) rows for a |types| x |lags| aggregate. Totals are broadcast."""
    dense = _dense_hourly(spark, sf)
    totals = dense.groupBy("event_type").agg(
        F.count("*").alias("len"), F.sum("n").alias("tot")
    )
    wo = Window.partitionBy("event_type").orderBy("h")
    dev = (
        dense.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "h",
            (F.col("len") * F.col("n") - F.col("tot")).alias("dev"),
        )
    )
    lagged = dev.select(
        "event_type",
        "dev",
        *[F.lag("dev", k).over(wo).alias(f"dl{k}") for k in ACF_LAGS],
    )
    pairs = (
        lagged.select(
            "event_type",
            "dev",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(k).alias("lag"), F.col(f"dl{k}").alias("dl")
                        )
                        for k in ACF_LAGS
                    ]
                )
            ).alias("x"),
        )
        .select("event_type", F.col("x.lag").alias("lag"), (F.col("dev") * F.col("x.dl")).alias("p"))
        .where(F.col("p").isNotNull())
    )
    nums = pairs.groupBy("event_type", "lag").agg(
        F.sum("p").alias("num"), F.count("*").alias("n_pairs")
    )
    dens = dev.groupBy("event_type").agg(F.sum(F.col("dev") * F.col("dev")).alias("den"))
    # den <= len^3 * tot^2: guard the bigint headroom on the PRE-aggregation
    # totals (checking den itself would be too late — it may have wrapped).
    headroom_ok = (
        F.lit(3.0) * F.log2(F.col("len").cast("double"))
        + F.lit(2.0) * F.log2(F.greatest(F.col("tot"), F.lit(1)).cast("double"))
    ) < F.lit(62.0)
    return (
        nums.join(F.broadcast(dens), "event_type")
        .join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "lag",
            "n_pairs",
            F.when(
                (F.col("den") > 0) & headroom_ok,
                F.floor(
                    F.col("num").cast("double") / F.col("den") * F.lit(1000000.0)
                    + F.lit(0.5)
                ).cast("bigint"),
            ).alias("acf_micro"),
        )
    )


#: LCM(1..29): common denominator for exact Theil-Sen slope comparison —
#: key = cdiff * (LCM // ddiff) is an integer strictly monotone in the
#: rational slope cdiff/ddiff (ddiff in 1..29), so the median selection
#: never compares floats. Bigint headroom: |cdiff| (cents) must stay under
#: 2^63 / LCM ~ 3.9e6 — far above any per-user-day sum here.
THEILSEN_LCM = math.lcm(*range(1, N_DAYS))


def q_timeseries_theil_sen(spark: SparkSession, sf: str) -> DataFrame:
    """Theil-Sen robust trend (Theil 1950, Sen 1968) of each user's 30-day
    dense daily series: the median of all 435 pairwise slopes — immune to
    the outlier days that wreck a least-squares fit (agg_regr_linear is
    the fragile twin).

    Determinism discipline: values go to integer cents once
    (floor(v*100+0.5)); each pair's slope is ranked by the exact integer
    key cdiff * (LCM(1..29) // ddiff) — cross-multiplication by a shared
    denominator, so the median is selected over integers with a (key, d1,
    d2) total order; only the reported slope ships as floor-micro units of
    the chosen pair's cdiff/ddiff. Lower median at even counts (435 is
    odd, but empty-ish series after gap-filling stay odd too: the grid is
    always 30 days).

    Scale shape: the pairwise expansion is PER USER over the fixed 30-day
    grid — 435 rows per user, linear in users, shuffled once on user_id;
    the median is a keyed window, not a global sort.

    int64-headroom guard (GUARDED, r12): |key| <= 2*max|c| * LCM, so a
    user whose daily cents exceed (2^63-1)/(2*LCM) ~ 1.98e6 (≈ $19.8k/day
    — reachable on real spend data) would overflow the exact ranking key;
    such users ship (n_pairs, slope NULL, headroom_ok=false) LOUDLY, the
    oracle mirrors the same per-user guard, and the key is never computed
    for them (under ANSI it would throw, not wrap)."""
    dense = _dense_daily(spark, sf)
    cents = dense.select(
        "user_id",
        "day",
        F.floor(F.col("v") * 100 + F.lit(0.5)).cast("bigint").alias("c"),
    )
    key_cap = ((1 << 63) - 1) // (2 * THEILSEN_LCM)
    guard = cents.groupBy("user_id").agg(
        (F.max(F.abs("c")) <= F.lit(key_cap)).alias("headroom_ok")
    )
    cents = cents.join(guard, "user_id")
    ok = cents.where(F.col("headroom_ok"))
    a = ok.select("user_id", F.col("day").alias("d1"), F.col("c").alias("c1"))
    b = ok.select(
        F.col("user_id").alias("u2"), F.col("day").alias("d2"), F.col("c").alias("c2")
    )
    pairs = a.join(
        b, (F.col("user_id") == F.col("u2")) & (F.col("d1") < F.col("d2"))
    ).select(
        "user_id",
        "d1",
        "d2",
        (F.col("c2") - F.col("c1")).alias("cdiff"),
        (F.col("d2") - F.col("d1")).alias("ddiff"),
        (
            (F.col("c2") - F.col("c1"))
            * F.expr(f"cast({THEILSEN_LCM} as bigint) div (d2 - d1)")
        ).alias("key"),
    )
    w = Window.partitionBy("user_id").orderBy("key", "d1", "d2")
    ranked = pairs.withColumn("rn", F.row_number().over(w)).withColumn(
        "np", F.count("*").over(Window.partitionBy("user_id"))
    )
    good = ranked.where(F.col("rn") == F.expr("(np + 1) div 2")).select(
        "user_id",
        F.col("np").alias("n_pairs"),
        F.floor(
            F.col("cdiff").cast("double") * 10000.0 / F.col("ddiff") + F.lit(0.5)
        )
        .cast("bigint")
        .alias("slope_micro"),
        F.lit(True).alias("headroom_ok"),
    )
    n_grid_pairs = N_DAYS * (N_DAYS - 1) // 2
    bad = guard.where(~F.col("headroom_ok")).select(
        "user_id",
        F.lit(n_grid_pairs).cast("bigint").alias("n_pairs"),
        F.lit(None).cast("bigint").alias("slope_micro"),
        F.lit(False).alias("headroom_ok"),
    )
    return good.unionByName(bad)



#: seasonal decomposition: centered moving-average half-window (25h total)
SEAS_TREND_HALF = 12


def q_timeseries_seasonal_decompose(spark: SparkSession, sf: str) -> DataFrame:
    """Classical additive seasonal decomposition (the moving-average
    decomposition underlying STL, Cleveland et al. 1990, without the loess
    refinement) of the hourly event-count series per event_type:

        trend    = centered 25-hour moving average
        seasonal = hour-of-day mean minus the series grand mean
        residual = y - trend - seasonal

    — the monitoring primitive that separates "traffic is daily-cyclic"
    from "traffic actually changed", complementing the CUSUM/z-score
    anomaly queries which see level shifts but conflate them with phase.

    Integer discipline: y is an exact count; every mean is the integer
    micro-mean floor((2e6*sum + n) / (2n)) over NON-NEGATIVE sums (so
    floor and truncation agree across engines — signed values only ever
    appear in subtractions); the residual MAE takes abs() before its
    mean for the same reason. No doubles anywhere in the VALUES.

    int64-headroom guard (ENFORCED, r9 — the ACF discipline): the 2e6x
    micro scaling wraps silently in Spark once per-type sums approach
    2^63/2e6, and the residual fold's sum(abs_resid) is bounded by
    ~4e6 * sy_t * n_t. One per-type condition covers every scaled term:
    log2(sy_t + 1) + log2(n_t) < 40 (2^22 slack for the 4e6 factor,
    checked on exact pre-scaling counts that cannot overflow). A tripped
    guard NULLs the micro columns for that event_type — loud, never
    wrapped garbage — and is mirrored verbatim in the oracle, where the
    HUGEINT ::BIGINT cast would otherwise error rather than wrap.

    Scale shape: one corpus shuffle to the (type, hour) rollup; the dense
    grid derives from that small aggregate exactly like
    `timeseries_resample_gapfill`; the trend window is per-type,
    time-ordered (bounded frame); the hour-of-day and grand-mean tables
    are 24x-types and types rows, broadcast back. Output is 24 rows per
    type regardless of corpus size."""
    events = load(spark, sf, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("n_events"))
    bounds = hourly.groupBy().agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    grid = (
        hourly.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("h"),
        )
    )
    dense = grid.join(hourly, ["event_type", "h"], "left").select(
        "event_type",
        "h",
        F.hour("h").alias("hod"),
        F.coalesce("n_events", F.lit(0).cast("bigint")).alias("y"),
    )
    w_tr = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-SEAS_TREND_HALF, SEAS_TREND_HALF)
    )
    base = (
        dense.withColumn("sum_w", F.sum("y").over(w_tr))
        .withColumn("cnt_w", F.count("*").over(w_tr))
        .select(
            "event_type",
            "hod",
            "y",
            F.expr("(2000000 * sum_w + cnt_w) div (2 * cnt_w)").alias(
                "trend_micro"
            ),
        )
    )
    hodstats = base.groupBy("event_type", "hod").agg(
        F.sum("y").alias("sy_h"), F.count("*").alias("n_h")
    )
    grand = base.groupBy("event_type").agg(
        F.sum("y").alias("sy_t"), F.count("*").alias("n_t")
    )
    # headroom guard (see docstring): one per-type predicate on exact
    # pre-scaling counts; sy_t + 1 keeps log2's argument positive (Spark
    # returns NULL for log2(0) where DuckDB returns -inf)
    seas_ok = F.expr(
        "log2(cast(sy_t + 1 as double)) + log2(cast(n_t as double)) < 40.0"
    )
    joined = (
        base.join(F.broadcast(hodstats), ["event_type", "hod"])
        .join(F.broadcast(grand), "event_type")
        .withColumn(
            "hod_mean_micro",
            F.when(seas_ok, F.expr("(2000000 * sy_h + n_h) div (2 * n_h)")),
        )
        .withColumn(
            "seasonal_micro",
            F.col("hod_mean_micro")
            - F.expr("(2000000 * sy_t + n_t) div (2 * n_t)"),
        )
        .withColumn(
            "abs_resid",
            F.abs(
                F.col("y") * F.lit(1000000)
                - F.col("trend_micro")
                - F.col("seasonal_micro")
            ),
        )
    )
    return joined.groupBy("event_type", "hod").agg(
        F.count("*").alias("n_hours"),
        F.min("hod_mean_micro").alias("hod_mean_micro"),
        F.min("seasonal_micro").alias("seasonal_micro"),
        F.expr(
            "(2 * sum(abs_resid) + count(*)) div (2 * count(*))"
        ).alias("resid_mae_micro"),
    )


QUERIES = {
    "timeseries_znorm_corr": q_timeseries_znorm_corr,
    "timeseries_anomaly_zscore": q_timeseries_anomaly_zscore,
    "timeseries_dtw": q_timeseries_dtw,
    "timeseries_resample_gapfill": q_timeseries_resample_gapfill,
    "timeseries_cascade_rollup": q_timeseries_cascade_rollup,
    # appended last (r5): linear-interpolation resample
    "timeseries_interpolate_linear": q_timeseries_interpolate_linear,
    # r7 continuation: Holt double-exponential smoothing forecast
    "timeseries_holt_forecast": q_timeseries_holt_forecast,
    # r7 continuation: CUSUM changepoints + autocorrelation fingerprint
    "timeseries_cusum_changepoint": q_timeseries_cusum_changepoint,
    "timeseries_acf": q_timeseries_acf,
    # r7 continuation: Theil-Sen robust trend
    "timeseries_theil_sen": q_timeseries_theil_sen,
    # r8: classical additive seasonal decomposition
    "timeseries_seasonal_decompose": q_timeseries_seasonal_decompose,
}

ORACLES = {
    "timeseries_anomaly_zscore": f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   count(*)::BIGINT AS n_events
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT min(h) AS lo, max(h) AS hi FROM hourly
        ), grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (SELECT unnest(generate_series(
                (SELECT lo FROM bounds), (SELECT hi FROM bounds),
                INTERVAL 1 HOUR)) AS h) g
        ), dense AS (
            SELECT g.event_type, g.h, coalesce(hourly.n_events, 0)::BIGINT AS n
            FROM grid g LEFT JOIN hourly
              ON hourly.event_type = g.event_type AND hourly.h = g.h
        ), scored AS (
            SELECT event_type, h AS bucket, n AS n_events,
                   count(n) OVER w AS hist,
                   (sum(n) OVER w)::BIGINT AS s1,
                   (sum(n * n) OVER w)::BIGINT AS s2
            FROM dense
            WINDOW w AS (PARTITION BY event_type ORDER BY h
                         ROWS BETWEEN {ANOMALY_LOOKBACK_HOURS} PRECEDING AND 1 PRECEDING)
        ), final AS (
            SELECT event_type, bucket, n_events, hist,
                   s1::DOUBLE / hist AS mean,
                   (s2::DOUBLE - s1::DOUBLE * s1 / hist) / (hist - 1) AS var
            FROM scored
        )
        SELECT event_type, bucket, n_events,
               round(mean, 4) AS trailing_mean,
               CASE WHEN hist >= {ANOMALY_MIN_HISTORY} AND var > 0
                    THEN round((n_events - mean) / sqrt(var), 4) END AS zscore,
               coalesce(CASE WHEN hist >= {ANOMALY_MIN_HISTORY} AND var > 0
                             THEN abs(round((n_events - mean) / sqrt(var), 4))
                                  >= {ANOMALY_Z} END,
                        FALSE) AS is_anomaly
        FROM final
    """,
    # mirrors the cascade level by level (incl. per-level rounding) — NOT a
    # direct day aggregate, which would differ in the rounded cents
    "timeseries_cascade_rollup": """
        WITH minute AS (
            SELECT event_type, date_trunc('minute', ts) AS m,
                   count(*)::BIGINT AS n, round(sum(value), 2) AS s
            FROM events GROUP BY 1, 2
        ), hour AS (
            SELECT event_type, date_trunc('hour', m) AS h,
                   sum(n)::BIGINT AS n, round(sum(s), 2) AS s
            FROM minute GROUP BY 1, 2
        )
        SELECT event_type, date_trunc('day', h)::TIMESTAMP AS day,
               sum(n)::BIGINT AS n_events, round(sum(s), 2) AS sum_value
        FROM hour GROUP BY 1, 2
    """,
    # the same sparse-aggregate expression tree the Spark builder uses —
    # op-for-op, so the float arithmetic matches up to the accepted
    # summation-order noise absorbed by round(., 4)
    "timeseries_znorm_corr": f"""
        WITH daily AS (
            SELECT user_id, date_part('day', ts)::INT AS day, round(sum(value), 2) AS v
            FROM events GROUP BY 1, 2
        ), gday AS (
            SELECT day, round(sum(v), 2) AS g FROM daily GROUP BY day
        ), gstats AS (
            SELECT sum(g) AS g1, sum(g * g) AS g2 FROM gday
        ), per_user AS (
            SELECT user_id,
                   sum(v) AS s1, sum(v * v) AS s2, sum(v * g) AS p,
                   sum(CASE WHEN v > 0 THEN 1 ELSE 0 END)::BIGINT AS active_days
            FROM daily JOIN gday USING (day)
            GROUP BY user_id
        ), scored AS (
            SELECT user_id, active_days,
                   round((p - s1 / {N_DAYS}.0 * g1 - g1 / {N_DAYS}.0 * s1
                          + {N_DAYS}.0 * (s1 / {N_DAYS}.0) * (g1 / {N_DAYS}.0))
                         / (sqrt(s2 / {N_DAYS}.0 - (s1 / {N_DAYS}.0) * (s1 / {N_DAYS}.0))
                            * sqrt(g2 / {N_DAYS}.0 - (g1 / {N_DAYS}.0) * (g1 / {N_DAYS}.0))
                            * {N_DAYS}.0), 4) AS znorm_corr
            FROM per_user CROSS JOIN gstats
        )
        SELECT user_id, active_days, znorm_corr FROM scored
        WHERE znorm_corr IS NOT NULL
    """,
    # The DTW recurrence IS SQL-expressible: unroll the row-major DP walk as
    # a recursive CTE carrying a rolling window of the last N_DAYS+1 cells
    # (the classic 1-D rolling-array DTW, restated as list slicing). Cell
    # k (0-based) is (i=k//N+1, j=k%N+1); its three predecessors live at
    # fixed offsets in the window: diag=L[1], up=L[2], left=L[N+1], with
    # CASE boundaries at j=1. 1e18 stands in for +inf (real DTW cost is
    # bounded by N^2 * max|z| << 1e18, so no fake path can win). The z-score
    # and the final round(.,4) mirror the kernel; summation-order noise is
    # absorbed exactly as in timeseries_znorm_corr.
    "timeseries_dtw": f"""
        WITH RECURSIVE daily AS (
            SELECT user_id, date_part('day', ts)::INT AS day,
                   round(sum(value), 2) AS v
            FROM events GROUP BY 1, 2
        ), grid AS (
            SELECT u.user_id, g.day
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT unnest(generate_series(1, {N_DAYS})) AS day) g
        ), dense AS (
            SELECT g.user_id, g.day, coalesce(daily.v, 0.0) AS v
            FROM grid g LEFT JOIN daily USING (user_id, day)
        ), stats AS (
            SELECT user_id, avg(v) AS mu, stddev_pop(v) AS sd
            FROM dense GROUP BY user_id
        ), zser AS (
            -- 6-dp snap (floor(z*1e6+0.5)/1e6) mirrors the Python kernel so
            -- ulp-level mean/std differences cannot flip a DP min() decision
            SELECT d.user_id,
                   list(floor((d.v - s.mu) / s.sd * 1000000 + 0.5) / 1000000
                        ORDER BY d.day) AS z
            FROM dense d JOIN stats s USING (user_id)
            WHERE s.sd > 0 GROUP BY d.user_id
        ), ref AS (
            SELECT {_DTW_REF_SQL}::DOUBLE[] AS r
        ), dp AS (
            SELECT user_id, z, 0 AS k,
                   [0.0] || list_transform(generate_series(1, {N_DAYS}),
                                           x -> 1e18) AS l
            FROM zser
            UNION ALL
            SELECT user_id, z, k + 1,
                   l[2:{N_DAYS + 1}] || [
                       abs(z[k // {N_DAYS} + 1] - (SELECT r FROM ref)[k % {N_DAYS} + 1])
                       + least(
                           CASE WHEN k % {N_DAYS} = 0
                                THEN (CASE WHEN k < {N_DAYS} THEN 0.0 ELSE 1e18 END)
                                ELSE l[1] END,
                           l[2],
                           CASE WHEN k % {N_DAYS} = 0 THEN 1e18
                                ELSE l[{N_DAYS + 1}] END)
                   ]
            FROM dp WHERE k < {N_DAYS * N_DAYS}
        )
        SELECT user_id, round(l[{N_DAYS + 1}], 4) AS dtw_dist
        FROM dp WHERE k = {N_DAYS * N_DAYS}
    """,
    # the same Holt recurrence stepped t = 2..N by a recursive CTE, with
    # the identical operand association as the Python kernel (dyadic
    # alpha/beta -> bit-identical IEEE sequences, rounded once at the end)
    "timeseries_holt_forecast": f"""
        WITH RECURSIVE daily AS (
            SELECT user_id, date_part('day', ts)::INT AS day,
                   round(sum(value), 2) AS v
            FROM events GROUP BY 1, 2
        ), grid AS (
            SELECT u.user_id, g.day
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT unnest(generate_series(1, {N_DAYS})) AS day) g
        ), dense AS (
            SELECT g.user_id, g.day, coalesce(daily.v, 0.0) AS v
            FROM grid g LEFT JOIN daily USING (user_id, day)
        ), vser AS (
            SELECT user_id, list(v ORDER BY day) AS v
            FROM dense GROUP BY user_id
        ), hw AS (
            SELECT user_id, v, 1 AS t,
                   v[1]::DOUBLE AS l, (v[2] - v[1])::DOUBLE AS b
            FROM vser
            UNION ALL
            SELECT user_id, v, t + 1,
                   {HOLT_ALPHA} * v[t + 1] + {1.0 - HOLT_ALPHA} * (l + b),
                   {HOLT_BETA} * (({HOLT_ALPHA} * v[t + 1]
                                   + {1.0 - HOLT_ALPHA} * (l + b)) - l)
                   + {1.0 - HOLT_BETA} * b
            FROM hw WHERE t < {N_DAYS}
        )
        SELECT user_id, round(l, 4) AS level, round(b, 4) AS trend,
               round(l + {HOLT_H} * b, 4) AS forecast_h
        FROM hw WHERE t = {N_DAYS}
    """,
    "timeseries_resample_gapfill": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT min(h) AS lo, max(h) AS hi FROM hourly
        ), grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (SELECT unnest(generate_series(
                (SELECT lo FROM bounds), (SELECT hi FROM bounds),
                INTERVAL 1 HOUR)) AS h) g
        )
        SELECT g.event_type, g.h AS bucket,
               coalesce(hourly.n_events, 0)::BIGINT AS n_events,
               hourly.sum_value AS sum_value,
               last_value(hourly.sum_value IGNORE NULLS) OVER (
                   PARTITION BY g.event_type ORDER BY g.h
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS locf_value,
               hourly.sum_value IS NULL AS is_gap
        FROM grid g LEFT JOIN hourly
          ON hourly.event_type = g.event_type AND hourly.h = g.h
    """,
    "timeseries_interpolate_linear": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT min(h) AS lo, max(h) AS hi FROM hourly
        ), grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (SELECT unnest(generate_series(
                (SELECT lo FROM bounds), (SELECT hi FROM bounds),
                INTERVAL 1 HOUR)) AS h) g
        ), filled AS (
            SELECT g.event_type, g.h, hourly.n_events, hourly.sum_value
            FROM grid g LEFT JOIN hourly
              ON hourly.event_type = g.event_type AND hourly.h = g.h
        ), indexed AS (
            SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
            FROM filled
        ), anchored AS (
            SELECT event_type, h, n_events, sum_value, rn,
                   last_value(sum_value IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_val,
                   first_value(sum_value IGNORE NULLS) OVER (
                       PARTITION BY event_type ORDER BY h
                       ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_val,
                   last_value(CASE WHEN sum_value IS NOT NULL THEN rn END IGNORE NULLS)
                       OVER (PARTITION BY event_type ORDER BY h
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_rn,
                   first_value(CASE WHEN sum_value IS NOT NULL THEN rn END IGNORE NULLS)
                       OVER (PARTITION BY event_type ORDER BY h
                             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_rn
            FROM indexed
        )
        , cents AS (
            SELECT *,
                   floor(prev_val * 100 + 0.5)::BIGINT AS pv_c,
                   floor(next_val * 100 + 0.5)::BIGINT AS nv_c,
                   (rn - prev_rn)::BIGINT AS a,
                   (next_rn - prev_rn)::BIGINT AS b
            FROM anchored
        )
        SELECT event_type, h AS bucket,
               coalesce(n_events, 0)::BIGINT AS n_events,
               sum_value,
               CASE WHEN sum_value IS NOT NULL THEN sum_value
                    WHEN prev_val IS NOT NULL AND next_val IS NOT NULL THEN
                        ((200 * (pv_c * (b - a) + nv_c * a) + b) // (2 * b)) / 10000.0
                    ELSE coalesce(prev_val, next_val) END AS interp_value,
               sum_value IS NULL AS is_gap
        FROM cents
    """,
    # prefix-sum restatement of the CUSUM recurrence; all-integer, no rounding
    "timeseries_cusum_changepoint": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT min(h) AS lo, max(h) AS hi FROM hourly
        ), grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (SELECT unnest(generate_series(
                (SELECT lo FROM bounds), (SELECT hi FROM bounds),
                INTERVAL 1 HOUR)) AS h) g
        ), dense AS MATERIALIZED (
            SELECT g.event_type, g.h, coalesce(hourly.n, 0)::BIGINT AS n
            FROM grid g LEFT JOIN hourly
              ON hourly.event_type = g.event_type AND hourly.h = g.h
        ), totals AS (
            SELECT event_type, count(*)::BIGINT AS len, sum(n)::BIGINT AS tot
            FROM dense GROUP BY 1
        ), pre AS (
            SELECT d.event_type, d.h, d.n, t.len, t.tot,
                   t.len * (sum(d.n) OVER w)::BIGINT
                     - (row_number() OVER w2) * t.tot AS s
            FROM dense d JOIN totals t USING (event_type)
            WINDOW w AS (PARTITION BY d.event_type ORDER BY d.h
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                   w2 AS (PARTITION BY d.event_type ORDER BY d.h)
        )
        SELECT event_type, h AS bucket, n AS n_events,
               (s - least(0, min(s) OVER w))::BIGINT AS cusum_up,
               (greatest(0, max(s) OVER w) - s)::BIGINT AS cusum_down,
               (s - least(0, min(s) OVER w)) * 20 > len * tot AS is_shift_up,
               (greatest(0, max(s) OVER w) - s) * 20 > len * tot AS is_shift_down
        FROM pre
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    # integer-scaled deviations; the ratio ships as floor-micro units
    "timeseries_acf": """
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT min(h) AS lo, max(h) AS hi FROM hourly
        ), grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (SELECT unnest(generate_series(
                (SELECT lo FROM bounds), (SELECT hi FROM bounds),
                INTERVAL 1 HOUR)) AS h) g
        ), dense AS MATERIALIZED (
            SELECT g.event_type, g.h, coalesce(hourly.n, 0)::BIGINT AS n
            FROM grid g LEFT JOIN hourly
              ON hourly.event_type = g.event_type AND hourly.h = g.h
        ), totals AS (
            SELECT event_type, count(*)::BIGINT AS len, sum(n)::BIGINT AS tot
            FROM dense GROUP BY 1
        ), dev AS MATERIALIZED (
            SELECT d.event_type, d.h, t.len * d.n - t.tot AS dev
            FROM dense d JOIN totals t USING (event_type)
        ), lagged AS (
            SELECT event_type, dev,
                   lag(dev, 1) OVER w AS dl1,
                   lag(dev, 2) OVER w AS dl2,
                   lag(dev, 3) OVER w AS dl3,
                   lag(dev, 6) OVER w AS dl6,
                   lag(dev, 12) OVER w AS dl12,
                   lag(dev, 24) OVER w AS dl24
            FROM dev WINDOW w AS (PARTITION BY event_type ORDER BY h)
        ), pairs AS (
            SELECT event_type, 1 AS lag, dev * dl1 AS p FROM lagged WHERE dl1 IS NOT NULL
            UNION ALL SELECT event_type, 2 AS lag, dev * dl2 AS p FROM lagged WHERE dl2 IS NOT NULL
            UNION ALL SELECT event_type, 3 AS lag, dev * dl3 AS p FROM lagged WHERE dl3 IS NOT NULL
            UNION ALL SELECT event_type, 6 AS lag, dev * dl6 AS p FROM lagged WHERE dl6 IS NOT NULL
            UNION ALL SELECT event_type, 12 AS lag, dev * dl12 AS p FROM lagged WHERE dl12 IS NOT NULL
            UNION ALL SELECT event_type, 24 AS lag, dev * dl24 AS p FROM lagged WHERE dl24 IS NOT NULL
        ), nums AS (
            SELECT event_type, lag, sum(p)::BIGINT AS num,
                   count(*)::BIGINT AS n_pairs
            FROM pairs GROUP BY 1, 2
        ), dens AS (
            SELECT event_type, sum(dev * dev)::BIGINT AS den
            FROM dev GROUP BY 1
        )
        SELECT n.event_type, n.lag, n.n_pairs,
               CASE WHEN d.den > 0
                     AND 3 * log2(t.len::DOUBLE)
                         + 2 * log2(greatest(t.tot, 1)::DOUBLE) < 62
               THEN
                 floor(n.num::DOUBLE / d.den * 1000000.0 + 0.5)::BIGINT
               END AS acf_micro
        FROM nums n JOIN dens d USING (event_type)
        JOIN totals t USING (event_type)
    """,
    # exact integer slope keys over the same dense daily cents
    "timeseries_theil_sen": f"""
        WITH daily AS (
            SELECT user_id, date_part('day', ts)::INT AS day,
                   round(sum(value), 2) AS v
            FROM events GROUP BY 1, 2
        ), grid AS (
            SELECT u.user_id, g.day
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT unnest(generate_series(1, {N_DAYS})) AS day) g
        ), dense AS (
            SELECT g.user_id, g.day, coalesce(daily.v, 0.0) AS v
            FROM grid g LEFT JOIN daily USING (user_id, day)
        ), cents AS MATERIALIZED (
            SELECT user_id, day, floor(v * 100 + 0.5)::BIGINT AS c FROM dense
        ), guard AS (
            SELECT user_id,
                   max(abs(c)) <= (9223372036854775807 // (2 * {THEILSEN_LCM}))
                       AS headroom_ok
            FROM cents GROUP BY user_id
        ), pairs AS (
            SELECT a.user_id, a.day AS d1, b.day AS d2,
                   b.c - a.c AS cdiff, b.day - a.day AS ddiff,
                   (b.c::HUGEINT - a.c) * ({THEILSEN_LCM} // (b.day - a.day))
                       AS key
            FROM cents a JOIN cents b
              ON a.user_id = b.user_id AND a.day < b.day
            JOIN guard g ON g.user_id = a.user_id AND g.headroom_ok
        ), ranked AS (
            SELECT *,
                   row_number() OVER (PARTITION BY user_id
                                      ORDER BY key, d1, d2) AS rn,
                   count(*) OVER (PARTITION BY user_id) AS np
            FROM pairs
        )
        SELECT user_id, np::BIGINT AS n_pairs,
               floor(cdiff::DOUBLE * 10000.0 / ddiff + 0.5)::BIGINT AS slope_micro,
               true AS headroom_ok
        FROM ranked WHERE rn = (np + 1) // 2
        UNION ALL
        SELECT user_id, {N_DAYS} * ({N_DAYS} - 1) // 2,
               NULL::BIGINT, false
        FROM guard WHERE NOT headroom_ok
    """,
}


ORACLES["timeseries_seasonal_decompose"] = f"""
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h,
               count(*)::BIGINT AS n_events
        FROM events GROUP BY 1, 2
    ), bounds AS (
        SELECT min(h) AS lo, max(h) AS hi FROM hourly
    ), grid AS (
        SELECT t.event_type, g.h
        FROM (SELECT DISTINCT event_type FROM hourly) t
        CROSS JOIN (SELECT unnest(generate_series(
            (SELECT lo FROM bounds), (SELECT hi FROM bounds),
            INTERVAL 1 HOUR)) AS h) g
    ), dense AS (
        SELECT g.event_type, g.h, hour(g.h)::INT AS hod,
               coalesce(hourly.n_events, 0)::BIGINT AS y
        FROM grid g LEFT JOIN hourly USING (event_type, h)
    ), base AS (
        SELECT event_type, hod, y,
               ((2000000 * sum(y) OVER w + count(*) OVER w)
                // (2 * count(*) OVER w))::BIGINT AS trend_micro
        FROM dense
        WINDOW w AS (PARTITION BY event_type ORDER BY h
                     ROWS BETWEEN {SEAS_TREND_HALF} PRECEDING
                              AND {SEAS_TREND_HALF} FOLLOWING)
    ), hodstats AS (
        SELECT event_type, hod, sum(y)::BIGINT AS sy_h, count(*)::BIGINT AS n_h
        FROM base GROUP BY 1, 2
    ), grand AS (
        SELECT event_type, sum(y)::BIGINT AS sy_t, count(*)::BIGINT AS n_t
        FROM base GROUP BY 1
    ), joined AS (
        -- same headroom guard as the Spark builder: NULL micro columns
        -- when log2(sy_t + 1) + log2(n_t) >= 40
        SELECT b.event_type, b.hod,
               CASE WHEN log2(cast(g.sy_t + 1 as double))
                         + log2(cast(g.n_t as double)) < 40.0
                    THEN ((2000000 * hs.sy_h + hs.n_h) // (2 * hs.n_h))::BIGINT
               END AS hod_mean_micro,
               CASE WHEN log2(cast(g.sy_t + 1 as double))
                         + log2(cast(g.n_t as double)) < 40.0
                    THEN ((2000000 * hs.sy_h + hs.n_h) // (2 * hs.n_h)
                          - (2000000 * g.sy_t + g.n_t) // (2 * g.n_t))::BIGINT
               END AS seasonal_micro,
               CASE WHEN log2(cast(g.sy_t + 1 as double))
                         + log2(cast(g.n_t as double)) < 40.0
                    THEN abs(b.y * 1000000 - b.trend_micro
                             - ((2000000 * hs.sy_h + hs.n_h) // (2 * hs.n_h)
                                - (2000000 * g.sy_t + g.n_t) // (2 * g.n_t)))::BIGINT
               END AS abs_resid
        FROM base b
        JOIN hodstats hs USING (event_type, hod)
        JOIN grand g USING (event_type)
    )
    SELECT event_type, hod, count(*)::BIGINT AS n_hours,
           min(hod_mean_micro)::BIGINT AS hod_mean_micro,
           min(seasonal_micro)::BIGINT AS seasonal_micro,
           ((2 * sum(abs_resid) + count(*)) // (2 * count(*)))::BIGINT AS resid_mae_micro
    FROM joined GROUP BY 1, 2
"""


#: SAX geometry: the 30-day series compresses to SAX_SEGMENTS PAA segments
#: of SAX_SEG_DAYS days each, quantized into a 4-symbol alphabet at the
#: standard N(0,1) quartile breakpoints (Lin et al. 2003).
SAX_SEGMENTS = 6
SAX_SEG_DAYS = 5  # N_DAYS / SAX_SEGMENTS
SAX_BREAKS = (-0.6745, 0.0, 0.6745)


def q_timeseries_sax_words(spark: SparkSession, sf: str) -> DataFrame:
    """SAX symbolic aggregate approximation (Lin, Keogh et al. 2003) of
    each user's 30-day activity series: z-normalize, PAA-compress 30
    days into 6 segment means, quantize each against the N(0,1)
    quartile breakpoints into a 4-letter alphabet, and concatenate into
    a 6-symbol word — identical words are cheap motif candidates, so
    the word-frequency join gives the classic "how many users share
    this shape" motif census without any pairwise distance work.

    Determinism: daily values are exact integer cents; per-user moments
    (sum, sum of squares) and per-segment sums are integer aggregates;
    each segment's z-score is ONE fixed double expression over those
    integers, snapped to 6 dp via floor(z*1e6 + 0.5) BEFORE the
    breakpoint compares (the timeseries_dtw z-norm sync — an ulp
    difference between engines could otherwise flip a symbol at a
    breakpoint tie). int64-headroom guard (ENFORCED): sum(v^2) <=
    n_days * max_v^2, so the guard reads log2(N_DAYS) + 2*log2(max_v) <
    62 on the exact per-user max; tripped users NULL their word LOUDLY
    (headroom_ok = false), oracle mirrors.

    Scale shape: one combine-friendly (user, day) cents aggregate feeds
    BOTH the per-user moment fold and the per-(user, segment) sums
    (groupBys on the same user key — one partitioning reused); symbols
    assemble map-side via array_sort(collect_list(struct(seg, sym)))
    over exactly SAX_SEGMENTS rows per user; the motif count is a
    groupBy(word) joined back (word space <= 4^6 = 4096, broadcast).
    Nothing user x day sized is windowed or sorted.

    Day domain (ADVICE r9): the statistic is DEFINED on the 1..N_DAYS
    grid, so out-of-grid events (day > N_DAYS, i.e. the 31st) are
    excluded EXPLICITLY in both engines before any aggregate — they
    previously fed s1/s2 while silently missing from the PAA segments,
    which kept engine parity but skewed the z-norm. Pinned by
    tests/test_sax_day_domain.py on a day-31-bearing fixture."""
    events = load(spark, sf, "events")
    daily = (
        events.where(F.dayofmonth("ts") <= N_DAYS)
        .groupBy("user_id", F.dayofmonth("ts").alias("day"))
        .agg(
            F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")).alias("v")
        )
    )
    # zero-filled moments: absent days contribute 0 to s1/s2/seg sums, so
    # no dense grid is materialized — only the divisor is fixed at N_DAYS
    moments = daily.groupBy("user_id").agg(
        F.sum("v").alias("s1"),
        # try_* keeps the guard NULL-LOUDLY under ANSI: past the headroom
        # bound v*v would THROW before the guard gates the symbols
        F.expr("try_sum(try_multiply(v, v))").alias("s2"),
        F.max(F.abs(F.col("v"))).alias("max_v"),
    )
    segs = (
        daily.withColumn("seg", ((F.col("day") - 1) / SAX_SEG_DAYS).cast("int"))
        .groupBy("user_id", "seg")
        .agg(F.sum("v").alias("seg_sum"))
    )
    # the segment grid must be dense (a silent user-segment is a PAA mean
    # of 0, not a missing symbol): cross the users with the 6 segment ids
    seg_grid = (
        moments.select("user_id")
        .crossJoin(
            F.broadcast(
                spark.range(SAX_SEGMENTS).select(F.col("id").cast("int").alias("seg"))
            )
        )
        .join(segs, ["user_id", "seg"], "left")
        .na.fill({"seg_sum": 0})
    )
    mu = f"cast(s1 as double) / {N_DAYS}.0"
    var = f"cast(s2 as double) / {N_DAYS}.0 - ({mu}) * ({mu})"
    z = (
        f"(cast(seg_sum as double) / {SAX_SEG_DAYS}.0 - ({mu})) / sqrt({var})"
    )
    z_snap = f"floor(({z}) * 1000000.0 + 0.5) / 1000000.0"
    sym = F.expr(
        f"case when ({var}) <= 0.0 then null"
        f" when ({z_snap}) < {SAX_BREAKS[0]} then 'a'"
        f" when ({z_snap}) < {SAX_BREAKS[1]} then 'b'"
        f" when ({z_snap}) < {SAX_BREAKS[2]} then 'c'"
        " else 'd' end"
    )
    ok = F.expr(
        f"log2({N_DAYS}.0) + 2.0 * log2(cast(greatest(max_v, 1) as double)) < 62.0"
    )
    words = (
        seg_grid.join(moments, "user_id")
        .select("user_id", "seg", sym.alias("sym"), ok.alias("headroom_ok"))
        .groupBy("user_id")
        .agg(
            F.expr(
                "case when min(headroom_ok) and count(sym) = count(*) then"
                " array_join(transform(array_sort(collect_list(struct(seg, sym))),"
                " x -> x.sym), '') end"
            ).alias("sax_word"),
            F.min("headroom_ok").alias("headroom_ok"),
        )
    )
    freq = words.where(F.col("sax_word").isNotNull()).groupBy("sax_word").agg(
        F.count("*").alias("n_users_same_word")
    )
    return words.join(F.broadcast(freq), "sax_word", "left").select(
        "user_id", "sax_word", "n_users_same_word", "headroom_ok"
    )


ORACLES["timeseries_sax_words"] = f"""
    WITH daily AS (
        -- day <= N_DAYS: the SAX grid is 1..{N_DAYS}; out-of-grid events
        -- are excluded from moments AND segments alike (ADVICE r9)
        SELECT user_id, extract(day FROM ts)::INT AS day,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS v
        FROM events WHERE extract(day FROM ts) <= {N_DAYS} GROUP BY 1, 2
    ), moments AS (
        SELECT user_id, sum(v)::BIGINT AS s1, sum(v::HUGEINT * v) AS s2,
               max(abs(v))::BIGINT AS max_v
        FROM daily GROUP BY user_id
    ), segs AS (
        SELECT user_id, ((day - 1) // {SAX_SEG_DAYS})::INT AS seg,
               sum(v)::BIGINT AS seg_sum
        FROM daily GROUP BY 1, 2
    ), seg_grid AS (
        SELECT m.user_id, g.seg::INT AS seg, coalesce(s.seg_sum, 0)::BIGINT AS seg_sum
        FROM moments m CROSS JOIN range(0, {SAX_SEGMENTS}) g(seg)
        LEFT JOIN segs s ON s.user_id = m.user_id AND s.seg = g.seg
    ), symbols AS (
        SELECT sg.user_id, sg.seg,
               CASE WHEN (m.s2::DOUBLE / {N_DAYS}.0
                          - (m.s1::DOUBLE / {N_DAYS}.0) * (m.s1::DOUBLE / {N_DAYS}.0)) <= 0.0
                    THEN NULL
                    ELSE CASE
                      WHEN floor((sg.seg_sum::DOUBLE / {SAX_SEG_DAYS}.0
                                  - m.s1::DOUBLE / {N_DAYS}.0)
                                 / sqrt(m.s2::DOUBLE / {N_DAYS}.0
                                        - (m.s1::DOUBLE / {N_DAYS}.0)
                                          * (m.s1::DOUBLE / {N_DAYS}.0))
                                 * 1000000.0 + 0.5) / 1000000.0 < {SAX_BREAKS[0]} THEN 'a'
                      WHEN floor((sg.seg_sum::DOUBLE / {SAX_SEG_DAYS}.0
                                  - m.s1::DOUBLE / {N_DAYS}.0)
                                 / sqrt(m.s2::DOUBLE / {N_DAYS}.0
                                        - (m.s1::DOUBLE / {N_DAYS}.0)
                                          * (m.s1::DOUBLE / {N_DAYS}.0))
                                 * 1000000.0 + 0.5) / 1000000.0 < {SAX_BREAKS[1]} THEN 'b'
                      WHEN floor((sg.seg_sum::DOUBLE / {SAX_SEG_DAYS}.0
                                  - m.s1::DOUBLE / {N_DAYS}.0)
                                 / sqrt(m.s2::DOUBLE / {N_DAYS}.0
                                        - (m.s1::DOUBLE / {N_DAYS}.0)
                                          * (m.s1::DOUBLE / {N_DAYS}.0))
                                 * 1000000.0 + 0.5) / 1000000.0 < {SAX_BREAKS[2]} THEN 'c'
                      ELSE 'd' END END AS sym,
               log2({N_DAYS}.0) + 2.0 * log2(greatest(m.max_v, 1)::DOUBLE) < 62.0
                   AS headroom_ok
        FROM seg_grid sg JOIN moments m USING (user_id)
    ), words AS (
        SELECT user_id,
               CASE WHEN min(headroom_ok) AND count(sym) = count(*) THEN
                 string_agg(sym, '' ORDER BY seg) END AS sax_word,
               min(headroom_ok) AS headroom_ok
        FROM symbols GROUP BY user_id
    ), freq AS (
        SELECT sax_word, count(*)::BIGINT AS n_users_same_word
        FROM words WHERE sax_word IS NOT NULL GROUP BY sax_word
    )
    SELECT w.user_id, w.sax_word, f.n_users_same_word, w.headroom_ok
    FROM words w LEFT JOIN freq f USING (sax_word)
"""
QUERIES["timeseries_sax_words"] = q_timeseries_sax_words


#: EWMA/SMA crossover geometry: alpha = 1/2 (dyadic, so the recurrence is
#: an exact integer prefix sum), slow line = 3-day simple moving average
EWMA_SMA_DAYS = 3


def q_timeseries_ewma_crossover(spark: SparkSession, sf: str) -> DataFrame:
    """EWMA vs moving-average crossover signals per user — the classic
    fast/slow trend detector — with the EWMA recurrence e_t = (v_t +
    e_{t-1}) / 2 restated as an EXACT INTEGER prefix sum: multiplying by
    2^{t-1} gives E_t = v_1 + sum_{s=2..t} v_s * 2^{s-2}, a plain
    running sum of integer-weighted daily cents, so the sequential
    recurrence needs no applyInPandas kernel (the Holt contrast) and no
    float accumulates anywhere.

        ewma_t = E_t / 2^{t-1}   (one double division, micro-floored)
        above  = 3 * E_t > S3_t * 2^{t-1}   (exact integer compare)

    where S3 is the 3-day window sum; crossover = the `above` signal
    differs from the previous day's. Both the division and the compare
    are exact: the int64 products are guarded, and E_t is guarded to
    stay below 2^53 so the double division itself is exact-input
    (log2(max_v) + N_DAYS - 2 < 52, read from the per-user max — the
    enforced Mann-Whitney guard discipline; tripped users NULL their
    signals LOUDLY).

    Scale shape: one combine-friendly (user, day) cents aggregate; the
    dense 30-day grid is users x N_DAYS (broadcast day spine); all three
    windows (prefix sum, 3-day frame, lag) share ONE partitioning on
    user_id ordered by day. Nothing beyond user x 30 rows exists.

    Series-length bound + upgrade path (VERDICT r9 #6): the 2^{t-1}
    scaling is CONSTITUTIONALLY bounded — log2(max_v) + N - 2 < 52 can
    never hold much past N ~ 40, whatever the values. For longer grids
    the named fallback is an applyInPandas kernel over user_id-grouped
    (day, v) rows computing E_t as a PYTHON BIGINT prefix sum and
    rounding exactly in integer space (ewma_micro = (E_t * 2_000_000 +
    2^{t-1}) // 2^t — no float ever touches the unbounded term), i.e.
    the Holt-kernel shape at `timeseries_holt_forecast`. It is not
    wired here because the query is DEFINED on the 30-day grid and the
    oracle cannot mirror bigints past DuckDB's 128-bit hugeint; tripped
    users instead NULL loudly (guard-trip pinned in
    tests/test_ewma_guard_trip.py on both engines)."""
    events = load(spark, sf, "events")
    daily = events.groupBy("user_id", F.dayofmonth("ts").alias("day")).agg(
        F.sum(F.expr("cast(floor(value * 100 + 0.5) as bigint)")).alias("v")
    )
    users = daily.groupBy("user_id").agg(F.max(F.abs("v")).alias("max_v"))
    grid = (
        users.crossJoin(F.broadcast(_day_grid(spark)))
        .join(daily, ["user_id", "day"], "left")
        .na.fill({"v": 0})
    )
    w_ord = Window.partitionBy("user_id").orderBy("day")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_sma = w_ord.rowsBetween(-(EWMA_SMA_DAYS - 1), Window.currentRow)
    weighted = grid.withColumn(
        "wv",
        F.expr("v * if(day = 1, cast(1 as bigint), shiftleft(cast(1 as bigint), day - 2))"),
    )
    cum = (
        weighted.withColumn("e_scaled", F.sum("wv").over(w_cum))
        .withColumn("s3", F.sum("v").over(w_sma))
        .withColumn("n_in_frame", F.count("v").over(w_sma))
    )
    ok = F.expr(
        f"log2(cast(greatest(max_v, 1) as double)) + {N_DAYS} - 2 < 52.0"
    )
    ewma = F.expr(
        "cast(floor(cast(e_scaled as double)"
        " / cast(shiftleft(cast(1 as bigint), day - 1) as double)"
        " * 1000000.0 + 0.5) as bigint)"
    )
    above = F.expr(
        f"3 * e_scaled > s3 * shiftleft(cast(1 as bigint), day - 1)"
    )
    sig = cum.select(
        "user_id",
        "day",
        F.when(ok, ewma).alias("ewma_micro"),
        F.when(F.col("n_in_frame") == EWMA_SMA_DAYS, F.col("s3")).alias(
            "sma3_cents"
        ),
        F.when(ok & (F.col("n_in_frame") == EWMA_SMA_DAYS), above).alias(
            "above_sma"
        ),
        ok.alias("headroom_ok"),
    )
    prev = F.lag("above_sma").over(w_ord)
    return sig.withColumn(
        "is_crossover",
        F.when(
            F.col("above_sma").isNotNull() & prev.isNotNull(),
            F.col("above_sma") != prev,
        ),
    )


ORACLES["timeseries_ewma_crossover"] = f"""
    WITH daily AS (
        SELECT user_id, extract(day FROM ts)::INT AS day,
               sum(floor(value * 100 + 0.5)::BIGINT)::BIGINT AS v
        FROM events GROUP BY 1, 2
    ), users AS (
        SELECT user_id, max(abs(v))::BIGINT AS max_v FROM daily GROUP BY user_id
    ), grid AS (
        SELECT u.user_id, u.max_v, g.day::INT AS day,
               coalesce(d.v, 0)::BIGINT AS v
        FROM users u CROSS JOIN range(1, {N_DAYS + 1}) g(day)
        LEFT JOIN daily d ON d.user_id = u.user_id AND d.day = g.day
    ), cum AS (
        SELECT user_id, max_v, day, v,
               sum(v * CASE WHEN day = 1 THEN 1::BIGINT
                            ELSE (1::BIGINT << (day - 2)) END)
                   OVER (PARTITION BY user_id ORDER BY day
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT
                   AS e_scaled,
               sum(v) OVER (PARTITION BY user_id ORDER BY day
                            ROWS BETWEEN {EWMA_SMA_DAYS - 1} PRECEDING
                            AND CURRENT ROW)::BIGINT AS s3,
               count(v) OVER (PARTITION BY user_id ORDER BY day
                              ROWS BETWEEN {EWMA_SMA_DAYS - 1} PRECEDING
                              AND CURRENT ROW) AS n_in_frame
        FROM grid
    ), sig AS (
        SELECT user_id, day,
               CASE WHEN ok THEN
                 floor(e_scaled::DOUBLE / (1::BIGINT << (day - 1))::DOUBLE
                       * 1000000.0 + 0.5)::BIGINT END AS ewma_micro,
               CASE WHEN n_in_frame = {EWMA_SMA_DAYS} THEN s3 END AS sma3_cents,
               CASE WHEN ok AND n_in_frame = {EWMA_SMA_DAYS} THEN
                 3 * e_scaled > s3 * (1::BIGINT << (day - 1)) END AS above_sma,
               ok AS headroom_ok
        FROM (
            SELECT *, log2(greatest(max_v, 1)::DOUBLE) + {N_DAYS} - 2 < 52.0 AS ok
            FROM cum
        )
    )
    SELECT user_id, day, ewma_micro, sma3_cents, above_sma,
           headroom_ok,
           CASE WHEN above_sma IS NOT NULL
                 AND lag(above_sma) OVER (PARTITION BY user_id ORDER BY day)
                     IS NOT NULL
                THEN above_sma != lag(above_sma)
                     OVER (PARTITION BY user_id ORDER BY day) END AS is_crossover
    FROM sig
"""
QUERIES["timeseries_ewma_crossover"] = q_timeseries_ewma_crossover


#: cross-correlation probe: lead series, lag series, max |lag| in hours
XCORR_A = "view"
XCORR_B = "purchase"
XCORR_MAX_LAG = 6


def q_timeseries_crosscorr(spark: SparkSession, sf: str) -> DataFrame:
    """Lagged cross-correlation between the hourly XCORR_A and XCORR_B
    event-count series at lags -XCORR_MAX_LAG..+XCORR_MAX_LAG — the
    lead/lag discovery tool (a peak at lag k > 0 means views lead
    purchases by k hours: the conversion latency at the AGGREGATE level,
    complementing funnel_time_to_convert's per-user view).

    r_k = sum_i devA_i * devB_{i+k} / sqrt(sum devA^2 * sum devB^2) with
    each series' deviations L-scaled to integers (dev = L*x - T, the ACF
    discipline), so every numerator is an exact bigint in any
    accumulation order; the denominator is one sqrt over two exact
    integer sums; micro-floored once.

    int64-headroom guard (ENFORCED, the ACF bound): |dev| <= L*T, so
    3*log2(L) + 2*log2(max(T_A, T_B)) < 62, checked on the exact
    pre-scaling totals, NULLing xcorr_micro loudly; mirrored verbatim.

    Scale shape: one shuffle to the hourly rollup (the _dense_hourly
    construction); the side-by-side (h, devA, devB) frame is GRID-sized
    (L rows), so its single ordered window pass computing all 13 lag
    columns is bounded by the calendar, not the corpus — the accepted
    domain-sized-sort trade every dense-grid op in this module makes."""
    # (r14 note: additionally pinning `dense` for its totals/dev consumers
    # measured WORSE — 1.27 vs 1.08 s min-of-5 — the second cache's
    # materialization job outweighs the grid-sized reuse; only `dev` pays)
    dense = _dense_hourly(spark, sf).where(
        F.col("event_type").isin(XCORR_A, XCORR_B)
    )
    totals = dense.groupBy("event_type").agg(
        F.count("*").alias("len"), F.sum("n").alias("tot")
    )
    # pinned (r14): dev is GRID-sized (hours x 2 rows) and has three
    # consumers (the a/b sides of the hour join and the denominator sums)
    # whose per-side event_type filters push into the scans — no
    # ReusedExchange, so each re-ran the whole _dense_hourly chain
    # (plan showed 3x the scan set; guide §5)
    dev = pinned(
        dense.join(F.broadcast(totals), "event_type").select(
            "event_type",
            "h",
            (F.col("len") * F.col("n") - F.col("tot")).alias("dev"),
            "len",
            "tot",
        )
    )
    a = dev.where(F.col("event_type") == XCORR_A).select(
        "h", F.col("dev").alias("da"), F.col("len").alias("l"),
        F.col("tot").alias("ta"),
    )
    b = dev.where(F.col("event_type") == XCORR_B).select(
        "h", F.col("dev").alias("db"), F.col("tot").alias("tb")
    )
    side = a.join(b, "h")
    wo = Window.orderBy("h")
    lags = list(range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1))
    shifted = side.select(
        "da",
        "l",
        "ta",
        "tb",
        *[
            (
                F.lead("db", k).over(wo) if k >= 0 else F.lag("db", -k).over(wo)
            ).alias(f"b{k + XCORR_MAX_LAG}")
            for k in lags
        ],
    )
    pairs = shifted.select(
        "l",
        "ta",
        "tb",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("lag"),
                        (F.col("da") * F.col(f"b{k + XCORR_MAX_LAG}")).alias("p"),
                    )
                    for k in lags
                ]
            )
        ).alias("lp"),
    ).select("l", "ta", "tb", F.col("lp.lag").alias("lag"), F.col("lp.p").alias("p"))
    nums = pairs.where(F.col("p").isNotNull()).groupBy("lag").agg(
        F.sum("p").alias("num"),
        F.count("*").alias("n_pairs"),
        F.min("l").alias("l"),
        F.min("ta").alias("ta"),
        F.min("tb").alias("tb"),
    )
    dens = (
        dev.groupBy("event_type")
        .agg(F.sum(F.col("dev") * F.col("dev")).alias("d2"))
        .groupBy()
        .agg(
            F.min(F.when(F.col("event_type") == XCORR_A, F.col("d2"))).alias(
                "den_a"
            ),
            F.min(F.when(F.col("event_type") == XCORR_B, F.col("d2"))).alias(
                "den_b"
            ),
        )
    )
    joined = nums.crossJoin(F.broadcast(dens))
    ok = F.expr(
        "3.0 * log2(cast(l as double))"
        " + 2.0 * log2(cast(greatest(ta, tb, 2) as double)) < 62.0"
    )
    xc = F.expr(
        "case when den_a > 0 and den_b > 0 then"
        " cast(num as double)"
        " / sqrt(cast(den_a as double) * cast(den_b as double)) end"
    )
    return joined.select(
        "lag",
        "n_pairs",
        F.when(ok, F.floor(xc * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")).alias(
            "xcorr_micro"
        ),
        ok.alias("headroom_ok"),
    )


QUERIES["timeseries_crosscorr"] = q_timeseries_crosscorr


def _xcorr_oracle() -> str:
    lags = list(range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1))
    shift_cols = ",\n                   ".join(
        (
            f"lead(db, {k}) OVER wo AS b{k + XCORR_MAX_LAG}"
            if k >= 0
            else f"lag(db, {-k}) OVER wo AS b{k + XCORR_MAX_LAG}"
        )
        for k in lags
    )
    unions = "\n            UNION ALL ".join(
        f"SELECT {k} AS lag, da * b{k + XCORR_MAX_LAG} AS p, l, ta, tb"
        f" FROM shifted WHERE b{k + XCORR_MAX_LAG} IS NOT NULL"
        for k in lags
    )
    return f"""
        WITH hourly AS (
            SELECT event_type, date_trunc('hour', ts) AS h,
                   count(*)::BIGINT AS n
            FROM events GROUP BY 1, 2
        ), bounds AS (
            SELECT min(h) AS lo, max(h) AS hi FROM hourly
        ), grid AS (
            SELECT t.event_type, g.h
            FROM (SELECT DISTINCT event_type FROM hourly) t
            CROSS JOIN (SELECT unnest(generate_series(
                (SELECT lo FROM bounds), (SELECT hi FROM bounds),
                INTERVAL 1 HOUR)) AS h) g
        ), dense AS MATERIALIZED (
            SELECT g.event_type, g.h, coalesce(hourly.n, 0)::BIGINT AS n
            FROM grid g LEFT JOIN hourly
              ON hourly.event_type = g.event_type AND hourly.h = g.h
            WHERE g.event_type IN ('{XCORR_A}', '{XCORR_B}')
        ), totals AS (
            SELECT event_type, count(*)::BIGINT AS len, sum(n)::BIGINT AS tot
            FROM dense GROUP BY 1
        ), dev AS MATERIALIZED (
            SELECT d.event_type, d.h, t.len * d.n - t.tot AS dev, t.len, t.tot
            FROM dense d JOIN totals t USING (event_type)
        ), side AS (
            SELECT a.h, a.dev AS da, b.dev AS db, a.len AS l,
                   a.tot AS ta, b.tot AS tb
            FROM (SELECT * FROM dev WHERE event_type = '{XCORR_A}') a
            JOIN (SELECT * FROM dev WHERE event_type = '{XCORR_B}') b
              USING (h)
        ), shifted AS (
            SELECT da, l, ta, tb,
                   {shift_cols}
            FROM side WINDOW wo AS (ORDER BY h)
        ), pairs AS (
            {unions}
        ), nums AS (
            SELECT lag, sum(p)::BIGINT AS num, count(*)::BIGINT AS n_pairs,
                   min(l)::BIGINT AS l, min(ta)::BIGINT AS ta,
                   min(tb)::BIGINT AS tb
            FROM pairs GROUP BY lag
        ), dens AS (
            SELECT min(CASE WHEN event_type = '{XCORR_A}' THEN d2 END)::BIGINT
                       AS den_a,
                   min(CASE WHEN event_type = '{XCORR_B}' THEN d2 END)::BIGINT
                       AS den_b
            FROM (SELECT event_type, sum(dev * dev)::BIGINT AS d2
                  FROM dev GROUP BY event_type)
        )
        SELECT n.lag, n.n_pairs,
               CASE WHEN 3.0 * log2(n.l::DOUBLE)
                         + 2.0 * log2(greatest(n.ta, n.tb, 2)::DOUBLE) < 62.0
               THEN CASE WHEN d.den_a > 0 AND d.den_b > 0 THEN
                 floor(n.num::DOUBLE / sqrt(d.den_a::DOUBLE * d.den_b::DOUBLE)
                       * 1000000.0 + 0.5)::BIGINT END END AS xcorr_micro,
               3.0 * log2(n.l::DOUBLE)
               + 2.0 * log2(greatest(n.ta, n.tb, 2)::DOUBLE) < 62.0
                   AS headroom_ok
        FROM nums n CROSS JOIN dens d
    """


ORACLES["timeseries_crosscorr"] = _xcorr_oracle()


def q_timeseries_seasonal_strength(spark: SparkSession, sf: str) -> DataFrame:
    """Seasonal-strength score (Wang, Smith & Hyndman 2006; the STL
    diagnostic Hyndman's `feasts` popularized): per event_type,
    F_s = max(0, 1 - Var(deseasonalized) / Var(series)) over the hourly
    count series with the hour-of-day profile as the seasonal component —
    THE forecastability gate run before trusting any seasonal model
    (seasonal_decompose describes the components; this scores how much
    of the variance they explain, in [0, 1] micro units).

    Determinism discipline: y is an exact hourly count; the hour-of-day
    means and the series mean quantize to integer micros ONCE (the
    non-negative half-up idiom), so the residual r = 1e6*y - hod_mean
    and deviation d = 1e6*y - series_mean are exact integers; variances
    come from exact (try_) integer sums via n*S2 - S1^2 evaluated in
    doubles written identically in both engines; the score floors once.
    int64-headroom guard (GUARDED): |r|, |d| <= 2e6 * max_y, so
    log2(n) + 2*log2(2e6 * max_y) < 62, read from the exact per-type
    max; tripped -> strength NULL LOUDLY (oracle mirrored).

    Scale shape: one shuffle to the (type, hour) rollup; the hod profile
    and series moments are |types|x24- and |types|-row aggregates joined
    back BROADCAST; nothing event-sized moves twice."""
    events = load(spark, sf, "events")
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("h")
    ).agg(F.count("*").alias("y"))
    hod = hourly.groupBy(
        "event_type", F.hour("h").alias("hod")
    ).agg(F.expr("(2000000 * sum(y) + count(*)) div (2 * count(*))").alias("hm"))
    tot = hourly.groupBy("event_type").agg(
        F.expr("(2000000 * sum(y) + count(*)) div (2 * count(*))").alias("my"),
        F.max("y").alias("max_y"),
    )
    j = (
        hourly.withColumn("hod", F.hour("h"))
        .join(F.broadcast(hod), ["event_type", "hod"])
        .join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "max_y",
            F.expr("1000000 * y - hm").alias("r"),
            F.expr("1000000 * y - my").alias("d"),
        )
    )
    g = j.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.expr("try_sum(r)").alias("sr"),
        F.expr("try_sum(try_multiply(r, r))").alias("srr"),
        F.expr("try_sum(d)").alias("sd"),
        F.expr("try_sum(try_multiply(d, d))").alias("sdd"),
        F.max("max_y").alias("max_y"),
    )
    ok = F.expr(
        "case when n = 0 then true else"
        " log2(cast(n as double))"
        " + 2.0 * log2(2000000.0 * cast(greatest(max_y, 1) as double)) < 62.0 end"
    )
    var_r = (
        "(cast(n as double) * cast(srr as double)"
        " - cast(sr as double) * cast(sr as double))"
    )
    var_d = (
        "(cast(n as double) * cast(sdd as double)"
        " - cast(sd as double) * cast(sd as double))"
    )
    strength = F.expr(
        f"case when n > 1 and {var_d} > 0.0 then"
        f" greatest(0.0d, 1.0 - {var_r} / {var_d}) end"
    )
    return g.select(
        "event_type",
        "n",
        F.when(ok, F.floor(strength * F.lit(1000000.0) + F.lit(0.5)).cast("bigint")).alias(
            "seasonal_strength_micro"
        ),
        ok.alias("headroom_ok"),
    ).orderBy("event_type")


QUERIES["timeseries_seasonal_strength"] = q_timeseries_seasonal_strength
ORACLES["timeseries_seasonal_strength"] = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS h, count(*)::BIGINT AS y
        FROM events GROUP BY 1, 2
    ), hod AS (
        SELECT event_type, extract(hour FROM h)::INT AS hod,
               ((2000000 * sum(y) + count(*)) // (2 * count(*)))::BIGINT AS hm
        FROM hourly GROUP BY 1, 2
    ), tot AS (
        SELECT event_type,
               ((2000000 * sum(y) + count(*)) // (2 * count(*)))::BIGINT AS my,
               max(y)::BIGINT AS max_y
        FROM hourly GROUP BY 1
    ), j AS (
        SELECT h.event_type, t.max_y,
               1000000 * y - hm AS r, 1000000 * y - my AS d
        FROM hourly h
        JOIN hod ON hod.event_type = h.event_type
               AND hod.hod = extract(hour FROM h.h)::INT
        JOIN tot t ON t.event_type = h.event_type
    ), g AS (
        SELECT event_type, count(*)::BIGINT AS n,
               sum(r)::BIGINT AS sr, sum(r::HUGEINT * r) AS srr,
               sum(d)::BIGINT AS sd, sum(d::HUGEINT * d) AS sdd,
               max(max_y)::BIGINT AS max_y
        FROM j GROUP BY event_type
    ), ok_t AS (
        SELECT *, CASE WHEN n = 0 THEN true ELSE
                  log2(n::DOUBLE)
                  + 2.0 * log2(2000000.0 * greatest(max_y, 1)::DOUBLE) < 62.0
                  END AS headroom_ok
        FROM g
    )
    SELECT event_type, n,
           CASE WHEN headroom_ok THEN
             CASE WHEN n > 1 AND
                  (n::DOUBLE * sdd::DOUBLE - sd::DOUBLE * sd::DOUBLE) > 0.0
             THEN floor(greatest(0.0,
                    1.0 - (n::DOUBLE * srr::DOUBLE - sr::DOUBLE * sr::DOUBLE)
                        / (n::DOUBLE * sdd::DOUBLE - sd::DOUBLE * sd::DOUBLE))
                    * 1000000.0 + 0.5)::BIGINT END
           END AS seasonal_strength_micro,
           headroom_ok
    FROM ok_t
    ORDER BY event_type
"""


# --- r13: Holt-Winters additive seasonal smoothing ----------------------------

HW_ALPHA = 0.5  # level;    dyadic -> bit-identical IEEE sequences
HW_BETA = 0.25  # trend
HW_GAMMA = 0.25  # seasonal
HW_M = 7  # weekly season over the 30-day window (4+ full cycles)
HW_H = 7  # forecast horizon: one season ahead


def q_timeseries_holt_winters(spark: SparkSession, sf: str) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing (Winters 1960) of each
    user's 30-day dense daily series with a weekly (m=7) season — the
    seasonal completion of `timeseries_holt_forecast` (level+trend only):
    final level, trend, the seasonal component the H-step forecast will
    consume, and the H=7-step-ahead forecast l + H*b + s_{t+H-m}.

    Initialization is the classic two-season form: level = mean of days
    1..7, trend = (mean(days 8..14) - mean(days 1..7)) / 7, seasonal_i =
    v_i - level for i = 1..7; then for t = 8..30 (pos = (t-1) mod 7):

        l' = alpha*(v_t - s_pos) + (1-alpha)*(l + b)
        b' = beta*(l' - l) + (1-beta)*b
        s_pos' = gamma*(v_t - l') + (1-gamma)*s_pos

    The per-series recurrence runs as a map-side SQL `aggregate` fold
    carrying the (level, trend, seasonal array) struct (r14 — formerly an
    `applyInPandas` kernel: same per-group state, without the JVM↔Python
    boundary or the dense-grid crossJoin; the sparse daily sums aggregate
    straight to a zero-filled 30-slot array); the DuckDB oracle replays
    the SAME recurrence as a recursive CTE carrying (level, trend,
    seasonal LIST) per user, stepping t = 8..30 with the identical
    operand association over dyadic alpha/beta/gamma (sums left-folded
    identically in both engines, so the float sequences are
    IEEE-identical, rounded once at the end)."""
    return _holt_winters_fold(_slot_series(spark, sf))


def _holt_winters_fold(series: DataFrame) -> DataFrame:
    """(user_id, level, trend, season_next, forecast_h) from a
    (user_id, v array<double>) frame via the Holt-Winters recurrence as a
    map-side SQL `aggregate` fold — operand association matches the
    pre-r14 Python kernel and the DuckDB oracle exactly (dyadic
    alpha/beta/gamma, sums left-folded)."""
    a, b_, g_ = HW_ALPHA, HW_BETA, HW_GAMMA
    # left-folded 7-day season means, identical association to the
    # kernel's functools.reduce(operator.add, ...)
    m1 = "(" + " + ".join(f"element_at(v, {i})" for i in range(1, HW_M + 1)) + f") / 7.0"
    m2 = (
        "("
        + " + ".join(f"element_at(v, {i})" for i in range(HW_M + 1, 2 * HW_M + 1))
        + ") / 7.0"
    )
    # 1-based seasonal slot for step t: ((t - 1) % m) + 1
    pos = f"cast((t - 1) % {HW_M} + 1 as int)"
    sp = f"element_at(st.s, {pos})"
    vt = "element_at(v, cast(t as int))"
    l_new = f"({a!r} * ({vt} - {sp}) + {1.0 - a!r} * (st.lv + st.b))"
    st = F.expr(
        f"aggregate(sequence({HW_M} + 1, size(v)),"
        f" named_struct("
        f"   'lv', {m1},"
        f"   'b', ({m2} - {m1}) / 7.0,"
        f"   's', transform(sequence(1, {HW_M}),"
        f"                  i -> element_at(v, i) - {m1})),"
        f" (st, t) -> named_struct("
        f"   'lv', {l_new},"
        f"   'b', {b_!r} * ({l_new} - st.lv) + {1.0 - b_!r} * st.b,"
        f"   's', transform(sequence(1, {HW_M}), i ->"
        f"     IF(i = {pos},"
        f"        {g_!r} * ({vt} - {l_new}) + {1.0 - g_!r} * {sp},"
        f"        element_at(st.s, cast(i as int))))))"
    )
    nxt = f"cast((size(v) + {HW_H} - 1) % {HW_M} + 1 as int)"
    return (
        series.select("user_id", "v")
        .select("user_id", st.alias("st"), F.expr(f"{nxt}").alias("np"))
        .select(
            "user_id",
            F.round(F.col("st.lv"), 4).alias("level"),
            F.round(F.col("st.b"), 4).alias("trend"),
            F.round(F.expr("element_at(st.s, np)"), 4).alias("season_next"),
            F.round(
                F.col("st.lv") + 7.0 * F.col("st.b")
                + F.expr("element_at(st.s, np)"),
                4,
            ).alias("forecast_h"),
        )
    )


def holt_winters_daily(dense: DataFrame) -> DataFrame:
    """Holt-Winters additive smoothing over ANY dense (user_id, day, v)
    daily frame whose per-user day range covers >= 2*HW_M days — the
    extracted core of `q_timeseries_holt_winters` (math and determinism
    notes there). r14: the recurrence is a SQL `aggregate` fold over the
    day-sorted value array (one groupBy, no Python boundary); values are
    bit-identical to the former applyInPandas kernel."""
    series = dense.groupBy("user_id").agg(
        F.expr(
            "transform(array_sort(collect_list(struct(day, v))),"
            " s -> cast(s.v as double))"
        ).alias("v")
    )
    return _holt_winters_fold(series)


QUERIES["timeseries_holt_winters"] = q_timeseries_holt_winters


def _hw_oracle() -> str:
    m1 = "(" + "+".join(f"v[{i}]" for i in range(1, HW_M + 1)) + ") / 7.0"
    m2 = "(" + "+".join(f"v[{i}]" for i in range(HW_M + 1, 2 * HW_M + 1)) + ") / 7.0"
    sp = f"s[(t % {HW_M}) + 1]"
    lnew = (
        f"({HW_ALPHA} * (v[t + 1] - {sp})"
        f" + {1.0 - HW_ALPHA} * (l + b))"
    )
    return f"""
        WITH RECURSIVE daily AS (
            SELECT user_id, date_part('day', ts)::INT AS day,
                   round(sum(value), 2) AS v
            FROM events GROUP BY 1, 2
        ), grid AS (
            SELECT u.user_id, g.day
            FROM (SELECT DISTINCT user_id FROM events) u
            CROSS JOIN (SELECT unnest(generate_series(1, {N_DAYS})) AS day) g
        ), dense AS (
            SELECT g.user_id, g.day, coalesce(daily.v, 0.0) AS v
            FROM grid g LEFT JOIN daily USING (user_id, day)
        ), vser AS (
            SELECT user_id, list(v ORDER BY day) AS v
            FROM dense GROUP BY user_id
        ), hw AS (
            SELECT user_id, v, {HW_M} AS t,
                   {m1} AS l,
                   ({m2} - {m1}) / 7.0 AS b,
                   list_transform(generate_series(1, {HW_M}),
                                  i -> v[i] - {m1}) AS s
            FROM vser
            UNION ALL
            SELECT user_id, v, t + 1,
                   {lnew},
                   {HW_BETA} * ({lnew} - l) + {1.0 - HW_BETA} * b,
                   list_transform(generate_series(1, {HW_M}), i ->
                       CASE WHEN i = (t % {HW_M}) + 1
                            THEN {HW_GAMMA} * (v[t + 1] - {lnew})
                                 + {1.0 - HW_GAMMA} * {sp}
                            ELSE s[i] END) AS s
            FROM hw WHERE t < {N_DAYS}
        )
        SELECT user_id, round(l, 4) AS level, round(b, 4) AS trend,
               round(s[{((N_DAYS + HW_H - 1) % HW_M) + 1}], 4) AS season_next,
               round(l + 7.0 * b + s[{((N_DAYS + HW_H - 1) % HW_M) + 1}], 4)
                   AS forecast_h
        FROM hw WHERE t = {N_DAYS}
    """


ORACLES["timeseries_holt_winters"] = _hw_oracle()
