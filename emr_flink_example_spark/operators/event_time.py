"""Event-time operators: the reference-parity projection plus the streaming
window family (tumbling / sliding / session), as-of join, and keyed dedup.

These are expressed over the bounded `events` table so the DuckDB oracle can
check them; the *same* builders run unchanged on a streaming DataFrame (add
`withWatermark`) — see streaming/ for the live pipelines. `events.ts` stands
in for the reference's Kafka event time (FIXTURES.md §2).

Scale notes: `window()`/`session_window()` aggregations shuffle once on
(key, window); session windows additionally sort within partitions (Spark's
updating session aggregation). The as-of join is the union-window form — one
shuffle on user_id, no range-join explosion, robust to 100 TB fact sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.timeutils import hour_part, logday, minute_part
from ..io import load


def q_ad_events_partition_projection(spark: SparkSession, sf: str) -> DataFrame:
    """Reference-parity flagship (Kafka2S3Hive.scala:114-129 restated in batch).

    The reference's continuous INSERT projects the event columns plus
    DATE_FORMAT partitions logday/h/m; here the same projection is aggregated
    per partition directory — i.e. "what would land in each Hive partition".
    """
    events = load(spark, sf, "events")
    return (
        events.select(
            "event_id",
            "user_id",
            "event_type",
            "value",
            logday(F.col("ts")).alias("logday"),
            hour_part(F.col("ts")).alias("h"),
            minute_part(F.col("ts")).alias("m"),
        )
        .groupBy("logday", "h")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_window_tumbling(spark: SparkSession, sf: str) -> DataFrame:
    """Tumbling 1-hour event-time windows (streaming: add withWatermark)."""
    events = load(spark, sf, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def q_window_sliding(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding windows: 1 hour long, every 30 minutes (each event in 2 windows)."""
    events = load(spark, sf, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        # avg via exact integer micros: values are 2-decimal, so the window
        # sum is an exact bigint cents sum and avg_micro = half-up of
        # 1e4*cents/n — the float round(x, 6) form fluttered at 1e9+
        # magnitudes where 1e-6 is below the double ulp (dirty-events
        # sweep, r12). Bounded: 2e4 * cents overflows only past a $4.6e14
        # window sum. The /1e6 double conversion is the same operation in
        # both engines, so the printed value is bit-identical.
        .agg(
            F.count("*").alias("n_events"),
            (
                F.expr(
                    "(2 * 10000 * sum(cast(floor(value * 100 + 0.5) as bigint))"
                    " + count(*)) div (2 * count(*))"
                ).cast("double")
                / 1000000.0
            ).alias("avg_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_events",
            "avg_value",
        )
    )


def q_window_session(spark: SparkSession, sf: str) -> DataFrame:
    """Session windows with a 30-minute inactivity gap, per user.

    Spark's session_window end = last event ts + gap; the oracle reproduces
    that with a gaps-and-islands construction.
    """
    events = load(spark, sf, "events")
    return (
        events.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"), F.round(F.sum("value"), 2).alias("sum_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key_col: str = "user_id",
    left_ts_col: str = "ts",
    right_ts_col: str = "ts",
    left_id_col: str = "event_id",
    right_id_col: str = "event_id",
) -> DataFrame:
    """Backward as-of join of ANY two keyed event frames: for each left
    row, the latest right row at-or-before its timestamp within the same
    key — (left_id, <key_col>, left_ts, right_ts, right_id); right_ts and
    right_id are NULL when no right row precedes.

    Implemented as the union-window pattern: tag both sides, sort within
    the key (right rows before left rows at equal ts via the side tag),
    then `last(right_struct, ignoreNulls)` over an unbounded-preceding
    frame. One shuffle, no per-row range probing — the scalable as-of
    form."""
    L = left.select(
        F.col(left_id_col).alias("row_id"),
        F.col(key_col).alias(key_col),
        F.col(left_ts_col).alias("ts"),
        F.lit(1).alias("is_left"),
    )
    # SQL join-key semantics: a NULL-key right row can never match (the
    # window's NULL partition would otherwise pair NULL-key sides, where
    # an equality-keyed ASOF JOIN never does); NULL-key LEFT rows are
    # preserved with a NULL match, exactly like a left join
    R = right.where(F.col(key_col).isNotNull()).select(
        F.col(right_id_col).alias("row_id"),
        F.col(key_col).alias(key_col),
        F.col(right_ts_col).alias("ts"),
        F.lit(0).alias("is_left"),
    )
    unioned = L.unionByName(R).withColumn(
        "right_info",
        F.when(
            F.col("is_left") == 0,
            F.struct(F.col("ts").alias("v_ts"), F.col("row_id").alias("v_id")),
        ),
    )
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col("ts").asc(), F.col("is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_right", F.last("right_info", ignorenulls=True).over(w))
        .where(F.col("is_left") == 1)
        .select(
            F.col("row_id").alias("left_id"),
            key_col,
            F.col("ts").alias("left_ts"),
            F.col("last_right.v_ts").alias("right_ts"),
            F.col("last_right.v_id").alias("right_id"),
        )
    )


def q_asof_join(spark: SparkSession, sf: str) -> DataFrame:
    """As-of join: for each purchase, the latest view at-or-before it per
    user (the fixture instance of the generic `asof_join`)."""
    events = load(spark, sf, "events")
    return asof_join(
        events.where(F.col("event_type") == "purchase"),
        events.where(F.col("event_type") == "view"),
    ).select(
        F.col("left_id").alias("purchase_id"),
        "user_id",
        F.col("left_ts").alias("purchase_ts"),
        F.col("right_ts").alias("view_ts"),
        F.col("right_id").alias("view_id"),
    )


def q_asof_join_forward(spark: SparkSession, sf: str) -> DataFrame:
    """Forward as-of join: for each purchase, the EARLIEST error event
    at-or-after it per user (the look-ahead direction: "did this purchase
    precede a failure?").

    Same union-window shape as q_asof_join, mirrored: purchases sort before
    errors at equal ts (side tag), ties among simultaneous errors break on
    event_id, and `first(error_struct, ignoreNulls)` runs over a
    currentRow..unboundedFollowing frame. One shuffle on user_id."""
    events = load(spark, sf, "events")
    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(0).alias("is_err")
    )
    # NULL-user errors never match (SQL join-key semantics, see asof_join)
    errors = events.where(
        (F.col("event_type") == "error") & F.col("user_id").isNotNull()
    ).select("event_id", "user_id", "ts", F.lit(1).alias("is_err"))
    unioned = purchases.unionByName(errors).withColumn(
        "err_info",
        F.when(
            F.col("is_err") == 1,
            F.struct(F.col("ts").alias("e_ts"), F.col("event_id").alias("e_id")),
        ),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("is_err").asc(), F.col("event_id").asc())
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    return (
        unioned.withColumn("next_err", F.first("err_info", ignorenulls=True).over(w))
        .where(F.col("is_err") == 0)
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            F.col("next_err.e_ts").alias("error_ts"),
            F.col("next_err.e_id").alias("error_id"),
        )
    )


def q_join_range_binned(spark: SparkSession, sf: str) -> DataFrame:
    """Range (interval) join, binned form: events falling inside daily
    maintenance windows (08:00-11:00, first 10 days of Jan 2024).

    The scalable shape: an equi-join on the time bin (day) does the heavy
    lifting as a hash join; the BETWEEN residual only filters within-bin
    candidates. A naive `ts BETWEEN start AND end` join is a
    broadcast-nested-loop over the whole fact table — never at 100 TB.
    Intervals spanning bins are exploded to one row per covered bin first."""
    events = load(spark, sf, "events")
    intervals = spark.range(1, 11).select(
        F.col("id").cast("int").alias("interval_id"),
        F.to_timestamp(
            F.concat(F.lit("2024-01-"), F.lpad(F.col("id").cast("string"), 2, "0"), F.lit(" 08:00:00"))
        ).cast("timestamp_ntz").alias("w_start"),
        F.to_timestamp(
            F.concat(F.lit("2024-01-"), F.lpad(F.col("id").cast("string"), 2, "0"), F.lit(" 11:00:00"))
        ).cast("timestamp_ntz").alias("w_end"),
    ).withColumn("day", F.dayofmonth("w_start"))
    binned = events.withColumn("day", F.dayofmonth("ts"))
    return (
        binned.join(
            F.broadcast(intervals),
            (binned["day"] == intervals["day"])
            & (F.col("ts") >= F.col("w_start"))
            & (F.col("ts") < F.col("w_end")),
        )
        .groupBy("interval_id")
        .agg(
            F.count("*").alias("n_events"),
            F.round(F.sum("value"), 2).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def q_dedup_by_key(spark: SparkSession, sf: str) -> DataFrame:
    """Exact keyed dedup keeping the earliest record per (user_id, event_type).

    Deterministic form of dropDuplicates (which keeps an arbitrary row):
    min-by over the unique event_id. Streaming twin: dropDuplicates within a
    watermark (see streaming/)."""
    events = load(spark, sf, "events")
    return (
        events.groupBy("user_id", "event_type")
        .agg(F.min("event_id").alias("first_event_id"), F.count("*").alias("n_dupes"))
    )


def q_asof_join_nearest(spark: SparkSession, sf: str) -> DataFrame:
    """Nearest as-of join: for each purchase, the view closest in EITHER
    time direction per user (tolerance-style as-of, pandas merge_asof
    direction='nearest'), with fully deterministic tie-breaks: equal
    distance prefers the earlier (backward) view; equal timestamps within
    a direction break on event_id (max backward, min forward — the order
    the window frames see).

    Same single-exchange union-window shape as q_asof_join: ONE user_id
    sort serves both the backward `last()` and the forward `first()`
    frame, then the winner is integer-microsecond arithmetic per row —
    no per-row range probe, no second shuffle."""
    events = load(spark, sf, "events")

    def us(c):
        return F.unix_micros(c.cast("timestamp"))

    purchases = events.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", F.lit(1).alias("is_left")
    )
    # NULL-user views never match (SQL join-key semantics, see asof_join)
    views = events.where(
        (F.col("event_type") == "view") & F.col("user_id").isNotNull()
    ).select("event_id", "user_id", "ts", F.lit(0).alias("is_left"))
    unioned = purchases.unionByName(views).withColumn(
        "view_info",
        F.when(
            F.col("is_left") == 0,
            F.struct(F.col("ts").alias("v_ts"), F.col("event_id").alias("v_id")),
        ),
    )
    base = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("is_left").asc(), F.col("event_id").asc()
    )
    back = F.last("view_info", ignorenulls=True).over(
        base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd = F.first("view_info", ignorenulls=True).over(
        base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    scored = (
        unioned.withColumn("back", back)
        .withColumn("fwd", fwd)
        .where(F.col("is_left") == 1)
        .withColumn("d_back", us(F.col("ts")) - us(F.col("back.v_ts")))
        .withColumn("d_fwd", us(F.col("fwd.v_ts")) - us(F.col("ts")))
    )
    pick_back = F.col("fwd").isNull() | (
        F.col("back").isNotNull() & (F.col("d_back") <= F.col("d_fwd"))
    )
    nearest = F.when(pick_back, F.col("back")).otherwise(F.col("fwd"))
    return (
        scored.where(F.col("back").isNotNull() | F.col("fwd").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("ts").alias("purchase_ts"),
            nearest["v_id"].alias("view_id"),
            nearest["v_ts"].alias("view_ts"),
            (us(nearest["v_ts"]) - us(F.col("ts"))).alias("delta_us"),
        )
    )


def q_window_sliding_distinct(spark: SparkSession, sf: str) -> DataFrame:
    """Sliding-window DISTINCT aggregation: unique users and event types
    per 1-hour window every 30 minutes — the dashboard staple that does
    NOT decompose into partial sums (distinct state must survive to the
    final aggregate). Spark plans the two-phase expand+distinct-aggregate
    automatically; at 100 TB the pre-shuffle expand doubles rows (one per
    overlapping window), which is the known, bounded cost of slide-based
    windowing."""
    events = load(spark, sf, "events")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(
            F.countDistinct("user_id").alias("n_users"),
            F.countDistinct("event_type").alias("n_event_types"),
            F.count("*").alias("n_events"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "n_users",
            "n_event_types",
            "n_events",
        )
    )


QUERIES = {
    "ad_events_partition_projection": q_ad_events_partition_projection,
    "window_tumbling": q_window_tumbling,
    "window_sliding": q_window_sliding,
    "window_session": q_window_session,
    "asof_join": q_asof_join,
    "asof_join_forward": q_asof_join_forward,
    "join_range_binned": q_join_range_binned,
    "dedup_by_key": q_dedup_by_key,
    "asof_join_nearest": q_asof_join_nearest,
    "window_sliding_distinct": q_window_sliding_distinct,
}

ORACLES = {
    "asof_join_nearest": """
        WITH p AS (
            SELECT event_id AS p_id, user_id, ts AS p_ts FROM events
            WHERE event_type = 'purchase'
        ), v AS (
            SELECT event_id AS v_id, user_id, ts AS v_ts FROM events
            WHERE event_type = 'view'
        ), cand AS (
            SELECT p.p_id, p.user_id, p.p_ts, v.v_id, v.v_ts,
                   row_number() OVER (
                       PARTITION BY p.p_id
                       ORDER BY abs(epoch_us(v.v_ts) - epoch_us(p.p_ts)) ASC,
                                v.v_ts ASC,
                                CASE WHEN v.v_ts <= p.p_ts THEN -v.v_id
                                     ELSE v.v_id END ASC
                   ) AS rn
            FROM p JOIN v USING (user_id)
        )
        SELECT p_id AS purchase_id, user_id, p_ts AS purchase_ts,
               v_id AS view_id, v_ts AS view_ts,
               epoch_us(v_ts) - epoch_us(p_ts) AS delta_us
        FROM cand WHERE rn = 1
    """,
    "window_sliding_distinct": """
        WITH assigned AS (
            SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS window_start,
                   user_id, event_type
            FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES,
                   user_id, event_type
            FROM events
        )
        SELECT window_start,
               window_start + INTERVAL 1 HOUR AS window_end,
               count(DISTINCT user_id) AS n_users,
               count(DISTINCT event_type) AS n_event_types,
               count(*) AS n_events
        FROM assigned
        GROUP BY 1, 2
    """,
    "asof_join_forward": """
        WITH p AS (
            SELECT event_id AS pid, user_id, ts AS pts
            FROM events WHERE event_type = 'purchase'
        ), e AS (
            SELECT event_id AS eid, user_id, ts AS ets
            FROM events WHERE event_type = 'error'
        ), cand AS (
            SELECT p.pid, p.user_id, p.pts, e.ets, e.eid
            FROM p LEFT JOIN e ON e.user_id = p.user_id AND e.ets >= p.pts
        ), ranked AS (
            SELECT *, row_number() OVER (
                PARTITION BY pid ORDER BY ets ASC NULLS LAST, eid ASC) AS rn
            FROM cand
        )
        SELECT pid AS purchase_id, user_id, pts AS purchase_ts,
               ets AS error_ts, eid AS error_id
        FROM ranked WHERE rn = 1
    """,
    "ad_events_partition_projection": """
        SELECT strftime(ts, '%Y-%m-%d') AS logday,
               strftime(ts, '%H') AS h,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events
        GROUP BY 1, 2
    """,
    "window_tumbling": """
        SELECT date_trunc('hour', ts) AS window_start,
               date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
               event_type,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    "window_sliding": """
        WITH assigned AS (
            SELECT time_bucket(INTERVAL 30 MINUTES, ts) AS window_start, value FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL 30 MINUTES, ts) - INTERVAL 30 MINUTES AS window_start, value
            FROM events
        )
        SELECT window_start,
               window_start + INTERVAL 1 HOUR AS window_end,
               count(*) AS n_events,
               ((2 * 10000 * sum(floor(value * 100 + 0.5)::BIGINT)
                 + count(*)) // (2 * count(*)))::DOUBLE / 1000000.0
                   AS avg_value
        FROM assigned
        GROUP BY 1, 2
    """,
    "window_session": """
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
                             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                                > INTERVAL 30 MINUTES
                        THEN 1 ELSE 0 END AS new_session
            FROM events
        ), numbered AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS session_start,
               max(ts) + INTERVAL 30 MINUTES AS session_end,
               count(*) AS n_events,
               round(sum(value), 2) AS sum_value
        FROM numbered
        GROUP BY user_id, session_id
    """,
    "asof_join": """
        SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
               v.ts AS view_ts, v.event_id AS view_id
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
          ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    "join_range_binned": """
        WITH intervals AS (
            SELECT d AS interval_id,
                   (DATE '2024-01-01' + INTERVAL (d - 1) DAY + INTERVAL 8 HOUR)::TIMESTAMP
                       AS w_start,
                   (DATE '2024-01-01' + INTERVAL (d - 1) DAY + INTERVAL 11 HOUR)::TIMESTAMP
                       AS w_end
            FROM (SELECT unnest(generate_series(1, 10)) AS d)
        )
        SELECT interval_id, count(*) AS n_events,
               round(sum(value), 2) AS sum_value,
               count(DISTINCT user_id) AS n_users
        FROM events JOIN intervals
          ON ts >= w_start AND ts < w_end
        GROUP BY interval_id
    """,
    "dedup_by_key": """
        SELECT user_id, event_type, min(event_id) AS first_event_id,
               count(*) AS n_dupes
        FROM events GROUP BY user_id, event_type
    """,
}
