"""Stream-stream joins (SURVEY.md §2 Part B, "Joins — as-of / interval
(stream-stream)" row).

The reference has no joins at all; this is the engine-side surface for the
classic streaming-join workload: click attribution, where a click joins the
impression that preceded it within an attribution horizon.

Semantics/state model: both sides carry watermarks and the join condition
bounds event time on both sides, so Spark can expire buffered rows once the
watermark passes `horizon` — state is bounded by rate x horizon, not stream
length. Without the time bound the join would buffer both streams forever;
`require_time_bound` in the builder makes that misuse impossible rather than
just documented.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def click_attribution(
    impressions: DataFrame,
    clicks: DataFrame,
    horizon: str = "10 minutes",
    watermark: str = "1 minute",
) -> DataFrame:
    """Inner stream-stream join: each click matched to impressions of the
    same ad uuid at most `horizon` before the click.

    `impressions` needs columns (imp_uuid, imp_ts); `clicks` needs
    (click_uuid, click_ts). Output keeps both timestamps plus the uuid, so
    downstream can compute attribution latency."""
    imp = impressions.withWatermark("imp_ts", watermark)
    clk = clicks.withWatermark("click_ts", watermark)
    return imp.join(
        clk,
        F.expr(
            f"""
            imp_uuid = click_uuid
            AND click_ts >= imp_ts
            AND click_ts <= imp_ts + INTERVAL {horizon}
            """
        ),
        "inner",
    ).select("imp_uuid", "imp_ts", "click_ts")
