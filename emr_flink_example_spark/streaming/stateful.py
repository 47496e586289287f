"""Custom stateful streaming operators (SURVEY.md §2 Part B, "Stateful ops").

The reference declares a watermark but never consumes it downstream
(Kafka2S3Hive.scala:70); these operators are the engine-side surface the
checklist row mandates:

  * `streaming_dedup`       — exactly-once-per-key within the watermark
                              horizon (state auto-expired by Spark).
  * `running_ad_type_stats` — custom keyed state via applyInPandasWithState:
                              cumulative per-key aggregates maintained across
                              micro-batches (Arrow-batched, RocksDB-backed
                              state at scale).

100 TB posture: state lives in the state store keyed by group, so cardinality
of the key domain — not stream length — bounds memory; with the RocksDB
provider (session.py) hot state spills to local disk. Watermarks bound the
dedup state; the running-stats state is bounded by the ad_type domain.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.streaming.stateful_processor import StatefulProcessor
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)

#: cumulative state carried across micro-batches, one row per ad_type
_STATE_SCHEMA = StructType(
    [
        StructField("n_events", LongType()),
        StructField("ts_min", LongType()),
        StructField("ts_max", LongType()),
    ]
)

_OUTPUT_SCHEMA = StructType(
    [
        StructField("ad_type", LongType()),
        StructField("n_events", LongType()),
        StructField("ts_min", LongType()),
        StructField("ts_max", LongType()),
    ]
)


def streaming_dedup(parsed: DataFrame, keys: list[str], event_time_col: str, delay: str) -> DataFrame:
    """Drop duplicate records by `keys` within the watermark horizon.

    Equivalent to Flink's dedup-on-keyed-state; Spark expires per-key state
    once the watermark passes, so state size is bounded by delay x rate, not
    by stream length."""
    return parsed.withWatermark(event_time_col, delay).dropDuplicates(keys)


def _update_stats(
    key: tuple[Any, ...],
    batches: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, ts_min, ts_max = state.get if state.exists else (0, None, None)
    for pdf in batches:
        n += len(pdf)
        lo, hi = int(pdf["timestamp"].min()), int(pdf["timestamp"].max())
        ts_min = lo if ts_min is None else min(ts_min, lo)
        ts_max = hi if ts_max is None else max(ts_max, hi)
    state.update((n, ts_min, ts_max))
    yield pd.DataFrame(
        {"ad_type": [key[0]], "n_events": [n], "ts_min": [ts_min], "ts_max": [ts_max]}
    )


def running_ad_type_stats(parsed: DataFrame) -> DataFrame:
    """Cumulative per-ad_type counters maintained across micro-batches.

    Custom state (not expressible as a windowed agg): each batch folds its
    rows into the persisted (n_events, ts_min, ts_max) triple and emits the
    updated totals — the applyInPandasWithState analogue of a Flink keyed
    ProcessFunction over ValueState."""
    return (
        parsed.select(parsed["ad_type"].cast("long").alias("ad_type"), "timestamp")
        .groupBy("ad_type")
        .applyInPandasWithState(
            _update_stats,
            outputStructType=_OUTPUT_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


class _RunningStatsProcessor(StatefulProcessor):
    """transformWithStateInPandas twin of `_update_stats` — the Spark 4
    arbitrary-state API (typed state handles, timers, TTL) that supersedes
    applyInPandasWithState. Kept API-for-API comparable so both surfaces are
    exercised: same key, same state triple, same update-mode emission."""

    def init(self, handle) -> None:
        self._stats = handle.getValueState(
            "stats", "n_events BIGINT, ts_min BIGINT, ts_max BIGINT"
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        prior = self._stats.get() if self._stats.exists() else (0, None, None)
        n, ts_min, ts_max = int(prior[0]), prior[1], prior[2]
        for pdf in rows:
            n += len(pdf)
            lo, hi = int(pdf["timestamp"].min()), int(pdf["timestamp"].max())
            ts_min = lo if ts_min is None else min(int(ts_min), lo)
            ts_max = hi if ts_max is None else max(int(ts_max), hi)
        self._stats.update((n, ts_min, ts_max))
        yield pd.DataFrame(
            {"ad_type": [key[0]], "n_events": [n], "ts_min": [ts_min], "ts_max": [ts_max]}
        )

    def close(self) -> None:
        pass


def running_ad_type_stats_tws(parsed: DataFrame) -> DataFrame:
    """`running_ad_type_stats` through transformWithStateInPandas.

    Functionally identical to the applyInPandasWithState version; uses the
    newer StatefulProcessor contract (explicit state handles — the surface
    that also offers timers and per-state TTL for state hygiene at scale).

    Runtime dependency note: the transformWithState state-server protocol
    needs `google.protobuf` in the Python environment; environments without
    it must use `running_ad_type_stats` (applyInPandasWithState), which has
    no such dependency."""
    return (
        parsed.select(parsed["ad_type"].cast("long").alias("ad_type"), "timestamp")
        .groupBy("ad_type")
        .transformWithStateInPandas(
            statefulProcessor=_RunningStatsProcessor(),
            outputStructType=_OUTPUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )
