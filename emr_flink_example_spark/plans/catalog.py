"""The judged query catalog: merges every operator module's QUERIES/ORACLES.

Driver contract (__spark_entry__.py): `queries()` maps name -> builder,
`oracle_sql()` maps name -> DuckDB SQL. Builders without an oracle entry get
the driver's weaker rows-only check (documented per-module; currently only
sketch-based ops whose values are engine-specific, e.g. HLL approx counts).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..operators import (
    analytics,
    dedup,
    event_time,
    multimodal,
    relational,
    sampling,
    similarity,
    textstats,
    timeseries,
    udfs,
)

_MODULES = (
    relational,
    event_time,
    textstats,
    dedup,
    similarity,
    multimodal,
    timeseries,
    sampling,
    analytics,
    udfs,
)

QueryFn = Callable[[SparkSession, str], DataFrame]


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        overlap = out.keys() & m.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query names {overlap} in {m.__name__}")
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        unknown = m.ORACLES.keys() - m.QUERIES.keys()
        if unknown:
            raise ValueError(f"oracle without query {unknown} in {m.__name__}")
        out.update(m.ORACLES)
    return out
