"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash -> CORRECTNESS_r{N}.json).

The real implementation lives in the ``emr_flink_example_spark`` package;
this module is a thin adapter.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from emr_flink_example_spark.plans import catalog  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference-parity pipeline (Kafka2S3Hive restated in batch): derive
    DATE_FORMAT partition columns from event time and aggregate per
    partition directory (SURVEY.md §3.3)."""
    from emr_flink_example_spark.operators.event_time import (
        q_ad_events_partition_projection,
    )

    return q_ad_events_partition_projection(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return catalog.all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (omitted -> rows-only check)."""
    return catalog.all_oracles()
