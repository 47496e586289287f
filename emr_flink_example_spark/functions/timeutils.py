"""Event-time derivation and partition-column expressions.

Re-expresses the reference's time logic as Catalyst column expressions:
  * epoch-millis BIGINT -> second-truncated TIMESTAMP
    (Kafka2S3Hive.scala:69: `TO_TIMESTAMP(FROM_UNIXTIME(ts/1000,'yyyy-MM-dd HH:mm:ss'))`)
  * logday/h/m partition projections
    (Kafka2S3Hive.scala:123-125: `DATE_FORMAT(event_time, 'yyyy-MM-dd'|'HH'|'mm')`)
  * processing-time daily bucket at a fixed UTC offset
    (Kafka2S3Text.scala:53-59: wall clock at UTC+8, 'yyyyMMdd')
  * event-date bucket from an ISO-8601 string with an 'error' fallback
    (Kafka2S3Parquet.scala:26-35)

All are JVM-side built-ins — no Python UDFs — so they stay inside whole-stage
codegen and cost nothing extra at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def event_time_from_millis(ts_millis: Column) -> Column:
    """Epoch milliseconds -> TIMESTAMP truncated to the second.

    `timestamp_seconds(floor(ts/1000))` matches the reference's
    FROM_UNIXTIME round-trip exactly (it formats with a seconds-precision
    pattern, discarding millis) without a string round-trip.
    """
    return F.timestamp_seconds(F.floor(ts_millis / F.lit(1000)))


def logday(event_time: Column, pattern: str = "yyyy-MM-dd") -> Column:
    return F.date_format(event_time, pattern)


def hour_part(event_time: Column) -> Column:
    return F.date_format(event_time, "HH")


def minute_part(event_time: Column) -> Column:
    return F.date_format(event_time, "mm")


def processing_day_bucket(tz_offset: str = "+08:00") -> Column:
    """`logday` from the current wall clock at a fixed offset (A7).

    The reference uses processing time at UTC+8 (Kafka2S3Text.scala:56).
    Non-deterministic by design; tests inject a fixed timestamp instead.
    """
    return F.date_format(
        F.from_utc_timestamp(F.current_timestamp(), tz_offset), "yyyyMMdd"
    )


def event_day_bucket(date_str: Column) -> Column:
    """`logday` from an ISO instant string, with the reference's literal
    'error' fallback for empty/missing dates (Kafka2S3Parquet.scala:31-32)."""
    day = F.regexp_replace(F.split(date_str, "T").getItem(0), "-", "")
    return F.when(
        date_str.isNotNull() & (F.length(F.trim(date_str)) > 0), day
    ).otherwise(F.lit("error"))
