"""Property-based JSON-parse robustness (SURVEY.md §5 item 4).

The reference tolerates malformed input ('json.fail-on-missing-field'=false,
'json.ignore-parse-errors'=true — Kafka2S3Hive.scala:77-78). Our equivalent
is PERMISSIVE from_json + the any-field-present filter in
sources/streams.py. Property: NO input line may ever raise; malformed lines
are dropped; partially-valid objects keep their parsed fields.
"""

from __future__ import annotations

import json

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from emr_flink_example_spark.sources.streams import AD_EVENT_SCHEMA

#: arbitrary text (may or may not be JSON), plus JSON objects with arbitrary
#: subsets of the schema fields, wrong types, and extra fields
_field_values = st.one_of(
    st.none(),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.text(max_size=20),
    st.floats(allow_nan=False, allow_infinity=False),
    st.booleans(),
)
_objects = st.dictionaries(
    st.sampled_from(["uuid", "date", "timestamp", "ad_type", "ad_type_name", "extra", "k"]),
    _field_values,
    max_size=7,
).map(json.dumps)
_lines = st.lists(st.one_of(st.text(max_size=40), _objects), min_size=1, max_size=20)


def _parse(spark, lines):
    df = spark.createDataFrame([(s,) for s in lines], "value string")
    parsed = df.select(F.from_json("value", AD_EVENT_SCHEMA).alias("j"))
    any_field = F.coalesce(
        *[F.col(f"j.{f.name}").cast("string") for f in AD_EVENT_SCHEMA.fields]
    )
    return parsed.where(any_field.isNotNull()).select("j.*").collect()


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(lines=_lines)
def test_never_throws_and_drops_garbage(spark, lines):
    rows = _parse(spark, lines)
    # never more output rows than input lines; every surviving row has >=1
    # non-null parsed field
    assert len(rows) <= len(lines)
    for r in rows:
        assert any(v is not None for v in r.asDict().values())


def test_partial_objects_keep_parsed_fields(spark):
    lines = [
        json.dumps({"uuid": "u1"}),  # missing everything else -> kept, NULLs
        json.dumps({"uuid": "u2", "ad_type": "not-an-int"}),  # bad field type
        "{broken json",  # dropped
        "",  # dropped
        json.dumps({"unrelated": 1}),  # all schema fields missing -> dropped
    ]
    rows = _parse(spark, lines)
    by_uuid = {r.uuid: r for r in rows}
    assert set(by_uuid) == {"u1", "u2"}
    assert by_uuid["u1"].timestamp is None
    # PERMISSIVE: a type-mismatched field nulls out, siblings survive
    assert by_uuid["u2"].ad_type is None
