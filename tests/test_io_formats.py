"""Format-generic batch IO: csv/json/orc/text round-trips preserve rows (and
schema where the format carries one), compression options flow through."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from emr_flink_example_spark.io import FORMATS, load, read_any, write_any

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fmt", ["parquet", "orc"])
def test_typed_format_roundtrip(spark, tmp_path, fmt):
    """Self-describing formats: schema and values come back exactly."""
    src = load(spark, SF_DIR, "nation")
    out = str(tmp_path / fmt)
    write_any(src, out, fmt)
    back = read_any(spark, out, fmt)
    assert back.schema == src.schema
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_csv_roundtrip_with_explicit_schema(spark, tmp_path):
    """CSV cannot distinguish null from '' by default — both serialize to an
    empty field. A distinct nullValue sentinel on writer AND reader makes the
    round-trip lossless; this is the knob, pinned as a test."""
    src = load(spark, SF_DIR, "region").select(
        "r_regionkey",
        "r_name",
        F.when(F.col("r_regionkey") % 2 == 0, F.col("r_name")).alias("maybe_null"),
        F.when(F.col("r_regionkey") < 0, F.lit("x")).otherwise("").alias("empty_str"),
    )
    out = str(tmp_path / "csv")
    write_any(src, out, "csv", header="true", compression="gzip", nullValue="\\N")
    back = read_any(
        spark,
        out,
        "csv",
        schema="r_regionkey INT, r_name STRING, maybe_null STRING, empty_str STRING",
        header="true",
        nullValue="\\N",
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_json_roundtrip_with_explicit_schema(spark, tmp_path):
    src = load(spark, SF_DIR, "supplier").select("s_suppkey", "s_name", "s_acctbal")
    out = str(tmp_path / "json")
    write_any(src, out, "json")
    back = read_any(
        spark, out, "json", schema="s_suppkey BIGINT, s_name STRING, s_acctbal DOUBLE"
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_text_single_column_contract(spark, tmp_path):
    lines = load(spark, SF_DIR, "region").select(F.col("r_name").alias("value"))
    out = str(tmp_path / "text")
    write_any(lines, out, "text")
    back = read_any(spark, out, "text")
    assert back.columns == ["value"]
    assert sorted(r.value for r in back.collect()) == sorted(r.value for r in lines.collect())


def test_unknown_format_rejected(spark, tmp_path):
    with pytest.raises(ValueError):
        read_any(spark, str(tmp_path), "avro")
