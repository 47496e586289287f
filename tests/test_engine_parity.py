"""Property-based Spark<->DuckDB parity fuzzing (SURVEY.md §5).

Every oracle differential in the catalog rests on a handful of cross-engine
primitives behaving bit-identically: the ASCII tokenizer regex (Java regex
vs RE2), the md5-based portable hash, levenshtein, and double rounding of
exact integer ratios. These tests drive each primitive with generated
inputs through BOTH engines and require exact agreement — catching any
environment/version drift in the foundations before it surfaces as a
mysterious hash mismatch in some downstream query.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from emr_flink_example_spark.functions.hashing import (
    portable_hash,
    portable_hash_sql_duckdb,
)
from emr_flink_example_spark.operators.textstats import TOKEN_RE

_SETTINGS = dict(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

#: printable-ish text including unicode, quotes excluded to keep SQL literals
#: trivial (parity is about the engines, not about escaping)
_texts = st.lists(
    st.text(
        alphabet=st.characters(blacklist_characters="'\\", blacklist_categories=("Cs",)),
        max_size=60,
    ),
    min_size=1,
    max_size=10,
)


def _duck():
    return duckdb.connect()


@given(texts=_texts)
@settings(**_SETTINGS)
def test_tokenizer_parity(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r.toks
        for r in df.select(
            F.expr(f"regexp_extract_all(text, '{TOKEN_RE}', 0)").alias("toks")
        ).collect()
    ]
    con = _duck()
    want = [
        con.execute(
            f"SELECT regexp_extract_all(?, '{TOKEN_RE}')", [t]
        ).fetchone()[0]
        for t in texts
    ]
    assert got == want


@given(texts=_texts)
@settings(**_SETTINGS)
def test_portable_hash_parity(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = [r.h for r in df.select(portable_hash(F.col("s")).alias("h")).collect()]
    con = _duck()
    want = [
        con.execute(f"SELECT {portable_hash_sql_duckdb('?')}", [t]).fetchone()[0]
        for t in texts
    ]
    assert got == want


@given(
    pairs=st.lists(
        st.tuples(
            st.text(alphabet="abcdefgh xyz", max_size=30),
            st.text(alphabet="abcdefgh xyz", max_size=30),
        ),
        min_size=1,
        max_size=10,
    )
)
@settings(**_SETTINGS)
def test_levenshtein_parity(spark, pairs):
    df = spark.createDataFrame(pairs, "a string, b string")
    got = [r.d for r in df.select(F.levenshtein("a", "b").alias("d")).collect()]
    con = _duck()
    want = [
        con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0] for a, b in pairs
    ]
    assert got == want


@given(
    ratios=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=10_000),
            st.integers(min_value=1, max_value=10_000),
        ),
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_int_ratio_round_parity(spark, ratios):
    """round(int/int, 6) — the threshold arithmetic every jaccard/containment
    comparison uses — must agree exactly."""
    df = spark.createDataFrame(ratios, "n bigint, d bigint")
    got = [
        r.v for r in df.select(F.round(F.col("n") / F.col("d"), 6).alias("v")).collect()
    ]
    con = _duck()
    want = [
        con.execute("SELECT round(?::BIGINT / ?::BIGINT, 6)", [n, d]).fetchone()[0]
        for n, d in ratios
    ]
    assert got == want


@given(
    epochs=st.lists(
        st.integers(min_value=0, max_value=4_102_444_800),  # 1970..2100
        min_size=1,
        max_size=20,
    )
)
@settings(**_SETTINGS)
def test_time_partition_format_parity(spark, epochs):
    """logday/h/m partition projections (the A6 DATE_FORMAT surface) must
    format identically to DuckDB's strftime for any second-precision
    timestamp — the flagship query's partition columns depend on it."""
    from emr_flink_example_spark.functions.timeutils import (
        event_time_from_millis,
        hour_part,
        logday,
        minute_part,
    )

    df = spark.createDataFrame([(e * 1000,) for e in epochs], "ms bigint")
    t = event_time_from_millis(F.col("ms"))
    got = [
        (r.d, r.h, r.m)
        for r in df.select(
            logday(t).alias("d"), hour_part(t).alias("h"), minute_part(t).alias("m")
        ).collect()
    ]
    con = _duck()
    want = [
        tuple(
            con.execute(
                "SELECT strftime(to_timestamp(?), '%Y-%m-%d'),"
                "       strftime(to_timestamp(?), '%H'),"
                "       strftime(to_timestamp(?), '%M')",
                [e, e, e],
            ).fetchone()
        )
        for e in epochs
    ]
    assert got == want


@given(texts=_texts)
@settings(**_SETTINGS)
def test_shingle_construction_parity(spark, texts):
    """Word-3-gram shingle sets (the dedup family's foundation) must build
    identically in both engines, including the 0/1/2-token edge cases and
    duplicate-shingle dedup."""
    from emr_flink_example_spark.operators.dedup import SHINGLES, SHINGLES_DUCK

    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = [
        r.s
        for r in df.selectExpr(
            f"regexp_extract_all(text, '[a-zA-Z0-9]+', 0) AS tokens"
        )
        .selectExpr(f"{SHINGLES} AS s")
        .collect()
    ]
    con = _duck()
    want = [
        con.execute(
            "WITH tok AS (SELECT regexp_extract_all(?, '[a-zA-Z0-9]+') AS tokens) "
            f"SELECT coalesce({SHINGLES_DUCK.strip()}, []) FROM tok",
            [t],
        ).fetchone()[0]
        for t in texts
    ]
    assert [sorted(g) for g in got] == [sorted(w) for w in want]
