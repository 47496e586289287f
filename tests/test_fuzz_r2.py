"""Property tests for the r2 bit-level machinery: Morton interleave
(layout_zorder_files) and the partition committer's timestamp-pattern
parser — pure-Python references checked against the SQL/Catalyst forms.
"""

from __future__ import annotations

import duckdb
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from emr_flink_example_spark.operators.analytics import (
    ZORDER_BITS,
    _interleave_bits_sql,
)
from emr_flink_example_spark.streaming.partition_commit import PartitionCommitter

_SETTINGS = dict(
    max_examples=30,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _z_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


def _deinterleave(z: int, bits: int) -> tuple[int, int]:
    x = y = 0
    for i in range(bits):
        x |= ((z >> (2 * i)) & 1) << i
        y |= ((z >> (2 * i + 1)) & 1) << i
    return x, y


@given(
    x=st.integers(min_value=0, max_value=(1 << ZORDER_BITS) - 1),
    y=st.integers(min_value=0, max_value=(1 << ZORDER_BITS) - 1),
)
@settings(**_SETTINGS)
def test_morton_sql_matches_reference_and_roundtrips(x, y):
    # the generated SQL (run through DuckDB, same arithmetic as Spark's
    # integer shifts) equals the bitwise reference, and z deinterleaves
    # back to (x, y) — i.e. the curve is a bijection
    sql = _interleave_bits_sql(str(x), str(y), ZORDER_BITS)
    z = duckdb.sql(f"SELECT {sql} AS z").fetchone()[0]
    assert z == _z_ref(x, y, ZORDER_BITS)
    assert _deinterleave(z, ZORDER_BITS) == (x, y)


def test_morton_locality_prefix_property():
    """Sharing high z-bits bounds BOTH dimensions: all points in one
    2^(2k)-cell share their top (bits-k) bits per dimension."""
    k = 8
    cell = {}
    for x in range(0, 1 << ZORDER_BITS, 1 << (ZORDER_BITS - 4)):
        for y in range(0, 1 << ZORDER_BITS, 1 << (ZORDER_BITS - 4)):
            z = _z_ref(x, y, ZORDER_BITS)
            cell.setdefault(z >> (2 * k), []).append((x, y))
    for points in cell.values():
        xs = [p[0] >> k for p in points]
        ys = [p[1] >> k for p in points]
        assert len(set(xs)) == 1 and len(set(ys)) == 1


_col_names = st.lists(
    st.text(alphabet="abcdefgh", min_size=1, max_size=6),
    min_size=3,
    max_size=3,
    unique=True,
)


@given(cols=_col_names)
@settings(**_SETTINGS)
def test_committer_pattern_segments_roundtrip(cols):
    """For any column names, the parsed (is_col, text) segments re-render the
    pattern exactly — including names that are prefixes of one another."""
    d, h, m = cols
    committer = PartitionCommitter(
        table="t",
        path="/tmp/x",
        partition_cols=(d, h, m),
        timestamp_pattern=f"${d} ${h}:${m}:00",
    )
    segs = committer._pattern_segments()
    rendered = "".join(f"${t}" if is_col else t for is_col, t in segs)
    assert rendered == committer.timestamp_pattern
    assert [t for is_col, t in segs if is_col] == [d, h, m]
    # value substitution parses back to the expected datetime
    part = {d: "2021-03-31", h: "06", m: "23"}
    assert committer._partition_time(part).isoformat() == "2021-03-31T06:23:00"


# ---------------------------------------------------------------------------
# Gopher rule gate: the DuckDB oracle (the same expressions the Spark gate
# mirrors, proven hash-equal on the fixtures) against an independent pure-
# Python reference over adversarial text — covers shapes the fixture corpus
# never produces (symbols, unicode, digit runs, boundary word counts).

import re

from emr_flink_example_spark.operators.textstats import (
    _GOPHER_ORACLE,
    GOPHER_MAX_MEAN_LEN,
    GOPHER_MAX_SYMBOL_RATIO,
    GOPHER_MAX_WORDS,
    GOPHER_MIN_ALPHA_FRAC,
    GOPHER_MIN_MEAN_LEN,
    GOPHER_MIN_STOP_HITS,
    GOPHER_MIN_WORDS,
    GOPHER_STOPS,
)


def _gopher_ref(text: str) -> tuple[bool, bool, bool, bool, bool]:
    toks = re.findall("[a-zA-Z0-9]+", text)
    n = len(toks)
    mean = sum(len(t) for t in toks) / n
    sym = (text.count("#") + (len(text) - len(text.replace("...", ""))) / 3.0) / n
    alpha = sum(1 for t in toks if re.search("[a-zA-Z]", t)) / n
    stops = len(set(toks) & set(GOPHER_STOPS))
    return (
        GOPHER_MIN_WORDS <= n <= GOPHER_MAX_WORDS,
        GOPHER_MIN_MEAN_LEN <= mean <= GOPHER_MAX_MEAN_LEN,
        sym <= GOPHER_MAX_SYMBOL_RATIO,
        alpha >= GOPHER_MIN_ALPHA_FRAC,
        stops >= GOPHER_MIN_STOP_HITS,
    )


_VOCAB = ["the", "a", "of", "data", "table", "x9", "123", "scan", "##", "...",
          "zzzzzzzzzzzz", "it", "is", "q"]


@given(
    words=st.lists(st.sampled_from(_VOCAB), min_size=1, max_size=80),
    tail=st.text(
        alphabet="ab1 #.é", min_size=0, max_size=40
    ),
)
@settings(**_SETTINGS)
def test_gopher_oracle_matches_python_reference(words, tail):
    text = " ".join(words) + " " + tail
    if not re.findall("[a-zA-Z0-9]+", text):
        return  # 0-token docs carry NULL ratios by contract; not this test
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, ?)", [text])
    row = con.execute(_GOPHER_ORACLE).fetchone()
    # (doc_id, n_words, mean_word_len, n_stop_types, ok_word_count,
    #  ok_mean_word_len, ok_symbol_ratio, ok_alpha_words, ok_stopwords,
    #  passes_gopher)
    got = tuple(row[4:9])
    ref = _gopher_ref(text)
    assert got == ref, f"{text!r}: oracle {got} != reference {ref}"
    assert row[9] == all(ref)
