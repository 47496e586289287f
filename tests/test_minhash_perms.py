"""Full-range MinHash permutation fix (r13).

The original coefficients (a, b < 2^31) made every permutation
(a*h31 + b) mod (2^61-1) piecewise-monotone in h31 (at most ONE modulus
wrap), so all 16 argmins collapsed onto the global argmin(h31): two
near-disjoint documents sharing a single small-hash shingle scored
est_jaccard ~1.0 against a true Jaccard of 0.02 (observed on the sf0.001
fixture, pair (180, 310): 16/16 signature agreement, true J 0.0185).

These tests pin the three layers of the fix: the split-modmul identity
(int64-safe full-range multiply), cross-perm argmin independence, and
end-to-end estimator calibration on the fixture corpus."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from emr_flink_example_spark.functions.hashing import (
    MERSENNE_61,
    minhash_perm,
    minhash_perm_sql_duckdb,
)
from emr_flink_example_spark.operators.dedup import (
    N_PERMS,
    PERMS,
    minhash_signatures_for,
)

SF_DIR = "/root/testdata/sf0.001"


def _py_perm(x: int, a: int, b: int) -> int:
    return (a * x + b) % MERSENNE_61


def test_split_modmul_identity_spark(spark):
    rng = random.Random(99)
    cases = [
        (rng.randrange(0, (1 << 31) - 1), rng.randrange(1, MERSENNE_61),
         rng.randrange(0, MERSENNE_61))
        for _ in range(200)
    ]
    # edge cases: x = 0, x = max, a tiny/huge
    cases += [
        (0, 1, 0),
        ((1 << 31) - 2, MERSENNE_61 - 1, MERSENNE_61 - 1),
        ((1 << 31) - 2, 1, 0),
    ]
    df = spark.createDataFrame([(x,) for x, _, _ in cases], "x bigint")
    for i, (x, a, b) in enumerate(cases[:8]):
        got = (
            spark.createDataFrame([(x,)], "x bigint")
            .select(minhash_perm(F.col("x"), a, b).alias("p"))
            .collect()[0].p
        )
        assert got == _py_perm(x, a, b), (x, a, b)
    # and the declared PERMS coefficients themselves
    xs = [x for x, _, _ in cases]
    df = spark.createDataFrame([(x,) for x in xs], "x bigint")
    got = df.select(
        "x", *[minhash_perm(F.col("x"), a, b).alias(f"p{i}")
               for i, (a, b) in enumerate(PERMS)]
    ).collect()
    for r in got:
        for i, (a, b) in enumerate(PERMS):
            assert r[f"p{i}"] == _py_perm(r.x, a, b)


def test_split_modmul_identity_duckdb():
    import duckdb

    rng = random.Random(7)
    con = duckdb.connect()
    for _ in range(50):
        x = rng.randrange(0, (1 << 31) - 1)
        a = rng.randrange(1, MERSENNE_61)
        b = rng.randrange(0, MERSENNE_61)
        got = con.execute(
            f"SELECT {minhash_perm_sql_duckdb(str(x), a, b)}"
        ).fetchone()[0]
        assert got == _py_perm(x, a, b), (x, a, b)


def test_perms_are_full_range():
    # at least one wrap-heavy coefficient per perm: a >= 2^31 for most
    assert all(1 <= a < MERSENNE_61 for a, _ in PERMS)
    assert sum(a >= (1 << 31) for a, _ in PERMS) >= N_PERMS - 1


def test_disjoint_docs_with_shared_rare_shingle_score_low(spark):
    """The degeneracy scenario: two documents with near-disjoint token
    streams sharing ONE trigram must NOT produce a high est_jaccard."""
    shared = "zzz shared anchor"
    a_words = " ".join(f"alpha{i}" for i in range(40))
    b_words = " ".join(f"beta{i}" for i in range(40))
    docs = spark.createDataFrame(
        [(1, f"{a_words} {shared}"), (2, f"{b_words} {shared}")],
        "doc_id bigint, text string",
    )
    sigs = {r.doc_id: list(r.sig) for r in minhash_signatures_for(docs).collect()}
    agree = sum(x == y for x, y in zip(sigs[1], sigs[2]))
    # true J ~ 3/83; with independent perms, E[agree] ~ 0.6 of 16.
    # The broken family scored 13-16 here.
    assert agree <= 4, f"perm argmins still correlated: {agree}/16 agree"


def test_fixture_calibration_no_false_positives(spark):
    """On the fixture corpus, no candidate pair may combine
    est_jaccard >= 0.5 with exact Jaccard < 0.3 (the broken family
    produced est 1.0 at exact 0.018)."""
    from emr_flink_example_spark.plans.catalog import all_queries

    rows = all_queries(False)["minhash_calibration"](spark, SF_DIR).collect()
    assert rows, "calibration query should produce candidate pairs"
    bad = [r for r in rows if r.est_jaccard >= 0.5 and r.exact_jaccard < 0.3]
    assert not bad, f"false-positive candidates: {bad[:5]}"
    mean_err = sum(r.abs_err for r in rows) / len(rows)
    assert mean_err < 0.1, f"estimator miscalibrated: mean |err| {mean_err}"
