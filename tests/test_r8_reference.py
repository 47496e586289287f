"""Independent value pins for the r8 operators, beyond the DuckDB oracle:
pure-Python reference implementations (the test_kmeans_reference /
test_bpe_reference discipline) so a formula transcribed identically into
BOTH engines cannot hide a shared mistake.
"""

from __future__ import annotations

import math
import re

import pytest

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators.analytics import (
    MARKOV_ITERS,
    _markov_solve,
    q_abtest_mann_whitney,
    q_benford_digit_audit,
)
from emr_flink_example_spark.operators.similarity import (
    BINQ_TOPK,
    q_ann_binary_hamming_topk,
    q_knn_bruteforce,
)
from emr_flink_example_spark.operators.textstats import (
    KN_D_DEN,
    KN_D_NUM,
    KN_TOP_CTX,
    KN_TOP_W,
    TOKEN_RE,
    q_lm_kneser_ney_bigram,
)

from conftest import SF_DIR


# --- Mann-Whitney: pure-Python rank-sum with exact tie handling ------------


def _reference_mann_whitney(pairs: list[tuple[float, int]]):
    """pairs = (value, is_arm_a). Returns (n_a, n_b, u2_a, tie_t, z_micro)."""
    pairs = sorted(pairs)
    n_a = sum(a for _, a in pairs)
    n_b = len(pairs) - n_a
    # doubled rank sum of arm A with average ranks over ties
    r2_a = 0
    tie_t = 0
    i = 0
    while i < len(pairs):
        j = i
        while j < len(pairs) and pairs[j][0] == pairs[i][0]:
            j += 1
        t = j - i
        tie_t += t * t * t - t
        # ranks i+1 .. j occupied; doubled average rank = 2i + t + 1
        ta = sum(a for _, a in pairs[i:j])
        r2_a += ta * (2 * i + t + 1)
        i = j
    u2_a = r2_a - n_a * (n_a + 1)
    n = n_a + n_b
    var4 = (n_a * n_b / 3.0) * ((n + 1.0) - tie_t / (n * (n - 1.0)))
    z = (u2_a - n_a * n_b) / math.sqrt(var4)
    return n_a, n_b, u2_a, tie_t, int(math.floor(z * 1e6 + 0.5))


def test_mann_whitney_matches_pure_python(spark):
    events = load(spark, SF_DIR, "events")
    rows = (
        events.where(events.event_type == "purchase")
        .select("value", (events.user_id % 2 == 0).cast("int").alias("a"))
        .collect()
    )
    ref = _reference_mann_whitney([(r["value"], r["a"]) for r in rows])
    got = q_abtest_mann_whitney(spark, SF_DIR).collect()[0]
    assert (got["n_a"], got["n_b"], got["u2_a"], got["tie_t"], got["z_micro"]) == ref


def test_mann_whitney_tie_heavy_synthetic(spark, tmp_path):
    """A fixture where EVERY value ties (3 distinct values across 12
    purchases) exercises the tie-corrected variance path end-to-end."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta

    d = tmp_path / "sf_ties"
    d.mkdir()
    base = datetime(2024, 1, 1)
    vals = [10.0, 10.0, 20.0, 20.0, 30.0, 30.0] * 2
    tbl = pa.table(
        {
            "event_id": pa.array(range(12), pa.int64()),
            "ts": pa.array([base + timedelta(hours=i) for i in range(12)]),
            "user_id": pa.array([i % 4 for i in range(12)], pa.int64()),
            "event_type": pa.array(["purchase"] * 12),
            "value": pa.array(vals, pa.float64()),
            "props": pa.array(["{}"] * 12),
        }
    )
    pq.write_table(tbl, d / "events.parquet")
    got = q_abtest_mann_whitney(spark, str(d)).collect()[0]
    ref = _reference_mann_whitney(
        [(vals[i], 1 if (i % 4) % 2 == 0 else 0) for i in range(12)]
    )
    assert (got["n_a"], got["n_b"], got["u2_a"], got["tie_t"], got["z_micro"]) == ref
    assert got["tie_t"] == 3 * (4**3 - 4)  # three 4-way ties


# --- Kneser-Ney: pure-Python model on the same corpus -----------------------


def test_kneser_ney_matches_pure_python(spark):
    docs = load(spark, SF_DIR, "documents").select("text").collect()
    pair_cnt: dict[tuple[str, str], int] = {}
    for r in docs:
        toks = re.findall(TOKEN_RE, r["text"] or "")
        for a, b in zip(toks, toks[1:]):
            pair_cnt[(a, b)] = pair_cnt.get((a, b), 0) + 1
    nd = len(pair_cnt)
    c_ctx: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1b: dict[str, int] = {}
    for (a, b), c in pair_cnt.items():
        c_ctx[a] = c_ctx.get(a, 0) + c
        n1f[a] = n1f.get(a, 0) + 1
        n1b[b] = n1b.get(b, 0) + 1
    top_ctx = sorted(c_ctx, key=lambda w: (-c_ctx[w], w))[:KN_TOP_CTX]
    expected = {}
    for w1 in top_ctx:
        scored = []
        for (a, w2), c in pair_cnt.items():
            if a != w1:
                continue
            num = (KN_D_DEN * c - KN_D_NUM) * nd + KN_D_NUM * n1f[w1] * n1b[w2]
            den = KN_D_DEN * c_ctx[w1] * nd
            scored.append((w2, (2_000_000 * num + den) // (2 * den), c))
        scored.sort(key=lambda x: (-x[1], x[0]))
        for rank, (w2, micro, c) in enumerate(scored[:KN_TOP_W], 1):
            expected[(w1, w2)] = (rank, c, c_ctx[w1], micro)
    got = {
        (r["w1"], r["w2"]): (r["kn_rank"], r["c_pair"], r["c_ctx"], r["kn_micro"])
        for r in q_lm_kneser_ney_bigram(spark, SF_DIR).collect()
    }
    assert got == expected


# --- Binary Hamming: recall floor vs exact kNN ------------------------------


def test_binary_hamming_recall_floor(spark):
    """The 1-bit shortlist must keep most of the exact top-3: at 64 dims the
    sign-bit Johnson-Lindenstrauss argument gives high overlap, and the
    measured recall@3 on this fixture is pinned with headroom below."""
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in q_knn_bruteforce(spark, SF_DIR).collect()
        if r["nn_rank"] <= BINQ_TOPK
    }
    binq = {
        (r["query_id"], r["neighbor_id"])
        for r in q_ann_binary_hamming_topk(spark, SF_DIR).collect()
    }
    recall = len(exact & binq) / len(exact)
    assert recall >= 0.5, f"binary recall@{BINQ_TOPK} collapsed: {recall:.2f}"


# --- Markov attribution: closed-form chains ---------------------------------


def test_markov_solve_deterministic_chain():
    """START -> A -> CONV with no branching absorbs with certainty; removing
    A severs the only path."""
    counts = {("START", "A"): 5, ("A", "CONV"): 5}
    out = _markov_solve(counts, ["A"])
    assert out["base"] == 1_000_000
    assert out["A"] == 0


def test_markov_solve_split_path():
    """START splits 50/50 to A (always converts) and B (never converts):
    base absorption 1/2; removing A zeroes it; removing B leaves the A
    half intact."""
    counts = {
        ("START", "A"): 2,
        ("START", "B"): 2,
        ("A", "CONV"): 2,
        ("B", "END"): 2,
    }
    out = _markov_solve(counts, ["A", "B"])
    assert out["base"] == 500_000
    assert out["A"] == 0
    assert out["B"] == 500_000


def test_markov_solve_loop_converges():
    """A self-reinforcing loop (A -> A 50%, A -> CONV 50%) absorbs with
    certainty in the limit; the MARKOV_ITERS-th floored iterate must be
    within 2^-(ITERS-1) of it plus one micro of floor loss per round."""
    counts = {("START", "A"): 1, ("A", "A"): 1, ("A", "CONV"): 1}
    out = _markov_solve(counts, ["A"])
    bound = 1_000_000 // (2 ** (MARKOV_ITERS - 1)) + MARKOV_ITERS
    assert 1_000_000 - out["base"] <= bound


# --- Benford: expectation table sanity --------------------------------------


def test_benford_rows_and_expectation(spark):
    rows = {r["digit"]: r for r in q_benford_digit_audit(spark, SF_DIR).collect()}
    assert sorted(rows) == list(range(1, 10))
    assert rows[1]["benford_micro"] == 301030  # log10(2)
    assert sum(r["benford_micro"] for r in rows.values()) in (999999, 1000000, 1000001)
    n_total = sum(r["n_obs"] for r in rows.values())
    assert n_total > 0
    for r in rows.values():
        assert r["abs_dev_micro"] is not None and r["abs_dev_micro"] >= 0


if __name__ == "__main__":
    pytest.main([__file__, "-q"])


# --- pHash pairs: positive path with synthesized duplicates -----------------


def test_phash_pairs_find_duplicate_images(spark, tmp_path):
    """The fixture corpus has no identical texts (0 candidate pairs is the
    true answer there — the exhaustive oracle agrees), so the positive
    path is proven here: duplicated texts produce identical pixel
    stand-ins, identical pHashes, and therefore hamming-0 pairs; a
    1-bit-flipped hash stays inside the ball via a different band."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from emr_flink_example_spark.operators.multimodal import (
        q_multimodal_phash_pairs,
    )

    d = tmp_path / "sf_dups"
    d.mkdir()
    texts = ["the quick brown fox jumps over the lazy dog " * 3] * 2 + [
        "completely different content block number %d with words" % i
        for i in range(8)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(range(10), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * 10),
            "source": pa.array(["synth"] * 10),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, d / "documents.parquet")
    pairs = q_multimodal_phash_pairs(spark, str(d)).collect()
    assert {(p["doc_a"], p["doc_b"], p["hamming"]) for p in pairs} == {(0, 1, 0)}
