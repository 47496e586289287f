"""Property tests for the r7-continuation winnowing and A/B-test operators:
a pure-Python replication of the winnowing selection (including the
rightmost-min tie-break and the coverage guarantee) and of the pooled
two-proportion z statistic."""

from __future__ import annotations

import hashlib
import math
import re

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators.analytics import (
    ABTEST_Z_CRIT_MICRO,
    q_abtest_proportion_ztest,
)
from emr_flink_example_spark.operators.textstats import (
    TOKEN_RE,
    WINNOW_K,
    WINNOW_W,
    _WIN_HASH_MOD,
    q_winnowing_fingerprints,
)

from conftest import SF_DIR


def _phash(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _winnow(tokens: list[str]) -> tuple[int, set[tuple[int, int]]]:
    kgrams = [
        " ".join(tokens[i : i + WINNOW_K])
        for i in range(len(tokens) - WINNOW_K + 1)
    ]
    hs = [_phash(g) % _WIN_HASH_MOD for g in kgrams]
    sel: set[tuple[int, int]] = set()
    for end in range(WINNOW_W - 1, len(hs)):
        window = hs[end - WINNOW_W + 1 : end + 1]
        m = min(window)
        # rightmost occurrence of the min within the window
        off = max(i for i, h in enumerate(window) if h == m)
        pos = end - WINNOW_W + 1 + off + 1  # 1-based
        sel.add((pos, m))
    return len(hs), sel


def test_winnowing_matches_pure_python_and_covers_every_window(spark):
    docs = {
        r.doc_id: r.text
        for r in load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    got = {
        r.doc_id: r for r in q_winnowing_fingerprints(spark, SF_DIR).collect()
    }
    assert got
    checked = 0
    for doc_id, row in sorted(got.items())[:50]:
        tokens = re.findall(TOKEN_RE, docs[doc_id])
        assert len(tokens) >= WINNOW_K + WINNOW_W - 1
        n_kgrams, sel = _winnow(tokens)
        assert row.n_kgrams == n_kgrams
        assert row.n_fingerprints == len(sel)
        hashes = [h for _, h in sel]
        assert row.fp_min == min(hashes)
        x = 0
        for h in hashes:
            x ^= h
        assert row.fp_xor == x
        # the winnowing guarantee: consecutive selected positions are never
        # more than w apart, so any k+w-1-token match shares a fingerprint
        poss = sorted(p for p, _ in sel)
        assert poss[0] <= WINNOW_W
        for a, b in zip(poss, poss[1:]):
            assert b - a <= WINNOW_W
        checked += 1
    assert checked > 0


def test_abtest_z_matches_replication(spark):
    rows = q_abtest_proportion_ztest(spark, SF_DIR).collect()
    assert len(rows) == 1
    r = rows[0]
    events = load(spark, SF_DIR, "events").select("user_id", "event_type").collect()
    conv: dict[int, int] = {}
    for e in events:
        conv[e.user_id] = max(
            conv.get(e.user_id, 0), 1 if e.event_type == "purchase" else 0
        )
    n_a = sum(1 for u in conv if u % 2 == 0)
    n_b = len(conv) - n_a
    ca = sum(v for u, v in conv.items() if u % 2 == 0)
    cb = sum(v for u, v in conv.items() if u % 2 == 1)
    assert (r.n_a, r.conv_a, r.n_b, r.conv_b) == (n_a, ca, n_b, cb)
    if 0 < ca + cb < n_a + n_b:
        p = (ca + cb) / (n_a + n_b)
        z = (ca / n_a - cb / n_b) / math.sqrt(p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b))
        assert r.z_micro == math.floor(z * 1000000.0 + 0.5)
        assert r.significant == (abs(r.z_micro) >= ABTEST_Z_CRIT_MICRO)
    else:
        assert r.z_micro is None and r.significant is False
