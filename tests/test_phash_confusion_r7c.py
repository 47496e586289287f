"""Property tests for the r7-continuation pHash and language-confusion
operators: a pure-Python integer-DCT replication of the perceptual hash,
and full-accounting checks on the confusion matrix."""

from __future__ import annotations

import hashlib
import math

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators.multimodal import (
    _dct_basis,
    q_multimodal_phash,
)
from emr_flink_example_spark.operators.textstats import (
    q_lang_id_heuristic,
    q_quality_language_confusion,
)

from conftest import SF_DIR


def _phash_py(text: str) -> tuple[int, int]:
    hx = (
        hashlib.md5((text + ":px0").encode()).hexdigest()
        + hashlib.md5((text + ":px1").encode()).hexdigest()
    )
    p = [[int(hx[r * 8 + c], 16) for c in range(8)] for r in range(8)]
    k = {}
    for u, x, v in _dct_basis():
        k[(u, x)] = v
    g = [
        [sum(p[r][c] * k[(v, c)] for c in range(8)) for v in range(8)]
        for r in range(8)
    ]
    f = {
        (u, v): sum(k[(u, r)] * g[r][v] for r in range(8))
        for u in range(8)
        for v in range(8)
        if (u, v) != (0, 0)
    }
    ranked = sorted(f.items(), key=lambda kv: (kv[1], kv[0][0], kv[0][1]))
    m = ranked[31][1]  # rank 32 of 63, the lower median
    phash = 0
    ones = 0
    for (u, v), val in f.items():
        if val > m:
            phash += 1 << (u * 8 + v - 1)
            ones += 1
    return phash, ones


def test_phash_matches_pure_python_integer_dct(spark):
    docs = {
        r.doc_id: r.text
        for r in load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    }
    got = {r.doc_id: r for r in q_multimodal_phash(spark, SF_DIR).collect()}
    assert set(got) == set(docs)
    for doc_id in sorted(docs)[:40]:
        ph, ones = _phash_py(docs[doc_id])
        assert got[doc_id].phash == ph, doc_id
        assert got[doc_id].n_ones == ones
        # median split: strictly-above count is near half of 63
        assert 0 < ones < 63


def test_confusion_matrix_accounts_for_every_doc(spark):
    preds = q_lang_id_heuristic(spark, SF_DIR).collect()
    cells = {}
    for r in preds:
        key = (r.labeled_lang, r.predicted_lang)
        cells[key] = cells.get(key, 0) + 1
    got = q_quality_language_confusion(spark, SF_DIR).collect()
    assert {(r.labeled_lang, r.predicted_lang): r.n_docs for r in got} == cells
    totals = {}
    for (lab, _), n in cells.items():
        totals[lab] = totals.get(lab, 0) + n
    for r in got:
        assert r.n_labeled_total == totals[r.labeled_lang]
        if r.labeled_lang == r.predicted_lang:
            assert r.recall_micro == math.floor(
                r.n_docs / r.n_labeled_total * 1e6 + 0.5
            )
        else:
            assert r.recall_micro is None
    assert sum(r.n_docs for r in got) == len(preds)
