"""Round-5 edge-case sweep (ADVICE lows): zero-norm embeddings in the
cosine/ANN family, and the capped-Jaccard denominator convention."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from emr_flink_example_spark.operators import dedup as D
from emr_flink_example_spark.operators import similarity as S

DIM = S.DIM


@pytest.fixture(scope="module")
def zero_vec_dir(tmp_path_factory):
    """Embeddings table containing an all-zero vector (vec_id 3 — inside the
    query set AND the centroid set) among normal vectors."""
    d = tmp_path_factory.mktemp("zvec")
    import random

    rng = random.Random(11)
    vecs, labels = [], []
    for i in range(40):
        if i == 3:
            vecs.append([0.0] * DIM)
        else:
            vecs.append([rng.uniform(-1, 1) for _ in range(DIM)])
        labels.append(f"l{i % 4}")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(range(40), type=pa.int64()),
                "label": pa.array(labels),
                "embedding": pa.array(vecs, type=pa.list_(pa.float64())),
            }
        ),
        d / "embeddings.parquet",
    )
    return str(d)


def test_zero_vector_excluded_not_nan(spark, zero_vec_dir):
    """A zero vector has undefined cosine; it must be EXCLUDED — never
    surface as NaN neighbors or a NaN-winning IVF assignment (Spark sorts
    NaN above every number, so one zero vector would otherwise hijack
    rankings)."""
    for q in (
        S.q_knn_bruteforce,
        S.q_ann_lsh_topk,
        S.q_ann_lsh_multiprobe_topk,
        S.q_ann_lsh_multitable_topk,
        S.q_ann_ivf_topk,
    ):
        rows = q(spark, zero_vec_dir).collect()
        assert rows, q.__name__
        for r in rows:
            assert r.query_id != 3 and r.neighbor_id != 3, q.__name__
            assert r.cosine == r.cosine, q.__name__  # not NaN
    surv = D.q_dedup_embedding_cosine(spark, zero_vec_dir).collect()
    assert all(r.dup_vec_id != 3 and r.keep_vec_id != 3 for r in surv)


@pytest.fixture(scope="module")
def hot_shingle_dir(tmp_path_factory):
    """Docs A/B share one HOT shingle (df 7 > cap) and one rare shingle."""
    d = tmp_path_factory.mktemp("hotshingle")
    texts = {
        0: "w1 w2 w3 w4 w6",  # shingles: w1w2w3, w2w3w4, w3w4w6
        1: "w1 w2 w3 w4 w7",  # shingles: w1w2w3, w2w3w4, w3w4w7
    }
    for i in range(2, 7):  # five boilerplate docs make "w1 w2 w3" hot
        texts[i] = "w1 w2 w3"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(sorted(texts), type=pa.int64()),
                "text": pa.array([texts[k] for k in sorted(texts)]),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_capped_jaccard_denominator_uses_full_set_sizes(spark, hot_shingle_dir):
    """Denominator convention under the df cap: |A| and |B| stay the FULL
    (pre-cap) shingle-set sizes while n_common counts rare shingles only —
    so the capped jaccard is a lower bound of the true one, never an
    overestimate from a shrunken denominator."""
    capped = {
        (r.doc_a, r.doc_b): r
        for r in D.q_dedup_jaccard_pairs(spark, hot_shingle_dir, max_shingle_df=5).collect()
    }
    # docs 0/1: 3 shingles each; shared = {w1w2w3 (hot), w2w3w4 (rare)}
    r = capped[(0, 1)]
    assert r.n_common == 1  # hot shingle excluded from the index
    assert r.jaccard == pytest.approx(1 / (3 + 3 - 1))  # full sizes, capped common
    # boilerplate docs share ONLY the hot shingle -> pair never materializes
    assert not any(a >= 2 and b >= 2 for (a, b) in capped)

    uncapped = {
        (r.doc_a, r.doc_b): r
        for r in D.q_dedup_jaccard_pairs(spark, hot_shingle_dir, max_shingle_df=10_000).collect()
    }
    r = uncapped[(0, 1)]
    assert r.n_common == 2
    assert r.jaccard == pytest.approx(2 / (3 + 3 - 2))
    assert capped[(0, 1)].jaccard <= uncapped[(0, 1)].jaccard  # lower bound
