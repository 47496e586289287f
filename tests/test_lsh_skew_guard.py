"""Skew guard for LSH in-bucket pair expansion (VERDICT r4 #5).

An adversarial corpus (many identical/boilerplate docs) lands everything in
one (band, bucket) — pre-guard, its O(B^2) expansion ran inside ONE task.
The guard chunks oversized buckets into cap-sized slices and expands
chunk-pairs as separate, repartitioned rows. The emitted pair SET must be
identical to the unguarded expansion for every input.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from emr_flink_example_spark.operators import dedup as D

from conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture(scope="module")
def identical_docs_dir(tmp_path_factory):
    """60 byte-identical documents — every one a near-dup of every other."""
    d = tmp_path_factory.mktemp("skew")
    text = "the same boilerplate sentence repeated across the whole corpus again"
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(60), type=pa.int64()),
                "text": pa.array([text] * 60),
            }
        ),
        d / "documents.parquet",
    )
    return str(d)


def test_identical_docs_all_pairs_through_chunked_path(spark, identical_docs_dir):
    # cap=8 << 60 members/bucket: the whole expansion runs the chunked path.
    out = D.q_dedup_minhash_lsh(spark, identical_docs_dir, cap=8).collect()
    expect_n = 60 * 59 // 2
    assert len(out) == expect_n
    assert all(r.est_jaccard == 1.0 for r in out)
    assert all(r.doc_a < r.doc_b for r in out)
    assert {(r.doc_a, r.doc_b) for r in out} == {
        (a, b) for a in range(60) for b in range(a + 1, 60)
    }


def test_capped_minhash_bit_identical_on_fixture(spark):
    # A cap small enough that fixture buckets exceed it: chunked and
    # unguarded paths must emit the same pairs and the same est_jaccard.
    base = _rows(D.q_dedup_minhash_lsh(spark, SF_DIR))
    capped = _rows(D.q_dedup_minhash_lsh(spark, SF_DIR, cap=4))
    assert capped == base


def test_capped_cosine_bit_identical_on_fixture(spark):
    base = _rows(D.q_dedup_embedding_cosine(spark, SF_DIR))
    capped = _rows(D.q_dedup_embedding_cosine(spark, SF_DIR, cap=8))
    assert capped == base


def test_capped_simhash_banded_bit_identical_on_fixture(spark):
    """Banded-Hamming path (VERDICT r8 #1): a SimHash band has at most 2^bits
    values, so hot buckets are the EXPECTED case — the pair expansion must go
    through the same chunked guard, emitting the identical pair set."""
    base = _rows(D.q_simhash_hamming_pairs(spark, SF_DIR))
    assert base  # fixture has near-dup fingerprints; guard path is exercised
    capped = _rows(D.q_simhash_hamming_pairs(spark, SF_DIR, cap=4))
    assert capped == base


def test_capped_phash_banded_bit_identical_on_fixture(spark):
    from emr_flink_example_spark.operators import multimodal as M

    base = _rows(M.q_multimodal_phash_pairs(spark, SF_DIR))
    capped = _rows(M.q_multimodal_phash_pairs(spark, SF_DIR, cap=4))
    assert capped == base


def test_chunk_rows_bounded(spark, identical_docs_dir):
    """Pin of the bound, over the PRODUCTION chunking expression: no
    expansion input row carries more than 2*cap members — the quantity that
    controls single-task work."""
    from pyspark.sql import functions as F

    sigs = D.minhash_signatures_for(
        spark.read.parquet(f"{identical_docs_dir}/documents.parquet")
    )
    grouped = (
        D._band_buckets(sigs)
        .groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(F.struct("doc_id", "sig"))).alias("members"))
        .where(F.size("members") > 1)
    )
    cap = 8
    chunk_rows = grouped.select(
        F.explode(F.expr(D._chunk_pairs_sql(cap))).alias("ch")
    ).select((F.size("ch.ma") + F.size("ch.mb")).alias("carried"))
    assert chunk_rows.agg(F.max("carried")).first()[0] <= 2 * cap


def test_single_scan_preserved_with_guard(spark):
    """The guard must not duplicate the upstream scan/signature chain: the
    static plan keeps exactly ONE parquet scan of the corpus."""
    df = D.q_dedup_minhash_lsh(spark, SF_DIR)
    plan = df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert plan.count("Scan parquet") == 1


def test_fuzz_random_corpora_capped_equals_uncapped(spark, tmp_path):
    """Three seeded random corpora with heavy duplication, each at several
    caps (including cap=1, maximal chunking): the emitted pair set and
    est_jaccard values must equal the effectively-unguarded run exactly."""
    import random

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    for seed in (1, 2, 3):
        rng = random.Random(seed)
        base_docs = [
            " ".join(rng.choices(vocab, k=rng.randint(4, 12))) for _ in range(12)
        ]
        # heavy duplication: each doc is a near-copy of a base doc
        texts = [
            rng.choice(base_docs) + (" tail" if rng.random() < 0.3 else "")
            for _ in range(80)
        ]
        d = tmp_path / f"fuzz{seed}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            d / "documents.parquet",
        )
        base = _rows(D.q_dedup_minhash_lsh(spark, str(d), cap=10_000))
        assert base, seed  # duplication guarantees candidate pairs
        for cap in (1, 3, 7):
            assert _rows(D.q_dedup_minhash_lsh(spark, str(d), cap=cap)) == base, (
                seed,
                cap,
            )


def test_capped_incremental_bipartite_bit_identical_on_fixture(spark):
    """r9: the incremental probe's news x olds expansion routes through
    the bipartite chunk guard — capped and uncapped runs must emit the
    identical per-doc dup report."""
    base = _rows(D.q_dedup_incremental_minhash(spark, SF_DIR))
    assert base  # the fixture's near-dups straddle the 80/20 split
    capped = _rows(D.q_dedup_incremental_minhash(spark, SF_DIR, cap=3))
    assert capped == base


def test_incremental_identical_docs_all_cross_pairs(spark, identical_docs_dir):
    """60 identical docs in ONE bucket, cap=8: every incoming doc must be
    flagged against the existing side through the chunked path (the
    adversarial boilerplate corpus that previously expanded in one task)."""
    out = D.q_dedup_incremental_minhash(spark, identical_docs_dir, cap=8).collect()
    import hashlib

    def is_new(doc_id: int) -> bool:
        h = int(hashlib.md5(f"{D.INCR_SALT}{doc_id}".encode()).hexdigest()[:15], 16)
        return h % 100 >= D.INCR_EXISTING_PCT

    news = {i for i in range(60) if is_new(i)}
    olds = {i for i in range(60)} - news
    assert news and olds
    got = {r.doc_id: r for r in out}
    assert set(got) == news
    for i in news:
        assert got[i].n_existing_dups == len(olds)
        assert got[i].dup_of == min(olds)
        assert got[i].best_est == 1.0


def test_cross_chunk_rows_bounded(spark, identical_docs_dir):
    """Pin of the bipartite bound over the PRODUCTION chunking expression:
    no expansion input row carries more than 2*cap members."""
    import hashlib

    from pyspark.sql import functions as F

    from emr_flink_example_spark.functions.hashing import portable_hash

    sigs = D.minhash_signatures_for(
        spark.read.parquet(f"{identical_docs_dir}/documents.parquet")
    )
    is_new = (
        portable_hash(F.concat(F.lit(D.INCR_SALT), F.col("doc_id").cast("string")))
        % 100
        >= D.INCR_EXISTING_PCT
    )
    grouped = (
        D._band_buckets(sigs)
        .withColumn("is_new", is_new)
        .groupBy("band", "bucket")
        .agg(
            F.sort_array(
                F.collect_list(F.when(F.col("is_new"), F.struct("doc_id", "sig")))
            ).alias("news"),
            F.sort_array(
                F.collect_list(F.when(~F.col("is_new"), F.struct("doc_id", "sig")))
            ).alias("olds"),
        )
        .where((F.size("news") > 0) & (F.size("olds") > 0))
    )
    cap = 8
    chunk_rows = grouped.select(
        F.explode(F.expr(D._chunk_cross_sql(cap, "news", "olds"))).alias("ch")
    ).select((F.size("ch.ma") + F.size("ch.mb")).alias("carried"))
    assert chunk_rows.agg(F.max("carried")).first()[0] <= 2 * cap


def test_fuzz_random_corpora_incremental_capped_equals_uncapped(spark, tmp_path):
    """Bipartite-guard twin of the minhash fuzz: three seeded random
    corpora with heavy duplication, each at several caps (including
    cap=1, maximal chunking) — the incremental dup report must equal the
    effectively-unguarded run exactly."""
    import random

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]
    for seed in (4, 5, 6):
        rng = random.Random(seed)
        base_docs = [
            " ".join(rng.choices(vocab, k=rng.randint(4, 12))) for _ in range(12)
        ]
        texts = [
            rng.choice(base_docs) + (" tail" if rng.random() < 0.3 else "")
            for _ in range(80)
        ]
        d = tmp_path / f"incr{seed}"
        d.mkdir()
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": pa.array(texts),
                }
            ),
            d / "documents.parquet",
        )
        base = _rows(D.q_dedup_incremental_minhash(spark, str(d), cap=10_000))
        assert base, seed  # duplication straddles the 80/20 split
        for cap in (1, 3, 7):
            got = _rows(D.q_dedup_incremental_minhash(spark, str(d), cap=cap))
            assert got == base, (seed, cap)
