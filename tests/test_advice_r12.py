"""Regression pins for the five r12 ADVICE findings:

1. `check_foreign_key` on a SELF-referential FK (df IS ref) must resolve
   unambiguously (dataquality.py — both sides now aliased).
2. `profile_columns` must survive bigint values near the int64 edge
   under ANSI mode (try_multiply NULLs the milli instead of throwing).
3. `psi_drift` bins clamp both ways and exclude NULLs — the n_bins
   contract holds on dirty input (sampling.py).
4. Retrieval metrics dedupe caller results per (query, doc) keeping the
   best rank — precision_micro can never exceed 1_000_000
   (textstats._std_results).
5. `fs_for_path` + LocalFS handle the `local://` URI alias end to end
   (fsio.py).
"""

from __future__ import annotations

import pytest

from emr_flink_example_spark import api
from emr_flink_example_spark.streaming.fsio import LocalFS, fs_for_path


# -- 1. self-referential foreign key ----------------------------------------


def test_check_foreign_key_self_referential(spark):
    emp = spark.createDataFrame(
        [(1, None), (2, 1), (3, 1), (4, 99)],
        "id bigint, manager_id bigint",
    )
    row = api.check_foreign_key(emp, "manager_id", emp, "id").collect()[0]
    assert row.n_checked == 4
    # NULL manager (documented: NULLs count) + the dangling 99.
    assert row.n_violations == 2


def test_check_foreign_key_cross_frame_still_works(spark):
    child = spark.createDataFrame([(1,), (2,), (7,)], "k bigint")
    parent = spark.createDataFrame([(1,), (2,), (3,)], "pk bigint")
    row = api.check_foreign_key(child, "k", parent, "pk").collect()[0]
    assert (row.n_checked, row.n_violations) == (3, 1)


# -- 2. profiler overflow safety ---------------------------------------------


def test_profile_columns_bigint_edge_nulls_loudly(spark):
    big = spark.createDataFrame(
        [(9_223_372_036_854_775_000,), (5,), (None,)], "v bigint"
    )
    row = api.profile_columns(big, [("v", "int")]).collect()[0]
    assert row.n_rows == 3 and row.n_nulls == 1
    assert row.min_milli == 5000
    assert row.max_milli is None  # overflow reported as NULL, not thrown


def test_profile_columns_int_path_unchanged_on_clean(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], "v bigint")
    row = api.profile_columns(df, [("v", "int")]).collect()[0]
    assert (row.min_milli, row.max_milli, row.n_distinct) == (1000, 3000, 3)


# -- 3. psi_drift dirty-input contract ---------------------------------------


def test_psi_drift_clamps_negative_and_drops_null(spark):
    ref = spark.createDataFrame(
        [(-50,), (-1,), (0,), (5,), (None,)], "v bigint"
    )
    cur = spark.createDataFrame([(2,), (1000000,), (None,)], "v bigint")
    out = api.psi_drift(ref, cur, value_col="v", n_bins=4, bin_width=10)
    rows = {r.bin: r for r in out.collect()}
    assert set(rows) <= {0, 1, 2, 3}  # n_bins contract holds
    assert rows[0].n_ref == 4  # -50, -1, 0, 5 all clamp/land in bin 0
    assert rows[0].n_cur == 1  # 2
    assert rows[3].n_cur == 1  # 1e6 clamps to the top bin
    # NULLs excluded from both sides.
    assert sum(r.n_ref for r in rows.values()) == 4
    assert sum(r.n_cur for r in rows.values()) == 2


# -- 4. retrieval dedupe per (query, doc) -------------------------------------


@pytest.fixture()
def dup_results(spark):
    # doc 100 appears at ranks 1 AND 3 for q1 — a dirty ranking.
    return spark.createDataFrame(
        [("q1", 100, 1), ("q1", 100, 3), ("q1", 200, 2)],
        "qid string, did bigint, pos int",
    )


@pytest.fixture()
def dup_qrels(spark):
    return spark.createDataFrame(
        [("q1", 100), ("q1", 300)], "qid string, did bigint"
    )


def test_precision_recall_dedupes_duplicate_docs(dup_results, dup_qrels):
    row = api.precision_recall_at_k(
        dup_results, dup_qrels, k=3,
        query_col="qid", doc_col="did", rank_col="pos",
    ).collect()[0]
    assert row.n_hits == 1  # doc 100 counted once, not twice
    assert row.precision_micro <= 1_000_000


def test_ndcg_dedupes_duplicate_docs(dup_results, dup_qrels):
    row = api.ndcg_at_k(
        dup_results, dup_qrels, k=3,
        query_col="qid", doc_col="did", rank_col="pos",
    ).collect()[0]
    # Single hit at its best rank (1): DCG = 1/log2(2) = 1.
    assert row.dcg_micro == 1_000_000
    assert row.ndcg_micro is not None and row.ndcg_micro <= 1_000_000


def test_mrr_uses_best_rank_of_duplicate(spark, dup_qrels):
    worst_first = spark.createDataFrame(
        [("q1", 100, 4), ("q1", 100, 2)], "qid string, did bigint, pos int"
    )
    row = api.mrr_at_k(
        worst_first, dup_qrels, k=10,
        query_col="qid", doc_col="did", rank_col="pos",
    ).collect()[0]
    assert row.first_rel_rank == 2


# -- 5. local:// URI alias through the FS seam --------------------------------


def test_fs_for_path_local_scheme_roundtrip(spark, tmp_path):
    uri = "local://" + str(tmp_path / "seam")
    fs = fs_for_path(spark, uri)
    assert isinstance(fs, LocalFS)
    d = fs.join(uri, "part=a")
    fs.makedirs(d)
    fs.write_text_atomic(fs.join(d, "marker.txt"), "hello")
    assert fs.exists(fs.join(d, "marker.txt"))
    assert fs.read_text(fs.join(d, "marker.txt")) == "hello"
    assert fs.list_files(d) == ["marker.txt"]
    assert fs.list_dirs(uri) == ["part=a"]
    fs.rename_overwrite(fs.join(d, "marker.txt"), fs.join(d, "done.txt"))
    walked = list(fs.walk_files(uri))
    assert walked == [(d, ["done.txt"])]  # dirpaths stay in caller namespace
    assert fs.relpath(walked[0][0], uri) == "part=a"
    fs.rmtree(d)
    assert not fs.exists(d)
