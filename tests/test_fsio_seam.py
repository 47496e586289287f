"""Contract test for the fsio seam (VERDICT r11 #3): the staged-publish
and compaction protocols must behave identically through LocalFS and
through HadoopFS (Hadoop's local filesystem over file:// URIs — the
"second implementation" that stands in for HDFS/S3A, same API surface).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from emr_flink_example_spark.streaming.compaction import (
    compact_partition_atomic,
)
from emr_flink_example_spark.streaming.fsio import (
    HadoopFS,
    LocalFS,
    fs_for_path,
)
from emr_flink_example_spark.streaming.partition_commit import (
    PartitionCommitter,
)


def _impls(spark, tmp_path):
    return [
        ("local", LocalFS(), str(tmp_path / "local")),
        ("hadoop", HadoopFS(spark), "file://" + str(tmp_path / "hadoop")),
    ]


def _batch(spark, rows):
    return spark.createDataFrame(rows, "user string, day string, hh string")


def _table_rows(spark, path):
    return sorted(
        r.user for r in spark.read.parquet(path).select("user").collect()
    )


# ---------------------------------------------------------------------------
# primitive contract: both implementations agree on every FSIO operation
# ---------------------------------------------------------------------------
def test_fsio_primitives_agree(spark, tmp_path):
    for name, fs, root in _impls(spark, tmp_path):
        fs.makedirs(fs.join(root, "a/b"))
        assert fs.is_dir(fs.join(root, "a")), name
        fs.write_text_atomic(fs.join(root, "a/b/m.txt"), "hello\nworld")
        assert fs.read_text(fs.join(root, "a/b/m.txt")) == "hello\nworld", name
        assert fs.size(fs.join(root, "a/b/m.txt")) == 11, name
        assert fs.list_files(fs.join(root, "a/b")) == ["m.txt"], name
        assert fs.list_dirs(fs.join(root, "a")) == ["b"], name
        # overwrite semantics: second atomic write replaces the first
        fs.write_text_atomic(fs.join(root, "a/b/m.txt"), "v2")
        assert fs.read_text(fs.join(root, "a/b/m.txt")) == "v2", name
        # rename over an existing destination replaces it
        fs.write_text_atomic(fs.join(root, "a/b/src.txt"), "SRC")
        fs.rename_overwrite(
            fs.join(root, "a/b/src.txt"), fs.join(root, "a/b/m.txt")
        )
        assert fs.read_text(fs.join(root, "a/b/m.txt")) == "SRC", name
        assert not fs.exists(fs.join(root, "a/b/src.txt")), name
        # walk_files sees the leaf; relpath is layout-stable
        walked = {
            fs.relpath(d, root): files for d, files in fs.walk_files(root)
        }
        assert walked == {"a/b": ["m.txt"]}, name
        fs.remove(fs.join(root, "a/b/m.txt"))
        assert fs.list_files(fs.join(root, "a/b")) == [], name
        fs.rmtree(fs.join(root, "a"))
        assert not fs.exists(fs.join(root, "a")), name


def test_fs_for_path_selects_impl(spark, tmp_path):
    assert isinstance(fs_for_path(spark, str(tmp_path)), LocalFS)
    assert isinstance(fs_for_path(spark, "file:///x"), HadoopFS)
    assert isinstance(fs_for_path(spark, "s3a://bucket/x"), HadoopFS)


# ---------------------------------------------------------------------------
# protocol contract: staged publish + replay + compaction through BOTH impls
# ---------------------------------------------------------------------------
@pytest.mark.parametrize("impl", ["local", "hadoop"])
def test_staged_publish_protocol_via_seam(spark, tmp_path, impl):
    name, fs, root = next(
        i for i in _impls(spark, tmp_path) if i[0] == impl
    )
    pc = PartitionCommitter(
        table="fsio_seam_t",
        path=root,
        partition_cols=("day", "hh"),
        timestamp_pattern="$day $hh:00:00",
        commit_delay_seconds=60,
        watermark_lag_seconds=0,
        auto_compact_every=4,
        compact_target_bytes=1 << 30,
        fs=fs,
    )
    for i in range(4):
        pc(_batch(spark, [(f"u{i}", "2021-03-31", "02")]), i)
    # replay of batch 3 must overwrite, not duplicate
    pc(_batch(spark, [("u3", "2021-03-31", "02")]), 3)
    early = fs.join(root, "day=2021-03-31", "hh=02")
    files = [f for f in fs.list_files(early) if f.endswith(".parquet")]
    assert len(files) == 4, (name, files)  # one per batch, replay folded in
    # batch 4's late partition commits the early one, then compacts it
    pc(_batch(spark, [("late", "2021-03-31", "23")]), 4)
    files = [f for f in fs.list_files(early) if f.endswith(".parquet")]
    assert len(files) == 1 and files[0].startswith("compacted-4-"), (name, files)
    assert _table_rows(spark, root) == ["late", "u0", "u1", "u2", "u3"]
    # ledger round-tripped through the seam
    ledger = pc._load_ledger()
    assert {tuple(sorted(p.items())) for p in ledger["committed"]} == {
        (("day", "2021-03-31"), ("hh", "02")),
    }


@pytest.mark.parametrize("impl", ["local", "hadoop"])
def test_compaction_marker_replay_via_seam(spark, tmp_path, impl):
    """Crash between marker write and source deletion: the replay finishes
    the recorded cleanup — identical through both implementations."""
    name, fs, root = next(
        i for i in _impls(spark, tmp_path) if i[0] == impl
    )
    part = fs.join(root, "day=2021-01-01")
    fs.makedirs(part)
    df = spark.range(10).select(
        F.col("id"), F.lit("2021-01-01").alias("day")
    )
    for i in range(3):
        df.coalesce(1).write.mode("overwrite").parquet(fs.join(root, ".stage"))
        src = [
            f
            for f in fs.list_files(fs.join(root, ".stage"))
            if f.endswith(".parquet")
        ][0]
        fs.rename_overwrite(
            fs.join(root, ".stage", src), fs.join(part, f"batch-{i}-00000.parquet")
        )
    fs.rmtree(fs.join(root, ".stage"))
    st = compact_partition_atomic(spark, part, gen=7, target_file_bytes=1 << 30, fs=fs)
    assert st.compacted and st.files_after == 1
    kept = [f for f in fs.list_files(part) if f.endswith(".parquet")]
    assert kept == ["compacted-7-00000.parquet"], (name, kept)
    # simulate the "marker written, cleanup not finished" crash: re-plant a
    # stale source next to the survivor plus the marker, then replay gen 7
    fs.write_text_atomic(
        fs.join(part, "_compact-7.committed"), "compacted-7-00000.parquet"
    )
    fs.write_text_atomic(fs.join(part, "batch-9-00000.parquet"), "STALE")
    st2 = compact_partition_atomic(spark, part, gen=7, target_file_bytes=1 << 30, fs=fs)
    assert st2.compacted
    kept = [f for f in fs.list_files(part) if f.endswith(".parquet")]
    assert kept == ["compacted-7-00000.parquet"], (name, kept)
    assert not fs.exists(fs.join(part, "_compact-7.committed"))
    assert spark.read.parquet(part).count() == 30  # 3 source files x 10 rows


def test_local_layout_unchanged_by_seam(spark, tmp_path):
    """The seam must not change the on-disk layout LocalFS deployments
    already have (ledger name, batch file names, dot-staging cleanup)."""
    root = str(tmp_path / "layout")
    pc = PartitionCommitter(
        table="fsio_layout_t",
        path=root,
        partition_cols=("day", "hh"),
        timestamp_pattern="$day $hh:00:00",
    )
    pc(_batch(spark, [("a", "2021-03-31", "06")]), 0)
    assert os.path.exists(os.path.join(root, "_partition_commits.json"))
    leaf = os.path.join(root, "day=2021-03-31", "hh=06")
    assert [f for f in os.listdir(leaf) if f.endswith(".parquet")] == [
        "batch-0-00000.parquet"
    ]
    assert not any(f.startswith(".batch-") for f in os.listdir(root))
