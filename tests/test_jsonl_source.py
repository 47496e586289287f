"""The custom Python DataSource (jsonl_dir): partition-per-file scan,
equality-filter pushdown, permissive malformed-row handling."""

from __future__ import annotations

import json

import pytest

from emr_flink_example_spark.io import load
from emr_flink_example_spark.sources.jsonl_source import JsonlDirDataSource

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def jsonl_dir(spark, tmp_path_factory):
    """documents (sf0.001) written as 4 JSONL part files."""
    out = tmp_path_factory.mktemp("jsonl")
    rows = load(spark, SF_DIR, "documents").collect()
    for i in range(4):
        with open(out / f"part-{i}.jsonl", "w", encoding="utf-8") as fh:
            for r in rows[i::4]:
                fh.write(json.dumps(r.asDict()) + "\n")
    spark.dataSource.register(JsonlDirDataSource)
    return str(out)


def test_roundtrip_matches_parquet(spark, jsonl_dir):
    got = spark.read.format("jsonl_dir").option("path", jsonl_dir).load()
    exp = load(spark, SF_DIR, "documents")
    assert got.count() == exp.count()
    assert sorted(got.columns) == sorted(exp.columns)
    assert got.exceptAll(exp.select(*got.columns)).count() == 0


def test_scan_has_one_partition_per_file(spark, jsonl_dir):
    got = spark.read.format("jsonl_dir").option("path", jsonl_dir).load()
    assert got.rdd.getNumPartitions() == 4


def test_equality_filter_pushes_into_source(spark, jsonl_dir):
    got = (
        spark.read.format("jsonl_dir")
        .option("path", jsonl_dir)
        .load()
        .where("lang = 'en'")
    )
    exp = load(spark, SF_DIR, "documents").where("lang = 'en'")
    assert got.count() == exp.count()
    # the pushed filter is applied AT the source: the plan's Python scan
    # is below any Filter node for lang (Spark drops the residual filter
    # for fully-pushed predicates, or re-applies it — either way results
    # must match; equality of row sets is the contract)
    assert got.exceptAll(exp.select(*got.columns)).count() == 0


def test_non_equality_filters_remain_spark_side(spark, jsonl_dir):
    got = (
        spark.read.format("jsonl_dir")
        .option("path", jsonl_dir)
        .load()
        .where("n_chars > 500")
    )
    exp = load(spark, SF_DIR, "documents").where("n_chars > 500")
    assert got.count() == exp.count()


def test_malformed_rows_dropped_permissively(spark, tmp_path):
    p = tmp_path / "m.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
    )
    spark.dataSource.register(JsonlDirDataSource)
    got = spark.read.format("jsonl_dir").option("path", str(tmp_path)).load()
    assert got.count() == 2


def test_writer_roundtrip_and_overwrite(spark, tmp_path):
    spark.dataSource.register(JsonlDirDataSource)
    out = tmp_path / "sink"
    out.mkdir()
    docs = load(spark, SF_DIR, "documents").limit(100)
    docs.write.format("jsonl_dir").option("path", str(out)).mode("append").save()
    back = spark.read.format("jsonl_dir").option("path", str(out)).load()
    assert back.count() == 100
    assert back.exceptAll(docs.select(*back.columns)).count() == 0
    # overwrite replaces, not accumulates
    docs2 = load(spark, SF_DIR, "documents").limit(30)
    docs2.write.format("jsonl_dir").option("path", str(out)).mode("overwrite").save()
    assert spark.read.format("jsonl_dir").option("path", str(out)).load().count() == 30
    # no staging residue
    assert not [f for f in out.iterdir() if f.name.startswith(".staging-")]


def test_stream_reader_picks_up_new_files_exactly_once(spark, tmp_path):
    import json as _json
    import time as _time

    spark.dataSource.register(JsonlDirDataSource)
    src = tmp_path / "stream-in"
    src.mkdir()

    def drop(name: str, ids):
        with open(src / name, "w") as fh:
            for i in ids:
                fh.write(_json.dumps({
                    "doc_id": i, "text": f"d{i}", "lang": "en",
                    "source": "s", "n_chars": 2,
                }) + "\n")

    drop("part-000.jsonl", [1, 2])
    q = (
        spark.readStream.format("jsonl_dir")
        .option("path", str(src))
        .load()
        .writeStream.format("memory")
        .queryName("jsonl_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = _time.time() + 60
        while _time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM jsonl_stream").first()["c"] == 2:
                break
            _time.sleep(0.5)
        drop("part-001.jsonl", [3])
        while _time.time() < deadline:
            if spark.sql("SELECT count(*) c FROM jsonl_stream").first()["c"] == 3:
                break
            _time.sleep(0.5)
        rows = spark.sql(
            "SELECT doc_id, count(*) n FROM jsonl_stream GROUP BY doc_id"
        ).collect()
        got = {r["doc_id"]: r["n"] for r in rows}
        # every doc exactly once — no replays, no drops
        assert got == {1: 1, 2: 1, 3: 1}
    finally:
        q.stop()


def test_two_append_jobs_do_not_collide(spark, tmp_path):
    spark.dataSource.register(JsonlDirDataSource)
    out = tmp_path / "sink2"
    out.mkdir()
    docs = load(spark, SF_DIR, "documents").limit(10)
    docs.write.format("jsonl_dir").option("path", str(out)).mode("append").save()
    docs.write.format("jsonl_dir").option("path", str(out)).mode("append").save()
    assert (
        spark.read.format("jsonl_dir").option("path", str(out)).load().count() == 20
    )


def test_staging_files_invisible_to_readers_and_gced(spark, tmp_path):
    """ADVICE r5/r6: in-flight/crashed '.staging-*.jsonl' files must never
    be listed as data (batch or stream); a later commit garbage-collects
    STALE orphans (older than the GC age gate) so append mode doesn't
    accumulate them forever, while FRESH foreign staging files — a
    (contract-violating) concurrent appender's in-flight work — survive."""
    import os
    import time

    from emr_flink_example_spark.sources.jsonl_source import (
        JsonlDirStreamReader,
        JsonlDirWriter,
    )

    spark.dataSource.register(JsonlDirDataSource)
    out = tmp_path / "sink"
    out.mkdir()
    docs = load(spark, SF_DIR, "documents").limit(10)
    docs.write.format("jsonl_dir").option("path", str(out)).mode("append").save()
    # simulate a crashed writer's leftover staging file with valid rows,
    # backdated past the GC age gate (a real orphan is hours old)
    orphan = out / ".staging-deadbeef-0.jsonl"
    orphan.write_text('{"doc_id": 999999}\n', encoding="utf-8")
    stale = time.time() - JsonlDirWriter.STAGING_GC_AGE_SECONDS - 60
    os.utime(orphan, (stale, stale))
    # and a FRESH foreign staging file (concurrent appender, just written)
    inflight = out / ".staging-cafebabe-0.jsonl"
    inflight.write_text('{"doc_id": 888888}\n', encoding="utf-8")
    # batch reader: staging rows invisible
    assert spark.read.format("jsonl_dir").option("path", str(out)).load().count() == 10
    # stream reader listing: staging files excluded from the watermark ordering
    sr = JsonlDirStreamReader(docs.schema, {"path": str(out)})
    assert all(not f.startswith(".") for f in sr._files())
    # a subsequent commit GCs the stale orphan but leaves the fresh file
    docs.write.format("jsonl_dir").option("path", str(out)).mode("append").save()
    assert not orphan.exists()
    assert inflight.exists()
    assert spark.read.format("jsonl_dir").option("path", str(out)).load().count() == 20
