"""Streaming scaling curves (VERDICT r11 #5): SCALING_r11 proved batch
growth exponents; this tool does the same for the six streaming
pipelines. Each pipeline runs the streambench method (24 files, 2 per
trigger -> 12 micro-batches) at three input sizes, so PER-BATCH row
volume scales with input while batch count, partition grain, and
checkpoint cadence stay fixed — the growth we fit is the work per row,
not stream mechanics.

    python tools/streamscale.py     # sf dir via SPARK_GRAFT_SF_DIR

Prints ONE JSON line (committed as STREAMSCALE_r{N}.json): per pipeline,
(n_rows, elapsed, rows/sec, avg/max batch ms) at each size plus fitted
consecutive-pair exponents e = log(t2/t1)/log(n2/n1); `super_linear` if
the worst exponent exceeds THRESHOLD (same 1.3 bar as tools/scaling.py).
The accumulating-state pipelines are the ones this exists to watch: the
curation sink probes a growing near-dup band index every batch, and the
DQ monitor / count-min sinks re-read accumulated state on their read
side.

Input sizing: events/documents fixtures are downsampled by key modulus
or replicated with a distinct suffix per replica (replica text is made
UNIQUE so the dedup gates see new documents, not a pathological
100%-duplicate stream — that stress lives in tests, not the scaling
fit). The hive input keeps the same 120-minute squeezed event-time span
at every size, so partition count is constant and only per-partition
volume grows (a live ingest's shape).
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import streambench as SB  # noqa: E402
from emr_flink_example_spark.io import load  # noqa: E402
from emr_flink_example_spark.session import local_test_session  # noqa: E402

THRESHOLD = 1.3

#: per-pipeline size ladders — event pipelines get two decades; hive is
#: capped (minute-grain catalog work makes it the slowest per row) and
#: curation's ladder matches its documents-not-events input
SIZES: dict[str, tuple[int, ...]] = {
    "text": (10_000, 100_000, 1_000_000),
    "parquet": (10_000, 100_000, 1_000_000),
    "hive": (10_000, 50_000, 250_000),
    "heavy_hitters": (10_000, 100_000, 1_000_000),
    "dq_monitor": (10_000, 100_000, 1_000_000),
    "curation": (500, 5_000, 50_000),
}

BENCH = {
    "text": SB.bench_text,
    "parquet": SB.bench_parquet,
    "hive": SB.bench_hive,
    "heavy_hitters": SB.bench_heavy_hitters,
    "dq_monitor": SB.bench_dq_monitor,
    "curation": SB.bench_curation,
}


def _sized(df, key: str, n_have: int, n_target: int):
    """Deterministically resize by key modulus (down) or replication with
    re-keyed ids (up)."""
    if n_target <= n_have:
        mod = max(1, n_have // n_target)
        return df.where(F.col(key) % mod == 0), 1
    mult = -(-n_target // n_have)
    rep = df.crossJoin(
        F.broadcast(
            df.sparkSession.range(mult).select(F.col("id").alias("rep"))
        )
    )
    return rep.withColumn(key, F.col(key) * mult + F.col("rep")), mult


def build_events_sized(
    spark, sf_dir: str, in_dir: str, n_target: int, squeeze: bool
) -> int:
    ev = load(spark, sf_dir, "events")
    ev, _ = _sized(ev, "event_id", ev.count(), n_target)
    ts = F.col("ts")
    if squeeze:
        mm = ev.agg(
            F.unix_millis(F.min("ts").cast("timestamp")).alias("lo"),
            F.unix_millis(F.max("ts").cast("timestamp")).alias("hi"),
        ).first()
        factor = (SB.HIVE_SPAN_MINUTES * 60_000) / max(mm.hi - mm.lo, 1)
        ts = F.timestamp_millis(
            (
                F.lit(mm.lo)
                + (F.unix_millis(F.col("ts").cast("timestamp")) - F.lit(mm.lo))
                * F.lit(factor)
            ).cast("bigint")
        )
    lines = ev.select(SB._ad_event_json(ts).alias("value"))
    lines.repartition(SB.N_FILES).write.mode("overwrite").text(in_dir)
    return spark.read.text(in_dir).count()


def build_docs_sized(spark, sf_dir: str, in_dir: str, n_target: int) -> int:
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    docs, mult = _sized(docs, "doc_id", docs.count(), n_target)
    if mult > 1:
        # distinct text per replica: the dedup gates must see new docs
        docs = docs.withColumn(
            "text", F.concat(F.col("text"), F.lit(" rep"), F.col("rep"))
        )
    docs = docs.select("doc_id", "text")
    lines = docs.select(F.to_json(F.struct("doc_id", "text")).alias("value"))
    lines.repartition(SB.N_FILES).write.mode("overwrite").text(in_dir)
    return spark.read.text(in_dir).count()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = local_test_session()
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="streamscale-")
    out: dict = {
        "metric": "streaming_scaling",
        "threshold": THRESHOLD,
        "n_files": SB.N_FILES,
        "files_per_trigger": SB.FILES_PER_TRIGGER,
        "pipelines": {},
    }
    try:
        for name, sizes in SIZES.items():
            points = []
            for n_target in sizes:
                tag = f"{name}-{n_target}"
                in_dir = os.path.join(root, f"in-{tag}")
                if name == "curation":
                    n_rows = build_docs_sized(spark, sf_dir, in_dir, n_target)
                else:
                    n_rows = build_events_sized(
                        spark, sf_dir, in_dir, n_target, squeeze=(name == "hive")
                    )
                work = os.path.join(root, tag)
                os.makedirs(work, exist_ok=True)
                r = BENCH[name](spark, in_dir, work, n_rows)
                r.pop("compaction", None)  # streambench's A/B, not needed here
                points.append(r)
                shutil.rmtree(in_dir, ignore_errors=True)
                shutil.rmtree(work, ignore_errors=True)
            exps = [
                round(
                    math.log(b["elapsed_sec"] / a["elapsed_sec"])
                    / math.log(b["n_rows"] / a["n_rows"]),
                    3,
                )
                for a, b in zip(points, points[1:])
            ]
            worst = max(exps) if exps else None
            out["pipelines"][name] = {
                "points": points,
                "exponents": exps,
                "worst_exponent": worst,
                "super_linear": bool(worst and worst > THRESHOLD),
            }
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
