"""Pins the Spark behavior that made observe() unusable for the streaming
curation sink (VERDICT r9 #3 asked for observe(); this is why the sink
uses a cache-scan aggregate instead).

Finding, reproduced minimally here on pyspark 4.1.2: Observation metric
delivery is a RACE once persisted frames are involved — the Observation
completes with whatever the FIRST finishing QueryExecution on the
observed dataset carries, and when a cache-fill / derived-persist
execution wins, that is an EMPTY schemaless row which `Observation.get`
cannot even convert (toPyRow asserts). Empirically the curation sink's
shape (observe -> filter -> derived frames persisted inside the same
action) loses the metrics on most runs, and even simple
observe-then-persist shapes drop them occasionally under load. A control
path that gates the reject-audit write cannot sit on a racy metric, so
the sink counts from its pinned gate frame instead (one
InMemoryTableScan aggregate — same answer, deterministic).

If a future Spark version makes delivery reliable, this test fails (no
empty row in N attempts) and the sink can switch back to observe() for
truly-zero-cost stats.
"""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

#: attempts to demonstrate the race; one empty row suffices. The sink's
#: shape loses the metric on most attempts, so 12 is generous.
N_ATTEMPTS = 12


def _run(spark) -> str:
    """The curation sink's shape: observe above a pinned gate, a frame
    DERIVED from the observed node persisted and materialized inside the
    same action (the dedup half's feats/dups pins)."""
    obs = Observation()
    base = spark.createDataFrame(
        [(3, "x"), (4, "y")], "id bigint, t string"
    ).withColumn("ok", F.col("id") > 99)
    gated = base.persist()
    derived = None
    try:
        surv = (
            gated.observe(obs, F.count(F.lit(1)).alias("n"))
            .where("ok")
            .select("id", "t")
        )
        derived = surv.select("id").where(F.length("t") > 100).persist()
        out = surv.join(derived, "id", "left_anti")
        out.write.mode("overwrite").format("noop").save()
        return obs._jo.getRow().toString()
    finally:
        gated.unpersist()
        if derived is not None:
            derived.unpersist()


def test_observe_metrics_racy_under_derived_persist(spark):
    seen = set()
    for _ in range(N_ATTEMPTS):
        seen.add(_run(spark))
        if "[]" in seen:
            break
    assert "[]" in seen, (
        f"observe() delivered {seen} in {N_ATTEMPTS} attempts — the race "
        "the curation sink works around may be fixed; consider switching "
        "the sink back to observe()"
    )
    # when the metric DOES arrive it is correct — the problem is delivery,
    # not computation
    assert seen <= {"[]", "[2]"}
