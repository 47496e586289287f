"""Mechanical cache lifecycle for catalog-query builders (VERDICT r9 #5).

Builders pin multi-consumer frames with ``pinned(df)`` instead of raw
``DataFrame.persist()``. Every pin lands in a session-keyed registry, and
``plans.catalog.all_queries()`` wraps every builder so the registry is
drained (``unpersist_all``) before the next query builds. The old contract
— "the RUNNER must call spark.catalog.clearCache() between queries" — is
now enforced mechanically at the catalog boundary: an external embedder
who never heard of it gets flat executor storage for free, and caches can
no longer leak InMemoryTableScans into later queries' plans.

Timing is the same as the old contract's: a builder cannot unpersist its
own frames (the returned DataFrame is lazy — the pins must outlive the
caller's collect()), so release happens when the NEXT catalog query is
built, by which point the previous result has been consumed. Runners may
still call ``unpersist_all(spark)`` explicitly after the LAST query of a
sweep to release the final query's pins.

Streaming sinks manage their own persist/unpersist inside each micro-batch
(try/finally in dedup_stream / curation_stream) and do not route through
this registry — their lifecycle is a single foreachBatch call, not a
catalog sweep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: applicationId -> frames pinned since that app's last unpersist_all
_PINNED: dict[str, list[DataFrame]] = {}


def pinned(df: DataFrame) -> DataFrame:
    """persist() a multi-consumer frame and register it for the next
    catalog-boundary release. Returns the same (now persisted) frame."""
    app = df.sparkSession.sparkContext.applicationId
    # registries keyed by OTHER applications belong to stopped
    # SparkContexts in this process — unreusable, and keeping them pins
    # storage-block references for the process lifetime (the
    # _SIMHASH_PAIRS_CACHE eviction discipline)
    for stale in [k for k in _PINNED if k != app]:
        del _PINNED[stale]
    _PINNED.setdefault(app, []).append(df.persist())
    return df


def unpersist_all(spark: SparkSession) -> int:
    """Release every frame pinned in this session since the last call;
    returns how many were released. Safe to call at any time — pins
    re-register as their queries rebuild."""
    frames = _PINNED.pop(spark.sparkContext.applicationId, [])
    for df in frames:
        try:
            df.unpersist()
        except Exception:
            pass  # context already stopped — blocks are gone anyway
    return len(frames)
