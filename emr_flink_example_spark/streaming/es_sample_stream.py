"""Streaming exact-k weighted sample: the streaming twin of
`operators.sampling.q_sample_weighted_es` — a continuous Efraimidis-
Spirakis exponential race over everything streamed so far, maintained as
mergeable parquet state (the hll_stream design, applied to a sample
instead of a sketch).

Why this shape:

  * the ES arrival key is a PURE FUNCTION of (doc_id, weight)
    (`sampling.with_es_key` — the same expression as the batch query, so
    stream and batch select bit-identical winners over the same corpus);
  * min-k over pure keys is idempotent and mergeable exactly like
    max-merge over HLL registers: each micro-batch contributes its own
    k-row candidate partition (`batch_id=N`, overwritten on checkpoint
    replay), and the current sample is the global top-k over all
    candidate partitions — duplicates from any crash/replay window
    collapse in the dropDuplicates(doc_id) of the read;
  * state is O(k x batches) tiny files between compactions, compacted
    every N batches into one k-row partition with the same
    publish-before-delete protocol as the register/index compactions.

A per-batch candidate set is the batch's OWN top-k (TakeOrdered — heaps,
no shuffle of the batch beyond its scan): a doc outside its batch's
top-k can never be in the global top-k, so pruning to k per batch is
lossless.
"""

from __future__ import annotations

import posixpath

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.sampling import SAMPLE_ES_K, with_es_key
from .fsio import FSIO, LocalFS, fs_for_path


class StreamingEsSample:
    """foreachBatch sink maintaining per-batch ES candidate partitions."""

    def __init__(
        self,
        cands_path: str,
        k: int = SAMPLE_ES_K,
        weight_col: str = "n_chars",
        compact_every: int = 16,
        fs: FSIO | None = None,
    ) -> None:
        self.cands_path = cands_path
        self.k = k
        self.weight_col = weight_col
        self.compact_every = compact_every
        #: fsio seam — LocalFS for plain paths, HadoopFS resolved lazily
        self.fs = fs if fs is not None else (
            LocalFS() if "://" not in cands_path else None
        )

    def _batch_candidates(self, batch_df: DataFrame) -> DataFrame:
        return (
            with_es_key(
                batch_df.where(F.col(self.weight_col) > 0), self.weight_col
            )
            .orderBy(F.col("es_key_nano").asc(), F.col("doc_id").asc())
            .limit(self.k)
            .select("doc_id", self.weight_col, "es_key_nano")
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        if self.fs is None:
            self.fs = fs_for_path(batch_df.sparkSession, self.cands_path)
        self._batch_candidates(batch_df).coalesce(1).write.mode(
            "overwrite"
        ).parquet(posixpath.join(self.cands_path, f"batch_id={batch_id}"))
        if self.compact_every and batch_id > 0 and batch_id % self.compact_every == 0:
            self._compact(batch_df.sparkSession, batch_id)

    def _top_k(self, cands: DataFrame) -> DataFrame:
        # duplicates (crash/replay windows, overlapping batches) are exact
        # row copies of a pure function — one survives, the race is fair
        return (
            cands.dropDuplicates(["doc_id"])
            .orderBy(F.col("es_key_nano").asc(), F.col("doc_id").asc())
            .limit(self.k)
        )

    def _compact(self, spark: SparkSession, current_batch_id: int) -> None:
        """Merge every candidate partition OLDER than the current batch
        into the oldest one, pruned to the global top-k (lossless: a doc
        outside the top-k of the union can never re-enter — keys are
        immutable). Same crash ordering as the register/index
        compactions: publish into the visible target partition via
        per-file renames BEFORE deleting any source; this run's own
        rename destinations are excluded from the superseded sweep so a
        same-batch_id replay cannot delete its own output."""
        fs = self.fs
        old = sorted(
            (int(d.split("=", 1)[1]), fs.join(self.cands_path, d))
            for d in fs.list_dirs(self.cands_path)
            if d.startswith("batch_id=")
            and int(d.split("=", 1)[1]) < current_batch_id
        )
        if len(old) <= 1:
            return
        merged = self._top_k(
            spark.read.option("basePath", self.cands_path)
            .parquet(*[p for _, p in old])
            .drop("batch_id")
        )
        target_id, target_dir = old[0]
        tmp = fs.join(self.cands_path, f".compact-{current_batch_id}")
        merged.coalesce(1).write.mode("overwrite").parquet(tmp)
        own_prefix = f"compact-{current_batch_id}-"
        superseded = [
            fs.join(target_dir, f)
            for f in fs.list_files(target_dir)
            if not f.startswith(".") and not f.startswith(own_prefix)
        ]
        for i, fname in enumerate(fs.list_files(tmp)):
            if fname.endswith(".parquet"):
                fs.rename_overwrite(
                    fs.join(tmp, fname),
                    fs.join(target_dir, f"{own_prefix}{i:05d}.parquet"),
                )
        fs.rmtree(tmp)
        for _, p in old[1:]:
            fs.rmtree(p)
        for f in superseded:
            if fs.exists(f):
                fs.remove(f)

    def sample(self, spark: SparkSession) -> DataFrame:
        """The current exact-k weighted sample over everything streamed."""
        return self._top_k(spark.read.parquet(self.cands_path))


def es_sample_sink(
    docs: DataFrame,
    cands_path: str,
    checkpoint: str,
    k: int = SAMPLE_ES_K,
    weight_col: str = "n_chars",
    compact_every: int = 16,
) -> StreamingQuery:
    """Attach the ES-sample sink to a stream of weighted rows."""
    sink = StreamingEsSample(cands_path, k, weight_col, compact_every)
    return (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
