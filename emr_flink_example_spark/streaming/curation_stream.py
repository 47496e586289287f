"""Streaming curation: the quality gate + cross-batch near-dup filter as
ONE continuous pipeline — the streaming twin of the batch curation chain
(`operators.curation._curation_gates` stages 1+4, the two gates that make
sense record-at-a-time).

Each micro-batch of (doc_id, text) documents is:

  1. gated by the Gopher rule bundle (`operators.textstats.gopher_flags` —
     the SAME frame-level expressions as the batch `quality_gopher_rules`
     query, so stream and batch verdicts agree bit-for-bit);
  2. rejected docs land in an audit channel partitioned by batch, each row
     carrying `reject_reason` (the FIRST failing rule, in rule order) —
     curation without a reject trail is undebuggable at corpus scale;
  3. survivors flow into the cross-batch MinHash near-dup filter
     (`dedup_stream.NearDupStreamFilter` — parquet band index, idempotent
     batch_id-partition overwrites, periodic compaction), which writes the
     accepted corpus and extends the index.

Restart safety inherits from both halves: the reject write uses the same
overwrite-own-batch_id-partition protocol as the dedup sink, so a
checkpoint replay rewrites identical directories and the accepted /
rejected split is exactly reproduced.

Scale shape: the gate is pure map-side (scan-speed, no shuffle, no UDF);
the probe is the band-bucket equi-join against the index. Nothing new
shuffles beyond what the dedup filter already does.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..operators.textstats import gopher_flags
from .dedup_stream import NearDupStreamFilter

#: rule-order list of (flag column, reason tag) — the reject_reason is the
#: first failing rule in this order
_RULES = (
    ("ok_word_count", "word_count"),
    ("ok_mean_word_len", "mean_word_len"),
    ("ok_symbol_ratio", "symbol_ratio"),
    ("ok_alpha_words", "alpha_words"),
    ("ok_stopwords", "stopwords"),
)


def _first_failing_rule() -> F.Column:
    reason = F.lit("near_dup")  # unreachable here; placeholder tail
    for flag, tag in reversed(_RULES):
        reason = F.when(~F.coalesce(F.col(flag), F.lit(False)), F.lit(tag)).otherwise(
            reason
        )
    return reason


class CurationStreamSink:
    """foreachBatch sink: Gopher gate -> reject audit -> near-dup filter."""

    def __init__(
        self,
        out_path: str,
        reject_path: str,
        index_path: str,
        est_threshold: float | None = None,
        compact_every: int = 16,
    ) -> None:
        from ..operators.dedup import CC_EST_JACCARD

        self.reject_path = reject_path
        self._dedup = NearDupStreamFilter(
            out_path,
            index_path,
            CC_EST_JACCARD if est_threshold is None else est_threshold,
            compact_every,
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        flags = gopher_flags(batch_df.select("doc_id", "text")).select(
            "doc_id",
            *[f for f, _ in _RULES],
            "passes_gopher",
        )
        gated = batch_df.join(flags, "doc_id")
        rejected = gated.where(~F.col("passes_gopher")).select(
            "doc_id", "text", _first_failing_rule().alias("reject_reason")
        )
        # same idempotent protocol as the dedup sink: a replayed batch
        # overwrites its own partition, never touches any other
        rejected.write.mode("overwrite").parquet(
            os.path.join(self.reject_path, f"batch_id={batch_id}")
        )
        survivors = gated.where(F.col("passes_gopher")).select(*batch_df.columns)
        self._dedup(survivors, batch_id)


def curation_filter_sink(
    docs: DataFrame,
    out_path: str,
    reject_path: str,
    index_path: str,
    checkpoint_dir: str,
    trigger_seconds: int = 1,
) -> StreamingQuery:
    """Start the streaming curation pipeline over a (doc_id, text) stream."""
    sink = CurationStreamSink(out_path, reject_path, index_path)
    return (
        docs.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(processingTime=f"{trigger_seconds} seconds")
        .start()
    )
