"""The DataFrame-in/DataFrame-out public API.

Every function here takes user DataFrames plus column-name arguments and
returns a DataFrame (or frames + stats) — none of them knows about the
test fixtures. The catalog queries in ``operators/`` are thin fixture
shims over these same implementations, so each function's semantics are
oracle-checked against DuckDB by the full-catalog selfcheck; the tests in
``tests/test_api.py`` additionally exercise each one on non-fixture
frames with renamed columns.

Families:

* **Dedup** — ``exact_duplicate_groups`` (fingerprint groups),
  ``shingle_documents`` / ``minhash_signatures`` (content signatures),
  ``near_duplicate_pairs`` (MinHash+LSH candidates, skew-guarded),
  ``repeated_spans`` (ExactSubstr-style span diagnostic),
  ``connected_components`` / ``dedup_survivors`` (cluster resolution),
  ``dedup_corpus`` (the one-call pairs -> components -> survivors chain).
* **Similarity** — ``cosine_topk`` (exact brute-force top-k, the
  baseline the ANN tiers are measured against), ``ann_lsh_topk``
  (hyperplane-bucketed approximate top-k, the first scale tier).
* **Text quality** — ``text_quality`` (feature map + composite score),
  ``gopher_flags`` (the Gopher rule bundle), ``language_id``
  (lexicon language ID), ``token_frequencies`` (corpus wordcount),
  ``readability_flesch`` (reading-ease gate), ``code_detect``
  (code-vs-prose routing verdict).
* **Curation** — ``curation_gates`` (quality -> boilerplate -> exact
  dedup -> near-dup, returning kept rows + per-gate counts),
  ``decontamination_overlap`` (eval-set n-gram contamination census),
  ``chunk_documents`` / ``pack_token_shards`` (training-chunk
  construction and token-budget sharding).
* **Sampling / splits** — ``hash_split`` (deterministic train/val/test,
  leakproof when keyed by group), ``stratified_sample`` (per-stratum
  keep rates), ``weighted_sample_es`` (exact-k weighted without
  replacement via the Efraimidis-Spirakis race), ``with_es_key``.
* **Retrieval** — ``bm25_topk`` (bag-of-terms BM25 over any corpus,
  scalar-broadcast df/N/avgdl, no per-term partitioning).
* **Event analytics** — ``sessionize`` (gap-based sessions),
  ``cohort_retention`` (first-seen cohort triangle),
  ``funnel_step_times`` (strict-order N-step funnel), ``asof_join``
  (backward as-of between two keyed event frames),
  ``click_attribution`` (stream-stream interval join).

Determinism contract: nothing here uses an RNG — every sampling/split
decision is a salted portable hash of row content, so results are
identical across runs, partitionings, and engines.

Cache contract: ``curation_gates`` pins its flags frame via the
``cache.pinned`` registry; call ``emr_flink_example_spark.cache.
unpersist_all(spark)`` after consuming its outputs (the query catalog
does this automatically at the next catalog boundary).
"""

from __future__ import annotations

from .cache import unpersist_all
from .operators.analytics import cohort_retention, funnel_step_times, sessionize
from .operators.curation import CurationStats, curation_gates
from .operators.dedup import (
    connected_components,
    decontamination_overlap,
    dedup_corpus,
    dedup_survivors,
    exact_duplicate_groups,
    minhash_signatures_for as minhash_signatures,
    near_duplicate_pairs,
    repeated_spans,
    shingle_documents,
)
from .operators.event_time import asof_join
from .operators.sampling import (
    hash_split,
    pack_token_shards,
    stratified_sample,
    weighted_sample_es,
    with_es_key,
)
from .operators.similarity import ann_lsh_topk, cosine_topk
from .operators.textstats import (
    bm25_topk,
    chunk_documents,
    code_detect,
    gopher_flags,
    language_id,
    readability_flesch,
    text_quality,
    token_frequencies,
)
from .streaming.joins import click_attribution

__all__ = [
    "CurationStats",
    "ann_lsh_topk",
    "asof_join",
    "bm25_topk",
    "chunk_documents",
    "click_attribution",
    "code_detect",
    "cohort_retention",
    "connected_components",
    "cosine_topk",
    "curation_gates",
    "decontamination_overlap",
    "dedup_corpus",
    "dedup_survivors",
    "exact_duplicate_groups",
    "funnel_step_times",
    "gopher_flags",
    "hash_split",
    "language_id",
    "minhash_signatures",
    "near_duplicate_pairs",
    "pack_token_shards",
    "readability_flesch",
    "repeated_spans",
    "sessionize",
    "shingle_documents",
    "stratified_sample",
    "text_quality",
    "token_frequencies",
    "unpersist_all",
    "weighted_sample_es",
    "with_es_key",
]
