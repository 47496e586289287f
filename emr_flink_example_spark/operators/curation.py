"""End-to-end training-data curation: the composite pipeline the individual
operators exist for (quality filter -> exact dedup -> near-dup removal ->
partitioned curated corpus).

Each stage is one of the engine's tested operators applied as a filter:
  1. quality gate      — textstats.q_text_quality features
  2. exact dedup       — md5-fingerprint groupBy, keep the smallest doc_id
  3. near-dup removal  — MinHash+LSH candidates (dedup.q_dedup_minhash_lsh)
                         at an estimated-Jaccard threshold; the larger
                         doc_id of each surviving pair is dropped
  4. write             — parquet partitioned by lang (the layout a 100 TB
                         corpus would be read back by)

Scale notes: stages 2-3 are the documented single-scan shuffle shapes from
dedup.py; stage 4's partitionBy(lang) gives partition pruning for per-lang
consumers. Every intermediate stays a DataFrame — nothing is collected
except the final stage counts (5 scalars).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io import load
from .dedup import q_dedup_minhash_lsh
from .textstats import q_text_quality

NEAR_DUP_EST_JACCARD = 0.8


@dataclass
class CurationStats:
    n_input: int
    n_after_quality: int
    n_after_exact_dedup: int
    n_after_near_dedup: int


def curate_documents(
    spark: SparkSession,
    sf_dir: str,
    out_dir: str,
    min_quality: float = 0.5,
    min_tokens: int = 10,
) -> CurationStats:
    docs = load(spark, sf_dir, "documents")
    n_input = docs.count()

    quality = q_text_quality(spark, sf_dir).select("doc_id", "n_tokens", "quality_score")
    kept = (
        docs.join(quality, "doc_id")
        .where((F.col("quality_score") >= min_quality) & (F.col("n_tokens") >= min_tokens))
        .select(docs["*"])
    )
    n_quality = kept.count()

    # exact dedup: keep the smallest doc_id per normalized-content fingerprint
    exact_keep = (
        kept.withColumn("fingerprint", F.md5(F.lower(F.trim("text"))))
        .groupBy("fingerprint")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    kept = kept.join(exact_keep, "doc_id", "left_semi")
    n_exact = kept.count()

    # near-dup removal: drop the larger id of every high-estimated-Jaccard
    # candidate pair (anti-join against the drop list)
    drop = (
        q_dedup_minhash_lsh(spark, sf_dir)
        .where(F.col("est_jaccard") >= NEAR_DUP_EST_JACCARD)
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
    )
    kept = kept.join(drop, "doc_id", "left_anti")
    n_near = kept.count()

    kept.write.mode("overwrite").partitionBy("lang").parquet(out_dir)
    return CurationStats(n_input, n_quality, n_exact, n_near)
