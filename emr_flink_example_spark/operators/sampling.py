"""Deterministic sampling / splitting operators over `documents` (SURVEY.md
§2 Part C — training-data pipeline surface).

A 100 TB corpus pipeline needs *reproducible* sampling: the same doc must land
in the same split/sample no matter how the data is partitioned, re-read, or
re-run. Spark's `df.sample`/`sampleBy` are seed-based RNGs over partition
iterators — their output changes when partitioning changes, and no external
engine can reproduce them. Every operator here instead derives its decision
from a content hash (functions/hashing.py's md5-based portable hash), which
is stable across runs, partitionings, and engines — the DuckDB oracle
reproduces each sample bit-for-bit.

Scale notes: all decisions are per-row hash comparisons — embarrassingly
parallel map-side work, no shuffle at all except where a per-group aggregate
is genuinely required (quantile bounds, language shares), and those aggregate
to a handful of rows that Spark broadcast-joins back onto the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.hashing import portable_hash, portable_hash_sql_duckdb
from ..io import load

#: salt so split assignment is independent of any other hash-based decision
SPLIT_SALT = "split-v1"
TRAIN_PCT, VAL_PCT = 90, 5  # remainder = test

#: per-language keep-rates for the stratified sample (pct of 100)
STRATA_PCT = {"en": 5, "zh": 10}
STRATA_DEFAULT_PCT = 20
SAMPLE_SALT = "sample-v1"

#: fixed-size uniform sample
FIXED_K = 200

#: quantile outlier fence on n_chars, per language
Q_LO, Q_HI = 0.05, 0.95

#: temperature for language-balanced sampling weights; 0.5 so the power is
#: sqrt(), which IEEE requires correctly rounded — bit-identical across
#: Spark and DuckDB (an arbitrary pow(x, a) is not).
TEMPERATURE_ALPHA = 0.5


def _bucket(col: Column) -> Column:
    """Deterministic bucket in [0, 100) from a salted content hash."""
    return portable_hash(col) % 100


def _bucket_duck(expr: str) -> str:
    return f"({portable_hash_sql_duckdb(expr)} % 100)"


def hash_split(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    train_pct: int = TRAIN_PCT,
    val_pct: int = VAL_PCT,
    salt: str = SPLIT_SALT,
) -> DataFrame:
    """Attach a deterministic train/val/test `split` column to ANY frame,
    bucketed by a salted hash of `key_col`. Hash the GROUPING key (e.g. the
    source/domain) instead of the row id for leakage-proof group-integrity
    splits. Hash-bucket assignment (not RNG) so that (a) re-running on
    re-partitioned data yields the identical split, and (b) a row added
    later cannot move an existing row between splits — both properties
    seed-based `randomSplit` lacks. Pure map-side: no shuffle."""
    b = _bucket(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    return df.withColumn(
        "split",
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test"),
    )


def q_split_train_val_test(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test assignment per document (see
    `hash_split`)."""
    docs = load(spark, sf, "documents")
    return hash_split(docs).select("doc_id", "lang", "split")


def q_sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic stratified sample: per-language keep-rates (en is
    downsampled hardest — the usual corpus-rebalancing move), applied as a
    salted hash-bucket comparison. Map-side only; the rate table is a literal
    CASE expression, not a join."""
    docs = load(spark, sf, "documents")
    return stratified_sample(docs).select("doc_id", "lang", "source")


def stratified_sample(
    df: DataFrame,
    *,
    key_col: str = "doc_id",
    strata_col: str = "lang",
    rates_pct: dict[str, int] | None = None,
    default_pct: int = STRATA_DEFAULT_PCT,
    salt: str = SAMPLE_SALT,
) -> DataFrame:
    """Deterministic stratified FILTER of ANY frame: keep each row with its
    stratum's pct-rate, decided by a salted hash of `key_col` — map-side
    only, reproducible across runs/partitionings/engines; the rate table is
    a literal CASE expression, not a join. Returns the input rows that
    survive, all columns intact."""
    if rates_pct is None:
        rates_pct = STRATA_PCT
    b = _bucket(F.concat(F.col(key_col).cast("string"), F.lit(salt)))
    rate = F.lit(default_pct)
    for stratum, pct in sorted(rates_pct.items()):
        rate = F.when(F.col(strata_col) == stratum, pct).otherwise(rate)
    return df.where(b < rate)


def q_sample_fixed_k(spark: SparkSession, sf: str) -> DataFrame:
    """Exact-size-k uniform sample: the k docs with the smallest salted hash.

    The distributed analogue of reservoir sampling with none of the state:
    each partition computes its local top-k by hash (TakeOrderedAndProject),
    the driver merges k-sized heaps — never a full sort, never a full
    shuffle."""
    docs = load(spark, sf, "documents")
    h = portable_hash(F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT)))
    return (
        docs.select("doc_id", "lang", h.alias("sort_key"))
        .orderBy("sort_key", "doc_id")
        .limit(FIXED_K)
        .select("doc_id", "lang")
    )


#: per-source document quota (domain balancing): a RefinedWeb/C4-style cap
#: that keeps any one domain/crawl-source from dominating the corpus mix.
SOURCE_QUOTA = 20


def q_sample_source_quota(spark: SparkSession, sf: str) -> DataFrame:
    """Per-source document cap: keep at most SOURCE_QUOTA docs per `source`,
    chosen by salted-hash rank — the deterministic web-corpus governance
    step (no one domain may dominate the mix), reproducible across engines
    and partitionings.

    Shape: one window per source over the salted hash. The window key is
    `source` — a bounded-cardinality key whose per-group row count is
    exactly what the quota bounds downstream, but the RANKING itself ranks
    the full group; at 100 TB pre-filter each source to its approximate
    top-quota by a per-partition TakeOrdered before the window (same
    two-phase shape as sample_fixed_k) — the plan here keeps the simple
    form the oracle mirrors."""
    docs = load(spark, sf, "documents")
    h = portable_hash(F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT)))
    w = Window.partitionBy("source").orderBy("h", "doc_id")
    return (
        docs.select("doc_id", "source", h.alias("h"))
        .withColumn("quota_rank", F.row_number().over(w))
        .where(F.col("quota_rank") <= SOURCE_QUOTA)
        .select("doc_id", "source", "quota_rank")
    )


#: expected sample size of the weighted Bernoulli sample
WEIGHTED_K = 200


def q_sample_weighted_bernoulli(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic size-weighted sample: each doc kept with probability
    proportional to its n_chars (expected total WEIGHTED_K docs), decided by
    a salted-hash bucket — the char-budget-proportional sampling used when
    a fixed TOKEN budget (not doc count) must be filled representatively.

    No RNG and no transcendentals: keep iff hash-ppm < floor(w * K*1e6 /
    total_w) — two IEEE double ops and a floor, identically evaluated in
    both engines, so the sample is bit-reproducible (the ES exponential-
    key scheme would rank by u^(1/w), whose pow() is not cross-engine
    exact). The total weight is ONE broadcast scalar; the decision is pure
    map-side."""
    docs = load(spark, sf, "documents")
    tot = docs.agg(F.sum("n_chars").cast("double").alias("total_chars"))
    h_ppm = portable_hash(
        F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT))
    ) % 1_000_000
    rate = F.least(
        F.lit(1_000_000).cast("double"),
        F.floor(F.col("n_chars").cast("double") * float(WEIGHTED_K * 1_000_000) / F.col("total_chars")),
    )
    return (
        docs.crossJoin(F.broadcast(tot))
        .withColumn("keep_rate_ppm", rate.cast("bigint"))
        .where(h_ppm < F.col("keep_rate_ppm"))
        .select("doc_id", "lang", "n_chars", "keep_rate_ppm")
    )


def q_outlier_filter_quantile(spark: SparkSession, sf: str) -> DataFrame:
    """Keep documents whose n_chars lies within the per-language [p05, p95]
    exact-percentile fence — the standard length-outlier gate before
    training.

    Two-phase shape: one groupBy computes per-lang bounds (a handful of
    rows), which Spark broadcast-joins back onto the corpus — the big table
    is never shuffled. Exact `percentile` (not approx) so the DuckDB
    `quantile_cont` oracle matches: both define quantiles as linear
    interpolation at rank (n-1)*q."""
    docs = load(spark, sf, "documents")
    bounds = docs.groupBy("lang").agg(
        F.percentile("n_chars", Q_LO).alias("lo"),
        F.percentile("n_chars", Q_HI).alias("hi"),
    )
    return (
        docs.join(F.broadcast(bounds), "lang")
        .where((F.col("n_chars") >= F.col("lo")) & (F.col("n_chars") <= F.col("hi")))
        .select("doc_id", "lang", "n_chars")
    )


#: modified z-score constants in 1e-4 units: 0.6745·dev/MAD > 3.5
#: (Iglewicz & Hoaglin 1993) becomes the EXACT integer test
#: dev·6745 > 35000·MAD — no float ever enters the outlier decision.
MAD_Z_NUM = 6745
MAD_Z_THRESH = 35000


def q_outlier_robust_mad(spark: SparkSession, sf: str) -> DataFrame:
    """Robust outlier census per event_type via the median/MAD modified
    z-score (Iglewicz & Hoaglin 1993) — the mean/stddev z-score's
    breakdown-point-0.5 sibling: a few huge values can't drag the fence.
    Output: (event_type, n, median_cents, mad_cents, n_outliers).

    Exactness discipline: values become integer cents; the median is the
    lower median (k = (n+1) div 2-th smallest), selected by row_number
    rather than engine-interpolated percentiles, so both engines pick the
    identical element; the MAD repeats the same selection on |x − med|;
    and the 3.5-sigma test is the all-integer dev·6745 > 35000·MAD. A
    zero MAD (>50% of the group at one value) flags nothing, explicitly.

    Scale shape: two window sorts partitioned by event_type (the exact
    path); at 100 TB swap the row_number selections for approx
    percentile_approx fences per the outlier_filter_quantile pattern —
    the flag test and outputs stay identical."""
    # complete-case: a NULL value has no rank position (the engines sort
    # NULLs on opposite ends, shifting the median row) — excluded in both
    ev = load(spark, sf, "events").where(F.col("value").isNotNull()).select(
        "event_id",
        "event_type",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    counts = ev.groupBy("event_type").agg(F.count("*").alias("n"))
    w1 = Window.partitionBy("event_type").orderBy("cents", "event_id")
    med = (
        ev.withColumn("rn", F.row_number().over(w1))
        .join(F.broadcast(counts), "event_type")
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("cents").alias("median_cents"))
    )
    devs = ev.join(F.broadcast(med), "event_type").withColumn(
        "dev", F.abs(F.col("cents") - F.col("median_cents"))
    )
    w2 = Window.partitionBy("event_type").orderBy("dev", "event_id")
    mad = (
        devs.withColumn("rn", F.row_number().over(w2))
        .join(F.broadcast(counts), "event_type")
        .where(F.col("rn") == F.expr("(n + 1) div 2"))
        .select("event_type", F.col("dev").alias("mad_cents"))
    )
    return (
        devs.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.min("median_cents").alias("median_cents"),
            F.min("mad_cents").alias("mad_cents"),
            F.sum(
                F.when(
                    (F.col("mad_cents") > 0)
                    & (F.col("dev") * MAD_Z_NUM > MAD_Z_THRESH * F.col("mad_cents")),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
        .orderBy("event_type")
    )


def q_lang_temperature_weights(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature-balanced language sampling weights: w_l proportional to
    share_l^alpha with alpha=0.5 — the multilingual-corpus rebalancing rule
    (upweights tail languages, downweights the head).

    One groupBy to per-lang counts (tiny), then the normalization constant
    via a single-row cross join — nothing large ever moves."""
    docs = load(spark, sf, "documents")
    per_lang = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    total = per_lang.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("z"),
    )
    return (
        per_lang.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "n_docs",
            F.round(F.col("n_docs") / F.col("n_total"), 6).alias("share"),
            F.round(F.sqrt(F.col("n_docs").cast("double")) / F.col("z"), 6).alias("weight"),
        )
    )


_SPLIT_BUCKET = _bucket_duck(f"doc_id::VARCHAR || '{SPLIT_SALT}'")
_SRC_SPLIT_BUCKET = _bucket_duck(f"source || '{SPLIT_SALT}'")
_SAMPLE_BUCKET = _bucket_duck(f"doc_id::VARCHAR || '{SAMPLE_SALT}'")
_SAMPLE_HASH = portable_hash_sql_duckdb(f"doc_id::VARCHAR || '{SAMPLE_SALT}'")
_RATE_CASE = (
    "CASE "
    + " ".join(f"WHEN lang = '{k}' THEN {v}" for k, v in sorted(STRATA_PCT.items()))
    + f" ELSE {STRATA_DEFAULT_PCT} END"
)

def q_sample_temperature(spark: SparkSession, sf: str) -> DataFrame:
    """Temperature rebalance, executed: per-lang keep-rates proportional to
    weight/share (normalized so the most-upweighted language keeps 100%),
    applied as a deterministic salted-hash sample. The output corpus's
    language distribution approaches the alpha=0.5 temperature target of
    q_lang_temperature_weights — this is that query's keep/drop step.

    Two-phase broadcast shape: the rate table is |langs| rows (computed with
    the exact same IEEE-exact sqrt arithmetic in the oracle), broadcast onto
    the corpus; the keep decision is one hash compare per row, map-side,
    partitioning-independent."""
    docs = load(spark, sf, "documents")
    per_lang = docs.groupBy("lang").agg(F.count("*").alias("n_docs"))
    total = per_lang.agg(
        F.sum("n_docs").alias("n_total"),
        F.sum(F.sqrt(F.col("n_docs").cast("double"))).alias("z"),
    )
    ratio = (F.sqrt(F.col("n_docs").cast("double")) / F.col("z")) / (
        F.col("n_docs") / F.col("n_total")
    )
    rated = per_lang.crossJoin(F.broadcast(total)).select("lang", ratio.alias("ratio"))
    rmax = rated.agg(F.max("ratio").alias("rmax"))
    rates = rated.crossJoin(F.broadcast(rmax)).select(
        "lang", (F.col("ratio") / F.col("rmax")).alias("keep_rate")
    )
    h = portable_hash(F.concat(F.col("doc_id").cast("string"), F.lit(SAMPLE_SALT))) % 10000
    return (
        docs.join(F.broadcast(rates), "lang")
        .where(h < F.col("keep_rate") * 10000)
        .select("doc_id", "lang", F.round("keep_rate", 6).alias("keep_rate"))
    )


def q_split_leakproof_by_source(spark: SparkSession, sf: str) -> DataFrame:
    """Group-integrity train/val/test split: the bucket is hashed from
    `source`, not doc_id, so every document of a source lands in the SAME
    split — near-duplicates and templated docs from one origin can never
    straddle train and test (the leakage mode a per-doc split invites).

    Same map-side hash-bucket mechanics as q_split_train_val_test; the only
    difference is the grouping key, and that difference is the point."""
    docs = load(spark, sf, "documents")
    return hash_split(docs, key_col="source").select("doc_id", "source", "split")


#: per-shard token budget for contiguous corpus packing.
SHARD_TOKEN_BUDGET = 4096


def q_pack_token_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Contiguous token-budget sharding: within each lang, docs (in doc_id
    order) are packed into shards of ~SHARD_TOKEN_BUDGET tokens — the
    training-data step that turns a curated corpus into bounded-size
    shards/batches. shard_id = which budget window the doc's running token
    span ends in ((cum-1) div B + 1): pure integer arithmetic on one
    running-sum window, engine-exact, no iteration.

    Scale shape: one window per lang partition — at 100 TB a single lang is
    a hot partition, so pre-shard by (lang, hash-bucket) first and pack
    within buckets (same query with the bucket added to the partition key);
    the assignment stays deterministic because the ordering key travels
    with the rows."""
    from .textstats import TOKENS

    docs = load(spark, sf, "documents").select(
        "doc_id", "lang", F.expr(f"size({TOKENS})").alias("n_tokens")
    )
    return pack_token_shards(docs)


def pack_token_shards(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    group_col: str = "lang",
    tokens_col: str = "n_tokens",
    shard_token_budget: int = SHARD_TOKEN_BUDGET,
) -> DataFrame:
    """Contiguous token-budget sharding of ANY (id, group, token-count)
    frame — (group, id, n_tokens, cum_tokens, shard_id); semantics and the
    hot-partition pre-sharding note in `q_pack_token_shards`."""
    docs = df.select(
        F.col(group_col).alias("lang"),
        F.col(id_col).alias("doc_id"),
        F.col(tokens_col).alias("n_tokens"),
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return docs.withColumn("cum_tokens", F.sum("n_tokens").over(w)).select(
        "lang",
        "doc_id",
        "n_tokens",
        "cum_tokens",
        F.expr(f"cast((cum_tokens - 1) div {shard_token_budget} + 1 as int)").alias("shard_id"),
    )


#: global-shuffle shard fan-out: 2^k shards so shard_id is a hash prefix; at
#: 100 TB pick shards ~ corpus_bytes / desired_shard_bytes (thousands).
N_SHUFFLE_SHARDS = 8
SHUFFLE_SALT = "shuffle-v1"


def q_shuffle_to_shards(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global shuffle of the corpus into training shards:
    every doc gets a salted-hash sort key, a shard (key mod N), and its
    position within the shard — the epoch-order assignment a trainer reads
    back shard-by-shard. Hash-derived (not RNG) for the same reason as the
    splits: identical output for any partitioning, re-run, or engine.

    Scale shape: key and shard are pure map-side; the in-shard position is
    rank-over-shard — at this catalog's N_SHUFFLE_SHARDS=8 that is 8 sort
    tasks, and at 100 TB the same layout is written as
    repartitionByRange(shuffle_key) + sortWithinPartitions with shard =
    range bucket, which needs NO rank window at all (position = file
    order); the explicit rank here exists so the assignment is a checkable
    value, not a file side-effect."""
    from pyspark.sql.window import Window

    docs = load(spark, sf, "documents")
    key = portable_hash(F.concat(F.lit(SHUFFLE_SALT), F.col("doc_id").cast("string")))
    w = Window.partitionBy("shard_id").orderBy("shuffle_key", "doc_id")
    return (
        docs.select(
            "doc_id",
            key.alias("shuffle_key"),
            (key % N_SHUFFLE_SHARDS).cast("int").alias("shard_id"),
        )
        .withColumn("pos_in_shard", F.row_number().over(w))
    )


#: PSI bins: document length in fixed 64-char bins, capped at bin 9
#: (fixture lengths span ~47-560 chars, so all 10 bins are exercised).
PSI_BIN_WIDTH = 64
PSI_N_BINS = 10


def q_quality_drift_psi(spark: SparkSession, sf: str) -> DataFrame:
    """Population-stability-index audit between the deterministic train and
    val splits — the standard drift check a training pipeline runs before
    trusting a held-out set: per document-length bin, both splits' Laplace-
    smoothed rates and the bin's PSI contribution
    (p - q) * ln(p / q), reported in integer micro-nats (the repo's
    established engine-exact form for ln-valued outputs: floor(x*1e6 + 0.5)
    per bin, NO cross-bin float sum, so no summation-order sensitivity).

    Scale shape: one map pass derives (bin, split) per row from the
    hash-bucket split (no RNG, no shuffle), one groupBy(bin) with
    conditional count partials carries <= PSI_N_BINS rows, and the totals
    ride a single-row broadcast — at 100 TB this is one scan plus a
    kilobyte aggregate. A fat PSI (sum of contributions >> 0.1e6 micro)
    flags a split whose feature distribution drifted."""
    docs = load(spark, sf, "documents")
    b = _bucket(F.concat(F.col("doc_id").cast("string"), F.lit(SPLIT_SALT)))
    split = (
        F.when(b < TRAIN_PCT, "train")
        .when(b < TRAIN_PCT + VAL_PCT, "val")
        .otherwise("test")
    )
    binned = docs.select(
        F.least(
            F.lit(PSI_N_BINS - 1), F.floor(F.length("text") / PSI_BIN_WIDTH)
        ).cast("int").alias("len_bin"),
        split.alias("split"),
    ).where(F.col("split") != "test")
    counts = binned.groupBy("len_bin").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("n_train"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("n_val"),
    )
    # totals via an unpartitioned window over the <= PSI_N_BINS aggregate
    # rows, NOT a second aggregate branch: a derived `counts.agg(...)`
    # crossJoin re-computes the whole counts subtree — a second full corpus
    # scan at 100 TB. The window costs one single-partition exchange of a
    # handful of rows on top of the one real scan.
    w_all = Window.partitionBy()
    counts = counts.select(
        "len_bin",
        "n_train",
        "n_val",
        F.sum("n_train").over(w_all).alias("tot_train"),
        F.sum("n_val").over(w_all).alias("tot_val"),
    )
    p = (F.col("n_train") + 1) / (F.col("tot_train") + PSI_N_BINS)
    q = (F.col("n_val") + 1) / (F.col("tot_val") + PSI_N_BINS)
    return counts.select(
        "len_bin",
        "n_train",
        "n_val",
        F.round(p, 6).alias("train_rate"),
        F.round(q, 6).alias("val_rate"),
        F.floor((p - q) * F.log(p / q) * 1000000 + 0.5)
        .cast("bigint")
        .alias("psi_micro"),
    )


def q_quality_drift_ks(spark: SparkSession, sf: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov drift audit between the deterministic
    train and val splits over the n_chars distribution — the ECDF-shaped
    companion to the binned PSI audit (KS catches shape drift PSI's coarse
    bins can smear out; a leak-free splitter should show D ~ 0).

    Determinism discipline: D = max_v |F_a(v) - F_b(v)| is computed in
    integer units — d(v) = |cumA(v)*n_b - cumB(v)*n_a|, exact in any
    accumulation order — and only the final report ships a float, as
    floor-micro units of d/(n_a*n_b). The argmax value breaks ties toward
    the smallest v (min over the maximizers), so the report row is unique.

    Scale shape: one shuffle to per-value counts (bounded by |distinct
    n_chars|, NOT corpus size), ONE unpartitioned ordered window over that
    small aggregate (the quality_drift_psi pattern), two one-row broadcast
    joins. The corpus is scanned exactly once."""
    docs = load(spark, sf, "documents")
    b = _bucket(F.concat(F.col("doc_id").cast("string"), F.lit(SPLIT_SALT)))
    labeled = docs.select(
        F.col("n_chars").alias("v"),
        F.when(b < TRAIN_PCT, F.lit("train"))
        .when(b < TRAIN_PCT + VAL_PCT, F.lit("val"))
        .alias("split"),
    ).where(F.col("split").isNotNull())
    per_v = labeled.groupBy("v").agg(
        F.sum(F.when(F.col("split") == "train", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("split") == "val", 1).otherwise(0)).alias("cb"),
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = per_v.groupBy().agg(F.sum("ca").alias("n_a"), F.sum("cb").alias("n_b"))
    scored = (
        per_v.select(
            "v",
            F.sum("ca").over(wcum).alias("cuma"),
            F.sum("cb").over(wcum).alias("cumb"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "v",
            "n_a",
            "n_b",
            F.abs(
                F.col("cuma") * F.col("n_b") - F.col("cumb") * F.col("n_a")
            ).alias("d"),
        )
    )
    kmax = scored.groupBy().agg(F.max("d").alias("ks_scaled"))
    return (
        scored.join(F.broadcast(kmax), scored["d"] == kmax["ks_scaled"])
        .groupBy("ks_scaled", "n_a", "n_b")
        .agg(F.min("v").alias("ks_at_n_chars"))
        .select(
            F.lit("train").alias("split_a"),
            F.lit("val").alias("split_b"),
            "n_a",
            "n_b",
            "ks_at_n_chars",
            "ks_scaled",
            F.floor(
                F.col("ks_scaled").cast("double")
                / (F.col("n_a") * F.col("n_b"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("ks_micro"),
        )
    )


def psi_drift(
    ref: DataFrame,
    cur: DataFrame,
    *,
    value_col: str,
    n_bins: int = PSI_N_BINS,
    bin_width: int = PSI_BIN_WIDTH,
) -> DataFrame:
    """Population-stability-index drift between ANY two frames' numeric
    column — one row per bin (bin, n_ref, n_cur, ref_rate, cur_rate,
    psi_micro), Laplace-smoothed, PSI contributions in integer micro-nats
    PER BIN (no cross-bin float sum — the engine-exact ln discipline of
    `q_quality_drift_psi`, whose math this reuses over a two-frame
    union). Sum psi_micro client-side; >> 100000 micro flags drift.

    Scale shape: one union scan, one <= n_bins-row aggregate, totals via
    an unpartitioned window over those bins.

    Dirty-input contract: bins clamp BOTH ways (negative values land in
    bin 0, large ones in bin n_bins-1) and NULL values are excluded
    (complete-case, the repo-wide discipline) — the n_bins contract holds
    on any input."""

    def lab(df: DataFrame, tag: str) -> DataFrame:
        return df.where(F.col(value_col).isNotNull()).select(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(n_bins - 1), F.floor(F.col(value_col) / bin_width)
                ),
            ).cast("int").alias("bin"),
            F.lit(tag).alias("split"),
        )

    counts = (
        lab(ref, "ref")
        .unionByName(lab(cur, "cur"))
        .groupBy("bin")
        .agg(
            F.sum(F.when(F.col("split") == "ref", 1).otherwise(0)).alias("n_ref"),
            F.sum(F.when(F.col("split") == "cur", 1).otherwise(0)).alias("n_cur"),
        )
    )
    w_all = Window.partitionBy()
    counts = counts.select(
        "bin",
        "n_ref",
        "n_cur",
        F.sum("n_ref").over(w_all).alias("tot_ref"),
        F.sum("n_cur").over(w_all).alias("tot_cur"),
    )
    p = (F.col("n_ref") + 1) / (F.col("tot_ref") + n_bins)
    q = (F.col("n_cur") + 1) / (F.col("tot_cur") + n_bins)
    return counts.select(
        "bin",
        "n_ref",
        "n_cur",
        F.round(p, 6).alias("ref_rate"),
        F.round(q, 6).alias("cur_rate"),
        F.floor((p - q) * F.log(p / q) * 1000000 + 0.5)
        .cast("bigint")
        .alias("psi_micro"),
    )


def ks_drift(ref: DataFrame, cur: DataFrame, *, value_col: str) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov D between ANY two frames' numeric
    column — one row (n_ref, n_cur, ks_at_value, ks_scaled, ks_micro).
    D is computed in EXACT integers (d(v) = |cumRef(v)*n_cur -
    cumCur(v)*n_ref|), argmax ties toward the smallest value — the
    `q_quality_drift_ks` math over a two-frame union.

    Scale shape: one union scan to per-value counts (bounded by value
    cardinality), one ordered window over that aggregate, two one-row
    broadcasts."""
    labeled = ref.select(
        F.col(value_col).alias("v"), F.lit("a").alias("split")
    ).unionByName(
        cur.select(F.col(value_col).alias("v"), F.lit("b").alias("split"))
    )
    per_v = labeled.groupBy("v").agg(
        F.sum(F.when(F.col("split") == "a", 1).otherwise(0)).alias("ca"),
        F.sum(F.when(F.col("split") == "b", 1).otherwise(0)).alias("cb"),
    )
    wcum = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = per_v.groupBy().agg(F.sum("ca").alias("n_ref"), F.sum("cb").alias("n_cur"))
    scored = (
        per_v.select(
            "v",
            F.sum("ca").over(wcum).alias("cuma"),
            F.sum("cb").over(wcum).alias("cumb"),
        )
        .crossJoin(F.broadcast(tot))
        .select(
            "v",
            "n_ref",
            "n_cur",
            F.abs(
                F.col("cuma") * F.col("n_cur") - F.col("cumb") * F.col("n_ref")
            ).alias("d"),
        )
    )
    kmax = scored.groupBy().agg(F.max("d").alias("ks_scaled"))
    return (
        scored.join(F.broadcast(kmax), scored["d"] == kmax["ks_scaled"])
        .groupBy("ks_scaled", "n_ref", "n_cur")
        .agg(F.min("v").alias("ks_at_value"))
        .select(
            "n_ref",
            "n_cur",
            "ks_at_value",
            "ks_scaled",
            F.floor(
                F.col("ks_scaled").cast("double")
                / (F.col("n_ref") * F.col("n_cur"))
                * F.lit(1000000.0)
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("ks_micro"),
        )
    )


#: Efraimidis-Spirakis weighted sample-without-replacement size
SAMPLE_ES_K = 100


def q_sample_weighted_es(spark: SparkSession, sf: str) -> DataFrame:
    """Weighted sampling WITHOUT replacement via the exponential race
    (Efraimidis & Spirakis 2006, the -ln(u)/w formulation): every doc
    draws an exponential arrival time with rate = its weight (n_chars),
    and the SAMPLE_ES_K earliest arrivals win — the one-pass, fully
    parallel way to take an exact-size weighted sample at any scale,
    complementing `sample_weighted_bernoulli` (which hits the weighted
    RATE but only the EXPECTED size).

    Determinism: u = (salted-hash ppm + 0.5) / 1e6 — exact same double in
    both engines; the key -ln(u)/w uses only ln on identical doubles (the
    surprisal scorers' established cross-engine primitive; the textbook
    u^(1/w) form needs pow(), which is NOT portable — the reason
    sample_weighted_bernoulli's docstring avoided ES until now), then
    quantizes to integer NANOS before ranking so the selection boundary
    compares integers. (doc_id tiebreak makes the cut a total order.)

    Scale shape: key assignment is pure map-side; the global top-k is
    TakeOrderedAndProject (per-partition heaps merged at the driver) —
    the corpus is never sorted or shuffled."""
    docs = load(spark, sf, "documents").where(F.col("n_chars") > 0)
    return (
        with_es_key(docs)
        .orderBy(F.col("es_key_nano").asc(), F.col("doc_id").asc())
        .limit(SAMPLE_ES_K)
        .select("doc_id", "lang", "n_chars", "es_key_nano")
    )


def with_es_key(
    docs: DataFrame, weight_col: str = "n_chars", *, id_col: str = "doc_id"
) -> DataFrame:
    """Attach the deterministic Efraimidis-Spirakis arrival key (integer
    nanos) to any frame with doc_id + a positive weight column — shared by
    the batch query and the streaming sample sink so both race with
    BIT-IDENTICAL keys (the key is a pure function of (doc_id, weight),
    which is what makes the streaming merge idempotent)."""
    h_ppm = portable_hash(
        F.concat(F.col(id_col).cast("string"), F.lit(SAMPLE_SALT))
    ) % 1_000_000
    key_nano = F.expr(
        "cast(floor(-ln((hp + 0.5d) / 1000000.0d)"
        f" / cast({weight_col} as double) * 1e9 + 0.5) as bigint)"
    )
    return docs.withColumn("hp", h_ppm.cast("double")).withColumn(
        "es_key_nano", key_nano
    )


def weighted_sample_es(
    df: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    weight_col: str = "n_chars",
) -> DataFrame:
    """Exact-size-k weighted sample WITHOUT replacement of ANY frame via
    the deterministic Efraimidis-Spirakis exponential race (semantics and
    scale notes in `q_sample_weighted_es`): the k earliest arrivals win,
    ties broken by id. Rows with non-positive weight are excluded. Returns
    the winning input rows with the race key attached; the corpus is never
    sorted or shuffled (per-partition top-k heaps merged at the driver)."""
    return (
        with_es_key(df.where(F.col(weight_col) > 0), weight_col, id_col=id_col)
        .orderBy(F.col("es_key_nano").asc(), F.col(id_col).asc())
        .limit(k)
        .drop("hp")
    )


#: stratified exponential race: exact sample size per language stratum
SAMPLE_ES_K_PER_LANG = 20


def q_sample_weighted_es_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Stratified exact-k weighted sampling: the Efraimidis-Spirakis race
    run independently per language — exactly SAMPLE_ES_K_PER_LANG docs
    per stratum, each stratum weighted by n_chars within itself. The
    composition a balanced multilingual training mix actually needs:
    `sample_weighted_es` alone lets a dominant language crowd the sample,
    `sample_temperature` rebalances rates but not exact counts; this
    gives both (exact count AND weighted within-stratum selection).

    Determinism: the identical with_es_key arrival keys as the global
    race (a doc's key does not depend on its stratum), ranked by the
    (es_key_nano, doc_id) total order within each lang partition.

    Scale shape: key assignment is map-side; the per-stratum cut is a
    rank filter Catalyst rewrites to WindowGroupLimit with a PARTIAL
    pass below the exchange — each task forwards at most k rows per
    stratum, so the shuffle carries O(k x strata x tasks), never the
    corpus (the Adamic-Adar hub pre-cap shape, reused as a sampler)."""
    docs = load(spark, sf, "documents").where(F.col("n_chars") > 0)
    w = Window.partitionBy("lang").orderBy(
        F.col("es_key_nano").asc(), F.col("doc_id").asc()
    )
    return (
        with_es_key(docs)
        .withColumn("lang_rank", F.row_number().over(w))
        .where(F.col("lang_rank") <= SAMPLE_ES_K_PER_LANG)
        .select("doc_id", "lang", "n_chars", "es_key_nano", "lang_rank")
    )


QUERIES = {
    "shuffle_to_shards": q_shuffle_to_shards,
    "pack_token_shards": q_pack_token_shards,
    "split_train_val_test": q_split_train_val_test,
    "split_leakproof_by_source": q_split_leakproof_by_source,
    "sample_temperature": q_sample_temperature,
    "sample_stratified": q_sample_stratified,
    "sample_fixed_k": q_sample_fixed_k,
    "outlier_filter_quantile": q_outlier_filter_quantile,
    "lang_temperature_weights": q_lang_temperature_weights,
    # appended last (new r5 surface) so the existing driver-checked prefix
    # composition shifts as little as possible
    "sample_source_quota": q_sample_source_quota,
    "sample_weighted_bernoulli": q_sample_weighted_bernoulli,
    # r6: distribution-drift audit between the deterministic splits
    "quality_drift_psi": q_quality_drift_psi,
    # r7 continuation: median/MAD robust outlier census
    "outlier_robust_mad": q_outlier_robust_mad,
    # r7 continuation: two-sample Kolmogorov-Smirnov drift audit
    "quality_drift_ks": q_quality_drift_ks,
    # r8: exact-size weighted sample via the exponential race
    "sample_weighted_es": q_sample_weighted_es,
    # r9: per-language exact-k stratified exponential race
    "sample_weighted_es_stratified": q_sample_weighted_es_stratified,
}

ORACLES = {
    "shuffle_to_shards": f"""
        WITH keyed AS (
            SELECT doc_id,
                   {portable_hash_sql_duckdb(f"('{SHUFFLE_SALT}' || doc_id::VARCHAR)")} AS shuffle_key
            FROM documents
        )
        SELECT doc_id, shuffle_key,
               (shuffle_key % {N_SHUFFLE_SHARDS})::INT AS shard_id,
               row_number() OVER (PARTITION BY shuffle_key % {N_SHUFFLE_SHARDS}
                                  ORDER BY shuffle_key, doc_id)::INT AS pos_in_shard
        FROM keyed
    """,
    "pack_token_shards": f"""
        WITH t AS (
            SELECT doc_id, lang,
                   len(regexp_extract_all(text, '[a-zA-Z0-9]+'))::INT AS n_tokens
            FROM documents
        ), c AS (
            SELECT lang, doc_id, n_tokens,
                   sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)::BIGINT AS cum_tokens
            FROM t
        )
        SELECT lang, doc_id, n_tokens, cum_tokens,
               ((cum_tokens - 1) // {SHARD_TOKEN_BUDGET} + 1)::INT AS shard_id
        FROM c
    """,
    "quality_drift_psi": f"""
        WITH binned AS (
            SELECT least({PSI_N_BINS - 1}, length(text) // {PSI_BIN_WIDTH})::INT AS len_bin,
                   CASE WHEN {_SPLIT_BUCKET} < {TRAIN_PCT} THEN 'train'
                        WHEN {_SPLIT_BUCKET} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                        ELSE 'test' END AS split
            FROM documents
        ), counts AS (
            SELECT len_bin,
                   sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT AS n_train,
                   sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)::BIGINT AS n_val
            FROM binned WHERE split != 'test'
            GROUP BY len_bin
        ), tot AS (
            SELECT sum(n_train)::BIGINT AS tot_train, sum(n_val)::BIGINT AS tot_val
            FROM counts
        )
        SELECT len_bin, n_train, n_val,
               round((n_train + 1)::DOUBLE / (tot_train + {PSI_N_BINS}), 6) AS train_rate,
               round((n_val + 1)::DOUBLE / (tot_val + {PSI_N_BINS}), 6) AS val_rate,
               floor(((n_train + 1)::DOUBLE / (tot_train + {PSI_N_BINS})
                      - (n_val + 1)::DOUBLE / (tot_val + {PSI_N_BINS}))
                     * ln(((n_train + 1)::DOUBLE / (tot_train + {PSI_N_BINS}))
                          / ((n_val + 1)::DOUBLE / (tot_val + {PSI_N_BINS})))
                     * 1000000 + 0.5)::BIGINT AS psi_micro
        FROM counts CROSS JOIN tot
    """,
    "split_train_val_test": f"""
        SELECT doc_id, lang,
               CASE WHEN {_SPLIT_BUCKET} < {TRAIN_PCT} THEN 'train'
                    WHEN {_SPLIT_BUCKET} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "sample_temperature": f"""
        WITH per_lang AS (
            SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY lang
        ), total AS (
            SELECT sum(n_docs)::BIGINT AS n_total, sum(sqrt(n_docs::DOUBLE)) AS z
            FROM per_lang
        ), rated AS (
            SELECT lang,
                   (sqrt(n_docs::DOUBLE) / z) / (n_docs / n_total) AS ratio
            FROM per_lang CROSS JOIN total
        ), rates AS (
            SELECT lang, ratio / (SELECT max(ratio) FROM rated) AS keep_rate
            FROM rated
        )
        SELECT d.doc_id, d.lang, round(r.keep_rate, 6) AS keep_rate
        FROM documents d JOIN rates r USING (lang)
        WHERE ({portable_hash_sql_duckdb(f"doc_id::VARCHAR || '{SAMPLE_SALT}'")} % 10000)
              < r.keep_rate * 10000
    """,
    "split_leakproof_by_source": f"""
        SELECT doc_id, source,
               CASE WHEN {_SRC_SPLIT_BUCKET} < {TRAIN_PCT} THEN 'train'
                    WHEN {_SRC_SPLIT_BUCKET} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
    """,
    "sample_stratified": f"""
        SELECT doc_id, lang, source FROM documents
        WHERE {_SAMPLE_BUCKET} < {_RATE_CASE}
    """,
    "sample_fixed_k": f"""
        SELECT doc_id, lang FROM documents
        ORDER BY {_SAMPLE_HASH}, doc_id LIMIT {FIXED_K}
    """,
    "outlier_filter_quantile": f"""
        WITH bounds AS (
            SELECT lang, quantile_cont(n_chars, {Q_LO}) AS lo,
                         quantile_cont(n_chars, {Q_HI}) AS hi
            FROM documents GROUP BY lang
        )
        SELECT doc_id, d.lang, n_chars
        FROM documents d JOIN bounds b ON d.lang = b.lang
        WHERE n_chars >= lo AND n_chars <= hi
    """,
    "lang_temperature_weights": """
        WITH per_lang AS (
            SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang
        ), tot AS (
            SELECT sum(n_docs) AS n_total, sum(sqrt(n_docs::DOUBLE)) AS z
            FROM per_lang
        )
        SELECT lang, n_docs,
               round(n_docs / n_total, 6) AS share,
               round(sqrt(n_docs::DOUBLE) / z, 6) AS weight
        FROM per_lang CROSS JOIN tot
    """,
    "sample_source_quota": f"""
        WITH keyed AS (
            SELECT doc_id, source,
                   {_SAMPLE_HASH} AS h
            FROM documents
        ), ranked AS (
            SELECT doc_id, source,
                   row_number() OVER (PARTITION BY source ORDER BY h, doc_id)::INT
                       AS quota_rank
            FROM keyed
        )
        SELECT doc_id, source, quota_rank FROM ranked
        WHERE quota_rank <= {SOURCE_QUOTA}
    """,
    "sample_weighted_bernoulli": f"""
        WITH tot AS (
            SELECT sum(n_chars)::DOUBLE AS total_chars FROM documents
        )
        SELECT doc_id, lang, n_chars,
               least(1000000.0, floor(n_chars::DOUBLE * {float(WEIGHTED_K * 1_000_000)!r}
                                      / total_chars))::BIGINT AS keep_rate_ppm
        FROM documents CROSS JOIN tot
        WHERE ({_SAMPLE_HASH} % 1000000)
              < least(1000000.0, floor(n_chars::DOUBLE * {float(WEIGHTED_K * 1_000_000)!r}
                                       / total_chars))::BIGINT
    """,
    # identical lower-median selection by row_number (never interpolated
    # percentiles) and the all-integer modified-z outlier test
    "outlier_robust_mad": f"""
        WITH ev AS (
            SELECT event_id, event_type,
                   CAST(round(value * 100, 0) AS BIGINT) AS cents
            FROM events WHERE value IS NOT NULL
        ), counts AS (
            SELECT event_type, count(*) AS n FROM ev GROUP BY 1
        ), med AS (
            SELECT event_type, cents AS median_cents
            FROM (
                SELECT event_type, cents,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY cents, event_id) AS rn
                FROM ev) r JOIN counts USING (event_type)
            WHERE rn = (n + 1) // 2
        ), devs AS (
            SELECT e.event_id, e.event_type, m.median_cents,
                   abs(e.cents - m.median_cents) AS dev
            FROM ev e JOIN med m USING (event_type)
        ), mad AS (
            SELECT event_type, dev AS mad_cents
            FROM (
                SELECT event_type, dev,
                       row_number() OVER (PARTITION BY event_type
                                          ORDER BY dev, event_id) AS rn
                FROM devs) r JOIN counts USING (event_type)
            WHERE rn = (n + 1) // 2
        )
        SELECT event_type, count(*)::BIGINT AS n,
               min(median_cents) AS median_cents,
               min(mad_cents) AS mad_cents,
               sum(CASE WHEN mad_cents > 0
                         AND dev * {MAD_Z_NUM} > {MAD_Z_THRESH} * mad_cents
                        THEN 1 ELSE 0 END)::BIGINT AS n_outliers
        FROM devs JOIN mad USING (event_type)
        GROUP BY event_type
        ORDER BY event_type
    """,
    # integer-scaled two-sample KS between the deterministic splits
    "quality_drift_ks": f"""
        WITH labeled AS (
            SELECT n_chars AS v,
                   CASE WHEN {_SPLIT_BUCKET} < {TRAIN_PCT} THEN 'train'
                        WHEN {_SPLIT_BUCKET} < {TRAIN_PCT + VAL_PCT} THEN 'val'
                   END AS split
            FROM documents
        ), per_v AS (
            SELECT v,
                   sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END)::BIGINT AS ca,
                   sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END)::BIGINT AS cb
            FROM labeled WHERE split IS NOT NULL GROUP BY 1
        ), tot AS (
            SELECT sum(ca)::BIGINT AS n_a, sum(cb)::BIGINT AS n_b FROM per_v
        ), scored AS (
            SELECT v, t.n_a, t.n_b,
                   abs((sum(ca) OVER w)::BIGINT * t.n_b
                       - (sum(cb) OVER w)::BIGINT * t.n_a) AS d
            FROM per_v CROSS JOIN tot t
            WINDOW w AS (ORDER BY v
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        ), kmax AS (
            SELECT max(d) AS ks_scaled FROM scored
        )
        SELECT 'train' AS split_a, 'val' AS split_b, n_a, n_b,
               min(v) AS ks_at_n_chars, ks_scaled,
               floor(ks_scaled::DOUBLE / (n_a * n_b) * 1000000.0 + 0.5)::BIGINT
                 AS ks_micro
        FROM scored JOIN kmax ON scored.d = kmax.ks_scaled
        GROUP BY n_a, n_b, ks_scaled
    """,
}


ORACLES["sample_weighted_es"] = f"""
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               floor(-ln((({_SAMPLE_HASH} % 1000000)::DOUBLE + 0.5)
                         / 1000000.0)
                     / n_chars::DOUBLE * 1e9 + 0.5)::BIGINT AS es_key_nano
        FROM documents WHERE n_chars > 0
    )
    SELECT doc_id, lang, n_chars, es_key_nano
    FROM keyed ORDER BY es_key_nano ASC, doc_id ASC LIMIT {SAMPLE_ES_K}
"""

ORACLES["sample_weighted_es_stratified"] = f"""
    WITH keyed AS (
        SELECT doc_id, lang, n_chars,
               floor(-ln((({_SAMPLE_HASH} % 1000000)::DOUBLE + 0.5)
                         / 1000000.0)
                     / n_chars::DOUBLE * 1e9 + 0.5)::BIGINT AS es_key_nano
        FROM documents WHERE n_chars > 0
    ), ranked AS (
        SELECT *, row_number() OVER (PARTITION BY lang
                      ORDER BY es_key_nano ASC, doc_id ASC)::INT AS lang_rank
        FROM keyed
    )
    SELECT doc_id, lang, n_chars, es_key_nano, lang_rank
    FROM ranked WHERE lang_rank <= {SAMPLE_ES_K_PER_LANG}
"""
