"""Independent value pins for the r9 operators, beyond the DuckDB oracle:
pure-Python reference implementations (the test_r8_reference discipline)
so a formula transcribed identically into BOTH engines cannot hide a
shared mistake.
"""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators.analytics import (
    CHI2_CRIT_MICRO,
    q_abtest_chi_square,
)
from emr_flink_example_spark.operators.sampling import (
    SAMPLE_ES_K_PER_LANG,
    SAMPLE_SALT,
    q_sample_weighted_es,
    q_sample_weighted_es_stratified,
)
from emr_flink_example_spark.operators.textstats import (
    MI_BUCKET_MAX,
    MI_BUCKET_WIDTH,
    TOKEN_RE,
    ZIPF_TOP_RANKS,
    q_quality_lang_mutual_info,
    q_vocab_zipf_slope,
)

from conftest import SF_DIR


def _docs(spark):
    return load(spark, SF_DIR, "documents").select(
        "doc_id", "lang", "n_chars", "text"
    ).collect()


def test_chi_square_matches_pure_python(spark):
    rows = (
        load(spark, SF_DIR, "events")
        .select("user_id", "event_type")
        .collect()
    )
    conv: dict[int, int] = {}
    for r in rows:
        conv[r.user_id] = max(
            conv.get(r.user_id, 0), 1 if r.event_type == "purchase" else 0
        )
    a = sum(1 for u, c in conv.items() if u % 2 == 0 and c == 1)
    b = sum(1 for u, c in conv.items() if u % 2 == 0 and c == 0)
    c = sum(1 for u, c_ in conv.items() if u % 2 == 1 and c_ == 1)
    d = sum(1 for u, c_ in conv.items() if u % 2 == 1 and c_ == 0)
    n = a + b + c + d
    got = q_abtest_chi_square(spark, SF_DIR).first()
    assert (got.n_conv_a, got.n_nonconv_a, got.n_conv_b, got.n_nonconv_b) == (
        a, b, c, d,
    )
    if min(a + b, c + d, a + c, b + d) == 0:
        # degenerate margin (the sf0.001 fixture: EVERY user converts, so
        # b + d == 0): the builder's guard must yield NULL/false, never a
        # division error or a wrapped value
        assert got.chi2_micro is None
        assert got.significant is False
        return
    det = float(a) * float(d) - float(b) * float(c)
    chi2 = (
        float(n) * det * det
        / (float(a + b) * float(c + d) * float(a + c) * float(b + d))
    )
    assert got.chi2_micro == math.floor(chi2 * 1000000.0 + 0.5)
    assert got.significant == (got.chi2_micro >= CHI2_CRIT_MICRO)
    # 2x2 identity: chi2 == z^2 of the two-proportion z-test
    p1, p2, p = a / (a + b), c / (c + d), (a + c) / n
    z = (p1 - p2) / math.sqrt(p * (1 - p) * (1 / (a + b) + 1 / (c + d)))
    assert abs(chi2 - z * z) < 1e-6 * chi2


def test_chi_square_nondegenerate_margins_synthetic(spark, tmp_path):
    """The fixture's margins are degenerate (see above), so also pin the
    LIVE formula on a synthetic events table with all four cells
    populated."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    # 400 users; arm A converts 60%, arm B 40%
    rows = []
    eid = 0
    for u in range(400):
        converts = (u % 10) < (6 if u % 2 == 0 else 4)
        rows.append((eid, u, "purchase" if converts else "view"))
        eid += 1
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "ts": pa.array([0] * len(rows), type=pa.timestamp("us")),
                "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "value": pa.array([1.0] * len(rows), type=pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        tmp_path / "events.parquet",
    )
    got = q_abtest_chi_square(spark, str(tmp_path)).first()
    a, b, c, d = 120, 80, 80, 120
    assert (got.n_conv_a, got.n_nonconv_a, got.n_conv_b, got.n_nonconv_b) == (
        a, b, c, d,
    )
    det = float(a) * float(d) - float(b) * float(c)
    chi2 = 400.0 * det * det / (200.0 * 200.0 * 200.0 * 200.0)
    assert got.chi2_micro == math.floor(chi2 * 1000000.0 + 0.5)
    assert got.significant is True  # 16.0 >> 3.84


def test_zipf_slope_matches_pure_python(spark):
    texts = _docs(spark)
    cnt: Counter = Counter()
    for r in texts:
        cnt.update(re.findall(TOKEN_RE, r.text))
    top = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:ZIPF_TOP_RANKS]
    xs = [math.floor(math.log(i + 1) * 1000 + 0.5) for i in range(len(top))]
    ys = [math.floor(math.log(c) * 1000 + 0.5) for _, c in top]
    r_ = len(top)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    slope = float(r_ * sxy - sx * sy) / float(r_ * sxx - sx * sx)
    got = q_vocab_zipf_slope(spark, SF_DIR).first()
    assert got.n_ranks == r_
    assert got.zipf_slope_micro == math.floor(slope * 1000000 + 0.5)
    assert got.zipf_intercept_micro == math.floor(
        (float(sy) - slope * float(sx)) / float(r_) / 1000.0 * 1000000.0 + 0.5
    )
    # sanity: the head law slope is negative (the synthetic fixture text
    # is flatter than natural language — ~-0.18 — but still decreasing)
    assert -2_500_000 < got.zipf_slope_micro < 0


def test_mutual_info_matches_pure_python(spark):
    docs = _docs(spark)
    joint: Counter = Counter(
        (r.lang, min(r.n_chars // MI_BUCKET_WIDTH, MI_BUCKET_MAX)) for r in docs
    )
    n_x: Counter = Counter()
    n_y: Counter = Counter()
    for (lang, b), n in joint.items():
        n_x[lang] += n
        n_y[b] += n
    n_tot = sum(joint.values())
    got = {
        (r.lang, r.chars_bucket): r
        for r in q_quality_lang_mutual_info(spark, SF_DIR).collect()
    }
    assert set(got) == set(joint)
    mi_total = 0.0
    for (lang, b), n in joint.items():
        pmi = (
            math.log(n) + math.log(n_tot) - math.log(n_x[lang]) - math.log(n_y[b])
        )
        r = got[(lang, b)]
        assert (r.n_xy, r.n_x, r.n_y) == (n, n_x[lang], n_y[b])
        assert r.pmi_micronats == math.floor(pmi * 1000000 + 0.5)
        assert r.mi_term_micronats == math.floor(
            n / n_tot * pmi * 1000000.0 + 0.5
        )
        mi_total += n / n_tot * pmi
    # MI is non-negative up to per-cell rounding (<= 0.5 micro each)
    assert sum(r.mi_term_micronats for r in got.values()) >= -len(got)
    assert mi_total >= -1e-12


def _es_key_nano(doc_id: int, n_chars: int) -> int:
    h = int(hashlib.md5(f"{doc_id}{SAMPLE_SALT}".encode()).hexdigest()[:15], 16)
    u = (float(h % 1_000_000) + 0.5) / 1000000.0
    return math.floor(-math.log(u) / float(n_chars) * 1e9 + 0.5)


def test_stratified_es_matches_pure_python(spark):
    docs = [
        (r.doc_id, r.lang, r.n_chars)
        for r in _docs(spark)
        if r.n_chars > 0
    ]
    by_lang: dict[str, list] = {}
    for doc_id, lang, n_chars in docs:
        by_lang.setdefault(lang, []).append(
            (_es_key_nano(doc_id, n_chars), doc_id, n_chars)
        )
    expect = set()
    for lang, keyed in by_lang.items():
        for rank, (k, doc_id, n_chars) in enumerate(
            sorted(keyed)[:SAMPLE_ES_K_PER_LANG], start=1
        ):
            expect.add((doc_id, lang, n_chars, k, rank))
    got = {
        (r.doc_id, r.lang, r.n_chars, r.es_key_nano, r.lang_rank)
        for r in q_sample_weighted_es_stratified(spark, SF_DIR).collect()
    }
    assert got == expect
    # the stratified race reuses the global race's keys verbatim
    global_keys = {
        r.doc_id: r.es_key_nano
        for r in q_sample_weighted_es(spark, SF_DIR).collect()
    }
    for doc_id, _, _, k, _ in expect:
        if doc_id in global_keys:
            assert global_keys[doc_id] == k


def test_anisotropy_matches_pure_python_and_identity(spark):
    """One-pass anisotropy == the micro-quantized pure-Python computation,
    AND the sum-vector identity == the literal O(n^2) pairwise mean over
    the quantized unit vectors (on a 40-vector subset, where the exhaustive
    check is cheap) up to the quantization the metric is defined over."""
    from emr_flink_example_spark.operators.similarity import (
        q_embedding_anisotropy,
    )

    rows = [
        (r.vec_id, list(r.embedding))
        for r in load(spark, SF_DIR, "embeddings").collect()
        if any(x != 0.0 for x in r.embedding)
    ]
    S = [0] * 64
    for _, e in rows:
        nrm = math.sqrt(sum(float(x) * float(x) for x in e))
        for d, x in enumerate(e):
            S[d] += math.floor(float(x) / nrm * 1e6 + 0.5)
    n = len(rows)
    ssq = 0.0
    for s in S:
        ssq += (s / 1e6) * (s / 1e6)
    expect = math.floor((ssq - n) / (n * (n - 1)) * 1e6 + 0.5)
    got = q_embedding_anisotropy(spark, SF_DIR).first()
    assert (got.n_vectors, got.mean_pairwise_cos_micro) == (n, expect)
    # identity check against the literal pairwise mean on a subset
    sub = rows[:40]
    qs = []
    for _, e in sub:
        nrm = math.sqrt(sum(float(x) * float(x) for x in e))
        qs.append([math.floor(float(x) / nrm * 1e6 + 0.5) / 1e6 for x in e])
    m = len(qs)
    pair_mean = sum(
        sum(a * b for a, b in zip(qs[i], qs[j]))
        for i in range(m)
        for j in range(m)
        if i != j
    ) / (m * (m - 1))
    Ssub = [sum(q[d] for q in qs) for d in range(64)]
    ident = (sum(s * s for s in Ssub) - sum(
        sum(a * a for a in q) for q in qs
    )) / (m * (m - 1))
    # ||q_i||^2 is 1 up to quantization; the identity itself is exact
    assert abs(pair_mean - ident) < 1e-9


def _pctl(sorted_vals, p):
    """Linear-interpolation percentile (Spark `percentile` / DuckDB
    quantile_cont definition): pos = p*(n-1), lerp between neighbors."""
    n = len(sorted_vals)
    pos = p * (n - 1)
    lo = int(math.floor(pos))
    hi = min(lo + 1, n - 1)
    frac = pos - lo
    return sorted_vals[lo] + frac * (sorted_vals[hi] - sorted_vals[lo])


def test_rfm_segmentation_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        q_event_rfm_segmentation,
    )

    rows = (
        load(spark, SF_DIR, "events")
        .where("event_type = 'purchase'")
        .select("user_id", "ts", "value")
        .collect()
    )
    anchor = max(r.ts.date() for r in rows)
    users: dict[int, list] = {}
    for r in rows:
        u = users.setdefault(r.user_id, [10**9, 0, 0])
        u[0] = min(u[0], (anchor - r.ts.date()).days)
        u[1] += 1
        u[2] += math.floor(r.value * 100 + 0.5)
    cuts = {
        i: [_pctl(sorted(u[i] for u in users.values()), p) for p in (0.2, 0.4, 0.6, 0.8)]
        for i in range(3)
    }
    got = {r.user_id: r for r in q_event_rfm_segmentation(spark, SF_DIR).collect()}
    assert set(got) == set(users)
    for uid, (rec, freq, mon) in users.items():
        g = got[uid]
        assert (g.recency_days, g.n_purchases, g.monetary_cents) == (rec, freq, mon)
        r_sc = 5 - sum(rec > c for c in cuts[0])
        f_sc = 1 + sum(freq > c for c in cuts[1])
        m_sc = 1 + sum(mon > c for c in cuts[2])
        assert (g.r_score, g.f_score, g.m_score) == (r_sc, f_sc, m_sc)
        assert g.segment == f"{r_sc}{f_sc}{m_sc}"
        assert 1 <= r_sc <= 5 and 1 <= f_sc <= 5 and 1 <= m_sc <= 5


def test_pareto_abc_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        ABC_A_PCT,
        ABC_B_PCT,
        q_pareto_abc_analysis,
    )

    li = (
        load(spark, SF_DIR, "lineitem")
        .select("l_partkey", "l_extendedprice", "l_discount")
        .collect()
    )
    rev: dict[int, int] = {}
    for r in li:
        rev[r.l_partkey] = rev.get(r.l_partkey, 0) + math.floor(
            r.l_extendedprice * 100 + 0.5
        ) * (100 - math.floor(r.l_discount * 100 + 0.5))
    total = sum(rev.values())
    cum = 0
    expect = {}
    for pk, r4 in sorted(rev.items(), key=lambda kv: (-kv[1], kv[0])):
        cum += r4
        cls = "A" if cum * 100 <= total * ABC_A_PCT else (
            "B" if cum * 100 <= total * ABC_B_PCT else "C"
        )
        expect[pk] = (r4 // 100, cum // 100, cls)
    got = {
        r.l_partkey: (r.revenue_cents, r.cum_revenue_cents, r.abc_class)
        for r in q_pareto_abc_analysis(spark, SF_DIR).collect()
    }
    assert got == expect
    # the Pareto shape: class A is a strict minority of parts at the
    # fixture's revenue skew... or at least never the whole catalog
    n_a = sum(1 for v in expect.values() if v[2] == "A")
    assert 0 < n_a < len(expect)


def test_minhash_containment_identity_and_bounds(spark):
    """Containment estimates derive EXACTLY from (est_jaccard,
    n_shingles_a, n_shingles_b) by the j/(1+j)*(|A|+|B|) intersection
    formula — recompute per pair in Python and pin; plus the analytic
    bound C <= 1 within estimator error and the directed asymmetry
    (smaller side always has the larger containment)."""
    from emr_flink_example_spark.operators.analytics import (
        q_sketch_minhash_containment,
    )

    rows = q_sketch_minhash_containment(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        est_int = (
            r.est_jaccard / (1.0 + r.est_jaccard)
            * (float(r.n_shingles_a) + float(r.n_shingles_b))
        )
        ca = math.floor(est_int / float(r.n_shingles_a) * 1e6 + 0.5)
        cb = math.floor(est_int / float(r.n_shingles_b) * 1e6 + 0.5)
        assert (r.est_containment_a_micro, r.est_containment_b_micro) == (ca, cb)
        # directed: the smaller set's containment is >= the larger set's
        if r.n_shingles_a <= r.n_shingles_b:
            assert r.est_containment_a_micro >= r.est_containment_b_micro
        else:
            assert r.est_containment_b_micro >= r.est_containment_a_micro
        # j = 1 (identical sets) must give exactly containment 1.0 when
        # sizes agree: j/(1+j)*(2n)/n = 1
        if r.est_jaccard == 1.0 and r.n_shingles_a == r.n_shingles_b:
            assert r.est_containment_a_micro == 1_000_000


def test_mrr_matches_pure_python(spark):
    from emr_flink_example_spark.operators.textstats import (
        MRR_K,
        MRR_QUERIES,
        q_retrieval_mrr,
    )

    docs = _docs(spark)
    toks = {r.doc_id: re.findall(TOKEN_RE, r.text) for r in docs}
    expect = {}
    rrs = []
    for qi, terms in enumerate(MRR_QUERIES):
        per_doc = {}
        for did, ts in toks.items():
            tf = sum(1 for t in ts if t in terms)
            if tf:
                per_doc[did] = (tf, len({t for t in ts if t in terms}))
        ranked = sorted(per_doc.items(), key=lambda kv: (-kv[1][0], kv[0]))
        first = None
        for rank, (did, (tf, nhit)) in enumerate(ranked[:MRR_K], start=1):
            if nhit == len(terms):
                first = rank
                break
        rr = (2_000_000 + first) // (2 * first) if first else 0
        expect[qi] = (first, rr)
        rrs.append(rr)
    mrr = (2 * sum(rrs) + len(rrs)) // (2 * len(rrs))
    got = {r.query_id: r for r in q_retrieval_mrr(spark, SF_DIR).collect()}
    assert set(got) == set(expect)
    for qi, (first, rr) in expect.items():
        g = got[qi]
        assert (g.first_rel_rank, g.rr_micro, g.mrr_micro) == (first, rr, mrr)
