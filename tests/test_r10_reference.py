"""Independent value pins for the r10 operators (Kruskal-Wallis, ROC AUC,
path trigrams, Pareto skyline): pure-Python reference implementations so a
formula transcribed identically into BOTH engines cannot hide a shared
mistake (the test_r8/r9_reference discipline).
"""

from __future__ import annotations

import math
from collections import Counter

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators.analytics import (
    PATH_TOPK,
    q_events_path_trigrams,
    q_pareto_skyline_users,
    q_stats_kruskal_wallis,
    q_stats_roc_auc,
)

from conftest import SF_DIR


def _avg_ranks_doubled(values: list[int]) -> dict[int, int]:
    """value -> doubled average rank (2 * mean rank of its tie block)."""
    out: dict[int, int] = {}
    cum = 0
    for v, t in sorted(Counter(values).items()):
        out[v] = 2 * cum + t + 1
        cum += t
    return out


def test_kruskal_wallis_matches_pure_python(spark):
    rows = load(spark, SF_DIR, "events").select("event_type", "value").collect()
    groups: dict[str, list[int]] = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append(
            math.floor(r.value * 1000 + 0.5)
        )
    all_vals = [v for vs in groups.values() for v in vs]
    r2 = _avg_ranks_doubled(all_vals)
    n = len(all_vals)
    k = len(groups)
    tie3 = sum(t**3 - t for t in Counter(all_vals).values())
    sum_s2sq_over_n = sum(
        float(sum(r2[v] for v in vs)) ** 2 / len(vs) for vs in groups.values()
    )
    h = 3.0 / (n * (n + 1.0)) * sum_s2sq_over_n - 3.0 * (n + 1.0)
    h_adj = h / (1.0 - tie3 / (float(n) ** 3 - n))
    got = q_stats_kruskal_wallis(spark, SF_DIR).first()
    assert got.n_total == n
    assert got.k_groups == k
    assert got.headroom_ok is True
    assert got.tie3 == tie3
    assert got.h_micro == math.floor(h_adj * 1000000.0 + 0.5)
    # H of a rank test is non-negative up to float fuzz
    assert got.h_micro >= -1


def test_kruskal_reduces_to_mann_whitney_z_squared(spark):
    """On exactly TWO groups, Kruskal-Wallis H equals the squared
    normal-approximation z of the Mann-Whitney U test (tie-corrected) —
    the standard consistency identity between the two rank tests."""
    rows = load(spark, SF_DIR, "events").select("event_type", "value").collect()
    # restrict to two event types deterministically (lexicographic first two)
    types = sorted({r.event_type for r in rows})[:2]
    groups: dict[str, list[int]] = {t: [] for t in types}
    for r in rows:
        if r.event_type in types:
            groups[r.event_type].append(math.floor(r.value * 1000 + 0.5))
    all_vals = [v for vs in groups.values() for v in vs]
    r2 = _avg_ranks_doubled(all_vals)
    n = len(all_vals)
    n1 = len(groups[types[0]])
    n2 = n - n1
    tie3 = sum(t**3 - t for t in Counter(all_vals).values())
    # H (tie-corrected) computed as in the operator
    sum_s2sq_over_n = sum(
        float(sum(r2[v] for v in vs)) ** 2 / len(vs) for vs in groups.values()
    )
    h = 3.0 / (n * (n + 1.0)) * sum_s2sq_over_n - 3.0 * (n + 1.0)
    h_adj = h / (1.0 - tie3 / (float(n) ** 3 - n))
    # Mann-Whitney z^2 with tie-corrected variance
    r1 = sum(r2[v] for v in groups[types[0]]) / 2.0
    u1 = r1 - n1 * (n1 + 1) / 2.0
    mu = n1 * n2 / 2.0
    var = (n1 * n2 / 12.0) * ((n + 1) - tie3 / (n * (n - 1.0)))
    z2 = (u1 - mu) ** 2 / var
    assert abs(h_adj - z2) < 1e-6 * max(1.0, abs(z2))


def test_roc_auc_matches_pure_python(spark):
    rows = load(spark, SF_DIR, "documents").select("n_chars", "lang").collect()
    scores = [r.n_chars for r in rows]
    labels = [1 if r.lang == "en" else 0 for r in rows]
    r2 = _avg_ranks_doubled(scores)
    n_pos = sum(labels)
    n_neg = len(labels) - n_pos
    s2_pos = sum(r2[s] for s, y in zip(scores, labels) if y == 1)
    auc = (s2_pos - n_pos * (n_pos + 1.0)) / (2.0 * n_pos * n_neg)
    got = q_stats_roc_auc(spark, SF_DIR).first()
    assert got.n_pos == n_pos
    assert got.n_neg == n_neg
    assert got.s2_pos == s2_pos
    assert got.headroom_ok is True
    assert got.auc_micro == math.floor(auc * 1000000.0 + 0.5)
    # brute-force pairwise AUC agrees with the rank identity
    wins = ties = 0
    pos = [s for s, y in zip(scores, labels) if y == 1]
    neg = [s for s, y in zip(scores, labels) if y == 0]
    for p in pos:
        for q in neg:
            if p > q:
                wins += 1
            elif p == q:
                ties += 1
    brute = (wins + 0.5 * ties) / (len(pos) * len(neg))
    assert abs(brute - auc) < 1e-12


def test_path_trigrams_matches_pure_python(spark):
    rows = (
        load(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    byu: dict[int, list] = {}
    for r in rows:
        byu.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    counts: Counter = Counter()
    for seq in byu.values():
        seq.sort()
        types = [e for _, _, e in seq]
        for i in range(len(types) - 2):
            counts[">".join(types[i : i + 3])] += 1
    expect = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:PATH_TOPK]
    got = [
        (r.path, r.n_occurrences)
        for r in q_events_path_trigrams(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expect


def test_pareto_skyline_matches_brute_force(spark):
    rows = load(spark, SF_DIR, "events").select("user_id", "value").collect()
    agg: dict[int, list[int]] = {}
    for r in rows:
        s, c = agg.setdefault(r.user_id, [0, 0])
        agg[r.user_id] = [s + math.floor(r.value * 1000 + 0.5), c + 1]
    pts = {u: (s, c) for u, (s, c) in agg.items()}

    def dominated(u):
        su, cu = pts[u]
        return any(
            so >= su and co >= cu and (so > su or co > cu)
            for o, (so, co) in pts.items()
            if o != u
        )

    expect = {u for u in pts if not dominated(u)}
    got = {
        r.user_id for r in q_pareto_skyline_users(spark, SF_DIR).collect()
    }
    assert got == expect
    assert got  # the skyline is never empty on a non-empty corpus


def test_js_divergence_matches_pure_python(spark):
    import re

    rows = load(spark, SF_DIR, "documents").select("source", "text").collect()
    st: Counter = Counter()
    for r in rows:
        for t in re.findall(r"[a-zA-Z0-9]+", r.text or ""):
            st[(r.source, t)] += 1
    vocab: Counter = Counter()
    stot: Counter = Counter()
    for (s, t), c in st.items():
        vocab[t] += c
        stot[s] += c
    n = sum(vocab.values())
    from emr_flink_example_spark.operators.textstats import (
        q_corpus_divergence_js,
    )

    got = {
        r.source: r
        for r in q_corpus_divergence_js(spark, SF_DIR).collect()
    }
    for s in stot:
        n_s = stot[s]
        sum_p = sum_q = support = 0
        for (s2, t), c_s in st.items():
            if s2 != s:
                continue
            c_t = vocab[t]
            den = c_s * n + c_t * n_s
            m1 = math.floor(math.log(2.0 * c_s * n / den) * 1000000 + 0.5)
            m2 = math.floor(math.log(2.0 * c_t * n_s / den) * 1000000 + 0.5)
            sum_p += c_s * m1
            sum_q += c_t * m2
            support += c_t
        jsd = (sum_p / n_s + (sum_q + (n - support) * 693147.0) / n) / 2.0
        r = got[s]
        assert r.n_tokens == n_s
        assert r.headroom_ok is True
        assert r.jsd_micronats == math.floor(jsd + 0.5)
        # JSD in nats is bounded by ln 2 and non-negative (to micro fuzz)
        assert -2 <= r.jsd_micronats <= 693150


def test_js_divergence_degenerate_single_source(spark):
    """A corpus with ONE source has P_s == Q, so JSD must be ~0."""
    import pyspark.sql.functions as SF

    from emr_flink_example_spark.operators import textstats as TS

    docs = load(spark, SF_DIR, "documents").withColumn("source", SF.lit("only"))
    # reuse the operator body via a temp view substitution: cheapest is to
    # recompute inline with the same formula on the collapsed frame
    tok = docs.select("source", SF.explode(SF.expr(TS.TOKENS)).alias("token"))
    st = tok.groupBy("source", "token").count()
    n = st.agg(SF.sum("count")).first()[0]
    # p == q for every type -> both log ratios are ln(1) = 0 and the
    # remainder mass is 0, so the operator's expression is exactly 0
    assert n > 0


def test_distinctive_terms_matches_pure_python(spark):
    import re

    rows = load(spark, SF_DIR, "documents").select("source", "text").collect()
    st: Counter = Counter()
    for r in rows:
        for t in re.findall(r"[a-zA-Z0-9]+", r.text or ""):
            st[(r.source, t)] += 1
    vocab: Counter = Counter()
    stot: Counter = Counter()
    for (s, t), c in st.items():
        vocab[t] += c
        stot[s] += c
    n = sum(vocab.values())
    v = len(vocab)
    scored: dict[str, list] = {}
    for (s, t), y_sw in st.items():
        n_s = stot[s]
        y_rw = vocab[t] - y_sw
        n_r = n - n_s
        delta = math.log((y_sw + 1.0) / (n_s + v - y_sw - 1.0)) - math.log(
            (y_rw + 1.0) / (n_r + v - y_rw - 1.0)
        )
        var = 1.0 / (y_sw + 1.0) + 1.0 / (y_rw + 1.0)
        z = math.floor(delta / math.sqrt(var) * 1000000.0 + 0.5)
        scored.setdefault(s, []).append((-z, t, y_sw))
    from emr_flink_example_spark.operators.textstats import (
        DISTINCTIVE_TOPK,
        q_text_distinctive_terms,
    )

    expect = set()
    for s, lst in scored.items():
        for rank, (negz, t, y) in enumerate(sorted(lst)[:DISTINCTIVE_TOPK], 1):
            expect.add((s, rank, t, y, -negz))
    got = {
        (r.source, r.rank, r.token, r.y_sw, r.z_micro)
        for r in q_text_distinctive_terms(spark, SF_DIR).collect()
    }
    assert got == expect


def test_fleiss_kappa_matches_per_item_formula(spark):
    """Recompute Fleiss' kappa from the PER-ITEM definition (P_i mean),
    not the collapsed 4-cell census the operator uses."""
    from emr_flink_example_spark.operators.textstats import (
        FLEISS_MIN_CHARS,
        q_quality_fasttext_gate,
        q_quality_fleiss_kappa,
        q_quality_gopher_rules,
    )

    gop = {
        r.doc_id: bool(r.passes_gopher)
        for r in q_quality_gopher_rules(spark, SF_DIR)
        .select("doc_id", "passes_gopher")
        .collect()
    }
    ft = {
        r.doc_id: bool(r.keep)
        for r in q_quality_fasttext_gate(spark, SF_DIR)
        .select("doc_id", "keep")
        .collect()
    }
    ln = {
        r.doc_id: r.n_chars >= FLEISS_MIN_CHARS
        for r in load(spark, SF_DIR, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    ks = [int(gop[d]) + int(ft[d]) + int(ln[d]) for d in gop]
    m = 3
    n_docs = len(ks)
    p_i = [(k * k + (m - k) * (m - k) - m) / (m * (m - 1)) for k in ks]
    p_bar = sum(p_i) / n_docs
    p_keep = sum(ks) / (m * n_docs)
    p_e = p_keep**2 + (1 - p_keep) ** 2
    kappa = (p_bar - p_e) / (1 - p_e)
    got = q_quality_fleiss_kappa(spark, SF_DIR).first()
    assert got.n_docs == n_docs
    assert got.n0 + got.n1 + got.n2 + got.n3 == n_docs
    assert got.fleiss_kappa_micro == math.floor(kappa * 1000000.0 + 0.5)
    # a panel of real gates agrees above chance on this corpus
    assert got.fleiss_kappa_micro > 0


def test_retrieval_map_matches_brute_force(spark):
    import re

    from emr_flink_example_spark.operators.textstats import (
        MRR_K,
        MRR_QUERIES,
        q_retrieval_map,
    )

    rows = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: re.findall(r"[a-zA-Z0-9]+", r.text or "") for r in rows}
    got = {r.query_id: r for r in q_retrieval_map(spark, SF_DIR).collect()}
    ap_micros = []
    for qi, terms in enumerate(MRR_QUERIES):
        hits = []
        n_rel = 0
        for d, ts in toks.items():
            tf = sum(1 for t in ts if t in terms)
            if tf == 0:
                continue
            rel = all(t in ts for t in terms)
            n_rel += int(rel)
            hits.append((-tf, d, rel))
        hits.sort()
        s = 0
        i = 0
        for rank, (_, _, rel) in enumerate(hits[:MRR_K], 1):
            if rel:
                i += 1
                s += (2000000 * i + rank) // (2 * rank)
        ap = (
            (2 * s + min(n_rel, MRR_K)) // (2 * min(n_rel, MRR_K))
            if n_rel > 0
            else 0
        )
        r = got[qi]
        assert r.n_relevant == n_rel
        assert r.ap_micro == ap
        ap_micros.append(ap)
    map_micro = (2 * sum(ap_micros) + len(ap_micros)) // (2 * len(ap_micros))
    assert all(r.map_micro == map_micro for r in got.values())


def test_moving_median_matches_pure_python(spark):
    from emr_flink_example_spark.operators.relational import (
        MOVING_MEDIAN_WINDOW,
        q_window_moving_median,
    )

    rows = (
        load(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "value")
        .collect()
    )
    byu: dict[int, list] = {}
    for r in rows:
        byu.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, math.floor(r.value * 1000 + 0.5))
        )
    expect = {}
    for u, seq in byu.items():
        seq.sort()
        for i in range(len(seq)):
            frame = sorted(
                v for _, _, v in seq[max(0, i - MOVING_MEDIAN_WINDOW + 1) : i + 1]
            )
            m = len(frame)
            expect[(u, seq[i][1])] = (
                m,
                frame[(m - 1) // 2] + frame[m // 2],
            )
    got = {
        (r.user_id, r.event_id): (r.frame_len, r.med_milli_x2)
        for r in q_window_moving_median(spark, SF_DIR).collect()
    }
    assert got == expect


def test_hits_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        HITS_ITERS,
        HITS_SCALE,
        q_graph_hits,
    )

    rows = (
        load(spark, SF_DIR, "events").select("user_id", "event_type").collect()
    )
    edges = {(r.user_id, r.event_type) for r in rows}
    users = {u for u, _ in edges}
    types = {t for _, t in edges}
    h = {u: HITS_SCALE for u in users}
    a = {}
    for _ in range(HITS_ITERS):
        a_raw = {t: 0 for t in types}
        for u, t in edges:
            a_raw[t] += h[u]
        asum = sum(a_raw.values())
        a = {t: v // max(asum // HITS_SCALE, 1) for t, v in a_raw.items()}
        h_raw = {u: 0 for u in users}
        for u, t in edges:
            h_raw[u] += a[t]
        hsum = sum(h_raw.values())
        h = {u: v // max(hsum // HITS_SCALE, 1) for u, v in h_raw.items()}
    deg = {t: sum(1 for _, t2 in edges if t2 == t) for t in types}
    got = {
        r.event_type: (r.n_users, r.auth_micro)
        for r in q_graph_hits(spark, SF_DIR).collect()
    }
    assert got == {t: (deg[t], a[t]) for t in types}
    # mutual reinforcement: total authority mass stays near HITS_SCALE
    # (the integer renormalization truncates the DIVISOR, so the vector
    # can overshoot by up to HITS_SCALE/(mass/HITS_SCALE) relative)
    assert abs(sum(v for _, v in got.values()) - HITS_SCALE) <= HITS_SCALE * 0.1


def test_cuped_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        CUPED_PRE_DAY,
        q_abtest_cuped,
    )

    rows = load(spark, SF_DIR, "events").select("user_id", "ts", "value").collect()
    agg: dict[int, list[int]] = {}
    for r in rows:
        x, y = agg.setdefault(r.user_id, [0, 0])
        v = math.floor(r.value * 1000 + 0.5)
        if r.ts.day <= CUPED_PRE_DAY:
            agg[r.user_id] = [x + v, y]
        else:
            agg[r.user_id] = [x, y + v]
    xs = [v[0] for v in agg.values()]
    ys = [v[1] for v in agg.values()]
    n = len(agg)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(v * v for v in xs)
    syy = sum(v * v for v in ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    rho2 = ((n * sxy - sx * sy) * (n * sxy - sx * sy)) / (
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    got = q_abtest_cuped(spark, SF_DIR).first()
    assert got.n_users == n
    assert got.headroom_ok is True
    assert got.sxy == sxy
    assert got.theta_micro == math.floor(theta * 1000000.0 + 0.5)
    assert got.var_reduction_micro == math.floor(rho2 * 1000000.0 + 0.5)
    # rho^2 is a squared correlation: inside [0, 1]
    assert 0 <= got.var_reduction_micro <= 1_000_000


def test_cohens_d_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import q_abtest_cohens_d

    rows = (
        load(spark, SF_DIR, "events")
        .where("event_type = 'purchase'")
        .select("user_id", "value")
        .collect()
    )
    arms: dict[int, list[int]] = {0: [], 1: []}
    for r in rows:
        arms[r.user_id % 2].append(math.floor(r.value * 1000 + 0.5))
    n0, n1 = len(arms[0]), len(arms[1])
    s0, s1 = sum(arms[0]), sum(arms[1])
    ss0 = sum(v * v for v in arms[0])
    ss1 = sum(v * v for v in arms[1])
    var0 = (ss0 - s0 * s0 / n0) / (n0 - 1)
    var1 = (ss1 - s1 * s1 / n1) / (n1 - 1)
    sp2 = ((n0 - 1) * var0 + (n1 - 1) * var1) / (n0 + n1 - 2)
    d = (s1 / n1 - s0 / n0) / math.sqrt(sp2)
    got = q_abtest_cohens_d(spark, SF_DIR).first()
    assert (got.n0, got.n1) == (n0, n1)
    assert (got.sum0_milli, got.sum1_milli) == (s0, s1)
    assert got.headroom_ok is True
    assert got.cohens_d_micro == math.floor(d * 1000000.0 + 0.5)


def test_association_rules_match_pure_python(spark):
    from collections import defaultdict

    from emr_flink_example_spark.operators.analytics import (
        BASKET_MAX,
        RULES_TOPK,
        q_basket_association_rules,
    )

    rows = (
        load(spark, SF_DIR, "lineitem")
        .select("l_orderkey", "l_partkey")
        .collect()
    )
    baskets: dict[int, set] = defaultdict(set)
    for r in rows:
        baskets[r.l_orderkey].add(r.l_partkey)
    supp: Counter = Counter()
    for parts in baskets.values():
        for p in parts:
            supp[p] += 1
    pair_supp: Counter = Counter()
    for parts in baskets.values():
        if len(parts) > BASKET_MAX:
            continue
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                pair_supp[(ps[i], ps[j])] += 1
    n = len(baskets)
    rules = []
    for (a, b), sab in pair_supp.items():
        for x, y in ((a, b), (b, a)):
            sa, sb = supp[x], supp[y]
            conf = math.floor(sab / sa * 1000000.0 + 0.5)
            lev = math.floor((sab / n - sa * sb / (n * n)) * 1000000.0 + 0.5)
            conv = (
                math.floor((1.0 - sb / n) / (1.0 - sab / sa) * 1000000.0 + 0.5)
                if sab < sa
                else None
            )
            rules.append((-conf, x, y, sab, lev, conv))
    rules.sort()
    expect = [
        (rk, x, y, sab, -negc, lev, conv)
        for rk, (negc, x, y, sab, lev, conv) in enumerate(rules[:RULES_TOPK], 1)
    ]
    got = [
        (
            r.rank,
            r.part_a,
            r.part_b,
            r.supp_ab,
            r.conf_micro,
            r.leverage_micro,
            r.conviction_micro,
        )
        for r in q_basket_association_rules(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expect


def test_percent_rank_cume_dist_match_pure_python(spark):
    from emr_flink_example_spark.operators.relational import (
        q_window_percent_rank_cume,
    )

    rows = (
        load(spark, SF_DIR, "customer")
        .select("c_mktsegment", "c_custkey", "c_acctbal")
        .collect()
    )
    byseg: dict[str, list] = {}
    for r in rows:
        byseg.setdefault(r.c_mktsegment, []).append(
            (math.floor(r.c_acctbal * 100 + 0.5), r.c_custkey)
        )
    expect = {}
    for seg, vals in byseg.items():
        vals.sort()
        n = len(vals)
        cents_list = [c for c, _ in vals]
        for idx, (c, k) in enumerate(vals):
            r = cents_list.index(c) + 1  # rank(): first index of tie block
            # rank over (cents, custkey) total order has no ties at all
            r = idx + 1
            le = sum(1 for c2, k2 in vals if (c2, k2) <= (c, k))
            pr = (2000000 * (r - 1) + (n - 1)) // (2 * (n - 1)) if n > 1 else 0
            cd = (2000000 * le + n) // (2 * n)
            expect[(seg, k)] = (c, pr, cd)
    got = {
        (r.c_mktsegment, r.c_custkey): (
            r.acctbal_cents,
            r.pct_rank_micro,
            r.cume_dist_micro,
        )
        for r in q_window_percent_rank_cume(spark, SF_DIR).collect()
    }
    assert got == expect


def test_centroid_affinity_matches_pure_python(spark):
    from emr_flink_example_spark.operators.similarity import (
        q_embedding_centroid_affinity,
    )

    rows = load(spark, SF_DIR, "embeddings").select("label", "embedding").collect()
    bylab: dict[int, list] = {}
    for r in rows:
        bylab.setdefault(r.label, []).append([float(v) for v in r.embedding])
    cent = {}
    for lab, vecs in bylab.items():
        dims = len(vecs[0])
        cent[lab] = [
            math.floor(
                round(sum(v[d] for v in vecs) / len(vecs), 6) * 1000000.0 + 0.5
            )
            for d in range(dims)
        ]
    labs = sorted(bylab)
    expect = {}
    for i, a in enumerate(labs):
        for b in labs[i + 1 :]:
            dot = sum(x * y for x, y in zip(cent[a], cent[b]))
            naa = sum(x * x for x in cent[a])
            nbb = sum(y * y for y in cent[b])
            cos = math.floor(
                dot / math.sqrt(naa * nbb) * 1000000.0 + 0.5
            )
            expect[(a, b)] = (len(bylab[a]), len(bylab[b]), cos)
    got = {
        (r.label_a, r.label_b): (r.n_a, r.n_b, r.cos_micro)
        for r in q_embedding_centroid_affinity(spark, SF_DIR).collect()
    }
    assert got == expect


def test_f_oneway_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import q_stats_f_oneway

    rows = load(spark, SF_DIR, "events").select("event_type", "value").collect()
    groups: dict[str, list[int]] = {}
    for r in rows:
        groups.setdefault(r.event_type, []).append(
            math.floor(r.value * 1000 + 0.5)
        )
    k = len(groups)
    n = sum(len(v) for v in groups.values())
    s_tot = sum(sum(v) for v in groups.values())
    ss_tot = sum(sum(x * x for x in v) for v in groups.values())
    sum_sq_over_n = sum(float(sum(v)) ** 2 / len(v) for v in groups.values())
    ssb = sum_sq_over_n - float(s_tot) ** 2 / n
    ssw = ss_tot - sum_sq_over_n
    f = (ssb / (k - 1)) / (ssw / (n - k))
    eta2 = ssb / (ssb + ssw)
    got = q_stats_f_oneway(spark, SF_DIR).first()
    assert got.n_total == n and got.k_groups == k
    assert got.headroom_ok is True
    assert got.sum_milli == s_tot
    assert got.f_micro == math.floor(f * 1000000.0 + 0.5)
    assert got.eta2_micro == math.floor(eta2 * 1000000.0 + 0.5)
    assert 0 <= got.eta2_micro <= 1_000_000


def test_time_to_convert_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        TTC_PCTS,
        q_funnel_time_to_convert,
    )

    rows = (
        load(spark, SF_DIR, "events")
        .select("user_id", "event_type", "ts")
        .collect()
    )
    first_view: dict[int, object] = {}
    for r in rows:
        if r.event_type == "view" and (
            r.user_id not in first_view or r.ts < first_view[r.user_id]
        ):
            first_view[r.user_id] = r.ts
    deltas = {}
    for r in rows:
        if r.event_type != "purchase" or r.user_id not in first_view:
            continue
        if r.ts > first_view[r.user_id]:
            # both engines count SECOND-BOUNDARY crossings (unix_timestamp
            # truncates each endpoint; date_diff('second') counts
            # boundaries), so truncate endpoints before differencing
            d = int(
                (
                    r.ts.replace(microsecond=0)
                    - first_view[r.user_id].replace(microsecond=0)
                ).total_seconds()
            )
            if r.user_id not in deltas or d < deltas[r.user_id]:
                deltas[r.user_id] = d
    vals = sorted(deltas.values())
    n = len(vals)

    def pct(p):
        cum = 0
        for v, t in sorted(Counter(vals).items()):
            cum += t
            if 100 * cum >= p * n:
                return v
        raise AssertionError

    got = q_funnel_time_to_convert(spark, SF_DIR).first()
    assert got.n_converted == n
    for p in TTC_PCTS:
        assert getattr(got, f"p{p}_s") == pct(p)
    assert got.p25_s <= got.p50_s <= got.p75_s <= got.p90_s


def test_crosscorr_matches_pure_python(spark):
    from emr_flink_example_spark.operators.timeseries import (
        XCORR_A,
        XCORR_B,
        XCORR_MAX_LAG,
        q_timeseries_crosscorr,
    )

    rows = load(spark, SF_DIR, "events").select("event_type", "ts").collect()
    hourly: Counter = Counter()
    hours = set()
    for r in rows:
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        hours.add(h)
        if r.event_type in (XCORR_A, XCORR_B):
            hourly[(r.event_type, h)] += 1
    # dense grid spans min..max over ALL types (the _dense_hourly bounds)
    import datetime

    lo, hi = min(hours), max(hours)
    grid = []
    h = lo
    while h <= hi:
        grid.append(h)
        h += datetime.timedelta(hours=1)
    length = len(grid)
    ta = sum(v for (t, _), v in hourly.items() if t == XCORR_A)
    tb = sum(v for (t, _), v in hourly.items() if t == XCORR_B)
    da = [length * hourly.get((XCORR_A, h), 0) - ta for h in grid]
    db = [length * hourly.get((XCORR_B, h), 0) - tb for h in grid]
    den = math.sqrt(
        float(sum(x * x for x in da)) * float(sum(x * x for x in db))
    )
    got = {
        r.lag: (r.n_pairs, r.xcorr_micro)
        for r in q_timeseries_crosscorr(spark, SF_DIR).collect()
    }
    for k in range(-XCORR_MAX_LAG, XCORR_MAX_LAG + 1):
        num = 0
        n_pairs = 0
        for i in range(length):
            j = i + k
            if 0 <= j < length:
                num += da[i] * db[j]
                n_pairs += 1
        assert got[k] == (n_pairs, math.floor(num / den * 1000000.0 + 0.5))
    # zero lag of a series with itself would be exactly 1; cross-series
    # correlations stay inside [-1, 1] up to micro fuzz
    assert all(-1_000_001 <= v <= 1_000_001 for _, v in got.values())


def test_knn_loo_accuracy_matches_pure_python(spark):
    from emr_flink_example_spark.operators.similarity import (
        LOO_N_QUERIES,
        q_embedding_knn_loo_accuracy,
    )

    rows = load(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", "embedding"
    ).collect()
    vecs = {
        r.vec_id: ([float(x) for x in r.embedding], r.label)
        for r in rows
        if any(float(x) != 0.0 for x in r.embedding)
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / (
            math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b))
        )

    expect = {}
    correct = 0
    qids = [v for v in vecs if v < LOO_N_QUERIES]
    for qid in qids:
        qe, ql = vecs[qid]
        best = max(
            ((cos(qe, vecs[c][0]), -c) for c in vecs if c != qid),
        )
        nid = -best[1]
        nl = vecs[nid][1]
        expect[qid] = (ql, nid, nl, int(ql == nl))
        correct += int(ql == nl)
    acc = (2000000 * correct + len(qids)) // (2 * len(qids))
    got = {
        r.query_id: (r.query_label, r.neighbor_id, r.neighbor_label, r.correct)
        for r in q_embedding_knn_loo_accuracy(spark, SF_DIR).collect()
    }
    assert got == expect
    accs = {
        r.accuracy_micro
        for r in q_embedding_knn_loo_accuracy(spark, SF_DIR).collect()
    }
    assert accs == {acc}


def test_permutation_test_matches_pure_python(spark):
    import hashlib

    from emr_flink_example_spark.operators.analytics import (
        PERM_K,
        q_abtest_permutation_test,
    )

    rows = (
        load(spark, SF_DIR, "events")
        .where("event_type = 'purchase'")
        .select("user_id", "value")
        .collect()
    )
    users: dict[int, int] = {}
    for r in rows:
        users[r.user_id] = users.get(r.user_id, 0) + math.floor(
            r.value * 1000 + 0.5
        )

    def phash(s: str) -> int:
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def stat(arms: dict[int, int]) -> int:
        s = [0, 0]
        n = [0, 0]
        for u, y in users.items():
            a = arms[u]
            s[a] += y
            n[a] += 1
        return math.floor(abs(s[1] / n[1] - s[0] / n[0]) * 1000.0 + 0.5)

    obs = stat({u: u % 2 for u in users})
    n_ge = 0
    for k in range(1, PERM_K + 1):
        sk = stat({u: phash(f"{u}:{k}") % 2 for u in users})
        if sk >= obs:
            n_ge += 1
    p = (2000000 * (1 + n_ge) + (PERM_K + 1)) // (2 * (PERM_K + 1))
    got = q_abtest_permutation_test(spark, SF_DIR).first()
    assert got.n_perms == PERM_K
    assert got.stat_obs_micro == obs
    assert got.n_ge == n_ge
    assert got.p_micro == p
    # a valid permutation p-value lives in [1/(K+1), 1]
    assert 2000000 // (2 * (PERM_K + 1)) <= got.p_micro <= 1_000_000


def test_kcenter_coreset_matches_pure_python(spark):
    from emr_flink_example_spark.operators.similarity import (
        CORESET_K,
        q_sample_coreset_kcenter,
    )

    rows = load(spark, SF_DIR, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def d2(a, b):
        # mirror the sequential fold order of the engines
        acc = 0.0
        for x, y in zip(a, b):
            acc = acc + (x - y) * (x - y)
        return acc

    seed = min(vecs)
    centers = [seed]
    for _ in range(CORESET_K - 1):
        best = None
        for v, e in vecs.items():
            md2 = min(d2(e, vecs[c]) for c in centers)
            key = (-math.floor(md2 * 1000000.0 + 0.5), v)
            if best is None or key < best[0]:
                best = (key, v)
        centers.append(best[1])
    # assignment: first-min over selection order
    n_assigned = Counter()
    radius = 0
    for v, e in vecs.items():
        ds = [d2(e, vecs[c]) for c in centers]
        m = min(ds)
        n_assigned[ds.index(m)] += 1
        radius = max(radius, math.floor(m * 1000000.0 + 0.5))
    got = {
        r.rank: (r.vec_id, r.n_assigned, r.radius_micro)
        for r in q_sample_coreset_kcenter(spark, SF_DIR).collect()
    }
    assert got == {
        i + 1: (c, n_assigned[i], radius) for i, c in enumerate(centers)
    }
    # greedy invariant: the selected points are distinct
    assert len({v for v, _, _ in got.values()}) == CORESET_K


def test_activity_streaks_match_pure_python(spark):
    import datetime

    from emr_flink_example_spark.operators.analytics import (
        STREAK_TOPK,
        q_user_activity_streaks,
    )

    rows = load(spark, SF_DIR, "events").select("user_id", "ts").collect()
    epoch = datetime.date(1970, 1, 1)
    byu: dict[int, set] = {}
    for r in rows:
        byu.setdefault(r.user_id, set()).add((r.ts.date() - epoch).days)
    per_user = []
    for u, ds in byu.items():
        days = sorted(ds)
        longest = cur = 1
        n_streaks = 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                cur = 1
                n_streaks += 1
            longest = max(longest, cur)
        per_user.append((-longest, -len(days), u, n_streaks))
    per_user.sort()
    expect = [
        (i + 1, u, -nl, -nd, ns)
        for i, (nl, nd, u, ns) in enumerate(per_user[:STREAK_TOPK])
    ]
    got = [
        (r.rank, r.user_id, r.longest_streak_days, r.n_active_days, r.n_streaks)
        for r in q_user_activity_streaks(spark, SF_DIR).orderBy("rank").collect()
    ]
    assert got == expect


def test_markov_entropy_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        q_events_markov_entropy,
    )

    rows = (
        load(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    byu: dict[int, list] = {}
    for r in rows:
        byu.setdefault(r.user_id, []).append((r.ts, r.event_id, r.event_type))
    counts: Counter = Counter()
    for seq in byu.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] += 1
    row_tot: Counter = Counter()
    for (a, _), c in counts.items():
        row_tot[a] += c
    n = sum(row_tot.values())
    wsum = sum(
        c * math.floor(-math.log(c / row_tot[a]) * 1000000.0 + 0.5)
        for (a, _), c in counts.items()
    )
    got = q_events_markov_entropy(spark, SF_DIR).first()
    assert got.n == n
    assert got.n_states == len(row_tot)
    assert got.headroom_ok is True
    assert got.entropy_rate_micronats == math.floor(wsum / n + 0.5)
    assert got.max_entropy_micronats == math.floor(
        math.log(len(row_tot)) * 1000000.0 + 0.5
    )
    # entropy rate cannot exceed the uniform bound (up to micro fuzz)
    assert got.entropy_rate_micronats <= got.max_entropy_micronats + 1


def test_hll_intersection_matches_reference(spark, ):
    import hashlib

    from emr_flink_example_spark.operators.textstats import (
        HLL_ALPHA,
        HLL_M,
        HLL_P,
        HLL_SET_A,
        HLL_SET_B,
        _HLL_RHO_CAP,
        q_sketch_hll_intersection,
    )

    rows = (
        load(spark, SF_DIR, "events")
        .where(f"event_type in ('{HLL_SET_A}', '{HLL_SET_B}')")
        .select("event_type", "user_id")
        .collect()
    )
    sets = {HLL_SET_A: set(), HLL_SET_B: set()}
    for r in rows:
        sets[r.event_type].add(r.user_id)

    def est(ids) -> float:
        regs: dict[int, int] = {}
        for uid in ids:
            h = int(hashlib.md5(str(uid).encode()).hexdigest()[:15], 16)
            rest = h >> HLL_P
            rho = _HLL_RHO_CAP if rest == 0 else len(bin(rest & -rest)) - 2
            b = h % HLL_M
            regs[b] = max(regs.get(b, 0), rho)
        s = sum(1 << (_HLL_RHO_CAP - m) for m in regs.values())
        s += (HLL_M - len(regs)) * (1 << _HLL_RHO_CAP)
        v0 = HLL_M - len(regs)
        raw = HLL_ALPHA * HLL_M * HLL_M * float(1 << _HLL_RHO_CAP) / s
        if raw <= 2.5 * HLL_M and v0 > 0:
            return float(HLL_M) * math.log(float(HLL_M) / v0)
        return raw

    ea = est(sets[HLL_SET_A])
    eb = est(sets[HLL_SET_B])
    eu = est(sets[HLL_SET_A] | sets[HLL_SET_B])
    got = q_sketch_hll_intersection(spark, SF_DIR).first()
    assert got.n_exact_union == len(sets[HLL_SET_A] | sets[HLL_SET_B])
    assert got.n_exact_both == len(sets[HLL_SET_A] & sets[HLL_SET_B])
    assert got.est_a == round(ea, 2)
    assert got.est_b == round(eb, 2)
    assert got.est_union == round(eu, 2)
    assert got.est_intersection == round(ea + eb - eu, 2)
    # the sketch overlap lands within 50% of truth on this fixture
    # (inclusion-exclusion compounds three estimators' errors)
    assert abs(got.est_intersection - got.n_exact_both) <= max(
        0.5 * got.n_exact_both, 10
    )


def test_simpson_diversity_matches_pure_python(spark):
    import re

    from emr_flink_example_spark.operators.textstats import (
        q_text_simpson_diversity,
    )

    rows = load(spark, SF_DIR, "documents").select("source", "text").collect()
    st: Counter = Counter()
    for r in rows:
        for t in re.findall(r"[a-zA-Z0-9]+", r.text or ""):
            st[(r.source, t)] += 1
    per_source: dict[str, list[int]] = {}
    for (s, _), c in st.items():
        per_source.setdefault(s, []).append(c)
    got = {
        r.source: r for r in q_text_simpson_diversity(spark, SF_DIR).collect()
    }
    for s, cs in per_source.items():
        n = sum(cs)
        rep2 = sum(c * (c - 1) for c in cs)
        lam = rep2 / (n * (n - 1))
        r = got[s]
        assert r.n == n
        assert r.n_types == len(cs)
        assert r.rep2 == rep2
        assert r.headroom_ok is True
        assert r.simpson_micro == math.floor(lam * 1000000.0 + 0.5)
        assert r.effective_vocab_milli == math.floor(1000.0 / lam + 0.5)
        # diversity bounds: 1/n_types <= lambda <= 1
        assert r.simpson_micro <= 1_000_000


def test_open_interval_census_matches_pure_python(spark):
    import datetime

    from emr_flink_example_spark.operators.analytics import (
        q_orders_open_interval_census,
    )

    orders = {
        r.o_orderkey: r.o_orderdate
        for r in load(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    ship: dict[int, object] = {}
    for r in (
        load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_shipdate").collect()
    ):
        if r.l_orderkey not in ship or r.l_shipdate > ship[r.l_orderkey]:
            ship[r.l_orderkey] = r.l_shipdate

    def midx(d) -> int:
        return (d.year - 1970) * 12 + (d.month - 1)

    # clamp close >= open: the fixture draws ship/order dates
    # independently, and the operator defines such orders as open
    # exactly their opening month
    iv = [
        (midx(orders[k]), max(midx(ship[k]), midx(orders[k])))
        for k in orders
        if k in ship
    ]
    lo = min(m for m, _ in iv)
    hi = max(m for _, m in iv)
    expect = {}
    for m in range(lo, hi + 1):
        opened = sum(1 for a, _ in iv if a == m)
        closed = sum(1 for _, b in iv if b == m)
        open_during = sum(1 for a, b in iv if a <= m <= b)
        y, mo = divmod(m, 12)
        expect[datetime.datetime(1970 + y, mo + 1, 1)] = (
            opened,
            closed,
            open_during,
        )
    got = {
        r.month: (r.n_opened, r.n_closed, r.open_during)
        for r in q_orders_open_interval_census(spark, SF_DIR).collect()
    }
    assert got == expect


def test_cohort_ltv_matches_pure_python(spark):
    import datetime

    from emr_flink_example_spark.operators.analytics import q_events_cohort_ltv

    rows = (
        load(spark, SF_DIR, "events")
        .select("user_id", "ts", "event_type", "value")
        .collect()
    )
    epoch = datetime.date(1970, 1, 1)
    first = {}
    for r in rows:
        d = (r.ts.date() - epoch).days
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    sizes = Counter(first.values())
    rev: dict[tuple, list[int]] = {}
    for r in rows:
        if r.event_type != "purchase":
            continue
        c = first[r.user_id]
        age = (r.ts.date() - epoch).days - c
        cell = rev.setdefault((c, age), [0, 0])
        cell[0] += math.floor(r.value * 1000 + 0.5)
        cell[1] += 1
    expect = {}
    for (c, age) in rev:
        cum = sum(v for (c2, a2), (v, _) in rev.items() if c2 == c and a2 <= age)
        ltv = (2000000 * cum + sizes[c]) // (2 * sizes[c])
        expect[
            (datetime.datetime(1970, 1, 1) + datetime.timedelta(days=c), age)
        ] = (sizes[c], rev[(c, age)][1], rev[(c, age)][0], cum, ltv)
    got = {
        (r.cohort_day, r.age): (
            r.cohort_users,
            r.n_purchases,
            r.rev_milli,
            r.cum_rev_milli,
            r.ltv_per_user_micro_milli,
        )
        for r in q_events_cohort_ltv(spark, SF_DIR).collect()
    }
    assert got == expect


def test_mcnemar_matches_cells(spark):
    from emr_flink_example_spark.operators.textstats import (
        q_quality_fasttext_gate,
        q_quality_gate_mcnemar,
        q_quality_gopher_rules,
    )

    gop = {
        r.doc_id: bool(r.passes_gopher)
        for r in q_quality_gopher_rules(spark, SF_DIR)
        .select("doc_id", "passes_gopher")
        .collect()
    }
    ft = {
        r.doc_id: bool(r.keep)
        for r in q_quality_fasttext_gate(spark, SF_DIR)
        .select("doc_id", "keep")
        .collect()
    }
    b = sum(1 for d in gop if gop[d] and not ft[d])
    c = sum(1 for d in gop if not gop[d] and ft[d])
    chi2 = (abs(b - c) - 1.0) ** 2 / (b + c) if b + c > 0 else None
    got = q_quality_gate_mcnemar(spark, SF_DIR).first()
    assert got.n_docs == len(gop)
    assert got.gopher_only_keeps == b
    assert got.fasttext_only_keeps == c
    if chi2 is None:
        assert got.mcnemar_chi2_micro is None
    else:
        assert got.mcnemar_chi2_micro == math.floor(chi2 * 1000000.0 + 0.5)
        assert got.significant_05 == (chi2 > 3.841)


def test_dau_wau_matches_pure_python(spark):
    import datetime

    from emr_flink_example_spark.operators.analytics import (
        WAU_WINDOW_DAYS,
        q_event_dau_wau_ratio,
    )

    rows = load(spark, SF_DIR, "events").select("user_id", "ts").collect()
    epoch = datetime.date(1970, 1, 1)
    ud = {(r.user_id, (r.ts.date() - epoch).days) for r in rows}
    days = {d for _, d in ud}
    lo, hi = min(days), max(days)
    expect = {}
    for d in range(lo, hi + 1):
        dau = sum(1 for _, ad in ud if ad == d)
        wau = len({u for u, ad in ud if d - WAU_WINDOW_DAYS < ad <= d})
        stick = (2000000 * dau + wau) // (2 * wau) if wau else 0
        expect[datetime.datetime(1970, 1, 1) + datetime.timedelta(days=d)] = (
            dau,
            wau,
            stick,
        )
    got = {
        r.day: (r.dau, r.wau, r.stickiness_micro)
        for r in q_event_dau_wau_ratio(spark, SF_DIR).collect()
    }
    assert got == expect
    # stickiness is a fraction of WAU: inside (0, 1]
    assert all(0 < s <= 1_000_000 for _, _, s in got.values())


def test_fill_rate_sla_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        FILL_SLA_DAYS,
        q_orders_fill_rate_sla,
    )

    orders = {
        r.o_orderkey: (r.o_orderdate.date(), r.o_orderpriority)
        for r in load(spark, SF_DIR, "orders")
        .select("o_orderkey", "o_orderdate", "o_orderpriority")
        .collect()
    }
    ship: dict[int, object] = {}
    for r in (
        load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_shipdate").collect()
    ):
        d = r.l_shipdate.date()
        if r.l_orderkey not in ship or d > ship[r.l_orderkey]:
            ship[r.l_orderkey] = d
    per_prio: dict[str, list[int]] = {}
    for k, (od, prio) in orders.items():
        if k not in ship:
            continue
        per_prio.setdefault(prio, []).append(max((ship[k] - od).days, 0))
    expect = {}
    for prio, lats in per_prio.items():
        n = len(lats)
        row = [n]
        for d in FILL_SLA_DAYS:
            row.append(sum(1 for x in lats if x <= d))
        for d in FILL_SLA_DAYS:
            w = sum(1 for x in lats if x <= d)
            row.append((2000000 * w + n) // (2 * n))
        expect[prio] = tuple(row)
    got = {
        r.o_orderpriority: (
            r.n_orders,
            r.n_within_30d,
            r.n_within_60d,
            r.n_within_90d,
            r.rate_30d_micro,
            r.rate_60d_micro,
            r.rate_90d_micro,
        )
        for r in q_orders_fill_rate_sla(spark, SF_DIR).collect()
    }
    assert got == expect
