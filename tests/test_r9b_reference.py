"""Independent value pins for the r9 continuation operators (Spearman,
Gini/Lorenz, Cramér's V): pure-Python reference implementations so a
formula transcribed identically into BOTH engines cannot hide a shared
mistake (the test_r8_reference discipline).
"""

from __future__ import annotations

import math
from collections import Counter

from emr_flink_example_spark.io import load
from emr_flink_example_spark.operators.analytics import (
    LORENZ_BUCKETS,
    q_abtest_cramers_v,
    q_revenue_gini_lorenz,
    q_stats_spearman_corr,
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


def test_spearman_matches_pure_python(spark):
    rows = (
        load(spark, SF_DIR, "events")
        .select("user_id", "value")
        .collect()
    )
    agg: dict[int, list[int]] = {}
    for r in rows:
        x, y = agg.setdefault(r.user_id, [0, 0])
        agg[r.user_id] = [x + 1, y + math.floor(r.value * 1000000 + 0.5)]
    xs = [v[0] for v in agg.values()]
    ys = [v[1] for v in agg.values()]
    rx, ry = _avg_ranks_doubled(xs), _avg_ranks_doubled(ys)
    r2x = [rx[x] for x in xs]
    r2y = [ry[y] for y in ys]
    n = len(agg)
    sx, sy = sum(r2x), sum(r2y)
    sxx = sum(v * v for v in r2x)
    syy = sum(v * v for v in r2y)
    sxy = sum(a * b for a, b in zip(r2x, r2y))
    got = q_stats_spearman_corr(spark, SF_DIR).first()
    assert got.n_users == n
    assert got.headroom_ok is True
    assert got.sxy == sxy
    num = float(n) * float(sxy) - float(sx) * float(sy)
    den = math.sqrt(
        (float(n) * float(sxx) - float(sx) * float(sx))
        * (float(n) * float(syy) - float(sy) * float(sy))
    )
    rho = num / den
    assert got.rho_micro == math.floor(rho * 1000000.0 + 0.5)
    # sanity: doubled ranks of n items always sum to n*(n+1)
    assert sx == n * (n + 1) and sy == n * (n + 1)
    assert -1_000_000 <= got.rho_micro <= 1_000_000


def test_gini_lorenz_matches_pure_python(spark):
    rows = load(spark, SF_DIR, "orders").select("o_custkey", "o_totalprice").collect()
    rev: dict[int, int] = {}
    for r in rows:
        rev[r.o_custkey] = rev.get(r.o_custkey, 0) + math.floor(
            r.o_totalprice * 100 + 0.5
        )
    ordered = sorted(rev.items(), key=lambda kv: (kv[1], kv[0]))
    xs = [c for _, c in ordered]
    n, total = len(xs), sum(xs)
    g2 = sum((2 * (i + 1) - n - 1) * x for i, x in enumerate(xs))
    gini = g2 / (n * total)
    got = {r.bucket: r for r in q_revenue_gini_lorenz(spark, SF_DIR).collect()}
    assert len(got) == LORENZ_BUCKETS
    assert all(r.headroom_ok for r in got.values())
    assert got[1].gini_micro == math.floor(gini * 1000000.0 + 0.5)
    # ntile(k) bucket b holds rows (b-1)*n//k+1 .. b*n//k with the first
    # n % k buckets one longer — recompute the bucket sums independently
    base, extra = divmod(n, LORENZ_BUCKETS)
    start = 0
    cum = 0
    for b in range(1, LORENZ_BUCKETS + 1):
        size = base + (1 if b <= extra else 0)
        chunk = xs[start : start + size]
        start += size
        cum += sum(chunk)
        assert got[b].n_customers == size
        assert got[b].revenue_cents == sum(chunk)
        assert got[b].cum_share_micro == math.floor(
            cum / total * 1000000.0 + 0.5
        )
    assert got[LORENZ_BUCKETS].cum_share_micro == 1_000_000
    # Lorenz curve is convex from below: shares weakly increase by bucket
    shares = [got[b].revenue_cents / got[b].n_customers for b in range(1, 11)]
    assert shares == sorted(shares)


def test_cramers_v_matches_pure_python(spark):
    rows = (
        load(spark, SF_DIR, "events").select("event_type", "user_id").collect()
    )
    cells: Counter = Counter((r.event_type, r.user_id % 2) for r in rows)
    types = sorted({t for t, _ in cells})
    arms = sorted({a for _, a in cells})
    n = sum(cells.values())
    row_n = {t: sum(cells[(t, a)] for a in arms) for t in types}
    col_n = {a: sum(cells[(t, a)] for t in types) for t in types for a in arms}
    chi2_micro = 0
    for t in types:
        for a in arms:
            e = row_n[t] * col_n[a] / n
            o = cells.get((t, a), 0)
            chi2_micro += math.floor((o - e) * (o - e) / e * 1000000.0 + 0.5)
    got = q_abtest_cramers_v(spark, SF_DIR).first()
    assert (got.n_rows, got.n_cols, got.n_total) == (len(types), len(arms), n)
    assert got.chi2_micro == chi2_micro
    v = math.sqrt(
        chi2_micro / 1000000.0 / (n * (min(len(types), len(arms)) - 1))
    )
    assert got.cramers_v_micro == math.floor(v * 1000000.0 + 0.5)
    assert 0 <= got.cramers_v_micro <= 1_000_000


def _tokens(text: str) -> list[str]:
    import re

    return re.findall("[a-zA-Z0-9]+", text)


def test_query_likelihood_matches_pure_python(spark):
    from emr_flink_example_spark.operators.textstats import (
        BM25_TERMS,
        QL_MU,
        QL_TOPK,
        q_retrieval_query_likelihood,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: _tokens(r.text) for r in docs}
    t_total = sum(len(v) for v in toks.values())
    cf = Counter()
    for v in toks.values():
        cf.update(v)
    scores = {}
    for d, v in toks.items():
        tf = Counter(v)
        s = 0
        for t in BM25_TERMS:
            assert cf[t] > 0  # fixture guarantees the query terms exist
            s += math.floor(
                math.log(
                    (tf[t] + QL_MU * cf[t] / t_total) / (len(v) + QL_MU)
                )
                * 1000000.0
                + 0.5
            )
        scores[d] = (s, sum(1 for t in BM25_TERMS if tf[t] > 0), len(v))
    want = sorted(scores.items(), key=lambda kv: (-kv[1][0], kv[0]))[:QL_TOPK]
    got = q_retrieval_query_likelihood(spark, SF_DIR).collect()
    assert [(r.doc_id, r.ql_micronats, r.n_terms_hit, r.doclen) for r in got] == [
        (d, s, h, dl) for d, (s, h, dl) in want
    ]
    # likelihoods are log-probabilities: strictly negative, and docs that
    # hit more query terms dominate the top of the ranking
    assert all(r.ql_micronats < 0 for r in got)
    assert got[0].n_terms_hit == max(r.n_terms_hit for r in got)


def test_burstiness_matches_pure_python(spark):
    from emr_flink_example_spark.operators.textstats import (
        BURST_MIN_DF,
        BURST_TOPK,
        q_text_term_burstiness,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    n_docs = len(docs)
    per_term: dict[str, list[int]] = {}
    for r in docs:
        for t, c in Counter(_tokens(r.text)).items():
            per_term.setdefault(t, []).append(c)
    rows = []
    for t, tfs in per_term.items():
        df = len(tfs)
        if df < BURST_MIN_DF:
            continue
        s1, s2 = sum(tfs), sum(c * c for c in tfs)
        mean = s1 / n_docs
        vmr = (s2 / n_docs - mean * mean) / mean
        rows.append((t, df, s1, math.floor(vmr * 1000000.0 + 0.5)))
    want = sorted(rows, key=lambda r: (-r[3], r[0]))[:BURST_TOPK]
    got = q_text_term_burstiness(spark, SF_DIR).collect()
    assert [(r.token, r.df, r.sum_tf, r.vmr_micro) for r in got] == want
    assert all(r.headroom_ok for r in got)
    # over-dispersion sanity: a corpus of topical docs must show VMR > 1
    # at the bursty end
    assert got[0].vmr_micro > 1_000_000


def test_good_turing_matches_pure_python(spark):
    from emr_flink_example_spark.operators.textstats import (
        q_lm_good_turing_counts,
    )

    docs = load(spark, SF_DIR, "documents").select("text").collect()
    cnt = Counter()
    for r in docs:
        cnt.update(_tokens(r.text))
    cc = Counter(cnt.values())
    n_tokens = sum(cnt.values())
    got = {r.r: r for r in q_lm_good_turing_counts(spark, SF_DIR).collect()}
    assert set(got) == set(cc)
    for r, n_r in cc.items():
        row = got[r]
        assert row.n_types == n_r
        nxt = cc.get(r + 1)
        assert row.n_types_next == nxt
        if nxt is None:
            assert row.r_star_micro is None
        else:
            assert row.r_star_micro == math.floor(
                (r + 1) * nxt / n_r * 1000000.0 + 0.5
            )
        assert row.unseen_mass_micro == math.floor(
            cc[1] / n_tokens * 1000000.0 + 0.5
        )
    # adjusted-mass sanity (gap-aware: N_r * r* telescopes to
    # (r+1) * N_{r+1} only where BOTH rows exist; rows whose successor
    # count is absent contribute nothing): the micro-rounded masses land
    # within per-row rounding of the exact integer masses
    adj = sum(
        got[r].n_types * got[r].r_star_micro
        for r in cc
        if got[r].r_star_micro is not None
    )
    exact = sum((r + 1) * cc[r + 1] for r in cc if (r + 1) in cc)
    assert abs(adj / 1000000.0 - exact) < 0.5 * len(cc) + 1


def test_kaplan_meier_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        KM_CHURN_GAP_DAYS,
        q_survival_kaplan_meier,
    )

    rows = load(spark, SF_DIR, "events").select("user_id", "ts").collect()
    span: dict[int, list] = {}
    for r in rows:
        d = r.ts.date()
        lo, hi = span.get(r.user_id, (d, d))
        span[r.user_id] = (min(lo, d), max(hi, d))
    anchor = max(hi for _, hi in span.values())
    users = [
        ((hi - lo).days, 1 if (anchor - hi).days > KM_CHURN_GAP_DAYS else 0)
        for lo, hi in span.values()
    ]
    durs = sorted({d for d, _ in users})
    got = {r.duration_days: r for r in q_survival_kaplan_meier(spark, SF_DIR).collect()}
    assert set(got) == set(durs)
    cum = 0
    dead = False
    for d in durs:
        n_risk = sum(1 for dd, _ in users if dd >= d)
        events_d = sum(o for dd, o in users if dd == d)
        total_d = sum(1 for dd, _ in users if dd == d)
        row = got[d]
        assert row.n_at_risk == n_risk
        assert row.d_events == events_d
        assert row.n_censored == total_d - events_d
        if events_d == n_risk and events_d > 0:
            dead = True
        if dead:
            assert row.cum_neg_log_micro is None
            assert row.survival_zero is True
            continue
        if events_d > 0:
            cum += math.floor(
                -math.log(1.0 - events_d / n_risk) * 1000000.0 + 0.5
            )
        assert row.cum_neg_log_micro == cum
        assert row.survival_zero is False
    # survival is a nonincreasing step function: cumulative -ln S grows
    lived = [got[d].cum_neg_log_micro for d in durs if got[d].cum_neg_log_micro is not None]
    assert lived == sorted(lived)


def test_basket_lift_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        BASKET_MAX,
        BASKET_MIN_SUPPORT,
        BASKET_TOPK,
        q_basket_lift_pairs,
    )
    from itertools import combinations

    rows = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_partkey").collect()
    baskets: dict[int, set] = {}
    for r in rows:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    baskets = {o: s for o, s in baskets.items() if len(s) <= BASKET_MAX}
    n_orders = len(baskets)
    supp: Counter = Counter()
    pair_supp: Counter = Counter()
    for s in baskets.values():
        supp.update(s)
        pair_supp.update(combinations(sorted(s), 2))
    want = []
    for (a, b), c in pair_supp.items():
        if c < BASKET_MIN_SUPPORT:
            continue
        lift = math.floor(
            n_orders * c / (supp[a] * supp[b]) * 1000000.0 + 0.5
        )
        want.append((a, b, c, supp[a], supp[b], lift))
    want.sort(key=lambda t: (-t[5], t[0], t[1]))
    got = q_basket_lift_pairs(spark, SF_DIR).collect()
    assert [
        (r.part_a, r.part_b, r.supp_ab, r.supp_a, r.supp_b, r.lift_micro)
        for r in got
    ] == want[:BASKET_TOPK]
    # associated pairs beat independence: the top of the report has lift > 1
    assert got[0].lift_micro > 1_000_000


def test_sax_words_matches_pure_python(spark):
    from emr_flink_example_spark.operators.timeseries import (
        N_DAYS,
        SAX_BREAKS,
        SAX_SEG_DAYS,
        SAX_SEGMENTS,
        q_timeseries_sax_words,
    )

    rows = load(spark, SF_DIR, "events").select("user_id", "ts", "value").collect()
    daily: dict[tuple, int] = {}
    for r in rows:
        k = (r.user_id, r.ts.day)
        daily[k] = daily.get(k, 0) + math.floor(r.value * 100 + 0.5)
    users = sorted({u for u, _ in daily})
    want = {}
    for u in users:
        vs = {d: v for (uu, d), v in daily.items() if uu == u}
        s1 = sum(vs.values())
        s2 = sum(v * v for v in vs.values())
        mu = s1 / N_DAYS
        var = s2 / N_DAYS - mu * mu
        if var <= 0.0:
            want[u] = None
            continue
        word = []
        for seg in range(SAX_SEGMENTS):
            seg_sum = sum(
                v for d, v in vs.items() if (d - 1) // SAX_SEG_DAYS == seg
            )
            z = (seg_sum / SAX_SEG_DAYS - mu) / math.sqrt(var)
            z = math.floor(z * 1000000.0 + 0.5) / 1000000.0
            if z < SAX_BREAKS[0]:
                word.append("a")
            elif z < SAX_BREAKS[1]:
                word.append("b")
            elif z < SAX_BREAKS[2]:
                word.append("c")
            else:
                word.append("d")
        want[u] = "".join(word)
    freq = Counter(w for w in want.values() if w is not None)
    got = {r.user_id: r for r in q_timeseries_sax_words(spark, SF_DIR).collect()}
    assert set(got) == set(want)
    for u, w in want.items():
        assert got[u].sax_word == w
        assert got[u].headroom_ok is True
        if w is not None:
            assert got[u].n_users_same_word == freq[w]


def test_incremental_refresh_matches_and_all_rows_matched(spark):
    from emr_flink_example_spark.operators.analytics import (
        q_incremental_agg_refresh,
    )

    got = q_incremental_agg_refresh(spark, SF_DIR).collect()
    # the query self-verifies: every refreshed group must equal the full
    # recompute — a single False here means the delta algebra is wrong
    assert len(got) > 0
    assert all(r.matched for r in got)
    # independent recompute of the refreshed view from raw rows
    rows = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).collect()
    from emr_flink_example_spark.operators.analytics import (
        CDC_DELETE_MOD,
        UPSERT_INSERT_MOD,
        UPSERT_KEY_SHIFT,
        UPSERT_UPDATE_MOD,
    )

    snap = {}
    for r in rows:
        snap[r.o_orderkey] = (r.o_orderstatus, math.floor(r.o_totalprice * 100 + 0.5))
    new = dict(snap)
    for r in rows:
        if r.o_orderkey % UPSERT_UPDATE_MOD == 0:
            new[r.o_orderkey] = ("U", math.floor((r.o_totalprice + 50.0) * 100 + 0.5))
    for r in rows:
        if r.o_orderkey % UPSERT_INSERT_MOD == 0:
            new[r.o_orderkey + UPSERT_KEY_SHIFT] = (
                "N",
                math.floor(r.o_totalprice * 100 + 0.5),
            )
    new = {k: v for k, v in new.items() if k % CDC_DELETE_MOD != 0}
    want: dict[str, list[int]] = {}
    for st, c in new.values():
        n, s = want.setdefault(st, [0, 0])
        want[st] = [n + 1, s + c]
    assert {r.status: [r.n_orders, r.revenue_cents] for r in got} == want


def test_snapshot_asof_shows_v2_not_v3(spark):
    from emr_flink_example_spark.operators.analytics import (
        ASOF_RESTATUS_MOD,
        ASOF_VERSION,
        CDC_DELETE_MOD,
        UPSERT_UPDATE_MOD,
        q_table_snapshot_asof,
    )

    assert ASOF_VERSION == 2
    rows = load(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    ).collect()
    state = {}
    for r in rows:
        state[r.o_orderkey] = (r.o_orderstatus, math.floor(r.o_totalprice * 100 + 0.5))
    # v1: surcharge
    for k in list(state):
        if k % UPSERT_UPDATE_MOD == 0:
            state[k] = ("U", state[k][1] + 5000)
    # v2: delete
    state = {k: v for k, v in state.items() if k % CDC_DELETE_MOD != 0}
    # v3 (re-status to 'T') must NOT appear at AS OF 2
    want: dict[str, list[int]] = {}
    for k, (st, c) in state.items():
        n, ks, s = want.setdefault(st, [0, 0, 0])
        want[st] = [n + 1, ks + k, s + c]
    got = {r.status: [r.n_orders, r.key_checksum, r.revenue_cents]
           for r in q_table_snapshot_asof(spark, SF_DIR).collect()}
    assert got == want
    assert "T" not in got


def test_audio_fingerprint_matches_pure_python(spark):
    from emr_flink_example_spark.operators.multimodal import (
        AUDIO_HOP,
        AUDIO_WIN,
        FP_BANDS,
        q_multimodal_audio_fingerprint,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    peaks: dict[int, list[int]] = {}
    for r in docs:
        samples = [b - 128 for b in r.text.encode("utf-8")]
        seq = []
        start = 0
        while start < len(samples):
            win = samples[start : start + AUDIO_WIN]
            bands = [0] * FP_BANDS
            for j, s in enumerate(win):
                bands[j % FP_BANDS] += s * s
            peak = 0
            for k in range(1, FP_BANDS):
                if bands[k] > bands[peak]:
                    peak = k
            seq.append(peak)
            start += AUDIO_HOP
        peaks[r.doc_id] = seq
    hashes = []
    for seq in peaks.values():
        hashes.extend(
            a * FP_BANDS + b for a, b in zip(seq, seq[1:])
        )
    freq = Counter(hashes)
    got = q_multimodal_audio_fingerprint(spark, SF_DIR).collect()
    by_doc: dict[int, dict[int, tuple]] = {}
    for r in got:
        by_doc.setdefault(r.doc_id, {})[r.win_idx] = r
    assert set(by_doc) == set(peaks)
    for d, seq in peaks.items():
        assert sorted(by_doc[d]) == list(range(len(seq)))
        for i, p in enumerate(seq):
            row = by_doc[d][i]
            assert row.peak_band == p
            if i + 1 < len(seq):
                h = p * FP_BANDS + seq[i + 1]
                assert row.pair_hash == h
                assert row.n_pairs_same_hash == freq[h]
            else:
                assert row.pair_hash is None


def test_gate_kappa_matches_pure_python(spark):
    from emr_flink_example_spark.operators.textstats import (
        q_quality_fasttext_gate,
        q_quality_gate_kappa,
        q_quality_gopher_rules,
    )

    gop = {
        r.doc_id: r.passes_gopher
        for r in q_quality_gopher_rules(spark, SF_DIR).collect()
    }
    ft = {r.doc_id: r.keep for r in q_quality_fasttext_gate(spark, SF_DIR).collect()}
    common = set(gop) & set(ft)
    a = sum(1 for d in common if gop[d] and ft[d])
    b = sum(1 for d in common if gop[d] and not ft[d])
    c = sum(1 for d in common if not gop[d] and ft[d])
    dd = sum(1 for d in common if not gop[d] and not ft[d])
    n = a + b + c + dd
    po = (a + dd) / n
    pe = ((a + b) * (a + c) + (c + dd) * (b + dd)) / (n * n)
    got = q_quality_gate_kappa(spark, SF_DIR).first()
    assert (got.n_docs, got.both_keep, got.gopher_only, got.fasttext_only,
            got.both_drop) == (n, a, b, c, dd)
    if pe < 1.0:
        kappa = (po - pe) / (1.0 - pe)
        assert got.kappa_micro == math.floor(kappa * 1000000.0 + 0.5)
        assert -1_000_000 <= got.kappa_micro <= 1_000_000
    else:
        assert got.kappa_micro is None


def test_kendall_tau_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        q_stats_kendall_tau,
    )

    rows = load(spark, SF_DIR, "events").select("user_id", "event_type").collect()
    agg: dict[int, list[int]] = {}
    for r in rows:
        x, y = agg.setdefault(r.user_id, [0, 0])
        agg[r.user_id] = [x + 1, y + (1 if r.event_type == "purchase" else 0)]
    pts = list(agg.values())
    n = len(pts)
    nc = nd = 0
    for i in range(n):
        for j in range(i + 1, n):
            s = (pts[i][0] - pts[j][0]) * (pts[i][1] - pts[j][1])
            if s > 0:
                nc += 1
            elif s < 0:
                nd += 1
    tx = Counter(p[0] for p in pts)
    ty = Counter(p[1] for p in pts)
    ties_x = sum(t * (t - 1) // 2 for t in tx.values())
    ties_y = sum(t * (t - 1) // 2 for t in ty.values())
    n0 = n * (n - 1) // 2
    tau = (nc - nd) / math.sqrt((n0 - ties_x) * (n0 - ties_y))
    got = q_stats_kendall_tau(spark, SF_DIR).first()
    assert got.headroom_ok is True
    assert (got.n_users, got.n_concordant, got.n_discordant) == (n, nc, nd)
    assert (got.ties_x, got.ties_y) == (ties_x, ties_y)
    assert got.tau_b_micro == math.floor(tau * 1000000.0 + 0.5)
    # Kendall and Spearman must agree in SIGN on the same monotone signal
    from emr_flink_example_spark.operators.analytics import (
        q_stats_spearman_corr,
    )

    rho = q_stats_spearman_corr(spark, SF_DIR).first().rho_micro
    if abs(got.tau_b_micro) > 10_000:
        assert (got.tau_b_micro > 0) == (rho > 0)


def test_shapley_matches_pure_python(spark):
    from itertools import combinations as _comb

    from emr_flink_example_spark.operators.analytics import (
        SHAPLEY_CHANNELS,
        q_attribution_shapley,
    )

    rows = load(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    ).collect()
    first_p: dict[int, object] = {}
    for r in rows:
        if r.event_type == "purchase":
            if r.user_id not in first_p or r.ts < first_p[r.user_id]:
                first_p[r.user_id] = r.ts
    journeys: dict[int, int] = {}
    touched: dict[int, bool] = {}
    for r in rows:
        if r.event_type == "purchase":
            continue
        conv = r.user_id in first_p
        if conv and r.ts >= first_p[r.user_id]:
            continue
        mask = journeys.get(r.user_id, 0)
        if r.event_type in SHAPLEY_CHANNELS:
            mask |= 1 << SHAPLEY_CHANNELS.index(r.event_type)
        journeys[r.user_id] = mask
        touched[r.user_id] = conv
    jagg: Counter = Counter()
    for u, m in journeys.items():
        if touched[u]:
            jagg[m] += 1
    c = len(SHAPLEY_CHANNELS)
    v = {
        s: sum(n for m, n in jagg.items() if m & s == m)
        for s in range(1 << c)
    }
    fact = math.factorial
    phi = {}
    for i, ch in enumerate(SHAPLEY_CHANNELS):
        tot = 0
        for s in range(1 << c):
            if s & (1 << i):
                continue
            sz = bin(s).count("1")
            tot += fact(sz) * fact(c - 1 - sz) * (v[s + (1 << i)] - v[s])
        phi[ch] = tot
    got = {r.channel: r for r in q_attribution_shapley(spark, SF_DIR).collect()}
    assert set(got) == set(SHAPLEY_CHANNELS)
    for ch in SHAPLEY_CHANNELS:
        assert got[ch].phi_cfact == phi[ch]
        assert got[ch].phi_micro == math.floor(
            phi[ch] / fact(c) * 1000000.0 + 0.5
        )
        assert got[ch].v_full == v[(1 << c) - 1]
        assert got[ch].v_empty == v[0]
    # efficiency axiom: attributions sum to v(full) - v(empty), exactly,
    # in C!-scaled integers
    assert sum(phi.values()) == fact(c) * (v[(1 << c) - 1] - v[0])


def test_precision_recall_matches_pure_python(spark):
    from emr_flink_example_spark.operators.textstats import (
        MRR_K,
        MRR_QUERIES,
        q_retrieval_precision_recall,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    toks = {r.doc_id: Counter(_tokens(r.text)) for r in docs}
    got = {r.query_id: r for r in q_retrieval_precision_recall(spark, SF_DIR).collect()}
    for qi, terms in enumerate(MRR_QUERIES):
        scored = []
        for d, tf in toks.items():
            total = sum(tf[t] for t in terms)
            if total > 0:
                scored.append((-total, d, all(tf[t] > 0 for t in terms)))
        scored.sort()
        n_rel = sum(1 for _, _, r in scored if r)
        top = scored[:MRR_K]
        h = sum(1 for _, _, r in top if r)
        row = got[qi]
        assert row.hits_at_k == h
        assert row.n_retrieved == min(MRR_K, len(scored))
        assert row.n_relevant == n_rel
        assert row.precision_micro == (2_000_000 * h + MRR_K) // (2 * MRR_K)
        assert row.recall_micro == (
            (2_000_000 * h + n_rel) // (2 * n_rel) if n_rel else 0
        )
        assert row.f1_micro == (
            (4_000_000 * h + MRR_K + n_rel) // (2 * (MRR_K + n_rel)) if h else 0
        )


def test_node_jaccard_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        NODE_JACCARD_TOP_K,
        q_graph_node_jaccard,
    )
    from emr_flink_example_spark.operators.dedup import (
        AA_ADJ_CAP,
        q_simhash_hamming_pairs,
    )

    pairs = [
        (r.doc_a, r.doc_b)
        for r in q_simhash_hamming_pairs(spark, SF_DIR).select("doc_a", "doc_b").collect()
    ]
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    deg = {w: len(ns) for w, ns in adj.items()}
    wedge: Counter = Counter()
    for w, ns in adj.items():
        capped = sorted(ns)[:AA_ADJ_CAP]
        for i in range(len(capped)):
            for j in range(i + 1, len(capped)):
                wedge[(capped[i], capped[j])] += 1
    edge_set = set(pairs)
    rows = []
    for (u, v), n_common in wedge.items():
        union = deg[u] + deg[v] - n_common
        rows.append(
            (
                u, v, n_common, deg[u], deg[v],
                (2_000_000 * n_common + union) // (2 * union),
                (u, v) in edge_set,
            )
        )
    rows.sort(key=lambda r: (-r[5], r[0], r[1]))
    got = q_graph_node_jaccard(spark, SF_DIR).collect()
    assert [
        (r.doc_a, r.doc_b, r.n_common, r.deg_u, r.deg_v, r.jaccard_micro, r.is_edge)
        for r in got
    ] == rows[:NODE_JACCARD_TOP_K]


def test_lateral_topn_matches_pure_python(spark):
    from emr_flink_example_spark.operators.relational import (
        LATERAL_TOP_N,
        q_join_lateral_topn,
    )

    cust = {
        r.c_custkey: r.c_name
        for r in load(spark, SF_DIR, "customer")
        .where("c_mktsegment = 'BUILDING'")
        .collect()
    }
    orders: dict[int, list] = {}
    for r in load(spark, SF_DIR, "orders").collect():
        orders.setdefault(r.o_custkey, []).append(
            (-r.o_totalprice, r.o_orderkey, r.o_totalprice)
        )
    want = []
    for ck in cust:
        top = sorted(orders.get(ck, []))[:LATERAL_TOP_N]
        for _, ok_, price in top:
            want.append((ck, cust[ck], ok_, round(price, 2)))
    got = sorted(
        (r.c_custkey, r.c_name, r.o_orderkey, r.o_totalprice)
        for r in q_join_lateral_topn(spark, SF_DIR).collect()
    )
    assert got == sorted(want)
    # no customer exceeds N rows
    per = Counter(g[0] for g in got)
    assert max(per.values()) <= LATERAL_TOP_N


def test_null_safe_eq_keeps_null_group(spark):
    from emr_flink_example_spark.operators.relational import (
        q_join_null_safe_eq,
    )

    rows = load(spark, SF_DIR, "orders").select("o_orderpriority").collect()
    keys = [
        None if "URGENT" in r.o_orderpriority else r.o_orderpriority[0]
        for r in rows
    ]
    cnt = Counter(keys)
    got = {r.k: r for r in q_join_null_safe_eq(spark, SF_DIR).collect()}
    assert set(got) == set(cnt)
    for k, n in cnt.items():
        row = got[k]
        assert (row.n_a, row.n_b) == (n, n)
        assert row.n_pairs_null_safe == n * n
        # plain = drops NULL-NULL matches; non-null groups are unchanged
        assert row.n_pairs_plain_eq == (0 if k is None else n * n)
    assert None in got and got[None].n_pairs_null_safe > 0


def test_cumulative_distinct_matches_pure_python(spark):
    from emr_flink_example_spark.operators.relational import (
        q_window_cumulative_distinct,
    )

    rows = load(spark, SF_DIR, "events").select("user_id", "ts").collect()
    by_day: dict = {}
    first: dict[int, object] = {}
    for r in rows:
        d = r.ts.date()
        by_day.setdefault(d, set()).add(r.user_id)
        if r.user_id not in first or d < first[r.user_id]:
            first[r.user_id] = d
    new_per_day = Counter(first.values())
    got = [r for r in q_window_cumulative_distinct(spark, SF_DIR).collect()]
    assert [r.day for r in got] == sorted(by_day)
    cum = 0
    for r in got:
        assert r.n_active_users == len(by_day[r.day])
        assert r.n_new_users == new_per_day.get(r.day, 0)
        assert r.n_returning_users == r.n_active_users - r.n_new_users
        cum += r.n_new_users
        assert r.n_cumulative_users == cum
    # reach ends at the total distinct population
    assert cum == len(first)


def test_ewma_crossover_matches_pure_python(spark):
    from emr_flink_example_spark.operators.timeseries import (
        EWMA_SMA_DAYS,
        N_DAYS,
        q_timeseries_ewma_crossover,
    )

    rows = load(spark, SF_DIR, "events").select("user_id", "ts", "value").collect()
    daily: dict[tuple, int] = {}
    for r in rows:
        k = (r.user_id, r.ts.day)
        daily[k] = daily.get(k, 0) + math.floor(r.value * 100 + 0.5)
    users = sorted({u for u, _ in daily})
    got: dict[tuple, object] = {}
    for r in q_timeseries_ewma_crossover(spark, SF_DIR).collect():
        got[(r.user_id, r.day)] = r
    assert set(got) == {(u, d) for u in users for d in range(1, N_DAYS + 1)}
    for u in users:
        vs = [daily.get((u, d), 0) for d in range(1, N_DAYS + 1)]
        # reference: the textbook float recurrence with alpha = 1/2 —
        # exact in binary for integer cents, so it must equal the
        # integer prefix-sum restatement bit for bit
        e = float(vs[0])
        prev_above = None
        for d in range(1, N_DAYS + 1):
            if d > 1:
                e = (vs[d - 1] + e) / 2.0
            row = got[(u, d)]
            assert row.headroom_ok is True
            assert row.ewma_micro == math.floor(e * 1000000.0 + 0.5)
            if d >= EWMA_SMA_DAYS:
                s3 = sum(vs[d - EWMA_SMA_DAYS : d])
                assert row.sma3_cents == s3
                above = e > s3 / EWMA_SMA_DAYS
                assert row.above_sma == above
                if prev_above is not None:
                    assert row.is_crossover == (above != prev_above)
                prev_above = above
            else:
                assert row.sma3_cents is None
                assert row.above_sma is None
                assert row.is_crossover is None


def test_funnel_windowed_le_unbounded(spark):
    from emr_flink_example_spark.operators.analytics import (
        FUNNEL_WINDOW_SECONDS,
        q_funnel_conversion,
        q_funnel_windowed,
    )

    rows = load(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.ts, r.event_type))
    n_v = n_c = n_p = 0
    for evs in by_user.values():
        views = [t for t, e in evs if e == "view"]
        if not views:
            continue
        n_v += 1
        tv = min(views)
        clicks = [
            t for t, e in evs
            if e == "click" and t > tv
            and (t - tv).total_seconds() <= FUNNEL_WINDOW_SECONDS
        ]
        if not clicks:
            continue
        n_c += 1
        tc = min(clicks)
        purchases = [
            t for t, e in evs
            if e == "purchase" and t > tc
            and (t - tc).total_seconds() <= FUNNEL_WINDOW_SECONDS
        ]
        if purchases:
            n_p += 1
    got = q_funnel_windowed(spark, SF_DIR).first()
    assert (got.n_viewed, got.n_clicked_in_window, got.n_purchased_in_window) == (
        n_v, n_c, n_p,
    )
    # the deadline can only LOWER counts vs the unbounded funnel
    unbounded = q_funnel_conversion(spark, SF_DIR).first()
    assert got.n_clicked_in_window <= unbounded.n_clicked
    assert got.n_purchased_in_window <= unbounded.n_purchased


def test_survivor_by_quality_matches_components_and_scores(spark):
    from emr_flink_example_spark.operators.analytics import (
        q_dedup_survivor_by_quality,
    )
    from emr_flink_example_spark.operators.dedup import (
        q_dedup_connected_components,
    )
    from emr_flink_example_spark.operators.textstats import (
        q_quality_fasttext_gate,
    )

    comp = {
        r.doc_id: r.component_id
        for r in q_dedup_connected_components(spark, SF_DIR).collect()
    }
    scores = {
        r.doc_id: r.score_micro
        for r in q_quality_fasttext_gate(spark, SF_DIR).collect()
    }
    clusters: dict[int, list[int]] = {}
    for d, c in comp.items():
        clusters.setdefault(c, []).append(d)
    winner = {
        c: min(ds, key=lambda d: (-scores.get(d, -(10**12)), d))
        for c, ds in clusters.items()
    }
    got = {r.doc_id: r for r in q_dedup_survivor_by_quality(spark, SF_DIR).collect()}
    n_docs = load(spark, SF_DIR, "documents").count()
    assert len(got) == n_docs
    for d, r in got.items():
        if d in comp:
            assert r.survivor_doc_id == winner[comp[d]]
            assert r.cluster_size == len(clusters[comp[d]])
        else:
            assert r.survivor_doc_id == d
            assert r.cluster_size == 1
        assert r.is_survivor == (r.survivor_doc_id == d)
    # every cluster's survivor has the max score in its cluster
    for c, ds in clusters.items():
        best = max(scores.get(d, -(10**12)) for d in ds)
        assert scores.get(winner[c], -(10**12)) == best


def test_clustering_coefficient_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        q_graph_clustering_coefficient,
    )
    from emr_flink_example_spark.operators.dedup import (
        q_graph_triangle_count,
    )

    tri = {
        r.doc_id: (r.degree, r.n_triangles)
        for r in q_graph_triangle_count(spark, SF_DIR).collect()
    }
    closed_x2 = sum(2 * t for _, t in tri.values())
    wedges_x2 = sum(d * (d - 1) for d, _ in tri.values())
    got = {r.doc_id: r for r in q_graph_clustering_coefficient(spark, SF_DIR).collect()}
    assert set(got) == set(tri)
    for doc, (d, t) in tri.items():
        row = got[doc]
        assert (row.degree, row.n_triangles) == (d, t)
        if d >= 2:
            den = d * (d - 1)
            assert row.local_cc_micro == (2_000_000 * 2 * t + den) // (2 * den)
            assert 0 <= row.local_cc_micro <= 1_000_000
        else:
            assert row.local_cc_micro is None
        assert row.transitivity_micro == (
            (2_000_000 * closed_x2 + wedges_x2) // (2 * wedges_x2)
            if wedges_x2
            else 0
        )


def test_rake_matches_pure_python(spark):
    from emr_flink_example_spark.operators.textstats import (
        RAKE_MAX_PHRASE,
        RAKE_TOPK,
        STOPWORDS,
        q_text_keyphrase_rake,
    )

    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    instances = []
    for r in docs:
        run: list[str] = []
        for tok in _tokens(r.text) + ["the"]:  # sentinel flushes the tail
            if tok in STOPWORDS:
                if run:
                    instances.append(tuple(run[:RAKE_MAX_PHRASE]))
                    run = []
            else:
                run.append(tok)
    deg: Counter = Counter()
    freq: Counter = Counter()
    for words in instances:
        for w in words:
            deg[w] += len(words)
            freq[w] += 1
    occurrences = Counter(" ".join(w) for w in instances)
    rows = []
    for phrase, n_occ in occurrences.items():
        words = phrase.split(" ")
        den = 1
        for w in words:
            den *= freq[w]
        num = sum(deg[w] * (den // freq[w]) for w in words)
        rows.append(
            (
                phrase,
                len(words),
                n_occ,
                num,
                den,
                math.floor(num / den * 1000000.0 + 0.5),
            )
        )
    rows.sort(key=lambda t: (-t[5], t[0]))
    got = q_text_keyphrase_rake(spark, SF_DIR).collect()
    assert [
        (r.phrase, r.n_words, r.n_occurrences, r.score_num, r.score_den,
         r.rake_micro)
        for r in got
    ] == rows[:RAKE_TOPK]
    assert all(r.headroom_ok for r in got)
    # degree/freq ratio bounds: every word score is within [1, MAX], so a
    # k-word phrase scores within [k, k*MAX] — micro-quantized
    for r in got:
        assert r.n_words * 1_000_000 <= r.rake_micro <= (
            r.n_words * RAKE_MAX_PHRASE * 1_000_000
        )


def test_weighted_median_matches_pure_python(spark):
    from emr_flink_example_spark.operators.relational import (
        q_agg_weighted_median,
    )

    rows = load(spark, SF_DIR, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    ).collect()
    groups: dict[str, dict[int, int]] = {}
    for r in rows:
        price = math.floor(r.l_extendedprice * 100 + 0.5)
        g = groups.setdefault(r.l_returnflag, {})
        g[price] = g.get(price, 0) + int(r.l_quantity)
    got = {r.grp: r for r in q_agg_weighted_median(spark, SF_DIR).collect()}
    assert set(got) == set(groups)
    for grp, weights in groups.items():
        total = sum(weights.values())
        cum = 0
        for price in sorted(weights):
            cum += weights[price]
            if 2 * cum >= total:
                break
        row = got[grp]
        assert row.weighted_median_cents == price
        assert row.cum_weight_at_median == cum
        assert row.total_weight == total


def test_heaps_law_matches_pure_python(spark):
    from emr_flink_example_spark.operators.textstats import (
        HEAPS_CHECKPOINT_DOCS,
        q_vocab_heaps_law,
    )

    docs = sorted(
        load(spark, SF_DIR, "documents").select("doc_id", "text").collect(),
        key=lambda r: r.doc_id,
    )
    tokked = [(r.doc_id, _tokens(r.text)) for r in docs]
    tokked = [(d, t) for d, t in tokked if t]  # zero-token docs hold no pos
    seen: set[str] = set()
    cum_tokens = 0
    pts = []
    n = len(tokked)
    for i, (_, toks) in enumerate(tokked, start=1):
        cum_tokens += len(toks)
        seen.update(toks)
        if i % HEAPS_CHECKPOINT_DOCS == 0 or i == n:
            pts.append((i, cum_tokens, len(seen)))
    r = len(pts)
    xs = [math.floor(math.log(ct) * 1000 + 0.5) for _, ct, _ in pts]
    ys = [math.floor(math.log(cv) * 1000 + 0.5) for _, _, cv in pts]
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    sxy = sum(x * y for x, y in zip(xs, ys))
    beta = (r * sxy - sx * sy) / (r * sxx - sx * sx)
    lnk = (sy / r - beta * sx / r) / 1000.0
    got = {row.pos: row for row in q_vocab_heaps_law(spark, SF_DIR).collect()}
    assert set(got) == {p for p, _, _ in pts}
    for p, ct, cv in pts:
        row = got[p]
        assert (row.cum_tokens, row.cum_vocab) == (ct, cv)
        assert row.n_checkpoints == r
        assert row.heaps_beta_micro == math.floor(beta * 1000000.0 + 0.5)
        assert row.heaps_lnk_micro == math.floor(lnk * 1000000.0 + 0.5)
    # sublinear growth: beta < 1 always; the synthetic fixture's CLOSED
    # ~31-type vocabulary saturates immediately, so beta ~ 0 here (an
    # open Zipfian corpus would give 0 < beta < 1 strictly)
    assert 0 <= got[pts[0][0]].heaps_beta_micro < 1_000_000
    assert got[pts[-1][0]].cum_vocab >= got[pts[0][0]].cum_vocab


def test_brown_forsythe_matches_pure_python(spark):
    from emr_flink_example_spark.operators.analytics import (
        q_abtest_brown_forsythe,
    )

    rows = load(spark, SF_DIR, "events").where("event_type = 'purchase'").select(
        "user_id", "value"
    ).collect()
    arms: dict[int, list[int]] = {0: [], 1: []}
    for r in rows:
        arms[r.user_id % 2].append(math.floor(r.value * 1000 + 0.5))
    meds = {}
    for a, vs in arms.items():
        vs.sort()
        total = len(vs)
        cnt = Counter(vs)
        cum = 0
        for v in sorted(cnt):
            cum += cnt[v]
            if 2 * cum >= total:
                meds[a] = v
                break
    zs = {a: [abs(v - meds[a]) for v in vs] for a, vs in arms.items()}
    k = 2
    n_total = sum(len(z) for z in zs.values())
    sz = sum(sum(z) for z in zs.values())
    ss_within = sum(
        sum(v * v for v in z) - sum(z) ** 2 / len(z) for z in zs.values()
    )
    sum_sq_over_n = sum(sum(z) ** 2 / len(z) for z in zs.values())
    w = (
        ((n_total - k) / (k - 1))
        * (sum_sq_over_n - sz * sz / n_total)
        / ss_within
    )
    got = q_abtest_brown_forsythe(spark, SF_DIR).first()
    assert (got.k, got.n_total) == (k, n_total)
    assert got.headroom_ok is True
    assert got.sum_abs_dev_milli == sz
    assert got.bf_w_micro == math.floor(w * 1000000.0 + 0.5)
    assert got.bf_w_micro >= 0
