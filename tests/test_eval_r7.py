"""Round-7 wave-20 semantics: model-evaluation rank statistics
(ROC AUC / KS / gains deciles) and the Benford first-digit audit —
each cross-checked against a driver-side brute force at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from safeascent_spark import domain
from safeascent_spark.operators import evalrank as EV
from safeascent_spark.operators import monitor as MON
from tests.conftest import SF_SMOKE


def _scored(spark):
    return [(r.event_type, r.event_id, math.floor(r.value * 100))
            for r in domain.load_table(spark, SF_SMOKE, "events")
                          .select("event_type", "event_id", "value")
                          .collect()]


def test_roc_auc_matches_pairwise_bruteforce(spark):
    """2U literally counts (pos > neg) pairs x2 + ties x1."""
    data = _scored(spark)
    rows = {r.event_type: r for r in
            EV.q_eval_roc_auc(spark, SF_SMOKE).collect()}
    types = {t for t, _, _ in data}
    assert set(rows) == types
    for t in types:
        pos = sorted(s for ty, _, s in data if ty == t)
        neg = sorted(s for ty, _, s in data if ty != t)
        # O(n log n) brute force via sorted merge counts
        import bisect
        u2 = 0
        for s in pos:
            lo = bisect.bisect_left(neg, s)
            hi = bisect.bisect_right(neg, s)
            u2 += 2 * lo + (hi - lo)
        r = rows[t]
        assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
        assert r.auc_ppm == u2 * 1_000_000 // (2 * len(pos) * len(neg))


def test_ks_matches_cdf_bruteforce(spark):
    data = _scored(spark)
    rows = {r.event_type: r for r in
            EV.q_eval_ks_statistic(spark, SF_SMOKE).collect()}
    scores = sorted({s for _, _, s in data})
    for t in rows:
        pos = [s for ty, _, s in data if ty == t]
        neg = [s for ty, _, s in data if ty != t]
        best, best_s = -1, None
        cp = cn = 0
        pos_sorted, neg_sorted = sorted(pos), sorted(neg)
        import bisect
        for s in scores:
            cp = bisect.bisect_right(pos_sorted, s)
            cn = bisect.bisect_right(neg_sorted, s)
            d = abs(cp * len(neg) - cn * len(pos))
            if d > best:
                best, best_s = d, s
        r = rows[t]
        assert r.ks_at_score_c == best_s
        assert r.ks_ppm == best * 1_000_000 // (len(pos) * len(neg))


def test_gains_deciles_capture_and_lift(spark):
    data = _scored(spark)
    rows = EV.q_ml_gains_deciles(spark, SF_SMOKE).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # replicate: rank by score desc, event_id asc; decile by row_number
    ordered = sorted(data, key=lambda x: (-x[2], x[1]))
    n = len(ordered)
    dec_rows = defaultdict(list)
    for i, (ty, _, _) in enumerate(ordered):
        dec_rows[i * 10 // n + 1].append(ty)
    cum_pos = cum_rows = 0
    total_pos = sum(1 for ty, _, _ in data if ty == EV.GAINS_POS_TYPE)
    for r in rows:
        got = dec_rows[r.decile]
        np = sum(1 for ty in got if ty == EV.GAINS_POS_TYPE)
        assert (r.n_rows, r.n_pos) == (len(got), np)
        cum_pos += np
        cum_rows += len(got)
        assert r.cum_pos == cum_pos
        assert r.capture_ppm == cum_pos * 1_000_000 // total_pos
        assert r.lift_ppm == cum_pos * n * 1_000_000 // (cum_rows * total_pos)
    # decile sizes differ by at most 1 (row_number split)
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_benford_expected_table_is_exact():
    """The hardcoded integer ppm table IS round(log10(1+1/d)*1e6) and
    partitions 1e6 exactly."""
    for d, p in MON.BENFORD_PPM.items():
        assert p == round(math.log10(1 + 1 / d) * 1_000_000)
    assert sum(MON.BENFORD_PPM.values()) == 1_000_000


def test_benford_counts_match_bruteforce(spark):
    rows = {r.digit: r for r in MON.q_dq_benford(spark, SF_SMOKE).collect()}
    prices = [math.floor(r.o_totalprice * 100) for r in
              domain.load_table(spark, SF_SMOKE, "orders")
                    .select("o_totalprice").collect()]
    n = len(prices)
    counts = defaultdict(int)
    for p in prices:
        counts[int(str(p)[0])] += 1
    assert set(rows) == set(counts)
    for d, r in rows.items():
        assert r.n_obs == counts[d]
        assert r.obs_ppm == counts[d] * 1_000_000 // n
        x = counts[d] * 1_000_000 - n * MON.BENFORD_PPM[d]
        assert r.chi2_micro == x * x // (n * MON.BENFORD_PPM[d])


# --- wave 21: embedding certification + Neyman sampling plan ----------------

def test_quantization_error_matches_bruteforce(spark):
    from safeascent_spark.operators import similarity as SIM
    rows = {r.label: r for r in
            SIM.q_embedding_quantization_error(spark, SF_SMOKE).collect()}
    vecs = (domain.load_table(spark, SF_SMOKE, "embeddings")
            .select("label", "embedding").collect())
    per = defaultdict(list)
    for r in vecs:
        for x in r.embedding:
            x = float(x)
            q = round(max(-1.0, min(1.0, x)) * 127)
            per[r.label].append(math.floor((x - q / 127.0) * 1_000_000))
    assert set(rows) == set(per)
    for lb, errs in per.items():
        r = rows[lb]
        assert r.n_vals == len(errs)
        assert r.bias_sum_u == sum(errs)
        assert r.abs_sum_u == sum(abs(e) for e in errs)
        assert r.max_abs_u == max(abs(e) for e in errs)
        assert r.mse_p12 == sum(e * e for e in errs) // len(errs)


def test_norm_profile_low_gate(spark):
    from safeascent_spark.operators import similarity as SIM
    rows = {r.label: r for r in
            SIM.q_embedding_norm_profile(spark, SF_SMOKE).collect()}
    vecs = (domain.load_table(spark, SF_SMOKE, "embeddings")
            .select("label", "embedding").collect())
    norms = defaultdict(list)
    for r in vecs:
        n2 = sum(round(max(-1.0, min(1.0, float(x))) * 127) ** 2
                 for x in r.embedding)
        norms[r.label].append(n2)
    allv = [n for v in norms.values() for n in v]
    g_milli = sum(allv) * 1000 // len(allv)
    for lb, ns in norms.items():
        r = rows[lb]
        assert (r.n_vecs, r.min_norm2, r.max_norm2) == \
            (len(ns), min(ns), max(ns))
        assert r.mean_norm2_milli == sum(ns) * 1000 // len(ns)
        assert r.n_low == sum(1 for n in ns if n * 2000 < g_milli)


def test_neyman_allocation_invariants(spark):
    from safeascent_spark.operators import curation as CU
    rows = CU.q_sample_stratified_neyman(spark, SF_SMOKE).collect()
    # budget exactly exhausted
    assert sum(r.alloc_n for r in rows) == CU.NEYMAN_BUDGET
    # allocation proportional to N_h * sigma_h within the +/-1 integer
    # granularity of largest-remainder rounding
    tw = sum(r.sd_scaled for r in rows)
    for r in rows:
        exact = CU.NEYMAN_BUDGET * r.sd_scaled / tw
        assert abs(r.alloc_n - exact) < 1.0
        assert r.sampling_ppm == r.alloc_n * 1_000_000 // r.n_rows
    # sd_scaled really is floor(sqrt(N*Sxx - Sx^2)) on exact cents
    data = defaultdict(list)
    for e in (domain.load_table(spark, SF_SMOKE, "events")
                    .select("event_type", "value").collect()):
        data[e.event_type].append(math.floor(e.value * 100))
    for r in rows:
        xs = data[r.event_type]
        v = len(xs) * sum(x * x for x in xs) - sum(xs) ** 2
        assert r.sd_scaled == math.floor(math.sqrt(v))


# --- wave 22: duplicated spans + lexical profiles ----------------------------

def test_duplicate_spans_cover_exactly_the_dup_windows(spark):
    """Spans are the MERGED intervals of duplicated windows: every
    duplicated window start lies inside a span, spans don't overlap or
    touch within W tokens, and each span's window count is exact."""
    from safeascent_spark.operators import dedup as D
    W = D.RNG_W
    rows = D.q_dedup_duplicate_spans(spark, SF_SMOKE).collect()
    # brute force the duplicated window-start sets
    docs = {r.doc_id: r.text for r in
            D._rng_corpus(
                domain.load_table(spark, SF_SMOKE, "documents")
                      .select("doc_id", "text")).collect()}
    from collections import Counter
    win_docs = defaultdict(set)
    starts = {}
    for doc, text in docs.items():
        toks = [t for t in text.split(" ") if t]
        ws = [" ".join(toks[i:i + W]) for i in range(len(toks) - W + 1)]
        starts[doc] = ws
        for w in set(ws):
            win_docs[w].add(doc)
    dup_pos = defaultdict(list)
    for doc, ws in starts.items():
        for i, w in enumerate(ws, start=1):
            if len(win_docs[w]) >= D.RNG_MIN_DF:
                dup_pos[doc].append(i)
    # merge brute-force islands
    expected = []
    for doc in sorted(dup_pos):
        ps = dup_pos[doc]
        cur = [ps[0], ps[0]]
        spans = []
        for p in ps[1:]:
            if p - cur[1] > W:
                spans.append(tuple(cur))
                cur = [p, p]
            else:
                cur[1] = p
        spans.append(tuple(cur))
        for a, b in spans:
            expected.append((doc, a, b + W - 1, b + W - 1 - a + 1))
    got = [(r.doc_id, r.span_start, r.span_end, r.span_tokens)
           for r in rows]
    assert got == expected
    # window counts per span
    cnt = Counter()
    for doc, ps in dup_pos.items():
        for r in rows:
            if r.doc_id == doc:
                cnt[(doc, r.span_start)] = sum(
                    1 for p in ps if r.span_start <= p <= r.span_end)
    for r in rows:
        assert r.n_dup_windows == cnt[(r.doc_id, r.span_start)]


def test_ttr_hapax_matches_bruteforce(spark):
    from safeascent_spark.operators import text as TX
    rows = {r.source: r for r in
            TX.q_text_ttr_hapax(spark, SF_SMOKE).collect()}
    from collections import Counter
    per = defaultdict(Counter)
    ndocs = defaultdict(int)
    for r in (domain.load_table(spark, SF_SMOKE, "documents")
                    .select("source", "text").collect()):
        ndocs[r.source] += 1
        per[r.source].update(t for t in r.text.split(" ") if t)
    for src, c in per.items():
        r = rows[src]
        n_tok, n_typ = sum(c.values()), len(c)
        n_hapax = sum(1 for v in c.values() if v == 1)
        assert (r.n_docs, r.n_tokens, r.n_types, r.n_hapax) == \
            (ndocs[src], n_tok, n_typ, n_hapax)
        assert r.ttr_ppm == n_typ * 1_000_000 // n_tok
        assert r.hapax_ppm == n_hapax * 1_000_000 // n_typ


def test_trigram_profile_topk(spark):
    from safeascent_spark.operators import text as TX
    rows = TX.q_text_char_trigram_profile(spark, SF_SMOKE).collect()
    from collections import Counter
    per = defaultdict(Counter)
    for r in (domain.load_table(spark, SF_SMOKE, "documents")
                    .select("lang", "text").collect()):
        t = r.text
        per[r.lang].update(t[i:i + 3] for i in range(len(t) - 2))
    by_lang = defaultdict(list)
    for r in rows:
        by_lang[r.lang].append(r)
    assert set(by_lang) == set(per)
    for lang, rs in by_lang.items():
        want = sorted(per[lang].items(), key=lambda kv: (-kv[1], kv[0]))
        want = want[:TX.TRIGRAM_TOP_K]
        assert [(r.rnk, r.tri, r.cnt) for r in rs] == \
            [(i + 1, tri, c) for i, (tri, c) in enumerate(want)]


# --- wave 23: spatial kNN, link prediction, sequence gaps --------------------

def test_geo_knn_matches_bruteforce_under_cap(spark):
    """The 3x3 grid candidates lose NOTHING under the 300 km cap: the
    per-route top-5 equals a full cross-join brute force."""
    from safeascent_spark.operators import relational as R
    from safeascent_spark import kernels as K
    from pyspark.sql import functions as F
    rows = defaultdict(list)
    for r in R.q_geo_knn_grid(spark, SF_SMOKE).collect():
        rows[r.route_id].append((r.rnk, r.accident_id, r.distance_km))
    # brute force via a full cross join (sf0.001 only)
    rts = (domain.routes_df(spark, SF_SMOKE)
           .join(domain.locations_df(spark, SF_SMOKE), "location_id")
           .select("route_id", F.col("latitude").alias("r_lat"),
                   F.col("longitude").alias("r_lon")))
    acc = domain.accidents_df(spark, SF_SMOKE).select(
        "accident_id", F.col("latitude").alias("a_lat"),
        F.col("longitude").alias("a_lon"))
    d = F.round(K.haversine_km("r_lat", "r_lon", "a_lat", "a_lon"), 6)
    full = (rts.crossJoin(acc)
               .filter(K.haversine_km("r_lat", "r_lon",
                                      "a_lat", "a_lon") <= 300.0)
               .select("route_id", "accident_id", d.alias("dist"))
               .collect())
    want = defaultdict(list)
    for r in full:
        want[r.route_id].append((r.dist, r.accident_id))
    for rid, cands in want.items():
        cands.sort()
        top = [(i + 1, aid, dist) for i, (dist, aid)
               in enumerate(cands[:R.GEO_KNN_K])]
        assert rows.get(rid, []) == top
    assert set(rows) == {rid for rid, c in want.items() if c}


def test_common_neighbors_bruteforce(spark):
    from safeascent_spark.operators import graph as G
    rows = G.q_graph_common_neighbors(spark, SF_SMOKE).collect()
    edges = G._pagerank_edges(spark, SF_SMOKE).collect()
    nbrs = defaultdict(set)
    for e in edges:
        if e.src != e.dst:
            nbrs[e.src].add(e.dst)
            nbrs[e.dst].add(e.src)
    deg = {v: len(ns) for v, ns in nbrs.items()}
    scores = defaultdict(lambda: [0, 0])
    for c, ns in nbrs.items():
        if deg[c] > G.CN_MAX_DEG:
            continue
        ns_sorted = sorted(ns)
        for i, a in enumerate(ns_sorted):
            for b in ns_sorted[i + 1:]:
                scores[(a, b)][0] += 1
                scores[(a, b)][1] += 1_000_000 // deg[c]
    want = sorted(((s[1], a, b, s[0]) for (a, b), s in scores.items()),
                  key=lambda x: (-x[0], x[1], x[2]))[:G.CN_TOP_K]
    got = [(r.aa_score_ppm, r.node_a, r.node_b, r.common_cnt)
           for r in rows]
    assert got == want


def test_sequence_gaps_find_the_seeded_holes(spark):
    from safeascent_spark.operators import monitor as MON
    rows = MON.q_dq_sequence_gaps(spark, SF_SMOKE).collect()
    ids = [r.event_id for r in
           (domain.load_table(spark, SF_SMOKE, "events")
                  .select("event_id").collect())]
    kept = [i for i in ids if i % MON.SEQ_DROP_MOD != MON.SEQ_DROP_REM]
    lo, hi = min(kept), max(kept)
    per_block = defaultdict(int)
    for i in kept:
        per_block[i // MON.SEQ_BLOCK] += 1
    want = []
    for b in sorted(per_block):
        exp = (min((b + 1) * MON.SEQ_BLOCK - 1, hi)
               - max(b * MON.SEQ_BLOCK, lo) + 1)
        if exp - per_block[b] > 0:
            want.append((b, exp, per_block[b], exp - per_block[b]))
    assert [(r.block_id, r.expected_n, r.actual_n, r.missing_n)
            for r in rows] == want
    # total missing = the number of seeded drops inside [lo, hi]
    dropped = [i for i in ids
               if i % MON.SEQ_DROP_MOD == MON.SEQ_DROP_REM
               and lo <= i <= hi]
    assert sum(r.missing_n for r in rows) == len(dropped)


# --- wave 24: iterative linear algebra + audits -------------------------------

def test_pca_power_iteration_matches_numpy_replay(spark):
    """The integer iterates EXACTLY replay in driver-side integer math,
    and the final direction agrees with numpy's leading eigenvector to
    within the integer truncation (cosine > 0.999)."""
    from safeascent_spark.operators import olap as OL
    rows = OL.q_embedding_pca_power(spark, SF_SMOKE).collect()
    got = {r.dim: r.component_ppm for r in rows}
    # rebuild the integer covariance driver-side
    vecs = [[round(max(-1.0, min(1.0, float(x))) * 127)
             for x in r.embedding]
            for r in (domain.load_table(spark, SF_SMOKE, "embeddings")
                           .select("embedding").collect())]
    n, dim = len(vecs), len(vecs[0])
    sx = [sum(v[i] for v in vecs) for i in range(dim)]
    cov = {}
    for i in range(dim):
        for j in range(i, dim):
            sxy = sum(v[i] * v[j] for v in vecs)
            c = (n * sxy - sx[i] * sx[j]) * 1000
            q = c // (n * n) if c >= 0 else -((-c) // (n * n))
            cov[(i, j)] = q
            cov[(j, i)] = q
    v = [OL.PCA_SCALE] * dim
    for _ in range(OL.PCA_ITERS):
        w = [sum(cov[(i, j)] * v[j] for j in range(dim))
             for i in range(dim)]
        m = max(max(abs(x) for x in w), 1)
        v = [x * OL.PCA_SCALE // m if x >= 0
             else -((-x) * OL.PCA_SCALE // m) for x in w]
    assert got == {i: v[i] for i in range(dim)}
    # convergence check: the synthetic embeddings are near-isotropic
    # (lambda2/lambda1 ~ 1), so K rounds cannot pin the DIRECTION — the
    # honest power-iteration invariant is the Rayleigh quotient, which
    # each round improves: the iterate must sit strictly above the
    # all-ones start and within the top of numpy's spectrum.
    import numpy as np
    C = np.array([[cov[(i, j)] for j in range(dim)] for i in range(dim)],
                 dtype=float)
    evals = np.linalg.eigvalsh(C)
    u = np.array([v[i] for i in range(dim)], dtype=float)
    v0 = np.ones(dim)
    ray = lambda x: (x @ C @ x) / (x @ x)  # noqa: E731
    assert ray(u) > ray(v0)
    assert ray(u) <= evals[-1] * (1 + 1e-9)
    assert ray(u) >= 0.5 * evals[-1]


def test_markov_stationary_sums_and_fixpoint(spark):
    from safeascent_spark.operators import analytics as A
    rows = A.q_events_markov_stationary(spark, SF_SMOKE).collect()
    total = sum(r.stationary_ppm for r in rows)
    # two truncation sources per iteration: each T row's p_ppm entries
    # truncate (row sums up to n_types-1 ppm short of 1e6) and each
    # matvec entry truncates by < 1 ppm — bounded by 2*n_types^2 ppm
    # per round
    n = len(rows)
    assert 1_000_000 - A.MARKOV_ITERS * 2 * n * n <= total <= 1_000_000
    assert sum(r.observed_share_ppm for r in rows) <= 1_000_000
    # near-fixpoint: one more integer step moves each entry by <= a few ppm
    tr = {(r.prev_type, r.next_type): r.p_ppm for r in
          A.q_events_transitions(spark, SF_SMOKE).collect()}
    cur = {r.event_type: r.stationary_ppm for r in rows}
    nxt = defaultdict(int)
    for (p, nx), ppm in tr.items():
        nxt[nx] += cur[p] * ppm
    for t in cur:
        assert abs(nxt[t] // 1_000_000 - cur[t]) <= 500, (t, cur, dict(nxt))


def test_duplicate_payments_find_exactly_the_seeded_retries(spark):
    from safeascent_spark.operators import monitor as MON
    rows = MON.q_dq_duplicate_payments(spark, SF_SMOKE).collect()
    orders = (domain.load_table(spark, SF_SMOKE, "orders")
              .select("o_orderkey", "o_custkey", "o_totalprice",
                      "o_orderdate").collect())
    seeded = [o for o in orders
              if o.o_orderkey % MON.DUPPAY_MOD == MON.DUPPAY_REM]
    # the natural corpus is collision-free, so every reported group is a
    # seeded retry pair and every seed is reported
    assert len(rows) == len(seeded)
    by_key = {(o.o_custkey, math.floor(o.o_totalprice * 100),
               o.o_orderdate.date() if hasattr(o.o_orderdate, 'date')
               else o.o_orderdate): o.o_orderkey for o in seeded}
    for r in rows:
        k = (r.custkey, r.price_c, r.odate)
        assert k in by_key
        assert r.n_payments == 2
        assert r.first_key == by_key[k]
        assert r.last_key == by_key[k] + MON.DUPPAY_KEY_SHIFT


# --- wave 25: engagement, contamination, encoding -----------------------------

def test_bounce_rate_matches_session_bruteforce(spark):
    from safeascent_spark.operators import analytics as A
    rows = {r.day: r for r in
            A.q_events_bounce_rate(spark, SF_SMOKE).collect()}
    ev = defaultdict(list)
    for e in (domain.load_table(spark, SF_SMOKE, "events")
                    .select("user_id", "ts").collect()):
        ev[e.user_id].append(e.ts // 1_000_000_000)
    per_day = defaultdict(lambda: [0, 0, 0, 0])  # sess, bounce, ev, act
    for _, ts in ev.items():
        ts.sort()
        cur = [ts[0], ts[0], 1]  # start, last, n
        sessions = []
        for t in ts[1:]:
            if t - cur[1] > 3600:
                sessions.append(tuple(cur))
                cur = [t, t, 1]
            else:
                cur[1], cur[2] = t, cur[2] + 1
        sessions.append(tuple(cur))
        for st, la, n in sessions:
            d = per_day[st // 86400]
            d[0] += 1
            d[1] += 1 if n == 1 else 0
            d[2] += n
            d[3] += la - st
    assert set(rows) == set(per_day)
    for day, (ns, nb, ne, act) in per_day.items():
        r = rows[day]
        assert (r.n_sessions, r.n_bounce, r.active_s) == (ns, nb, act)
        assert r.bounce_ppm == nb * 1_000_000 // ns
        assert r.events_per_session_milli == ne * 1000 // ns


def test_cross_source_overlap_symmetric_counts(spark):
    from safeascent_spark.operators import dedup as D
    rows = D.q_dedup_cross_source_overlap(spark, SF_SMOKE).collect()
    got = {(r.src_a, r.src_b): r for r in rows}
    grams = defaultdict(set)
    for r in (domain.load_table(spark, SF_SMOKE, "documents")
                    .select("source", "text").collect()):
        toks = [t for t in r.text.split(" ") if t]
        W = D.XS_NGRAM_W
        grams[r.source].update(
            " ".join(toks[i:i + W]) for i in range(len(toks) - W + 1))
    for a in grams:
        for b in grams:
            if a == b:
                continue
            common = len(grams[a] & grams[b])
            if common == 0:
                assert (a, b) not in got
                continue
            r = got[(a, b)]
            assert r.n_common == common
            assert r.n_grams == len(grams[a])
            assert r.overlap_ppm == common * 1_000_000 // len(grams[a])
    # n_common is symmetric; overlap_ppm needn't be
    for (a, b), r in got.items():
        assert got[(b, a)].n_common == r.n_common


def test_target_encoding_shrinks_toward_prior(spark):
    from safeascent_spark.operators import monitor as MON
    rows = MON.q_features_target_encoding(spark, SF_SMOKE).collect()
    data = defaultdict(list)
    allv = []
    for o in (domain.load_table(spark, SF_SMOKE, "orders")
                    .select("o_orderpriority", "o_orderstatus",
                            "o_totalprice").collect()):
        c = math.floor(o.o_totalprice * 100)
        data[(o.o_orderpriority, o.o_orderstatus)].append(c)
        allv.append(c)
    N, S = len(allv), sum(allv)
    m = MON.TENC_SMOOTH_M
    for r in rows:
        ys = data[(r.o_orderpriority, r.o_orderstatus)]
        assert (r.n_rows, r.sum_c) == (len(ys), sum(ys))
        assert r.raw_mean_milli == sum(ys) * 1000 // len(ys)
        want = (sum(ys) * N + m * S) * 1000 // ((len(ys) + m) * N)
        assert r.enc_milli == want
        # shrinkage: encoded mean lies between raw mean and global prior
        lo = min(r.raw_mean_milli, S * 1000 // N)
        hi = max(r.raw_mean_milli, S * 1000 // N)
        assert lo - 1 <= r.enc_milli <= hi + 1


# --- wave 26: reconciliation, funnel latency percentiles, volume anomaly -----

def test_order_reconciliation_bruteforce(spark):
    from safeascent_spark.operators import monitor as MON
    rows = {r.o_orderstatus: r for r in
            MON.q_dq_order_reconciliation(spark, SF_SMOKE).collect()}
    lines = defaultdict(int)
    for li in (domain.load_table(spark, SF_SMOKE, "lineitem")
                     .select("l_orderkey", "l_extendedprice",
                             "l_discount", "l_tax").collect()):
        c = math.floor(li.l_extendedprice * 100)
        d = round(li.l_discount * 100)
        t = round(li.l_tax * 100)
        lines[li.l_orderkey] += c * (100 - d) * (100 + t)
    stats = defaultdict(lambda: [0, 0, 0, None])
    for o in (domain.load_table(spark, SF_SMOKE, "orders")
                    .select("o_orderkey", "o_orderstatus",
                            "o_totalprice").collect()):
        st = stats[o.o_orderstatus]
        st[0] += 1
        if o.o_orderkey not in lines:
            st[1] += 1
            continue
        diff = abs(math.floor(o.o_totalprice * 100) * 10000
                   - lines[o.o_orderkey])
        if diff > MON.RECON_TOL_E6:
            st[2] += 1
        st[3] = diff if st[3] is None else max(st[3], diff)
    assert set(rows) == set(stats)
    for s, (n, nn, nm, mx) in stats.items():
        r = rows[s]
        assert (r.n_orders, r.n_no_lines, r.n_mismatch) == (n, nn, nm)
        assert r.max_diff_e6 == mx
        assert r.matched_ppm == (n - nn - nm) * 1_000_000 // n


def test_funnel_ttc_matches_bruteforce(spark):
    from safeascent_spark.operators import analytics as A
    rows = {r.step_pair: r for r in
            A.q_events_funnel_ttc(spark, SF_SMOKE).collect()}
    ev = defaultdict(lambda: defaultdict(list))
    for e in (domain.load_table(spark, SF_SMOKE, "events")
                    .select("user_id", "event_type", "ts").collect()):
        ev[e.user_id][e.event_type].append(e.ts)
    w = A.FUNNEL_STEP_WINDOW_NS
    deltas = defaultdict(list)
    for uid, by_type in ev.items():
        t_prev = min(by_type[A.FUNNEL_STEPS[0]], default=None) \
            if by_type.get(A.FUNNEL_STEPS[0]) else None
        for i in range(1, len(A.FUNNEL_STEPS)):
            if t_prev is None:
                break
            step = A.FUNNEL_STEPS[i]
            cands = [t for t in by_type.get(step, [])
                     if t > t_prev and t - t_prev <= w]
            if not cands:
                t_prev = None
                break
            t = min(cands)
            deltas[f"{A.FUNNEL_STEPS[i - 1]}->{step}"].append(
                (t - t_prev) // 1_000_000_000)
            t_prev = t
    assert set(rows) == {k for k, v in deltas.items() if v}
    for pair, ds in deltas.items():
        ds.sort()
        r = rows[pair]
        assert r.n_users == len(ds)
        for p in (50, 90, 99):
            assert getattr(r, f"p{p}_s") == ds[(len(ds) - 1) * p // 100]


def test_volume_anomaly_trailing_median(spark):
    from safeascent_spark.operators import monitor as MON
    rows = {r.day: r for r in
            MON.q_dq_volume_anomaly(spark, SF_SMOKE).collect()}
    daily = defaultdict(int)
    for e in (domain.load_table(spark, SF_SMOKE, "events")
                    .select("ts").collect()):
        daily[e.ts // 86_400_000_000_000] += 1
    days = sorted(daily)
    W = MON.VOL_WINDOW
    expected = {}
    for d in days:
        window = [(daily[f], f) for f in days if d - W <= f <= d - 1]
        if len(window) != W:
            continue
        window.sort()
        med = window[(W - 1) // 2][0]
        n = daily[d]
        x = (n - med) * 1_000_000
        dev = x // med if x >= 0 else -((-x) // med)
        expected[d] = (n, med, dev, abs(dev) > MON.VOL_ANOM_PPM)
    assert set(rows) == set(expected)
    for d, (n, med, dev, an) in expected.items():
        r = rows[d]
        assert (r.n_events, r.trailing_med, r.dev_ppm, r.is_anomaly) == \
            (n, med, dev, an)


# --- wave 27: stickiness, concentration, enum drift ----------------------------

def test_stickiness_matches_bruteforce(spark):
    from safeascent_spark.operators import analytics as A
    rows = {r.day: r for r in
            A.q_events_stickiness(spark, SF_SMOKE).collect()}
    du = set()
    for e in (domain.load_table(spark, SF_SMOKE, "events")
                    .select("ts", "user_id").collect()):
        du.add((e.ts // 86_400_000_000_000, e.user_id))
    days = sorted({d for d, _ in du})
    for d in days:
        dau = sum(1 for dd, _ in du if dd == d)
        mau = len({u for dd, u in du if d - A.STICKY_WINDOW < dd <= d})
        r = rows[d]
        assert (r.dau, r.mau) == (dau, mau)
        assert r.stickiness_ppm == dau * 1_000_000 // mau
    assert set(rows) == set(days)


def test_supplier_hhi_bruteforce(spark):
    from safeascent_spark.operators import olap as OL
    rows = {r.p_brand: r for r in
            OL.q_supplier_hhi(spark, SF_SMOKE).collect()}
    parts = {p.p_partkey: p.p_brand for p in
             domain.load_table(spark, SF_SMOKE, "part")
                   .select("p_partkey", "p_brand").collect()}
    rev = defaultdict(int)
    for li in (domain.load_table(spark, SF_SMOKE, "lineitem")
                     .select("l_partkey", "l_suppkey", "l_extendedprice",
                             "l_discount").collect()):
        b = parts[li.l_partkey]
        r4 = (math.floor(li.l_extendedprice * 100)
              * (100 - round(li.l_discount * 100)))
        rev[(b, li.l_suppkey)] += r4
    brands = defaultdict(list)
    for (b, s), v in rev.items():
        brands[b].append(v)
    assert set(rows) == set(brands)
    for b, vs in brands.items():
        tot = sum(vs)
        shares = [v * 1_000_000 // tot for v in vs]
        r = rows[b]
        assert (r.n_suppliers, r.brand_rev_e4) == (len(vs), tot)
        assert r.top_share_ppm == max(shares)
        assert r.hhi_ppm == sum(s * s for s in shares) // 1_000_000
        # HHI bounds: 1e6/n <= hhi <= 1e6 (up to floor slack)
        assert r.hhi_ppm <= 1_000_000
        assert r.hhi_ppm >= 1_000_000 // len(vs) - len(vs)


def test_enum_drift_finds_the_omitted_values(spark):
    from safeascent_spark.operators import monitor as MON
    rows = {r.key: r for r in
            MON.q_dq_enum_drift(spark, SF_SMOKE).collect()}
    assert set(rows) == {f"{t}.{c}" for t, c, _ in MON._ENUM_DECLS}
    for t, c, allowed in MON._ENUM_DECLS:
        vals = [getattr(x, c) for x in
                (domain.load_table(spark, SF_SMOKE, t)
                       .select(c).collect())]
        bad = [v for v in vals if str(v) not in allowed]
        r = rows[f"{t}.{c}"]
        assert r.n_rows == len(vals)
        assert r.n_unexpected == len(bad)
        assert r.n_unexpected_distinct == len(set(bad))
        assert r.conforms == (len(bad) == 0)
        if bad:
            assert r.example_value == min(str(v) for v in bad)
        # the declared whitelists omit one real value by design
        assert len(bad) > 0


# --- wave 28: bursts, entropy drift, fulfillment SLA ---------------------------

def test_burst_velocity_bruteforce(spark):
    from safeascent_spark.operators import analytics as A
    rows = {r.user_id: r for r in
            A.q_events_burst_velocity(spark, SF_SMOKE).collect()}
    ev = defaultdict(list)
    for e in (domain.load_table(spark, SF_SMOKE, "events")
                    .select("user_id", "ts").collect()):
        ev[e.user_id].append(e.ts)
    assert set(rows) == set(ev)
    W = A.BURST_WINDOW_NS
    for uid, ts in ev.items():
        ts.sort()
        best, at = 0, None
        for i, t in enumerate(ts):
            c = sum(1 for x in ts[i:] if x < t + W)
            if c > best:
                best, at = c, t
        r = rows[uid]
        assert (r.max_burst_60s, r.at_ts_ns) == (best, at)


def test_entropy_daily_bounds_and_replay(spark):
    from safeascent_spark.operators import analytics as A
    rows = {r.day: r for r in
            A.q_events_entropy_daily(spark, SF_SMOKE).collect()}
    cells = defaultdict(lambda: defaultdict(int))
    for e in (domain.load_table(spark, SF_SMOKE, "events")
                    .select("ts", "event_type").collect()):
        cells[e.ts // 86_400_000_000_000][e.event_type] += 1
    for day, by_type in cells.items():
        n = sum(by_type.values())
        ent = sum(nt * math.floor(1e6 * math.log(n / nt))
                  for nt in by_type.values()) // n
        r = rows[day]
        assert (r.n_events, r.n_types) == (n, len(by_type))
        assert r.entropy_micro_nats == ent
        # bounds: 0 <= H <= ln(n_types) (+ floor slack)
        assert 0 <= r.entropy_micro_nats <= \
            int(1e6 * math.log(len(by_type))) + 1


def test_ship_latency_percentiles_bruteforce(spark):
    from safeascent_spark.operators import olap as OL
    rows = {r.month: r for r in
            OL.q_orders_ship_latency(spark, SF_SMOKE).collect()}
    odates = {o.o_orderkey: o.o_orderdate for o in
              domain.load_table(spark, SF_SMOKE, "orders")
                    .select("o_orderkey", "o_orderdate").collect()}
    per = defaultdict(list)
    for li in (domain.load_table(spark, SF_SMOKE, "lineitem")
                     .select("l_orderkey", "l_shipdate").collect()):
        od = odates[li.l_orderkey]
        days = (li.l_shipdate.date() - od.date()).days
        per[od.strftime("%Y-%m")].append(days)
    assert set(rows) == set(per)
    for month, ds in per.items():
        ds.sort()
        r = rows[month]
        assert r.n_lines == len(ds)
        assert r.p50_days == ds[(len(ds) - 1) * 50 // 100]
        assert r.p90_days == ds[(len(ds) - 1) * 90 // 100]
        assert r.max_days == ds[-1]


# --- wave 29: metric-learning sanity, fences, pricing --------------------------

def test_triplet_violations_bruteforce(spark):
    from safeascent_spark.operators import similarity as SIM
    rows = {r.label: r for r in
            SIM.q_embedding_triplet_violations(spark, SF_SMOKE).collect()}
    vecs = {}
    for r in (domain.load_table(spark, SF_SMOKE, "embeddings")
                    .select("vec_id", "label", "embedding").collect()):
        q = [round(max(-1.0, min(1.0, float(x))) * 127)
             for x in r.embedding]
        vecs[r.vec_id] = (r.label, q)
    ids = sorted(vecs)
    stats = defaultdict(lambda: [0, 0])
    for aid in ids:
        albl, aq = vecs[aid]
        pid = next((i for i in ids if i > aid and vecs[i][0] == albl),
                   None)
        nid = next((i for i in ids if i > aid and vecs[i][0] != albl),
                   None)
        if pid is None or nid is None:
            continue
        import math as m
        dot = lambda x, y: sum(a * b for a, b in zip(x, y))
        nrm = lambda x: m.sqrt(sum(a * a for a in x))
        cos_p = dot(aq, vecs[pid][1]) / (nrm(aq) * nrm(vecs[pid][1]))
        cos_n = dot(aq, vecs[nid][1]) / (nrm(aq) * nrm(vecs[nid][1]))
        stats[albl][0] += 1
        if cos_p < cos_n:
            stats[albl][1] += 1
    assert set(rows) == set(stats)
    for lbl, (n, v) in stats.items():
        r = rows[lbl]
        assert (r.n_triplets, r.n_violations) == (n, v)
        assert r.violation_ppm == v * 1_000_000 // n


def test_tukey_fences_bruteforce(spark):
    from safeascent_spark.operators import monitor as MON
    rows = {r.event_type: r for r in
            MON.q_dq_tukey_fences(spark, SF_SMOKE).collect()}
    per = defaultdict(list)
    for e in (domain.load_table(spark, SF_SMOKE, "events")
                    .select("event_type", "value").collect()):
        per[e.event_type].append(math.floor(e.value * 1_000_000))
    for t, vs in per.items():
        vs.sort()
        q1 = vs[(len(vs) - 1) * 25 // 100]
        q3 = vs[(len(vs) - 1) * 75 // 100]
        iqr = q3 - q1
        r = rows[t]
        assert (r.n_events, r.q1_micro, r.q3_micro, r.iqr_micro) == \
            (len(vs), q1, q3, iqr)
        assert r.n_below == sum(1 for v in vs if 2 * v < 2 * q1 - 3 * iqr)
        assert r.n_above == sum(1 for v in vs if 2 * v > 2 * q3 + 3 * iqr)


def test_discount_curve_shares_sum(spark):
    from safeascent_spark.operators import olap as OL
    rows = OL.q_lineitem_discount_curve(spark, SF_SMOKE).collect()
    per = defaultdict(lambda: [0, 0, 0])
    for li in (domain.load_table(spark, SF_SMOKE, "lineitem")
                     .select("l_discount", "l_quantity",
                             "l_extendedprice").collect()):
        d = round(li.l_discount * 100)
        s = per[d]
        s[0] += 1
        s[1] += int(li.l_quantity)
        s[2] += math.floor(li.l_extendedprice * 100) * (100 - d)
    tot = sum(s[2] for s in per.values())
    assert {r.disc_pct for r in rows} == set(per)
    for r in rows:
        n, q, rev = per[r.disc_pct]
        assert (r.n_lines, r.total_qty, r.rev_e4) == (n, q, rev)
        assert r.rev_share_ppm == rev * 1_000_000 // tot
    # ppm shares partition 1e6 up to floor slack
    s = sum(r.rev_share_ppm for r in rows)
    assert 1_000_000 - len(rows) <= s <= 1_000_000
