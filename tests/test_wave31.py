"""Round-9 wave-31 semantics, each cross-checked against a driver-side
brute force at sf0.001: hour-of-week heatmap, inter-arrival
percentiles, peak session concurrency, average precision (PR-AUC),
diagonal-Mahalanobis outliers, functional-dependency conformance, and
per-source OOV rate."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from safeascent_spark import domain
from safeascent_spark.operators import analytics as A
from safeascent_spark.operators import evalrank as EV
from safeascent_spark.operators import monitor as MON
from safeascent_spark.operators import similarity as SIM
from safeascent_spark.operators import text as TX
from tests.conftest import SF_SMOKE

DAY_NS = 86_400 * 1_000_000_000
HOUR_NS = 3_600 * 1_000_000_000


def _events(spark):
    return (domain.load_table(spark, SF_SMOKE, "events")
            .select("event_id", "ts", "user_id", "event_type", "value")
            .collect())


def test_hour_heatmap_matches_bruteforce(spark):
    ev = _events(spark)
    cells = Counter((r.event_type, (r.ts // DAY_NS) % 7,
                     (r.ts // HOUR_NS) % 24) for r in ev)
    tot = Counter(r.event_type for r in ev)
    got = A.q_events_hour_heatmap(spark, SF_SMOKE).collect()
    assert {(r.event_type, r.dow, r.hour): r.n for r in got} == dict(cells)
    for r in got:
        assert r.share_ppm == r.n * 1_000_000 // tot[r.event_type]
    # shares per type sum to <= 1e6 (truncation) and > 1e6 - cells
    by_t = defaultdict(int)
    for r in got:
        by_t[r.event_type] += r.share_ppm
    for t, s in by_t.items():
        assert 1_000_000 - 168 <= s <= 1_000_000


def _pct_pick(vals, p):
    """The engine's exact order statistic: 1-based index
    (n-1)*p//100 + 1 over the ascending values."""
    v = sorted(vals)
    return v[(len(v) - 1) * p // 100]


def test_interarrival_matches_bruteforce(spark):
    ev = _events(spark)
    seq = defaultdict(list)
    for r in ev:
        seq[(r.user_id, r.event_type)].append((r.ts, r.event_id))
    gaps = defaultdict(list)
    for (u, t), xs in seq.items():
        xs.sort()
        for (a, _), (b, _) in zip(xs, xs[1:]):
            gaps[t].append((b - a) // 1_000_000_000)
    got = {r.event_type: r for r in
           A.q_events_interarrival(spark, SF_SMOKE).collect()}
    assert set(got) == set(gaps)
    for t, g in gaps.items():
        assert got[t].n_gaps == len(g)
        assert got[t].p50_s == _pct_pick(g, 50)
        assert got[t].p90_s == _pct_pick(g, 90)
        assert got[t].p99_s == _pct_pick(g, 99)


def test_peak_concurrency_matches_sweep(spark):
    ev = _events(spark)
    per_user = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append(r.ts)
    sessions = []
    for u, ts in per_user.items():
        ts.sort()
        start = prev = ts[0]
        for t in ts[1:]:
            if t - prev > A.CONC_GAP_NS:
                sessions.append((start, prev))
                start = t
            prev = t
        sessions.append((start, prev))
    deltas = Counter()
    for s, e in sessions:
        deltas[s] += 1
        deltas[e + 1] -= 1
    run, cur = {}, 0
    for t in sorted(deltas):
        cur += deltas[t]
        day = t // DAY_NS
        run[day] = max(run.get(day, -1 << 60), cur)
    starts = Counter(s // DAY_NS for s, _ in sessions)
    got = A.q_events_peak_concurrency(spark, SF_SMOKE).collect()
    assert {r.day: r.peak_concurrent for r in got} == run
    for r in got:
        assert r.n_sessions_started == starts.get(r.day, 0)
    # sanity: concurrency is positive somewhere and never exceeds the
    # number of users
    assert max(r.peak_concurrent for r in got) >= 1
    assert max(r.peak_concurrent for r in got) <= len(per_user)


def test_pr_auc_matches_float_average_precision(spark):
    ev = _events(spark)
    got = {r.event_type: r for r in
           EV.q_eval_pr_auc(spark, SF_SMOKE).collect()}
    types = sorted({r.event_type for r in ev})
    for t in types:
        scored = sorted(((int(math.floor(r.value * 100)),
                          1 if r.event_type == t else 0) for r in ev),
                        reverse=True)
        n_pos = sum(y for _, y in scored)
        # block-wise (tie-safe) average precision, exact floats
        ap, seen, seen_pos = 0.0, 0, 0
        i = 0
        while i < len(scored):
            j = i
            pos_blk = 0
            while j < len(scored) and scored[j][0] == scored[i][0]:
                pos_blk += scored[j][1]
                j += 1
            seen, seen_pos = j, seen_pos + pos_blk
            if pos_blk:
                ap += (pos_blk / n_pos) * (seen_pos / seen)
            i = j
        r = got[t]
        assert r.n_pos == n_pos
        # the engine truncates precision to ppm once per block and the
        # final ratio once -> within n_grid ppm of the float AP
        assert abs(r.ap_ppm / 1e6 - ap) < (r.n_grid + 1) / 1e6 + 1e-9
    # a random scorer's AP approaches the positive prevalence
    for t in types:
        r = got[t]
        prev = r.n_pos / sum(got[x].n_pos for x in types)
        assert abs(r.ap_ppm / 1e6 - prev) < 0.1


def test_maha_diag_matches_bruteforce(spark):
    q = {r.vec_id: (r.label, list(r.qvec)) for r in
         SIM.quantized_df(spark, SF_SMOKE).collect()}
    dim = len(next(iter(q.values()))[1])
    n = len(q)
    sx = [0] * dim
    sxx = [0] * dim
    for _, v in q.values():
        for i, x in enumerate(v):
            sx[i] += x
            sxx[i] += x * x
    def score(v):
        s = 0
        for i, x in enumerate(v):
            num = (n * x - sx[i]) ** 2 * 1000
            den = max(n * sxx[i] - sx[i] ** 2, 1)
            s += num // den
        return s
    want = sorted(((score(v), vid) for vid, (_, v) in q.items()),
                  key=lambda p: (-p[0], p[1]))[:SIM.MAHA_K]
    got = SIM.q_embedding_maha_diag(spark, SF_SMOKE).collect()
    assert [(r.maha2_milli, r.vec_id) for r in got] == want
    assert all(r.label == q[r.vec_id][0] for r in got)


def test_functional_dependency_matches_bruteforce(spark):
    got = {(r.relation, r.determinant, r.dependent): r for r in
           MON.q_dq_functional_dependency(spark, SF_SMOKE).collect()}
    assert set(got) == set(MON.FD_PAIRS) == {
        (t, d, p) for t, d, p in MON.FD_PAIRS}
    for tbl, det, dep in MON.FD_PAIRS:
        rows = (domain.load_table(spark, SF_SMOKE, tbl)
                .select(det, dep).collect())
        m = defaultdict(set)
        for r in rows:
            m[r[0]].add(r[1])
        r = got[(tbl, det, dep)]
        assert r.n_det == len(m)
        assert r.n_violating == sum(1 for v in m.values() if len(v) > 1)
        assert r.max_distinct_dep == max(len(v) for v in m.values())
        assert r.violation_ppm == r.n_violating * 1_000_000 // r.n_det
    # the PK rule holds; the cross-entity rules are violated
    assert got[("orders", "o_orderkey", "o_orderstatus")].n_violating == 0
    assert got[("events", "user_id", "event_type")].n_violating > 0


def test_oov_rate_matches_bruteforce(spark):
    docs = (domain.load_table(spark, SF_SMOKE, "documents")
            .select("source", "text").collect())
    st = Counter()
    for r in docs:
        for tok in r.text.split(" "):
            if tok:
                st[(r.source, tok)] += 1
    gt = Counter()
    for (_, tok), c in st.items():
        gt[tok] += c
    vocab = {t for t, _ in sorted(gt.items(),
                                  key=lambda kv: (-kv[1], kv[0]))
             [:TX.OOV_VOCAB_K]}
    got = {r.source: r for r in
           TX.q_text_oov_rate(spark, SF_SMOKE).collect()}
    srcs = {s for s, _ in st}
    assert set(got) == srcs
    for s in srcs:
        toks = {t: c for (s2, t), c in st.items() if s2 == s}
        n_tok = sum(toks.values())
        n_oov = sum(c for t, c in toks.items() if t not in vocab)
        r = got[s]
        assert (r.n_tokens, r.n_oov_tokens) == (n_tok, n_oov)
        assert r.n_distinct == len(toks)
        assert r.n_distinct_oov == sum(1 for t in toks if t not in vocab)
        assert r.oov_ppm == n_oov * 1_000_000 // n_tok
    # with a 31-token universe and K=16, OOV is nonzero somewhere
    assert any(r.n_oov_tokens > 0 for r in got.values())


def test_assortativity_matches_bruteforce(spark):
    from safeascent_spark.operators import graph as G
    edges = {(r.src, r.dst) for r in
             G._pagerank_edges(spark, SF_SMOKE).collect()}
    und = {(a, b) for a, b in edges | {(b, a) for a, b in edges}
           if a != b}
    deg = Counter(a for a, _ in und)
    xs = [(deg[a], deg[b]) for a, b in und]
    n = len(xs)
    sx = sum(x for x, _ in xs); sy = sum(y for _, y in xs)
    sxy = sum(x * y for x, y in xs)
    sxx = sum(x * x for x, _ in xs); syy = sum(y * y for _, y in xs)
    num = n * sxy - sx * sy
    dx, dy = n * sxx - sx * sx, n * syy - sy * sy
    want = math.floor(float(num) * 1e6
                      / (math.sqrt(float(dx)) * math.sqrt(float(dy))))
    r = G.q_graph_assortativity(spark, SF_SMOKE).collect()[0]
    assert r.n_pairs == n
    assert r.assortativity_micro == want
    # the route->location/hub star topology is disassortative
    assert r.assortativity_micro < 0


def test_cell_balance_matches_bruteforce(spark):
    from safeascent_spark.operators import similarity as SIM2
    e = SIM2.embeddings_df(spark, SF_SMOKE)
    sigs = SIM2.band_signatures_df(e).collect()
    occ = Counter(r.sig for r in sigs if r.band == 0)
    n_total = sum(occ.values())
    buckets = defaultdict(lambda: [0, 0, 0])
    for _, sz in occ.items():
        b = buckets[int(math.floor(math.log2(sz)))]
        b[0] += 1
        b[1] += sz
        b[2] = max(b[2], sz)
    got = SIM2.q_embedding_cell_balance(spark, SF_SMOKE).collect()
    assert {r.size_log2: (r.n_cells, r.n_vecs, r.max_cell) for r in got} \
        == {k: tuple(v) for k, v in buckets.items()}
    for r in got:
        assert r.vec_share_ppm == r.n_vecs * 1_000_000 // n_total
    assert sum(r.n_vecs for r in got) == n_total


def test_new_vs_returning_matches_bruteforce(spark):
    ev = _events(spark)
    first = {}
    for r in ev:
        d = r.ts // DAY_NS
        first[r.user_id] = min(first.get(r.user_id, d), d)
    daily = defaultdict(lambda: [0, 0])
    for r in ev:
        d = r.ts // DAY_NS
        daily[d][0 if d == first[r.user_id] else 1] += 1
    acq = Counter(first.values())
    got = A.q_events_new_vs_returning(spark, SF_SMOKE).collect()
    assert {r.day: (r.n_events_new, r.n_events_returning)
            for r in got} == {d: tuple(v) for d, v in daily.items()}
    for r in got:
        assert r.n_new_users == acq.get(r.day, 0)
        assert r.new_share_ppm == (r.n_events_new * 1_000_000
                                   // (r.n_events_new
                                       + r.n_events_returning))
    # acquisition concentrates at the start of the fixture window
    days = sorted(daily)
    assert got[0].day == days[0] and got[0].n_events_new > 0


def test_idf_drift_matches_bruteforce(spark):
    docs = (domain.load_table(spark, SF_SMOKE, "documents")
            .select("doc_id", "text").collect())
    halves = defaultdict(set)
    ndocs = Counter()
    seen = set()
    for r in docs:
        h = r.doc_id % 2
        if r.doc_id not in seen:
            seen.add(r.doc_id)
            ndocs[h] += 1
        for tok in set(t for t in r.text.split(" ") if t):
            halves[(h, tok)].add(r.doc_id)
    toks = {t for _, t in halves}
    rate = {}
    for t in toks:
        a = len(halves.get((0, t), ())) * 1_000_000 // ndocs[0]
        b = len(halves.get((1, t), ())) * 1_000_000 // ndocs[1]
        rate[t] = (a, b, abs(a - b))
    want = sorted(rate.items(), key=lambda kv: (-kv[1][2], kv[0]))
    want = [(t, a, b, d) for t, (a, b, d) in want[:TX.DRIFT_K]]
    got = [(r.tok, r.df_a_ppm, r.df_b_ppm, r.delta_ppm) for r in
           TX.q_text_idf_drift(spark, SF_SMOKE).collect()]
    assert got == want


def test_burstiness_matches_bruteforce(spark):
    docs = (domain.load_table(spark, SF_SMOKE, "documents")
            .select("doc_id", "text").collect())
    n_docs = len(docs)
    per = defaultdict(Counter)
    gt = Counter()
    for r in docs:
        for tok in (t for t in r.text.split(" ") if t):
            per[tok][r.doc_id] += 1
            gt[tok] += 1
    vocab = [t for t, _ in sorted(gt.items(),
                                  key=lambda kv: (-kv[1], kv[0]))
             [:TX.OOV_VOCAB_K]]
    got = {r.tok: r for r in
           TX.q_text_burstiness(spark, SF_SMOKE).collect()}
    assert sorted(got) == sorted(vocab)
    for t in vocab:
        cs = per[t]
        tc = sum(cs.values())
        ssq = sum(c * c for c in cs.values())
        vmr = (n_docs * ssq - tc * tc) * 1000 // (n_docs * tc)
        r = got[t]
        assert (r.total_cnt, r.df_docs, r.vmr_milli) == (tc, len(cs), vmr)
    # common tokens in a near-uniform synthetic corpus scatter close
    # to Poisson: VMR must sit in a sane band, not explode
    assert all(0 <= r.vmr_milli < 10_000 for r in got.values())


def test_error_budget_matches_bruteforce(spark):
    ev = _events(spark)
    daily = defaultdict(lambda: [0, 0])
    for r in ev:
        d = r.ts // DAY_NS
        daily[d][0] += 1
        daily[d][1] += 1 if r.event_type == "error" else 0
    got = MON.q_dq_error_budget(spark, SF_SMOKE).collect()
    assert [r.day for r in got] == sorted(daily)
    cum_n = cum_e = 0
    for r in got:
        n, err = daily[r.day]
        cum_n += n
        cum_e += err
        ppm = err * 1_000_000 // n
        assert (r.n_events, r.n_errors, r.err_ppm) == (n, err, ppm)
        assert r.burn_milli == ppm * 1000 // MON.SLO_ERR_PPM
        assert r.breach == (ppm > MON.SLO_ERR_PPM)
        assert r.cum_err_ppm == cum_e * 1_000_000 // cum_n
