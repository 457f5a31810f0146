"""Round-10 wave-33 semantics, each cross-checked against a
driver-side brute force at sf0.001 (the registration checklist's
brute-force leg; the DuckDB oracle + dual-SF bit-exact legs live in
CORRECTNESS_LOCAL_r10 / CROSSSF_r10).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from safeascent_spark import domain
from safeascent_spark import ml as ML
from safeascent_spark.operators import evalrank as ER
from safeascent_spark.operators import graph as G
from safeascent_spark.operators import monitor as MON
from safeascent_spark.operators import multimodal as MM
from safeascent_spark.operators import olap as OL
from safeascent_spark.operators import similarity as SIM
from safeascent_spark.operators import text as TX
from tests.conftest import SF_SMOKE

DAY_NS = 86_400 * 1_000_000_000


def _rows(spark, table, cols):
    return (domain.load_table(spark, SF_SMOKE, table)
            .select(*cols).collect())


# --- graph_degree_histogram ---------------------------------------------------

def test_degree_histogram_matches_bruteforce(spark):
    edges = {(r.src, r.dst) for r in
             G._pagerank_edges(spark, SF_SMOKE).collect()}
    und = {(a, b) for a, b in edges | {(b, a) for a, b in edges}
           if a != b}
    deg = Counter(a for a, _ in und)
    bins = defaultdict(list)
    for _, d in deg.items():
        bins[d.bit_length() - 1].append(d)
    got = G.q_graph_degree_histogram(spark, SF_SMOKE).collect()
    assert [r.deg_bin for r in got] == sorted(bins)
    for r in got:
        ds = bins[r.deg_bin]
        assert (r.deg_lo, r.deg_hi) == (1 << r.deg_bin,
                                        (1 << (r.deg_bin + 1)) - 1)
        assert all(r.deg_lo <= d <= r.deg_hi for d in ds)
        assert r.n_nodes == len(ds)
        assert r.sum_deg == sum(ds)
        assert r.sum_deg2 == sum(d * d for d in ds)
        assert r.max_deg == max(ds)
    # every node is counted exactly once across bins
    assert sum(r.n_nodes for r in got) == len(deg)


# --- tpch_q11_value_parts ------------------------------------------------------

def _region_suppliers(spark, region):
    reg = {r.r_regionkey for r in _rows(spark, "region",
                                        ["r_regionkey", "r_name"])
           if r.r_name == region}
    nat = {r.n_nationkey: r.n_name
           for r in _rows(spark, "nation",
                          ["n_nationkey", "n_name", "n_regionkey"])
           if r.n_regionkey in reg}
    return {r.s_suppkey: (r.s_name, nat[r.s_nationkey])
            for r in _rows(spark, "supplier",
                           ["s_suppkey", "s_name", "s_nationkey"])
            if r.s_nationkey in nat}


def test_q11_matches_bruteforce(spark):
    supp = _region_suppliers(spark, OL.Q11_REGION)
    li = _rows(spark, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice"])
    pv = Counter()
    for r in li:
        if r.l_suppkey in supp:
            pv[r.l_partkey] += math.floor(r.l_extendedprice * 100)
    total = sum(pv.values())
    n_parts = len(pv)
    keep = sorted(((pk, v) for pk, v in pv.items()
                   if v * n_parts > OL.Q11_MULT * total),
                  key=lambda kv: (-kv[1], kv[0]))[:100]
    got = OL.q_tpch_q11_value_parts(spark, SF_SMOKE).collect()
    assert [(r.p_partkey, r.value_c) for r in got] == keep
    assert all(r.share_ppm == r.value_c * 1_000_000 // total
               for r in got)
    assert got, "above-2x-mean parts must exist in a skewed tail"


# --- tpch_q20_qty_surplus ------------------------------------------------------

def test_q20_matches_bruteforce(spark):
    parts = {r.p_partkey for r in _rows(spark, "part",
                                        ["p_partkey", "p_type"])
             if r.p_type == OL.Q20_TYPE}
    li = _rows(spark, "lineitem",
               ["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"])
    import datetime
    y_from = datetime.date(1997, 1, 1)
    y_to = datetime.date(1998, 1, 1)
    tot = Counter()
    yr = Counter()
    for r in li:
        if r.l_partkey not in parts:
            continue
        q = math.floor(r.l_quantity)
        k = (r.l_partkey, r.l_suppkey)
        tot[k] += q
        if y_from <= r.l_shipdate.date() < y_to:
            yr[k] += q
    surplus = {sk for (pk, sk) in tot
               if tot[(pk, sk)] > OL.Q20_SURPLUS_MULT * yr[(pk, sk)]}
    supp = _region_suppliers(spark, OL.Q20_REGION)
    want = sorted(sk for sk in supp if sk in surplus)
    got = OL.q_tpch_q20_qty_surplus(spark, SF_SMOKE).collect()
    assert [r.s_suppkey for r in got] == want
    assert all((r.s_name, r.n_name) == supp[r.s_suppkey] for r in got)
    assert got, "some EUROPE supplier holds surplus SMALL-part stock"


# --- dq_column_correlation -----------------------------------------------------

def test_column_correlation_matches_bruteforce(spark):
    li = _rows(spark, "lineitem",
               ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])
    cols = {
        "l_quantity": [math.floor(r.l_quantity) for r in li],
        "l_extendedprice": [math.floor(r.l_extendedprice * 100)
                            for r in li],
        "l_discount": [round(r.l_discount * 100) for r in li],
        "l_tax": [round(r.l_tax * 100) for r in li],
    }
    n = len(li)

    def corr_micro(a, b):
        xs, ys = cols[a], cols[b]
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx = sum(x * x for x in xs)
        syy = sum(y * y for y in ys)
        dx, dy = n * sxx - sx * sx, n * syy - sy * sy
        if dx <= 0 or dy <= 0:
            return None
        return math.floor(float(n * sxy - sx * sy) * 1e6
                          / (math.sqrt(float(dx)) * math.sqrt(float(dy))))

    got = MON.q_dq_column_correlation(spark, SF_SMOKE).collect()
    names = [nm for nm, _ in MON._CORR_COLS]
    want_pairs = sorted((a, b) for i, a in enumerate(names)
                        for b in names[i + 1:])
    assert [(r.col_a, r.col_b) for r in got] == want_pairs
    for r in got:
        assert r.n_rows == n
        assert r.corr_micro == corr_micro(r.col_a, r.col_b), \
            (r.col_a, r.col_b)
    # this synthetic generator draws the four columns independently
    # (unlike real TPC-H, where price ~ qty x retail): every pairwise
    # correlation is near zero but none is NULL — the readout proves
    # independence rather than the classic price-qty link
    assert all(r.corr_micro is not None for r in got)
    assert all(abs(r.corr_micro) < 100_000 for r in got)


# --- dq_seasonal_mad_anomaly ---------------------------------------------------

def _lower_median(vals):
    s = sorted(vals)
    return s[(len(s) - 1) // 2]


def test_seasonal_mad_matches_bruteforce(spark):
    ev = _rows(spark, "events", ["event_type", "ts"])
    daily = Counter()
    for r in ev:
        daily[(r.event_type, r.ts // DAY_NS)] += 1
    med = {}
    by_td = defaultdict(list)
    for (t, d), c in daily.items():
        by_td[(t, (d + 4) % 7)].append(c)
    for k, vs in by_td.items():
        med[k] = _lower_median(vs)
    resid = {(t, d): c - med[(t, (d + 4) % 7)]
             for (t, d), c in daily.items()}
    mad = {}
    by_t = defaultdict(list)
    for (t, _d), rv in resid.items():
        by_t[t].append(abs(rv))
    for t, vs in by_t.items():
        mad[t] = _lower_median(vs)
    want = sorted(
        (t, d) for (t, d), rv in resid.items()
        if abs(rv) > MON.SMAD_K * mad[t])
    got = MON.q_dq_seasonal_mad_anomaly(spark, SF_SMOKE).collect()
    assert [(r.event_type, r.day) for r in got] == want
    for r in got:
        assert r.n_events == daily[(r.event_type, r.day)]
        assert r.dow == (r.day + 4) % 7
        assert r.dow_median == med[(r.event_type, r.dow)]
        assert r.resid == resid[(r.event_type, r.day)]
        assert r.mad_resid == mad[r.event_type]


# --- text_digram_entropy -------------------------------------------------------

def test_digram_entropy_matches_bruteforce(spark):
    docs = _rows(spark, "documents", ["source", "text"])
    cnt = defaultdict(Counter)
    for r in docs:
        if len(r.text) >= 2:
            for i in range(len(r.text) - 1):
                cnt[r.source][r.text[i:i + 2]] += 1
    got = {r.source: r for r in
           TX.q_text_digram_entropy(spark, SF_SMOKE).collect()}
    assert set(got) == set(cnt)
    for s, c in cnt.items():
        n = sum(c.values())
        h = sum(v * math.floor(1e6 * math.log(n / v))
                for v in c.values()) // n
        r = got[s]
        assert (r.n_digrams, r.n_distinct_digrams) == (n, len(c))
        assert r.entropy_micro_nats == h
    # entropy is positive and below the ln(distinct) ceiling
    for s, r in got.items():
        assert 0 < r.entropy_micro_nats \
            <= math.floor(1e6 * math.log(r.n_distinct_digrams))


# --- embedding_source_drift ----------------------------------------------------

def test_source_drift_matches_bruteforce(spark):
    q = {r.vec_id: list(r.qvec) for r in
         SIM.quantized_df(spark, SF_SMOKE).collect()}
    src = {r.doc_id: r.source for r in
           _rows(spark, "documents", ["doc_id", "source"])}
    dim = len(next(iter(q.values())))
    per = defaultdict(lambda: [0] * dim)
    n_s = Counter()
    for vid, v in q.items():
        s = src[vid]
        n_s[s] += 1
        for i, x in enumerate(v):
            per[s][i] += x
    n_g = sum(n_s.values())
    sx_g = [sum(per[s][i] for s in per) for i in range(dim)]

    def mu(sx, n):
        return math.floor(float(sx) * 1e6 / n)

    got = {r.source: r for r in
           SIM.q_embedding_source_drift(spark, SF_SMOKE).collect()}
    assert set(got) == set(per)
    for s in per:
        drift = sum((mu(per[s][i], n_s[s]) - mu(sx_g[i], n_g)) ** 2
                    for i in range(dim))
        assert (got[s].n_vecs, got[s].drift_mu2) == (n_s[s], drift)
    assert all(r.drift_mu2 > 0 for r in got.values())


# --- eval_brier_decomposition --------------------------------------------------

def test_brier_decomposition_matches_bruteforce(spark):
    m = ML.q_ml_risk_model(spark, SF_SMOKE).select(
        "risk_score", "predicted_risk").collect()
    bw = 1_000_000 // ER.BRIER_BINS
    per = defaultdict(lambda: [0, 0, 0])    # n, sum p_ppm, sum y
    for r in m:
        # half-up like Spark/DuckDB round for positive doubles — Python's
        # round() is banker's rounding, which would disagree with a
        # correct engine result on an exact .5 tie (ADVICE r10)
        p = math.floor(min(max(r.predicted_risk, 0.0), 100.0) * 10000 + 0.5)
        y = 1 if r.risk_score >= ER.BRIER_POS_THRESHOLD else 0
        b = min(ER.BRIER_BINS - 1, p // bw)
        per[b][0] += 1
        per[b][1] += p
        per[b][2] += y
    n_tot = sum(v[0] for v in per.values())
    sy_tot = sum(v[2] for v in per.values())
    base = math.floor(float(sy_tot) * 1e6 / n_tot)
    unc = sy_tot * (n_tot - sy_tot) * 1_000_000 // (n_tot * n_tot)
    got = ER.q_eval_brier_decomposition(spark, SF_SMOKE).collect()
    assert [r.bin for r in got] == sorted(per)
    for r in got:
        n, sp, sy = per[r.bin]
        ap = math.floor(float(sp) / n)
        ao = math.floor(float(sy) * 1e6 / n)
        assert (r.n_routes, r.avg_pred_ppm, r.avg_obs_ppm) == (n, ap, ao)
        assert r.rel_contrib_micro == \
            (ap - ao) ** 2 * n // (n_tot * 1_000_000)
        assert r.res_contrib_micro == \
            (ao - base) ** 2 * n // (n_tot * 1_000_000)
        assert r.unc_micro == unc


# --- multimodal_phash_knn ------------------------------------------------------

def test_phash_knn_matches_bruteforce(spark):
    hashes = {r.media_id: (r.b0, r.b1, r.b2, r.b3) for r in
              MM.extract_png_ahash(
                  MM.png_media_grad_df(spark, SF_SMOKE)).collect()}
    ids = sorted(hashes)
    neigh = defaultdict(list)
    for a in ids:
        ha = hashes[a]
        for b in ids:
            if a == b:
                continue
            hb = hashes[b]
            if not any(x == y for x, y in zip(ha, hb)):
                continue          # the banded-LSH candidate condition
            d = sum(bin(x ^ y).count("1") for x, y in zip(ha, hb))
            if d <= MM.PHASH_HAMMING_MAX:
                neigh[a].append((d, b))
    want = []
    for a in sorted(neigh):
        for rnk, (d, b) in enumerate(sorted(neigh[a])[:MM.PHASH_KNN_K],
                                     start=1):
            want.append((a, rnk, b, d))
    got = [(r.media_id, r.rnk, r.neighbor_id, r.hamming) for r in
           MM.q_multimodal_phash_knn(spark, SF_SMOKE).collect()]
    assert got == want
    # the cap binds somewhere (some image has > K in-radius neighbors)
    assert any(len(v) > MM.PHASH_KNN_K for v in neigh.values())


# --- graph_clustering_coefficient ------------------------------------------------

def test_clustering_coefficient_matches_bruteforce(spark):
    from safeascent_spark.operators import association as ASSOC
    li = _rows(spark, "lineitem", ["l_orderkey", "l_partkey"])
    baskets = defaultdict(set)
    for r in li:
        baskets[r.l_orderkey].add(r.l_partkey)
    sup = Counter()
    for items in baskets.values():
        s = sorted(items)
        for i, a in enumerate(s):
            for b in s[i + 1:]:
                sup[(a, b)] += 1
    edges = {k for k, c in sup.items() if c >= ASSOC.MIN_SUPPORT}
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    per = {}
    for v, nb in adj.items():
        d = len(nb)
        if d < 2:
            continue
        t = sum(1 for x in nb for y in nb
                if x < y and (x, y) in edges)
        per[v] = (d, t, 2 * t * 1_000_000 // (d * (d - 1)))
    bins = defaultdict(list)
    for d, t, cc in per.values():
        bins[min(9, cc // ASSOC.CC_BIN_PPM)].append((d, t, cc))
    got = ASSOC.q_graph_clustering_coefficient(spark, SF_SMOKE).collect()
    assert [r.cc_bin for r in got] == sorted(bins)
    for r in got:
        vs = bins[r.cc_bin]
        assert r.n_nodes == len(vs)
        assert r.n_wedges == sum(d * (d - 1) // 2 for d, _, _ in vs)
        assert r.n_closed == sum(t for _, t, _ in vs)
        assert r.avg_cc_ppm == sum(cc for _, _, cc in vs) // len(vs)
    # the co-purchase graph is clique-y somewhere and open somewhere
    assert len(got) >= 2
