"""Round-11 wave-34 semantics, each cross-checked against a
driver-side brute force at sf0.001 (the registration checklist's
brute-force leg; the DuckDB oracle + dual-SF bit-exact legs live in
CORRECTNESS_LOCAL_r11 / CROSSSF_r11).
"""

from __future__ import annotations

from safeascent_spark import sinks as SNK
from safeascent_spark.operators import scoring
from tests.conftest import SF_SMOKE


def _score_rows(spark):
    return {r.route_id: r for r in
            scoring.risk_scores_capped_df(spark, SF_SMOKE).collect()}


# --- s8_score_roundtrip --------------------------------------------------------

def test_s8_roundtrip_matches_direct_scores(spark):
    """The write -> partition-pruned read -> MGET semi-join roundtrip must
    return EXACTLY the requested subset of the direct score table, with
    values untouched by the parquet roundtrip, and none of the decoy
    date's perturbed rows."""
    direct = _score_rows(spark)
    want_ids = sorted(i for i in direct
                      if i % SNK.S8_MGET_MOD == 3)[:SNK.S8_MGET_LIMIT]
    got = SNK.q_s8_score_roundtrip(spark, SF_SMOKE).collect()
    assert [r.route_id for r in got] == want_ids
    for r in got:
        d = direct[r.route_id]
        assert (r.risk_score, r.color_code, r.num_contributing) == \
            (d.risk_score, d.color_code, d.num_contributing)
        # a broken partition prune would surface the decoy's +1000 shift
        assert r.num_contributing < 1000
        assert r.prediction_date == "2024-06-15"


# --- s9_retention_survivors ----------------------------------------------------

def test_s9_upsert_purge_survivors_match_bruteforce(spark):
    """After the 3-date write + delta upsert + purge: exactly two
    surviving dates; the middle date bit-identical to the direct table;
    the newest date with latest-wins delta rows for route_id % 5 == 0."""
    direct = _score_rows(spark)
    d0, d1, d2 = SNK.S9_DATES
    n = len(direct)
    n_up = sum(1 for i in direct if i % SNK.S9_UPSERT_MOD == 0)
    sum_micro = sum(round(r.risk_score * 1_000_000)
                    for r in direct.values())
    sum_contrib = sum(r.num_contributing for r in direct.values())
    sum_contrib_d2 = (sum(r.num_contributing for i, r in direct.items()
                          if i % SNK.S9_UPSERT_MOD != 0) - n_up)
    got = {r.prediction_date: r for r in
           SNK.q_s9_retention_survivors(spark, SF_SMOKE).collect()}
    assert sorted(got) == [d1, d2]          # d0 purged, nothing else
    assert (got[d1].n_routes, got[d1].n_upserted) == (n, 0)
    assert got[d1].sum_risk_micro == sum_micro
    assert got[d1].sum_contributing == sum_contrib
    assert (got[d2].n_routes, got[d2].n_upserted) == (n, n_up)
    assert got[d2].sum_risk_micro == sum_micro   # delta keeps the score
    assert got[d2].sum_contributing == sum_contrib_d2


# --- dedup_longest_span --------------------------------------------------------

def test_longest_span_matches_quadratic_bruteforce(spark):
    """Independent recompute of the DEFINITION (not the algorithm): for
    every position, the longest L in [W, W+CAP] whose token tuple occurs
    >= 2 times anywhere in the corpus; per doc, the max + argmin + count
    of argmax positions.  Validates the bucketed suffix-neighbor LCP
    device against plain counting."""
    from collections import Counter, defaultdict
    from safeascent_spark.operators import dedup as D
    from safeascent_spark import domain
    from pyspark.sql import functions as F

    W, CAP = D.SPAN_W, D.SPAN_EXT_CAP
    corpus = D._rng_corpus(
        domain.load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", "text"))
    toks = {r.doc_id: [t for t in r.text.split(" ") if t]
            for r in corpus.collect()}
    occ = Counter()
    for d, ws in toks.items():
        for p in range(len(ws)):
            for L in range(W, min(W + CAP, len(ws) - p) + 1):
                occ[tuple(ws[p:p + L])] += 1
    best = {}
    for d, ws in toks.items():
        spans = []
        for p in range(len(ws) - W + 1):
            top = 0
            for L in range(W, min(W + CAP, len(ws) - p) + 1):
                if occ[tuple(ws[p:p + L])] >= 2:
                    top = L
            if top:
                spans.append((p + 1, top))      # 1-based pos
        if spans:
            m = max(s for _, s in spans)
            hits = [p for p, s in spans if s == m]
            best[d] = (m, min(hits), len(hits))
    got = {r.doc_id: (r.longest_span, r.span_start, r.n_max_positions)
           for r in D.q_dedup_longest_span(spark, SF_SMOKE).collect()}
    assert got == best
    # the fixture must actually exercise variable lengths (not all == W)
    assert len({v[0] for v in best.values()}) >= 3


# --- ml_isotonic_calibration ----------------------------------------------------

def test_isotonic_fit_matches_sequential_pava(spark):
    """The distributed minimax identity must agree with the CLASSIC
    sequential pool-adjacent-violators sweep run on exact rationals:
    floor is nondecreasing, so it commutes with min/max, hence the
    engine's floored minimax == floor(exact PAVA fit) bin for bin."""
    from fractions import Fraction
    from safeascent_spark import ml as ML
    from safeascent_spark.operators import evalrank as ER

    rows = ML.q_ml_risk_model(spark, SF_SMOKE).select(
        "risk_score", "predicted_risk").collect()
    bw = 1_000_000 // ER.ISO_BINS
    agg = {}
    for r in rows:
        p = round(min(max(r.predicted_risk, 0.0), 100.0) * 10000)
        b = min(ER.ISO_BINS - 1, p // bw)
        n, sp, sa = agg.get(b, (0, 0, 0))
        agg[b] = (n + 1, sp + p, sa + round(r.risk_score * 1_000_000))
    bins = sorted(agg)
    # classic PAVA over (weight=n, mean=sa/n) blocks, exact arithmetic
    blocks = [[agg[b][0], Fraction(agg[b][2], agg[b][0]), [b]]
              for b in bins]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] > blocks[i + 1][1]:
            w = blocks[i][0] + blocks[i + 1][0]
            mean = (blocks[i][1] * blocks[i][0]
                    + blocks[i + 1][1] * blocks[i + 1][0]) / w
            blocks[i] = [w, mean, blocks[i][2] + blocks[i + 1][2]]
            del blocks[i + 1]
            if i:
                i -= 1
        else:
            i += 1
    pava = {}
    for w, mean, members in blocks:
        for b in members:
            pava[b] = mean // 1            # floor of the exact fit
    got = {r.bin: r for r in
           ER.q_ml_isotonic_calibration(spark, SF_SMOKE).collect()}
    assert sorted(got) == bins
    fits = [got[b].iso_fit_micro for b in bins]
    assert fits == sorted(fits)            # monotone non-decreasing
    for b in bins:
        n, sp, sa = agg[b]
        assert got[b].n_routes == n
        assert got[b].avg_pred_ppm == sp // n
        assert got[b].avg_actual_micro == sa // n
        assert got[b].iso_fit_micro == pava[b], b


# --- tpch_q9_product_profit ------------------------------------------------------

def test_q9_profit_matches_bruteforce(spark):
    """Row-level Python recompute: derived supply cost (min unit
    milli-cents per (part, supplier)), profit in 1e-5-dollar units,
    grouped (supplier nation, order year)."""
    from collections import defaultdict
    from safeascent_spark import domain
    from safeascent_spark.operators import olap as OL

    def rows(t, cols):
        return domain.load_table(spark, SF_SMOKE, t).select(*cols).collect()

    widget = {r.p_partkey for r in rows("part", ["p_partkey", "p_name"])
              if OL.Q9_PART_TOKEN in r.p_name}
    nat = {r.n_nationkey: r.n_name
           for r in rows("nation", ["n_nationkey", "n_name"])}
    s_nat = {r.s_suppkey: nat[r.s_nationkey]
             for r in rows("supplier", ["s_suppkey", "s_nationkey"])}
    o_year = {r.o_orderkey: r.o_orderdate.year
              for r in rows("orders", ["o_orderkey", "o_orderdate"])}
    li = rows("lineitem", ["l_orderkey", "l_partkey", "l_suppkey",
                           "l_extendedprice", "l_discount", "l_quantity"])
    import math
    cost = {}
    for r in li:
        if r.l_partkey not in widget:
            continue
        c = (math.floor(r.l_extendedprice * 100) * 1000
             // math.floor(r.l_quantity))
        k = (r.l_partkey, r.l_suppkey)
        cost[k] = min(cost.get(k, c), c)
    agg = defaultdict(lambda: [0, 0])
    for r in li:
        if r.l_partkey not in widget:
            continue
        rev = (math.floor(r.l_extendedprice * 100)
               * (100 - math.floor(r.l_discount * 100 + 0.5)))
        pe5 = rev * 10 - cost[(r.l_partkey, r.l_suppkey)] \
            * math.floor(r.l_quantity)
        k = (s_nat[r.l_suppkey], o_year[r.l_orderkey])
        agg[k][0] += pe5
        agg[k][1] += 1
    got = OL.q_tpch_q9_product_profit(spark, SF_SMOKE).collect()
    assert len(got) == len(agg)
    for r in got:
        pe5, n = agg[(r.nation, r.o_year)]
        assert (int(r.profit_e5), r.n_lineitems) == (pe5, n)
    # ordering: nation asc, year desc
    keys = [(r.nation, -r.o_year) for r in got]
    assert keys == sorted(keys)


# --- events_late_arrival_audit --------------------------------------------------

def test_late_arrival_audit_matches_bruteforce(spark):
    """Sequential replay per type in client-batch arrival order
    (slot, user_id, ts, event_id), tracking the running max event time —
    validates the two-level prefix-max decomposition against the plain
    sequential scan, and that the fixture genuinely contains late
    events under this arrival model (the audit is not vacuous; the raw
    event_id order is exactly ts-sorted, which is why the operator
    models batched uploads instead)."""
    from collections import defaultdict
    from safeascent_spark import domain
    from safeascent_spark.operators import analytics as A

    ev = sorted(domain.load_table(spark, SF_SMOKE, "events")
                .select("event_id", "user_id", "event_type", "ts")
                .collect(),
                key=lambda r: (r.ts // A.LATE_SLOT_NS, r.user_id,
                               r.ts, r.event_id))
    hwm: dict = {}
    late = defaultdict(list)
    for r in ev:
        h = hwm.get(r.event_type)
        late[r.event_type].append(
            (h - r.ts) // 1_000_000 if h is not None and h > r.ts else 0)
        hwm[r.event_type] = max(h, r.ts) if h is not None else r.ts
    got = A.q_events_late_arrival_audit(spark, SF_SMOKE).collect()
    assert len(got) == len(late) * len(A.LATE_DELAYS_MS)
    for r in got:
        ls = late[r.event_type]
        assert r.n_events == len(ls)
        assert r.max_lateness_ms == max(ls)
        assert r.n_dropped == sum(1 for x in ls if x > r.delay_ms)
    assert any(r.n_dropped > 0 for r in got), "fixture has no late events"


# --- batch_scores_incremental ----------------------------------------------------

def test_incremental_merge_equals_classed_within_quantization(spark):
    """The merged per-batch pico-partials must reproduce the classed
    nightly scores up to the pico quantization: risk differs from
    batch_scores_classed by < 1e-5 everywhere (quantizing base at 1e-12
    then x7 normalization cannot move a 6-decimal score more), and the
    engine's own two-phase sum must be EXACTLY the single-phase pico sum
    (recomputed here per class from collected base rows)."""
    from collections import defaultdict
    import math
    from safeascent_spark import domain
    from safeascent_spark.operators import batch as B

    inc = {r.route_id: r for r in
           B.q_batch_scores_incremental(spark, SF_SMOKE).collect()}
    cls = {r.route_id: r for r in
           B.batch_scores_classed_df(spark, SF_SMOKE).collect()}
    assert sorted(inc) == sorted(cls)
    assert all(abs(inc[k].risk_score - cls[k].risk_score) < 1e-5
               for k in inc)
    # exact single-phase pico recompute of the merged classed table
    base = B._location_base_df(spark, SF_SMOKE,
                               domain.PRED_DATE).collect()
    one = defaultdict(int)
    two = defaultdict(lambda: defaultdict(int))
    for r in base:
        k = (r.location_id, r.a_tidx, r.a_gdiff)
        p = math.floor(r.base * B.INC_PICO)
        one[k] += p
        two[k][r.accident_id % B.INC_NEW_MOD == 0] += p
    merged = {k: sum(v.values()) for k, v in two.items()}
    assert merged == dict(one)
    # non-vacuity: at sf0.001 every (location, class) cell holds a single
    # accident (10 accidents, fully separated by tidx x gdiff), so the
    # class-level merge combines partials only at sf0.01+ (covered by the
    # dual-SF gate); the ROUTE-level sum must still draw from BOTH
    # batches somewhere, or the split models nothing
    by_loc = defaultdict(set)
    for r in base:
        by_loc[r.location_id].add(r.accident_id % B.INC_NEW_MOD == 0)
    assert any(len(v) == 2 for v in by_loc.values())


# --- embedding_matryoshka_recall --------------------------------------------------

def test_matryoshka_recall_matches_bruteforce(spark):
    """NumPy recompute of prefix-renormalized int8 top-K per dim and the
    recall against the full-dim truth — validates slices, prefix norms,
    tie-breaks, and the zero-recall grid fill."""
    import numpy as np
    from safeascent_spark.operators import similarity as S

    rows = (S.quantized_df(spark, SF_SMOKE)
            .select("vec_id", "qvec").collect())
    vecs = {r.vec_id: np.array(r.qvec, dtype=np.int64) for r in rows}
    topk = {}
    for d in S.MRL_DIMS:
        for qid in range(S.N_QUERIES):
            qv = vecs[qid][:d]
            scored = []
            for vid, v in vecs.items():
                if vid == qid:
                    continue
                c = float(np.dot(v[:d], qv)) / (
                    np.sqrt(float(np.dot(v[:d], v[:d])))
                    * np.sqrt(float(np.dot(qv, qv))))
                scored.append((-c, vid))
            scored.sort()
            topk[(d, qid)] = {vid for _, vid in scored[:S.TOP_K]}
    got = {(r.dim, r.query_id): r for r in
           S.q_embedding_matryoshka_recall(spark, SF_SMOKE).collect()}
    assert sorted(got) == sorted(topk)
    for (d, qid), r in got.items():
        want = len(topk[(d, qid)] & topk[(S.DIM, qid)])
        assert r.n_hits == want, (d, qid)
        assert r.recall_ppm == want * 1_000_000 // S.TOP_K
    # full dim is its own truth; short prefixes must actually lose recall
    assert all(got[(S.DIM, q)].n_hits == S.TOP_K
               for q in range(S.N_QUERIES))
    assert any(got[(S.MRL_DIMS[0], q)].n_hits < S.TOP_K
               for q in range(S.N_QUERIES))
