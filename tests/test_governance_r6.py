"""Round-6 wave-11 semantics: data-governance profilers and
vector-index eval (label-noise audit, recall-vs-probe-radius curve)."""

from __future__ import annotations

import math

from safeascent_spark import domain
from safeascent_spark.operators import monitor as MON
from safeascent_spark.operators import similarity as SIM
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.test_plans import n_ops, plan_of


def test_column_profile_matches_bruteforce(spark):
    rows = {r.col_name: r for r in
            MON.q_dq_column_profile(spark, SF_ORACLE).collect()}
    orders = domain.load_table(spark, SF_ORACLE, "orders").collect()
    assert set(rows) == {n for n, _, _k in MON._PROFILE_SPEC}
    r = rows["o_orderkey"]
    keys = [x.o_orderkey for x in orders]
    assert r.n_rows == len(orders) and r.n_null == 0
    assert r.n_distinct == len(set(keys))
    assert r.min_val == str(min(keys)) and r.max_val == str(max(keys))
    # numeric (not lexicographic) min/max on the derived cents column
    c = rows["o_totalprice_c"]
    cents = [math.floor(x.o_totalprice * 100) for x in orders]
    assert c.min_val == str(min(cents)) and c.max_val == str(max(cents))
    s = rows["o_orderstatus"]
    assert s.n_distinct == len({x.o_orderstatus for x in orders})


def test_column_profile_is_one_pass_and_distributed(spark):
    plan = plan_of(MON.q_dq_column_profile(spark, SF_SMOKE))
    assert n_ops(plan, "Scan parquet") == 1   # NOT five per-column scans
    assert "Generate" in plan                 # the in-row unpivot
    # the distinct count must be a distributed two-level aggregate, NOT
    # the valueSet/SortAggregate fallback that merges every distinct
    # value on one partition (a single task holding every o_orderkey)
    assert "valueSet" not in plan
    assert "partial_count" in plan            # map-side combine


def test_k_anonymity_releases_no_small_group(spark):
    rows = MON.q_dq_k_anonymity(spark, SF_ORACLE).collect()
    star = [r for r in rows if r.lang == "*"]
    released = [r for r in rows if r.lang != "*"]
    assert len(star) == 1 and released
    assert all(r.n_docs >= MON.K_ANON for r in released)
    assert all(r.n_suppressed_groups == 0 for r in released)
    assert star[0].n_suppressed_groups > 0
    n_docs = domain.load_table(spark, SF_ORACLE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_label_noise_matches_bruteforce(spark):
    rows = {r.vec_id: r for r in
            SIM.q_knn_label_noise(spark, SF_ORACLE).collect()}
    assert set(rows) == set(range(SIM.NOISE_PROBES))
    vecs = {r.vec_id: (r.label,
                       [round(max(-1.0, min(1.0, x)) * 127)
                        for x in r.vec])
            for r in SIM.embeddings_df(spark, SF_ORACLE).collect()}
    norms = {v: math.sqrt(sum(x * x for x in q))
             for v, (_, q) in vecs.items()}
    for probe in (0, 7, 23):
        own_label, q = vecs[probe]
        scored = sorted(
            ((sum(a * b for a, b in zip(q, c)) / (norms[probe] * norms[v]),
              v) for v, (_, c) in vecs.items() if v != probe),
            key=lambda t: (-t[0], t[1]))
        top = [v for _, v in scored[:SIM.NOISE_K]]
        disagree = sum(1 for v in top if vecs[v][0] != own_label)
        r = rows[probe]
        assert (r.n_disagree, r.label) == (disagree, own_label)
        assert r.noise_ppm == disagree * 1_000_000 // SIM.NOISE_K
        assert r.flagged == (r.noise_ppm >= SIM.NOISE_FLAG_PPM)


def test_recall_curve_is_monotone_and_bounded(spark):
    rows = SIM.q_ann_recall_curve(spark, SF_ORACLE).collect()
    assert [r.radius for r in rows] == list(SIM.RC_RADII)
    max_hits = SIM.N_QUERIES * SIM.RC_K
    prev_hits, prev_cand = -1, -1
    for r in rows:
        assert 0 <= r.n_hits <= max_hits
        assert r.recall_ppm == r.n_hits * 1_000_000 // max_hits
        # widening the probe radius can only add candidates and hits
        assert r.n_cand_pairs >= prev_cand and r.n_hits >= prev_hits
        prev_hits, prev_cand = r.n_hits, r.n_cand_pairs
    # radius 2 of a 6-bit code admits 22/64 of cells on average —
    # candidates must be a strict subset of the full corpus
    n_corpus = SIM.embeddings_df(spark, SF_ORACLE).count()
    assert rows[-1].n_cand_pairs < SIM.N_QUERIES * (n_corpus - 1)


# --- wave 12: embedding diagnostics, hard negatives, kappa, embargo -------

def test_class_separation_matches_numpy(spark):
    import numpy as np
    rows = SIM.q_embedding_class_separation(spark, SF_ORACLE).collect()
    assert len(rows) == SIM.SEP_TOP_DIMS
    vecs = SIM.embeddings_df(spark, SF_ORACLE).collect()
    q = {r.vec_id: (r.label,
                    np.array([round(max(-1.0, min(1.0, x)) * 127) + 127
                              for x in r.vec], dtype=np.int64))
         for r in vecs}
    labels = sorted({l for l, _ in q.values()})
    n = len(q)
    by_label = {l: np.stack([v for ll, v in q.values() if ll == l])
                for l in labels}
    S = sum(m.sum(axis=0) for m in by_label.values())
    want = {}
    for d in range(SIM.DIM):
        m_g = S[d] * 1000 // n
        b = w = 0
        for l in labels:
            col = by_label[l][:, d]
            n_l, s_l, q_l = len(col), int(col.sum()), int((col * col).sum())
            m_l = s_l * 1000 // n_l
            b += n_l * (m_l - m_g) ** 2
            w += (n_l * q_l - s_l * s_l) * 1_000_000 // n_l
        want[d] = (b, w, b * 1_000_000 // max(w, 1))
    for r in rows:
        assert (r.between_milli2, r.within_milli2,
                r.fisher_ppm) == want[r.dim]
    # the returned dims really are the argmax set
    best = sorted(want.items(), key=lambda kv: (-kv[1][2], kv[0]))[:10]
    assert [r.dim for r in rows] == [d for d, _ in best]


def test_hard_negatives_are_cross_label_and_hardest(spark):
    rows = SIM.q_sample_hard_negatives(spark, SF_ORACLE).collect()
    assert len(rows) == SIM.HN_PROBES * SIM.HN_M
    for r in rows:
        assert r.neg_label != r.anchor_label
    # per probe, ranks are 1..M with non-increasing cosine
    from collections import defaultdict
    per = defaultdict(list)
    for r in rows:
        per[r.query_id].append((r.neg_rank, r.cosine))
    for q, rs in per.items():
        rs.sort()
        assert [x[0] for x in rs] == list(range(1, SIM.HN_M + 1))
        cosines = [x[1] for x in rs]
        assert cosines == sorted(cosines, reverse=True)


def test_kappa_bounds_and_formula(spark):
    r = SIM.q_eval_cohens_kappa(spark, SF_ORACLE).collect()[0]
    assert r.n_eval == SIM.KNN_QUERIES
    assert 0 <= r.n_agree <= r.n_eval
    num = (r.n_agree * r.n_eval - r.rowcol) * 1_000_000
    den = r.n_eval * r.n_eval - r.rowcol
    assert r.kappa_ppm == int(num / den)  # both engines truncate
    assert -1_000_000 <= r.kappa_ppm <= 1_000_000


def test_time_embargo_partitions_and_leak_readout(spark):
    from safeascent_spark.operators import curation as CU
    rows = CU.q_sample_time_embargo(spark, SF_ORACLE).collect()
    assert rows
    e = domain.load_table(spark, SF_ORACLE, "events")
    n_events = e.count()
    assert sum(r.n_train + r.n_embargo + r.n_test for r in rows) == n_events
    for r in rows:
        assert r.n_overlap_users <= min(r.n_train_users, r.n_test_users)
        assert r.n_train > 0 and r.n_test > 0


# --- wave 13: layout, coreset, canonical dedup ----------------------------

def test_zorder_buckets_tile_the_data(spark):
    from safeascent_spark.operators import layout as LAY
    rows = LAY.q_layout_zorder(spark, SF_ORACLE).collect()
    assert len(rows) > 1                      # grain resolves the region
    n = sum(r.n_accidents for r in rows)
    assert n == domain.accidents_df(spark, SF_ORACLE).count()
    for r in rows:
        area = (r.lat_hi - r.lat_lo + 1) * (r.lng_hi - r.lng_lo + 1)
        assert r.packing_ppm == r.n_accidents * 1_000_000 // area
        # a Z-bucket's bbox cannot exceed its own tile: top-12-bit
        # buckets fix 6 high bits per axis -> 16-cell extent max
        assert r.lat_hi - r.lat_lo < 2 ** (LAY.Z_BUCKET_SHIFT // 2)
        assert r.lng_hi - r.lng_lo < 2 ** (LAY.Z_BUCKET_SHIFT // 2)
    zb = [r.zbucket for r in rows]
    assert zb == sorted(zb)


def test_coreset_fps_matches_greedy_bruteforce(spark):
    rows = SIM.q_sample_coreset_fps(spark, SF_ORACLE).collect()
    assert [r.sel_round for r in rows] == list(range(SIM.FPS_ROUNDS + 1))
    vecs = {r.vec_id: [round(max(-1.0, min(1.0, x)) * 127) for x in r.vec]
            for r in SIM.embeddings_df(spark, SF_ORACLE).collect()}
    d2 = lambda a, b: sum((x - y) ** 2 for x, y in zip(vecs[a], vecs[b]))
    selected = [SIM.FPS_SEED_ID]
    mind = {v: d2(v, SIM.FPS_SEED_ID) for v in vecs if v != SIM.FPS_SEED_ID}
    for r in rows[1:]:
        pick = min(mind, key=lambda v: (-mind[v], v))
        assert (r.center_id, r.dist2_to_set) == (pick, mind[pick])
        selected.append(pick)
        del mind[pick]
        for v in mind:
            mind[v] = min(mind[v], d2(v, pick))
    assert len(set(selected)) == SIM.FPS_ROUNDS + 1


def test_canonical_prefers_quality_over_min_id(spark):
    from safeascent_spark.operators import dedup as D
    from safeascent_spark.operators import text as TX
    rows = D.q_dedup_canonical(spark, SF_ORACLE).collect()
    assert rows
    clusters = {r.doc_id: r.cluster_rep
                for r in D.q_dedup_clusters(spark, SF_ORACLE).collect()
                if r.cluster_size >= 2}
    # integer micro-unit quality, mirrored from text.quality_u_df (per-term
    # BIGINT truncating division — ADVICE r6 high replaced round(q*1e6))
    docs = {r.doc_id: (r.n_chars, r.text)
            for r in TX.docs_df(spark, SF_ORACLE)
                       .select("doc_id", "n_chars", "text").collect()}

    def qual_u(doc_id):
        nch, text = docs[doc_id]
        toks = [t for t in text.split(" ") if t]
        ntok = len(toks)
        nstop = sum(1 for t in toks if t in TX.STOPWORDS)
        t = max(ntok, 1)
        return (min(4000 * ntok, 400000)
                + min((1200000 * nstop) // t, 300000)
                + min((300000 * (nch - ntok + 1)) // (8 * t), 300000))

    qual = {d: qual_u(d) for d in docs}
    from collections import defaultdict
    members = defaultdict(list)
    for doc, rep in clusters.items():
        members[rep].append(doc)
    assert {r.cluster_rep for r in rows} == set(members)
    for r in rows:
        docs = members[r.cluster_rep]
        best = max(qual[d] for d in docs)
        want = min(d for d in docs if qual[d] == best)
        assert (r.canonical_doc, r.canonical_quality_u) == (want, best)
        assert r.beats_min_id == (want != r.cluster_rep)


# --- wave 14: exact percentiles, MAD outliers, table fingerprint ----------

def test_latency_percentiles_match_bruteforce(spark):
    rows = {r.event_type: r for r in
            MON.q_events_latency_percentiles(spark, SF_ORACLE).collect()}
    import math
    per_type: dict[str, list[int]] = {}
    for e in domain.load_table(spark, SF_ORACLE, "events").collect():
        per_type.setdefault(e.event_type,
                            []).append(math.floor(e.value * 1_000_000))
    assert set(rows) == set(per_type)
    for t, vals in per_type.items():
        vals.sort()
        r = rows[t]
        assert r.n_events == len(vals)
        for p, got in ((50, r.p50_micro), (90, r.p90_micro),
                       (99, r.p99_micro)):
            assert got == vals[(len(vals) - 1) * p // 100]


def test_latency_percentiles_plan_has_no_single_partition_sort(spark):
    plan = plan_of(MON.q_events_latency_percentiles(spark, SF_SMOKE))
    assert "SinglePartition" not in plan.split("TakeOrdered")[0] \
        or "Window" not in plan  # banded device: no global window sort
    assert "Window" in plan      # the in-band windows exist


def test_mad_outliers_match_bruteforce(spark):
    rows = {r.event_type: r for r in
            MON.q_events_mad_outliers(spark, SF_ORACLE).collect()}
    import math
    per_type: dict[str, list[int]] = {}
    for e in domain.load_table(spark, SF_ORACLE, "events").collect():
        per_type.setdefault(e.event_type,
                            []).append(math.floor(e.value * 1_000_000))
    for t, vals in per_type.items():
        vals.sort()
        med = vals[(len(vals) - 1) // 2]
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(len(devs) - 1) // 2]
        n_out = sum(1 for v in vals if abs(v - med) > MON.MAD_K * mad)
        r = rows[t]
        assert (r.median_micro, r.mad_micro, r.n_outliers) == \
            (med, mad, n_out)


def test_fingerprint_is_order_invariant_and_row_sensitive(spark):
    rows = MON.q_dq_table_fingerprint(spark, SF_ORACLE).collect()
    n = domain.load_table(spark, SF_ORACLE, "orders").count()
    assert sum(r.n_rows for r in rows) == n
    import math
    # brute-force one month from a SHUFFLED row list (order invariance)
    target = rows[0].month
    hs = []
    for o in domain.load_table(spark, SF_ORACLE, "orders").collect():
        if o.o_orderdate.strftime("%Y-%m") == target:
            h = ((o.o_orderkey % MON.FP_PRIME) * 1000003
                 + (o.o_custkey % MON.FP_PRIME) * 10007
                 + math.floor(o.o_totalprice * 100)) % MON.FP_PRIME
            hs.append(h)
    import random
    random.Random(7).shuffle(hs)
    assert rows[0].fp_sum == sum(hs) % MON.FP_PRIME
    assert rows[0].fp_sumsq == sum(h * h % MON.FP_PRIME
                                   for h in hs) % MON.FP_PRIME
    # removing any one row changes the sum (mod p, h < p so only h = 0
    # rows are invisible to fp_sum; fp_sumsq covers h = 0 too)
    assert rows[0].n_rows == len(hs)


# --- wave 15: CBO calibration + feature binning ---------------------------

def test_join_cardinality_actual_is_join_free_and_right(spark):
    rows = {r.join_pair: r for r in
            MON.q_dq_join_cardinality(spark, SF_ORACLE).collect()}
    # ground truth by actually executing one join
    o = domain.load_table(spark, SF_ORACLE, "orders")
    c = domain.load_table(spark, SF_ORACLE, "customer")
    actual = o.join(c, o.o_custkey == c.c_custkey).count()
    r = rows["orders.o_custkey=customer.c_custkey"]
    assert r.actual_rows == actual
    assert r.est_rows == r.n_l * r.n_r // max(r.ndv_l, r.ndv_r)
    assert r.miss_ratio_ppm == r.actual_rows * 1_000_000 // max(r.est_rows, 1)
    # the op must NOT execute the row-level join: plan joins only
    # |key|-grain aggregates (no fact-x-fact join output columns)
    plan = plan_of(MON.q_dq_join_cardinality(spark, SF_SMOKE))
    assert n_ops(plan, "CartesianProduct") == 0


def test_quantile_bins_are_equal_mass_with_ordered_edges(spark):
    rows = MON.q_features_quantile_bins(spark, SF_ORACLE).collect()
    assert [r.bin_id for r in rows] == list(range(1, MON.QB_BINS + 1))
    n = domain.load_table(spark, SF_ORACLE, "orders").count()
    sizes = [r.n_rows for r in rows]
    assert sum(sizes) == n
    assert max(sizes) - min(sizes) <= 1          # ntile equal mass
    for a, b in zip(rows, rows[1:]):
        assert a.lo_cents <= a.hi_cents <= b.lo_cents  # ordered edges


# --- wave 16: change points + corpus naturalness --------------------------

def test_changepoint_matches_bruteforce(spark):
    rows = {r.event_type: r for r in
            MON.q_events_changepoint(spark, SF_ORACLE).collect()}
    import math
    per_type: dict[str, list] = {}
    for e in domain.load_table(spark, SF_ORACLE, "events").collect():
        per_type.setdefault(e.event_type, []).append(
            (e.ts, e.event_id, math.floor(e.value * 1_000_000)))
    for t, evs in per_type.items():
        evs.sort(key=lambda x: (x[0], x[1]))
        n = len(evs)
        s_n = sum(v for _, _, v in evs)
        best = None
        s = 0
        for k, (ts, _eid, v) in enumerate(evs, start=1):
            s += v
            d = abs(s * n - k * s_n)
            if best is None or d > best[0] or (d == best[0]
                                               and k < best[1]):
                best = (d, k, ts, s)
        r = rows[t]
        assert (r.cusum_dev, r.cp_k, r.cp_ts_ns,
                r.prefix_sum_micro) == best
        assert r.n_events == n


def test_changepoint_plan_windows_are_day_banded(spark):
    plan = plan_of(MON.q_events_changepoint(spark, SF_SMOKE))
    assert "CartesianProduct" not in plan
    # cumulative sums ride (type, day) bands; the only per-type-only
    # windows run on the tiny per-day totals table (its sort key is
    # day#, never ts#) — no window sorts the raw event stream by a
    # bare event_type partition
    import re
    for m in re.finditer(r"Arguments: \[[^\]]*windowspecdefinition"
                         r"\(event_type#\d+, ([^)]*)\)", plan):
        spec = m.group(1)
        assert "day#" in spec or "ts#" not in spec


def test_zipf_slope_is_negative_and_matches_numpy(spark):
    from safeascent_spark.operators import curation as CU
    from safeascent_spark.operators import text as TX
    r = CU.q_text_zipf_fit(spark, SF_ORACLE).collect()[0]
    import math
    from collections import Counter
    freqs = Counter()
    for d in TX.docs_df(spark, SF_ORACLE).collect():
        for w in d.text.split(" "):
            if w:
                freqs[w] += 1
    ranked = sorted(freqs.items(), key=lambda kv: (-kv[1], kv[0]))
    xs = [math.floor(1_000_000 * math.log(i + 1))
          for i in range(len(ranked))]
    ys = [math.floor(1_000_000 * math.log(f)) for _, f in ranked]
    n, sx, sy = len(xs), sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    # python // floors while the engines truncate toward zero;
    # reconcile with exact integer arithmetic (no float division —
    # the operands exceed 2^53)
    num = (n * sxy - sx * sy) * 1_000_000
    den = n * sxx - sx * sx
    want = -((-num) // den) if (num < 0) != (den < 0) else num // den
    assert r.n_vocab == n
    assert r.slope_ppm == want
    assert r.slope_ppm < 0          # frequencies decay with rank


# --- wave 17: seasonal decomposition + ABC classes ------------------------

def test_seasonality_reconstructs_and_matches_bruteforce(spark):
    from safeascent_spark.operators import forecast as FC
    rows = FC.q_events_seasonality(spark, SF_ORACLE).collect()
    assert rows
    day_ns = 86_400_000_000_000
    from collections import Counter, defaultdict
    daily: dict[str, Counter] = defaultdict(Counter)
    for e in domain.load_table(spark, SF_ORACLE, "events").collect():
        daily[e.event_type][e.ts // day_ns] += 1
    h = FC.STL_HALF
    for t, cnt in daily.items():
        days = sorted(cnt)
        interior = days[h:len(days) - h]
        got = {r.day: r for r in rows if r.event_type == t}
        assert set(got) == set(interior)
        detr = {}
        for d in interior:
            wsum = sum(cnt[x] for x in range(d - h, d + h + 1))
            trend = wsum * 1000 // (2 * h + 1)
            assert got[d].trend_milli == trend
            detr[d] = cnt[d] * 1000 - trend
        for d in interior:
            grp = [detr[x] for x in interior if x % 7 == d % 7]
            s, n = sum(grp), len(grp)
            seasonal = -((-s) // n) if s < 0 else s // n  # truncation
            assert got[d].seasonal_milli == seasonal
            assert got[d].resid_milli == detr[d] - seasonal
        # decomposition reconstructs: n*1000 = trend + seasonal + resid
        for d in interior:
            r = got[d]
            assert (r.trend_milli + r.seasonal_milli + r.resid_milli
                    == r.n_events * 1000)


def test_abc_classes_partition_revenue(spark):
    from safeascent_spark.operators import olap as OL2
    rows = {r.abc: r for r in
            OL2.q_orders_abc_class(spark, SF_ORACLE).collect()}
    assert set(rows) == {"A", "B", "C"}
    total = sum(r.revenue_e4 for r in rows.values())
    assert sum(r.share_ppm for r in rows.values()) <= 1_000_000
    # A covers ~80%: its share must be the largest and near the cut
    assert rows["A"].share_ppm >= rows["B"].share_ppm >= rows["C"].share_ppm
    # every part classified exactly once
    import math
    li = domain.load_table(spark, SF_ORACLE, "lineitem").collect()
    per_part: dict[int, int] = {}
    for x in li:
        per_part[x.l_partkey] = (per_part.get(x.l_partkey, 0)
                                 + math.floor(x.l_extendedprice * 100)
                                 * (100 - round(x.l_discount * 100)))
    assert sum(r.n_parts for r in rows.values()) == len(per_part)
    assert total == sum(per_part.values())
    # brute-force the classification
    ranked = sorted(per_part.items(), key=lambda kv: (-kv[1], kv[0]))
    cum, want = 0, {"A": 0, "B": 0, "C": 0}
    tot = sum(per_part.values())
    for _, rev in ranked:
        cum += rev
        ppm = cum * 1_000_000 // tot
        want["A" if ppm <= OL2.ABC_A_PPM
             else "B" if ppm <= OL2.ABC_B_PPM else "C"] += 1
    assert {k: rows[k].n_parts for k in rows} == want


# --- wave 18: load-gate data-quality checks --------------------------------

def test_referential_integrity_flags_and_counts(spark):
    rows = {r.fk_edge: r for r in
            MON.q_dq_referential_integrity(spark, SF_ORACLE).collect()}
    assert len(rows) == len(MON._FK_EDGES)
    li = domain.load_table(spark, SF_ORACLE, "lineitem")
    orders = {o.o_orderkey for o in
              domain.load_table(spark, SF_ORACLE, "orders").collect()}
    fact = [r.l_orderkey for r in li.collect()]
    orphan = [k for k in fact if k not in orders]
    r = rows["lineitem.l_orderkey->orders.o_orderkey"]
    assert r.n_fact == len(fact)
    assert r.n_orphan == len(orphan)
    assert r.n_orphan_keys == len(set(orphan))
    assert r.intact == (len(orphan) == 0)
    plan = plan_of(MON.q_dq_referential_integrity(spark, SF_SMOKE))
    assert "LeftAnti" in plan


def test_freshness_lag_is_relative_to_freshest(spark):
    rows = MON.q_dq_freshness_lag(spark, SF_ORACLE).collect()
    assert rows
    assert min(r.lag_ns for r in rows) == 0     # the freshest stream
    for r in rows:
        assert r.lag_ns >= 0
        assert r.lag_minutes == r.lag_ns // 60_000_000_000
        assert r.stale == (r.lag_minutes > MON.FRESH_STALE_MIN)


# --- wave 19: PK uniqueness + backlog aging --------------------------------

def test_unique_key_check_matches_bruteforce(spark):
    rows = {r.key: r for r in
            MON.q_dq_unique_key_check(spark, SF_ORACLE).collect()}
    assert len(rows) == len(MON._PK_DECLS)
    evs = [e.event_id for e in
           domain.load_table(spark, SF_ORACLE, "events").collect()]
    from collections import Counter
    c = Counter(evs)
    r = rows["events.event_id"]
    assert r.n_rows == len(evs)
    assert r.n_keys == len(c)
    assert r.n_dup_keys == sum(1 for v in c.values() if v > 1)
    assert r.max_multiplicity == max(c.values())
    assert r.unique == (r.n_dup_keys == 0)


def test_backlog_aging_partitions_orders(spark):
    from safeascent_spark.operators import olap as OL
    rows = OL.q_orders_backlog_aging(spark, SF_ORACLE).collect()
    n = domain.load_table(spark, SF_ORACLE, "orders").count()
    assert sum(r.n_orders for r in rows) == n
    buckets = {r.age_bucket for r in rows}
    e1, e2, e3 = OL.AGING_EDGES
    assert buckets <= {f"0-{e1}", f"{e1 + 1}-{e2}",
                       f"{e2 + 1}-{e3}", f"{e3}+"}
    # the watermark order itself ages 0 days, so a 0-30 bucket exists
    assert any(r.age_bucket == f"0-{e1}" for r in rows)
