"""Semantics of the round-5 sixth-through-eleventh-wave operators
(beyond oracle parity): plan shapes, conservation laws, brute-force
parity, ground-truth recovery, and seeded-violation detection."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from safeascent_spark.operators import text as TX
from tests.conftest import SF_ORACLE


def test_perplexity_terciles_balanced_per_source(spark):
    """ntile(3) per source: bucket sizes within a source differ by <= 1,
    keep is exactly head+middle, and ordering is consistent — every head
    doc has bits/token <= every tail doc of the same source."""
    rows = TX.q_text_perplexity_filter(spark, SF_ORACLE).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
        assert r.keep == (r.ppl_bucket != "tail")
    assert len(by_source) > 1
    for src, rs in by_source.items():
        sizes = Counter(r.ppl_bucket for r in rs)
        if len(rs) >= 3:
            assert max(sizes.values()) - min(sizes.values()) <= 1, (src, sizes)
        head_max = max((r.bits_per_token_micro for r in rs
                        if r.ppl_bucket == "head"), default=None)
        tail_min = min((r.bits_per_token_micro for r in rs
                        if r.ppl_bucket == "tail"), default=None)
        if head_max is not None and tail_min is not None:
            assert head_max <= tail_min, (src, head_max, tail_min)


def test_perplexity_covers_every_tokenized_doc(spark):
    n_docs = (TX.docs_df(spark, SF_ORACLE)
              .filter(F.trim(F.col("text")) != "").count())
    n_scored = TX.q_text_perplexity_filter(spark, SF_ORACLE).count()
    assert n_scored == n_docs


def test_star_revenue_plan_pushes_date_and_broadcasts_dims(spark):
    """The Q5-shape star join: the one-year predicate must reach the
    orders parquet scan (PushedFilters), nation/region ride broadcast
    hash joins, and no cartesian/nested-loop join appears anywhere."""
    from safeascent_spark.operators import analytics as A
    from tests.test_plans import n_ops, plan_of
    plan = plan_of(A.q_star_revenue(spark, SF_ORACLE))
    assert "BroadcastHashJoin" in plan
    assert n_ops(plan, "CartesianProduct") == 0
    assert n_ops(plan, "BroadcastNestedLoopJoin") == 0
    # date predicate pushed into the orders scan
    scan = plan[plan.find("orders"):]
    assert "PushedFilters" in plan
    assert "o_orderdate" in scan


def test_scd2_intervals_partition_each_user_timeline(spark):
    """SCD2 contract: every purchase matches AT MOST one interval (the
    join cannot duplicate facts), intervals are disjoint and adjacent
    per user, and the matched tier equals the most recent signup at or
    before the purchase."""
    from safeascent_spark.operators import analytics as A
    rows = A.q_events_scd2(spark, SF_ORACLE).collect()
    ids = [r.purchase_id for r in rows]
    assert len(ids) == len(set(ids))  # no fact duplication
    # reference check on raw events
    from safeascent_spark import domain
    ev = domain.load_table(spark, SF_ORACLE, "events").collect()
    signups: dict[int, list] = {}
    for r in ev:
        if r.event_type == "signup":
            signups.setdefault(r.user_id, []).append(
                (r.ts, r.event_id, int(r.value * 1000 // 1)))
    for s in signups.values():
        s.sort()
    import math
    for r in rows:
        cands = [s for s in signups.get(r.user_id, []) if s[0] <= r.t_purchase]
        if not cands:
            assert r.tier_milli is None
        else:
            # recompute tier from the chosen signup's value floor
            t_last, eid, _ = cands[-1]
            raw = next(x.value for x in ev
                       if x.event_id == eid)
            assert r.tier_milli == math.floor(raw * 1000), r
            assert r.valid_from == t_last


def test_entity_resolution_recovers_ground_truth(spark):
    """Every noisy listing must link back to the route that generated it
    (truth = listing_id div 4), and the blocking genuinely collides
    distinct entities (some listing sees >1 in-block candidate), so the
    Levenshtein argmin is doing real disambiguation work."""
    from safeascent_spark.operators import relational as R
    from safeascent_spark import domain
    rows = R.q_entity_resolution(spark, SF_ORACLE).collect()
    n_routes = domain.routes_df(spark, SF_ORACLE).count()
    assert len(rows) == 4 * n_routes  # every variant resolved
    for r in rows:
        assert r.matched_route_id == r.listing_id // 4, r
        assert 1 <= r.edit_distance <= 2
    # blocks key on last-4 digits: occupancy stays bounded as the corpus
    # grows (the sf1 curve is the scale regression guard); collisions —
    # and real argmin disambiguation — appear from 10k entities up
    assert n_routes > 1000


def test_skyline_matches_brute_force(spark):
    """Banded prefix-min skyline == the quadratic domination definition."""
    from safeascent_spark.operators import analytics as A
    from safeascent_spark import domain
    import math
    got = {r.o_orderkey for r in
           A.q_orders_skyline(spark, "/root/testdata/sf0.001").collect()}
    o = domain.load_table(spark, "/root/testdata/sf0.001", "orders").collect()
    pts = [(r.o_orderkey, math.floor(r.o_totalprice * 100),
            r.o_orderdate) for r in o]
    want = set()
    for k, p, d in pts:
        dominated = any(
            (p2 <= p and d2 >= d and (p2 < p or d2 > d))
            for _, p2, d2 in pts)
        if not dominated:
            want.add(k)
    assert got == want


def test_skyline_plan_has_no_pair_join(spark):
    from safeascent_spark.operators import analytics as A
    from tests.test_plans import n_ops, plan_of
    plan = plan_of(A.q_orders_skyline(spark, SF_ORACLE))
    assert n_ops(plan, "CartesianProduct") == 0
    assert n_ops(plan, "BroadcastNestedLoopJoin") == 0


def test_attribution_telescopes_to_purchase_values(spark):
    """Conservation law: summed attributed micro-value over all channels
    equals the summed floor(value*1e6) of every purchase that HAS at
    least one in-window touch — the equal split with remainder-to-
    earliest loses nothing and invents nothing."""
    from safeascent_spark.operators import analytics as A
    from safeascent_spark import domain
    import math
    sf = "/root/testdata/sf0.001"
    out = A.q_events_attribution(spark, sf).collect()
    got_total = sum(r.attributed_micro for r in out)
    ev = domain.load_table(spark, sf, "events").collect()
    touches = [(r.user_id, r.ts) for r in ev
               if r.event_type in ("view", "click")]
    want_total = 0
    win = A._ATTR_WINDOW_NS
    for r in ev:
        if r.event_type != "purchase":
            continue
        n = sum(1 for u, t in touches
                if u == r.user_id and r.ts - win < t <= r.ts)
        if n:
            want_total += math.floor(r.value * 1_000_000)
    assert got_total == want_total
    assert {r.channel for r in out} == {"view", "click"}


def test_growth_accounting_conserves_users(spark):
    """sum(new) == |distinct users|; dau == new + returning; churned(d)
    == dau(d-1) - |active both d-1 and d| recomputed from raw events."""
    from safeascent_spark.operators import analytics as A
    from safeascent_spark import domain
    sf = "/root/testdata/sf0.001"
    rows = A.q_events_growth(spark, sf).collect()
    ev = domain.load_table(spark, sf, "events").collect()
    day_ns = 86_400 * 1_000_000_000
    active: dict[int, set] = {}
    for r in ev:
        active.setdefault(r.ts // day_ns, set()).add(r.user_id)
    all_users = set().union(*active.values())
    assert sum(r.new_users for r in rows) == len(all_users)
    for r in rows:
        assert r.dau == r.new_users + r.returning
        assert r.dau == len(active[r.day])
        if (r.day - 1) in active:
            retained = len(active[r.day - 1] & active[r.day])
            assert r.churned == len(active[r.day - 1]) - retained, r
        else:
            assert r.churned is None


def test_triangles_close_and_order(spark):
    """Every emitted triangle is strictly ordered a<b<c and all three
    edges exist in the thresholded edge set (closure is real)."""
    from safeascent_spark.operators import association as ASSOC
    from pyspark.sql import functions as F
    edges = {(r.p1, r.p2) for r in
             ASSOC._pair_support(spark, SF_ORACLE)
             .filter(F.col("support") >= ASSOC.MIN_SUPPORT).collect()}
    tris = ASSOC.q_graph_triangles(spark, SF_ORACLE).collect()
    assert len(tris) > 0
    seen = set()
    for t in tris:
        assert t.a < t.b < t.c
        assert (t.a, t.b) in edges and (t.b, t.c) in edges \
            and (t.a, t.c) in edges
        assert (t.a, t.b, t.c) not in seen
        seen.add((t.a, t.b, t.c))


def test_dq_assertions_detect_seeded_violations(spark, tmp_path):
    """All checks pass on the pristine testdata; seeding a dangling FK,
    a duplicate PK, and a negative event value flips exactly those
    checks — the assertions detect, not just tautologically pass."""
    import shutil
    from safeascent_spark.operators import relational as R
    sf = "/root/testdata/sf0.001"
    clean = {r.check_name: r for r in R.q_dq_assertions(spark, sf).collect()}
    assert all(r.passed for r in clean.values()), clean
    assert len(clean) == 7
    # corrupted copy: orders gains a dangling o_custkey, customer a dup
    # PK, events a negative value
    bad = str(tmp_path / "bad")
    import os
    os.makedirs(bad)
    for t in ["region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"]:
        shutil.copy(f"{sf}/{t}.parquet", f"{bad}/{t}.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet")
    o.union(o.limit(1).withColumn(
        "o_custkey", o.o_custkey * 0 - 999999)) \
        .coalesce(1).write.mode("overwrite").parquet(f"{bad}/orders.parquet")
    c = spark.read.parquet(f"{sf}/customer.parquet")
    c.union(c.limit(1)).coalesce(1).write.mode("overwrite") \
        .parquet(f"{bad}/customer.parquet")
    e = spark.read.parquet(f"{sf}/events.parquet")
    e.union(e.limit(1).withColumn("value", e.value * 0 - 1.0)) \
        .coalesce(1).write.mode("overwrite").parquet(f"{bad}/events.parquet")
    got = {r.check_name: r for r in R.q_dq_assertions(spark, bad).collect()}
    assert not got["orders_fk_customer"].passed
    assert got["orders_fk_customer"].n_violations == 1
    assert not got["customer_pk_unique"].passed
    assert not got["events_value_nonnegative"].passed
    # untouched tables still pass
    assert got["lineitem_fk_orders"].passed
    assert got["embeddings_dim_64"].passed


def test_streaming_attribution_equals_batch(spark, tmp_path):
    """The stateful streaming attribution, aggregated per channel, must
    reproduce the batch operator's per-channel rollup exactly (same
    integer split, touches carried in keyed state)."""
    from safeascent_spark.operators import analytics as A
    from safeascent_spark.streaming import attribution as SA
    from pyspark.sql import functions as F
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "attr")
    n = SA.run_attribution(spark, sf, out)
    assert n > 0
    got = {r.channel: (r.n_touches, r.attributed_micro) for r in
           (spark.read.parquet(out)
                 .groupBy("channel")
                 .agg(F.sum("n_touches").cast("bigint").alias("n_touches"),
                      F.sum("attr_micro").cast("bigint")
                       .alias("attributed_micro"))
                 .collect())}
    want = {r.channel: (r.n_touches, r.attributed_micro)
            for r in A.q_events_attribution(spark, sf).collect()}
    assert got == want


def test_cv_folds_partition_and_rmse_sane(spark):
    """CV bookkeeping: per (type, fold) n_train + n_test equals the type
    total; held-out RMSE is finite, nonnegative, and within a sane band
    of the in-sample fit (no fold catastrophically off)."""
    from safeascent_spark import ml as ML
    cv = ML.q_ml_risk_model_cv(spark, SF_ORACLE).collect()
    assert len(cv) == 7 * ML.CV_FOLDS
    ins = {r.route_type: r.rmse_g for r in
           ML.q_ml_risk_model(spark, SF_ORACLE)
           .select("route_type", "rmse_g").distinct().collect()}
    totals: dict[str, int] = {}
    for r in cv:
        totals.setdefault(r.route_type, r.n_train + r.n_test)
        assert r.n_train + r.n_test == totals[r.route_type]
        assert r.rmse_cv is not None and r.rmse_cv >= 0.0
        # held-out error can exceed in-sample but not explode
        assert r.rmse_cv <= max(ins[r.route_type] * 5.0, 5.0), r


def test_rolling_distinct_matches_brute_force(spark):
    from safeascent_spark.operators import analytics as A
    from safeascent_spark import domain
    sf = "/root/testdata/sf0.001"
    rows = A.q_events_rolling_distinct(spark, sf).collect()
    ev = domain.load_table(spark, sf, "events").collect()
    day_ns = 86_400 * 1_000_000_000
    by_day: dict[int, set] = {}
    for r in ev:
        by_day.setdefault(r.ts // day_ns, set()).add(r.user_id)
    for r in rows:
        want = set()
        for d in range(r.day - A.ROLLING_DISTINCT_DAYS + 1, r.day + 1):
            want |= by_day.get(d, set())
        assert r.n_distinct_7d == len(want), r
        assert r.hll_within_5pct
    assert {r.day for r in rows} == set(by_day)


def test_cf_neighbors_bounded_and_ranked(spark):
    from safeascent_spark.operators import association as ASSOC
    rows = ASSOC.q_cf_item_neighbors(spark, SF_ORACLE).collect()
    by_item: dict[int, list] = {}
    for r in rows:
        assert 0 < r.cosine_ppm <= 1_000_000
        by_item.setdefault(r.item, []).append(r)
    for item, rs in by_item.items():
        rs.sort(key=lambda r: r.rank)
        assert len(rs) <= ASSOC.CF_TOP_K
        for a, b in zip(rs, rs[1:]):
            assert (a.cosine_ppm, -a.neighbor) >= (b.cosine_ppm, -b.neighbor)


def test_hotspot_clusters_partition_dense_cells(spark):
    from safeascent_spark.operators import association as ASSOC
    from safeascent_spark import domain
    from pyspark.sql import functions as F
    clusters = ASSOC.q_geo_hotspots(spark, SF_ORACLE).collect()
    a = domain.accidents_df(spark, SF_ORACLE)
    n_dense = (a.select(
        F.expr("CAST(floor(latitude) AS BIGINT)").alias("cx"),
        F.expr("CAST(floor(longitude) AS BIGINT)").alias("cy"))
        .groupBy("cx", "cy").count()
        .filter(F.col("count") >= ASSOC.HOT_MIN_POINTS).count())
    assert sum(c.n_cells for c in clusters) == n_dense
    n_accidents = a.count()
    assert sum(c.n_points for c in clusters) == n_accidents
    for c in clusters:
        assert c.cx_min <= c.cx_max and c.cy_min <= c.cy_max


def test_survival_curve_is_a_valid_km_estimate(spark):
    """Life-table bookkeeping and KM shape: at-risk counts telescope,
    ending users partition into churned + censored, and S(t) is
    nonincreasing in (0, 1]."""
    from safeascent_spark.operators import analytics as A
    from safeascent_spark import domain
    sf = "/root/testdata/sf0.001"
    rows = A.q_events_survival(spark, sf).collect()
    n_users = (domain.load_table(spark, sf, "events")
               .select("user_id").distinct().count())
    rows.sort(key=lambda r: r.duration)
    at_risk = n_users
    prev_s = 1.0
    for r in rows:
        assert r.n_at_risk == at_risk
        ending = r.n_churned + r.n_censored
        assert ending >= 1
        at_risk -= ending
        assert 0.0 < r.km_survival <= 1.0
        assert r.km_survival <= prev_s + 1e-9
        prev_s = r.km_survival
    assert at_risk == 0


def test_active_learning_picks_smallest_margins(spark):
    """The selected batch is exactly the bottom-M margins: every selected
    margin <= every unselected margin (ties broken by doc_id), margins
    nonnegative."""
    from safeascent_spark.operators import text as TXm
    from pyspark.sql import Window, functions as F
    sel = TXm.q_sample_active_learning(spark, SF_ORACLE).collect()
    assert len(sel) == TXm.AL_BATCH
    assert all(r.margin_micro >= 0 for r in sel)
    scores = TXm.nb_doc_scores(spark, SF_ORACLE)
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score").desc(), F.col("lang"))
    ranked = scores.withColumn("rn", F.row_number().over(w))
    margins = {r.doc_id: r.margin for r in
               (ranked.filter(F.col("rn") == 1)
                      .select("doc_id", F.col("score").alias("s1"))
                      .join(ranked.filter(F.col("rn") == 2)
                                  .select("doc_id",
                                          F.col("score").alias("s2")),
                            "doc_id")
                      .select("doc_id",
                              (F.col("s1") - F.col("s2")).alias("margin"))
                      .collect())}
    chosen = {r.doc_id for r in sel}
    worst_chosen = max((margins[d], d) for d in chosen)
    best_left = min(((m, d) for d, m in margins.items()
                     if d not in chosen), default=None)
    if best_left is not None:
        assert worst_chosen <= best_left


def test_subtree_rollup_conserves_and_dominates(spark):
    """Root subtree == all routes; every node's subtree >= its direct
    count; parent subtree >= child subtree (containment monotonicity)."""
    from safeascent_spark.operators import relational as R
    from safeascent_spark import domain
    rows = {r.location_id: r for r in
            R.q_location_subtree_rollup(spark, SF_ORACLE).collect()}
    n_routes = domain.routes_df(spark, SF_ORACLE).count()
    assert rows[0].n_routes_subtree == n_routes
    for lid, r in rows.items():
        assert r.n_routes_subtree >= r.n_routes_direct
        parent = lid // 10
        if lid != 0 and parent in rows:
            assert rows[parent].n_routes_subtree >= r.n_routes_subtree


def test_ltv_triangle_is_cumulative_and_conserves(spark):
    """Within a cohort, cumulative spend is nondecreasing and the final
    cumulative equals the cohort's total spend; the full-table spend sum
    equals all orders' floored cents."""
    from safeascent_spark.operators import analytics as A
    from safeascent_spark import domain
    from pyspark.sql import functions as F
    import math
    rows = A.q_orders_ltv_cohorts(spark, "/root/testdata/sf0.001").collect()
    by_cohort: dict[int, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_m, []).append(r)
    total = 0
    for c, rs in by_cohort.items():
        rs.sort(key=lambda r: r.age_m)
        cum = 0
        for r in rs:
            cum += r.spend_cents
            assert r.cum_spend_cents == cum
            assert r.ltv_cents_per_user == cum // r.cohort_users
        total += cum
    o = domain.load_table(spark, "/root/testdata/sf0.001", "orders")
    want = o.agg(F.sum(F.expr(
        "CAST(floor(o_totalprice * 100) AS BIGINT)"))).collect()[0][0]
    assert total == want


def test_paths_trigram_counts_match_brute_force(spark):
    from safeascent_spark.operators import analytics as A
    from safeascent_spark import domain
    sf = "/root/testdata/sf0.001"
    got = {(r.step1, r.step2, r.step3): (r.n_paths, r.n_users)
           for r in A.q_events_paths(spark, sf).collect()}
    ev = sorted(domain.load_table(spark, sf, "events").collect(),
                key=lambda r: (r.user_id, r.ts, r.event_id))
    from collections import defaultdict
    counts = defaultdict(int)
    users = defaultdict(set)
    by_user = defaultdict(list)
    for r in ev:
        by_user[r.user_id].append(r.event_type)
    for u, seq in by_user.items():
        for i in range(len(seq) - 2):
            t = (seq[i], seq[i + 1], seq[i + 2])
            counts[t] += 1
            users[t].add(u)
    want = sorted(((v, k) for k, v in counts.items()),
                  key=lambda x: (-x[0], x[1]))[:A.PATH_TOP_K]
    assert got == {k: (v, len(users[k])) for v, k in want}


def test_growth_ppm_matches_definition(spark):
    from safeascent_spark.operators import analytics as A
    import math
    rows = {r.m: r for r in
            A.q_orders_growth(spark, SF_ORACLE).collect()}
    for m, r in rows.items():
        prev = rows.get(m - 1)
        if prev is None:
            assert r.mom_ppm is None
        else:
            want = math.floor((r.rev_cents - prev.rev_cents)
                              / max(prev.rev_cents // 1_000_000, 1))
            assert r.mom_ppm == want, (m, r.mom_ppm, want)
        yoy = rows.get(m - 12)
        if yoy is None:
            assert r.yoy_ppm is None
        else:
            want = math.floor((r.rev_cents - yoy.rev_cents)
                              / max(yoy.rev_cents // 1_000_000, 1))
            assert r.yoy_ppm == want


def test_unpivot_roundtrips_the_pivot(spark):
    """melt(pivot(x)) == the long-form counts, zero cells included."""
    from safeascent_spark.operators import analytics as A
    from safeascent_spark import domain
    long = A.q_accidents_month_unpivot(spark, SF_ORACLE).collect()
    assert len(long) == 7 * 12
    a = domain.accidents_df(spark, SF_ORACLE).collect()
    from collections import Counter
    want = Counter((r.route_type, r.accident_date.month) for r in a)
    for r in long:
        assert r.n_accidents == want.get((r.route_type, r.month), 0)
    assert sum(r.n_accidents for r in long) == len(a)


def test_peer_rank_ppm_is_a_valid_percent_rank(spark):
    """Within each type: ranks are 1..n without gaps, ppm is monotone in
    rank, the riskiest peer reads 0 and the safest 1e6."""
    from safeascent_spark.operators import analytics as A
    rows = A.q_risk_peer_rank(spark, SF_ORACLE).collect()
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r.route_type, []).append(r)
    for t, rs in by_type.items():
        rs.sort(key=lambda r: r.peer_rank)
        n = rs[0].n_peers
        assert len(rs) == n
        assert [r.peer_rank for r in rs] == list(range(1, n + 1))
        assert rs[0].riskier_than_ppm == 0
        if n > 1:
            assert rs[-1].riskier_than_ppm == 1_000_000
        for a, b in zip(rs, rs[1:]):
            assert a.risk_score >= b.risk_score
            assert a.riskier_than_ppm <= b.riskier_than_ppm


def test_streaming_attribution_restart_is_exactly_once(spark, tmp_path):
    """Re-running the stream from the same checkpoint with no new data
    must emit nothing: the attribution output is exactly-once across
    restarts (the ingest-dedup restart contract, applied here)."""
    from safeascent_spark.streaming import attribution as SA
    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "attr")
    n1 = SA.run_attribution(spark, sf, out)
    assert n1 > 0
    rows_after_first = spark.read.parquet(out).count()
    n2 = SA.run_attribution(spark, sf, out)   # same checkpoint, same file
    assert n2 == 0
    assert spark.read.parquet(out).count() == rows_after_first


def test_gapfill_densifies_and_carries_forward(spark):
    """The dense grid covers exactly types x [d0, d1]; gap rows have
    n_events == 0 and carry the most recent prior value; non-gap rows
    carry their own day's value."""
    from safeascent_spark.operators import analytics as A
    from safeascent_spark import domain
    import math
    sf = "/root/testdata/sf0.001"
    rows = A.q_events_gapfill(spark, sf).collect()
    ev = domain.load_table(spark, sf, "events").collect()
    day_ns = 86_400 * 1_000_000_000
    daily: dict[tuple, list] = {}
    for r in ev:
        daily.setdefault((r.event_type, r.ts // day_ns), []).append(
            math.floor(r.value * 1000))
    days = sorted({d for _, d in daily})
    types = sorted({t for t, _ in daily})
    assert len(rows) == len(types) * (days[-1] - days[0] + 1)
    locf: dict[str, int] = {}
    by_key = {(r.event_type, r.day): r for r in rows}
    for t in types:
        last = None
        for d in range(days[0], days[-1] + 1):
            r = by_key[(t, d)]
            if (t, d) in daily:
                assert not r.is_gap
                assert r.n_events == len(daily[(t, d)])
                last = sum(daily[(t, d)])
                assert r.v_locf_milli == last
            else:
                assert r.is_gap and r.n_events == 0
                assert r.v_locf_milli == last


def test_calibration_conserves_routes_and_brackets_buckets(spark):
    """Bucket counts sum to the scored universe; every bucket's mean
    prediction lies inside its decile bounds (clamped ends aside)."""
    from safeascent_spark.operators import analytics as A
    from safeascent_spark import ml as ML
    rows = A.q_ml_calibration(spark, SF_ORACLE).collect()
    n_total = ML.q_ml_risk_model(spark, SF_ORACLE).count()
    assert sum(r.n_routes for r in rows) == n_total
    for r in rows:
        assert r.calib_gap_micro == r.avg_pred_micro - r.avg_actual_micro
        if 0 < r.pred_decile < 9:
            lo, hi = r.pred_decile * 10_000_000, (r.pred_decile + 1) * 10_000_000
            assert lo <= r.avg_pred_micro < hi, r


def test_twap_matches_bruteforce_locf_weighting(spark):
    """Per-(user, type) series: brute-force LOCF time weighting from the
    raw events reproduces every output row exactly — segment counts,
    total held duration, and the floor-divided milli-unit TWAP.  Series
    with a single observation carry no segment and must be absent."""
    from safeascent_spark.operators import analytics as A
    from safeascent_spark import domain
    import math
    sf = "/root/testdata/sf0.001"
    rows = A.q_events_twap(spark, sf).collect()
    ev = domain.load_table(spark, sf, "events").collect()
    series: dict[tuple, list] = {}
    for r in ev:
        series.setdefault((r.user_id, r.event_type), []).append(
            (r.ts, r.event_id, math.floor(r.value * 1000)))
    expect = {}
    for key, obs in series.items():
        obs.sort()
        segs = [(v, (obs[i + 1][0] - ts) // 1_000_000)
                for i, (ts, _, v) in enumerate(obs[:-1])]
        if not segs:
            continue
        total = sum(d for _, d in segs)
        expect[key] = (len(segs), total,
                       sum(v * d for v, d in segs) // total)
    assert {(r.user_id, r.event_type) for r in rows} == set(expect)
    for r in rows:
        n, total, twap = expect[(r.user_id, r.event_type)]
        assert (r.n_segments, r.total_dur_ms, r.twap_milli) == \
            (n, total, twap), r


def test_events_value_nonnegative_divisor_precondition(spark):
    """ADVICE r5: events_twap's integer TWAP and events_attribution's
    equal split rely on value >= 0 for Spark's truncating `div` to agree
    with DuckDB's truncating `//` (both truncate toward zero on this
    runtime pair: -7 // 2 = -3 on duckdb 1.0.0 — identical to Spark's
    div on all signs; the value>=0 pin below keeps the arithmetic
    sign-free anyway).  Pin that precondition on every fixture
    the oracles run against, so a generator change producing negative
    values fails HERE (named precondition) rather than as a silent
    oracle divergence."""
    from safeascent_spark import domain
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        bad = (domain.load_table(spark, sf, "events")
               .filter(F.col("value") < 0).count())
        assert bad == 0, f"{sf}: {bad} negative event values"
