"""Round-6 wave-2 semantics + plan shapes: TPC-H Q1/Q3 and the
dimension-bounded embedding covariance."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from safeascent_spark import domain
from safeascent_spark.operators import olap as OL
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.test_plans import n_ops, plan_of


def test_q1_matches_bruteforce(spark):
    rows = OL.q_tpch_q1_pricing(spark, SF_ORACLE).collect()
    li = domain.load_table(spark, SF_ORACLE, "lineitem").collect()
    import datetime
    cutoff = datetime.datetime(1998, 9, 2)
    groups: dict[tuple, list] = {}
    for r in li:
        if r.l_shipdate <= cutoff:
            groups.setdefault((r.l_returnflag, r.l_linestatus),
                              []).append(r)
    assert len(rows) == len(groups)
    for r in rows:
        g = groups[(r.l_returnflag, r.l_linestatus)]
        assert r.count_order == len(g)
        assert r.sum_qty == sum(int(x.l_quantity) for x in g)
        cents = [math.floor(x.l_extendedprice * 100) for x in g]
        disc = [round(x.l_discount * 100) for x in g]
        tax = [round(x.l_tax * 100) for x in g]
        assert r.sum_base_cents == sum(cents)
        assert r.sum_disc_price_e4 == sum(
            c * (100 - d) for c, d in zip(cents, disc))
        assert r.sum_charge_e6 == sum(
            c * (100 - d) * (100 + t)
            for c, d, t in zip(cents, disc, tax))
        assert r.avg_qty_milli == r.sum_qty * 1000 // r.count_order


def test_q1_plan_is_one_pushed_scan_one_aggregate(spark):
    plan = plan_of(OL.q_tpch_q1_pricing(spark, SF_SMOKE))
    assert n_ops(plan, "Scan parquet") == 1
    assert "PushedFilters" in plan and "l_shipdate" in plan
    assert "partial_sum" in plan           # map-side combine
    assert n_ops(plan, "Exchange") <= 2    # agg shuffle + presentation sort
    assert n_ops(plan, "BroadcastHashJoin") == 0


def test_q3_plan_broadcasts_dims_and_takes_ordered(spark):
    plan = plan_of(OL.q_tpch_q3_priority(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert n_ops(plan, "BroadcastHashJoin") >= 1
    assert n_ops(plan, "CartesianProduct") == 0
    assert n_ops(plan, "SortMergeJoin") == 0
    assert "PushedFilters" in plan
    assert "o_orderdate" in plan and "l_shipdate" in plan


def test_q3_rows_satisfy_their_own_predicates(spark):
    rows = OL.q_tpch_q3_priority(spark, SF_ORACLE).collect()
    assert len(rows) == 10
    revs = [r.revenue_e4 for r in rows]
    assert revs == sorted(revs, reverse=True)
    orders = {r.o_orderkey: r for r in
              domain.load_table(spark, SF_ORACLE, "orders").collect()}
    for r in rows:
        o = orders[r.o_orderkey]
        assert str(o.o_orderdate.date()) == r.o_orderdate
        assert str(o.o_orderdate.date()) < OL.Q3_DATE
        assert o.o_orderpriority == r.o_orderpriority


def test_covariance_matches_numpy_and_is_dimension_bounded(spark):
    import numpy as np
    rows = OL.q_embedding_covariance(spark, SF_ORACLE).collect()
    assert len(rows) == OL.COV_TOP_K
    e = domain.load_table(spark, SF_ORACLE, "embeddings").collect()
    Q = np.array([[round(min(max(float(x), -1.0), 1.0) * 127)
                   for x in r.embedding] for r in e], dtype=np.int64)
    n = Q.shape[0]
    for r in rows:
        assert r.i <= r.j
        x, y = Q[:, r.i], Q[:, r.j]
        assert r.sxy == int((x * y).sum())
        assert r.sx == int(x.sum())
        assert r.sy == int(y.sum())
        num = (n * int((x * y).sum())
               - int(x.sum()) * int(y.sum())) * 1000
        assert r.cov_mean_milli == num // (n * n)   # python // floors
    # the top-K must rank by |cov| (verify against the full pair set)
    covs = {}
    for i in range(OL.DIM):
        for j in range(i, OL.DIM):
            num = (n * int((Q[:, i] * Q[:, j]).sum())
                   - int(Q[:, i].sum()) * int(Q[:, j].sum())) * 1000
            covs[(i, j)] = num // (n * n)
    want = sorted(covs, key=lambda k: (-abs(covs[k]), k))[:OL.COV_TOP_K]
    assert [(r.i, r.j) for r in rows] == want


def test_covariance_plan_has_no_self_join(spark):
    plan = plan_of(OL.q_embedding_covariance(spark, SF_SMOKE))
    assert n_ops(plan, "SortMergeJoin") == 0
    assert n_ops(plan, "CartesianProduct") == 0
    # pair products are generated in-row: the embeddings parquet is read
    # at most 3x (pair sums + the marginal aggregate referenced for both
    # i and j), never joined row-to-row — the only joins broadcast the
    # 64-row marginal table onto the 2080-row pair table
    assert n_ops(plan, "Scan parquet") <= 3
    assert n_ops(plan, "BroadcastHashJoin") == 2
    assert "partial_sum" in plan


def test_q4_semijoin_counts_each_order_once(spark):
    import datetime
    rows = {r.o_orderpriority: r.order_count
            for r in OL.q_tpch_q4_semijoin(spark, SF_ORACLE).collect()}
    orders = domain.load_table(spark, SF_ORACLE, "orders").collect()
    li = domain.load_table(spark, SF_ORACLE, "lineitem").collect()
    late_by_order: dict[int, int] = {}
    for x in li:
        late_by_order.setdefault(x.l_orderkey, 0)
    ship = {}
    for x in li:
        ship.setdefault(x.l_orderkey, []).append(x.l_shipdate)
    want: dict[str, int] = {}
    for o in orders:
        cut = o.o_orderdate + datetime.timedelta(days=OL.Q4_LATE_DAYS)
        if any(s > cut for s in ship.get(o.o_orderkey, [])):
            want[o.o_orderpriority] = want.get(o.o_orderpriority, 0) + 1
    assert rows == want


def test_q4_plan_is_left_semi(spark):
    plan = plan_of(OL.q_tpch_q4_semijoin(spark, SF_SMOKE))
    assert "LeftSemi" in plan
    assert n_ops(plan, "CartesianProduct") == 0


def test_q13_includes_zero_order_customers(spark):
    rows = OL.q_tpch_q13_custdist(spark, SF_ORACLE).collect()
    n_cust = domain.load_table(spark, SF_ORACLE, "customer").count()
    n_orders = domain.load_table(spark, SF_ORACLE, "orders").count()
    assert sum(r.custdist for r in rows) == n_cust          # every customer
    assert sum(r.c_count * r.custdist for r in rows) == n_orders
    with_orders = (domain.load_table(spark, SF_ORACLE, "orders")
                   .select("o_custkey").distinct().count())
    zero = {r.c_count: r.custdist for r in rows}.get(0, 0)
    assert zero == n_cust - with_orders


def test_q13_plan_aggregates_orders_before_the_join(spark):
    """The join must carry one row per customer, not one per order: the
    per-custkey count aggregate sits BELOW the join in the plan."""
    plan = plan_of(OL.q_tpch_q13_custdist(spark, SF_SMOKE))
    join_at = min(plan.find("SortMergeJoin") % 10**9,
                  plan.find("BroadcastHashJoin") % 10**9,
                  plan.find("ShuffledHashJoin") % 10**9)
    agg_at = plan.find("HashAggregate")
    assert agg_at != -1 and join_at < 10**9
    # formatted plans print the tree top-down: the aggregate feeding the
    # join appears as a deeper (later) tree line than the join itself
    assert "partial_count" in plan


def test_kneser_ney_matches_bruteforce(spark):
    from safeascent_spark.operators import curation as CU
    from safeascent_spark.operators import text as TX
    rows = CU.q_text_kneser_ney(spark, SF_ORACLE).collect()
    docs = TX.docs_df(spark, SF_ORACLE).collect()
    from collections import Counter
    c12: Counter = Counter()
    for d in docs:
        ws = [w for w in d.text.split(" ") if w]
        for a, b in zip(ws, ws[1:]):
            c12[(a, b)] += 1
    c1: Counter = Counter()
    n1p: Counter = Counter()
    n1m: Counter = Counter()
    for (a, b), c in c12.items():
        c1[a] += c
        n1p[a] += 1
        n1m[b] += 1
    n1mm = len(c12)
    assert len(rows) == n1mm
    for r in rows:
        c = c12[(r.w1, r.w2)]
        assert r.c12 == c and r.c1 == c1[r.w1]
        assert r.n1p_w1 == n1p[r.w1] and r.n1m_w2 == n1m[r.w2]
        num = (max(4 * c - 3, 0) * n1mm + 3 * n1p[r.w1] * n1m[r.w2]) \
            * 1_000_000
        assert r.p_kn_ppm == num // (4 * c1[r.w1] * n1mm)
        assert 0 < r.p_kn_ppm <= 1_000_000


def test_kneser_ney_observed_mass_below_one(spark):
    """Sum of P(w2|w1) over OBSERVED continuations stays <= 1 per w1
    (the unobserved continuation mass is what KN redistributes)."""
    from safeascent_spark.operators import curation as CU
    rows = CU.q_text_kneser_ney(spark, SF_ORACLE).collect()
    mass: dict[str, int] = {}
    for r in rows:
        mass[r.w1] = mass.get(r.w1, 0) + r.p_kn_ppm
    for w1, m in mass.items():
        assert m <= 1_000_000 + len(mass), (w1, m)  # + floor slack


def test_pareto_deciles_conserve_revenue(spark):
    rows = OL.q_orders_pareto(spark, SF_ORACLE).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    per_cust = (domain.load_table(spark, SF_ORACLE, "orders")
                .groupBy("o_custkey")
                .agg(F.expr("CAST(sum(CAST(floor(o_totalprice * 100) AS "
                            "BIGINT)) AS BIGINT)").alias("rev"))
                .collect())
    total = sum(r.rev for r in per_cust)
    assert sum(r.revenue_c for r in rows) == total
    assert sum(r.n_customers for r in rows) == len(per_cust)
    # decile sizes balanced, shares monotone non-increasing, cum to 1e6
    sizes = [r.n_customers for r in rows]
    assert max(sizes) - min(sizes) <= 1
    shares = [r.share_ppm for r in rows]
    assert all(a >= b for a, b in zip(shares, shares[1:]))
    assert rows[-1].cum_share_ppm == 1_000_000
    # concentration is real: the top decile out-earns its population share
    assert rows[0].share_ppm > 100_000


def test_q10_matches_bruteforce(spark):
    import datetime
    import math
    rows = OL.q_tpch_q10_returns(spark, SF_ORACLE).collect()
    li = domain.load_table(spark, SF_ORACLE, "lineitem").collect()
    orders = {o.o_orderkey: o for o in
              domain.load_table(spark, SF_ORACLE, "orders").collect()}
    cust = {c.c_custkey: c for c in
            domain.load_table(spark, SF_ORACLE, "customer").collect()}
    nation = {n.n_nationkey: n.n_name for n in
              domain.load_table(spark, SF_ORACLE, "nation").collect()}
    lo = datetime.datetime(1997, 1, 1)
    hi = datetime.datetime(1997, 4, 1)
    want: dict[int, int] = {}
    for x in li:
        if x.l_returnflag != "R":
            continue
        o = orders.get(x.l_orderkey)
        if o is None or not (lo <= o.o_orderdate < hi):
            continue
        rev = math.floor(x.l_extendedprice * 100) \
            * (100 - round(x.l_discount * 100))
        want[o.o_custkey] = want.get(o.o_custkey, 0) + rev
    top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert [(r.c_custkey, r.revenue_e4) for r in rows] == top
    for r in rows:
        assert r.c_name == cust[r.c_custkey].c_name
        assert r.n_name == nation[cust[r.c_custkey].c_nationkey]


def test_parts_never_returned_is_anti_join(spark):
    rows = OL.q_parts_never_returned(spark, SF_ORACLE).collect()
    parts = domain.load_table(spark, SF_ORACLE, "part").collect()
    returned = {x.l_partkey for x in
                domain.load_table(spark, SF_ORACLE, "lineitem").collect()
                if x.l_returnflag == "R"}
    from collections import Counter
    tot = Counter(p.p_brand for p in parts)
    clean = Counter(p.p_brand for p in parts
                    if p.p_partkey not in returned)
    assert {r.p_brand for r in rows} == set(tot)
    for r in rows:
        assert r.n_parts == tot[r.p_brand]
        assert r.n_never_returned == clean.get(r.p_brand, 0)
        assert r.clean_ppm == \
            clean.get(r.p_brand, 0) * 1_000_000 // tot[r.p_brand]
    plan = plan_of(OL.q_parts_never_returned(spark, SF_SMOKE))
    assert "LeftAnti" in plan
    assert n_ops(plan, "CartesianProduct") == 0


def test_q17_smallqty_matches_bruteforce(spark):
    import math
    rows = {r.p_brand: r for r in
            OL.q_tpch_q17_smallqty(spark, SF_ORACLE).collect()}
    li = domain.load_table(spark, SF_ORACLE, "lineitem").collect()
    parts = {p.p_partkey: p.p_brand for p in
             domain.load_table(spark, SF_ORACLE, "part").collect()}
    stats: dict[int, list] = {}
    for x in li:
        stats.setdefault(x.l_partkey, [0, 0])
        stats[x.l_partkey][0] += int(x.l_quantity)
        stats[x.l_partkey][1] += 1
    want: dict[str, list] = {}
    for x in li:
        s, n = stats[x.l_partkey]
        if 5 * int(x.l_quantity) * n < s:     # qty < 0.2 * avg
            b = parts[x.l_partkey]
            want.setdefault(b, [0, 0])
            want[b][0] += 1
            want[b][1] += math.floor(x.l_extendedprice * 100)
    assert set(rows) == set(want)
    for b, (n, rev) in want.items():
        assert (rows[b].n_small, rows[b].revenue_c) == (n, rev)


def test_grouping_sets_cells_conserve(spark):
    rows = OL.q_risk_grouping_sets(spark, SF_ORACLE).collect()
    by_gid: dict[int, list] = {}
    for r in rows:
        by_gid.setdefault(r.gid, []).append(r)
    # gid 1 = per-type (color NULL), gid 2 = per-color, gid 3 = total
    assert set(by_gid) == {1, 2, 3}
    total = by_gid[3][0]
    assert total.route_type is None and total.color_code is None
    for gid in (1, 2):
        assert sum(r.n_routes for r in by_gid[gid]) == total.n_routes
        assert sum(r.risk_sum_u for r in by_gid[gid]) == total.risk_sum_u
    for r in by_gid[1]:
        assert r.route_type is not None and r.color_code is None
    for r in by_gid[2]:
        assert r.color_code is not None and r.route_type is None


def test_bpe_roundtrip_holds_and_counts_vocab(spark):
    from safeascent_spark.operators import curation as CU
    from safeascent_spark.operators import text as TX
    row = CU.q_bpe_roundtrip(spark, SF_ORACLE).collect()[0]
    n_vocab = (TX.tokens_df(spark, SF_ORACLE)
               .select("word").distinct().count())
    assert row.n_vocab == n_vocab
    assert row.n_roundtrip_ok == n_vocab
    assert row.all_roundtrip_ok is True
    assert row.n_total_syms >= n_vocab     # >= 1 symbol per word
