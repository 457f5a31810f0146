"""Round-6 wave-9 semantics + plan shapes: the remaining expressible
TPC-H queries (Q5, Q6, Q7, Q8, Q14, Q15, Q18) on the reduced schema."""

from __future__ import annotations

import math

from safeascent_spark import domain
from safeascent_spark.operators import olap as OL
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.test_plans import n_ops, plan_of


def _rev_e4(r) -> int:
    return (math.floor(r.l_extendedprice * 100)
            * (100 - round(r.l_discount * 100)))


def test_q5_matches_bruteforce(spark):
    rows = OL.q_tpch_q5_local_supplier(spark, SF_ORACLE).collect()
    nat = {r.n_nationkey: (r.n_name, r.n_regionkey)
           for r in domain.load_table(spark, SF_ORACLE, "nation").collect()}
    reg = {r.r_regionkey: r.r_name
           for r in domain.load_table(spark, SF_ORACLE, "region").collect()}
    cust = {r.c_custkey: r.c_nationkey for r in
            domain.load_table(spark, SF_ORACLE, "customer").collect()}
    supp = {r.s_suppkey: r.s_nationkey for r in
            domain.load_table(spark, SF_ORACLE, "supplier").collect()}
    import datetime
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
    orders = {r.o_orderkey: r.o_custkey for r in
              domain.load_table(spark, SF_ORACLE, "orders").collect()
              if lo <= r.o_orderdate < hi}
    want: dict[str, int] = {}
    for r in domain.load_table(spark, SF_ORACLE, "lineitem").collect():
        ck = orders.get(r.l_orderkey)
        if ck is None:
            continue
        cn, sn = cust[ck], supp[r.l_suppkey]
        if cn != sn or reg[nat[sn][1]] != OL.Q5_REGION:
            continue
        want[nat[sn][0]] = want.get(nat[sn][0], 0) + _rev_e4(r)
    assert {r.n_name: r.revenue_e4 for r in rows} == want
    revs = [r.revenue_e4 for r in rows]
    assert revs == sorted(revs, reverse=True)


def test_q5_plan_broadcasts_the_dim_chain(spark):
    plan = plan_of(OL.q_tpch_q5_local_supplier(spark, SF_SMOKE))
    assert n_ops(plan, "CartesianProduct") == 0
    assert n_ops(plan, "BroadcastNestedLoopJoin") == 0
    assert n_ops(plan, "BroadcastHashJoin") >= 3
    assert "PushedFilters" in plan and "o_orderdate" in plan


def test_q6_is_one_scan_no_joins(spark):
    plan = plan_of(OL.q_tpch_q6_forecast(spark, SF_SMOKE))
    assert n_ops(plan, "Scan parquet") == 1
    for join in ("BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
                 "CartesianProduct"):
        assert n_ops(plan, join) == 0
    assert n_ops(plan, "Exchange") <= 1     # the 1-row gather only
    assert "partial_sum" in plan            # map-side combine
    assert "PushedFilters" in plan and "l_shipdate" in plan


def test_q6_matches_bruteforce(spark):
    row = OL.q_tpch_q6_forecast(spark, SF_ORACLE).collect()[0]
    import datetime
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1997, 1, 1)
    want_rev = want_n = 0
    for r in domain.load_table(spark, SF_ORACLE, "lineitem").collect():
        d = round(r.l_discount * 100)
        if (lo <= r.l_shipdate < hi and 5 <= d <= 7
                and int(r.l_quantity) < 24):
            want_rev += math.floor(r.l_extendedprice * 100) * d
            want_n += 1
    assert (row.revenue_e4, row.n_lineitems) == (want_rev, want_n)


def test_q7_directions_are_disjoint_and_nonempty(spark):
    rows = OL.q_tpch_q7_volume(spark, SF_ORACLE).collect()
    dirs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert dirs == {(OL.Q7_NATION_A, OL.Q7_NATION_B),
                    (OL.Q7_NATION_B, OL.Q7_NATION_A)}
    assert {r.l_year for r in rows} <= set(OL.Q7_YEARS)
    assert all(r.revenue_e4 > 0 for r in rows)


def test_q7_plan_no_cartesian_and_bounded_shuffles(spark):
    plan = plan_of(OL.q_tpch_q7_volume(spark, SF_SMOKE))
    assert n_ops(plan, "CartesianProduct") == 0
    assert n_ops(plan, "BroadcastNestedLoopJoin") == 0
    # the only allowed non-broadcast joins are the two natural-key fact
    # joins (lineitem ⋈ orders, orders ⋈ customer)
    assert (n_ops(plan, "SortMergeJoin")
            + n_ops(plan, "ShuffledHashJoin")) <= 2


def test_q8_share_is_conserved_ppm(spark):
    rows = OL.q_tpch_q8_market_share(spark, SF_ORACLE).collect()
    assert rows, "region/type selection must be non-empty at sf0.01"
    for r in rows:
        assert 0 <= r.nation_e4 <= r.total_e4
        assert r.share_ppm == r.nation_e4 * 1_000_000 // r.total_e4
        assert 0 <= r.share_ppm <= 1_000_000


def test_q14_promo_share_single_row(spark):
    rows = OL.q_tpch_q14_promo(spark, SF_ORACLE).collect()
    assert len(rows) == 1
    r = rows[0]
    assert 0 < r.promo_e4 < r.total_e4
    assert r.promo_share_ppm == r.promo_e4 * 1_000_000 // r.total_e4


def test_q15_is_the_true_argmax_without_a_window(spark):
    rows = OL.q_tpch_q15_top_supplier(spark, SF_ORACLE).collect()
    import datetime
    lo, hi = datetime.datetime(1996, 1, 1), datetime.datetime(1996, 4, 1)
    per_supp: dict[int, int] = {}
    for r in domain.load_table(spark, SF_ORACLE, "lineitem").collect():
        if lo <= r.l_shipdate < hi:
            per_supp[r.l_suppkey] = (per_supp.get(r.l_suppkey, 0)
                                     + _rev_e4(r))
    mx = max(per_supp.values())
    want = {k for k, v in per_supp.items() if v == mx}
    assert {r.s_suppkey for r in rows} == want
    assert all(r.total_rev_e4 == mx for r in rows)
    plan = plan_of(OL.q_tpch_q15_top_supplier(spark, SF_SMOKE))
    assert n_ops(plan, "Window") == 0       # max via 1-row broadcast join
    assert n_ops(plan, "CartesianProduct") == 0


def test_q18_threshold_and_plan(spark):
    rows = OL.q_tpch_q18_large_orders(spark, SF_ORACLE).collect()
    assert rows
    assert all(r.sum_qty > OL.Q18_QTY_GT for r in rows)
    prices = [r.o_totalprice_c for r in rows]
    assert prices == sorted(prices, reverse=True)
    # qualifying keyset matches brute force
    per_order: dict[int, int] = {}
    for r in domain.load_table(spark, SF_ORACLE, "lineitem").collect():
        per_order[r.l_orderkey] = (per_order.get(r.l_orderkey, 0)
                                   + int(r.l_quantity))
    want = {k for k, v in per_order.items() if v > OL.Q18_QTY_GT}
    assert {r.o_orderkey for r in rows} == (want if len(want) <= 100
                                            else set())
    plan = plan_of(OL.q_tpch_q18_large_orders(spark, SF_SMOKE))
    assert "TakeOrderedAndProject" in plan
    assert n_ops(plan, "CartesianProduct") == 0
