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


# --- wave 10: adapted shapes ---------------------------------------------

def test_q12_buckets_partition_all_lineitems(spark):
    rows = {r.ship_bucket: r for r in
            OL.q_tpch_q12_priority_class(spark, SF_ORACLE).collect()}
    assert set(rows) == {"late", "ontime"}
    n_li = domain.load_table(spark, SF_ORACLE, "lineitem").count()
    total = sum(r.high_line_count + r.low_line_count for r in rows.values())
    assert total == n_li


def test_q19_single_join_single_scan_pair(spark):
    plan = plan_of(OL.q_tpch_q19_disjunctive(spark, SF_SMOKE))
    # the disjunction must ride ONE join — not three scan+join branches
    assert n_ops(plan, "Scan parquet") == 2          # lineitem + part
    joins = (n_ops(plan, "BroadcastHashJoin")
             + n_ops(plan, "SortMergeJoin") + n_ops(plan, "ShuffledHashJoin"))
    assert joins == 1
    row = OL.q_tpch_q19_disjunctive(spark, SF_ORACLE).collect()[0]
    assert row.n_lineitems > 0 and row.revenue_e4 > 0


def test_q21_decorrelated_matches_bruteforce(spark):
    rows = OL.q_tpch_q21_lone_late_supplier(spark, SF_ORACLE).collect()
    import datetime
    od = {r.o_orderkey: r.o_orderdate for r in
          domain.load_table(spark, SF_ORACLE, "orders").collect()}
    per_order: dict[int, tuple[set, set]] = {}
    for r in domain.load_table(spark, SF_ORACLE, "lineitem").collect():
        supp, late = per_order.setdefault(r.l_orderkey, (set(), set()))
        supp.add(r.l_suppkey)
        if r.l_shipdate > od[r.l_orderkey] + datetime.timedelta(days=90):
            late.add(r.l_suppkey)
    counts: dict[int, int] = {}
    for supp, late in per_order.values():
        if len(supp) > 1 and len(late) == 1:
            (k,) = late
            counts[k] = counts.get(k, 0) + 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:OL.Q21_TOP]
    assert [(r.s_suppkey, r.numwait) for r in rows] == want


def test_q21_plan_touches_lineitem_once_per_role(spark):
    plan = plan_of(OL.q_tpch_q21_lone_late_supplier(spark, SF_SMOKE))
    # decorrelated: the correlated EXISTS/NOT EXISTS would re-join the
    # fact twice more; the aggregate form scans lineitem exactly once
    assert n_ops(plan, "Scan parquet") <= 3   # lineitem + orders + supplier
    assert n_ops(plan, "CartesianProduct") == 0


def test_q22_anti_join_and_integer_threshold(spark):
    rows = OL.q_tpch_q22_lost_customers(spark, SF_ORACLE).collect()
    assert rows and all(r.n_custs > 0 for r in rows)
    cust = domain.load_table(spark, SF_ORACLE, "customer").collect()
    import datetime, math
    bal = {r.c_custkey: math.floor(r.c_acctbal * 100) for r in cust}
    pos = [b for b in bal.values() if b > 0]
    s, n = sum(pos), len(pos)
    cutoff = datetime.datetime(2000, 1, 1)
    recent = {r.o_custkey for r in
              domain.load_table(spark, SF_ORACLE, "orders").collect()
              if r.o_orderdate >= cutoff}
    want: dict[int, list[int]] = {}
    for r in cust:
        if bal[r.c_custkey] * n > s and r.c_custkey not in recent:
            want.setdefault(r.c_nationkey, []).append(bal[r.c_custkey])
    assert {r.c_nationkey: (r.n_custs, r.bal_sum_c) for r in rows} == {
        k: (len(v), sum(v)) for k, v in want.items()}
    plan = plan_of(OL.q_tpch_q22_lost_customers(spark, SF_SMOKE))
    assert "LeftAnti" in plan
