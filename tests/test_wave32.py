"""Round-9 wave-32 semantics: the adapted TPC-H Q2 / Q16 shapes,
each cross-checked against a driver-side brute force at sf0.001.

The fixture has no partsupp table, so both queries derive the
part-supplier relation from lineitem (documented in the operator
docstrings); the brute force below re-derives it independently from
collected rows, including the exact integer milli-cent unit-cost
arithmetic."""

from __future__ import annotations

import math
from collections import defaultdict

from safeascent_spark import domain
from safeascent_spark.operators import olap as OL
from tests.conftest import SF_SMOKE


def _rows(spark, table, cols):
    return (domain.load_table(spark, SF_SMOKE, table)
            .select(*cols).collect())


def test_tpch_q2_mincost_matches_bruteforce(spark):
    li = _rows(spark, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice",
                "l_quantity"])
    ps = defaultdict(lambda: None)
    for r in li:
        mc = (math.floor(r.l_extendedprice * 100) * 1000
              // int(r.l_quantity))
        k = (r.l_partkey, r.l_suppkey)
        if ps[k] is None or mc < ps[k]:
            ps[k] = mc
    reg = {r.r_regionkey for r in _rows(spark, "region",
                                        ["r_regionkey", "r_name"])
           if r.r_name == OL.Q2_REGION}
    nat = {r.n_nationkey: r.n_name
           for r in _rows(spark, "nation",
                          ["n_nationkey", "n_name", "n_regionkey"])
           if r.n_regionkey in reg}
    supp = {r.s_suppkey: (r.s_name,
                          math.floor(r.s_acctbal * 100),
                          nat[r.s_nationkey])
            for r in _rows(spark, "supplier",
                           ["s_suppkey", "s_name", "s_acctbal",
                            "s_nationkey"])
            if r.s_nationkey in nat}
    part = {r.p_partkey: r.p_brand
            for r in _rows(spark, "part",
                           ["p_partkey", "p_brand", "p_type", "p_size"])
            if r.p_type == OL.Q2_TYPE
            and OL.Q2_SIZE_LO <= r.p_size <= OL.Q2_SIZE_HI}
    cand = [(pk, sk, mc) for (pk, sk), mc in ps.items()
            if pk in part and sk in supp]
    min_pp = defaultdict(lambda: None)
    for pk, _, mc in cand:
        if min_pp[pk] is None or mc < min_pp[pk]:
            min_pp[pk] = mc
    exp = sorted(
        ((supp[sk][1], supp[sk][0], supp[sk][2], pk, part[pk], mc)
         for pk, sk, mc in cand if mc == min_pp[pk]),
        key=lambda t: (-t[0], t[2], t[1], t[3]))[:100]
    got = [(r.bal_c, r.s_name, r.n_name, r.p_partkey, r.p_brand,
            r.cost_mc)
           for r in OL.q_tpch_q2_mincost(spark, SF_SMOKE).collect()]
    assert got == exp
    assert len(got) > 0


def test_tpch_q16_supplier_cnt_matches_bruteforce(spark):
    li = _rows(spark, "lineitem", ["l_partkey", "l_suppkey"])
    bad = {r.s_suppkey for r in _rows(spark, "supplier",
                                      ["s_suppkey", "s_acctbal"])
           if r.s_acctbal < 0}
    part = {r.p_partkey: (r.p_brand, r.p_type, r.p_size)
            for r in _rows(spark, "part",
                           ["p_partkey", "p_brand", "p_type", "p_size"])
            if r.p_brand != OL.Q16_BRAND_NOT
            and r.p_type != OL.Q16_TYPE_NOT
            and r.p_size in OL.Q16_SIZES}
    by_grp = defaultdict(set)
    for pk, sk in {(r.l_partkey, r.l_suppkey) for r in li}:
        if sk not in bad and pk in part:
            by_grp[part[pk]].add(sk)
    exp = sorted(((b, t, s, len(v))
                  for (b, t, s), v in by_grp.items()),
                 key=lambda x: (-x[3], x[0], x[1], x[2]))
    got = [(r.p_brand, r.p_type, r.p_size, r.supplier_cnt)
           for r in OL.q_tpch_q16_supplier_cnt(spark,
                                               SF_SMOKE).collect()]
    assert got == exp
    assert len(got) > 0


# --- Hostile fixtures: edges the driver corpus never exercises ----------------
# The sf0.01/sf0.1 corpora have no min-cost TIES (probed: 0 parts with
# >1 achiever), so the Q2 tie path — every supplier achieving the
# per-part minimum must surface, ordered by the total bal_c DESC key —
# and the Q16 boundary exclusions (acctbal exactly 0 kept, duplicate
# (part, supplier) lineitems collapsing to one) get tmp-parquet
# fixtures that run the REAL operators and cross-check DuckDB.

import duckdb
import pandas as pd

from safeascent_spark.operators import olap as OL2


def _write(tmp_path, **tables):
    for name, pdf in tables.items():
        pdf.to_parquet(f"{tmp_path}/{name}.parquet", index=False)
    return str(tmp_path)


def _q2_fixture(tmp_path):
    return _write(
        tmp_path,
        region=pd.DataFrame({"r_regionkey": [0, 1],
                             "r_name": ["EUROPE", "ASIA"]}),
        nation=pd.DataFrame({"n_nationkey": [0, 1, 2],
                             "n_name": ["FRANCE", "GERMANY", "CHINA"],
                             "n_regionkey": [0, 0, 1]}),
        supplier=pd.DataFrame({"s_suppkey": [10, 11, 12],
                               "s_name": ["S_A", "S_B", "S_C"],
                               "s_nationkey": [0, 1, 2],
                               "s_acctbal": [50.0, 10.0, 99.0]}),
        part=pd.DataFrame({"p_partkey": [1, 2, 3],
                           "p_brand": ["Brand#1"] * 3,
                           "p_type": ["STANDARD", "PROMO", "STANDARD"],
                           "p_size": [15, 15, 50]}),
        lineitem=pd.DataFrame({
            "l_partkey": [1, 1, 1, 1, 2, 3],
            "l_suppkey": [10, 10, 11, 12, 10, 11],
            "l_extendedprice": [20.0, 30.0, 10.0, 5.0, 1.0, 1.0],
            "l_quantity": [2.0, 2.0, 1.0, 1.0, 1.0, 1.0]}))


def test_tpch_q2_tie_and_region_exclusion(spark, tmp_path):
    """Two EUROPE suppliers tie at the per-part min (1,000,000 mc) and
    BOTH surface, bal_c DESC first; the cheaper ASIA supplier
    (500,000 mc) is excluded by the region join, not by the min."""
    sf = _q2_fixture(tmp_path)
    got = [tuple(r) for r in OL2.q_tpch_q2_mincost(spark, sf).collect()]
    assert got == [(5000, "S_A", "FRANCE", 1, "Brand#1", 1000000),
                   (1000, "S_B", "GERMANY", 1, "Brand#1", 1000000)]
    con = duckdb.connect()
    for t in ["region", "nation", "supplier", "part", "lineitem"]:
        con.register(t, pd.read_parquet(f"{sf}/{t}.parquet"))
    assert [tuple(r) for r in
            con.execute(OL2.sql_tpch_q2_mincost()).fetchall()] == got


def test_tpch_q16_boundary_exclusions(spark, tmp_path):
    """acctbal < 0 excludes, acctbal == 0 keeps; duplicate (part,
    supplier) lineitems collapse to one distinct pair."""
    sf = _write(
        tmp_path,
        supplier=pd.DataFrame({"s_suppkey": [10, 11, 12],
                               "s_name": ["S_A", "S_B", "S_C"],
                               "s_nationkey": [0, 0, 0],
                               "s_acctbal": [5.0, -1.0, 0.0]}),
        part=pd.DataFrame({"p_partkey": [1, 2, 3],
                           "p_brand": ["Brand#1", "Brand#13", "Brand#1"],
                           "p_type": ["STANDARD"] * 3,
                           "p_size": [4, 4, 5]}),
        lineitem=pd.DataFrame({
            "l_partkey": [1, 1, 1, 1, 2, 3],
            "l_suppkey": [10, 10, 11, 12, 10, 12],
            "l_extendedprice": [1.0] * 6,
            "l_quantity": [1.0] * 6}))
    got = [tuple(r) for r in
           OL2.q_tpch_q16_supplier_cnt(spark, sf).collect()]
    assert got == [("Brand#1", "STANDARD", 4, 2)]
    con = duckdb.connect()
    for t in ["supplier", "part", "lineitem"]:
        con.register(t, pd.read_parquet(f"{sf}/{t}.parquet"))
    assert [tuple(r) for r in
            con.execute(OL2.sql_tpch_q16_supplier_cnt()).fetchall()] == got
