"""Round-10 ADVICE regression guards (three low findings from the r9
advisor, none a live divergence on the fixture — each a latent hazard
that would only fire under hostile data or a future refactor):

1. (low) ``tpch_q2_mincost``: the unit-cost divisor was
   ``CAST(l_quantity AS BIGINT)`` — Spark's double->bigint cast
   truncates while DuckDB's CAST rounds half-even, so a non-integral
   quantity (3.5) would silently diverge.  Fixed with
   ``floor(l_quantity)`` inside the cast on BOTH sides (the repo's
   floor(x*100) idiom); a hostile fixture pins the parity, and a
   fixture-integrality sweep covers the remaining
   ``CAST(l_quantity AS BIGINT)`` sites (Q1/Q6/Q17/Q18/Q19), whose
   casts stay un-floored only because integrality holds.
2. (low) ``ml._moment_aggs``: second-order sums relied on Spark's
   IMPLICIT decimal(19,0)*bigint -> decimal(38,0) multiply-widening;
   the per-row product (yi^2 ~ 1.6e19) does not fit decimal(19,0)
   itself.  Now cast explicitly to decimal(38,0); the test pins the
   OUTPUT decimal types so a refactor that loses the widening fails
   here, not at sf0.1.
3. (low) stale ``q_curation_funnel`` docstring still described the
   pre-audit double threshold ``quality >= 0.5``; pinned to the
   integer micro-unit contract.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pyspark.sql.functions as F

from safeascent_spark import ml as ML
from safeascent_spark.operators import dedup as D
from safeascent_spark.operators import olap as OL

SF_SMOKE = "/root/testdata/sf0.001"


# --- 1. Q2 unit-cost: floor-inside-cast parity on non-integral qty ---------

def test_q2_unit_cost_non_integral_quantity_parity(spark, tmp_path):
    """A lineitem row with l_quantity = 3.5 (and 2.5 — the half-even
    trap: DuckDB CAST would round to 2, Spark cast would truncate to 2;
    but 3.5 rounds to 4 vs truncates to 3) produces the SAME cost_mc in
    the engine and the oracle now that both floor first."""
    li = pd.DataFrame({
        "l_partkey": [1, 1, 2],
        "l_suppkey": [10, 10, 10],
        "l_extendedprice": [100.0, 100.0, 90.0],
        "l_quantity": [3.5, 2.5, 3.0],
    })
    part = pd.DataFrame({"p_partkey": [1, 2], "p_brand": ["B#1", "B#2"],
                         "p_type": ["STANDARD"] * 2, "p_size": [15, 15]})
    supp = pd.DataFrame({"s_suppkey": [10], "s_name": ["S1"],
                         "s_acctbal": [7.25], "s_nationkey": [0]})
    nat = pd.DataFrame({"n_nationkey": [0], "n_name": ["FRANCE"],
                        "n_regionkey": [0]})
    reg = pd.DataFrame({"r_regionkey": [0], "r_name": ["EUROPE"]})
    for name, pdf in [("lineitem", li), ("part", part), ("supplier", supp),
                      ("nation", nat), ("region", reg)]:
        pdf.to_parquet(f"{tmp_path}/{name}.parquet", index=False)

    rows = {(r.p_partkey): (r.cost_mc, r.bal_c)
            for r in OL.q_tpch_q2_mincost(spark, str(tmp_path)).collect()}
    # part 1: qty 3.5 -> floor 3 -> 10000000 div 3 = 3333333;
    #         qty 2.5 -> floor 2 -> 5000000; min = 3333333
    # part 2: qty 3.0 -> 9000000 div 3 = 3000000
    assert rows == {1: (3333333, 725), 2: (3000000, 725)}

    con = duckdb.connect()
    for name, pdf in [("lineitem", li), ("part", part), ("supplier", supp),
                      ("nation", nat), ("region", reg)]:
        con.register(name, pdf)
    orc = {p: (c, b) for b, _s, _n, p, _br, c in
           con.execute(OL.sql_tpch_q2_mincost()).fetchall()}
    assert orc == rows


def test_fixture_quantity_is_integral(spark):
    """The other CAST(l_quantity AS BIGINT) sites (Q1/Q6/Q17/Q18/Q19)
    are safe iff l_quantity is integral — assert it on the fixture so
    a future data regeneration that breaks the property fails loudly
    here instead of as a silent engine/oracle divergence."""
    # sweep EVERY fixture SF: the un-floored CAST sites this guards
    # (Q1/Q6/Q17/Q18/Q19) are gated at sf0.01 and sf0.1, so asserting
    # only the smoke SF would let a regeneration that breaks
    # integrality at a larger SF slip past (ADVICE r10)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        li = spark.read.parquet(f"/root/testdata/{sf}/lineitem.parquet")
        bad = li.filter(
            F.col("l_quantity") != F.floor("l_quantity")).count()
        assert bad == 0, sf


# --- 2. _moment_aggs: explicit DECIMAL(38,0) second-order sums --------------

def test_moment_aggs_output_types_are_decimal38(spark):
    """The five second-order statistics must come out DECIMAL(38,0) —
    pinning the EXPLICIT cast so a refactor that drops it (and falls
    back to whatever the implicit multiply rule yields that day) trips
    this test rather than overflowing at sf0.1."""
    df = spark.createDataFrame(
        [(4_000_000_000, 123_456, 4_000_000_000)], "ei long, pi long, yi long")
    out = df.agg(*ML._moment_aggs())
    types = dict(out.dtypes)
    for c in ("s11", "s22", "s12", "s1y", "s2y", "syy0"):
        assert types[c] == "decimal(38,0)", (c, types[c])
    for c in ("s1", "s2", "sy0"):
        assert types[c] == "bigint", (c, types[c])
    row = out.collect()[0]
    # 4e9^2 = 1.6e19 > int64 max (9.22e18): exact, not wrapped/NULL
    assert int(row["syy0"]) == 16_000_000_000_000_000_000
    assert int(row["s11"]) == 16_000_000_000_000_000_000
    assert int(row["s1y"]) == 16_000_000_000_000_000_000


# --- 3. curation_funnel docstring matches the integer contract --------------

def test_curation_funnel_docstring_pinned():
    doc = D.q_curation_funnel.__doc__
    assert "quality_u >= 500000" in doc
    assert "(quality >= 0.5)" not in doc
