"""Market-basket association and co-occurrence graph analytics.

The classic warehouse pair: 2-itemset association rules (the exact
A-priori first rung, what MLlib's FPGrowth computes approximately at
scale) and triangle counting over the co-purchase graph (the
community-density primitive).  Both are exact integer computations with
declarative DuckDB oracles.

Scale shapes:

* Pair generation is a per-basket self-join on the order key — cost
  sum(k_i^2) over basket sizes k_i (bounded, avg ~4 here), never a
  global cross join.  Support counting is one map-side-combined groupBy
  on the (p1, p2) pair key.
* Lift is computed in exact ppm integer arithmetic from BIGINT counts,
  so both engines agree bitwise.
* Triangle counting uses the canonical ordered-edge representation
  (p1 < p2 everywhere): each triangle {a<b<c} is generated exactly once
  by joining (a,b)x(b,c) and verifying the closing edge (a,c) with an
  equi-join — the two-path + closure plan whose cost is sum(deg^2) on
  the SUPPORT-THRESHOLDED edge set, the standard distributed-triangle
  layout (no cartesian, no undirected double counting).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import domain

MIN_SUPPORT = 2       # orders containing the pair
LIFT_SCALE = 1_000_000


def _basket_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = domain.load_table(spark, sf_dir, "lineitem")
    return li.select("l_orderkey", "l_partkey").distinct()


def _pair_support(spark: SparkSession, sf_dir: str) -> DataFrame:
    it = _basket_items(spark, sf_dir)
    a = it.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p1"))
    b = it.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("p2"))
    return (a.join(b, "k")
             .filter(F.col("p1") < F.col("p2"))
             .groupBy("p1", "p2")
             .agg(F.count(F.lit(1)).cast("bigint").alias("support")))


def q_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supported part pairs with exact-ppm lift vs independence:
    lift = P(p1,p2) / (P(p1) P(p2)) = sup * N / (n1 * n2), scaled to
    integer ppm with floor division."""
    it = _basket_items(spark, sf_dir)
    n_orders = (domain.load_table(spark, sf_dir, "lineitem")
                .select("l_orderkey").distinct().count())
    item_n = it.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_item"))
    pairs = _pair_support(spark, sf_dir).filter(
        F.col("support") >= MIN_SUPPORT)
    return (pairs
            .join(item_n.select(F.col("l_partkey").alias("p1"),
                                F.col("n_item").alias("n1")), "p1")
            .join(item_n.select(F.col("l_partkey").alias("p2"),
                                F.col("n_item").alias("n2")), "p2")
            .select("p1", "p2", "support", "n1", "n2",
                    F.expr(f"support * {n_orders}L * {LIFT_SCALE}L "
                           "div (n1 * n2)").alias("lift_ppm"))
            .orderBy("p1", "p2"))


def sql_basket_pairs() -> str:
    return f"""
WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
n AS (SELECT CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
      FROM lineitem),
item_n AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
           FROM it GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(count(*) AS BIGINT) AS support
  FROM it a JOIN it b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SUPPORT}
)
SELECT p.p1, p.p2, p.support, i1.n_item AS n1, i2.n_item AS n2,
       CAST(p.support * n.n_orders * {LIFT_SCALE}
            // (i1.n_item * i2.n_item) AS BIGINT) AS lift_ppm
FROM pairs p
JOIN item_n i1 ON p.p1 = i1.l_partkey
JOIN item_n i2 ON p.p2 = i2.l_partkey
CROSS JOIN n
ORDER BY p.p1, p.p2"""


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle participation over the support-thresholded
    co-purchase graph, plus the closing-edge support: each triangle
    {a<b<c} counted exactly once via the ordered two-path + closure
    join.  Output at triangle grain (bounded: 61 at sf0.01) so the
    result is value-checkable, with a total row derivable by the
    consumer."""
    e = (_pair_support(spark, sf_dir)
         .filter(F.col("support") >= MIN_SUPPORT)
         .select("p1", "p2"))
    e1 = e.select(F.col("p1").alias("a"), F.col("p2").alias("b"))
    e2 = e.select(F.col("p1").alias("b"), F.col("p2").alias("c"))
    e3 = e.select(F.col("p1").alias("a"), F.col("p2").alias("c"),
                  F.lit(1).alias("closed"))
    return (e1.join(e2, "b")
              .join(e3, ["a", "c"])
              .select("a", "b", "c")
              .orderBy("a", "b", "c"))


def sql_graph_triangles() -> str:
    return f"""
WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM it a JOIN it b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SUPPORT}
)
SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
FROM e e1
JOIN e e2 ON e1.p2 = e2.p1
JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
ORDER BY a, b, c"""
