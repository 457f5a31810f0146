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
                    # support * N * 1e6 rides DECIMAL(38,0) so the
                    # numerator cannot overflow int64 at any corpus size
                    # (ADVICE r5) — same exact value, wider intermediate
                    F.expr(f"CAST(CAST(support AS DECIMAL(38,0)) "
                           f"* {n_orders}L * {LIFT_SCALE}L "
                           "div (n1 * n2) AS BIGINT)").alias("lift_ppm"))
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
       CAST(CAST(p.support AS HUGEINT) * n.n_orders * {LIFT_SCALE}
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


# --- Item-item collaborative filtering (top-k cosine neighbors) --------------
# The recommender primitive on top of the pair-support table: item-item
# cosine = sup / sqrt(n1 * n2), computed as floor-ppm of bitwise-
# identical IEEE doubles (sqrt is correctly rounded in both engines, the
# inputs are exact BIGINTs).  Pairs symmetrize and a per-item
# row_number window keeps the top CF_TOP_K — the WindowGroupLimit
# pre-truncating shape, so the exchange carries O(items x k).

CF_TOP_K = 3


def q_cf_item_neighbors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    it = _basket_items(spark, sf_dir)
    item_n = it.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_item"))
    pairs = _pair_support(spark, sf_dir).filter(
        F.col("support") >= MIN_SUPPORT)
    sym = (pairs.select(F.col("p1").alias("item"),
                        F.col("p2").alias("neighbor"), "support")
                .unionByName(
                    pairs.select(F.col("p2").alias("item"),
                                 F.col("p1").alias("neighbor"), "support")))
    scored = (sym.join(item_n.select(F.col("l_partkey").alias("item"),
                                     F.col("n_item").alias("ni")), "item")
                 .join(item_n.select(F.col("l_partkey").alias("neighbor"),
                                     F.col("n_item").alias("nn")), "neighbor")
                 .select("item", "neighbor", "support",
                         F.expr(f"CAST(floor(support * {LIFT_SCALE} "
                                "/ sqrt(CAST(ni * nn AS DOUBLE))) AS BIGINT)")
                          .alias("cosine_ppm")))
    w = Window.partitionBy("item").orderBy(
        F.col("cosine_ppm").desc(), F.col("neighbor").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
                  .filter(F.col("rank") <= CF_TOP_K)
                  .select("item", F.col("rank").cast("int").alias("rank"),
                          "neighbor", "support", "cosine_ppm")
                  .orderBy("item", "rank"))


def sql_cf_item_neighbors() -> str:
    return f"""
WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
item_n AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n_item
           FROM it GROUP BY l_partkey),
pairs AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         CAST(count(*) AS BIGINT) AS support
  FROM it a JOIN it b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SUPPORT}
),
sym AS (
  SELECT p1 AS item, p2 AS neighbor, support FROM pairs
  UNION ALL
  SELECT p2, p1, support FROM pairs
),
scored AS (
  SELECT s.item, s.neighbor, s.support,
         CAST(floor(s.support * {LIFT_SCALE}
              / sqrt(CAST(i1.n_item * i2.n_item AS DOUBLE))) AS BIGINT)
           AS cosine_ppm
  FROM sym s
  JOIN item_n i1 ON s.item = i1.l_partkey
  JOIN item_n i2 ON s.neighbor = i2.l_partkey
)
SELECT item, CAST(rank AS INT) AS rank, neighbor, support, cosine_ppm
FROM (SELECT *, row_number() OVER (PARTITION BY item
                                   ORDER BY cosine_ppm DESC, neighbor) AS rank
      FROM scored)
WHERE rank <= {CF_TOP_K}
ORDER BY item, rank"""


# --- Grid-density hotspot clustering (DBSCAN-lite over cells) ----------------
# Spatial hotspot detection the way it scales: points collapse to
# 1-degree grid cells (one map-side-combined groupBy), cells at or above
# the density threshold become nodes, 8-neighbor adjacency between dense
# cells becomes the edge list (an equi-join against exploded neighbor
# offsets — never a theta join), and connected components (the O(log n)
# star-contraction from operators/graph.py) labels contiguous regions.
# Cluster grain output: min-cell id as the label, cell count, total
# points, and the bounding extent.  The oracle walks the same adjacency
# with WITH RECURSIVE min-label propagation.

HOT_CELL_DEG = 1      # 1-degree cells
HOT_MIN_POINTS = 1    # density threshold per cell
_HOT_KEY = 10_000     # cell id = (cx + 500) * _HOT_KEY + (cy + 500)


def q_geo_hotspots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .graph import connected_components
    a = domain.accidents_df(spark, sf_dir)
    cells = (a.select(
                F.expr(f"CAST(floor(latitude * {HOT_CELL_DEG}) AS BIGINT)")
                 .alias("cx"),
                F.expr(f"CAST(floor(longitude * {HOT_CELL_DEG}) AS BIGINT)")
                 .alias("cy"))
              .groupBy("cx", "cy")
              .agg(F.count(F.lit(1)).alias("n_points"))
              .filter(F.col("n_points") >= HOT_MIN_POINTS))
    cid = ((F.col("cx") + 500) * _HOT_KEY + (F.col("cy") + 500))
    nodes = cells.select(cid.alias("cell_id"), "cx", "cy", "n_points")
    # 8-neighbor adjacency via exploded offsets + equi-join on (cx, cy)
    offs = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            if (dx, dy) != (0, 0)]
    nbr = (nodes.select(
               "cell_id",
               F.explode(F.array(*[
                   F.struct((F.col("cx") + dx).alias("cx"),
                            (F.col("cy") + dy).alias("cy"))
                   for dx, dy in offs])).alias("o"))
                .select("cell_id", F.col("o.cx").alias("cx"),
                        F.col("o.cy").alias("cy")))
    edges = (nbr.join(nodes.select(F.col("cell_id").alias("nbr_id"),
                                   "cx", "cy"), ["cx", "cy"])
                .filter(F.col("cell_id") < F.col("nbr_id"))
                .select(F.col("cell_id").alias("u"),
                        F.col("nbr_id").alias("v")))
    cc = connected_components(edges)
    labeled = (nodes.join(cc, nodes.cell_id == cc.node, "left")
                    .select("cell_id", "cx", "cy", "n_points",
                            F.coalesce("component", "cell_id")
                             .alias("cluster_id")))
    return (labeled.groupBy("cluster_id")
                   .agg(F.count(F.lit(1)).cast("bigint").alias("n_cells"),
                        F.sum("n_points").cast("bigint").alias("n_points"),
                        F.min("cx").alias("cx_min"), F.max("cx").alias("cx_max"),
                        F.min("cy").alias("cy_min"), F.max("cy").alias("cy_max"))
                   .orderBy("cluster_id"))


def sql_geo_hotspots() -> str:
    from .. import domain as dm
    domain_with = ("WITH " + dm.ACCIDENTS_CTE.strip())
    return f"""{domain_with},
cells AS (
  SELECT CAST(floor(latitude * {HOT_CELL_DEG}) AS BIGINT) AS cx,
         CAST(floor(longitude * {HOT_CELL_DEG}) AS BIGINT) AS cy,
         count(*) AS n_points
  FROM accidents GROUP BY cx, cy
  HAVING count(*) >= {HOT_MIN_POINTS}
),
nodes AS (
  SELECT (cx + 500) * {_HOT_KEY} + (cy + 500) AS cell_id, cx, cy, n_points
  FROM cells
),
edges AS (
  SELECT a.cell_id AS src, b.cell_id AS dst
  FROM nodes a JOIN nodes b
    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
   AND a.cell_id <> b.cell_id
),
walk AS (
  WITH RECURSIVE reach(cell_id, label) AS (
    SELECT cell_id, cell_id FROM nodes
    UNION
    SELECT e.dst, r.label
    FROM reach r JOIN edges e ON r.cell_id = e.src
  )
  SELECT cell_id, min(label) AS cluster_id FROM reach GROUP BY cell_id
)
SELECT w.cluster_id,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(n.n_points) AS BIGINT) AS n_points,
       min(n.cx) AS cx_min, max(n.cx) AS cx_max,
       min(n.cy) AS cy_min, max(n.cy) AS cy_max
FROM nodes n JOIN walk w USING (cell_id)
GROUP BY w.cluster_id
ORDER BY w.cluster_id"""


# --- Brand revenue share (the TPC-H Q14-family part-dimension rollup) --------
# Closes the schema: `part` is the one base table no other query reads.
# lineitem ⋈ part on the part key (fact-side shuffle join; the part dim
# broadcasts under AQE at test scale), revenue in exact micro-units,
# share-of-total as ppm against a 1-row broadcast total (percent-of-
# total WITHOUT a global window).

def q_part_brand_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = domain.load_table(spark, sf_dir, "lineitem")
    p = domain.load_table(spark, sf_dir, "part")
    rev = (F.expr("CAST(floor(l_extendedprice * 100) AS BIGINT)")
           * (F.lit(1000).cast("long")
              - F.expr("CAST(floor(l_discount * 1000) AS BIGINT)")))
    brand = (li.select("l_partkey", rev.alias("rev_micro"))
               .join(p.select("p_partkey", "p_brand"),
                     F.col("l_partkey") == F.col("p_partkey"))
               .groupBy("p_brand")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_items"),
                    F.sum("rev_micro").alias("revenue_micro")))
    total = brand.agg(F.sum("revenue_micro").alias("t"))
    # share as rev div (total/1e6): division-only, so the corpus-sized
    # totals never multiply (rev * 1e6 overflows int64 beyond ~9e12
    # micro-revenue; both engines would fault identically but loudly)
    return (brand.crossJoin(F.broadcast(total))
                 .select("p_brand", "n_items", "revenue_micro",
                         F.expr(f"revenue_micro div "
                                f"greatest(t div {LIFT_SCALE}L, 1L)")
                          .alias("share_ppm"))
                 .orderBy(F.col("revenue_micro").desc(), "p_brand"))


def sql_part_brand_share() -> str:
    return f"""
WITH brand AS (
  SELECT p.p_brand,
         CAST(count(*) AS BIGINT) AS n_items,
         CAST(sum(CAST(floor(l.l_extendedprice * 100) AS BIGINT)
                  * (1000 - CAST(floor(l.l_discount * 1000) AS BIGINT)))
              AS BIGINT) AS revenue_micro
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY p.p_brand
),
total AS (SELECT CAST(sum(revenue_micro) AS BIGINT) AS t FROM brand)
SELECT b.p_brand, b.n_items, b.revenue_micro,
       CAST(b.revenue_micro
            // greatest(t.t // {LIFT_SCALE}, 1) AS BIGINT) AS share_ppm
FROM brand b CROSS JOIN total t
ORDER BY b.revenue_micro DESC, b.p_brand"""


# --- Local clustering-coefficient histogram (round 10) --------------------------
# The community-structure readout graph_triangles stops short of: per
# node of the support-thresholded co-purchase graph, the local
# clustering coefficient  cc(v) = closed wedges at v / wedges at v
#                                = T_v / (deg_v * (deg_v - 1) / 2),
# rolled into a bounded ppm-decile histogram.  High-cc mass means the
# co-purchase graph is clique-y (recommender neighborhoods are
# trustworthy); cc collapsing toward 0 while degrees grow is the
# classic signal that hub items (staples) have glued unrelated
# categories together.
#
# Exactness: triangle participations and degrees are exact counts,
# cc_ppm = 2 * T_v * 1e6 div (deg_v * (deg_v - 1)) is a nonnegative
# integer floor-division, and the per-bin average is one more.
#
# Scale shape: reuses the support-thresholded pair graph (item grain,
# bounded by |parts|; the threshold is the hot-pair cap adjudicated
# for q_graph_triangles) — the triangle enumeration is the SAME
# ordered two-path + closure equi-join as the registered triangles
# query, degrees are one keyed aggregate, and the histogram output is
# <= 11 rows regardless of corpus size.  The corpus-sized fact table
# is touched exactly once (inside _pair_support).

CC_BIN_PPM = 100_000     # ppm-decile histogram buckets


def q_graph_clustering_coefficient(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    e = (_pair_support(spark, sf_dir)
         .filter(F.col("support") >= MIN_SUPPORT)
         .select("p1", "p2"))
    und = e.unionAll(e.select(F.col("p2").alias("p1"),
                              F.col("p1").alias("p2")))
    deg = (und.groupBy(F.col("p1").alias("node"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("deg")))
    e1 = e.select(F.col("p1").alias("a"), F.col("p2").alias("b"))
    e2 = e.select(F.col("p1").alias("b"), F.col("p2").alias("c"))
    e3 = e.select(F.col("p1").alias("a"), F.col("p2").alias("c"))
    tri = e1.join(e2, "b").join(e3, ["a", "c"]).select("a", "b", "c")
    tcnt = (tri.select(F.col("a").alias("node"))
               .unionAll(tri.select(F.col("b").alias("node")))
               .unionAll(tri.select(F.col("c").alias("node")))
               .groupBy("node")
               .agg(F.count(F.lit(1)).cast("bigint").alias("t")))
    per = (deg.filter(F.col("deg") >= 2)
              .join(tcnt, "node", "left")
              .select("node", "deg",
                      F.coalesce("t", F.lit(0).cast("bigint")).alias("t"))
              .withColumn("cc_ppm",
                          F.expr("2 * t * 1000000"
                                 " div (deg * (deg - 1))")))
    return (per.groupBy(F.expr(f"CAST(least(9, cc_ppm div {CC_BIN_PPM})"
                               " AS INT)").alias("cc_bin"))
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"),
                    F.expr("CAST(sum(deg * (deg - 1) div 2) AS BIGINT)")
                     .alias("n_wedges"),
                    F.sum("t").cast("bigint").alias("n_closed"),
                    F.expr("CAST(sum(cc_ppm) div count(1) AS BIGINT)")
                     .alias("avg_cc_ppm"))
               .orderBy("cc_bin"))


def sql_graph_clustering_coefficient() -> str:
    return f"""
WITH it AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM it a JOIN it b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {MIN_SUPPORT}
),
und AS (SELECT p1, p2 FROM e UNION ALL SELECT p2, p1 FROM e),
deg AS (SELECT p1 AS node, CAST(count(*) AS BIGINT) AS deg
        FROM und GROUP BY 1),
tri AS (
  SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
  FROM e e1
  JOIN e e2 ON e1.p2 = e2.p1
  JOIN e e3 ON e3.p1 = e1.p1 AND e3.p2 = e2.p2
),
tcnt AS (
  SELECT node, CAST(count(*) AS BIGINT) AS t
  FROM (SELECT a AS node FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri)
  GROUP BY 1
),
per AS (
  SELECT d.node, d.deg, coalesce(t.t, 0) AS t,
         2 * coalesce(t.t, 0) * 1000000 // (d.deg * (d.deg - 1))
           AS cc_ppm
  FROM deg d LEFT JOIN tcnt t ON d.node = t.node
  WHERE d.deg >= 2
)
SELECT CAST(least(9, cc_ppm // {CC_BIN_PPM}) AS INT) AS cc_bin,
       CAST(count(*) AS BIGINT) AS n_nodes,
       CAST(sum(deg * (deg - 1) // 2) AS BIGINT) AS n_wedges,
       CAST(sum(t) AS BIGINT) AS n_closed,
       CAST(sum(cc_ppm) // count(*) AS BIGINT) AS avg_cc_ppm
FROM per
GROUP BY 1
ORDER BY cc_bin"""
