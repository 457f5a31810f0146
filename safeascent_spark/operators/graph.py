"""Connected components via alternating large-star / small-star rounds.

The registered ``dedup_clusters`` query uses iterative min-label
propagation — correct, but its round count is O(component diameter) and
every round re-joins the FULL edge set.  On a 100 TB corpus a single
pathological chain (serial near-dup crawl snapshots) makes the diameter —
and therefore the number of full-edge shuffles — unbounded.

This module is the scale path: the two-phase star algorithm from
Kiveris et al., "Connected Components in MapReduce and Beyond" (SoCC'14).
Each round is one groupBy + one equi-join over the current edge set, the
edge set only shrinks toward stars, and convergence is O(log n) rounds
REGARDLESS of diameter.  ``tests/test_graph_cc.py`` proves both the
equivalence to the label-propagation result and the logarithmic round
count on a long chain where label propagation would need O(n) rounds.

Phases (all edges kept as (u, v) with u > v after round 0):

* large-star: for every node u, link every *larger* neighbor v > u to
  m = min(N(u) + [u]).
* small-star: for every node u over its *smaller* neighbors, link them
  (and u itself) to the minimum.

Reference parity: clusters over the MinHash-LSH candidate graph, same
output contract as ``dedup.q_dedup_clusters`` (SURVEY §2 dedup family;
duplicate clustering mirrors the reference's duplicate-report grouping,
backend/app/services/analytics_service.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import dedup as D
from . import text as T

MAX_ROUNDS = 20


def _checksum(edges: DataFrame):
    """Cheap fixpoint probe: (count, sum(u), sum(v)) as exact decimals.
    One thin scalar aggregate per round instead of a set-difference walk."""
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("u").cast("decimal(38,0)")).alias("su"),
        F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
    ).collect()[0]
    return (row["n"], row["su"], row["sv"])


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, where m = min(N(u) + [u])."""
    und = edges.select("u", "v").unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = (und.groupBy("u").agg(F.min("v").alias("mv"))
               .select("u", F.least("mv", "u").alias("m")))
    return (und.join(mins, "u")
               .where(F.col("v") > F.col("u"))
               .select(F.col("v").alias("u"), F.col("m").alias("v"))
               .distinct())


def _small_star(edges: DataFrame) -> DataFrame:
    """Over smaller neighbors N-(u): link N-(u) + [u] to their minimum.
    Input edges satisfy u > v, so min(N-(u)) < u always."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    relink = (edges.join(mins, "u")
                   .where(F.col("v") != F.col("m"))
                   .select(F.col("v").alias("u"), F.col("m").alias("v")))
    self_link = mins.select("u", F.col("m").alias("v"))
    return relink.unionAll(self_link).distinct()


def connected_components(edges: DataFrame, max_rounds: int = MAX_ROUNDS) -> DataFrame:
    """Star-contraction CC over an undirected edge list (columns u, v).

    Returns (node, component) for every node appearing in an edge, where
    component is the minimum node id of its connected component.
    lineage is truncated per round (localCheckpoint) — the standard Spark
    iterative pattern; without it the plan doubles every round.
    """
    cur = (edges.select(F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v"))
                .where(F.col("u") != F.col("v"))
                .distinct()
                .localCheckpoint(eager=True))
    prev_sum = _checksum(cur)
    for _ in range(max_rounds):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        cur_sum = _checksum(cur)
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    # At the fixpoint the edge set is a union of stars: (node, root) for
    # every non-root node.  min() is a no-op safety net at the fixpoint.
    members = cur.groupBy("u").agg(F.min("v").alias("component")) \
                 .select(F.col("u").alias("node"), "component")
    roots = cur.select(F.col("v").alias("node")).distinct() \
               .join(members, "node", "left_anti") \
               .withColumn("component", F.col("node"))
    return members.unionAll(roots)


def cc_rounds_to_converge(edges: DataFrame, max_rounds: int = MAX_ROUNDS) -> int:
    """Instrumented variant: number of star rounds until the fixpoint.
    Used by tests to prove O(log n) convergence on a diameter-n chain."""
    cur = (edges.select(F.greatest("u", "v").alias("u"),
                        F.least("u", "v").alias("v"))
                .where(F.col("u") != F.col("v"))
                .distinct()
                .localCheckpoint(eager=True))
    prev_sum = _checksum(cur)
    for i in range(max_rounds):
        cur = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        cur_sum = _checksum(cur)
        if cur_sum == prev_sum:
            return i + 1
        prev_sum = cur_sum
    return max_rounds


def q_dedup_clusters_largestar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``dedup_clusters`` re-derived through star-contraction CC — identical
    output contract (doc_id, cluster_rep, cluster_size, is_kept), shares the
    recursive-SQL oracle with the label-propagation form."""
    docs = T.docs_df(spark, sf_dir).select("doc_id")
    pairs = D.q_dedup_minhash_lsh(spark, sf_dir) \
             .select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v"))
    comp = connected_components(pairs)
    labels = (docs.join(comp, docs["doc_id"] == comp["node"], "left")
                  .select("doc_id",
                          F.coalesce("component", "doc_id").alias("label")))
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (labels.join(sizes, "label")
                  .select("doc_id",
                          F.col("label").alias("cluster_rep"),
                          "cluster_size",
                          (F.col("doc_id") == F.col("label")).alias("is_kept"))
                  .orderBy("doc_id"))
