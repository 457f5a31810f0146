"""Star-contraction connected components (operators/graph.py).

Three claims:
1. exact equivalence with the label-propagation clusters on real data;
2. exact agreement with a driver-side union-find on a random graph;
3. O(log n) rounds on a diameter-n chain — the property that makes it the
   100 TB path (label propagation needs O(n) full-edge rounds there).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from safeascent_spark.operators import dedup as D
from safeascent_spark.operators import graph as G

from conftest import SF_ORACLE, SF_SMOKE


def _edges_df(spark, pairs):
    return spark.createDataFrame(pairs, "u long, v long")


def _union_find(n_nodes, pairs):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical label = component minimum
    comp = {}
    for x in range(n_nodes):
        r = find(x)
        comp.setdefault(r, x)  # first visit in increasing order = min
    return {x: comp[find(x)] for x in range(n_nodes)}


def test_matches_label_propagation_on_lsh_graph(spark):
    for sf in (SF_SMOKE, SF_ORACLE):
        a = {(r.doc_id, r.cluster_rep, r.cluster_size, r.is_kept)
             for r in D.q_dedup_clusters(spark, sf).collect()}
        b = {(r.doc_id, r.cluster_rep, r.cluster_size, r.is_kept)
             for r in G.q_dedup_clusters_largestar(spark, sf).collect()}
        assert a == b and len(a) > 0


def test_matches_union_find_on_random_graph(spark):
    rng = random.Random(42)
    n = 300
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(260)]
    pairs = [(a, b) for a, b in pairs if a != b]
    expect = _union_find(n, pairs)
    got = {r.node: r.component
           for r in G.connected_components(_edges_df(spark, pairs)).collect()}
    # connected_components only reports nodes that appear in an edge
    touched = {x for p in pairs for x in p}
    assert got == {x: expect[x] for x in touched}


def test_chain_converges_logarithmically(spark):
    # a path graph 0-1-2-...-128: diameter 128; label propagation moves the
    # min one hop per round (O(n)); star contraction must finish in
    # O(log n) rounds.
    n = 129
    chain = [(i, i + 1) for i in range(n - 1)]
    rounds = G.cc_rounds_to_converge(_edges_df(spark, chain))
    assert rounds <= 10, rounds
    got = G.connected_components(_edges_df(spark, chain))
    assert got.where(F.col("component") != 0).count() == 0
    assert got.count() == n


def test_driver_cutover_matches_star_loop(spark, monkeypatch):
    # r12: small edge sets are solved with a bounded driver union-find
    # instead of paying per-round job latency.  Both paths must agree
    # exactly on the same graph (twin-heavy + a chain + singleton pairs).
    rng = random.Random(7)
    n = 400
    pairs = [(rng.randrange(n), rng.randrange(n)) for _ in range(300)]
    pairs += [(i, i + 1) for i in range(350, 380)]
    pairs = [(a, b) for a, b in pairs if a != b]
    fast = {(r.node, r.component)
            for r in G.connected_components(_edges_df(spark, pairs)).collect()}
    monkeypatch.setattr(G, "CC_DRIVER_MAX_EDGES", -1)  # force the star loop
    slow = {(r.node, r.component)
            for r in G.connected_components(_edges_df(spark, pairs)).collect()}
    assert fast == slow and len(fast) > 0
