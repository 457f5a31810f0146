"""Round-5 second-wave semantics: as-of join, robust anomaly flags,
PMI collocations, fixed-point PageRank.

All four carry full oracles in test_oracle_parity; these pin the
contracts the parity compare can't see: inclusive as-of tie semantics,
lower-median determinism, 128-bit exactness of the PMI ratio, and the
PageRank fixpoint (NITER reaches convergence on the depth-4 DAG).
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_ORACLE, SF_SMOKE


@pytest.fixture(scope="module")
def asof_events_dir(tmp_path_factory):
    # user 1: view@10s, error@10s (tie -> matched, gap 0), error@25s
    # user 2: error@5s with no prior view -> NULL; view@6s AFTER the error
    #         must NOT match
    # user 3: two views (3s, 9s), error@9.5s -> matches the 9s view
    base = pd.Timestamp("2024-01-01")
    s = lambda x: base + pd.Timedelta(seconds=x)
    rows = [
        (101, s(10), 1, "view", 0.0, "{}"),
        (102, s(10), 1, "error", 0.0, "{}"),
        (103, s(25), 1, "error", 0.0, "{}"),
        (201, s(5), 2, "error", 0.0, "{}"),
        (202, s(6), 2, "view", 0.0, "{}"),
        (301, s(3), 3, "view", 0.0, "{}"),
        (302, s(9), 3, "view", 0.0, "{}"),
        (303, s(9.5), 3, "error", 0.0, "{}"),
    ]
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    d = tmp_path_factory.mktemp("asofev")
    df.to_parquet(d / "events.parquet")
    return str(d)


def test_asof_inclusive_tie_and_null_semantics(spark, asof_events_dir):
    from safeascent_spark.operators import analytics as A
    out = {r["event_id"]: r for r in
           A.q_events_asof_view(spark, asof_events_dir).collect()}
    assert set(out) == {102, 103, 201, 303}
    # tie at the same instant: the view qualifies (at-or-before)
    assert out[102]["gap_s"] == 0 and out[102]["t_view"] == out[102]["t_err"]
    # later error still sees the 10s view
    assert out[103]["gap_s"] == 15
    # no prior view -> NULLs (the 6s view is AFTER the 5s error)
    assert out[201]["t_view"] is None and out[201]["gap_s"] is None
    # sub-second gap floor-divides to 0 whole seconds
    assert out[303]["gap_s"] == 0


def test_asof_matches_the_latest_prior_view(spark, asof_events_dir):
    from safeascent_spark.operators import analytics as A
    out = {r["event_id"]: r for r in
           A.q_events_asof_view(spark, asof_events_dir).collect()}
    # user 3's error at 9.5s matched the 9s view (not the 3s one):
    # t_err - t_view = 0.5e9 ns exactly
    assert out[303]["t_err"] - out[303]["t_view"] == 500_000_000


def test_anomaly_lower_median_and_mad_zero(spark, tmp_path):
    # one event_type over 4 days with counts [1, 2, 2, 6]:
    # lower median (rank (4+1)//2 = 2 under (count, day)) = 2;
    # adevs [1, 0, 0, 4] -> lower MAD = 0; flag iff adev > 3*0 -> days
    # with count != 2.
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for day, n in enumerate([1, 2, 2, 6]):
        for _ in range(n):
            eid += 1
            rows.append((eid, base + pd.Timedelta(days=day, seconds=eid),
                         1, "click", 0.0, "{}"))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    d = tmp_path / "anomev"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    from safeascent_spark.operators import analytics as A
    out = {r["day"]: r for r in
           A.q_events_anomaly(spark, str(d)).collect()}
    assert all(r["med"] == 2 and r["mad"] == 0 for r in out.values())
    flags = {day: r["is_anomaly"] for day, r in out.items()}
    days = sorted(flags)
    assert [flags[d_] for d_ in days] == [True, False, False, True]


def test_collocations_ratio_is_exact_integer(spark, duck):
    # recompute one row's ratio from its own counts in exact Python ints
    from safeascent_spark.operators import text as T
    rows = T.q_text_collocations(spark, SF_ORACLE).collect()
    assert len(rows) == T.PMI_TOP_K
    n_total = duck.execute(
        "SELECT count(*) FROM (SELECT unnest(list_filter("
        "string_split(text, ' '), x -> x <> '')) FROM documents)"
    ).fetchone()[0]
    for r in rows[:10]:
        expect = (r["c_xy"] * n_total * T.PMI_SCALE) // (r["c_x"] * r["c_y"])
        assert r["pmi_ppm"] == expect
    # the cut is a strict total order: no pmi/w1/w2 duplicates at the edge
    keys = [(r["pmi_ppm"], r["w1"], r["w2"]) for r in rows]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1], t[2]))


def test_pagerank_is_past_its_fixpoint(spark, monkeypatch):
    # The route->location->parent->parent->root DAG has depth <= 4;
    # iteration 5 is the fixpoint, so NITER=6 must reproduce NITER=5.
    from safeascent_spark.operators import graph as G
    out5 = {r["vid"]: r["rank_ppm"]
            for r in G.q_graph_pagerank(spark, SF_SMOKE).collect()}
    monkeypatch.setattr(G, "PR_NITER", 6)
    out6 = {r["vid"]: r["rank_ppm"]
            for r in G.q_graph_pagerank(spark, SF_SMOKE).collect()}
    assert out5 == out6


def test_pagerank_root_area_dominates(spark):
    from safeascent_spark.operators import graph as G
    rows = G.q_graph_pagerank(spark, SF_SMOKE).collect()
    # the hierarchy root (location 0) absorbs every parent chain
    assert rows[0]["kind"] == "location" and rows[0]["vid"] == 0
    # every rank carries at least the damped base mass
    assert all(r["rank_ppm"] >= G.PR_BASE for r in rows)


def test_rolling_7d_window_sums_trailing_days_only(spark, tmp_path):
    # counts on days [0, 3, 6, 10]: day 6's trailing window covers days
    # 0..6 (all three), day 10's covers 4..10 (days 6 and 10 only).
    base = pd.Timestamp("2024-01-01")
    rows = []
    eid = 0
    for day, n in [(0, 2), (3, 1), (6, 4), (10, 3)]:
        for _ in range(n):
            eid += 1
            rows.append((eid, base + pd.Timedelta(days=day, seconds=eid),
                         1, "view", 1.5, "{}"))
    df = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                     "event_type", "value", "props"])
    d = tmp_path / "rollev"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    from safeascent_spark.operators import analytics as A
    out = {r["day"] - 19723: r for r in
           A.q_events_rolling_7d(spark, str(d)).collect()}
    assert out[0]["n_7d"] == 2
    assert out[3]["n_7d"] == 3
    assert out[6]["n_7d"] == 7
    assert out[10]["n_7d"] == 7
    # floor(1.5 * 1000) = 1500 per event, summed in exact int64
    assert out[6]["v_milli_7d"] == 7 * 1500


def test_chi2_contributions_sum_and_marginals(spark, duck):
    from safeascent_spark.operators import text as T
    rows = T.q_text_chi2_lang_source(spark, SF_ORACLE).collect()
    n = sum(r["o"] for r in rows)
    n_docs = duck.execute("SELECT count(*) FROM documents").fetchone()[0]
    assert n == n_docs
    # expected_ppm sums back to ~n per row-marginal (floor rounding only)
    for r in rows:
        assert r["chi2_ppm"] >= 0
        assert r["expected_ppm"] > 0


def test_length_histogram_is_equi_depth_and_ordered(spark):
    from safeascent_spark.operators import text as T
    rows = T.q_text_length_histogram(spark, SF_ORACLE).collect()
    assert [r["bucket"] for r in rows] == list(range(1, 11))
    counts = [r["n_docs"] for r in rows]
    assert max(counts) - min(counts) <= 1       # equal population +-1
    for a, b in zip(rows, rows[1:]):            # buckets are ordered spans
        assert a["max_chars"] <= b["min_chars"]


@pytest.fixture(scope="module")
def search_docs_dir(tmp_path_factory):
    rows = [
        # all three AND terms; phrase absent
        (1, "merge the filter then sort the merge output", "en"),
        # phrase at position 0 and again at 5
        (2, "slow hash batch then a slow hash batch again", "en"),
        # two of three terms only -> excluded from AND
        (3, "merge and sort without the third term", "en"),
        # phrase words present but never consecutive
        (4, "slow then hash then batch", "en"),
        (5, "", "en"),
    ]
    df = pd.DataFrame(
        [{"doc_id": i, "text": t, "lang": l, "source": "syn",
          "n_chars": len(t)} for i, t, l in rows])
    d = tmp_path_factory.mktemp("searchdocs")
    df.to_parquet(d / "documents.parquet")
    return str(d)


def test_search_and_requires_every_term(spark, search_docs_dir):
    from safeascent_spark.operators import text as T
    out = {r["doc_id"]: r for r in
           T.q_text_search_and(spark, search_docs_dir).collect()}
    assert set(out) == {1}
    assert out[1]["tf_merge"] == 2
    assert out[1]["tf_filter"] == 1
    assert out[1]["tf_sort"] == 1


def test_search_phrase_is_position_exact(spark, search_docs_dir):
    from safeascent_spark.operators import text as T
    out = {r["doc_id"]: r for r in
           T.q_text_search_phrase(spark, search_docs_dir).collect()}
    # only doc 2 has the consecutive phrase; doc 4's scattered words don't
    assert set(out) == {2}
    assert out[2]["n_hits"] == 2
    assert out[2]["first_pos"] == 0


def test_search_and_plan_filters_postings_before_the_shuffle(spark):
    import re
    from safeascent_spark.operators import text as T
    from tests.test_plans import plan_of
    plan = plan_of(T.q_text_search_and(spark, SF_SMOKE))
    # the literal term-set filter must exist (postings are cut to the
    # query terms), and the per-doc aggregation must be map-side combined
    # (partial_sum below the exchange) so the shuffle carries only
    # matching postings' partial counts
    assert re.search(r"word#\d+ IN \(", plan), plan[:3000]
    assert "partial_sum" in plan
    # exactly one hash exchange: the groupBy(doc_id) aggregation
    hash_ex = re.findall(r"Arguments: hashpartitioning\((\w+)#", plan)
    assert hash_ex == ["doc_id"], plan[:2000]


def test_transitions_probabilities_are_exact_row_shares(spark, tmp_path):
    # user 1: a -> b -> b -> c ; user 2: a -> c.  Transitions:
    # (a,b)=1 (a,c)=1 (b,b)=1 (b,c)=1 -> p_ppm(a,b) = 500000 exactly.
    base = pd.Timestamp("2024-01-01")
    rows = [(1, 0, "a"), (1, 1, "b"), (1, 2, "b"), (1, 3, "c"),
            (2, 0, "a"), (2, 1, "c")]
    df = pd.DataFrame(
        [{"event_id": i, "ts": base + pd.Timedelta(seconds=s),
          "user_id": u, "event_type": t, "value": 0.0, "props": "{}"}
         for i, (u, s, t) in enumerate(rows)])
    d = tmp_path / "trev"
    d.mkdir()
    df.to_parquet(d / "events.parquet")
    from safeascent_spark.operators import analytics as A
    out = {(r["prev_type"], r["next_type"]): r for r in
           A.q_events_transitions(spark, str(d)).collect()}
    assert set(out) == {("a", "b"), ("a", "c"), ("b", "b"), ("b", "c")}
    assert out[("a", "b")]["p_ppm"] == 500_000
    assert out[("b", "c")]["p_ppm"] == 500_000
    # transitions never cross users: (c, a) would require user1 -> user2
    assert ("c", "a") not in out


def test_density_grid_smoothing_sums_neighbors(spark):
    from safeascent_spark.operators import analytics as A
    rows = A.q_accidents_density_grid(spark, SF_SMOKE).collect()
    cells = {(r["cx"], r["cy"]): r["n"] for r in rows}
    for r in rows:
        want = sum(cells.get((r["cx"] + dx, r["cy"] + dy), 0)
                   for dx in (-1, 0, 1) for dy in (-1, 0, 1))
        assert r["n_smooth"] == want
        assert r["n_smooth"] >= r["n"] > 0
