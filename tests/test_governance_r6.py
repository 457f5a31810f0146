"""Round-6 wave-11 semantics: data-governance profilers and
vector-index eval (label-noise audit, recall-vs-probe-radius curve)."""

from __future__ import annotations

import math

from safeascent_spark import domain
from safeascent_spark.operators import monitor as MON
from safeascent_spark.operators import similarity as SIM
from tests.conftest import SF_ORACLE, SF_SMOKE
from tests.test_plans import n_ops, plan_of


def test_column_profile_matches_bruteforce(spark):
    rows = {r.col_name: r for r in
            MON.q_dq_column_profile(spark, SF_ORACLE).collect()}
    orders = domain.load_table(spark, SF_ORACLE, "orders").collect()
    assert set(rows) == {n for n, _ in MON._PROFILE_SPEC}
    r = rows["o_orderkey"]
    keys = [x.o_orderkey for x in orders]
    assert r.n_rows == len(orders) and r.n_null == 0
    assert r.n_distinct == len(set(keys))
    assert r.min_val == str(min(keys)) and r.max_val == str(max(keys))
    # numeric (not lexicographic) min/max on the derived cents column
    c = rows["o_totalprice_c"]
    cents = [math.floor(x.o_totalprice * 100) for x in orders]
    assert c.min_val == str(min(cents)) and c.max_val == str(max(cents))
    s = rows["o_orderstatus"]
    assert s.n_distinct == len({x.o_orderstatus for x in orders})


def test_column_profile_is_one_pass(spark):
    plan = plan_of(MON.q_dq_column_profile(spark, SF_SMOKE))
    assert n_ops(plan, "Scan parquet") == 1   # NOT five per-column scans
    assert "Expand" in plan                   # the multi-distinct strategy


def test_k_anonymity_releases_no_small_group(spark):
    rows = MON.q_dq_k_anonymity(spark, SF_ORACLE).collect()
    star = [r for r in rows if r.lang == "*"]
    released = [r for r in rows if r.lang != "*"]
    assert len(star) == 1 and released
    assert all(r.n_docs >= MON.K_ANON for r in released)
    assert all(r.n_suppressed_groups == 0 for r in released)
    assert star[0].n_suppressed_groups > 0
    n_docs = domain.load_table(spark, SF_ORACLE, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs


def test_label_noise_matches_bruteforce(spark):
    rows = {r.vec_id: r for r in
            SIM.q_knn_label_noise(spark, SF_ORACLE).collect()}
    assert set(rows) == set(range(SIM.NOISE_PROBES))
    vecs = {r.vec_id: (r.label,
                       [round(max(-1.0, min(1.0, x)) * 127)
                        for x in r.vec])
            for r in SIM.embeddings_df(spark, SF_ORACLE).collect()}
    norms = {v: math.sqrt(sum(x * x for x in q))
             for v, (_, q) in vecs.items()}
    for probe in (0, 7, 23):
        own_label, q = vecs[probe]
        scored = sorted(
            ((sum(a * b for a, b in zip(q, c)) / (norms[probe] * norms[v]),
              v) for v, (_, c) in vecs.items() if v != probe),
            key=lambda t: (-t[0], t[1]))
        top = [v for _, v in scored[:SIM.NOISE_K]]
        disagree = sum(1 for v in top if vecs[v][0] != own_label)
        r = rows[probe]
        assert (r.n_disagree, r.label) == (disagree, own_label)
        assert r.noise_ppm == disagree * 1_000_000 // SIM.NOISE_K
        assert r.flagged == (r.noise_ppm >= SIM.NOISE_FLAG_PPM)


def test_recall_curve_is_monotone_and_bounded(spark):
    rows = SIM.q_ann_recall_curve(spark, SF_ORACLE).collect()
    assert [r.radius for r in rows] == list(SIM.RC_RADII)
    max_hits = SIM.N_QUERIES * SIM.RC_K
    prev_hits, prev_cand = -1, -1
    for r in rows:
        assert 0 <= r.n_hits <= max_hits
        assert r.recall_ppm == r.n_hits * 1_000_000 // max_hits
        # widening the probe radius can only add candidates and hits
        assert r.n_cand_pairs >= prev_cand and r.n_hits >= prev_hits
        prev_hits, prev_cand = r.n_hits, r.n_cand_pairs
    # radius 2 of a 6-bit code admits 22/64 of cells on average —
    # candidates must be a strict subset of the full corpus
    n_corpus = SIM.embeddings_df(spark, SF_ORACLE).count()
    assert rows[-1].n_cand_pairs < SIM.N_QUERIES * (n_corpus - 1)
