"""Pipeline-level tests: factorized-vs-pair equivalence (the reference's
loop-vs-vectorized check), scoring invariants, weather edge cases."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from safeascent_spark import config as C
from safeascent_spark.operators import batch as B
from safeascent_spark.operators import scoring
from safeascent_spark.operators import weather as W
from tests.conftest import SF_SMOKE


def test_batch_pair_vs_classed_equivalence(spark):
    """Same algebra, different physical plan -> risk scores must agree.

    Mirrors benchmark_vectorized_algorithm.py:233-238 (tolerance 0.1 risk
    points there; we assert far tighter since only summation order differs).
    """
    pair = {r.route_id: r.risk_score
            for r in B.batch_scores_df(spark, SF_SMOKE).collect()}
    classed = {r.route_id: r.risk_score
               for r in B.batch_scores_classed_df(spark, SF_SMOKE).collect()}
    assert set(pair) == set(classed)
    for rid, risk in pair.items():
        assert classed[rid] == pytest.approx(risk, abs=1e-4), rid


def test_risk_scores_bounded(spark):
    rows = scoring.risk_scores_df(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 <= r.risk_score <= 100.0
        assert r.color_code in {"green", "yellow", "orange", "red"}


def test_top_contributors_sorted_and_capped(spark):
    rows = scoring.top_contributors_df(spark, SF_SMOKE).collect()
    by_route: dict[int, list] = {}
    for r in rows:
        by_route.setdefault(r.route_id, []).append(r)
    for rid, items in by_route.items():
        assert len(items) <= C.MAX_CONTRIBUTING_ACCIDENTS
        infl = [i.influence for i in sorted(items, key=lambda x: x.rank)]
        assert infl == sorted(infl, reverse=True), rid
        assert all(i.influence > 0 for i in items)


def test_weather_similarity_bounds_and_diagonal(spark):
    sim = W.weather_similarity_df(spark, SF_SMOKE, with_extreme=False) \
           .collect()
    assert len(sim) > 0
    diag = [r for r in sim if r.cur_bucket == r.acc_bucket]
    for r in sim:
        assert 0.0 <= r.weather_weight <= 1.0001
    # a valid window compared with itself: every correlation is the
    # both-constant-or-identical case -> all factor scores 1 -> similarity 1
    valid_diag = [r for r in diag if r.weather_weight > 0]
    assert valid_diag, "expected at least one valid self-pair"
    for r in valid_diag:
        assert r.weather_weight == pytest.approx(1.0, abs=1e-9)


def test_invalid_windows_are_zero_not_neutral(spark):
    """<5-day windows must score 0.0 (weather_similarity.py:124-126)."""
    prof = {r.wbucket: r.n_days
            for r in W.bucket_profile_df(spark, SF_SMOKE).collect()}
    sim = W.weather_similarity_df(spark, SF_SMOKE, with_extreme=False) \
           .collect()
    for r in sim:
        if (prof.get(r.cur_bucket, 0) < C.MIN_WEATHER_DAYS_REQUIRED
                or prof.get(r.acc_bucket, 0) < C.MIN_WEATHER_DAYS_REQUIRED):
            assert r.weather_weight == 0.0


def test_pandas_udf_similarity_matches_closed_form(spark):
    """Independent NumPy (applyInPandas) implementation must agree with the
    Column-algebra similarity — a second loop-vs-vectorized style check."""
    from safeascent_spark.operators import weather_udf
    algebra = {(r.cur_bucket, r.acc_bucket): r.weather_weight
               for r in W.weather_similarity_df(
                   spark, SF_SMOKE, with_extreme=False).collect()}
    udf = {(r.cur_bucket, r.acc_bucket): r.weather_weight
           for r in weather_udf.weather_similarity_udf_df(
               spark, SF_SMOKE).collect()}
    assert set(algebra) == set(udf)
    for k, v in algebra.items():
        assert udf[k] == pytest.approx(v, abs=1e-9), k


def test_incremental_accident_update_matches_full_recompute(spark):
    """Delta-scoring equivalence: sums over half the accidents + the folded
    delta for the other half must reproduce the full recompute (1e-9 on
    risk — float re-association only — and exact contributor counts)."""
    from pyspark.sql import functions as F
    from safeascent_spark import domain
    from safeascent_spark.operators import scoring
    sf = SF_SMOKE
    acc = domain.accidents_df(spark, sf)
    old = acc.filter(F.col("accident_id") % 2 == 0)
    new = acc.filter(F.col("accident_id") % 2 == 1)
    prior = scoring.influence_sums_df(spark, sf, accidents=old)
    delta = scoring.influence_sums_df(spark, sf, accidents=new)
    inc = {r.route_id: r for r in
           scoring.apply_incremental_accidents(prior, delta).collect()}
    full = scoring.risk_scores_df(spark, sf).collect()
    assert len(inc) == len(full) > 0
    for r in full:
        i = inc[r.route_id]
        assert abs(i.risk_score - r.risk_score) < 1e-6, (r, i)
        assert i.num_contributing == r.num_contributing
        assert i.color_code == r.color_code


def test_domain_quota_deterministic_under_repartition(spark):
    """The quota sample must be a pure function of the data — identical
    survivors regardless of physical layout (repartition count), and the
    quota bound must hold per source."""
    from safeascent_spark.operators import text as TX
    from safeascent_spark import domain

    base = TX.q_sample_domain_quota(spark, SF_SMOKE).collect()
    per_source: dict[str, int] = {}
    for r in base:
        per_source[r.source] = max(per_source.get(r.source, 0), r.quota_rank)
    assert per_source and all(v <= TX.DOMAIN_QUOTA for v in per_source.values())

    # same answer from a differently-partitioned input
    d = domain.load_table(spark, SF_SMOKE, "documents").repartition(13)
    from pyspark.sql import Window, functions as F
    rk = F.expr(f"pmod(pmod(doc_id, {TX.SAMPLE_MOD}) * {TX.SAMPLE_KNUTH}, "
                f"{TX.SAMPLE_P})")
    w = Window.partitionBy("source").orderBy("rk", "doc_id")
    again = (d.select("doc_id", "source", rk.alias("rk"))
              .withColumn("quota_rank", F.row_number().over(w).cast("bigint"))
              .where(F.col("quota_rank") <= TX.DOMAIN_QUOTA)
              .select("doc_id", "source", "quota_rank").collect())
    assert sorted(map(tuple, base)) == sorted(map(tuple, again))
