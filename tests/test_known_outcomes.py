"""Semantic validation in the style of the reference's
test_known_outcomes_validation.py: relative-ordering oracles that must hold
regardless of exact constants."""

from __future__ import annotations

from pyspark.sql import functions as F

from safeascent_spark import config as C
from safeascent_spark import domain
from safeascent_spark import kernels as K
from tests.conftest import SF_SMOKE


def _score_point(spark, sf_dir, lat, lon, rtype="alpine"):
    """Weather-neutral influence sum for an ad-hoc point (the /predict shape)."""
    a = domain.accidents_df(spark, sf_dir)
    dist = K.haversine_km(F.lit(lat), F.lit(lon), "latitude", "longitude")
    infl = (K.spatial_weight(dist, F.lit(rtype))
            * K.temporal_weight(F.to_date(F.lit(domain.PRED_DATE)),
                                "accident_date", F.lit(rtype))
            * K.severity_weight("severity")
            * K.weather_factor(F.lit(C.MISSING_WEATHER_NEUTRAL)))
    return a.agg(F.sum(infl)).collect()[0][0]


def test_accident_cluster_outranks_remote_point(spark):
    """A point inside the accident grid must outrank a point far outside it
    (the Longs-Peak-vs-Florida analog)."""
    acc = domain.accidents_df(spark, SF_SMOKE).agg(
        F.avg("latitude"), F.avg("longitude")).collect()[0]
    near = _score_point(spark, SF_SMOKE, acc[0], acc[1])
    far = _score_point(spark, SF_SMOKE, 27.0, -81.0)  # "Florida"
    assert near > far * 2


def test_wider_bandwidth_scores_higher_at_distance(spark):
    """Alpine (75km bandwidth) must accumulate more remote influence than
    boulder (20km) at the same point (Rainier-vs-Smith-Rock analog)."""
    alpine = _score_point(spark, SF_SMOKE, 33.0, -120.0, "alpine")
    boulder = _score_point(spark, SF_SMOKE, 33.0, -120.0, "boulder")
    assert alpine >= boulder


def test_same_request_same_result(spark):
    """Determinism: identical request -> identical scores (the reference's
    consistency integration test)."""
    from safeascent_spark.operators import scoring
    a = scoring.risk_scores_df(spark, SF_SMOKE).collect()
    b = scoring.risk_scores_df(spark, SF_SMOKE).collect()
    assert a == b


def test_seasonal_boost_orders_same_season_higher(spark):
    """An accident in the same season as the prediction date must carry a
    strictly higher temporal weight than one half a year offset, all else
    equal (winter-vs-summer analog)."""
    same = spark.range(1).select(K.temporal_weight(
        F.to_date(F.lit("2024-06-15")), F.to_date(F.lit("2023-06-15")),
        F.lit("trad")).alias("w")).collect()[0].w
    cross = spark.range(1).select(K.temporal_weight(
        F.to_date(F.lit("2024-06-15")), F.to_date(F.lit("2023-12-15")),
        F.lit("trad")).alias("w")).collect()[0].w
    assert same > cross
