"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship route-risk scoring query at sf0.001;
``queries()`` / ``oracle_sql()`` expose every implemented operator from
SURVEY.md §2 for the driver's DuckDB hash-compare at sf0.01.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from safeascent_spark.operators import kernel_queries as KQ
from safeascent_spark.operators import scoring
from safeascent_spark.operators import weather as W

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: per-route risk scores (J3 cross join + K1-K15 + A1)."""
    return scoring.risk_scores_df(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # kernels (SURVEY §2.7)
        "k1_haversine": KQ.q_haversine,
        "k2_spatial_weight": KQ.q_spatial_weight,
        "k3_temporal_weight": KQ.q_temporal_weight,
        "k4_season_of_orders": KQ.q_season_of_orders,
        "k10_route_type_weight": KQ.q_route_type_weight,
        "k11_severity": KQ.q_severity,
        "k13_elevation_weight": KQ.q_elevation_weight,
        "k14_grade_weight": KQ.q_grade_weight,
        "k16_route_type_inference": KQ.q_route_type_inference,
        "k19_bearing_impact": KQ.q_bearing_impact,
        # weather pipeline (SURVEY §2.4/§2.7: S3/J2, A10, K5-K8)
        "w_weather_window": W.q_weather_window,
        "w_freeze_thaw": W.q_freeze_thaw,
        "w_similarity": W.q_weather_similarity,
        "w_extreme_multiplier": W.q_extreme_multiplier,
        # flagship scoring (SURVEY §2.8: J3, K9, A1, W1, K18)
        "risk_scores": lambda spark, sf: scoring.risk_scores_df(spark, sf),
        "top_contributors": lambda spark, sf: scoring.top_contributors_df(spark, sf),
    }


def oracle_sql() -> dict[str, str]:
    return {
        "k1_haversine": KQ.sql_haversine(),
        "k2_spatial_weight": KQ.sql_spatial_weight(),
        "k3_temporal_weight": KQ.sql_temporal_weight(),
        "k4_season_of_orders": KQ.sql_season_of_orders(),
        "k10_route_type_weight": KQ.sql_route_type_weight(),
        "k11_severity": KQ.sql_severity(),
        "k13_elevation_weight": KQ.sql_elevation_weight(),
        "k14_grade_weight": KQ.sql_grade_weight(),
        "k16_route_type_inference": KQ.sql_route_type_inference(),
        "k19_bearing_impact": KQ.sql_bearing_impact(),
        "w_weather_window": W.sql_weather_window(),
        "w_freeze_thaw": W.sql_freeze_thaw(),
        "w_similarity": W.sql_weather_similarity(),
        "w_extreme_multiplier": W.sql_extreme_multiplier(),
        "risk_scores": scoring.risk_scores_sql(),
        "top_contributors": scoring.top_contributors_sql(),
    }
