"""SQL function surface: the kernel library for pure-SQL consumers.

The reference exposes its kernels only through Python call sites
(``safety_algorithm.py`` / ``mp_routes.py`` helpers); a warehouse user of
this engine instead gets them as Spark SQL scalar functions
(``CREATE TEMPORARY FUNCTION ... RETURNS ... RETURN <expr>``, Spark 4
SQL UDFs) so ``spark.sql`` queries — BI tools, notebooks, dbt models —
can call ``haversine_km(...)`` or ``color_code(...)`` directly with no
Python in the loop.

The function bodies are generated from the SAME ``sqlgen`` fragments the
DuckDB oracles use, so the SQL surface cannot drift from the Column
kernels (``tests/test_sql_functions.py`` pins exact equality).  SQL UDFs
are inlined into the plan at analysis time — they codegen like any
built-in expression, so there is no UDF-boundary cost at 100 TB.

Two fragments need a dialect substitution (documented inline):
DuckDB ``datediff('day', a, b)`` -> Spark ``datediff(b, a)`` and
DuckDB ``fmod`` -> Spark ``pmod`` (equal here: the operand is positive).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import domain
from . import sqlgen as S


def _spark_temporal_weight() -> str:
    # sqlgen emits DuckDB's datediff('day', from, to); Spark's two-arg
    # datediff(end, start) computes the same day delta
    body = S.temporal_weight("current_date", "accident_date", "route_type")
    return body.replace("datediff('day', accident_date, current_date)",
                        "datediff(current_date, accident_date)")


def _spark_bearing_deg() -> str:
    # fmod -> pmod: both reduce into [0, 360) for the positive operand
    # degrees(atan2(...)) + 360 always is
    body = S.bearing_deg("lat1", "lon1", "lat2", "lon2")
    return body.replace("fmod(", "pmod(")


#: name -> (typed parameter list, RETURN expression)
SQL_KERNELS: dict[str, tuple[str, str]] = {
    "haversine_km": (
        "lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE",
        S.haversine_km("lat1", "lon1", "lat2", "lon2")),
    "spatial_weight": (
        "distance_km DOUBLE, route_type STRING",
        S.spatial_weight("distance_km", "route_type")),
    "season_of": ("d DATE", S.season_of("d")),
    "temporal_weight": (
        "current_date DATE, accident_date DATE, route_type STRING",
        _spark_temporal_weight()),
    "route_type_weight": (
        "planning_type STRING, accident_type STRING",
        S.route_type_weight("planning_type", "accident_type")),
    "severity_weight": ("severity STRING", S.severity_weight("severity")),
    "elevation_weight": (
        "route_elev DOUBLE, accident_elev DOUBLE, route_type STRING",
        S.elevation_weight("route_elev", "accident_elev", "route_type")),
    "grade_weight": (
        "route_diff DOUBLE, accident_diff DOUBLE",
        S.grade_weight_from_difficulty("route_diff", "accident_diff")),
    "bearing_deg": (
        "lat1 DOUBLE, lon1 DOUBLE, lat2 DOUBLE, lon2 DOUBLE",
        _spark_bearing_deg()),
    "normalize_risk": ("influence_sum DOUBLE",
                       S.normalize_risk("influence_sum")),
    "color_code": ("risk DOUBLE", S.color_code("risk")),
    "weather_factor": ("weather_weight DOUBLE",
                       S.weather_factor("weather_weight")),
}


def register_sql_kernels(spark: SparkSession) -> list[str]:
    """Register every kernel as a session-scoped SQL scalar function.
    Returns the registered names (idempotent: CREATE OR REPLACE)."""
    for name, (params, body) in SQL_KERNELS.items():
        spark.sql(f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
                  f"RETURNS DOUBLE RETURN {body}"
                  if name not in ("season_of", "color_code") else
                  f"CREATE OR REPLACE TEMPORARY FUNCTION {name}({params}) "
                  f"RETURNS STRING RETURN {body}")
    return list(SQL_KERNELS)


def register_domain_views(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register the derived domain tables as temp views so ``spark.sql``
    consumers can query the engine's data model end-to-end."""
    views = {
        "routes": domain.routes_df(spark, sf_dir),
        "locations": domain.locations_df(spark, sf_dir),
        "accidents": domain.accidents_df(spark, sf_dir),
        "weather_long": domain.weather_long_df(spark, sf_dir),
        "archive_stats": domain.archive_stats_df(spark, sf_dir),
    }
    for name, df in views.items():
        df.createOrReplaceTempView(name)
    return list(views)


def sql_session(spark: SparkSession, sf_dir: str) -> SparkSession:
    """One-call setup for a SQL-first consumer: views + kernel functions."""
    register_domain_views(spark, sf_dir)
    register_sql_kernels(spark)
    return spark
