"""Per-kernel oracle-testable queries over the derived domain tables.

Each function pair (``q_*`` DataFrame builder, ``sql_*`` DuckDB string)
exercises one kernel from SURVEY.md §2.7 end-to-end on real table data, so
the driver's hash-compare validates the kernel math, the domain derivation,
and the Spark plan together.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import config as C
from .. import domain
from .. import kernels as K
from .. import sqlgen as S

_DOMAIN_WITH = (
    "WITH " + ",\n".join(x.strip() for x in (
        domain.ROUTES_CTE, domain.LOCATIONS_CTE, domain.ACCIDENTS_CTE))
)


# --- K1: haversine over location x accident pairs ---------------------------

def q_haversine(spark: SparkSession, sf_dir: str) -> DataFrame:
    loc = domain.locations_df(spark, sf_dir)
    acc = domain.accidents_df(spark, sf_dir).select(
        "accident_id", F.col("latitude").alias("a_lat"),
        F.col("longitude").alias("a_lon"))
    d = K.haversine_km("latitude", "longitude", "a_lat", "a_lon")
    return (domain.fan_out(loc).crossJoin(F.broadcast(acc))
               .select("location_id", "accident_id",
                       F.round(d, 6).alias("distance_km")))


def sql_haversine() -> str:
    d = S.haversine_km("l.latitude", "l.longitude", "a.latitude", "a.longitude")
    return f"""{_DOMAIN_WITH}
SELECT l.location_id, a.accident_id, round({d}, 6) AS distance_km
FROM locations l CROSS JOIN accidents a"""


# --- K2: spatial weights (route-type bandwidths) ----------------------------

def q_spatial_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = domain.routes_df(spark, sf_dir).join(
        F.broadcast(domain.locations_df(spark, sf_dir)), "location_id")
    acc = domain.accidents_df(spark, sf_dir).select(
        "accident_id", F.col("latitude").alias("a_lat"),
        F.col("longitude").alias("a_lon"))
    pairs = domain.fan_out(r).crossJoin(F.broadcast(acc))
    d = K.haversine_km("latitude", "longitude", "a_lat", "a_lon")
    return pairs.select("route_id", "accident_id",
                        F.round(K.spatial_weight(d, "route_type"), 9)
                         .alias("spatial_weight"))


def sql_spatial_weight() -> str:
    d = S.haversine_km("l.latitude", "l.longitude", "a.latitude", "a.longitude")
    w = S.spatial_weight(d, "r.route_type")
    return f"""{_DOMAIN_WITH}
SELECT r.route_id, a.accident_id, round({w}, 9) AS spatial_weight
FROM routes r JOIN locations l ON r.location_id = l.location_id
CROSS JOIN accidents a"""


# --- K3/K4: temporal weights -------------------------------------------------

def q_temporal_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = domain.routes_df(spark, sf_dir)
    acc = domain.accidents_df(spark, sf_dir).select("accident_id", "accident_date")
    pairs = domain.fan_out(r).crossJoin(F.broadcast(acc))
    pd_col = F.to_date(F.lit(domain.PRED_DATE))
    w = K.temporal_weight(pd_col, "accident_date", "route_type")
    return pairs.select("route_id", "accident_id",
                        F.round(w, 9).alias("temporal_weight"))


def sql_temporal_weight() -> str:
    w = S.temporal_weight(f"DATE '{domain.PRED_DATE}'", "a.accident_date",
                          "r.route_type")
    return f"""{_DOMAIN_WITH}
SELECT r.route_id, a.accident_id, round({w}, 9) AS temporal_weight
FROM routes r CROSS JOIN accidents a"""


# --- K4: season bucketing over orders dates ---------------------------------

def q_season_of_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = domain.load_table(spark, sf_dir, "orders")
    season = K.season_of(F.col("o_orderdate").cast("date"))
    return (o.groupBy(season.alias("season"))
             .agg(F.count(F.lit(1)).alias("n_orders"),
                  F.round(F.sum("o_totalprice"), 2).alias("total_price"))
             .orderBy("season"))


def sql_season_of_orders() -> str:
    season = S.season_of("CAST(o_orderdate AS DATE)")
    return f"""
SELECT {season} AS season, count(*) AS n_orders,
       round(sum(o_totalprice), 2) AS total_price
FROM orders GROUP BY 1 ORDER BY season"""


# --- K10: route-type matrix weights ------------------------------------------

def q_route_type_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = domain.routes_df(spark, sf_dir)
    acc = domain.accidents_df(spark, sf_dir).select(
        "accident_id", F.col("route_type").alias("a_type"))
    pairs = domain.fan_out(r).crossJoin(F.broadcast(acc))
    return pairs.select("route_id", "accident_id",
                        K.route_type_weight("route_type", "a_type")
                         .alias("rt_weight"))


def sql_route_type_weight() -> str:
    w = S.route_type_weight("r.route_type", "a.route_type")
    return f"""{_DOMAIN_WITH}
SELECT r.route_id, a.accident_id, {w} AS rt_weight
FROM routes r CROSS JOIN accidents a"""


# --- K11/K12: severity weight + normalization --------------------------------

def q_severity(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = domain.accidents_df(spark, sf_dir)
    return a.select(
        "accident_id",
        K.severity_weight("severity").alias("severity_weight"),
        K.normalize_severity("severity_raw").alias("severity_normalized"),
    ).orderBy("accident_id")


def sql_severity() -> str:
    w = S.severity_weight("severity")
    norm = """(CASE
      WHEN severity_raw IS NULL OR trim(severity_raw) = '' THEN 'unknown'
      WHEN regexp_matches(lower(trim(severity_raw)), 'fatal|death|fatality|died|killed') THEN 'fatal'
      WHEN regexp_matches(lower(trim(severity_raw)), 'serious|severe|critical|injured|injury|hospitalized') THEN 'serious'
      WHEN regexp_matches(lower(trim(severity_raw)), 'minor|slight|light|uninjured|no injury') THEN 'minor'
      ELSE 'unknown' END)"""
    return f"""{_DOMAIN_WITH}
SELECT accident_id, {w} AS severity_weight, {norm} AS severity_normalized
FROM accidents ORDER BY accident_id"""


# --- K13: elevation weight ----------------------------------------------------

def q_elevation_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = domain.routes_df(spark, sf_dir).join(
        F.broadcast(domain.locations_df(spark, sf_dir)), "location_id")
    acc = domain.accidents_df(spark, sf_dir).select(
        "accident_id", F.col("elevation_m").alias("a_elev"))
    pairs = domain.fan_out(r).crossJoin(F.broadcast(acc))
    w = K.elevation_weight("elevation_m", "a_elev", "route_type")
    return pairs.select("route_id", "accident_id",
                        F.round(w, 9).alias("elevation_weight"))


def sql_elevation_weight() -> str:
    w = S.elevation_weight("l.elevation_m", "a.elevation_m", "r.route_type")
    return f"""{_DOMAIN_WITH}
SELECT r.route_id, a.accident_id, round({w}, 9) AS elevation_weight
FROM routes r JOIN locations l ON r.location_id = l.location_id
CROSS JOIN accidents a"""


# --- K14/K15: grade parse + weight --------------------------------------------

def q_grade_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = domain.routes_df(spark, sf_dir)
    acc = domain.accidents_df(spark, sf_dir).select(
        "accident_id", F.col("grade").alias("a_grade"))
    pairs = domain.fan_out(r).crossJoin(F.broadcast(acc))
    r2 = r.select("route_id", K.parse_grade("grade").alias("r_gdiff"))
    acc2 = acc.select("accident_id", K.parse_grade("a_grade").alias("a_gdiff"))
    pairs = domain.fan_out(r2).crossJoin(F.broadcast(acc2))
    return pairs.select(
        "route_id", "accident_id",
        F.round("r_gdiff", 6).alias("route_difficulty"),
        F.round(K.grade_weight_from_difficulty("r_gdiff", "a_gdiff"), 9)
         .alias("grade_weight"))


def sql_grade_weight() -> str:
    w = S.grade_weight_from_difficulty(S.parse_grade("r.grade"),
                                       S.parse_grade("a.grade"))
    return f"""{_DOMAIN_WITH}
SELECT r.route_id, a.accident_id,
       round({S.parse_grade('r.grade')}, 6) AS route_difficulty,
       round({w}, 9) AS grade_weight
FROM routes r CROSS JOIN accidents a"""


# --- K16: route-type inference from text --------------------------------------

def q_route_type_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = domain.accidents_df(spark, sf_dir)
    return a.select(
        "accident_id", "tags",
        K.infer_route_type("tags", F.lit(None), F.lit(None)).alias("inferred_type"),
    ).orderBy("accident_id")


def sql_route_type_inference() -> str:
    # Mirror of kernels.infer_route_type over the derived tags domain.
    blob = "lower(coalesce(tags, ''))"
    return f"""{_DOMAIN_WITH}
SELECT accident_id, tags,
  (CASE
     WHEN {blob} LIKE '%ice climb%' OR {blob} LIKE '%ice%' THEN 'ice'
     WHEN {blob} LIKE '%mixed%' THEN 'mixed'
     WHEN {blob} LIKE '%alpine%' OR {blob} LIKE '%avalanche%'
          OR {blob} LIKE '%rockfall%' OR {blob} LIKE '%backcountry%'
          OR {blob} LIKE '%ski%' THEN 'alpine'
     WHEN {blob} LIKE '%boulder%' THEN 'boulder'
     WHEN {blob} LIKE '%sport%' OR regexp_matches({blob}, '5\\.1[1-5]') THEN 'sport'
     WHEN {blob} LIKE '%aid climb%' THEN 'aid'
     WHEN {blob} LIKE '%trad%' OR {blob} LIKE '%rappel%' OR {blob} LIKE '%roped%'
          OR regexp_matches({blob}, '5\\.([0-9]|10)\\b') THEN 'trad'
     ELSE 'default' END) AS inferred_type
FROM accidents ORDER BY accident_id"""


# --- K16b: confidence-scored route-type inference -----------------------------

# Accident activity / accident-type free text exercising every confidence
# tier of the reference cascade (route_type_mapper.py:168-241).  The
# accidents table itself carries only `tags`; these are query-local derived
# dimensions keyed on accident_id, exactly like the tags domain.
ACTIVITY_BY_MOD = [
    "Trad Climber", "Backcountry Tourer", "Hiker",
    "Mountaineering Guide", None,
]
ACCIDENT_TYPE_BY_MOD = [
    "ice_climbing_fall", "avalanche", "lowering_error",
    "unknown", None, "rockfall", "stranded",
]


def q_route_type_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K16 confidence-scored variant: inferred type + tiered confidence."""
    a = domain.accidents_df(spark, sf_dir).select(
        "accident_id", "tags",
        domain._mod_case("accident_id", ACCIDENT_TYPE_BY_MOD, scale=5)
              .alias("accident_type"),
        domain._mod_case("accident_id", ACTIVITY_BY_MOD).alias("activity"))
    return a.select(
        "accident_id", "accident_type", "activity",
        K.infer_route_type("tags", "accident_type", "activity")
         .alias("inferred_type"),
        K.route_type_confidence("tags", "accident_type", "activity")
         .alias("type_confidence"),
    ).orderBy("accident_id")


def sql_route_type_confidence() -> str:
    t = "lower(coalesce(tags, ''))"
    at = "lower(coalesce(accident_type, ''))"
    act = "lower(coalesce(activity, ''))"
    blob = f"concat_ws(' ', {t}, {at}, {act})"
    infer = f"""(CASE
     WHEN {blob} LIKE '%ice climb%' OR {t} LIKE '%ice%' THEN 'ice'
     WHEN {blob} LIKE '%mixed%' THEN 'mixed'
     WHEN {blob} LIKE '%alpine%' OR {blob} LIKE '%avalanche%'
          OR {blob} LIKE '%rockfall%' OR {blob} LIKE '%backcountry%'
          OR {blob} LIKE '%ski%' THEN 'alpine'
     WHEN {blob} LIKE '%boulder%' THEN 'boulder'
     WHEN {blob} LIKE '%sport%' OR regexp_matches({t}, '5\\.1[1-5]') THEN 'sport'
     WHEN {blob} LIKE '%aid climb%' THEN 'aid'
     WHEN {blob} LIKE '%trad%' OR {blob} LIKE '%rappel%' OR {blob} LIKE '%roped%'
          OR regexp_matches({t}, '5\\.([0-9]|10)\\b') THEN 'trad'
     ELSE 'default' END)"""
    conf = f"""CAST((CASE
     WHEN {t} LIKE '%ice climbing%' OR {t} LIKE '%sport climbing%'
          OR {t} LIKE '%trad%' OR {t} LIKE '%alpine%'
          OR {t} LIKE '%mountaineering%' OR {t} LIKE '%mixed climbing%'
          OR {t} LIKE '%aid climbing%' OR {t} LIKE '%boulder%' THEN 0.95
     WHEN {at} LIKE '%ice%' THEN 0.85
     WHEN {at} LIKE '%avalanche%' THEN 0.80
     WHEN {t} LIKE '%grade:%' OR {t} LIKE '%roped%' THEN 0.60
     WHEN {at} <> '' AND {at} <> 'unknown' THEN 0.50
     WHEN {act} LIKE '%backcountry%' OR {act} LIKE '%mountaineer%' THEN 0.60
     WHEN {act} LIKE '%climber%' OR {act} LIKE '%climbing%' THEN 0.40
     ELSE 0.20 END) AS DOUBLE)"""
    return f"""{_DOMAIN_WITH}
, acc2 AS (
  SELECT accident_id, tags,
         {domain._sql_mod_case('accident_id', ACCIDENT_TYPE_BY_MOD, scale=5)} AS accident_type,
         {domain._sql_mod_case('accident_id', ACTIVITY_BY_MOD)} AS activity
  FROM accidents
)
SELECT accident_id, accident_type, activity,
       {infer} AS inferred_type,
       {conf} AS type_confidence
FROM acc2 ORDER BY accident_id"""


# --- K19/K20: bearing + impact score ------------------------------------------

def q_bearing_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    loc = domain.locations_df(spark, sf_dir)
    acc = domain.accidents_df(spark, sf_dir).select(
        "accident_id", F.col("latitude").alias("a_lat"),
        F.col("longitude").alias("a_lon"))
    pairs = domain.fan_out(loc).crossJoin(F.broadcast(acc))
    d = K.haversine_km("latitude", "longitude", "a_lat", "a_lon")
    return pairs.select(
        "location_id", "accident_id",
        F.round(K.bearing_deg("latitude", "longitude", "a_lat", "a_lon"), 6)
         .alias("bearing_deg"),
        F.round(K.impact_score(d), 6).alias("impact_score"))


def sql_bearing_impact() -> str:
    d = S.haversine_km("l.latitude", "l.longitude", "a.latitude", "a.longitude")
    b = S.bearing_deg("l.latitude", "l.longitude", "a.latitude", "a.longitude")
    return f"""{_DOMAIN_WITH}
SELECT l.location_id, a.accident_id,
       round({b}, 6) AS bearing_deg,
       round(100.0 * exp(-({d}) / 10.0), 6) AS impact_score
FROM locations l CROSS JOIN accidents a"""
