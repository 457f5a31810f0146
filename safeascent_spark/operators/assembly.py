"""Collection-assembly operators + the multi-date forecast horizon.

* S4: locations-with-routes load — groupBy + collect_list(struct)
  (safety_computation_optimized.py:313-372).  For oracle hashability the
  assembled array is projected as a deterministic sorted string.
* S3: 7-day weather-array assembly — collect_list over a sorted window
  (predict.py:489-573); same string projection.
* K22: daily weather text summary (mp_routes.py:735-761).
* Forecast horizon: location risk for each of the next H days in ONE job —
  the Spark re-expression of the reference's per-date loop
  (safety_computation_optimized.py:954-1019): dates are a small exploded
  dimension crossed into the scoring plan, not a driver-side loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import config as C
from .. import domain
from .. import kernels as K
from .. import sqlgen as S
from . import weather as W

_DOMAIN_WITH = (
    "WITH " + ",\n".join(x.strip() for x in (
        domain.ROUTES_CTE, domain.LOCATIONS_CTE, domain.ACCIDENTS_CTE))
)


# --- S4: locations with routes assembled -------------------------------------

def q_location_routes_assembled(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = domain.routes_df(spark, sf_dir)
    return (r.groupBy("location_id")
             .agg(F.count(F.lit(1)).alias("n_routes"),
                  F.concat_ws(",", F.array_sort(F.collect_list(
                      F.col("route_id").cast("string")))).alias("route_ids"))
             .orderBy("location_id"))


def sql_location_routes_assembled() -> str:
    # NB: array_sort on strings -> the oracle must order lexicographically too
    return f"""{_DOMAIN_WITH}
SELECT location_id, count(*) AS n_routes,
       string_agg(CAST(route_id AS VARCHAR), ','
                  ORDER BY CAST(route_id AS VARCHAR)) AS route_ids
FROM routes GROUP BY location_id ORDER BY location_id"""


# --- S3: 7-day weather arrays assembled --------------------------------------

def q_weather_arrays_assembled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WeatherPattern assembly: per bucket, day-ordered factor arrays
    (projected as strings of rounded values for hash stability)."""
    w = domain.weather_long_df(spark, sf_dir)
    def arr(col):
        return F.concat_ws(",", F.transform(
            F.array_sort(F.collect_list(F.struct("day_offset", col))),
            lambda s: F.format_string("%.4f", F.round(s[col], 4))))
    return (w.groupBy("wbucket")
             .agg(F.count(F.lit(1)).alias("n_days"),
                  arr("temperature").alias("temps"),
                  arr("precipitation").alias("precips"),
                  arr("wind_speed").alias("winds"))
             .orderBy("wbucket"))


def sql_weather_arrays_assembled() -> str:
    def arr(col):
        return (f"string_agg(format('{{:.4f}}', round({col}, 4)), ','"
                f" ORDER BY day_offset)")
    return f"""
WITH {domain.WEATHER_CTE.strip()}
SELECT wbucket, count(*) AS n_days,
       {arr('temperature')} AS temps,
       {arr('precipitation')} AS precips,
       {arr('wind_speed')} AS winds
FROM weather GROUP BY wbucket ORDER BY wbucket"""


# --- K22: daily weather text summary -----------------------------------------

def q_weather_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed descriptors over the daily window (mp_routes.py:735-761)."""
    w = domain.weather_long_df(spark, sf_dir)
    t, p, wd = F.col("temperature"), F.col("precipitation"), F.col("wind_speed")
    temp_txt = (F.when(t < -10, "Very Cold").when(t < 0, "Freezing")
                 .when(t < 10, "Cold").when(t < 20, "Mild")
                 .when(t < 28, "Warm").otherwise("Hot"))
    precip_txt = (F.when(p > 10, "Heavy Precipitation")
                   .when(p > 2, "Precipitation"))
    wind_txt = (F.when(wd > 15, "Very Windy").when(wd > 8, "Windy"))
    summary = F.concat_ws(", ", temp_txt, precip_txt, wind_txt)
    return (w.select("wbucket", "day_offset", summary.alias("summary"))
             .orderBy("wbucket", "day_offset"))


def sql_weather_summary() -> str:
    temp_txt = ("CASE WHEN temperature < -10 THEN 'Very Cold' "
                "WHEN temperature < 0 THEN 'Freezing' "
                "WHEN temperature < 10 THEN 'Cold' "
                "WHEN temperature < 20 THEN 'Mild' "
                "WHEN temperature < 28 THEN 'Warm' ELSE 'Hot' END")
    precip_txt = ("CASE WHEN precipitation > 10 THEN 'Heavy Precipitation' "
                  "WHEN precipitation > 2 THEN 'Precipitation' END")
    wind_txt = ("CASE WHEN wind_speed > 15 THEN 'Very Windy' "
                "WHEN wind_speed > 8 THEN 'Windy' END")
    return f"""
WITH {domain.WEATHER_CTE.strip()}
SELECT wbucket, day_offset,
       concat_ws(', ', {temp_txt}, {precip_txt}, {wind_txt}) AS summary
FROM weather ORDER BY wbucket, day_offset"""


# --- Forecast horizon: per-date location risk in one job ---------------------

HORIZON_DAYS = 3  # the reference's 3-date window (today + 2)


def q_location_forecast(spark: SparkSession, sf_dir: str,
                        base_date: str = domain.PRED_DATE,
                        horizon: int = HORIZON_DAYS) -> DataFrame:
    """Location-grain risk for each horizon date, one plan: the date axis is
    an exploded literal dimension inside the cross join (no driver loop)."""
    loc = domain.locations_df(spark, sf_dir)
    a = domain.accidents_df(spark, sf_dir).select(
        "accident_id",
        F.col("latitude").alias("a_lat"), F.col("longitude").alias("a_lon"),
        F.col("elevation_m").alias("a_elev"), "accident_date",
        K.severity_weight("severity").alias("a_sevw"),
        F.col("wbucket").alias("acc_bucket"))
    wsim = W.weather_similarity_cached(spark, sf_dir)
    dates = spark.range(horizon).select(
        F.date_add(F.to_date(F.lit(base_date)), F.col("id").cast("int"))
         .alias("prediction_date"))
    pairs = (domain.fan_out(loc).crossJoin(F.broadcast(a))
             .crossJoin(F.broadcast(dates)))
    pairs = pairs.join(
        F.broadcast(wsim),
        (pairs["wbucket"] == wsim["cur_bucket"])
        & (pairs["acc_bucket"] == wsim["acc_bucket"]), "left",
    ).drop(wsim["acc_bucket"]).drop("cur_bucket")
    dist = K.haversine_km("latitude", "longitude", "a_lat", "a_lon")
    weather_w = F.coalesce(F.col("weather_weight"),
                           F.lit(C.MISSING_WEATHER_NEUTRAL))
    base = (K.spatial_weight(dist, F.lit("default"))
            * K.temporal_weight("prediction_date", "accident_date",
                                F.lit("default"))
            * K.elevation_weight("elevation_m", "a_elev", F.lit("default"))
            * F.col("a_sevw")
            * K.weather_factor(weather_w))
    agg = (pairs.select("location_id", "prediction_date", base.alias("b"))
                .groupBy("location_id", "prediction_date")
                .agg(F.sum("b").alias("s")))
    risk = K.normalize_risk("s")
    return agg.select("location_id", "prediction_date",
                      F.round(risk, 6).alias("risk_score"),
                      K.color_code(risk).alias("color_code")) \
              .orderBy("location_id", "prediction_date")


def sql_location_forecast(base_date: str = domain.PRED_DATE,
                          horizon: int = HORIZON_DAYS) -> str:
    dist = S.haversine_km("l.latitude", "l.longitude", "a.latitude", "a.longitude")
    weather_w = "coalesce(ws.weather_weight, 0.5)"
    base = (
        f"{S.spatial_weight(f'({dist})', repr('default'))}"
        f" * {S.temporal_weight('d.prediction_date', 'a.accident_date', repr('default'))}"
        f" * {S.elevation_weight('l.elevation_m', 'a.elevation_m', repr('default'))}"
        f" * {S.severity_weight('a.severity')}"
        f" * {S.weather_factor(weather_w)}"
    )
    risk = S.normalize_risk("sum(b)")
    return f"""{_DOMAIN_WITH},
{domain.WEATHER_CTE.strip()},
{domain.ARCHIVE_STATS_CTE.strip()},
{W.wsim_ctes().strip()},
dates AS (
  SELECT DATE '{base_date}' + CAST(unnest(generate_series(0, {horizon - 1})) AS INT)
    AS prediction_date
),
fpairs AS (
  SELECT l.location_id, d.prediction_date, {base} AS b
  FROM locations l
  CROSS JOIN accidents a
  CROSS JOIN dates d
  LEFT JOIN wsim ws ON l.wbucket = ws.cur_bucket AND a.wbucket = ws.acc_bucket
)
SELECT location_id, prediction_date,
       round({risk}, 6) AS risk_score,
       {S.color_code(risk)} AS color_code
FROM fpairs GROUP BY location_id, prediction_date
ORDER BY location_id, prediction_date"""
