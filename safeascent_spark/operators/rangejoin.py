"""J2/S3: the accident-weather *range join* — observations within the
[date-6, date] window per accident (predict.py:489-573, band predicate at
536-548) — plus the single-point /predict lifecycle query (SURVEY.md §3.1).

Scale design for the band join: a naive date-band theta join is a broadcast
nested loop.  The scalable form buckets observations by ISO week and
explodes each accident to its two covering week keys, turning the band join
into an equi-join on week + a residual band filter.  Both forms produce
identical rows; the oracle uses the plain band predicate.
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

WINDOW_DAYS = 7  # day -6 .. day 0 inclusive (predict.py:543-546)


def observations_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dated weather observations derived from events (spans the accident
    decade so the band join has matches everywhere)."""
    e = domain.load_table(spark, sf_dir, "events")
    return e.select(
        F.col("event_id").alias("obs_id"),
        F.date_add(F.to_date(F.lit(domain.ACCIDENT_EPOCH)),
                   (F.col("event_id") % 3650).cast("int")).alias("obs_date"),
        (F.col("user_id") % domain.N_WBUCKETS).alias("wbucket"),
        F.col("value").alias("obs_value"),
    )


OBSERVATIONS_CTE = f"""
observations AS (
  SELECT event_id AS obs_id,
         DATE '{domain.ACCIDENT_EPOCH}' + CAST(event_id % 3650 AS INT) AS obs_date,
         user_id % {domain.N_WBUCKETS} AS wbucket,
         value AS obs_value
  FROM events
)"""


def q_weather_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per accident: observation count / avg / min date within the 7-day
    window ending on the accident date, restricted to the accident's
    weather bucket.

    Physical strategy: week-bucketed equi-join.  obs gets key
    week(obs_date); each accident explodes to the (at most two) week keys
    its window can span; the equi-join prunes to ~2 weeks of observations
    per accident before the exact band filter."""
    obs = observations_df(spark, sf_dir).withColumn(
        "obs_week", F.floor(F.datediff(F.col("obs_date"),
                                       F.to_date(F.lit("2000-01-03"))) / 7))
    a = domain.accidents_df(spark, sf_dir).select(
        "accident_id", "accident_date", "wbucket")
    a_weeks = a.withColumn(
        "obs_week",
        F.explode(F.array_distinct(F.array(
            F.floor(F.datediff(F.date_sub(F.col("accident_date"), WINDOW_DAYS - 1),
                               F.to_date(F.lit("2000-01-03"))) / 7),
            F.floor(F.datediff(F.col("accident_date"),
                               F.to_date(F.lit("2000-01-03"))) / 7)))))
    j = obs.join(F.broadcast(a_weeks), ["obs_week", "wbucket"])
    in_band = F.col("obs_date").between(
        F.date_sub(F.col("accident_date"), WINDOW_DAYS - 1),
        F.col("accident_date"))
    return (j.filter(in_band)
             .groupBy("accident_id")
             .agg(F.count(F.lit(1)).alias("n_obs"),
                  F.round(F.avg("obs_value"), 6).alias("avg_value"),
                  F.min("obs_date").alias("first_obs_date"))
             .orderBy("accident_id"))


def sql_weather_range_join() -> str:
    return f"""{_DOMAIN_WITH},
{OBSERVATIONS_CTE.strip()}
SELECT a.accident_id, count(*) AS n_obs,
       round(avg(o.obs_value), 6) AS avg_value,
       min(o.obs_date) AS first_obs_date
FROM accidents a
JOIN observations o
  ON o.wbucket = a.wbucket
 AND o.obs_date BETWEEN a.accident_date - {WINDOW_DAYS - 1} AND a.accident_date
GROUP BY a.accident_id
ORDER BY a.accident_id"""


# --- §3.1 single-point /predict ---------------------------------------------

Q_LAT, Q_LON, Q_ELEV = 36.5, -112.0, 2100.0
Q_TYPE, Q_GRADE = "alpine", "5.10a"


def q_predict_point(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The /predict lifecycle for one query point: F4 prefilter -> all
    kernels -> A1 risk, in one row (predict.py:57-335, sans HTTP sources;
    weather neutral 0.5 as the missing-pattern path).

    The query point's route-type CASEs constant-fold (Q_TYPE is a
    literal); the accident grade attaches via the broadcast difficulty
    dim instead of an inline parse_grade tree — value-identical
    (grade_weight == grade_weight_from_difficulty of the parses,
    kernels.py:318; parse_grade(Q_GRADE) folds to a constant) and it
    keeps the scan projection inside the 64 KB codegen method limit the
    inline parse tree used to blow (which sent this stage interpreted).
    """
    from .. import grades as G
    a = G.grade_difficulty_join(domain.accidents_df(spark, sf_dir),
                                "grade", "a_diff",
                                dim=G.domain_grade_dim(spark, sf_dir))
    dist = K.haversine_km(F.lit(Q_LAT), F.lit(Q_LON), "latitude", "longitude")
    rt_w = K.route_type_weight(F.lit(Q_TYPE), "route_type")
    keep = (dist <= 50.0) | (rt_w >= 0.85)
    influence = (
        K.spatial_weight(dist, F.lit(Q_TYPE))
        * K.temporal_weight(F.to_date(F.lit(domain.PRED_DATE)),
                            "accident_date", F.lit(Q_TYPE))
        * K.elevation_weight(F.lit(Q_ELEV), "elevation_m", F.lit(Q_TYPE))
        * rt_w
        * K.severity_weight("severity")
        * K.grade_weight_from_difficulty(K.parse_grade(F.lit(Q_GRADE)),
                                         F.col("a_diff"))
        * K.weather_factor(F.lit(C.MISSING_WEATHER_NEUTRAL))
    )
    scored = a.filter(keep).select(influence.alias("influence"))
    risk = K.normalize_risk("influence_sum")
    return (scored.agg(F.sum("influence").alias("influence_sum"),
                       F.sum(F.when(F.col("influence") > C.SIGNIFICANCE_THRESHOLD, 1)
                              .otherwise(0)).cast("bigint").alias("num_contributing"))
                  .select(F.round(risk, 6).alias("risk_score"),
                          K.color_code(risk).alias("color_code"),
                          "num_contributing"))


def sql_predict_point() -> str:
    dist = S.haversine_km(str(Q_LAT), str(Q_LON), "latitude", "longitude")
    rt_w = S.route_type_weight(f"'{Q_TYPE}'", "route_type")
    influence = (
        f"{S.spatial_weight(f'({dist})', repr(Q_TYPE))}"
        f" * {S.temporal_weight(f_date(domain.PRED_DATE), 'accident_date', repr(Q_TYPE))}"
        f" * {S.elevation_weight(str(Q_ELEV), 'elevation_m', repr(Q_TYPE))}"
        f" * {rt_w}"
        f" * {S.severity_weight('severity')}"
        f" * {S.grade_weight_from_difficulty(S.parse_grade(repr(Q_GRADE)), S.parse_grade('grade'))}"
        f" * {S.weather_factor(str(C.MISSING_WEATHER_NEUTRAL))}"
    )
    risk = S.normalize_risk("sum(influence)")
    return f"""{_DOMAIN_WITH},
scored AS (
  SELECT {influence} AS influence
  FROM accidents
  WHERE ({dist}) <= 50.0 OR ({rt_w}) >= 0.85
)
SELECT round({risk}, 6) AS risk_score,
       {S.color_code(risk)} AS color_code,
       CAST(sum(CASE WHEN influence > {C.SIGNIFICANCE_THRESHOLD!r} THEN 1 ELSE 0 END) AS BIGINT)
         AS num_contributing
FROM scored"""


def f_date(d: str) -> str:
    return f"DATE '{d}'"
