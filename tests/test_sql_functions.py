"""SQL function surface: every registered SQL kernel must agree EXACTLY
with its Column-kernel twin (same doubles, same strings) — the bodies are
generated from the same sqlgen fragments, and this pins that the two
Spark dialects (SQL UDF inlining vs Column expressions) cannot drift.
Also proves a pure-SQL end-to-end consumer query works on the registered
views with no Python in the loop, and that SQL UDFs inline (no
UDF-boundary in the physical plan).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def sql_env(spark):
    from safeascent_spark import functions as FN
    FN.sql_session(spark, SF_SMOKE)
    return spark


def _pairs(spark):
    # a deterministic route x accident sample with every input the
    # kernels touch (nullable elevations included)
    return spark.sql("""
        SELECT r.route_id, a.accident_id,
               l.latitude AS rlat, l.longitude AS rlon,
               l.elevation_m AS relev,
               r.route_type AS rtype,
               a.latitude AS alat, a.longitude AS alon,
               a.elevation_m AS aelev, a.route_type AS atype,
               a.severity, a.accident_date,
               DATE '2024-06-15' AS today
        FROM routes r
        JOIN locations l USING (location_id)
        CROSS JOIN accidents a
        WHERE r.route_id % 37 = 0 AND a.accident_id % 7 = 0
    """)


def test_sql_kernels_match_column_kernels_exactly(sql_env):
    from safeascent_spark import kernels as K
    spark = sql_env
    _pairs(spark).createOrReplaceTempView("pairs")
    via_sql = spark.sql("""
        SELECT route_id, accident_id,
               haversine_km(rlat, rlon, alat, alon)       AS hav,
               spatial_weight(haversine_km(rlat, rlon, alat, alon), rtype)
                                                          AS sw,
               season_of(accident_date)                   AS season,
               temporal_weight(today, accident_date, rtype) AS tw,
               route_type_weight(rtype, atype)            AS rtw,
               severity_weight(severity)                  AS sev,
               elevation_weight(relev, aelev, rtype)      AS ew,
               bearing_deg(rlat, rlon, alat, alon)        AS brg,
               color_code(normalize_risk(haversine_km(rlat, rlon, alat, alon)))
                                                          AS color
        FROM pairs
    """).collect()
    p = spark.table("pairs")
    hav = K.haversine_km("rlat", "rlon", "alat", "alon")
    via_col = p.select(
        "route_id", "accident_id",
        hav.alias("hav"),
        K.spatial_weight(hav, "rtype").alias("sw"),
        K.season_of("accident_date").alias("season"),
        K.temporal_weight("today", "accident_date", "rtype").alias("tw"),
        K.route_type_weight("rtype", "atype").alias("rtw"),
        K.severity_weight("severity").alias("sev"),
        K.elevation_weight("relev", "aelev", "rtype").alias("ew"),
        K.bearing_deg("rlat", "rlon", "alat", "alon").alias("brg"),
        K.color_code(K.normalize_risk(hav)).alias("color"),
    ).collect()
    assert len(via_sql) == len(via_col) > 0
    key = lambda r: (r["route_id"], r["accident_id"])
    for s, c in zip(sorted(via_sql, key=key), sorted(via_col, key=key)):
        assert s == c, (s, c)   # EXACT equality, doubles included


def test_sql_udfs_inline_into_codegen(sql_env):
    # SQL UDFs must disappear at analysis time: the physical plan shows
    # the inlined math, never a (Batch)EvalPython / ScalaUDF boundary
    from tests.test_plans import plan_of
    df = sql_env.sql(
        "SELECT haversine_km(latitude, longitude, 35.0, -115.0) AS d "
        "FROM accidents")
    plan = plan_of(df)
    for marker in ("BatchEvalPython", "ScalaUDF", "PythonUDF"):
        assert marker not in plan, plan[:2000]
    assert "SIN" in plan.upper()


def test_pure_sql_consumer_query_end_to_end(sql_env):
    # a BI-style query: nearest accidents with color-coded normalized
    # influence, zero Python kernels involved
    rows = sql_env.sql("""
        SELECT a.accident_id,
               haversine_km(35.0, -115.0, a.latitude, a.longitude) AS km,
               color_code(normalize_risk(
                   spatial_weight(
                       haversine_km(35.0, -115.0, a.latitude, a.longitude),
                       'sport') * severity_weight(a.severity) * 40))
                   AS color
        FROM accidents a
        ORDER BY km ASC, a.accident_id
        LIMIT 10
    """).collect()
    assert len(rows) == 10
    assert rows[0]["km"] <= rows[-1]["km"]
    assert set(r["color"] for r in rows) <= {"green", "yellow",
                                             "orange", "red"}


def test_registration_is_idempotent(sql_env):
    from safeascent_spark import functions as FN
    names = FN.register_sql_kernels(sql_env)   # second call: OR REPLACE
    assert "haversine_km" in names and len(names) == len(FN.SQL_KERNELS)
