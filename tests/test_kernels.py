"""Kernel exact-value tests ported from the reference's unit suites
(backend/tests/test_temporal_weighting.py, test_safety_algorithm.py,
grade_weighting docstrings) as literal-input DataFrame checks."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from safeascent_spark import config as C
from safeascent_spark import grades as G
from safeascent_spark import kernels as K


def one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0].v


# --- K1 haversine ------------------------------------------------------------

def test_haversine_zero(spark):
    assert one(spark, K.haversine_km(F.lit(40.0), F.lit(-105.0),
                                     F.lit(40.0), F.lit(-105.0))) == 0.0


def test_haversine_known_distance(spark):
    # ~50km north: 0.45 deg lat at any longitude
    d = one(spark, K.haversine_km(F.lit(40.0), F.lit(-105.0),
                                  F.lit(40.45), F.lit(-105.0)))
    assert d == pytest.approx(50.0, rel=0.01)


# --- K2 spatial (spatial_weighting.py docstring vectors) ---------------------

def test_spatial_weight_alpine_vs_sport(spark):
    # NB: the reference's docstring examples (0.607/0.018) predate its
    # current bandwidths; we assert the configured formula exactly.
    d = K.haversine_km(F.lit(40.0), F.lit(-105.0), F.lit(40.45), F.lit(-105.0))
    dv = one(spark, d)
    alpine = one(spark, K.spatial_weight(d, F.lit("alpine")))
    sport = one(spark, K.spatial_weight(d, F.lit("sport")))
    assert alpine == pytest.approx(math.exp(-dv**2 / (2 * 75.0**2)), rel=1e-9)
    assert sport == pytest.approx(math.exp(-dv**2 / (2 * 25.0**2)), rel=1e-9)
    assert alpine > sport  # wider bandwidth -> slower decay


# --- K3 temporal (test_temporal_weighting.py:26-50) --------------------------

def test_temporal_same_date_same_season(spark):
    w = one(spark, K.temporal_weight(F.to_date(F.lit("2024-07-15")),
                                     F.to_date(F.lit("2024-07-15")),
                                     F.lit("alpine")))
    # base_decay=1 -> base_weight=1; same season -> x1.05
    assert w == pytest.approx(1.05, abs=1e-9)


def test_temporal_no_boost_cross_season(spark):
    w = one(spark, K.temporal_weight(F.to_date(F.lit("2024-07-15")),
                                     F.to_date(F.lit("2024-01-15")),
                                     F.lit("alpine")))
    days = 182
    base = 1 - 0.35 * (1 - (0.9998 ** days) ** 1.5)
    assert w == pytest.approx(base, abs=1e-9)


def test_temporal_alpine_decays_slower_than_sport(spark):
    cur, acc = F.to_date(F.lit("2024-07-15")), F.to_date(F.lit("2019-07-15"))
    alpine = one(spark, K.temporal_weight(cur, acc, F.lit("alpine")))
    sport = one(spark, K.temporal_weight(cur, acc, F.lit("sport")))
    assert alpine > sport


def test_temporal_half_life_formula():
    # get_temporal_half_life (temporal_weighting.py:214-230)
    hl_alpine = math.log(0.5) / math.log(0.9998) / 365.25
    assert hl_alpine == pytest.approx(9.5, abs=0.05)


# --- K4 seasons --------------------------------------------------------------

@pytest.mark.parametrize("date,season", [
    ("2024-01-15", "winter"), ("2024-12-01", "winter"),
    ("2024-04-10", "spring"), ("2024-07-04", "summer"),
    ("2024-10-31", "fall"),
])
def test_season_of(spark, date, season):
    assert one(spark, K.season_of(F.to_date(F.lit(date)))) == season


# --- K10 route-type matrix ---------------------------------------------------

def test_route_type_matrix_canary(spark):
    # alpine<-sport canary 0.9 (algorithm_config.py:109)
    assert one(spark, K.route_type_weight(F.lit("alpine"), F.lit("sport"))) == 0.9
    assert one(spark, K.route_type_weight(F.lit("sport"), F.lit("alpine"))) == 0.3
    assert one(spark, K.route_type_weight(F.lit("??"), F.lit("sport"))) == 0.5


def test_route_type_indexed_matches_matrix(spark):
    rows = (spark.createDataFrame(
        [(p, a) for p in C.ROUTE_TYPES for a in C.ROUTE_TYPES],
        "p string, a string")
        .select("p", "a",
                K.route_type_weight("p", "a").alias("direct"),
                K.route_type_weight_indexed(
                    K.route_type_index("p"), K.route_type_index("a"))
                 .alias("indexed"))
        .collect())
    for r in rows:
        assert r.direct == r.indexed


# --- K11/K12 severity --------------------------------------------------------

def test_severity_weights(spark):
    for sev, w in [("fatal", 1.3), ("serious", 1.1), ("minor", 1.0),
                   ("unknown", 1.0), ("bizarre", 1.0)]:
        assert one(spark, K.severity_weight(F.lit(sev))) == w


def test_severity_normalization(spark):
    # "uninjured" maps to serious, faithfully mirroring the reference's
    # substring bug: "injured" in "uninjured" and the serious check runs
    # first (severity_weighting.py:131-141).
    for raw, norm in [("DEATH on route", "fatal"), ("hospitalized", "serious"),
                      ("uninjured", "serious"), ("no injury at all", "serious"),
                      ("slight scrape", "minor"), ("", "unknown"),
                      ("something odd", "unknown")]:
        assert one(spark, K.normalize_severity(F.lit(raw))) == norm


# --- K13 elevation -----------------------------------------------------------

def test_elevation_neutral_on_null(spark):
    w = one(spark, K.elevation_weight(F.lit(None).cast("double"),
                                      F.lit(1000.0), F.lit("alpine")))
    assert w == 1.0


def test_elevation_bonus_max_at_equal(spark):
    w = one(spark, K.elevation_weight(F.lit(2000.0), F.lit(2000.0),
                                      F.lit("alpine")))
    assert w == pytest.approx(1.15, abs=1e-12)


# --- K14 grade parsing (grade_weighting.py table + docstrings) ---------------

@pytest.mark.parametrize("grade,expect", [
    ("5.10a", 10.0), ("5.9", 9.0), ("5.15d", 15.75), ("5.10", 10.5),
    ("5.9+", 9.25), ("5.10-", 10.25), ("5.10a/b", 10.125),
    ("V5", 12.0), ("VB", 9.5), ("WI4", 9.6), ("AI3", 9.8), ("M6", 10.0),
    ("A2", 10.4), ("C3", 11.6), ("9", 9.0), ("garbage", None), (None, None),
])
def test_py_parse_grade(grade, expect):
    got = G.py_parse_grade(grade)
    if expect is None:
        assert got is None
    else:
        assert got == pytest.approx(expect, abs=1e-9)


def test_column_parse_grade_matches_python(spark):
    cases = ["5.10a", "5.9", "5.15d", "5.10", "V5", "VB", "WI4", "AI3",
             "M6", "garbage", None, "5.11b"]
    rows = (spark.createDataFrame([(g,) for g in cases], "g string")
                 .select("g", K.parse_grade("g").alias("d")).collect())
    for r in rows:
        expect = G.py_parse_grade(r.g)
        if expect is None:
            assert r.d is None, r.g
        else:
            assert r.d == pytest.approx(expect, abs=1e-9), r.g


def test_grade_weight_docstring_vectors(spark):
    # grade_weighting.py:232-247
    def gw(a, b):
        return one(spark, K.grade_weight(F.lit(a), F.lit(b)))
    assert gw("5.10a", "5.10a") == 1.0
    assert gw("5.10a", "5.11a") == pytest.approx(0.89, abs=0.05)
    assert gw("5.10a", "5.13a") == pytest.approx(0.5, abs=0.01)
    assert gw("5.10a", None) == 1.0
    # floor at 0.25 (never fully excluded)
    assert gw("5.0", "5.15d") == 0.25


# --- K18 colors (canonical 25/50/75) -----------------------------------------

def test_color_codes(spark):
    for risk, color in [(0.0, "green"), (24.99, "green"), (25.0, "yellow"),
                        (49.9, "yellow"), (50.0, "orange"), (74.9, "orange"),
                        (75.0, "red"), (100.0, "red")]:
        assert one(spark, K.color_code(F.lit(risk))) == color


# --- A1 normalization (test_safety_algorithm.py:128-186) ---------------------

def test_risk_normalization(spark):
    assert one(spark, K.normalize_risk(F.lit(0.5))) == 3.5
    assert one(spark, K.normalize_risk(F.lit(0.0))) == 0.0
    # cap at 100 for influence >= 100/7
    assert one(spark, K.normalize_risk(F.lit(15.0))) == 100.0


# --- K9/F5 weather gate ------------------------------------------------------

def test_weather_factor_gate_and_cube(spark):
    assert one(spark, K.weather_factor(F.lit(0.2))) == 0.0
    assert one(spark, K.weather_factor(F.lit(0.25))) == pytest.approx(0.015625)
    assert one(spark, K.weather_factor(F.lit(0.8))) == pytest.approx(0.512)
    assert one(spark, K.weather_factor(F.lit(0.5))) == pytest.approx(0.125)


# --- K16 route-type inference ------------------------------------------------

def test_route_type_inference(spark):
    cases = [
        ("ice climbing near couloir", "ice"),
        ("avalanche in backcountry", "alpine"),
        ("boulder problem highball", "boulder"),
        ("sport climbing fall 5.12", "sport"),
        ("rappel anchor failure", "trad"),
        ("nothing matching", "default"),
    ]
    rows = (spark.createDataFrame(cases, "tags string, expect string")
                 .select("expect",
                         K.infer_route_type("tags", F.lit(None), F.lit(None))
                          .alias("got")).collect())
    for r in rows:
        assert r.got == r.expect


def test_route_type_confidence_tiers(spark):
    """One case per tier of the reference cascade (route_type_mapper.py:168-241),
    matching its docstring examples: explicit tags 0.95, generic-fields 0.3-band
    (here the 0.4 climber tier / 0.5 typed tier)."""
    cases = [
        # (tags, accident_type, activity, expect)
        ("Ice Climbing, Alpine/Mountaineering", "ice_climbing", "Climbing", 0.95),
        (None, "ice_climbing_fall", None, 0.85),
        (None, "avalanche", None, 0.80),
        ("grade: 5.9 roped", None, None, 0.60),
        (None, "lowering_error", None, 0.50),
        (None, "unknown", "Backcountry Tourer", 0.60),
        (None, "unknown", "Sport Climber", 0.40),
        (None, None, "Hiker", 0.20),
        (None, None, None, 0.20),
    ]
    rows = (spark.createDataFrame(
                cases, "tags string, at string, act string, expect double")
                 .select("expect",
                         K.route_type_confidence("tags", "at", "act")
                          .alias("got")).collect())
    for r in rows:
        assert r.got == r.expect


# --- K19/K20/K23 -------------------------------------------------------------

def test_bearing_cardinal(spark):
    north = one(spark, K.bearing_deg(F.lit(40.0), F.lit(-105.0),
                                     F.lit(41.0), F.lit(-105.0)))
    east = one(spark, K.bearing_deg(F.lit(0.0), F.lit(0.0),
                                    F.lit(0.0), F.lit(1.0)))
    assert north == pytest.approx(0.0, abs=1e-6)
    assert east == pytest.approx(90.0, abs=1e-6)


def test_temp_conversion_roundtrip(spark):
    assert one(spark, K.c_to_f(F.lit(0.0))) == 32.0
    assert one(spark, K.c_to_f(F.lit(100.0))) == 212.0
    assert one(spark, K.f_to_c(F.lit(32.0))) == 0.0


def test_full_yds_table_column_vs_python(spark):
    """Every YDS table entry (plus +/- and slash modifiers) must parse
    identically through the Column expression and the Python port."""
    cases = list(C.YDS_GRADES.keys())
    cases += [g + "+" for g in C.YDS_GRADES] + [g + "-" for g in C.YDS_GRADES]
    cases += ["5.10a/b", "5.11b/c", "5.12c/d"]
    rows = (spark.createDataFrame([(g,) for g in cases], "g string")
                 .select("g", K.parse_grade("g").alias("d")).collect())
    for r in rows:
        expect = G.py_parse_grade(r.g)
        if expect is None:
            assert r.d is None, r.g
        else:
            assert r.d == pytest.approx(expect, abs=1e-9), r.g
