"""ANSI-SQL text fragments mirroring ``safeascent_spark.kernels``.

These generate the DuckDB ``oracle_sql()`` strings the driver runs
side-by-side with the Spark queries.  Every fragment is generated from the
SAME constant tables in ``safeascent_spark.config`` as the Column kernels,
so the two implementations cannot drift.

All fragments are plain ANSI SQL (CASE/math functions) accepted by both
DuckDB and Spark SQL.
"""

from __future__ import annotations

from . import config as C


def map_case(mapping: dict[str, float], key_expr: str, default: float) -> str:
    whens = " ".join(
        f"WHEN lower({key_expr}) = '{k}' THEN {v!r}"
        for k, v in mapping.items() if k != "default"
    )
    dflt = mapping.get("default", default)
    return f"(CASE {whens} ELSE {dflt!r} END)"


# --- K1 haversine ------------------------------------------------------------

def haversine_km(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    # Delta = difference of per-point radians (matches kernels.haversine_km).
    # sin^2 as s*s (not pow): exact-deterministic multiply on both engines.
    s_lat = f"sin((radians({lat2}) - radians({lat1})) / 2)"
    s_lon = f"sin((radians({lon2}) - radians({lon1})) / 2)"
    return (
        f"(2.0 * {C.EARTH_RADIUS_KM} * asin(sqrt("
        f"{s_lat} * {s_lat} + "
        f"cos(radians({lat1})) * cos(radians({lat2})) * "
        f"({s_lon} * {s_lon}))))"
    )


# --- K2 spatial --------------------------------------------------------------

def spatial_bandwidth(route_type: str) -> str:
    return map_case(C.SPATIAL_BANDWIDTH_KM, route_type,
                    C.SPATIAL_BANDWIDTH_KM["default"])


def spatial_weight(distance_km: str, route_type: str) -> str:
    h = spatial_bandwidth(route_type)
    return f"exp(-(({distance_km}) * ({distance_km})) / (2.0 * {h} * {h}))"


# --- K3/K4 temporal ----------------------------------------------------------

def season_of(date_expr: str) -> str:
    return (
        f"(CASE WHEN month({date_expr}) IN (12, 1, 2) THEN 'winter' "
        f"WHEN month({date_expr}) IN (3, 4, 5) THEN 'spring' "
        f"WHEN month({date_expr}) IN (6, 7, 8) THEN 'summer' "
        f"ELSE 'fall' END)"
    )


def temporal_weight(current_date: str, accident_date: str, route_type: str) -> str:
    lam = map_case(C.TEMPORAL_LAMBDA, route_type, C.TEMPORAL_LAMBDA["default"])
    days = f"abs(datediff('day', {accident_date}, {current_date}))"
    base_decay = f"pow({lam}, CAST({days} AS DOUBLE))"
    base_weight = (f"(1.0 - {C.TEMPORAL_DECAY_IMPACT} * "
                   f"(1.0 - pow({base_decay}, {C.TEMPORAL_DECAY_SHAPE})))")
    same = f"({season_of(current_date)} = {season_of(accident_date)})"
    return (f"({base_weight} * (CASE WHEN {same} THEN {C.SEASONAL_MULTIPLIER!r} "
            f"ELSE 1.0 END))")


# --- K10 route-type matrix ---------------------------------------------------

def route_type_weight(planning_type: str, accident_type: str) -> str:
    whens = " ".join(
        f"WHEN lower({planning_type}) = '{p}' AND lower({accident_type}) = '{a}' "
        f"THEN {w!r}"
        for (p, a), w in C.ROUTE_TYPE_WEIGHTS.items()
    )
    return f"(CASE {whens} ELSE {C.DEFAULT_ROUTE_TYPE_WEIGHT!r} END)"


def route_type_index_sql(route_type: str) -> str:
    """0-6 index into config.ROUTE_TYPES (mirror of kernels.route_type_index)."""
    whens = " ".join(
        f"WHEN lower({route_type}) = '{t}' THEN {i}"
        for i, t in enumerate(C.ROUTE_TYPES))
    return f"(CASE {whens} ELSE NULL END)"


def route_type_matrix_values() -> str:
    """The 49-row matrix as a VALUES table for join-based oracles."""
    rows = ", ".join(f"('{p}', '{a}', {w!r})"
                     for (p, a), w in C.ROUTE_TYPE_WEIGHTS.items())
    return f"(VALUES {rows}) AS rtw(planning_type, accident_type, rt_weight)"


# --- K11 severity ------------------------------------------------------------

def severity_weight(severity: str) -> str:
    return map_case(C.SEVERITY_BOOSTERS, severity, C.DEFAULT_SEVERITY_WEIGHT)


# --- K13 elevation -----------------------------------------------------------

def elevation_weight(route_elev: str, accident_elev: str, route_type: str) -> str:
    decay = map_case(C.ELEVATION_DECAY_CONSTANT, route_type,
                     C.ELEVATION_DECAY_CONSTANT["default"])
    diff = f"abs(({accident_elev}) - ({route_elev}))"
    q = f"({diff} / {decay})"
    return (
        f"(CASE WHEN ({route_elev}) IS NULL OR ({accident_elev}) IS NULL THEN 1.0 "
        f"ELSE 1.0 + {C.ELEVATION_BONUS_MAX} * exp(-({q} * {q})) END)"
    )


# --- K15 grade weight from parsed difficulty --------------------------------

def grade_weight_from_difficulty(route_diff: str, accident_diff: str) -> str:
    d = f"abs(({route_diff}) - ({accident_diff}))"
    w = f"exp(-({d} * {d}) / {2.0 * C.GRADE_SIGMA ** 2!r})"
    return (
        f"(CASE WHEN ({route_diff}) IS NULL OR ({accident_diff}) IS NULL THEN 1.0 "
        f"ELSE greatest({C.GRADE_MIN_WEIGHT!r}, {w}) END)"
    )


def yds_lookup_case(grade_expr: str) -> str:
    """YDS table lookup as CASE (for the small derived-grade domain)."""
    whens = " ".join(f"WHEN lower({grade_expr}) = '{k}' THEN {float(v)!r}"
                     for k, v in C.YDS_GRADES.items())
    return f"(CASE {whens} ELSE NULL END)"


def parse_grade(grade_expr: str) -> str:
    """Mirror of kernels.parse_grade for the grade systems used by the derived
    domain plus the numeric scales (V/WI/AI/M).  DuckDB-compatible regexps."""
    g = f"trim({grade_expr})"
    gl = f"lower({g})"
    gu = f"upper({g})"
    yds = yds_lookup_case(g)
    vnum = f"CAST(regexp_extract({gu}, '^V([0-9]+)', 1) AS DOUBLE)"
    wi = f"CAST(regexp_extract({gu}, '^WI([0-9]+)', 1) AS DOUBLE)"
    ai = f"CAST(regexp_extract({gu}, '^AI([0-9]+)', 1) AS DOUBLE)"
    mm = f"CAST(regexp_extract({gu}, '^M([0-9]+)', 1) AS DOUBLE)"
    return (
        f"(CASE WHEN {g} IS NULL OR {g} = '' THEN NULL "
        f"WHEN regexp_matches({gl}, '^5\\.[0-9]+[a-d]?$') THEN {yds} "
        f"WHEN {gu} = 'VB' THEN {C.V_SCALE_OFFSET - 0.5!r} "
        f"WHEN regexp_matches({gu}, '^V[0-9]+') THEN "
        f"{C.V_SCALE_OFFSET!r} + {vnum} * {C.V_SCALE_MULTIPLIER!r} "
        f"WHEN regexp_matches({gu}, '^WI[0-9]+') THEN 6.0 + ({wi} - 1) * 1.2 "
        f"WHEN regexp_matches({gu}, '^AI[0-9]+') THEN 7.0 + ({ai} - 1) * 1.4 "
        f"WHEN regexp_matches({gu}, '^M[0-9]+') THEN 7.0 + ({mm} - 1) * 0.6 "
        f"ELSE NULL END)"
    )


# --- K18 color ---------------------------------------------------------------

def color_code(risk: str) -> str:
    t1, t2, t3 = C.COLOR_THRESHOLDS
    return (f"(CASE WHEN ({risk}) < {t1} THEN 'green' "
            f"WHEN ({risk}) < {t2} THEN 'yellow' "
            f"WHEN ({risk}) < {t3} THEN 'orange' ELSE 'red' END)")


# --- K19 bearing -------------------------------------------------------------

def bearing_deg(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    x = f"sin(radians(({lon2}) - ({lon1}))) * cos(radians({lat2}))"
    y = (f"cos(radians({lat1})) * sin(radians({lat2})) - "
         f"sin(radians({lat1})) * cos(radians({lat2})) * "
         f"cos(radians(({lon2}) - ({lon1})))")
    return f"(fmod(degrees(atan2({x}, {y})) + 360.0, 360.0))"


# --- A1 risk -----------------------------------------------------------------

def normalize_risk(influence_sum: str) -> str:
    return (f"least({C.MAX_RISK_SCORE!r}, greatest(0.0, "
            f"({influence_sum}) * {C.RISK_NORMALIZATION_FACTOR!r}))")


# --- K9/F5 weather gate ------------------------------------------------------

def weather_factor(weather_weight: str) -> str:
    return (f"(CASE WHEN ({weather_weight}) < {C.WEATHER_EXCLUSION_THRESHOLD!r} "
            f"THEN 0.0 ELSE pow({weather_weight}, {float(C.WEATHER_POWER)!r}) END)")
