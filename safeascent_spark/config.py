"""Algorithm constants for the SafeAscent-capability PySpark engine.

Re-expresses the tunable parameters of the reference implementation
(`/root/reference/backend/app/services/algorithm_config.py:17-279`) as plain
Python constants consumed by the Column-expression kernels in
``safeascent_spark.kernels`` and mirrored into the DuckDB oracle SQL in
``safeascent_spark.sqlgen``.

Where the reference contains internally divergent semantics, the canonical
choice (documented in SURVEY.md §4) is noted next to the constant.
"""

from __future__ import annotations

# --- Spatial (reference algorithm_config.py:17-41) -------------------------
SPATIAL_BANDWIDTH_KM: dict[str, float] = {
    "alpine": 75.0,
    "ice": 50.0,
    "mixed": 60.0,
    "trad": 40.0,
    "sport": 25.0,
    "aid": 30.0,
    "boulder": 20.0,
    "default": 50.0,
}
MAX_SEARCH_RADIUS_KM = 300.0  # perf-only pre-filter, not a semantic cutoff
EARTH_RADIUS_KM = 6371.0  # reference algorithm_config.py:278

# --- Temporal (reference algorithm_config.py:51-79) ------------------------
TEMPORAL_LAMBDA: dict[str, float] = {
    "alpine": 0.9998,
    "ice": 0.9997,
    "mixed": 0.9997,
    "trad": 0.9995,
    "sport": 0.999,
    "aid": 0.9995,
    "boulder": 0.999,
    "default": 0.9996,
}
TEMPORAL_DECAY_IMPACT = 0.35
TEMPORAL_DECAY_SHAPE = 1.5
TEMPORAL_SEASONAL_IMPACT = 0.10
SEASONAL_BOOST = 1.5
# Effective same-season multiplier: 1 + (1.5-1)*0.10 = 1.05
SEASONAL_MULTIPLIER = 1.0 + (SEASONAL_BOOST - 1.0) * TEMPORAL_SEASONAL_IMPACT

# Months per season (reference algorithm_config.py:74-79)
SEASONS: dict[str, list[int]] = {
    "winter": [12, 1, 2],
    "spring": [3, 4, 5],
    "summer": [6, 7, 8],
    "fall": [9, 10, 11],
}

# --- Route-type 7x7 asymmetric matrix (algorithm_config.py:89-155) ---------
ROUTE_TYPES = ["sport", "trad", "alpine", "ice", "mixed", "aid", "boulder"]
ROUTE_TYPE_WEIGHTS: dict[tuple[str, str], float] = {
    ("sport", "sport"): 1.0, ("sport", "trad"): 0.7, ("sport", "boulder"): 0.6,
    ("sport", "alpine"): 0.3, ("sport", "ice"): 0.2, ("sport", "mixed"): 0.3,
    ("sport", "aid"): 0.5,
    ("trad", "sport"): 0.6, ("trad", "trad"): 1.0, ("trad", "boulder"): 0.4,
    ("trad", "alpine"): 0.6, ("trad", "ice"): 0.3, ("trad", "mixed"): 0.5,
    ("trad", "aid"): 0.8,
    ("alpine", "sport"): 0.9, ("alpine", "trad"): 0.8, ("alpine", "boulder"): 0.3,
    ("alpine", "alpine"): 1.0, ("alpine", "ice"): 0.8, ("alpine", "mixed"): 0.9,
    ("alpine", "aid"): 0.6,
    ("ice", "sport"): 0.4, ("ice", "trad"): 0.5, ("ice", "boulder"): 0.2,
    ("ice", "alpine"): 0.9, ("ice", "ice"): 1.0, ("ice", "mixed"): 0.9,
    ("ice", "aid"): 0.4,
    ("mixed", "sport"): 0.5, ("mixed", "trad"): 0.6, ("mixed", "boulder"): 0.3,
    ("mixed", "alpine"): 0.9, ("mixed", "ice"): 0.9, ("mixed", "mixed"): 1.0,
    ("mixed", "aid"): 0.5,
    ("aid", "sport"): 0.5, ("aid", "trad"): 0.8, ("aid", "boulder"): 0.2,
    ("aid", "alpine"): 0.6, ("aid", "ice"): 0.3, ("aid", "mixed"): 0.5,
    ("aid", "aid"): 1.0,
    ("boulder", "sport"): 0.7, ("boulder", "trad"): 0.4, ("boulder", "boulder"): 1.0,
    ("boulder", "alpine"): 0.2, ("boulder", "ice"): 0.2, ("boulder", "mixed"): 0.3,
    ("boulder", "aid"): 0.3,
}
DEFAULT_ROUTE_TYPE_WEIGHT = 0.5

# --- Weather similarity (algorithm_config.py:164-190) ----------------------
WEATHER_FACTORS = ["temperature", "precipitation", "wind_speed", "visibility",
                   "cloud_cover", "freeze_thaw"]  # equal 1/6 weights
EXTREME_WEATHER_SD_THRESHOLD = 2.0
EXTREME_PENALTY_MULTIPLIERS: dict[str, float] = {
    "wind_speed": 0.20,
    "precipitation": 0.20,
    "temperature": 0.20,
    "visibility": 0.25,
}
WITHIN_WINDOW_TEMPORAL_DECAY = 0.85
FREEZE_THAW_TEMP_C = 0.0
MIN_WEATHER_DAYS_REQUIRED = 5  # of the 7-day window (algorithm_config.py:270)
WEATHER_WINDOW_DAYS = 7

# Canonical weather gating (SURVEY.md §4 divergence #4): cubic power with a
# 0.25 exclusion gate, as in safety_algorithm.py:308-319.
WEATHER_POWER = 3
WEATHER_EXCLUSION_THRESHOLD = 0.25
MISSING_WEATHER_NEUTRAL = 0.5  # safety_algorithm.py:265-269

# Zero-variance tolerance for the weighted-Pearson edge cases
# (stats_utils.py:155-159).  The reference compares exact float zero after a
# centered two-pass variance; we compare against a tiny epsilon so that the
# Spark and DuckDB float paths agree deterministically.
VARIANCE_EPS = 1e-12

# --- Elevation (algorithm_config.py:202-215) -------------------------------
# Canonical semantic: bonus-only (elevation_weighting.py:16-50); the batch
# penalty variant (location_safety_computation.py:375-384) is a documented
# internal divergence we do NOT reproduce (SURVEY.md §4 divergence #1).
ELEVATION_DECAY_CONSTANT: dict[str, float] = {
    "alpine": 1600.0,
    "ice": 1600.0,
    "mixed": 1600.0,
    "trad": 2400.0,
    "aid": 2400.0,
    "sport": 3600.0,
    "boulder": 6000.0,
    "default": 2400.0,
}
ELEVATION_BONUS_MAX = 0.15

# --- Grade (algorithm_config.py:225-229, grade_weighting.py:28-52) ---------
GRADE_HALF_WEIGHT_DIFF = 3.0
GRADE_MIN_WEIGHT = 0.25
GRADE_SIGMA = GRADE_HALF_WEIGHT_DIFF / 1.18  # grade_weighting.py:258-260

# YDS lookup (grade_weighting.py:29-46): grade string -> 0-20 difficulty
YDS_GRADES: dict[str, float] = {
    "5.0": 0, "5.1": 1, "5.2": 2, "5.3": 3, "5.4": 4,
    "5.5": 5, "5.6": 6, "5.7": 7, "5.8": 8, "5.9": 9,
    "5.10a": 10.0, "5.10b": 10.25, "5.10c": 10.5, "5.10d": 10.75, "5.10": 10.5,
    "5.11a": 11.0, "5.11b": 11.25, "5.11c": 11.5, "5.11d": 11.75, "5.11": 11.5,
    "5.12a": 12.0, "5.12b": 12.25, "5.12c": 12.5, "5.12d": 12.75, "5.12": 12.5,
    "5.13a": 13.0, "5.13b": 13.25, "5.13c": 13.5, "5.13d": 13.75, "5.13": 13.5,
    "5.14a": 14.0, "5.14b": 14.25, "5.14c": 14.5, "5.14d": 14.75, "5.14": 14.5,
    "5.15a": 15.0, "5.15b": 15.25, "5.15c": 15.5, "5.15d": 15.75, "5.15": 15.5,
}
V_SCALE_OFFSET = 10.0    # grade_weighting.py:49
V_SCALE_MULTIPLIER = 0.4  # grade_weighting.py:50

# --- Severity (algorithm_config.py:237-245) --------------------------------
SEVERITY_BOOSTERS: dict[str, float] = {
    "fatal": 1.3,
    "serious": 1.1,
    "minor": 1.0,
    "unknown": 1.0,
}
DEFAULT_SEVERITY_WEIGHT = 1.0

# --- Risk normalization (algorithm_config.py:256-259) ----------------------
RISK_NORMALIZATION_FACTOR = 7.0
MAX_RISK_SCORE = 100.0
MAX_CONTRIBUTING_ACCIDENTS = 50  # algorithm_config.py:267
SIGNIFICANCE_THRESHOLD = 1e-6    # location_safety_computation.py:407-410

# Canonical color thresholds (SURVEY.md §4 divergence #3): 25/50/75 as in
# location_safety_computation.py:542-549 and the frontend.
COLOR_THRESHOLDS = (25.0, 50.0, 75.0)  # green < 25 <= yellow < 50 <= orange < 75 <= red
