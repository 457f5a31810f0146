"""Partial weather windows (5-6 days): the Spark similarity must mirror the
reference's POSITIONAL truncation — both series cut to min(num_days) first
elements with decay weights built for that shorter window
(weather_similarity.py:131-141, time_utils.py:80-113) — and the <5-day
validity gate (MIN_WEATHER_DAYS_REQUIRED)."""

from __future__ import annotations

import math

import pytest

from safeascent_spark import config as C
from safeascent_spark.operators import weather as W

DECAY = C.WITHIN_WINDOW_TEMPORAL_DECAY

# (wbucket, day_offset) -> factor rows.  Bucket 0: full 7 days; bucket 1:
# 6 days (offset 3 missing); bucket 2: 5 days; bucket 3: 4 days (invalid).
BUCKET_OFFSETS = {0: [0, 1, 2, 3, 4, 5, 6],
                  1: [0, 1, 2, 4, 5, 6],
                  2: [0, 2, 3, 5, 6],
                  3: [0, 1, 2, 3]}


def _row(b: int, off: int) -> dict:
    return {
        "wbucket": b, "day_offset": off,
        "temperature": 5.0 + b + 0.7 * off + (0.2 * off * off if b == 2 else 0.0),
        "precipitation": float((b * 7 + off * 3) % 11),
        "wind_speed": 3.0 + 0.5 * off + b * 0.3,
        "visibility": 9000.0 if b in (0, 1) else 9000.0 - 100.0 * off,
        "cloud_cover": float((b * 13 + off * 17) % 100),
        "temp_min": -1.0 + off * 0.5, "temp_max": 1.0 + off,
    }


def _series(b: int, col: str) -> list[float]:
    return [_row(b, o)[col] for o in BUCKET_OFFSETS[b]]


def _weighted_pearson(x: list[float], y: list[float], w: list[float]) -> float:
    sw = sum(w)
    mx = sum(wi * xi for wi, xi in zip(w, x)) / sw
    my = sum(wi * yi for wi, yi in zip(w, y)) / sw
    vx = sum(wi * (xi - mx) ** 2 for wi, xi in zip(w, x)) / sw
    vy = sum(wi * (yi - my) ** 2 for wi, yi in zip(w, y)) / sw
    cov = sum(wi * (xi - mx) * (yi - my) for wi, xi, yi in zip(w, x, y)) / sw
    if vx <= C.VARIANCE_EPS and vy <= C.VARIANCE_EPS:
        return 1.0
    if vx <= C.VARIANCE_EPS or vy <= C.VARIANCE_EPS:
        return 0.0
    return max(-1.0, min(1.0, cov / (math.sqrt(vx) * math.sqrt(vy))))


def _expected_similarity(ba: int, bb: int) -> float:
    na, nb = len(BUCKET_OFFSETS[ba]), len(BUCKET_OFFSETS[bb])
    if na < C.MIN_WEATHER_DAYS_REQUIRED or nb < C.MIN_WEATHER_DAYS_REQUIRED:
        return 0.0
    nd = min(na, nb)
    weights = [DECAY ** (nd - 1 - i) for i in range(nd)]  # scale cancels
    scores = []
    for col in ("temperature", "precipitation", "wind_speed",
                "visibility", "cloud_cover"):
        xa, xb = _series(ba, col)[:nd], _series(bb, col)[:nd]
        scores.append((_weighted_pearson(xa, xb, weights) + 1.0) / 2.0)
    ft = {b: sum(1 for o in BUCKET_OFFSETS[b]
                 if _row(b, o)["temp_min"] < 0 < _row(b, o)["temp_max"])
          for b in (ba, bb)}
    ft_sim = max(0.0, 1.0 - abs(ft[ba] - ft[bb])
                 / (max(ft[ba], ft[bb], 1) + 7.0))
    return (sum(scores) + ft_sim) / 6.0


@pytest.fixture(scope="module")
def partial_sim(spark):
    rows = [_row(b, o) for b, offs in BUCKET_OFFSETS.items() for o in offs]
    wdf = spark.createDataFrame(rows)
    sim = W.weather_similarity_df(spark, "unused", with_extreme=False,
                                  weather=wdf)
    return {(r["cur_bucket"], r["acc_bucket"]): r["weather_weight"]
            for r in sim.collect()}


@pytest.mark.parametrize("ba,bb", [(a, b) for a in BUCKET_OFFSETS
                                   for b in BUCKET_OFFSETS])
def test_partial_window_matches_reference_port(partial_sim, ba, bb):
    assert partial_sim[(ba, bb)] == pytest.approx(
        _expected_similarity(ba, bb), abs=1e-9)


def test_full_window_weights_unchanged(partial_sim):
    # 7x7 pair: positional form must equal the old calendar-aligned value
    # (pos == day_offset, wraw == decay^(6-day_offset)); guards r01 hashes.
    assert partial_sim[(0, 0)] == pytest.approx(1.0, abs=1e-9)
    assert partial_sim[(3, 0)] == 0.0 and partial_sim[(0, 3)] == 0.0
