"""Pandas-UDF (applyInPandas) variant of the weather-similarity operator.

The production path (operators/weather.py) is pure Column algebra — JVM-side
and codegen'd.  This module computes the same 6-factor day-weighted Pearson
similarity with NumPy inside an Arrow-batched grouped-map UDF, for two
reasons:

1. it demonstrates the sanctioned escape hatch for operators Spark can't
   express (grouped numerical kernels -> applyInPandas, never row-at-a-time
   UDFs);
2. it is an independent implementation used to cross-validate the
   closed-form algebra (tests/test_pipeline.py mirrors the reference's
   loop-vs-vectorized equivalence check a second way).

NumPy port of backend/app/utils/stats_utils.py:111-170 and
weather_similarity.py:88-218 (base similarity, no extreme multiplier).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import config as C
from .. import domain
from .weather import FACTOR_SRC, FACTORS, bucket_profile_df


def _weighted_pearson_np(x: np.ndarray, y: np.ndarray,
                         w: np.ndarray) -> float:
    sw = w.sum()
    nw = w / sw
    mx, my = (nw * x).sum(), (nw * y).sum()
    vx = (nw * (x - mx) ** 2).sum()
    vy = (nw * (y - my) ** 2).sum()
    if vx <= C.VARIANCE_EPS and vy <= C.VARIANCE_EPS:
        return 1.0
    if vx <= C.VARIANCE_EPS or vy <= C.VARIANCE_EPS:
        return 0.0
    cov = (nw * (x - mx) * (y - my)).sum()
    return float(max(-1.0, min(1.0, cov / (np.sqrt(vx) * np.sqrt(vy)))))


def weather_similarity_udf_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same output contract as weather_similarity_df(with_extreme=False)."""
    w = domain.weather_long_df(spark, sf_dir)
    a = w.alias("a")
    b = w.alias("b")
    pairs = a.join(b, F.col("a.day_offset") == F.col("b.day_offset")).select(
        F.col("a.wbucket").alias("cur_bucket"),
        F.col("b.wbucket").alias("acc_bucket"),
        F.col("a.day_offset").alias("day_offset"),
        *[F.col(f"a.{FACTOR_SRC[f]}").alias(f"x_{f}") for f in FACTORS],
        *[F.col(f"b.{FACTOR_SRC[f]}").alias(f"y_{f}") for f in FACTORS],
    )

    def score_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day_offset")
        wts = C.WITHIN_WINDOW_TEMPORAL_DECAY ** (
            6.0 - pdf["day_offset"].to_numpy(dtype=float))
        scores = []
        for f in FACTORS:
            corr = _weighted_pearson_np(pdf[f"x_{f}"].to_numpy(dtype=float),
                                        pdf[f"y_{f}"].to_numpy(dtype=float),
                                        wts)
            scores.append((corr + 1.0) / 2.0)
        return pd.DataFrame({
            "cur_bucket": [pdf["cur_bucket"].iloc[0]],
            "acc_bucket": [pdf["acc_bucket"].iloc[0]],
            **{f"s_{f}": [s] for f, s in zip(FACTORS, scores)},
        })

    schema = ("cur_bucket long, acc_bucket long, "
              + ", ".join(f"s_{f} double" for f in FACTORS))
    scores = pairs.groupBy("cur_bucket", "acc_bucket").applyInPandas(
        score_group, schema)

    prof = bucket_profile_df(spark, sf_dir)
    pa = prof.select(F.col("wbucket").alias("cur_bucket"),
                     F.col("n_days").alias("n_days_a"),
                     F.col("ft_count").alias("ft_a"))
    pb = prof.select(F.col("wbucket").alias("acc_bucket"),
                     F.col("n_days").alias("n_days_b"),
                     F.col("ft_count").alias("ft_b"))
    s = scores.join(pa, "cur_bucket").join(pb, "acc_bucket")
    ft_sim = F.greatest(
        F.lit(0.0),
        F.lit(1.0) - F.abs(F.col("ft_a") - F.col("ft_b"))
        / (F.greatest(F.col("ft_a"), F.col("ft_b"), F.lit(1)).cast("double")
           + F.lit(7.0)))
    base = (F.col("s_temp") + F.col("s_precip") + F.col("s_wind")
            + F.col("s_vis") + F.col("s_cloud") + ft_sim) / F.lit(6.0)
    valid = (F.col("n_days_a") >= C.MIN_WEATHER_DAYS_REQUIRED) & \
            (F.col("n_days_b") >= C.MIN_WEATHER_DAYS_REQUIRED)
    return s.select("cur_bucket", "acc_bucket",
                    F.when(valid, base).otherwise(F.lit(0.0))
                     .alias("weather_weight"))
