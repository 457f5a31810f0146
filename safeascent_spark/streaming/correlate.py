"""Stream-stream interval join (SURVEY §2.9): correlate two live event
feeds on key + time range with watermark-bounded state.

The reference's closest analog is request-log correlation in its API layer
(nightly batch over joined logs); the streaming-native form is Spark's
stream-stream inner join with a time-range condition: each side carries a
watermark, so the join state for a left row is dropped once the right
watermark passes ``left.time + CORR_WINDOW`` — bounded state at any input
rate, the property a 100 TB/day feed needs.  The SAME join expression runs
in batch mode (ground truth), and the driver-style query form carries a
DuckDB range-join oracle.

Semantics: for every ``error`` event, the same user's ``purchase`` events
in the following CORR_WINDOW_S seconds (a conversion-after-incident
funnel).  Inner join — unmatched errors expire silently.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .refresh import weather_update_stream
from .sessions import _with_event_time
from .. import domain

CORR_WINDOW_S = 1800          # 30 minutes
LEFT_TYPE = "error"
RIGHT_TYPE = "purchase"


def _sides(left: DataFrame, right: DataFrame):
    a = (left.filter(F.col("event_type") == LEFT_TYPE)
             .select(F.col("user_id").alias("a_user"),
                     F.col("event_id").alias("error_id"),
                     F.col("event_time").alias("a_time")))
    b = (right.filter(F.col("event_type") == RIGHT_TYPE)
              .select(F.col("user_id").alias("b_user"),
                      F.col("event_id").alias("purchase_id"),
                      F.col("value").alias("purchase_value"),
                      F.col("event_time").alias("b_time")))
    return a, b


def _correlate(a: DataFrame, b: DataFrame) -> DataFrame:
    cond = ((F.col("a_user") == F.col("b_user"))
            & (F.col("b_time") >= F.col("a_time"))
            & (F.col("b_time") <=
               F.col("a_time") + F.expr(f"INTERVAL {CORR_WINDOW_S} SECONDS")))
    return (a.join(b, cond)
             .select(F.col("a_user").alias("user_id"),
                     "error_id", "purchase_id", "purchase_value",
                     F.col("a_time").cast("long").alias("error_s"),
                     F.col("b_time").cast("long").alias("purchase_s")))


def correlated_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming form: two file-source streams (one per side — a
    stream-stream join needs independent sources), each watermarked by
    CORR_WINDOW so the right side's state for a left row is evicted as
    soon as no future match can arrive."""
    wm = f"{CORR_WINDOW_S} seconds"
    left = _with_event_time(weather_update_stream(spark, sf_dir)) \
        .withWatermark("event_time", wm)
    right = _with_event_time(weather_update_stream(spark, sf_dir)) \
        .withWatermark("event_time", wm)
    a, b = _sides(left, right)
    return _correlate(a, b)


def correlated_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The identical correlation as a batch query (ground truth)."""
    e = _with_event_time(domain.load_table(spark, sf_dir, "events"))
    a, b = _sides(e, e)
    return _correlate(a, b)


def q_events_correlated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked batch form, ordered for hash stability."""
    return correlated_batch(spark, sf_dir) \
        .orderBy("user_id", "error_id", "purchase_id")


def sql_events_correlated() -> str:
    return f"""
WITH ev AS (
  SELECT event_id, user_id, event_type, value,
         CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS et_s
  FROM events
)
SELECT a.user_id,
       a.event_id AS error_id,
       b.event_id AS purchase_id,
       b.value AS purchase_value,
       a.et_s AS error_s,
       b.et_s AS purchase_s
FROM ev a JOIN ev b
  ON a.user_id = b.user_id
 AND b.et_s >= a.et_s AND b.et_s <= a.et_s + {CORR_WINDOW_S}
WHERE a.event_type = '{LEFT_TYPE}' AND b.event_type = '{RIGHT_TYPE}'
ORDER BY a.user_id, error_id, purchase_id"""


def run_correlation(spark: SparkSession, sf_dir: str, out_path: str,
                    timeout_sec: int = 180) -> None:
    """One availableNow pass appending matched pairs to parquet."""
    q = (correlated_stream(spark, sf_dir)
         .writeStream
         .outputMode("append")
         .format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", out_path + "_ckpt")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout_sec)
    q.stop()
