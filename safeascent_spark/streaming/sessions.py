"""Gap-based sessionization with ``session_window`` (SURVEY §2.9 / W3).

The batch engine detects climbing windows with a gaps-and-islands window
chain (operators/analytics.py W3); the streaming-native form is Spark's
``session_window`` — state merges events into variable-length sessions that
close when the event-time watermark passes the gap.  The SAME expression
runs in batch mode, which is how the test proves equivalence: every session
the stream emits (closed by the watermark) must appear identically in the
batch result over the same input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .refresh import weather_update_stream
from .. import domain

SESSION_GAP = "1 hour"


def _with_event_time(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "event_time", F.timestamp_seconds(F.expr("ts div 1000000000")))


def _sessionize(df: DataFrame) -> DataFrame:
    return (df.groupBy(F.session_window("event_time", SESSION_GAP).alias("sw"),
                       "user_id")
              .agg(F.count(F.lit(1)).alias("n_events"),
                   F.round(F.sum("value"), 6).alias("v_sum"))
              .select("user_id",
                      F.col("sw.start").alias("session_start"),
                      F.col("sw.end").alias("session_end"),
                      "n_events", "v_sum"))


def user_sessions_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sessionization: 1-hour-gap sessions per user with a
    watermark bounding state."""
    stream = _with_event_time(weather_update_stream(spark, sf_dir))
    return _sessionize(stream.withWatermark("event_time", SESSION_GAP))


def user_sessions_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The identical sessionization as a batch query (ground truth)."""
    e = domain.load_table(spark, sf_dir, "events")
    return _sessionize(_with_event_time(e))


def q_events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked batch form of the session_window operator: 1-hour-gap
    sessions per user, projected to integer epoch seconds (hash-stable
    across engines; a session's end is last event + gap)."""
    s = user_sessions_batch(spark, sf_dir)
    return (s.select("user_id",
                     F.col("session_start").cast("long").alias("start_s"),
                     F.col("session_end").cast("long").alias("end_s"),
                     F.col("n_events").cast("bigint").alias("n_events"),
                     "v_sum")
             .orderBy("user_id", "start_s"))


def sql_events_sessionization() -> str:
    """Gaps-and-islands mirror of session_window: break when the gap from
    the previous event exceeds 1 hour, cumulative-sum the breaks into
    session ids, end = last event + gap."""
    return """
WITH ev AS (
  SELECT user_id, CAST(epoch_ns(ts) // 1000000000 AS BIGINT) AS et_s, value
  FROM events
),
marked AS (
  SELECT user_id, et_s, value,
         CASE WHEN et_s - lag(et_s) OVER (PARTITION BY user_id ORDER BY et_s)
                   > 3600 THEN 1 ELSE 0 END AS brk
  FROM ev
),
sess AS (
  SELECT user_id, et_s, value,
         sum(brk) OVER (PARTITION BY user_id ORDER BY et_s
                        ROWS UNBOUNDED PRECEDING) AS sid
  FROM marked
)
SELECT user_id,
       min(et_s) AS start_s,
       max(et_s) + 3600 AS end_s,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 6) AS v_sum
FROM sess GROUP BY user_id, sid
ORDER BY user_id, start_s"""


def run_sessionization(spark: SparkSession, sf_dir: str, out_path: str,
                       timeout_sec: int = 180) -> int:
    """One availableNow pass; appends closed sessions to parquet.  Sessions
    still open when the input is exhausted stay in state (append mode emits
    only watermark-closed sessions) — the test accounts for that."""
    q = (user_sessions_stream(spark, sf_dir)
         .writeStream
         .outputMode("append")
         .format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", out_path + "_ckpt")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout_sec)
    q.stop()
    import glob
    files = glob.glob(out_path + "/*.parquet")
    return len(files)
