"""Sliding-window trending detection over the event stream.

The "what's hot right now" operator of a feed/monitoring service: counts
per event_type over a SLIDING event-time window (1 day long, 6 h slide),
watermark-bounded, appended to a windowed-counts sink as windows close;
the top-k ranking is a bounded batch read over the sink (the standard
two-tier pattern — the stream maintains the heavy aggregation, serving
ranks the tiny aggregate table).

Scale shape: streaming state is O(open windows x event types) — the slide
creates day/6h = 4 overlapping windows per event, all map-side combined
before the state store; no per-event state, no per-user state.  The
serving read ranks |windows| x |types| rows (tiny) with a per-window
WindowGroupLimit.

Determinism contract for tests: with availableNow over a static file and
append mode, every window older than (max event time - watermark) is
emitted exactly once, so the sink equals the batch computation over the
same file for those closed windows — pinned in
tests/test_trending_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .refresh import weather_update_stream

TREND_WINDOW = "1 day"
TREND_SLIDE = "6 hours"
TREND_WATERMARK = "1 hour"
TREND_TOP_K = 3


def windowed_type_counts(stream: DataFrame) -> DataFrame:
    """Sliding-window (window, event_type) counts with watermark."""
    with_time = stream.withColumn(
        "event_time", F.timestamp_seconds(F.expr("ts div 1000000000")))
    return (with_time
            .withWatermark("event_time", TREND_WATERMARK)
            .groupBy(F.window("event_time", TREND_WINDOW, TREND_SLIDE)
                      .alias("w"),
                     "event_type")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum(F.expr("CAST(floor(value * 1000) AS BIGINT)"))
                  .alias("v_milli")))


def run_trending(spark: SparkSession, sf_dir: str, out_path: str,
                 timeout_sec: int = 180) -> int:
    """One availableNow pass appending closed windows; returns rows written."""
    counts = windowed_type_counts(weather_update_stream(spark, sf_dir))
    flat = counts.select(
        F.col("w.start").cast("long").alias("w_start"),
        F.col("w.end").cast("long").alias("w_end"),
        "event_type", "n", "v_milli")
    q = (flat.writeStream
             .format("parquet")
             .option("path", out_path)
             .option("checkpointLocation", out_path + "/_chk")
             .outputMode("append")
             .trigger(availableNow=True)
             .start())
    q.awaitTermination(timeout_sec)
    return spark.read.parquet(out_path).count()


def read_trending_topk(spark: SparkSession, sink_path: str,
                       k: int = TREND_TOP_K) -> DataFrame:
    """Serving read: per closed window, the k most frequent event types
    (ties by event_type asc)."""
    t = spark.read.parquet(sink_path)
    w = Window.partitionBy("w_start").orderBy(
        F.col("n").desc(), F.col("event_type"))
    return (t.withColumn("rnk", F.row_number().over(w))
             .filter(F.col("rnk") <= k)
             .select("w_start", "w_end", F.col("rnk").cast("int").alias("rnk"),
                     "event_type", "n", "v_milli")
             .orderBy("w_start", "rnk"))
