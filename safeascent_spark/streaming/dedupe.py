"""Streaming exact-dedup with ``dropDuplicatesWithinWatermark`` (§2.9).

Ingest feeds are at-least-once (Kafka redelivery, file-drop retries), so
the first stateful operator of a streaming training-data pipeline is
event-id dedup.  Spark's ``dropDuplicatesWithinWatermark`` keeps the seen
set bounded by the event-time watermark — state for an id is dropped once
the watermark passes it, which is the only way a forever-running dedup
survives at scale (a plain ``dropDuplicates`` on a stream grows state
without bound).

Tested by replaying the events feed twice (a union of the source with
itself — every record delivered exactly twice) and asserting the deduped
stream emits each event_id exactly once, matching the batch distinct.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .refresh import weather_update_stream

DEDUP_WATERMARK = "1 hour"


def _with_event_time(df: DataFrame) -> DataFrame:
    return df.withColumn(
        "event_time", F.timestamp_seconds(F.expr("ts div 1000000000")))


def duplicated_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events feed with every record delivered twice — the at-least-once
    redelivery simulation used by the test."""
    s = weather_update_stream(spark, sf_dir)
    return s.unionAll(s)


def deduped_event_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-bounded streaming dedup on event_id."""
    dup = _with_event_time(duplicated_event_stream(spark, sf_dir))
    return (dup.withWatermark("event_time", DEDUP_WATERMARK)
               .dropDuplicatesWithinWatermark(["event_id"]))
