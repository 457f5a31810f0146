"""Streaming as-of enrichment: the availableNow pass over an in-order
source must reproduce the batch as-of join EXACTLY (same matched view
timestamps, same NULLs for never-viewed users), with O(1) state per key.
"""

from __future__ import annotations

from tests.conftest import SF_SMOKE


def test_streaming_asof_matches_batch_asof_exactly(spark, tmp_path):
    from safeascent_spark.operators import analytics as A
    from safeascent_spark.streaming import enrich_asof as EA

    out = str(tmp_path / "enriched")
    EA.run_enrich_asof(spark, SF_SMOKE, out)
    got = {r["event_id"]: (r["t_view"], r["gap_s"])
           for r in spark.read.parquet(out).collect()}

    want = {r["event_id"]: (r["t_view"], r["gap_s"])
            for r in A.q_events_asof_view(spark, SF_SMOKE).collect()}
    assert got == want and len(got) > 0


def test_streaming_asof_state_carries_across_batches(spark, tmp_path):
    """Split the feed into two files (two availableNow micro-batches with
    maxFilesPerTrigger=1): a view in batch 1 must enrich an error that
    only arrives in batch 2 — the single-value state carries forward."""
    import pandas as pd
    from pyspark.sql import functions as F
    from safeascent_spark.streaming import enrich_asof as EA
    from safeascent_spark import domain

    src = tmp_path / "feed"
    src.mkdir()
    base = pd.Timestamp("2024-01-01")
    pd.DataFrame([{"event_id": 1, "ts": base, "user_id": 9,
                   "event_type": "view", "value": 0.0, "props": "{}"}]) \
        .to_parquet(src / "a_events.parquet")
    pd.DataFrame([{"event_id": 2, "ts": base + pd.Timedelta(seconds=90),
                   "user_id": 9, "event_type": "error", "value": 0.0,
                   "props": "{}"}]) \
        .to_parquet(src / "b_events.parquet")

    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    raw_schema = spark.read.parquet(str(src / "a_events.parquet")).schema
    stream = domain.ts_to_nanos(
        spark.readStream.schema(raw_schema)
             .option("maxFilesPerTrigger", 1).parquet(str(src)))
    out = str(tmp_path / "enriched2")
    q = (EA.enriched_stream(stream)
         .writeStream.outputMode("append").format("parquet")
         .option("path", out)
         .option("checkpointLocation", out + "_ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    q.stop()

    rows = spark.read.parquet(out).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["event_id"] == 2 and r["t_view"] is not None
    assert r["gap_s"] == 90
