"""Streaming as-of enrichment: carry each key's latest dimension value
onto fact events with O(1) state per key.

The streaming analog of ``analytics.q_events_asof_view`` (and of the
classic "enrich clicks with the user's last profile update"): per user,
keep ONLY the most recent 'view' timestamp as keyed state and stamp every
'error' event with it.  Contrast with the stream-stream interval join
(``correlate.py``), whose state buffers whole rows for the watermark
horizon — last-value enrichment needs a single value per key, so state
is bounded by |keys| regardless of rate or window.

Semantics contract: within a micro-batch, rows are processed in event-ts
order (exact); across batches the state carries forward, so results equal
the batch as-of join whenever the source replays in event order (pinned
by the availableNow parity test).  Late (out-of-order) arrivals degrade
to as-of-what-has-arrived — the standard last-value enrichment semantics;
use the batch operator for retrospective exactness.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from .refresh import weather_update_stream

LEFT_TYPE = "error"    # fact side (enriched)
RIGHT_TYPE = "view"    # dimension side (carried)

STATE_SCHEMA = T.StructType([
    T.StructField("t_view", T.LongType()),
])
OUTPUT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("t_err", T.LongType()),
    T.StructField("t_view", T.LongType()),
    T.StructField("gap_s", T.LongType()),
])


def _enrich(key: Any, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    t_view = state.get[0] if state.exists else None
    out = []
    for pdf in pdfs:
        # event-ts order within the batch; the view-first tie rule at an
        # identical ns matches the batch operator's (ts, tag) sort
        pdf = pdf.assign(_tag=(pdf["event_type"] == LEFT_TYPE).astype(int))
        for row in pdf.sort_values(["ts", "_tag"]).itertuples():
            if row.event_type == RIGHT_TYPE:
                if t_view is None or row.ts > t_view:
                    t_view = int(row.ts)
            else:
                out.append((int(row.event_id), int(user_id), int(row.ts),
                            t_view,
                            None if t_view is None
                            else (int(row.ts) - t_view) // 1_000_000_000))
    if t_view is not None:
        state.update((int(t_view),))
    # nullable Int64 arrays: a plain int column with a None would coerce
    # to float64 and corrupt ns timestamps above 2^53
    cols = list(zip(*out)) if out else [[]] * 5
    yield pd.DataFrame({
        "event_id": pd.array(cols[0], dtype="int64"),
        "user_id": pd.array(cols[1], dtype="int64"),
        "t_err": pd.array(cols[2], dtype="int64"),
        "t_view": pd.array(cols[3], dtype="Int64"),
        "gap_s": pd.array(cols[4], dtype="Int64"),
    })


def enriched_stream(stream: DataFrame) -> DataFrame:
    """Last-value as-of enrichment over a raw event stream."""
    keyed = (stream.filter(F.col("event_type").isin(LEFT_TYPE, RIGHT_TYPE))
                   .select("user_id", "event_id", "event_type", "ts"))
    return keyed.groupBy("user_id").applyInPandasWithState(
        _enrich,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_enrich_asof(spark: SparkSession, sf_dir: str, out_path: str,
                    timeout_sec: int = 180) -> None:
    """One availableNow pass appending enriched facts to parquet."""
    q = (enriched_stream(weather_update_stream(spark, sf_dir))
         .writeStream
         .outputMode("append")
         .format("parquet")
         .option("path", out_path)
         .option("checkpointLocation", out_path + "_ckpt")
         .trigger(availableNow=True)
         .start())
    q.awaitTermination(timeout_sec)
    q.stop()
