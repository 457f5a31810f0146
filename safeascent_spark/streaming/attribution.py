"""Streaming multi-touch linear attribution via keyed state.

The streaming form of ``operators/analytics.q_events_attribution``: per
user, a bounded buffer of recent view/click touches rides GroupState;
each purchase event splits its floored micro-value equally across the
buffered touches inside the trailing attribution window (remainder to
the earliest touches — the batch operator's exact integer contract) and
emits one row per (purchase, channel).

State bound: the buffer keeps only touches newer than (newest event seen
for the user - window), so state is O(touches per user per window), not
O(history).  Delivery contract: touches must not arrive in a LATER
micro-batch than a purchase they should fund (the standard event-time
caveat of state-buffer attribution); with ``availableNow`` over a static
file the whole feed lands in order, so the stream output aggregates to
EXACTLY the batch per-channel rollup — pinned in tests/test_wave6.py.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..operators.analytics import _ATTR_WINDOW_NS
from .refresh import weather_update_stream

STATE_SCHEMA = T.StructType([
    T.StructField("ts_list", T.ArrayType(T.LongType())),
    T.StructField("id_list", T.ArrayType(T.LongType())),
    T.StructField("ch_list", T.ArrayType(T.StringType())),
])
OUTPUT_SCHEMA = T.StructType([
    T.StructField("purchase_id", T.LongType()),
    T.StructField("channel", T.StringType()),
    T.StructField("n_touches", T.LongType()),
    T.StructField("attr_micro", T.LongType()),
])


def _attribute(key: Any, pdfs: Iterator[pd.DataFrame],
               state: GroupState) -> Iterator[pd.DataFrame]:
    touches: list[tuple[int, int, str]] = []
    if state.exists:
        ts_l, id_l, ch_l = state.get
        touches = list(zip(ts_l, id_l, ch_l))
    rows = []
    events = []
    for pdf in pdfs:
        for r in pdf.itertuples(index=False):
            events.append((int(r.ts), int(r.event_id),
                           str(r.event_type), float(r.value)))
    events.sort(key=lambda x: (x[0], x[1]))
    max_ts = 0
    for ts, eid, etype, value in events:
        max_ts = max(max_ts, ts)
        if etype in ("view", "click"):
            touches.append((ts, eid, etype))
        elif etype == "purchase":
            window = [t for t in touches
                      if ts - _ATTR_WINDOW_NS < t[0] <= ts]
            if not window:
                continue
            window.sort(key=lambda t: (t[0], t[1]))
            vm = math.floor(value * 1_000_000)
            n = len(window)
            q, r = vm // n, vm % n
            per_channel: dict[str, list[int]] = {}
            for i, (_, _, ch) in enumerate(window, start=1):
                share = q + (1 if i <= r else 0)
                agg = per_channel.setdefault(ch, [0, 0])
                agg[0] += 1
                agg[1] += share
            for ch, (nt, am) in sorted(per_channel.items()):
                rows.append((eid, ch, nt, am))
    # prune the buffer to the live window behind the newest event
    if max_ts:
        touches = [t for t in touches if t[0] > max_ts - _ATTR_WINDOW_NS]
    state.update(([t[0] for t in touches],
                  [t[1] for t in touches],
                  [t[2] for t in touches]))
    if rows:
        yield pd.DataFrame(rows, columns=["purchase_id", "channel",
                                          "n_touches", "attr_micro"])


def attribution_stream(stream: DataFrame) -> DataFrame:
    keyed = stream.select("user_id", "ts", "event_id",
                          "event_type", "value")
    return keyed.groupBy("user_id").applyInPandasWithState(
        _attribute,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_attribution(spark: SparkSession, sf_dir: str, out_path: str,
                    timeout_sec: int = 180) -> int:
    """One availableNow pass; appends (purchase, channel) attribution rows."""
    rows = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rows["n"] += batch_df.count()
        batch_df.write.mode("append").parquet(out_path)

    q = (attribution_stream(weather_update_stream(spark, sf_dir))
         .writeStream
         .outputMode("append")
         .foreachBatch(sink)
         .trigger(availableNow=True)
         .option("checkpointLocation", out_path + "_ckpt")
         .start())
    q.awaitTermination(timeout_sec)
    q.stop()
    return rows["n"]
