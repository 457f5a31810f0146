"""Custom stateful streaming operator via applyInPandasWithState.

The reference keeps per-location risk state implicitly in Redis between
nightly runs; the streaming-native form is an explicit keyed state: per
weather bucket we maintain a running exponential moving average of the
observation value and a count, emitting an updated row per micro-batch.
A timeout-free GroupState keeps this deterministic for availableNow tests.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from .. import domain
from .refresh import weather_update_stream

EMA_ALPHA = 0.2

STATE_SCHEMA = T.StructType([
    T.StructField("ema", T.DoubleType()),
    T.StructField("n", T.LongType()),
])
OUTPUT_SCHEMA = T.StructType([
    T.StructField("wbucket", T.LongType()),
    T.StructField("ema", T.DoubleType()),
    T.StructField("n_obs", T.LongType()),
])


def _update_ema(key: Any, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
    (wbucket,) = key
    if state.exists:
        ema, n = state.get
    else:
        ema, n = None, 0
    for pdf in pdfs:
        for v in pdf["value"]:
            v = float(v)
            ema = v if ema is None else EMA_ALPHA * v + (1 - EMA_ALPHA) * ema
            n += 1
    state.update((float(ema if ema is not None else 0.0), int(n)))
    yield pd.DataFrame({"wbucket": [wbucket], "ema": [ema], "n_obs": [n]})


def bucket_ema_stream(stream: DataFrame) -> DataFrame:
    """Keyed running EMA over the observation stream."""
    keyed = stream.select(
        (F.col("user_id") % domain.N_WBUCKETS).alias("wbucket"),
        F.col("value"))
    return keyed.groupBy("wbucket").applyInPandasWithState(
        _update_ema,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stateful_ema(spark: SparkSession, sf_dir: str, out_path: str,
                     timeout_sec: int = 180) -> int:
    """One availableNow pass of the stateful EMA; returns rows written.

    Each micro-batch APPENDS with its batch_id (an overwrite-per-batch sink
    would lose keys updated only in earlier batches when availableNow yields
    several); ``read_ema_state`` resolves latest-batch-wins per key."""
    rows = {"n": 0}

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        rows["n"] += batch_df.count()
        (batch_df.withColumn("batch_id", F.lit(batch_id))
                 .write.mode("append").parquet(out_path))

    q = (bucket_ema_stream(weather_update_stream(spark, sf_dir))
         .writeStream
         .outputMode("update")
         .foreachBatch(sink)
         .trigger(availableNow=True)
         .option("checkpointLocation", out_path + "_ckpt")
         .start())
    q.awaitTermination(timeout_sec)
    q.stop()
    return rows["n"]


def read_ema_state(spark: SparkSession, out_path: str) -> DataFrame:
    """Current EMA state per bucket: the row from the highest batch_id
    (update-mode emits one row per key per batch that touched it)."""
    from pyspark.sql import Window
    w = Window.partitionBy("wbucket").orderBy(F.col("batch_id").desc())
    return (spark.read.parquet(out_path)
                 .withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1)
                 .drop("_rn", "batch_id"))
