"""banded_rank must reproduce the plain window row_number bit-for-bit —
grouped and global, with ties, under any band width."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from safeascent_spark.operators.rankutil import banded_rank


def _rows(n=500):
    # adversarial: heavy ties (v % 17), tiny and huge bands, two groups
    return [(i, f"g{i % 2}", float((i * 7) % 17)) for i in range(n)]


def test_banded_rank_equals_plain_window_grouped(spark):
    df = spark.createDataFrame(_rows(), ["id", "g", "v"])
    for width in (1, 4, 1000):  # 17 bands, 5 bands, 1 band
        got = banded_rank(
            df, ["g"], band=F.floor(F.col("v") / width),
            order_cols=[F.col("v"), F.col("id")],
            rank_name="r", total_name="n")
        want = df.withColumn(
            "r", F.row_number().over(
                Window.partitionBy("g").orderBy("v", "id"))
        ).withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")))
        g = {(x.id): (x.r, x.n) for x in got.collect()}
        w = {(x.id): (x.r, x.n) for x in want.collect()}
        assert g == w, f"width={width}"


def test_banded_rank_equals_plain_window_global_descending(spark):
    df = spark.createDataFrame(_rows(), ["id", "g", "v"])
    got = banded_rank(
        df, [], band=F.floor(F.col("v") / 4),
        order_cols=[F.col("v").desc(), F.col("id")],
        rank_name="r", descending_bands=True)
    want = df.withColumn(
        "r", F.row_number().over(
            Window.orderBy(F.col("v").desc(), F.col("id"))))
    g = {x.id: x.r for x in got.collect()}
    w = {x.id: x.r for x in want.collect()}
    assert g == w
