"""Skew-mitigation utilities: salted two-stage aggregation and the
replicated-broadcast salted join.

AQE's skew-join handling covers sort-merge joins; these helpers cover the
two remaining hot spots of this engine at scale:

* a grouping key with extreme frequency skew (one location holding a large
  share of all routes) -> ``salted_sum``: pre-aggregate on (key, salt) so
  the hot key's rows split across ``n_salts`` reducers, then merge.
* a broadcast equi-join against a dimension where one probe-side key
  dominates -> ``replicate_broadcast_join``: replicate the dimension over
  salt values and join on (key, salt(probe)) so a hot key's probe rows hash
  to different build-bucket copies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def salted_sum(df: DataFrame, key_cols: list[str], value_col: str,
               out_col: str, n_salts: int = 16) -> DataFrame:
    """sum(value) per key via (key, salt) partial aggregation.

    Numerically this reassociates the sum (as any distributed sum does);
    use where the consumer tolerates float reassociation.
    """
    salted = df.withColumn("__salt", (F.rand(seed=42) * n_salts).cast("int"))
    partial = (salted.groupBy(*key_cols, "__salt")
                     .agg(F.sum(value_col).alias("__partial")))
    return (partial.groupBy(*key_cols)
                   .agg(F.sum("__partial").alias(out_col)))


def q_skew_salted_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checked salted aggregation over the biggest table (events):
    per user-bucket totals through the (key, salt) two-stage path.

    The summed value is an integer expression so the salt-induced
    reassociation is exact and the result hash-matches the oracle's plain
    GROUP BY — the query proves the salted plan computes the same answer."""
    from . import domain
    e = domain.load_table(spark, sf_dir, "events")
    keyed = e.select((F.col("user_id") % 100).alias("bucket"),
                     (F.col("event_id") % 1000).cast("bigint").alias("v"))
    out = salted_sum(keyed, ["bucket"], "v", "total")
    n = keyed.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_events"))
    return (out.join(n, "bucket")
               .select("bucket", F.col("total").cast("bigint").alias("total"),
                       F.col("n_events").cast("bigint").alias("n_events"))
               .orderBy("bucket"))


def sql_skew_salted_sum() -> str:
    return """
SELECT user_id % 100 AS bucket,
       CAST(sum(event_id % 1000) AS BIGINT) AS total,
       CAST(count(*) AS BIGINT) AS n_events
FROM events GROUP BY user_id % 100 ORDER BY bucket"""


def replicate_broadcast_join(probe: DataFrame, dim: DataFrame,
                             key: str, n_salts: int = 8,
                             how: str = "inner") -> DataFrame:
    """Broadcast join with the dimension replicated across salts.

    The probe side computes a deterministic salt from its row content; each
    dimension row is replicated n_salts times so every (key, salt) pair
    exists.  Useful when a single dimension key matches a huge probe
    fraction and the single build bucket becomes a hot spot.
    """
    spark = probe.sparkSession
    salts = spark.range(n_salts).select(F.col("id").cast("int").alias("__salt"))
    dim_rep = dim.crossJoin(salts)
    probe_s = probe.withColumn(
        "__salt", (F.abs(F.hash(*probe.columns)) % n_salts).cast("int"))
    joined = probe_s.join(F.broadcast(dim_rep), [key, "__salt"], how)
    return joined.drop("__salt")
