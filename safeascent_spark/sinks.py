"""Score-table sinks (SURVEY.md §2.1 S8/S9/S10).

The reference serves scores from Redis keyed (route_id, date) with TTLs and
upserts a `historical_predictions` table nightly with a 1-year retention
purge.  The Spark-native re-expression is a date-partitioned parquet result
table:

* S8 write  -> idempotent overwrite of the affected `prediction_date`
  partitions (dynamic partition overwrite = the MERGE/upsert analog when a
  whole date is recomputed, which is exactly the nightly pipeline's unit).
* S8 read   -> partition-pruned scan + broadcast semi-join of requested ids
  (the bulk-MGET analog, utils/cache.py:347-394).
* S9/S10 retention -> drop partitions older than the cutoff
  (safety_computation_optimized.py:896-905, cache.py:477-524).
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_scores(df: DataFrame, path: str, pred_date: str) -> None:
    """Write one date's scores into the partitioned result table.

    Dynamic partition overwrite keeps other dates intact — re-running a date
    is idempotent (the reference's ON CONFLICT DO UPDATE semantics at
    date-partition granularity).
    """
    spark = df.sparkSession
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    (df.withColumn("prediction_date", F.lit(pred_date))
       .write.mode("overwrite")
       .partitionBy("prediction_date")
       .parquet(path))


def read_scores(spark: SparkSession, path: str, pred_date: str,
                route_ids: list[int] | None = None) -> DataFrame:
    """Point-lookup serving read: partition prune on date, optional
    broadcast semi-join on the requested route ids."""
    df = spark.read.parquet(path).filter(
        F.col("prediction_date") == F.lit(pred_date))
    if route_ids is not None:
        ids = spark.createDataFrame([(int(i),) for i in route_ids],
                                    "route_id bigint")
        df = df.join(F.broadcast(ids), "route_id", "left_semi")
    return df


def list_partitions(path: str) -> list[str]:
    root = Path(path)
    if not root.exists():
        return []
    return sorted(p.name.split("=", 1)[1] for p in root.iterdir()
                  if p.is_dir() and p.name.startswith("prediction_date="))


def purge_old_partitions(path: str, keep_dates: set[str]) -> list[str]:
    """Retention: drop prediction_date partitions not in the keep-set.

    Partition drop is a metadata/file operation — no table rewrite — which
    is the scalable form of the reference's DELETE ... WHERE date < cutoff.
    """
    removed = []
    for d in list_partitions(path):
        if d not in keep_dates:
            shutil.rmtree(Path(path) / f"prediction_date={d}")
            removed.append(d)
    return removed


def write_bucketed(df: DataFrame, table: str, bucket_col: str,
                   n_buckets: int = 16) -> None:
    """Persist a table bucketed on its join key so later joins/aggregations
    on that key co-locate without a shuffle (the reference's PostGIS-index
    analog for the relational side).  Requires a catalog table (bucketBy is
    not supported for path-based writes).
    """
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, bucket_col)
       .sortBy(bucket_col)
       .saveAsTable(table))
