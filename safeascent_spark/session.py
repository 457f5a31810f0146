"""SparkSession factory tuned for the local[32] test harness.

At cluster scale the same code runs unchanged — only master/memory change;
AQE handles runtime re-planning (partition coalescing, skew joins).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "safeascent_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    parts = shuffle_partitions or int(cpus)
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # r12 (guide §3.1): let AQE rewrite a sort-merge join to a
        # shuffled-hash join when every post-shuffle partition of the
        # build side fits under the threshold — runtime-size-checked, so
        # at cluster scale an oversized build side keeps the spillable
        # SMJ.  128m matches the "build side must fit a task's execution
        # memory" budget of the production executor sizing (guide §5).
        .config("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
                os.environ.get("SPARK_GRAFT_SHJ_THRESHOLD", "128m"))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # driver-generated parquet stores TIMESTAMP(NANOS,false)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.ui.enabled", "false")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
