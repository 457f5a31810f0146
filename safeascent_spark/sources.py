"""Format-agnostic ingestion layer (SURVEY §2.1 sources, generalized).

The reference ingests from Postgres tables and HTTP APIs; the Spark-native
engine reads columnar files.  This module makes the format a detail:
every base table has an explicit schema (never schema-inference on CSV/JSON
— at 100 TB an inference pass is a full extra scan, and inferred types
drift), and ``read_table`` dispatches on format with identical downstream
semantics.  ``write_table`` produces the same table in any format for
round-trip tests and interchange.

Parquet stays the scale default (columnar pruning + predicate pushdown);
CSV/JSON are ingest/interchange formats that a real deployment would land
into parquet with exactly this mapping.

Limitation: CSV cannot carry nested types — Spark's CSV source rejects
array/map/struct columns on both write and read — so tables with an array
column (``embeddings``) are parquet/JSON only.  ``read_table``/
``write_table`` raise a clear ValueError up front instead of letting the
csv writer fail with an opaque AnalysisException mid-job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Explicit schemas for the driver's synthetic star schema.  TIMESTAMP(NANOS)
# columns are carried as nanosecond longs end-to-end (see domain.ts_seconds).
TABLE_SCHEMAS: dict[str, T.StructType] = {
    "events": T.StructType([
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]),
    "documents": T.StructType([
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]),
    "embeddings": T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]),
}

FORMATS = ("parquet", "csv", "json")


def _reject_nested_for_csv(schema: T.StructType) -> None:
    nested = [f.name for f in schema.fields
              if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))]
    if nested:
        raise ValueError(
            f"CSV cannot represent nested columns {nested}; "
            f"use parquet or json for this table")


def read_table(spark: SparkSession, path: str, name: str,
               fmt: str = "parquet") -> DataFrame:
    """Read a base table from any supported format with its fixed schema."""
    if fmt == "parquet":
        from . import domain
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return domain.ts_to_nanos(spark.read.parquet(path))
    schema = TABLE_SCHEMAS.get(name)
    if schema is None:
        raise ValueError(f"no explicit schema for table {name!r}; "
                         f"CSV/JSON ingestion requires one")
    if fmt == "csv":
        _reject_nested_for_csv(schema)
        return (spark.read.schema(schema)
                .option("header", "true").csv(path))
    if fmt == "json":
        return spark.read.schema(schema).json(path)
    if fmt == "orc":
        # ORC is columnar like parquet (stripe-level min/max indexes give
        # the same predicate-pushdown behavior); schema enforced so drift
        # surfaces at read, matching the CSV/JSON contract.
        return spark.read.schema(schema).orc(path)
    raise ValueError(f"unsupported format {fmt!r}")


def write_table(df: DataFrame, path: str, fmt: str = "parquet") -> None:
    """Write a table in any supported format (interchange / tests)."""
    w = df.write.mode("overwrite")
    if fmt == "parquet":
        w.parquet(path)
    elif fmt == "csv":
        _reject_nested_for_csv(df.schema)
        w.option("header", "true").csv(path)
    elif fmt == "json":
        w.json(path)
    elif fmt == "orc":
        w.orc(path)
    else:
        raise ValueError(f"unsupported format {fmt!r}")
