"""Round-6 wave 13 (part): data-layout optimization diagnostics.

`layout_zorder` computes the Morton (Z-order) code of every accident's
(lat, lng) and reports per-Z-bucket occupancy + bounding-box
compactness — the readout behind Delta/Iceberg-style `Z-ORDER BY`
clustering decisions: records that share a Z-prefix are spatially
co-located, so writing the table sorted by zcode turns bbox/radius
queries (F7, S2) into contiguous row-group scans with tight min/max
pruning instead of full-table reads.  At 100 TB this IS the difference
between a partition-pruned scan and a shuffle-everything scan; the
engine must be able to measure it on itself.

Reference scope: the reference serves bbox queries from a SQL table
with lat/lng b-tree indexes (backend/app/services/mp_routes.py radius
scans); a columnar lake needs layout clustering instead — this is the
Spark-native replacement, beyond-reference per SURVEY §2 scoping.

Exactness: cell quantization is ONE identical IEEE expression per
coordinate floored once (the accidents_density_grid convention); the
Morton interleave is pure non-negative integer div/mod arithmetic —
no bit-op dialect differences between the engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import domain

Z_BITS = 10                  # 10 bits per axis -> 20-bit Morton code
Z_BUCKET_SHIFT = 8           # report at the top-12-bit bucket grain


def _quant_exprs() -> tuple[str, str]:
    """Identical-text quantizers for both engines (clamped 0..1023)."""
    qlat = ("least(1023, greatest(0, CAST(floor((latitude + 90.0) "
            "* 1024.0 / 180.0) AS BIGINT)))")
    qlng = ("least(1023, greatest(0, CAST(floor((longitude + 180.0) "
            "* 1024.0 / 360.0) AS BIGINT)))")
    return qlat, qlng


def _morton_expr(qlat: str, qlng: str, divop: str) -> str:
    """Bit interleave via integral div/mod arithmetic.  `divop` is the
    dialect's integral division ('div' for Spark, '//' for DuckDB);
    all operands are non-negative so the two agree exactly."""
    terms = []
    for b in range(Z_BITS):
        terms.append(f"((({qlat}) {divop} {2 ** b}) % 2)"
                     f" * {2 ** (2 * b + 1)}")
        terms.append(f"((({qlng}) {divop} {2 ** b}) % 2)"
                     f" * {2 ** (2 * b)}")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def q_layout_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    a = domain.accidents_df(spark, sf_dir)
    qlat, qlng = _quant_exprs()
    morton = _morton_expr("qlat", "qlng", "div")
    cells = a.selectExpr(f"{qlat} AS qlat", f"{qlng} AS qlng") \
             .selectExpr("qlat", "qlng", f"{morton} AS zcode")
    return (cells.groupBy(F.expr(f"zcode div {2 ** Z_BUCKET_SHIFT}")
                           .alias("zbucket"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_accidents"),
             F.min("qlat").cast("bigint").alias("lat_lo"),
             F.max("qlat").cast("bigint").alias("lat_hi"),
             F.min("qlng").cast("bigint").alias("lng_lo"),
             F.max("qlng").cast("bigint").alias("lng_hi"))
        .select("zbucket", "n_accidents", "lat_lo", "lat_hi",
                "lng_lo", "lng_hi",
                # occupancy of the bucket's own bbox: high = well-packed
                F.expr("n_accidents * 1000000 div "
                       "((lat_hi - lat_lo + 1) * (lng_hi - lng_lo + 1))")
                 .alias("packing_ppm"))
        .orderBy("zbucket"))


def sql_layout_zorder() -> str:
    from .analytics import _DOMAIN_WITH
    qlat, qlng = _quant_exprs()
    morton = _morton_expr("qlat", "qlng", "//")
    return f"""{_DOMAIN_WITH},
cells AS (
  SELECT qlat, qlng, {morton} AS zcode
  FROM (SELECT {qlat} AS qlat, {qlng} AS qlng FROM accidents)
)
SELECT zcode // {2 ** Z_BUCKET_SHIFT} AS zbucket,
       CAST(count(*) AS BIGINT) AS n_accidents,
       CAST(min(qlat) AS BIGINT) AS lat_lo,
       CAST(max(qlat) AS BIGINT) AS lat_hi,
       CAST(min(qlng) AS BIGINT) AS lng_lo,
       CAST(max(qlng) AS BIGINT) AS lng_hi,
       CAST(count(*) * 1000000
            // ((max(qlat) - min(qlat) + 1) * (max(qlng) - min(qlng) + 1))
            AS BIGINT) AS packing_ppm
FROM cells
GROUP BY zbucket
ORDER BY zbucket"""
