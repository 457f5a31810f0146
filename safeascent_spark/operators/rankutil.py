"""Banded distributed rank: a global (or per-group) dense row numbering
without a single-partition window sort.

The device (first used by ``text_length_histogram``, generalized here per
VERDICT r5 items 2/4): instead of ``row_number() OVER (PARTITION BY g
ORDER BY k)`` — which funnels every row of a peer group through ONE task —
rows are

1. assigned a BAND, any monotone integer function of the order key whose
   per-group band count is bounded (value range / band width, independent
   of corpus size),
2. ranked WITHIN (group, band) by a normal partitioned window — thousands
   of small independent sorts,
3. offset by the running row count of the lower bands, a window over the
   TINY (group, band) count table (|groups| x |bands| rows), broadcast
   back onto the data.

``rank = offset + rank_in_band`` reproduces the group-global row_number
bit-for-bit as long as equal order keys always land in the same band —
guaranteed because the band is a function of the order key alone.  The
DuckDB oracles keep the plain global window (mathematically identical);
only the Spark physical plan changes.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def banded_rank(df: DataFrame, group_cols: Sequence[str],
                band: Column, order_cols: Sequence[Column],
                rank_name: str = "rank",
                total_name: str | None = None,
                descending_bands: bool = False) -> DataFrame:
    """Add ``rank_name`` = row_number over (PARTITION BY group_cols ORDER BY
    order_cols) computed via the banded device, and optionally
    ``total_name`` = the peer-group row count.

    ``band`` must be monotone NON-DECREASING in the order key when
    ``descending_bands=False`` (ascending order), or monotone
    NON-INCREASING when ``descending_bands=True`` (the order key sorts
    descending and higher bands come first).  ``order_cols`` are the full
    deterministic order (including tie-breakers) WITHIN a band.
    """
    g = list(group_cols)
    banded = df.withColumn("__band", band.cast("bigint"))
    in_band = Window.partitionBy(*g, "__band").orderBy(*order_cols)
    ranked = banded.withColumn("__r_in", F.row_number().over(in_band))
    counts = banded.groupBy(*g, "__band").agg(
        F.count(F.lit(1)).cast("bigint").alias("__n"))
    band_order = (F.col("__band").desc() if descending_bands
                  else F.col("__band").asc())
    if g:
        off_w = (Window.partitionBy(*g).orderBy(band_order)
                       .rowsBetween(Window.unboundedPreceding, -1))
        tot_w = Window.partitionBy(*g)
    else:
        # a global rank (no group cols) still needs a window over the
        # tiny band-count table.  BOUNDEDNESS: `counts` has one row per
        # band — value range / band width, corpus-size-independent by the
        # caller's band contract — so the non-foldable constant key
        # (`__band % 1`, the vocab_df device) deliberately runs this
        # bounded table on one task; the audit allowlist records it.
        off_w = (Window.partitionBy(F.col("__band") % 1).orderBy(band_order)
                       .rowsBetween(Window.unboundedPreceding, -1))
        tot_w = Window.partitionBy(F.col("__band") % 1)
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__n").over(off_w),
                            F.lit(0).cast("bigint")))
    if total_name is not None:
        offsets = offsets.withColumn(total_name, F.sum("__n").over(tot_w))
    keep = ["__band", "__off"] + ([total_name] if total_name else [])
    out = (ranked.join(F.broadcast(offsets.select(*g, *keep)),
                       g + ["__band"])
                 .withColumn(rank_name,
                             (F.col("__off") + F.col("__r_in"))
                             .cast("bigint"))
                 .drop("__band", "__r_in", "__off"))
    return out


def banded_cumsum(df: DataFrame, group_cols: Sequence[str],
                  band: Column, order_cols: Sequence[Column],
                  val: Column | str, name: str,
                  inclusive: bool = True) -> DataFrame:
    """Add ``name`` = sum(val) OVER (PARTITION BY group_cols ORDER BY
    order_cols ROWS UNBOUNDED PRECEDING .. CURRENT ROW/-1) computed via
    the banded device — the prefix-sum twin of :func:`banded_rank`,
    first used inline by ``events_changepoint`` and generalized here.

    ``band`` must be monotone non-decreasing in the order key and its
    per-group band count bounded (value range / band width, independent
    of corpus size).  ``inclusive=False`` gives the strictly-below
    prefix (UNBOUNDED PRECEDING .. 1 PRECEDING, coalesced to 0)."""
    g = list(group_cols)
    v = F.col(val) if isinstance(val, str) else val
    banded = df.withColumn("__band", band.cast("bigint")) \
               .withColumn("__v", v.cast("bigint"))
    upper = 0 if inclusive else -1
    in_band = (Window.partitionBy(*g, "__band").orderBy(*order_cols)
                     .rowsBetween(Window.unboundedPreceding, upper))
    rows = banded.withColumn(
        "__c_in", F.coalesce(F.sum("__v").over(in_band),
                             F.lit(0).cast("bigint")))
    counts = banded.groupBy(*g, "__band").agg(
        F.sum("__v").cast("bigint").alias("__bn"))
    if g:
        off_w = (Window.partitionBy(*g).orderBy("__band")
                       .rowsBetween(Window.unboundedPreceding, -1))
    else:
        # groupless prefix: the offset window runs on the band-TOTALS
        # table (one row per band — bounded by the caller's band
        # contract), same rationale as banded_rank's allowlisted site
        off_w = (Window.partitionBy(F.col("__band") % 1).orderBy("__band")
                       .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.withColumn(
        "__off", F.coalesce(F.sum("__bn").over(off_w),
                            F.lit(0).cast("bigint")))
    return (rows.join(F.broadcast(offsets.select(*g, "__band", "__off")),
                      g + ["__band"])
                .withColumn(name, (F.col("__off") + F.col("__c_in"))
                                   .cast("bigint"))
                .drop("__band", "__v", "__c_in", "__off"))
