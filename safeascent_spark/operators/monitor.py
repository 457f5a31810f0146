"""Round-6 wave 5 (part): production data-monitoring operators.

* `events_psi_drift` — Population Stability Index per event type between
  the early and late halves of the stream: THE standard feature-drift
  alarm in ML-ops (a PSI above ~0.2 conventionally blocks a model
  refresh).  Bucketed on fixed value ranges so the statistic is
  mergeable and history-free.
* `dq_skew_profile` — per join/aggregation key column: cardinality, the
  heaviest key and its share, and the max/mean skew ratio — the
  diagnostic a Spark operator consults before choosing salting or AQE
  skew hints (the repo's skew.py path).  An engine that plans 100 TB
  joins needs this profile ON the engine, not in a notebook.

Exactness: all counts are exact BIGINTs; PSI's one float product per
(type, bucket) cell follows the NB micro-nat convention (identical
expression on identical integer-derived doubles, floored once per
bounded cell) and the per-type sum is an exact BIGINT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import domain

PSI_BUCKET_WIDTH = 50          # value in [0, ~500): ~10 live buckets
PSI_SCALE = 1_000_000


def q_events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = domain.load_table(spark, sf_dir, "events")
    mid = e.agg(F.expr("(min(ts) + (max(ts) - min(ts)) div 2) AS mid"))
    base = (e.crossJoin(F.broadcast(mid))
             .select("event_type",
                     F.expr(f"CAST(floor(value / {PSI_BUCKET_WIDTH}) "
                            "AS BIGINT)").alias("bucket"),
                     (F.col("ts") <= F.col("mid")).alias("early")))
    cell = (base.groupBy("event_type", "bucket")
                .agg(F.sum(F.when(F.col("early"), 1).otherwise(0))
                      .cast("bigint").alias("p"),
                     F.sum(F.when(F.col("early"), 0).otherwise(1))
                      .cast("bigint").alias("q")))
    tot = (cell.groupBy("event_type")
               .agg(F.sum("p").alias("ptot"), F.sum("q").alias("qtot"),
                    F.count(F.lit(1)).alias("n_buckets")))
    # Laplace +1 per cell keeps every ratio finite; the single float
    # product per bounded cell is floored once (NB convention)
    term = F.expr(f"""CAST(floor({PSI_SCALE} *
        ((CAST(p + 1 AS DOUBLE) / (ptot + n_buckets)
          - CAST(q + 1 AS DOUBLE) / (qtot + n_buckets))
         * ln((CAST(p + 1 AS DOUBLE) / (ptot + n_buckets))
              / (CAST(q + 1 AS DOUBLE) / (qtot + n_buckets)))))
        AS BIGINT)""")
    return (cell.join(F.broadcast(tot), "event_type")
                .select("event_type", "p", "q", "ptot", "qtot",
                        "n_buckets", term.alias("term_micro"))
                .groupBy("event_type")
                .agg(F.max("ptot").alias("n_early"),
                     F.max("qtot").alias("n_late"),
                     F.max("n_buckets").cast("bigint").alias("n_buckets"),
                     F.sum("term_micro").cast("bigint").alias("psi_micro"))
                .orderBy("event_type"))


def sql_events_psi_drift() -> str:
    return f"""
WITH mid AS (
  SELECT epoch_ns(min(ts))
         + (epoch_ns(max(ts)) - epoch_ns(min(ts))) // 2 AS mid
  FROM events
),
base AS (
  SELECT event_type,
         CAST(floor(value / {PSI_BUCKET_WIDTH}) AS BIGINT) AS bucket,
         epoch_ns(ts) <= mid.mid AS early
  FROM events CROSS JOIN mid
),
cell AS (
  SELECT event_type, bucket,
         CAST(sum(CASE WHEN early THEN 1 ELSE 0 END) AS BIGINT) AS p,
         CAST(sum(CASE WHEN early THEN 0 ELSE 1 END) AS BIGINT) AS q
  FROM base GROUP BY event_type, bucket
),
tot AS (
  SELECT event_type, sum(p) AS ptot, sum(q) AS qtot,
         count(*) AS n_buckets
  FROM cell GROUP BY event_type
),
terms AS (
  SELECT c.event_type, t.ptot, t.qtot, t.n_buckets,
         CAST(floor({PSI_SCALE} *
             ((CAST(c.p + 1 AS DOUBLE) / (t.ptot + t.n_buckets)
               - CAST(c.q + 1 AS DOUBLE) / (t.qtot + t.n_buckets))
              * ln((CAST(c.p + 1 AS DOUBLE) / (t.ptot + t.n_buckets))
                   / (CAST(c.q + 1 AS DOUBLE) / (t.qtot + t.n_buckets)))))
             AS BIGINT) AS term_micro
  FROM cell c JOIN tot t USING (event_type)
)
SELECT event_type,
       CAST(max(ptot) AS BIGINT) AS n_early,
       CAST(max(qtot) AS BIGINT) AS n_late,
       CAST(max(n_buckets) AS BIGINT) AS n_buckets,
       CAST(sum(term_micro) AS BIGINT) AS psi_micro
FROM terms
GROUP BY event_type
ORDER BY event_type"""


# --- Key-skew profile ---------------------------------------------------------
# Scale shape: one map-side-combined (key) count per profiled column,
# re-aggregated to a single row each — the heavy key is an argmax over
# the count table (TakeOrdered semantics via max(struct)), never a sort
# of raw rows.  Output: one row per profiled column.

_PROFILE_COLS = [
    ("events", "user_id"),
    ("events", "event_type"),
    ("lineitem", "l_partkey"),
    ("lineitem", "l_orderkey"),
    ("orders", "o_custkey"),
    ("documents", "source"),
]


def q_dq_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for table, col in _PROFILE_COLS:
        t = domain.load_table(spark, sf_dir, table)
        counts = (t.groupBy(F.col(col).cast("string").alias("k"))
                   .agg(F.count(F.lit(1)).cast("bigint").alias("c")))
        # argmax by (count desc, key asc) as max(struct(c, negkey?)) —
        # keys are strings, so take min key among max-count rows via a
        # two-level aggregate
        prof = (counts.agg(
            F.sum("c").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_distinct"),
            F.max("c").alias("max_c")))
        top = (counts.join(F.broadcast(prof), F.col("c") == F.col("max_c"))
                     .agg(F.min("k").alias("top_key"),
                          F.max("c").alias("top_count"),
                          F.max("n_rows").alias("n_rows"),
                          F.max("n_distinct").alias("n_distinct")))
        parts.append(top.select(
            F.lit(table).alias("table_name"),
            F.lit(col).alias("column_name"),
            F.col("n_rows").cast("bigint").alias("n_rows"),
            "n_distinct", "top_key",
            F.col("top_count").cast("bigint").alias("top_count"),
            # skew ratio = top_count / (n_rows / n_distinct), in milli;
            # the numerator rides DECIMAL(38,0) (top_count * n_distinct
            # can pass int64 at corpus scale)
            F.expr("CAST(CAST(top_count AS DECIMAL(38,0)) * n_distinct "
                   "* 1000 div n_rows AS BIGINT)")
             .alias("skew_ratio_milli")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("table_name", "column_name")


def sql_dq_skew_profile() -> str:
    legs = []
    for table, col in _PROFILE_COLS:
        legs.append(f"""
SELECT '{table}' AS table_name, '{col}' AS column_name,
       CAST((SELECT count(*) FROM {table}) AS BIGINT) AS n_rows,
       CAST((SELECT count(DISTINCT {col}) FROM {table}) AS BIGINT)
         AS n_distinct,
       (SELECT CAST({col} AS VARCHAR) FROM {table}
        GROUP BY {col} ORDER BY count(*) DESC, CAST({col} AS VARCHAR)
        LIMIT 1) AS top_key,
       (SELECT CAST(count(*) AS BIGINT) FROM {table}
        GROUP BY {col} ORDER BY count(*) DESC, CAST({col} AS VARCHAR)
        LIMIT 1) AS top_count""")
    union = "\nUNION ALL\n".join(legs)
    return f"""
SELECT table_name, column_name, n_rows, n_distinct, top_key, top_count,
       CAST(CAST(top_count AS HUGEINT) * n_distinct * 1000 // n_rows
            AS BIGINT) AS skew_ratio_milli
FROM ({union})
ORDER BY table_name, column_name"""


# --- dq_column_profile: the one-pass column profiler --------------------------
# Null rate, distinct count, and min/max per column — the first thing a
# pipeline runs on a new drop before any join/dedup planning (it feeds
# dq_skew_profile's choice of keys and dq_assertions' thresholds).
#
# Shape: ONE aggregate row computes all five columns' stats in a single
# fact pass (Spark plans the multi-count-distinct via one Expand — a
# x5 row multiplication streamed through a map-side-combined aggregate,
# NOT five scans), then a bounded 5-row unpivot presents it long-form.
# Profiled values are pre-cast to exact engine-neutral forms (BIGINT /
# string / date-string) so min/max render identically in both engines.

_PROFILE_SPEC = [
    # name, exact projected expression (shared syntax), kind (num|str)
    ("o_orderkey", "CAST(o_orderkey AS BIGINT)", "num"),
    ("o_custkey", "CAST(o_custkey AS BIGINT)", "num"),
    ("o_orderstatus", "o_orderstatus", "str"),
    ("o_totalprice_c", "CAST(floor(o_totalprice * 100) AS BIGINT)", "num"),
    ("o_orderpriority", "o_orderpriority", "str"),
]


def q_dq_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = domain.load_table(spark, sf_dir, "orders")
    # One scan, then an in-row unpivot to (col_name, value) pairs and a
    # DISTRIBUTED two-level aggregate: groupBy (col_name, value) first
    # (map-side-combined dedup across the cluster), THEN a per-column
    # rollup of the deduped frame.  The naive multi-count-distinct form
    # plans as a SortAggregate whose per-column distinct-value SETS are
    # merged on a SINGLE partition — one task holding every distinct
    # o_orderkey at 100 TB.  Numeric values ride a typed v_num lane so
    # min/max stay numeric (never lexicographic); strings render last.
    stack = ", ".join(
        (f"'{n}', CAST(({e}) AS STRING), ({e})" if kind == "num"
         else f"'{n}', ({e}), CAST(NULL AS BIGINT)")
        for n, e, kind in _PROFILE_SPEC)
    pairs = o.selectExpr(
        f"stack({len(_PROFILE_SPEC)}, {stack}) AS (col_name, v_str, v_num)")
    dedup = (pairs.groupBy("col_name", "v_str")
                  .agg(F.count(F.lit(1)).cast("long").alias("c"),
                       F.max("v_num").alias("v_num")))
    num_cols = {n for n, _, k in _PROFILE_SPEC if k == "num"}
    num_in = ", ".join(f"'{n}'" for n in sorted(num_cols))
    return (dedup.groupBy("col_name")
        .agg(F.expr("CAST(sum(c) AS BIGINT)").alias("n_rows_t"),
             F.expr("CAST(sum(CASE WHEN v_str IS NULL THEN 0 ELSE c END) "
                    "AS BIGINT)").alias("n_nonnull"),
             F.expr("CAST(count(v_str) AS BIGINT)").alias("n_distinct"),
             F.expr(f"CASE WHEN max(col_name) IN ({num_in}) "
                    "THEN CAST(min(v_num) AS STRING) ELSE min(v_str) END")
              .alias("min_val"),
             F.expr(f"CASE WHEN max(col_name) IN ({num_in}) "
                    "THEN CAST(max(v_num) AS STRING) ELSE max(v_str) END")
              .alias("max_val"))
        .selectExpr("col_name", "n_rows_t AS n_rows", "n_nonnull",
                    "CAST(n_rows_t - n_nonnull AS BIGINT) AS n_null",
                    "n_distinct", "min_val", "max_val")
        .orderBy("col_name"))


def sql_dq_column_profile() -> str:
    legs = []
    for n, e, _kind in _PROFILE_SPEC:
        legs.append(f"""
  SELECT '{n}' AS col_name,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(count(v) AS BIGINT) AS n_nonnull,
         CAST(count(*) - count(v) AS BIGINT) AS n_null,
         CAST(count(DISTINCT v) AS BIGINT) AS n_distinct,
         CAST(min(v) AS VARCHAR) AS min_val,
         CAST(max(v) AS VARCHAR) AS max_val
  FROM (SELECT ({e}) AS v FROM orders)""")
    return "SELECT * FROM (" + "\nUNION ALL".join(legs) + \
           ")\nORDER BY col_name"


# --- dq_k_anonymity: small-group suppression ---------------------------------
# Privacy-governance gate: grouping the corpus by quasi-identifiers
# (lang, source), any group smaller than K is SUPPRESSED — its members
# are reported only through one aggregate catch-all row.  This is the
# k-anonymity release shape (Sweeney 2002) every shared-dataset export
# runs; on-engine it is one aggregate + a bounded CASE re-aggregate,
# no row-level second pass.

K_ANON = 10


def q_dq_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = domain.load_table(spark, sf_dir, "documents")
    g = (d.groupBy("lang", "source")
          .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs")))
    # bounded re-aggregate: |lang|x|source| rows in, released + 1 out
    return (g.select(
                F.when(F.col("n_docs") >= K_ANON, F.col("lang"))
                 .otherwise(F.lit("*")).alias("lang"),
                F.when(F.col("n_docs") >= K_ANON, F.col("source"))
                 .otherwise(F.lit("*")).alias("source"),
                "n_docs",
                F.when(F.col("n_docs") >= K_ANON, F.lit(0))
                 .otherwise(F.lit(1)).alias("suppressed"))
             .groupBy("lang", "source")
             .agg(F.sum("n_docs").cast("bigint").alias("n_docs"),
                  F.sum("suppressed").cast("bigint")
                   .alias("n_suppressed_groups"))
             .orderBy("lang", "source"))


def sql_dq_k_anonymity() -> str:
    return f"""
WITH g AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY lang, source
)
SELECT CASE WHEN n_docs >= {K_ANON} THEN lang ELSE '*' END AS lang,
       CASE WHEN n_docs >= {K_ANON} THEN source ELSE '*' END AS source,
       CAST(sum(n_docs) AS BIGINT) AS n_docs,
       CAST(sum(CASE WHEN n_docs >= {K_ANON} THEN 0 ELSE 1 END) AS BIGINT)
         AS n_suppressed_groups
FROM g
GROUP BY 1, 2
ORDER BY 1, 2"""


# --- Exact per-type latency percentiles (P50/P90/P99) --------------------------
# The SLO readout: exact 50th/90th/99th percentiles of `value` per event
# type.  events_approx_stats serves the mergeable-sketch path; THIS is
# the exact path, and neither uses a global sort: ranks come from
# operators/rankutil.banded_rank (value-range bands -> thousands of
# small in-band sorts + a tiny offset table).  The percentile element is
# the lower-interpolation order statistic idx = (n-1)*p//100 + 1, an
# integer pick — no float interpolation, hash-exact.

PCT_BAND_MICRO = 50_000_000      # 50-unit value bands (~10 live bands)
PCT_POINTS = (50, 90, 99)


def _pct_ranked(spark: SparkSession, sf_dir: str):
    from pyspark.sql import functions as F  # noqa: F811 (local alias)
    from .rankutil import banded_rank
    e = (domain.load_table(spark, sf_dir, "events")
         .select("event_type", "event_id",
                 F.expr("CAST(floor(value * 1000000) AS BIGINT)")
                  .alias("v_micro")))
    return banded_rank(
        e, ["event_type"], band=F.expr(f"v_micro div {PCT_BAND_MICRO}"),
        order_cols=[F.col("v_micro").asc(), F.col("event_id").asc()],
        rank_name="rnk", total_name="n")


def q_events_latency_percentiles(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    ranked = _pct_ranked(spark, sf_dir)
    picks = []
    for p in PCT_POINTS:
        idx = f"((n - 1) * {p} div 100 + 1)"
        picks.append(
            F.expr(f"CAST(max(CASE WHEN rnk = {idx} THEN v_micro END) "
                   f"AS BIGINT)").alias(f"p{p}_micro"))
    return (ranked.groupBy("event_type")
                  .agg(F.max("n").cast("bigint").alias("n_events"), *picks)
                  .orderBy("event_type"))


def sql_events_latency_percentiles() -> str:
    picks = ", ".join(
        f"CAST(max(CASE WHEN rnk = ((n - 1) * {p} // 100 + 1) "
        f"THEN v_micro END) AS BIGINT) AS p{p}_micro"
        for p in PCT_POINTS)
    return f"""
WITH v AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1000000) AS BIGINT) AS v_micro
  FROM events
),
ranked AS (
  SELECT event_type, v_micro,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v_micro, event_id) AS rnk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
)
SELECT event_type, CAST(max(n) AS BIGINT) AS n_events, {picks}
FROM ranked
GROUP BY event_type
ORDER BY event_type"""


# --- Robust outlier detection: median absolute deviation ----------------------
# events_anomaly's z-score path breaks when the contamination it hunts
# inflates the mean/stdev it thresholds on; the MAD detector is the
# robust standard (50% breakdown point).  Both the median and the MAD
# are exact banded-rank order statistics — two bounded passes, no
# global sort, no float summary statistics anywhere.

MAD_K = 3                        # flag |x - med| > K * MAD


def q_events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .rankutil import banded_rank
    ranked = _pct_ranked(spark, sf_dir)
    med = (ranked.groupBy("event_type")
                 .agg(F.expr("CAST(max(CASE WHEN rnk = ((n - 1) * 50 div "
                             "100 + 1) THEN v_micro END) AS BIGINT)")
                       .alias("median_micro")))
    dev = (ranked.join(F.broadcast(med), "event_type")
                 .select("event_type", "event_id", "v_micro", "median_micro",
                         F.expr("abs(v_micro - median_micro)")
                          .alias("dev_micro")))
    dranked = banded_rank(
        dev, ["event_type"],
        band=F.expr(f"dev_micro div {PCT_BAND_MICRO}"),
        order_cols=[F.col("dev_micro").asc(), F.col("event_id").asc()],
        rank_name="drnk", total_name="dn")
    mad = (dranked.groupBy("event_type")
                  .agg(F.expr("CAST(max(CASE WHEN drnk = ((dn - 1) * 50 div "
                              "100 + 1) THEN dev_micro END) AS BIGINT)")
                        .alias("mad_micro")))
    return (dev.join(F.broadcast(mad), "event_type")
               .groupBy("event_type")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                    F.max("median_micro").cast("bigint")
                     .alias("median_micro"),
                    F.max("mad_micro").cast("bigint").alias("mad_micro"),
                    F.expr(f"CAST(sum(CASE WHEN dev_micro > {MAD_K} * "
                           "mad_micro THEN 1 ELSE 0 END) AS BIGINT)")
                     .alias("n_outliers"))
               .orderBy("event_type"))


def sql_events_mad_outliers() -> str:
    return f"""
WITH v AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1000000) AS BIGINT) AS v_micro
  FROM events
),
ranked AS (
  SELECT event_type, v_micro,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v_micro, event_id) AS rnk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
med AS (
  SELECT event_type,
         CAST(max(CASE WHEN rnk = ((n - 1) * 50 // 100 + 1)
                       THEN v_micro END) AS BIGINT) AS median_micro
  FROM ranked GROUP BY event_type
),
dev AS (
  SELECT v.event_type, v.event_id, v.v_micro, m.median_micro,
         abs(v.v_micro - m.median_micro) AS dev_micro
  FROM v JOIN med m ON v.event_type = m.event_type
),
dranked AS (
  SELECT event_type, dev_micro,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY dev_micro, event_id) AS drnk,
         count(*) OVER (PARTITION BY event_type) AS dn
  FROM dev
),
mad AS (
  SELECT event_type,
         CAST(max(CASE WHEN drnk = ((dn - 1) * 50 // 100 + 1)
                       THEN dev_micro END) AS BIGINT) AS mad_micro
  FROM dranked GROUP BY event_type
)
SELECT d.event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(max(d.median_micro) AS BIGINT) AS median_micro,
       CAST(max(m.mad_micro) AS BIGINT) AS mad_micro,
       CAST(sum(CASE WHEN d.dev_micro > {MAD_K} * m.mad_micro
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM dev d JOIN mad m ON d.event_type = m.event_type
GROUP BY d.event_type
ORDER BY d.event_type"""


# --- Order-independent table fingerprint --------------------------------------
# Replica/drift verification: a content checksum that is invariant to
# row order and partitioning, so two engines (or two snapshots) can be
# compared without sorting either.  Per-row polynomial hash over the
# exact integer projection of the row, reduced mod a Mersenne prime,
# then SUMMED per month bucket (sum is commutative = order-free); the
# second moment catches permuted-value collisions the plain sum misses.
# Pure int64/DECIMAL arithmetic — identical in both engines.

FP_PRIME = 2_147_483_647         # 2^31 - 1


def q_dq_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = domain.load_table(spark, sf_dir, "orders")
    h = (f"((o_orderkey % {FP_PRIME}) * 1000003 "
         f"+ (o_custkey % {FP_PRIME}) * 10007 "
         f"+ CAST(floor(o_totalprice * 100) AS BIGINT)) % {FP_PRIME}")
    dec = "DECIMAL(38,0)"
    return (o.select(
                F.expr("date_format(CAST(o_orderdate AS DATE), 'yyyy-MM')")
                 .alias("month"),
                F.expr(f"CAST({h} AS BIGINT)").alias("h"))
             .groupBy("month")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                  F.expr(f"CAST(sum(h) % {FP_PRIME} AS BIGINT)")
                   .alias("fp_sum"),
                  F.expr(f"CAST(sum(CAST(h AS {dec}) * h % {FP_PRIME}) "
                         f"% {FP_PRIME} AS BIGINT)").alias("fp_sumsq"))
             .orderBy("month"))


def sql_dq_table_fingerprint() -> str:
    h = (f"((o_orderkey % {FP_PRIME}) * 1000003 "
         f"+ (o_custkey % {FP_PRIME}) * 10007 "
         f"+ CAST(floor(o_totalprice * 100) AS BIGINT)) % {FP_PRIME}")
    return f"""
WITH rows_h AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         CAST({h} AS BIGINT) AS h
  FROM orders
)
SELECT month,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum(h) % {FP_PRIME} AS BIGINT) AS fp_sum,
       CAST(sum(CAST(h AS HUGEINT) * h % {FP_PRIME}) % {FP_PRIME}
            AS BIGINT) AS fp_sumsq
FROM rows_h
GROUP BY month
ORDER BY month"""


# --- Join-cardinality calibration (the CBO reality check) ----------------------
# Cost-based optimizers size joins with the uniformity estimate
# |L ⋈ R| ~= |L| * |R| / max(ndv_L, ndv_R); when reality diverges
# (skew, correlation), plans built on the estimate pick the wrong side
# to broadcast or under-partition the shuffle.  This op measures the
# divergence ON the engine — and computes the ACTUAL join cardinality
# WITHOUT executing the join: per-key counts on each side, then
# sum(c_l * c_r) over matching keys — a |keys|-sized equi-join instead
# of a |rows|-sized one.

_JOIN_PAIRS = [
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
]


def q_dq_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    dec = "DECIMAL(38,0)"
    parts = []
    for lt, lk, rt, rk in _JOIN_PAIRS:
        lc = (domain.load_table(spark, sf_dir, lt)
              .groupBy(F.col(lk).alias("k"))
              .agg(F.count(F.lit(1)).cast("long").alias("cl")))
        rc = (domain.load_table(spark, sf_dir, rt)
              .groupBy(F.col(rk).alias("k"))
              .agg(F.count(F.lit(1)).cast("long").alias("cr")))
        stats = (lc.join(rc, "k")
                   .agg(F.expr(f"CAST(sum(CAST(cl AS {dec}) * cr) "
                               "AS BIGINT)").alias("actual_rows"))
                   .crossJoin(F.broadcast(
                       lc.agg(F.sum("cl").cast("long").alias("n_l"),
                              F.count(F.lit(1)).cast("long").alias("ndv_l"))))
                   .crossJoin(F.broadcast(
                       rc.agg(F.sum("cr").cast("long").alias("n_r"),
                              F.count(F.lit(1)).cast("long")
                               .alias("ndv_r")))))
        parts.append(stats.select(
            F.lit(f"{lt}.{lk}={rt}.{rk}").alias("join_pair"),
            "n_l", "n_r", "ndv_l", "ndv_r", "actual_rows",
            F.expr(f"CAST(CAST(n_l AS {dec}) * n_r "
                   "div greatest(ndv_l, ndv_r) AS BIGINT)")
             .alias("est_rows"),
            F.expr(f"CAST(CAST(actual_rows AS {dec}) * 1000000 div "
                   f"greatest(CAST(CAST(n_l AS {dec}) * n_r div "
                   f"greatest(ndv_l, ndv_r) AS BIGINT), 1) AS BIGINT)")
             .alias("miss_ratio_ppm")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("join_pair")


def sql_dq_join_cardinality() -> str:
    legs = []
    for lt, lk, rt, rk in _JOIN_PAIRS:
        legs.append(f"""
  SELECT '{lt}.{lk}={rt}.{rk}' AS join_pair, n_l, n_r, ndv_l, ndv_r,
         actual_rows,
         CAST(CAST(n_l AS HUGEINT) * n_r // greatest(ndv_l, ndv_r)
              AS BIGINT) AS est_rows,
         CAST(CAST(actual_rows AS HUGEINT) * 1000000
              // greatest(CAST(CAST(n_l AS HUGEINT) * n_r
                          // greatest(ndv_l, ndv_r) AS BIGINT), 1)
              AS BIGINT) AS miss_ratio_ppm
  FROM (
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM {lt}) AS n_l,
           (SELECT CAST(count(*) AS BIGINT) FROM {rt}) AS n_r,
           (SELECT CAST(count(DISTINCT {lk}) AS BIGINT) FROM {lt})
             AS ndv_l,
           (SELECT CAST(count(DISTINCT {rk}) AS BIGINT) FROM {rt})
             AS ndv_r,
           (SELECT CAST(sum(CAST(l.cl AS HUGEINT) * r.cr) AS BIGINT)
            FROM (SELECT {lk} AS k, count(*) AS cl FROM {lt} GROUP BY 1) l
            JOIN (SELECT {rk} AS k, count(*) AS cr FROM {rt} GROUP BY 1) r
              ON l.k = r.k) AS actual_rows
  )""")
    return ("SELECT * FROM (" + "\nUNION ALL".join(legs)
            + ")\nORDER BY join_pair")


# --- Equal-mass feature binning with explicit edges ----------------------------
# The quantile-bin transform of a feature pipeline (XGBoost-style
# histogram features, calibration buckets): 10 equal-mass bins of the
# order value, reported WITH their observed [lo, hi] cent edges so the
# binning is reusable downstream.  Bin assignment is the exact ntile
# arithmetic over a banded-rank numbering (orders_pareto's device) —
# no global sort; edges are per-bin min/max aggregates.

QB_BINS = 10


def q_features_quantile_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .rankutil import banded_rank
    o = (domain.load_table(spark, sf_dir, "orders")
         .select("o_orderkey",
                 F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
                  .alias("v_c")))
    ranked = banded_rank(
        o, [], band=F.expr("v_c div 100000"),
        order_cols=[F.col("v_c").asc(), F.col("o_orderkey").asc()],
        rank_name="rnk", total_name="n")
    k = QB_BINS
    bin_id = F.expr(f"""
        CASE WHEN rnk <= (n % {k}) * (n div {k} + 1)
             THEN (rnk - 1) div (n div {k} + 1) + 1
             ELSE n % {k}
                  + (rnk - (n % {k}) * (n div {k} + 1) - 1)
                    div greatest(n div {k}, 1L) + 1
        END""").cast("int")
    return (ranked.withColumn("bin_id", bin_id)
                  .groupBy("bin_id")
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                       F.min("v_c").cast("bigint").alias("lo_cents"),
                       F.max("v_c").cast("bigint").alias("hi_cents"))
                  .orderBy("bin_id"))


def sql_features_quantile_bins() -> str:
    return f"""
WITH ranked AS (
  SELECT CAST(floor(o_totalprice * 100) AS BIGINT) AS v_c,
         ntile({QB_BINS}) OVER (
           ORDER BY CAST(floor(o_totalprice * 100) AS BIGINT),
                    o_orderkey) AS bin_id
  FROM orders
)
SELECT CAST(bin_id AS INT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(min(v_c) AS BIGINT) AS lo_cents,
       CAST(max(v_c) AS BIGINT) AS hi_cents
FROM ranked
GROUP BY bin_id
ORDER BY bin_id"""


# --- CUSUM change-point detection per event type --------------------------------
# Monitoring's "when did the level shift" question: the classic CUSUM
# statistic D_k = |S_k * n - k * S_n| (the scaled deviation of the
# k-prefix sum from the uniform-rate line) maximized over k; its argmax
# is the most likely change point (Page 1954).  All integer: values in
# exact micro units, D on DECIMAL(38,0).
#
# Scale shape: the prefix sums S_k and indexes k come from a BANDED
# cumulative pass — in-band windows partition by (type, day) and the
# cross-band offsets ride a cumulative window over the tiny per-day
# totals table (bounded by the TIME RANGE in days, not the corpus) —
# the same discipline as rankutil.banded_rank, extended to sums.  The
# argmax is a 1-row-per-type max + equality join, no sort.

_DAY_NS = 86_400_000_000_000


def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    e = (domain.load_table(spark, sf_dir, "events")
         .select("event_type", "event_id", "ts",
                 F.expr("CAST(floor(value * 1000000) AS BIGINT)")
                  .alias("v")))
    e = e.withColumn("day", F.expr(f"ts div {_DAY_NS}"))
    in_day = (Window.partitionBy("event_type", "day")
                    .orderBy("ts", "event_id")
                    .rowsBetween(Window.unboundedPreceding, 0))
    rows = (e.withColumn("k_in", F.count(F.lit(1)).over(in_day))
             .withColumn("s_in", F.sum("v").over(in_day)))
    day_tot = (e.groupBy("event_type", "day")
                .agg(F.count(F.lit(1)).alias("dc"), F.sum("v").alias("ds")))
    prior = (Window.partitionBy("event_type").orderBy("day")
                   .rowsBetween(Window.unboundedPreceding, -1))
    whole = Window.partitionBy("event_type")
    offs = (day_tot
            .withColumn("k_off", F.coalesce(F.sum("dc").over(prior),
                                            F.lit(0)))
            .withColumn("s_off", F.coalesce(F.sum("ds").over(prior),
                                            F.lit(0)))
            .withColumn("n", F.sum("dc").over(whole))
            .withColumn("s_n", F.sum("ds").over(whole))
            .select("event_type", "day", "k_off", "s_off", "n", "s_n"))
    dec = "DECIMAL(38,0)"
    full = (rows.join(offs, ["event_type", "day"])
                .select("event_type", "event_id", "ts",
                        F.expr("k_off + k_in").alias("k"),
                        F.expr("s_off + s_in").alias("s_k"), "n", "s_n")
                .withColumn("d", F.expr(
                    f"abs(CAST(s_k AS {dec}) * n - CAST(k AS {dec}) * s_n)")))
    maxd = full.groupBy("event_type").agg(F.max("d").alias("max_d"))
    cp = (full.join(maxd, "event_type")
              .filter(F.col("d") == F.col("max_d"))
              .groupBy("event_type")
              .agg(F.min("k").cast("bigint").alias("cp_k")))
    return (full.join(cp, "event_type")
                .filter(F.col("k") == F.col("cp_k"))
                .select("event_type",
                        F.col("n").cast("bigint").alias("n_events"),
                        "cp_k",
                        F.col("ts").cast("bigint").alias("cp_ts_ns"),
                        F.col("s_k").cast("bigint").alias("prefix_sum_micro"),
                        F.expr("CAST(d AS BIGINT)").alias("cusum_dev"))
                .orderBy("event_type"))


def sql_events_changepoint() -> str:
    return """
WITH v AS (
  SELECT event_type, event_id, epoch_ns(ts) AS ts,
         CAST(floor(value * 1000000) AS BIGINT) AS v
  FROM events
),
seq AS (
  SELECT event_type, event_id, ts,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY ts, event_id) AS k,
         sum(v) OVER (PARTITION BY event_type ORDER BY ts, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS s_k,
         count(*) OVER (PARTITION BY event_type) AS n,
         sum(v) OVER (PARTITION BY event_type) AS s_n
  FROM v
),
scored AS (
  SELECT event_type, event_id, ts, k, s_k, n, s_n,
         abs(CAST(s_k AS HUGEINT) * n - CAST(k AS HUGEINT) * s_n) AS d
  FROM seq
),
cp AS (
  SELECT event_type, min(k) AS cp_k
  FROM scored s
  WHERE d = (SELECT max(d) FROM scored s2
             WHERE s2.event_type = s.event_type)
  GROUP BY event_type
)
SELECT s.event_type,
       CAST(s.n AS BIGINT) AS n_events,
       CAST(s.k AS BIGINT) AS cp_k,
       CAST(s.ts AS BIGINT) AS cp_ts_ns,
       CAST(s.s_k AS BIGINT) AS prefix_sum_micro,
       CAST(s.d AS BIGINT) AS cusum_dev
FROM scored s JOIN cp ON s.event_type = cp.event_type AND s.k = cp.cp_k
ORDER BY s.event_type"""


# --- Referential-integrity audit (orphan foreign keys) -------------------------
# The first gate of any warehouse load: fact rows whose foreign key has
# no parent.  Per declared FK edge: total fact rows, orphan rows, and
# distinct orphan keys — the orphan set computed as a LEFT ANTI against
# the parent's pre-deduped keyset (map-side-combined DISTINCT before
# the join, never a row-level parent scan per fact row).

_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
]


def q_dq_referential_integrity(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    parts = []
    for ft, fk, pt, pk in _FK_EDGES:
        fact = (domain.load_table(spark, sf_dir, ft)
                .select(F.col(fk).cast("long").alias("k")))
        parent = (domain.load_table(spark, sf_dir, pt)
                  .select(F.col(pk).cast("long").alias("k")).distinct())
        orphans = fact.join(parent, "k", "left_anti")
        stats = (fact.agg(F.count(F.lit(1)).cast("long").alias("n_fact"))
                 .crossJoin(F.broadcast(
                     orphans.agg(
                         F.count(F.lit(1)).cast("long").alias("n_orphan"),
                         F.count_distinct("k").cast("long")
                          .alias("n_orphan_keys")))))
        parts.append(stats.select(
            F.lit(f"{ft}.{fk}->{pt}.{pk}").alias("fk_edge"),
            "n_fact", "n_orphan", "n_orphan_keys",
            (F.col("n_orphan") == 0).alias("intact")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("fk_edge")


def sql_dq_referential_integrity() -> str:
    legs = []
    for ft, fk, pt, pk in _FK_EDGES:
        legs.append(f"""
  SELECT '{ft}.{fk}->{pt}.{pk}' AS fk_edge,
         (SELECT CAST(count(*) AS BIGINT) FROM {ft}) AS n_fact,
         (SELECT CAST(count(*) AS BIGINT) FROM {ft} f
          WHERE NOT EXISTS (SELECT 1 FROM {pt} p
                            WHERE p.{pk} = f.{fk})) AS n_orphan,
         (SELECT CAST(count(DISTINCT f.{fk}) AS BIGINT) FROM {ft} f
          WHERE NOT EXISTS (SELECT 1 FROM {pt} p
                            WHERE p.{pk} = f.{fk})) AS n_orphan_keys,
         (SELECT count(*) FROM {ft} f
          WHERE NOT EXISTS (SELECT 1 FROM {pt} p
                            WHERE p.{pk} = f.{fk})) = 0 AS intact""")
    return ("SELECT * FROM (" + "\nUNION ALL".join(legs)
            + ")\nORDER BY fk_edge")


# --- Ingest-freshness lag per stream -------------------------------------------
# The pipeline-health readout every on-call dashboard opens with: how
# far behind the freshest stream is each event type, in exact
# nanoseconds and whole minutes, with a staleness flag.  Pure integer
# max/"argmax vs global max" arithmetic — one map-side-combined
# aggregate, a 1-row global max broadcast back.

FRESH_STALE_MIN = 60          # flag streams > 60 min behind the freshest


def q_dq_freshness_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = domain.load_table(spark, sf_dir, "events")
    per = (e.groupBy("event_type")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                 F.max("ts").cast("long").alias("max_ts_ns")))
    g = per.agg(F.max("max_ts_ns").alias("global_max_ns"))
    return (per.crossJoin(F.broadcast(g))
               .select("event_type", "n_events", "max_ts_ns",
                       F.expr("CAST(global_max_ns - max_ts_ns AS BIGINT)")
                        .alias("lag_ns"),
                       F.expr("CAST((global_max_ns - max_ts_ns) "
                              "div 60000000000 AS BIGINT)")
                        .alias("lag_minutes"),
                       F.expr("(global_max_ns - max_ts_ns) div 60000000000"
                              f" > {FRESH_STALE_MIN}").alias("stale"))
               .orderBy("event_type"))


def sql_dq_freshness_lag() -> str:
    return f"""
WITH per AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_events,
         CAST(max(epoch_ns(ts)) AS BIGINT) AS max_ts_ns
  FROM events GROUP BY event_type
),
g AS (SELECT max(max_ts_ns) AS global_max_ns FROM per)
SELECT p.event_type, p.n_events, p.max_ts_ns,
       CAST(g.global_max_ns - p.max_ts_ns AS BIGINT) AS lag_ns,
       CAST((g.global_max_ns - p.max_ts_ns) // 60000000000 AS BIGINT)
         AS lag_minutes,
       (g.global_max_ns - p.max_ts_ns) // 60000000000
         > {FRESH_STALE_MIN} AS stale
FROM per p, g
ORDER BY p.event_type"""


# --- Primary-key uniqueness audit ----------------------------------------------
# dq_referential_integrity's companion gate: every declared key must be
# unique before it can serve as a join/merge key.  Per (table, key):
# row count, distinct keys, duplicated keys, and the worst key's
# multiplicity — all from one map-side-combined per-key count, with the
# max multiplicity a bounded re-aggregate (never a sort).

_PK_DECLS = [
    ("orders", "o_orderkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("supplier", "s_suppkey"),
    ("documents", "doc_id"),
    ("embeddings", "vec_id"),
    ("events", "event_id"),
]


def q_dq_unique_key_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for t, k in _PK_DECLS:
        counts = (domain.load_table(spark, sf_dir, t)
                  .groupBy(F.col(k).cast("long").alias("k"))
                  .agg(F.count(F.lit(1)).cast("long").alias("c")))
        parts.append(counts.agg(
            F.sum("c").cast("bigint").alias("n_rows"),
            F.count(F.lit(1)).cast("bigint").alias("n_keys"),
            F.expr("CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)")
             .alias("n_dup_keys"),
            F.max("c").cast("bigint").alias("max_multiplicity"))
            .select(F.lit(f"{t}.{k}").alias("key"),
                    "n_rows", "n_keys", "n_dup_keys", "max_multiplicity",
                    (F.col("n_dup_keys") == 0).alias("unique")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("key")


def sql_dq_unique_key_check() -> str:
    legs = []
    for t, k in _PK_DECLS:
        legs.append(f"""
  SELECT '{t}.{k}' AS key,
         CAST(sum(c) AS BIGINT) AS n_rows,
         CAST(count(*) AS BIGINT) AS n_keys,
         CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_keys,
         CAST(max(c) AS BIGINT) AS max_multiplicity,
         sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) = 0 AS "unique"
  FROM (SELECT {k}, count(*) AS c FROM {t} GROUP BY {k})""")
    return ("SELECT * FROM (" + "\nUNION ALL".join(legs)
            + ")\nORDER BY key")


# --- Benford first-digit conformance audit --------------------------------------
# The forensic-accounting load gate: naturally-occurring monetary values
# follow Benford's law (P(first digit = d) = log10(1 + 1/d)); synthetic,
# capped, or fabricated feeds don't.  The audit bins o_totalprice by
# leading significant digit and reports observed-vs-expected ppm plus an
# exact chi-square term per digit, all integer: the expected ppm table
# is a hardcoded integer constant (round(log10(1+1/d) * 1e6) — the nine
# values sum to exactly 1_000_000), the leading digit comes from the
# exact cent integer (multiplying by 100 never changes the leading
# significant digit of a value >= 0.01), and the chi-square term rides
# DECIMAL(38,0): chi2_micro = (n_d*1e6 - n*exp_ppm)^2 div (n*exp_ppm)
# = 1e6 * (O-E)^2/E.  One scan + a 9-row aggregate — nothing to shuffle
# but the digit counts.

BENFORD_PPM = {1: 301030, 2: 176091, 3: 124939, 4: 96910, 5: 79181,
               6: 66947, 7: 57992, 8: 51153, 9: 45757}


def q_dq_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Leading digit from the cent integer of ABS(price) (ADVICE r7 low
    # + ADVICE r8 low): abs() must ride INSIDE the floor so the audit
    # is truly sign-blind — floor-then-abs would count a negative
    # sub-cent total (floor(-0.4) = -1) as digit 1 while dropping its
    # positive mirror (floor(0.4) = 0).  abs() also guarantees a digit
    # character under the string-cast in both engines (Spark CASTs a
    # '-' prefix to NULL; DuckDB raises).
    o = (domain.load_table(spark, sf_dir, "orders")
         .select(F.expr("CAST(floor(abs(o_totalprice) * 100) AS BIGINT)")
                  .alias("abs_c"))
         .filter(F.col("abs_c") > 0))
    digits = (o.select(F.expr(
                  "CAST(substring(CAST(abs_c AS STRING), 1, 1) AS INT)")
                  .alias("digit"))
               .groupBy("digit")
               .agg(F.count(F.lit(1)).cast("bigint").alias("n_obs")))
    exp_ppm = "CASE digit " + " ".join(
        f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items()) + " END"
    n_row = digits.agg(F.sum("n_obs").cast("bigint").alias("n"))
    dec = "DECIMAL(38,0)"
    return (digits.crossJoin(F.broadcast(n_row))
            .withColumn("obs_ppm",
                        F.expr("CAST(n_obs * 1000000 div n AS BIGINT)"))
            .withColumn("exp_ppm", F.expr(f"CAST({exp_ppm} AS BIGINT)"))
            .withColumn("dev_ppm",
                        (F.col("obs_ppm") - F.col("exp_ppm")).cast("bigint"))
            .withColumn("chi2_micro", F.expr(
                f"CAST(CAST(n_obs * 1000000 - n * ({exp_ppm}) AS {dec})"
                f" * (n_obs * 1000000 - n * ({exp_ppm}))"
                f" div (CAST(n AS {dec}) * ({exp_ppm})) AS BIGINT)"))
            .select("digit", "n_obs", "obs_ppm", "exp_ppm", "dev_ppm",
                    "chi2_micro")
            .orderBy("digit"))


def sql_dq_benford() -> str:
    exp_ppm = "CASE digit " + " ".join(
        f"WHEN {d} THEN {p}" for d, p in BENFORD_PPM.items()) + " END"
    return f"""
WITH d AS (
  SELECT CAST(substr(CAST(abs_c AS VARCHAR), 1, 1) AS INT) AS digit
  FROM (SELECT CAST(floor(abs(o_totalprice) * 100) AS BIGINT) AS abs_c
        FROM orders)
  WHERE abs_c > 0
),
counts AS (
  SELECT digit, CAST(count(*) AS BIGINT) AS n_obs FROM d GROUP BY 1
),
n AS (SELECT CAST(sum(n_obs) AS BIGINT) AS n FROM counts)
SELECT digit, n_obs,
       CAST(n_obs * 1000000 // n.n AS BIGINT) AS obs_ppm,
       CAST({exp_ppm} AS BIGINT) AS exp_ppm,
       CAST(n_obs * 1000000 // n.n - ({exp_ppm}) AS BIGINT) AS dev_ppm,
       CAST(CAST(n_obs * 1000000 - n.n * ({exp_ppm}) AS HUGEINT)
            * (n_obs * 1000000 - n.n * ({exp_ppm}))
            // (CAST(n.n AS HUGEINT) * ({exp_ppm})) AS BIGINT)
         AS chi2_micro
FROM counts, n
ORDER BY digit"""


# --- Ingest sequence-gap audit (round 7) -----------------------------------------
# Dropped-batch detection: a monotone ingest key (event_id) should be
# contiguous; holes mean a producer batch never landed.  The audit never
# sorts the corpus — ids aggregate into fixed-width blocks (id div
# SEQ_BLOCK: |blocks| = id range / width, corpus-size-independent per
# retention window), each block's actual distinct-id count is compared
# with its expected width (edge blocks clamped by the global min/max —
# a 1-row broadcast), and only deficient blocks are reported.
#
# The synthetic events table is gap-free by construction, so (as with
# dedup's _rng_corpus seeding) a deterministic ingest hole is seeded:
# event_id % SEQ_DROP_MOD == SEQ_DROP_REM rows are dropped before the
# audit, making the parity rows non-empty and the detector's arithmetic
# observable.  The oracle mirrors the seeding verbatim.

SEQ_BLOCK = 1000
SEQ_DROP_MOD = 997
SEQ_DROP_REM = 13


def q_dq_sequence_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    ids = (domain.load_table(spark, sf_dir, "events")
           .select(F.col("event_id").cast("long").alias("id"))
           .filter(F.col("id") % SEQ_DROP_MOD != SEQ_DROP_REM))
    blocks = (ids.groupBy(F.expr(f"id div {SEQ_BLOCK}").alias("block_id"))
                 .agg(F.count(F.lit(1)).cast("bigint").alias("actual_n")))
    bounds = ids.agg(F.min("id").alias("lo"), F.max("id").alias("hi"))
    return (blocks.crossJoin(F.broadcast(bounds))
            .withColumn("expected_n", F.expr(
                f"CAST(least((block_id + 1) * {SEQ_BLOCK} - 1, hi)"
                f" - greatest(block_id * {SEQ_BLOCK}, lo) + 1 AS BIGINT)"))
            .withColumn("missing_n",
                        (F.col("expected_n") - F.col("actual_n"))
                         .cast("bigint"))
            .filter(F.col("missing_n") > 0)
            .select("block_id", "expected_n", "actual_n", "missing_n")
            .orderBy("block_id"))


def sql_dq_sequence_gaps() -> str:
    return f"""
WITH ids AS (
  SELECT CAST(event_id AS BIGINT) AS id FROM events
  WHERE event_id % {SEQ_DROP_MOD} <> {SEQ_DROP_REM}
),
blocks AS (
  SELECT id // {SEQ_BLOCK} AS block_id,
         CAST(count(*) AS BIGINT) AS actual_n
  FROM ids GROUP BY 1
),
bounds AS (SELECT min(id) AS lo, max(id) AS hi FROM ids)
SELECT block_id,
       CAST(least((block_id + 1) * {SEQ_BLOCK} - 1, b.hi)
            - greatest(block_id * {SEQ_BLOCK}, b.lo) + 1 AS BIGINT)
         AS expected_n,
       actual_n,
       CAST(least((block_id + 1) * {SEQ_BLOCK} - 1, b.hi)
            - greatest(block_id * {SEQ_BLOCK}, b.lo) + 1
            - actual_n AS BIGINT) AS missing_n
FROM blocks, bounds b
WHERE least((block_id + 1) * {SEQ_BLOCK} - 1, b.hi)
      - greatest(block_id * {SEQ_BLOCK}, b.lo) + 1 - actual_n > 0
ORDER BY block_id"""


# --- Duplicate-payment audit (round 7) --------------------------------------------
# The fin-ops double-charge detector: order rows agreeing on
# (customer, exact cents, order date) are retried/double-ingested
# payments.  One map-side-combined groupBy on the composite key, groups
# of size >= 2 reported with their key-range evidence — no window, no
# sort, no join.  The synthetic orders table is collision-free by
# construction, so (the _rng_corpus/SEQ_DROP convention) a deterministic
# retry stream is seeded: orders with o_orderkey % DUPPAY_MOD ==
# DUPPAY_REM are re-ingested once with a shifted surrogate key, and the
# audit must find exactly those groups.  The oracle mirrors the seeding.

DUPPAY_MOD = 251
DUPPAY_REM = 7
DUPPAY_KEY_SHIFT = 10_000_000


def q_dq_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (domain.load_table(spark, sf_dir, "orders")
         .select(F.col("o_orderkey").cast("long").alias("okey"),
                 F.col("o_custkey").cast("long").alias("custkey"),
                 F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
                  .alias("price_c"),
                 F.col("o_orderdate").cast("date").alias("odate")))
    retried = (o.filter(F.col("okey") % DUPPAY_MOD == DUPPAY_REM)
                .withColumn("okey", F.col("okey") + DUPPAY_KEY_SHIFT))
    return (o.unionByName(retried)
             .groupBy("custkey", "price_c", "odate")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_payments"),
                  F.min("okey").cast("bigint").alias("first_key"),
                  F.max("okey").cast("bigint").alias("last_key"))
             .filter(F.col("n_payments") >= 2)
             .orderBy("custkey", "price_c", "odate"))


def sql_dq_duplicate_payments() -> str:
    return f"""
WITH o AS (
  SELECT CAST(o_orderkey AS BIGINT) AS okey,
         CAST(o_custkey AS BIGINT) AS custkey,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS price_c,
         CAST(o_orderdate AS DATE) AS odate
  FROM orders
),
seeded AS (
  SELECT * FROM o
  UNION ALL
  SELECT okey + {DUPPAY_KEY_SHIFT}, custkey, price_c, odate
  FROM o WHERE okey % {DUPPAY_MOD} = {DUPPAY_REM}
)
SELECT custkey, price_c, odate,
       CAST(count(*) AS BIGINT) AS n_payments,
       CAST(min(okey) AS BIGINT) AS first_key,
       CAST(max(okey) AS BIGINT) AS last_key
FROM seeded
GROUP BY 1, 2, 3
HAVING count(*) >= 2
ORDER BY custkey, price_c, odate"""


# --- Smoothed target encoding (round 7) --------------------------------------------
# The standard ML categorical-feature encoder: per category, the
# target mean shrunk toward the global prior (smoothing m rows of
# prior mass — the Micci-Barreca 2001 estimator).  Exactness: the
# encoder is a single rational (sum_c*N + m*S) / ((n_c + m)*N) in
# cents — computed as ONE integer floor division in milli-cents on
# DECIMAL(38,0)/HUGEINT with no intermediate rounding.  One map-side-
# combined aggregate + a 1-row global broadcast; the category table is
# |priorities| x |statuses| bounded.

TENC_SMOOTH_M = 100


def q_features_target_encoding(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    dec = "DECIMAL(38,0)"
    o = (domain.load_table(spark, sf_dir, "orders")
         .select("o_orderpriority", "o_orderstatus",
                 F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)")
                  .alias("y_c")))
    per = (o.groupBy("o_orderpriority", "o_orderstatus")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                 F.sum("y_c").cast("bigint").alias("sum_c")))
    g = o.agg(F.count(F.lit(1)).cast("bigint").alias("n_all"),
              F.sum("y_c").cast("bigint").alias("sum_all"))
    m = TENC_SMOOTH_M
    return (per.crossJoin(F.broadcast(g))
            .select("o_orderpriority", "o_orderstatus", "n_rows", "sum_c",
                    F.expr("CAST(sum_c * 1000 div n_rows AS BIGINT)")
                     .alias("raw_mean_milli"),
                    F.expr(
                        f"CAST((CAST(sum_c AS {dec}) * n_all"
                        f" + {m} * CAST(sum_all AS {dec})) * 1000"
                        f" div (CAST(n_rows + {m} AS {dec}) * n_all)"
                        " AS BIGINT)").alias("enc_milli"))
            .orderBy("o_orderpriority", "o_orderstatus"))


def sql_features_target_encoding() -> str:
    m = TENC_SMOOTH_M
    return f"""
WITH o AS (
  SELECT o_orderpriority, o_orderstatus,
         CAST(floor(o_totalprice * 100) AS BIGINT) AS y_c
  FROM orders
),
per AS (
  SELECT o_orderpriority, o_orderstatus,
         CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(y_c) AS BIGINT) AS sum_c
  FROM o GROUP BY 1, 2
),
g AS (SELECT CAST(count(*) AS BIGINT) AS n_all,
             CAST(sum(y_c) AS BIGINT) AS sum_all FROM o)
SELECT o_orderpriority, o_orderstatus, n_rows, sum_c,
       CAST(sum_c * 1000 // n_rows AS BIGINT) AS raw_mean_milli,
       CAST((CAST(sum_c AS HUGEINT) * g.n_all
             + {m} * CAST(g.sum_all AS HUGEINT)) * 1000
            // (CAST(n_rows + {m} AS HUGEINT) * g.n_all) AS BIGINT)
         AS enc_milli
FROM per, g
ORDER BY o_orderpriority, o_orderstatus"""


# --- Fact-to-detail reconciliation audit (round 7) ---------------------------------
# The warehouse-close classic: does the order header's total equal the
# sum of its lines?  Per order-status leg: header count, headers with
# no lines, headers whose |total - sum(lines)| exceeds one cent, and
# the worst discrepancy.  All exact: line net value rides the TPC-H Q1
# integer device (cents x (100-disc) x (100+tax) = e6 units), the
# header total is floor(cents) x 10^4 e6 units, and the comparison is
# BIGINT.  One co-partitioned equi-join on the order key + map-side
# combined aggregates.  (On this synthetic fixture headers are priced
# independently of lines, so the audit genuinely fires — the point of
# a reconciliation gate.)

RECON_TOL_E6 = 10_000            # one cent in e6 units


def q_dq_order_reconciliation(spark: SparkSession,
                              sf_dir: str) -> DataFrame:
    li = (domain.load_table(spark, sf_dir, "lineitem")
          .groupBy(F.col("l_orderkey").alias("okey"))
          .agg(F.expr(
              "CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)"
              " * (100 - CAST(round(l_discount * 100) AS BIGINT))"
              " * (100 + CAST(round(l_tax * 100) AS BIGINT))) AS BIGINT)")
              .alias("lines_e6")))
    o = (domain.load_table(spark, sf_dir, "orders")
         .select(F.col("o_orderkey").alias("okey"), "o_orderstatus",
                 F.expr("CAST(floor(o_totalprice * 100) AS BIGINT)"
                        " * 10000").alias("total_e6")))
    j = (o.join(li, "okey", "left")
          .withColumn("diff_e6", F.when(
              F.col("lines_e6").isNotNull(),
              F.abs(F.col("total_e6") - F.col("lines_e6")))))
    return (j.groupBy("o_orderstatus")
             .agg(F.count(F.lit(1)).cast("bigint").alias("n_orders"),
                  F.sum(F.when(F.col("lines_e6").isNull(), 1).otherwise(0))
                   .cast("bigint").alias("n_no_lines"),
                  F.sum(F.when(F.col("diff_e6") > RECON_TOL_E6, 1)
                         .otherwise(0)).cast("bigint").alias("n_mismatch"),
                  F.max("diff_e6").cast("bigint").alias("max_diff_e6"))
             .withColumn("matched_ppm", F.expr(
                 "CAST((n_orders - n_no_lines - n_mismatch) * 1000000"
                 " div n_orders AS BIGINT)"))
             .orderBy("o_orderstatus"))


def sql_dq_order_reconciliation() -> str:
    return f"""
WITH li AS (
  SELECT l_orderkey AS okey,
         CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)
                  * (100 - CAST(round(l_discount * 100) AS BIGINT))
                  * (100 + CAST(round(l_tax * 100) AS BIGINT)))
              AS BIGINT) AS lines_e6
  FROM lineitem GROUP BY 1
),
o AS (
  SELECT o_orderkey AS okey, o_orderstatus,
         CAST(floor(o_totalprice * 100) AS BIGINT) * 10000 AS total_e6
  FROM orders
),
j AS (
  SELECT o.o_orderstatus, li.lines_e6,
         CASE WHEN li.lines_e6 IS NOT NULL
              THEN abs(o.total_e6 - li.lines_e6) END AS diff_e6
  FROM o LEFT JOIN li USING (okey)
)
SELECT o_orderstatus,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CASE WHEN lines_e6 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_no_lines,
       CAST(sum(CASE WHEN diff_e6 > {RECON_TOL_E6} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_mismatch,
       CAST(max(diff_e6) AS BIGINT) AS max_diff_e6,
       CAST((count(*)
             - sum(CASE WHEN lines_e6 IS NULL THEN 1 ELSE 0 END)
             - sum(CASE WHEN diff_e6 > {RECON_TOL_E6} THEN 1 ELSE 0 END))
            * 1000000 // count(*) AS BIGINT) AS matched_ppm
FROM j
GROUP BY 1
ORDER BY 1"""


# --- Daily volume anomaly vs trailing median (round 7) ------------------------------
# The ops-monitoring twin of events_mad_outliers, on VOLUME rather than
# value and against a TRAILING baseline rather than a global one: per
# day, the event count vs the median of the previous VOL_WINDOW days,
# with an exact ppm deviation.  The corpus collapses to the bounded
# per-day count table in one map-side-combined pass; the trailing
# median is a rank-by-pairwise-count over the |days| x W x W bounded
# self-join (time-range bounded, corpus-size-independent) — no window,
# no sort.

VOL_WINDOW = 7
VOL_ANOM_PPM = 300_000           # flag |dev| > 30%


def q_dq_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = domain.load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.expr(f"ts div {86_400_000_000_000}").alias("day"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_events")))
    W = VOL_WINDOW
    d = daily.select(F.col("day").alias("d"), F.col("n_events").alias("n"))
    f = daily.select(F.col("day").alias("fd"), F.col("n_events").alias("fn"))
    e2 = daily.select(F.col("day").alias("ed"), F.col("n_events").alias("en"))
    # candidates f in d's trailing window, ranked among the window by
    # pairwise counts; the median of W=7 is pairwise-rank 4
    cand = (d.join(f, (F.col("fd") >= F.col("d") - W)
                      & (F.col("fd") <= F.col("d") - 1)))
    ranked = (cand.join(e2, (F.col("ed") >= F.col("d") - W)
                           & (F.col("ed") <= F.col("d") - 1))
                  .groupBy("d", "n", "fd", "fn")
                  .agg(F.sum(F.expr(
                      "CASE WHEN (en < fn) OR (en = fn AND ed < fd)"
                      " THEN 1 ELSE 0 END")).alias("smaller"),
                       F.count(F.lit(1)).cast("bigint").alias("w_n")))
    med = (ranked.filter((F.col("w_n") == W)
                         & (F.col("smaller") == (W - 1) // 2))
                 .select("d", "n", F.col("fn").alias("trailing_med")))
    return (med.select(F.col("d").alias("day"),
                       F.col("n").alias("n_events"), "trailing_med",
                       F.expr("CAST((n - trailing_med) * 1000000"
                              " div trailing_med AS BIGINT)")
                        .alias("dev_ppm"))
               .withColumn("is_anomaly",
                           F.abs(F.col("dev_ppm")) > VOL_ANOM_PPM)
               .orderBy("day"))


def sql_dq_volume_anomaly() -> str:
    W = VOL_WINDOW
    return f"""
WITH daily AS (
  SELECT epoch_ns(ts) // 86400000000000 AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1
),
cand AS (
  SELECT d.day AS d, d.n_events AS n, f.day AS fd, f.n_events AS fn
  FROM daily d JOIN daily f
    ON f.day BETWEEN d.day - {W} AND d.day - 1
),
ranked AS (
  SELECT c.d, c.n, c.fd, c.fn,
         sum(CASE WHEN (e.n_events < c.fn)
                   OR (e.n_events = c.fn AND e.day < c.fd)
                  THEN 1 ELSE 0 END) AS smaller,
         CAST(count(*) AS BIGINT) AS w_n
  FROM cand c JOIN daily e
    ON e.day BETWEEN c.d - {W} AND c.d - 1
  GROUP BY 1, 2, 3, 4
)
SELECT d AS day, n AS n_events, fn AS trailing_med,
       CAST((n - fn) * 1000000 // fn AS BIGINT) AS dev_ppm,
       abs(CAST((n - fn) * 1000000 // fn AS BIGINT)) > {VOL_ANOM_PPM}
         AS is_anomaly
FROM ranked
WHERE w_n = {W} AND smaller = {(W - 1) // 2}
ORDER BY day"""


# --- Enum-domain drift audit (round 7) -----------------------------------------------
# Schema contracts declare categorical columns' legal values; upstream
# drift (new codes, casing changes, junk) breaks joins and CASE logic
# silently.  Per declared (table, column, whitelist): row count, rows
# outside the whitelist, distinct unexpected values, and the smallest
# offending value as evidence.  One map-side-combined (col, value)
# aggregate per declaration — never a row-level scan result.  The
# declared whitelists deliberately OMIT one legal value per column
# (documented below) so the audit's arithmetic is observable on the
# synthetic fixture — the dq gate pattern of SEQ_DROP/DUPPAY.

_ENUM_DECLS = [
    # (table, column, allowed-values)  — each list drops one real value
    # (events: 'view'; orders: 'P'; documents: 'zh') to keep the
    # parity rows non-vacuous
    ("events", "event_type", ("click", "error", "purchase", "signup")),
    ("orders", "o_orderstatus", ("F", "O")),
    ("documents", "lang", ("de", "en", "es", "fr")),
]


def q_dq_enum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for t, c, allowed in _ENUM_DECLS:
        counts = (domain.load_table(spark, sf_dir, t)
                  .groupBy(F.col(c).cast("string").alias("v"))
                  .agg(F.count(F.lit(1)).cast("bigint").alias("n")))
        bad = F.col("v").isin(*allowed) == F.lit(False)
        parts.append(counts.agg(
            F.sum("n").cast("bigint").alias("n_rows"),
            F.sum(F.when(bad, F.col("n")).otherwise(0)).cast("bigint")
             .alias("n_unexpected"),
            F.sum(F.when(bad, 1).otherwise(0)).cast("bigint")
             .alias("n_unexpected_distinct"),
            F.min(F.when(bad, F.col("v"))).alias("example_value"))
            .select(F.lit(f"{t}.{c}").alias("key"), "n_rows",
                    "n_unexpected", "n_unexpected_distinct",
                    "example_value",
                    (F.col("n_unexpected") == 0).alias("conforms")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.orderBy("key")


def sql_dq_enum_drift() -> str:
    legs = []
    for t, c, allowed in _ENUM_DECLS:
        inlist = ", ".join(f"'{a}'" for a in allowed)
        legs.append(f"""
  SELECT '{t}.{c}' AS key,
         CAST(sum(n) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN v NOT IN ({inlist}) THEN n ELSE 0 END)
              AS BIGINT) AS n_unexpected,
         CAST(sum(CASE WHEN v NOT IN ({inlist}) THEN 1 ELSE 0 END)
              AS BIGINT) AS n_unexpected_distinct,
         min(CASE WHEN v NOT IN ({inlist}) THEN v END) AS example_value,
         sum(CASE WHEN v NOT IN ({inlist}) THEN n ELSE 0 END) = 0
           AS conforms
  FROM (SELECT CAST({c} AS VARCHAR) AS v, count(*) AS n
        FROM {t} GROUP BY 1)""")
    return ("SELECT * FROM (" + "\nUNION ALL".join(legs)
            + ")\nORDER BY key")


# --- Tukey IQR outlier fences per event type (round 7) --------------------------------
# The boxplot profiling classic, complementing events_mad_outliers'
# robust-center view: exact Q1/Q3 order statistics per type (the
# banded-rank percentile device), 1.5-IQR fences in exact micro units,
# and the tail counts outside each fence from one more corpus pass.

def q_dq_tukey_fences(spark: SparkSession, sf_dir: str) -> DataFrame:
    ranked = _pct_ranked(spark, sf_dir)
    q13 = (ranked.groupBy("event_type")
           .agg(F.max("n").cast("bigint").alias("n_events"),
                F.expr("CAST(max(CASE WHEN rnk = (n - 1) * 25 div 100 + 1"
                       " THEN v_micro END) AS BIGINT)").alias("q1_micro"),
                F.expr("CAST(max(CASE WHEN rnk = (n - 1) * 75 div 100 + 1"
                       " THEN v_micro END) AS BIGINT)").alias("q3_micro")))
    f = (q13.withColumn("iqr_micro",
                        (F.col("q3_micro") - F.col("q1_micro"))
                         .cast("bigint"))
            # 1.5*IQR in exact halves: fence*2 = 2*q1 - 3*iqr
            .withColumn("lo2", F.expr("2 * q1_micro - 3 * iqr_micro"))
            .withColumn("hi2", F.expr("2 * q3_micro + 3 * iqr_micro")))
    e = (domain.load_table(spark, sf_dir, "events")
         .select("event_type",
                 F.expr("CAST(floor(value * 1000000) AS BIGINT)")
                  .alias("v")))
    return (e.join(F.broadcast(f), "event_type")
             .groupBy("event_type")
             .agg(F.max("n_events").alias("n_events"),
                  F.max("q1_micro").alias("q1_micro"),
                  F.max("q3_micro").alias("q3_micro"),
                  F.max("iqr_micro").alias("iqr_micro"),
                  F.sum(F.when(F.expr("2 * v < lo2"), 1).otherwise(0))
                   .cast("bigint").alias("n_below"),
                  F.sum(F.when(F.expr("2 * v > hi2"), 1).otherwise(0))
                   .cast("bigint").alias("n_above"))
             .orderBy("event_type"))


def sql_dq_tukey_fences() -> str:
    return """
WITH v AS (
  SELECT event_type, event_id,
         CAST(floor(value * 1000000) AS BIGINT) AS v_micro
  FROM events
),
ranked AS (
  SELECT event_type, v_micro,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY v_micro, event_id) AS rnk,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM v
),
q13 AS (
  SELECT event_type, CAST(max(n) AS BIGINT) AS n_events,
         CAST(max(CASE WHEN rnk = (n - 1) * 25 // 100 + 1
                  THEN v_micro END) AS BIGINT) AS q1_micro,
         CAST(max(CASE WHEN rnk = (n - 1) * 75 // 100 + 1
                  THEN v_micro END) AS BIGINT) AS q3_micro
  FROM ranked GROUP BY event_type
),
f AS (
  SELECT *, CAST(q3_micro - q1_micro AS BIGINT) AS iqr_micro,
         2 * q1_micro - 3 * (q3_micro - q1_micro) AS lo2,
         2 * q3_micro + 3 * (q3_micro - q1_micro) AS hi2
  FROM q13
)
SELECT f.event_type, f.n_events, f.q1_micro, f.q3_micro, f.iqr_micro,
       CAST(sum(CASE WHEN 2 * v.v_micro < f.lo2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_below,
       CAST(sum(CASE WHEN 2 * v.v_micro > f.hi2 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_above
FROM v JOIN f USING (event_type)
GROUP BY 1, 2, 3, 4, 5
ORDER BY 1"""


# --- Functional-dependency conformance profile (round 9) -------------------------
# Deequ-style FD audit over a PINNED candidate list: for each claimed
# "determinant -> dependent" rule, how many determinant values map to
# MORE than one dependent value?  The load gate behind "order status is
# a function of the order key" / "one supplier per part" assumptions
# that silently rot when an upstream merge goes wrong.
#
# Scale shape: per pair, a two-level keyed aggregate — DISTINCT
# (det, dep) with map-side combine, then a det-grain count — followed
# by a scalar rollup; each branch scans only its two columns (pruned at
# the parquet scan) and nothing is quadratic.  The pair list is a
# bounded constant, so the union is a bounded plan, not data fan-out.

FD_PAIRS = [
    ("customer", "c_nationkey", "c_mktsegment"),
    ("events", "user_id", "event_type"),
    ("lineitem", "l_orderkey", "l_returnflag"),
    ("lineitem", "l_partkey", "l_suppkey"),
    ("orders", "o_custkey", "o_orderpriority"),
    ("orders", "o_orderkey", "o_orderstatus"),
]


def q_dq_functional_dependency(spark: SparkSession, sf_dir: str) -> DataFrame:
    outs = []
    for tbl, det, dep in FD_PAIRS:
        per_det = (domain.load_table(spark, sf_dir, tbl)
                   .select(F.col(det).alias("det"), F.col(dep).alias("dep"))
                   .distinct()
                   .groupBy("det")
                   .agg(F.count(F.lit(1)).cast("bigint").alias("n_deps")))
        outs.append(per_det.agg(
            F.lit(tbl).alias("relation"),
            F.lit(det).alias("determinant"),
            F.lit(dep).alias("dependent"),
            F.count(F.lit(1)).cast("bigint").alias("n_det"),
            F.sum(F.when(F.col("n_deps") > 1, 1).otherwise(0))
             .cast("bigint").alias("n_violating"),
            F.max("n_deps").cast("bigint").alias("max_distinct_dep")))
    u = outs[0]
    for o in outs[1:]:
        u = u.unionAll(o)
    return (u.select("relation", "determinant", "dependent", "n_det",
                     "n_violating",
                     F.expr("CAST(n_violating * 1000000 div n_det"
                            " AS BIGINT)").alias("violation_ppm"),
                     "max_distinct_dep")
             .orderBy("relation", "determinant", "dependent"))


def sql_dq_functional_dependency() -> str:
    parts = []
    for tbl, det, dep in FD_PAIRS:
        parts.append(f"""
SELECT '{tbl}' AS relation, '{det}' AS determinant, '{dep}' AS dependent,
       CAST(count(*) AS BIGINT) AS n_det,
       CAST(sum(CASE WHEN n_deps > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_violating,
       CAST(sum(CASE WHEN n_deps > 1 THEN 1 ELSE 0 END) * 1000000
            // count(*) AS BIGINT) AS violation_ppm,
       CAST(max(n_deps) AS BIGINT) AS max_distinct_dep
FROM (SELECT det, CAST(count(*) AS BIGINT) AS n_deps
      FROM (SELECT DISTINCT {det} AS det, {dep} AS dep FROM {tbl})
      GROUP BY 1)""")
    return ("\nUNION ALL\n".join(parts)
            + "\nORDER BY relation, determinant, dependent")


# --- SLO error-budget burn rate (round 9) ----------------------------------------
# The SRE load gate: per day, the error share of events against a
# pinned SLO, the burn-rate multiple (rate / SLO, milli), and the
# month-to-date cumulative error rate — the three numbers an
# error-budget policy pages on.  Pure integers throughout; the
# cumulative rides the banded day-band prefix device, never a global
# single-task sort.

SLO_ERR_PPM = 250_000          # budget: <= 25% error events (fixture-scaled)


def q_dq_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from .rankutil import banded_cumsum
    day_ns = 86_400 * 1_000_000_000
    e = domain.load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.expr(f"ts div {day_ns}").alias("day"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"),
                   F.sum(F.when(F.col("event_type") == "error", 1)
                          .otherwise(0)).cast("bigint").alias("n_errors")))
    c1 = banded_cumsum(daily, [], F.expr("day div 7"),
                       [F.col("day").asc()], "n_events", "cum_n",
                       inclusive=True)
    c2 = banded_cumsum(daily, [], F.expr("day div 7"),
                       [F.col("day").asc()], "n_errors", "cum_err",
                       inclusive=True)
    j = c1.join(c2.select("day", "cum_err"), "day")
    return (j.select(F.col("day").cast("bigint").alias("day"),
                     "n_events", "n_errors",
                     F.expr("CAST(n_errors * 1000000 div n_events"
                            " AS BIGINT)").alias("err_ppm"),
                     F.expr(f"CAST(n_errors * 1000000 div n_events"
                            f" * 1000 div {SLO_ERR_PPM} AS BIGINT)")
                      .alias("burn_milli"),
                     F.expr(f"(n_errors * 1000000 div n_events"
                            f" > {SLO_ERR_PPM})").alias("breach"),
                     F.expr("CAST(cum_err * 1000000 div cum_n AS BIGINT)")
                      .alias("cum_err_ppm"))
             .orderBy("day"))


def sql_dq_error_budget() -> str:
    day_ns = 86_400 * 1_000_000_000
    return f"""
WITH daily AS (
  SELECT epoch_ns(ts) // {day_ns} AS day,
         CAST(count(*) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_errors
  FROM events GROUP BY 1
),
c AS (
  SELECT day, n_events, n_errors,
         CAST(sum(n_events) OVER (ORDER BY day
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_n,
         CAST(sum(n_errors) OVER (ORDER BY day
           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_err
  FROM daily
)
SELECT CAST(day AS BIGINT) AS day, n_events, n_errors,
       CAST(n_errors * 1000000 // n_events AS BIGINT) AS err_ppm,
       CAST(n_errors * 1000000 // n_events * 1000 // {SLO_ERR_PPM}
            AS BIGINT) AS burn_milli,
       (n_errors * 1000000 // n_events > {SLO_ERR_PPM}) AS breach,
       CAST(cum_err * 1000000 // cum_n AS BIGINT) AS cum_err_ppm
FROM c
ORDER BY day"""


# --- Pearson correlation matrix over table numerics (round 10) ----------------
# The classic Deequ/profiler readout dq_column_profile stops short of:
# the pairwise Pearson matrix over lineitem's four numeric columns
# (quantity, extended price, discount, tax) in exact integer units —
# the multicollinearity check a feature pipeline runs before training,
# and the redundant-column detector a warehouse runs before wide scans.
#
# Exactness: the same sufficient-statistic device as
# graph_assortativity / ml_risk_model — every sum and cross-product
# accumulates on DECIMAL(38,0)/HUGEINT over exact integer projections
# (floor-cents / round-cents per the repo idiom), the correlation is
# ONE floor(double * 1e6) over identical expression trees, and
# zero-variance columns surface NULL instead of dividing by zero.
# Bounds: price cents <= ~1.1e7, so sum(price^2) <= 1.2e14 * n — the
# n * sxy cross-term stays inside DECIMAL(38,0) to n ~ 1e12 rows.
#
# Scale shape: ONE map-side-combined global aggregate over the fact
# scan (a single 1-row result — no shuffle wider than the partial
# buffers), then a 6-row unpivot of the scalar.  Corpus appears once.

_CORR_COLS = [
    ("l_quantity", "CAST(floor(l_quantity) AS BIGINT)"),
    ("l_extendedprice", "CAST(floor(l_extendedprice * 100) AS BIGINT)"),
    ("l_discount", "CAST(round(l_discount * 100) AS BIGINT)"),
    ("l_tax", "CAST(round(l_tax * 100) AS BIGINT)"),
]


def _corr_micro_expr(a: str, b: str, hugeint: bool = False) -> str:
    """floor(1e6 * pearson(a, b)) from the exact integer sums — the
    SAME expression tree in Spark (DECIMAL(38,0)) and DuckDB (HUGEINT)."""
    dec = "HUGEINT" if hugeint else "DECIMAL(38,0)"
    num = f"(CAST(n AS {dec}) * s_{a}_{b} - CAST(s_{a} AS {dec}) * s_{b})"
    dx = f"(CAST(n AS {dec}) * s_{a}_{a} - CAST(s_{a} AS {dec}) * s_{a})"
    dy = f"(CAST(n AS {dec}) * s_{b}_{b} - CAST(s_{b} AS {dec}) * s_{b})"
    return (f"CASE WHEN {dx} > 0 AND {dy} > 0 THEN "
            f"CAST(floor(CAST({num} AS DOUBLE) * 1000000 / "
            f"(sqrt(CAST({dx} AS DOUBLE)) * sqrt(CAST({dy} AS DOUBLE))))"
            f" AS BIGINT) ELSE NULL END")


def q_dq_column_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = domain.load_table(spark, sf_dir, "lineitem")
    names = [n for n, _ in _CORR_COLS]
    ints = li.select(*[F.expr(e).alias(n) for n, e in _CORR_COLS])
    dec = "DECIMAL(38,0)"
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for n, _ in _CORR_COLS:
        aggs.append(F.sum(n).cast("bigint").alias(f"s_{n}"))
    for i, (a, _) in enumerate(_CORR_COLS):
        for b, _e in _CORR_COLS[i:]:
            aggs.append(
                F.sum(F.expr(f"CAST({a} AS {dec}) * {b}"))
                 .cast(dec).alias(f"s_{a}_{b}"))
    s = ints.agg(*aggs)
    pairs = [(a, b) for i, (a, _) in enumerate(_CORR_COLS)
             for b, _e in _CORR_COLS[i + 1:]]
    stack = ", ".join(
        f"'{a}', '{b}', {_corr_micro_expr(a, b)}" for a, b in pairs)
    return (s.select(F.col("n").alias("n_rows"),
                     F.expr(f"stack({len(pairs)}, {stack}) "
                            "AS (col_a, col_b, corr_micro)"))
             .select("col_a", "col_b", "n_rows", "corr_micro")
             .orderBy("col_a", "col_b"))


def sql_dq_column_correlation() -> str:
    sums = ["CAST(count(*) AS BIGINT) AS n"]
    for n, e in _CORR_COLS:
        sums.append(f"CAST(sum({e}) AS BIGINT) AS s_{n}")
    for i, (a, ea) in enumerate(_CORR_COLS):
        for b, eb in _CORR_COLS[i:]:
            sums.append(f"sum(CAST({ea} AS HUGEINT) * ({eb})) AS s_{a}_{b}")
    pairs = [(a, b) for i, (a, _) in enumerate(_CORR_COLS)
             for b, _e in _CORR_COLS[i + 1:]]
    sel = "\nUNION ALL\n".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, n AS n_rows,\n"
        f"       {_corr_micro_expr(a, b, hugeint=True)} AS corr_micro\n"
        f"FROM s"
        for a, b in pairs)
    return f"""
WITH s AS (
  SELECT {", ".join(sums)}
  FROM lineitem
)
{sel}
ORDER BY col_a, col_b"""


# --- Seasonality-adjusted MAD anomaly days (round 10) --------------------------
# events_mad_outliers flags raw VALUES; volume anomalies need the
# day-of-week effect removed first or every weekend reads as an outlier
# (the classic pager-fatigue bug).  Per event type: daily counts, the
# per-(type, day-of-week) LOWER MEDIAN as the seasonal baseline, then
# a MAD fence over the RESIDUALS — flag days |count - dow_median| >
# K * MAD(residuals).  Composes the events_seasonality decomposition
# idea with the events_mad_outliers robust fence at day grain.
#
# Exactness: counts, medians, residuals, and the fence are all exact
# integers; medians are lower-median row_number picks (never the
# averaged even-count median, which would be fractional).
#
# Scale shape: the corpus collapses to the (type, day) daily table in
# ONE map-side-combined aggregate; every window after that runs on
# the bounded daily table (|types| x |days| rows — at 100 TB with 10
# years of days and 1e4 types that is 4e7 rows, still window-safe at
# (type, dow) grain ~ 520 rows per partition).  Output is only the
# flagged days.

SMAD_K = 3


def q_dq_seasonal_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window
    e = domain.load_table(spark, sf_dir, "events")
    daily = (e.groupBy(F.col("event_type"),
                       F.expr(f"ts div {_DAY_NS}").alias("day"))
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_events"))
              .withColumn("dow", F.expr("(day + 4) % 7").cast("int")))
    # lower median of n_events per (type, dow): row_number pick over the
    # BOUNDED daily table (see scale note above)
    w = Window.partitionBy("event_type", "dow").orderBy("n_events", "day")
    cw = Window.partitionBy("event_type", "dow")
    med = (daily.withColumn("rnk", F.row_number().over(w))
                .withColumn("cnt", F.count(F.lit(1)).over(cw))
                .groupBy("event_type", "dow")
                .agg(F.expr("CAST(max(CASE WHEN rnk = (cnt - 1) div 2 + 1 "
                            "THEN n_events END) AS BIGINT)")
                      .alias("dow_median")))
    resid = (daily.join(med, ["event_type", "dow"])
                  .withColumn("resid", F.col("n_events")
                              - F.col("dow_median"))
                  .withColumn("aresid", F.abs("resid")))
    rw = Window.partitionBy("event_type").orderBy("aresid", "day")
    rcw = Window.partitionBy("event_type")
    mad = (resid.withColumn("rrnk", F.row_number().over(rw))
                .withColumn("rcnt", F.count(F.lit(1)).over(rcw))
                .groupBy("event_type")
                .agg(F.expr("CAST(max(CASE WHEN rrnk = (rcnt - 1) div 2 + 1 "
                            "THEN aresid END) AS BIGINT)")
                      .alias("mad_resid")))
    return (resid.join(F.broadcast(mad), "event_type")
                 .filter(F.col("aresid") > SMAD_K * F.col("mad_resid"))
                 .select("event_type", "day", F.col("dow"),
                         "n_events", "dow_median",
                         F.col("resid").cast("bigint").alias("resid"),
                         "mad_resid")
                 .orderBy("event_type", "day"))


def sql_dq_seasonal_mad_anomaly() -> str:
    return f"""
WITH daily AS (
  SELECT event_type, epoch_ns(ts) // {_DAY_NS} AS day,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY 1, 2
),
d AS (
  SELECT event_type, day, n_events,
         CAST((day + 4) % 7 AS INT) AS dow
  FROM daily
),
med AS (
  SELECT event_type, dow,
         CAST(max(CASE WHEN rnk = (cnt - 1) // 2 + 1
                       THEN n_events END) AS BIGINT) AS dow_median
  FROM (SELECT event_type, dow, n_events,
               row_number() OVER (PARTITION BY event_type, dow
                                  ORDER BY n_events, day) AS rnk,
               count(*) OVER (PARTITION BY event_type, dow) AS cnt
        FROM d)
  GROUP BY 1, 2
),
resid AS (
  SELECT d.event_type, d.day, d.dow, d.n_events, m.dow_median,
         d.n_events - m.dow_median AS resid,
         abs(d.n_events - m.dow_median) AS aresid
  FROM d JOIN med m ON d.event_type = m.event_type AND d.dow = m.dow
),
mad AS (
  SELECT event_type,
         CAST(max(CASE WHEN rrnk = (rcnt - 1) // 2 + 1
                       THEN aresid END) AS BIGINT) AS mad_resid
  FROM (SELECT event_type, aresid, day,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY aresid, day) AS rrnk,
               count(*) OVER (PARTITION BY event_type) AS rcnt
        FROM resid)
  GROUP BY 1
)
SELECT r.event_type, r.day, r.dow, r.n_events, r.dow_median,
       CAST(r.resid AS BIGINT) AS resid, m.mad_resid
FROM resid r JOIN mad m ON r.event_type = m.event_type
WHERE r.aresid > {SMAD_K} * m.mad_resid
ORDER BY r.event_type, r.day"""
