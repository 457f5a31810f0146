#!/usr/bin/env python
"""Exact (bit-level, post-round) Spark-vs-DuckDB compare for a query subset.

Stricter than local_correctness.py's 1e-9 tolerance: values must be
EXACTLY equal after the queries' own rounding — the same bar as the
driver's hash gate.  Usage: python tools/exact_check.py name [name ...]
(defaults to the scoring surface).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 and "/" in sys.argv[1] else "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

DEFAULT = [
    "risk_scores", "top_contributors", "risk_factor_breakdown",
    "cache_warming_top_routes", "batch_scores", "batch_scores_classed",
    "k1_haversine", "k2_spatial_weight", "k13_elevation_weight",
    "k19_bearing_impact", "f1_accident_filter", "f7_bbox_radius_filter",
    "a3_seasonal_patterns", "j2_weather_range_join", "predict_point",
]


def _norm(v):
    import decimal
    if v is None:
        return None
    if isinstance(v, float) and v != v:
        return None
    if isinstance(v, decimal.Decimal):
        return float(v)
    return v


def _key(row):
    return tuple((v is None, str(type(v).__name__), v if v is not None else 0)
                 for v in row)


def main() -> None:
    names = [a for a in sys.argv[1:] if "/" not in a] or DEFAULT
    from pyspark.sql import SparkSession
    import duckdb
    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{SF_DIR}/{t}.parquet')")

    queries, oracles = entry.queries(), entry.oracle_sql()
    failed = []
    for name in names:
        sdf = queries[name](spark, SF_DIR)
        cols = sorted(sdf.columns)
        srows = sorted((tuple(_norm(v) for v in r)
                        for r in sdf.select(*cols).collect()), key=_key)
        cur = con.execute(oracles[name])
        ocols = [d[0] for d in cur.description]
        idx = [ocols.index(c) for c in sorted(ocols)]
        orows = sorted((tuple(_norm(r[i]) for i in idx)
                        for r in cur.fetchall()), key=_key)
        if sorted(ocols) != cols:
            failed.append((name, f"schema {cols} vs {sorted(ocols)}"))
            print(f"FAIL {name}: schema")
            continue
        if len(srows) != len(orows):
            failed.append((name, f"rows {len(srows)} vs {len(orows)}"))
            print(f"FAIL {name}: rowcount {len(srows)} vs {len(orows)}")
            continue
        bad = [(a, b) for a, b in zip(srows, orows) if a != b]
        if bad:
            failed.append((name, f"{len(bad)} mismatched rows"))
            print(f"FAIL {name}: {len(bad)}/{len(srows)} rows differ; first: "
                  f"{bad[0][0]} vs {bad[0][1]}")
        else:
            print(f"OK   {name}: {len(srows)} rows exact")
    if failed:
        sys.exit(1)


if __name__ == "__main__":
    main()
