#!/usr/bin/env python
"""Local mirror of the driver's correctness gate over ALL registered queries.

The driver's CORRECTNESS_r{N}.json checks the first ~50 registered queries;
this script runs every `queries()` entry on a DEFAULT SparkSession (like the
driver's) at sf0.01, value-compares against `oracle_sql()` in DuckDB
(sorted columns, sorted rows, 1e-9 float tolerance — a superset of the
hash gate), and writes CORRECTNESS_LOCAL_r{N}.json so the tail beyond any
driver cap still has recorded evidence.

Usage: python tools/local_correctness.py [round_number]
"""

from __future__ import annotations

import json
import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _norm(v):
    import decimal
    if v is None:
        return None
    if isinstance(v, float) and v != v:  # NaN (pandas NULL)
        return None
    if isinstance(v, decimal.Decimal):  # DuckDB DECIMAL expressions
        return float(v)
    return v


def _key(row):
    return tuple((v is None, str(type(v).__name__), v if v is not None else 0)
                 for v in row)


def _eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        return math.isclose(a, b, rel_tol=1e-9, abs_tol=1e-9)
    return a == b


def main() -> None:
    rnd = int(sys.argv[1]) if len(sys.argv) > 1 else 0
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

    results: dict[str, dict] = {}
    queries, oracles = entry.queries(), entry.oracle_sql()
    for name, q in queries.items():
        rec: dict = {"err": None}
        try:
            sdf = q(spark, SF_DIR)
            if name not in oracles:
                rec.update(rows_only=True, spark_rows=sdf.count())
                results[name] = rec
                continue
            cols = sorted(sdf.columns)
            srows = sorted((tuple(_norm(v) for v in r)
                            for r in sdf.select(*cols).collect()), key=_key)
            # fetchall keeps native date/int types (fetchdf coerces to pandas)
            cur = con.execute(oracles[name])
            ocols_order = [d[0] for d in cur.description]
            perm = [ocols_order.index(c) for c in cols]
            orows = sorted((tuple(_norm(r[i]) for i in perm)
                            for r in cur.fetchall()), key=_key)
            rec.update(
                rows_match=len(srows) == len(orows),
                schema_match=sorted(ocols_order) == cols,
                values_match=len(srows) == len(orows) and all(
                    all(_eq(a, b) for a, b in zip(x, y))
                    for x, y in zip(srows, orows)),
                spark_rows=len(srows), oracle_rows=len(orows),
            )
        except Exception as e:  # noqa: BLE001
            rec["err"] = f"{type(e).__name__}: {e}"[:300]
        results[name] = rec

    out = Path(__file__).resolve().parent.parent / \
        f"CORRECTNESS_LOCAL_r{rnd:02d}.json"
    out.write_text(json.dumps(results, indent=1))
    n_ok = sum(1 for r in results.values()
               if r.get("values_match") or r.get("rows_only"))
    print(f"{out.name}: {n_ok}/{len(results)} green")
    bad = [n for n, r in results.items()
           if not (r.get("values_match") or r.get("rows_only"))]
    if bad:
        print("NOT GREEN:", bad)
        sys.exit(1)


if __name__ == "__main__":
    main()
