#!/usr/bin/env python
"""Measure per-query scaling curves: min-of-N interleaved runs at two SF
dirs on one session per SF (the BENCH_sf1.json protocol, reusable).

Usage:
    python tools/sf_curves.py q1 q2 ...            # sf0.1 vs .testdata_sf1
    SF_A=/root/testdata/sf0.1 SF_B=.testdata_sf1 N=3 \
        python tools/sf_curves.py q1 q2 ...

Prints one JSON object {query: {sf_a_sec, sf_b_sec, ratio}} to stdout.
Run on an idle machine; interleaving (A,B,A,B,...) amortizes drift.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_A = os.environ.get("SF_A", "/root/testdata/sf0.1")
SF_B = os.environ.get("SF_B", ".testdata_sf1")
N = int(os.environ.get("N", "3"))


def main() -> None:
    names = sys.argv[1:]
    if not names:
        print("usage: sf_curves.py <query> [...]", file=sys.stderr)
        sys.exit(2)
    from safeascent_spark.session import get_spark
    import __spark_entry__ as entry

    qs = entry.queries()
    spark = get_spark("sf_curves")
    best: dict[str, dict[str, float]] = {
        n: {"a": float("inf"), "b": float("inf")} for n in names}
    # MAT=noop materializes via a noop write (bench.py's protocol: every
    # column evaluated — honest absolute latency).  The default count()
    # lets Catalyst prune expensive projections, so its absolute seconds
    # under-state some queries; its RATIOS stay valid (identical pruning
    # at both SFs) and match the historical rows in BENCH_sf1.json.
    mat = os.environ.get("MAT", "count")
    for _ in range(N):
        for name in names:
            for leg, sf in (("a", SF_A), ("b", SF_B)):
                t0 = time.monotonic()
                df = qs[name](spark, sf)
                if mat == "noop":
                    df.write.format("noop").mode("overwrite").save()
                else:
                    df.count()
                dt = time.monotonic() - t0
                best[name][leg] = min(best[name][leg], dt)
    out = {
        n: {
            "sf_a_sec": round(v["a"], 3),
            "sf_b_sec": round(v["b"], 3),
            "ratio": round(v["b"] / v["a"], 2) if v["a"] > 0 else None,
        }
        for n, v in best.items()
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
