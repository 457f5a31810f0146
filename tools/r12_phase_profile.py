#!/usr/bin/env python
"""Per-query phase decomposition: builder-call time, driver planning time
(analyzed+optimized+physical plan), and execution time (noop sink).

Usage: python tools/r12_phase_profile.py [query ...]   (default: HEADLINE)
Prints one JSON line per query: {"q": name, "build": s, "plan": s, "exec": s}
per pass for 2 passes (pass 1 includes dim warmup like bench.py's warmed
steady state does not — read pass 2).
"""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from bench import HEADLINE
    import __spark_entry__ as entry
    from safeascent_spark.session import get_spark

    qs = entry.queries()
    if not names:
        names = [n for n in HEADLINE if n in qs]
    spark = get_spark("r12-phase-profile")
    # warm like bench.py
    qs[names[0]](spark, SF).write.format("noop").mode("overwrite").save()
    for p in range(2):
        for n in names:
            t0 = time.perf_counter()
            df = qs[n](spark, SF)
            t1 = time.perf_counter()
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.perf_counter()
            print(json.dumps({"pass": p, "q": n, "build": round(t1 - t0, 3),
                              "plan": round(t2 - t1, 3),
                              "exec": round(t3 - t2, 3)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
