#!/usr/bin/env python
"""One A/B leg: warm best-of-2 noop timing for the r13-touched queries.
Prints one JSON line.  Run alternately from HEAD and the r12-close
worktree; compare per-query best across legs (r12 protocol)."""
from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QUERIES = ["risk_scores", "risk_scores_capped", "batch_scores",
           "batch_scores_classed", "top_contributors", "geo_knn_grid",
           "search_mmr", "graph_pagerank", "multimodal_phash_clusters"]


def main() -> None:
    from safeascent_spark.session import get_spark
    import __spark_entry__ as entry
    spark = get_spark("r13-ab")
    qs = entry.queries()
    names = [n for n in QUERIES if n in qs]
    # warm session dims + JVM once
    for n in names:
        qs[n](spark, SF).write.format("noop").mode("overwrite").save()
    out = {}
    for _ in range(2):
        for n in names:
            t0 = time.perf_counter()
            qs[n](spark, SF).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            out[n] = min(out.get(n, 1e9), dt)
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))
    spark.stop()


if __name__ == "__main__":
    main()
