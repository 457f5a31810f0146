#!/usr/bin/env python
"""Dump plans/r13/<query>_<tag>.txt formatted plans for the headline set.

Usage: python tools/r13_plans.py <before|after> [query ...]
Defaults to every bench.py HEADLINE query at sf0.1 (the benched SF, so the
plan reflects the benched statistics).
"""
from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    from bench import HEADLINE
    import __spark_entry__ as entry
    from safeascent_spark.session import get_spark

    qs = entry.queries()
    if not names:
        names = [n for n in HEADLINE if n in qs]
    out = Path(__file__).resolve().parent.parent / "plans" / "r13"
    out.mkdir(parents=True, exist_ok=True)
    spark = get_spark("r13-plans")
    for n in names:
        df = qs[n](spark, SF)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        (out / f"{n}_{tag}.txt").write_text(txt)
        print(f"{n}: {txt.count('Exchange')} Exchange, "
              f"{txt.count('SortMergeJoin')} SMJ, "
              f"{txt.count('BroadcastHashJoin')} BHJ, "
              f"{txt.count('EvalPython') + txt.count('MapInPandas')} pyNodes, "
              f"{len(txt.splitlines())} lines")
    spark.stop()


if __name__ == "__main__":
    main()
