#!/usr/bin/env python
"""Codegen-fallback audit: execute every registered query at sf0.001 and
attribute any janino "grows beyond 64 KB" / codegen-failure warnings to the
query that triggered them.

A fallback is silent correctness-wise (Spark interprets the stage) but a
5-20x perf cliff — exactly the regression class the r4 audit caught in the
serving drill-downs.  Run per-round after adding queries:

    python tools/codegen_audit.py 2>/tmp/codegen_audit_stderr.log

Attribution: execution is synchronous, so BEGIN/END markers written to
stderr bracket each query's log lines (log4j also writes stderr).  The
summary prints to stdout; exit code 1 if any non-allowlisted query fell
back.  k14_grade_weight is allowlisted: it deliberately exercises the raw
expression-level grade parser (its purpose IS oracle parity of the parse
formula; production paths use the broadcast lookup dim).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF_DIR = "/root/testdata/sf0.001"
ALLOWLIST = {"k14_grade_weight"}
PAT = re.compile(r"grows beyond 64 KB|Failed to compile|CodeGenerator.*Error",
                 re.IGNORECASE)


def main() -> int:
    from pyspark.sql import SparkSession
    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    marks: list[tuple[str, str]] = []  # (query, marker) in execution order
    for name, q in entry.queries().items():
        print(f"### BEGIN {name}", file=sys.stderr, flush=True)
        try:
            q(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        except Exception as e:  # noqa: BLE001 — audit must cover the rest
            print(f"ERROR {name}: {type(e).__name__}: {e}")
        print(f"### END {name}", file=sys.stderr, flush=True)
        marks.append((name, name))
    spark.stop()

    # stderr was redirected by the caller; re-read it for attribution
    log_path = "/tmp/codegen_audit_stderr.log"
    try:
        lines = open(log_path, errors="replace").read().splitlines()
    except OSError:
        print("NOTE: redirect stderr to /tmp/codegen_audit_stderr.log for "
              "attribution; falling back to summary-free exit 0")
        return 0
    current, hits = None, {}
    for ln in lines:
        m = re.search(r"### (BEGIN|END) (\S+)", ln)
        if m:
            current = m.group(2) if m.group(1) == "BEGIN" else None
            continue
        if PAT.search(ln):
            hits.setdefault(current or "<between queries>", []).append(
                ln.strip()[:160])
    bad = {k: v for k, v in hits.items() if k not in ALLOWLIST}
    print(f"queries audited: {len(marks)}")
    print(f"fallbacks (allowlisted): "
          f"{sorted(k for k in hits if k in ALLOWLIST)}")
    print(f"fallbacks (NOT allowlisted): {sorted(bad)}")
    for k, v in sorted(bad.items()):
        for ln in v[:2]:
            print(f"  {k}: {ln}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
