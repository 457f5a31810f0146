"""Write docs/plan_<name>.txt formatted-plan snapshots for named queries.

Usage: python tools/plan_snapshot.py <query-name> [<query-name> ...]

Snapshots are the review artifact the plan-pin tests in tests/test_plans.py
reference: regenerate one whenever a query's plan intentionally changes, and
read the diff — an unintentional Exchange/Sort/NestedLoop appearing in the
diff is the regression the snapshot exists to catch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.01"


def main(names: list[str]) -> None:
    from pyspark.sql import SparkSession
    import __spark_entry__ as entry

    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.shuffle.partitions", "8")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        df = qs[name](spark, SF)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "docs", f"plan_{name}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count(chr(10))} lines)")


if __name__ == "__main__":
    main(sys.argv[1:])
