#!/usr/bin/env python
"""Measure the latitude-band equi-join's prune sharpness and timing at
sf0.1 for LAT_BAND_K in {1,2,3,4}: generated-pair count (join output before
the row-level prefilter) and warm best-of-2 noop time for top_contributors
and batch_scores.  Guides the K constant choice (r13, VERDICT r12 item 1).
"""
from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from safeascent_spark.session import get_spark
    from safeascent_spark import domain
    from safeascent_spark.operators import scoring, batch

    spark = get_spark("r13-band-probe")
    # warm dims
    reach = scoring.significance_reach_km(spark, SF)
    print(f"reach_km={reach:.2f}")
    n_acc = domain.accidents_df(spark, SF).count()
    n_routes = domain.routes_df(spark, SF).count()
    n_loc = domain.locations_df(spark, SF).count()
    print(f"|accidents|={n_acc} |routes|={n_routes} |locations|={n_loc}")

    # baseline pair counts (no band): route_type-only join / cross join
    cand0 = scoring._candidate_pairs(spark, SF, domain.PRED_DATE, None,
                                     grid=False)
    print(f"uncapped pairs (no band) = {cand0.count()}")
    kept0 = scoring._lat_gap_prefilter(cand0, reach).count()
    print(f"  surviving lat-gap prefilter = {kept0}")

    for K in (1, 2, 3, 4, 6):
        scoring.LAT_BAND_K = K
        cand = scoring._candidate_pairs(spark, SF, domain.PRED_DATE, None,
                                        grid=False, band_km=reach)
        n = cand.count()
        print(f"K={K}: generated={n} ({100.0 * n / max(1, cand0.count()):.1f}%)"
              f" dim_rows={n_acc * 7 * (2 * K + 1)}")

    # timing: warm best-of-2 per K for the two headline consumers
    def t_once(df):
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    import __spark_entry__ as entry
    qs = entry.queries()
    for K in (1, 2, 3, 4):
        scoring.LAT_BAND_K = K
        for name in ("top_contributors", "batch_scores"):
            ts = [t_once(qs[name](spark, SF)) for _ in range(2)]
            print(f"K={K} {name}: best {min(ts):.3f}s  ({['%.3f' % t for t in ts]})")
    spark.stop()


if __name__ == "__main__":
    main()
