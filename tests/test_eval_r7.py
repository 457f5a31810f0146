"""Round-7 wave-20 semantics: model-evaluation rank statistics
(ROC AUC / KS / gains deciles) and the Benford first-digit audit —
each cross-checked against a driver-side brute force at sf0.001."""

from __future__ import annotations

import math
from collections import defaultdict

from safeascent_spark import domain
from safeascent_spark.operators import evalrank as EV
from safeascent_spark.operators import monitor as MON
from tests.conftest import SF_SMOKE


def _scored(spark):
    return [(r.event_type, r.event_id, math.floor(r.value * 100))
            for r in domain.load_table(spark, SF_SMOKE, "events")
                          .select("event_type", "event_id", "value")
                          .collect()]


def test_roc_auc_matches_pairwise_bruteforce(spark):
    """2U literally counts (pos > neg) pairs x2 + ties x1."""
    data = _scored(spark)
    rows = {r.event_type: r for r in
            EV.q_eval_roc_auc(spark, SF_SMOKE).collect()}
    types = {t for t, _, _ in data}
    assert set(rows) == types
    for t in types:
        pos = sorted(s for ty, _, s in data if ty == t)
        neg = sorted(s for ty, _, s in data if ty != t)
        # O(n log n) brute force via sorted merge counts
        import bisect
        u2 = 0
        for s in pos:
            lo = bisect.bisect_left(neg, s)
            hi = bisect.bisect_right(neg, s)
            u2 += 2 * lo + (hi - lo)
        r = rows[t]
        assert (r.n_pos, r.n_neg) == (len(pos), len(neg))
        assert r.auc_ppm == u2 * 1_000_000 // (2 * len(pos) * len(neg))


def test_ks_matches_cdf_bruteforce(spark):
    data = _scored(spark)
    rows = {r.event_type: r for r in
            EV.q_eval_ks_statistic(spark, SF_SMOKE).collect()}
    scores = sorted({s for _, _, s in data})
    for t in rows:
        pos = [s for ty, _, s in data if ty == t]
        neg = [s for ty, _, s in data if ty != t]
        best, best_s = -1, None
        cp = cn = 0
        pos_sorted, neg_sorted = sorted(pos), sorted(neg)
        import bisect
        for s in scores:
            cp = bisect.bisect_right(pos_sorted, s)
            cn = bisect.bisect_right(neg_sorted, s)
            d = abs(cp * len(neg) - cn * len(pos))
            if d > best:
                best, best_s = d, s
        r = rows[t]
        assert r.ks_at_score_c == best_s
        assert r.ks_ppm == best * 1_000_000 // (len(pos) * len(neg))


def test_gains_deciles_capture_and_lift(spark):
    data = _scored(spark)
    rows = EV.q_ml_gains_deciles(spark, SF_SMOKE).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    # replicate: rank by score desc, event_id asc; decile by row_number
    ordered = sorted(data, key=lambda x: (-x[2], x[1]))
    n = len(ordered)
    dec_rows = defaultdict(list)
    for i, (ty, _, _) in enumerate(ordered):
        dec_rows[i * 10 // n + 1].append(ty)
    cum_pos = cum_rows = 0
    total_pos = sum(1 for ty, _, _ in data if ty == EV.GAINS_POS_TYPE)
    for r in rows:
        got = dec_rows[r.decile]
        np = sum(1 for ty in got if ty == EV.GAINS_POS_TYPE)
        assert (r.n_rows, r.n_pos) == (len(got), np)
        cum_pos += np
        cum_rows += len(got)
        assert r.cum_pos == cum_pos
        assert r.capture_ppm == cum_pos * 1_000_000 // total_pos
        assert r.lift_ppm == cum_pos * n * 1_000_000 // (cum_rows * total_pos)
    # decile sizes differ by at most 1 (row_number split)
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1


def test_benford_expected_table_is_exact():
    """The hardcoded integer ppm table IS round(log10(1+1/d)*1e6) and
    partitions 1e6 exactly."""
    for d, p in MON.BENFORD_PPM.items():
        assert p == round(math.log10(1 + 1 / d) * 1_000_000)
    assert sum(MON.BENFORD_PPM.values()) == 1_000_000


def test_benford_counts_match_bruteforce(spark):
    rows = {r.digit: r for r in MON.q_dq_benford(spark, SF_SMOKE).collect()}
    prices = [math.floor(r.o_totalprice * 100) for r in
              domain.load_table(spark, SF_SMOKE, "orders")
                    .select("o_totalprice").collect()]
    n = len(prices)
    counts = defaultdict(int)
    for p in prices:
        counts[int(str(p)[0])] += 1
    assert set(rows) == set(counts)
    for d, r in rows.items():
        assert r.n_obs == counts[d]
        assert r.obs_ppm == counts[d] * 1_000_000 // n
        x = counts[d] * 1_000_000 - n * MON.BENFORD_PPM[d]
        assert r.chi2_micro == x * x // (n * MON.BENFORD_PPM[d])


# --- wave 21: embedding certification + Neyman sampling plan ----------------

def test_quantization_error_matches_bruteforce(spark):
    from safeascent_spark.operators import similarity as SIM
    rows = {r.label: r for r in
            SIM.q_embedding_quantization_error(spark, SF_SMOKE).collect()}
    vecs = (domain.load_table(spark, SF_SMOKE, "embeddings")
            .select("label", "embedding").collect())
    per = defaultdict(list)
    for r in vecs:
        for x in r.embedding:
            x = float(x)
            q = round(max(-1.0, min(1.0, x)) * 127)
            per[r.label].append(math.floor((x - q / 127.0) * 1_000_000))
    assert set(rows) == set(per)
    for lb, errs in per.items():
        r = rows[lb]
        assert r.n_vals == len(errs)
        assert r.bias_sum_u == sum(errs)
        assert r.abs_sum_u == sum(abs(e) for e in errs)
        assert r.max_abs_u == max(abs(e) for e in errs)
        assert r.mse_p12 == sum(e * e for e in errs) // len(errs)


def test_norm_profile_low_gate(spark):
    from safeascent_spark.operators import similarity as SIM
    rows = {r.label: r for r in
            SIM.q_embedding_norm_profile(spark, SF_SMOKE).collect()}
    vecs = (domain.load_table(spark, SF_SMOKE, "embeddings")
            .select("label", "embedding").collect())
    norms = defaultdict(list)
    for r in vecs:
        n2 = sum(round(max(-1.0, min(1.0, float(x))) * 127) ** 2
                 for x in r.embedding)
        norms[r.label].append(n2)
    allv = [n for v in norms.values() for n in v]
    g_milli = sum(allv) * 1000 // len(allv)
    for lb, ns in norms.items():
        r = rows[lb]
        assert (r.n_vecs, r.min_norm2, r.max_norm2) == \
            (len(ns), min(ns), max(ns))
        assert r.mean_norm2_milli == sum(ns) * 1000 // len(ns)
        assert r.n_low == sum(1 for n in ns if n * 2000 < g_milli)


def test_neyman_allocation_invariants(spark):
    from safeascent_spark.operators import curation as CU
    rows = CU.q_sample_stratified_neyman(spark, SF_SMOKE).collect()
    # budget exactly exhausted
    assert sum(r.alloc_n for r in rows) == CU.NEYMAN_BUDGET
    # allocation proportional to N_h * sigma_h within the +/-1 integer
    # granularity of largest-remainder rounding
    tw = sum(r.sd_scaled for r in rows)
    for r in rows:
        exact = CU.NEYMAN_BUDGET * r.sd_scaled / tw
        assert abs(r.alloc_n - exact) < 1.0
        assert r.sampling_ppm == r.alloc_n * 1_000_000 // r.n_rows
    # sd_scaled really is floor(sqrt(N*Sxx - Sx^2)) on exact cents
    data = defaultdict(list)
    for e in (domain.load_table(spark, SF_SMOKE, "events")
                    .select("event_type", "value").collect()):
        data[e.event_type].append(math.floor(e.value * 100))
    for r in rows:
        xs = data[r.event_type]
        v = len(xs) * sum(x * x for x in xs) - sum(xs) ** 2
        assert r.sd_scaled == math.floor(math.sqrt(v))
