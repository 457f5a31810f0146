"""Round-6 wave-4 semantics: Holt fold parity, RFM quintile laws, MMR
greedy-selection parity."""

from __future__ import annotations

import math

from safeascent_spark import domain
from safeascent_spark.operators import forecast as FC
from tests.conftest import SF_ORACLE


def test_holt_matches_bruteforce_fold(spark):
    rows = FC.q_events_holt(spark, SF_ORACLE).collect()
    ev = domain.load_table(spark, SF_ORACLE, "events").collect()
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, math.floor(r.value * 1000)))
    got = {r.user_id: r for r in rows}
    assert set(got) == set(series)
    for uid, obs in series.items():
        obs.sort()
        vals = [v for _, _, v in obs][-FC.HOLT_WINDOW:]
        lvl, trd = vals[0], 0
        for x in vals[1:]:
            nl = (x + lvl + trd) // 2          # python // floors
            trd = (nl - lvl + 3 * trd) // 4
            lvl = nl
        r = got[uid]
        assert (r.n_obs, r.level_milli, r.trend_milli) == \
            (len(vals), lvl, trd), (uid, r)
        assert r.forecast_milli == lvl + trd


def test_rfm_quintiles_are_balanced_and_monotone(spark):
    rows = FC.q_orders_rfm(spark, SF_ORACLE).collect()
    n = len(rows)
    from collections import Counter
    for attr, metric, best_high in (
            ("r_q", "recency_days", False),
            ("f_q", "frequency", True),
            ("m_q", "monetary_c", True)):
        sizes = Counter(getattr(r, attr) for r in rows)
        assert set(sizes) == {1, 2, 3, 4, 5}
        assert max(sizes.values()) - min(sizes.values()) <= 1, (attr, sizes)
        # monotone: a strictly better metric value never gets a worse
        # quintile (ties can straddle a boundary via the id tiebreak)
        srt = sorted(rows, key=lambda r: getattr(r, metric))
        for a, b in zip(srt, srt[1:]):
            va, vb = getattr(a, metric), getattr(b, metric)
            if va < vb:
                qa, qb = getattr(a, attr), getattr(b, attr)
                if best_high:
                    assert qa <= qb, (attr, va, vb, qa, qb)
                else:
                    assert qa >= qb
        assert all(r.rfm_cell == f"{r.r_q}{r.f_q}{r.m_q}" for r in rows)
    assert n == len({r.o_custkey for r in rows})


def test_mmr_matches_greedy_bruteforce(spark):
    import numpy as np
    rows = FC.q_search_mmr(spark, SF_ORACLE).collect()
    e = domain.load_table(spark, SF_ORACLE, "embeddings").collect()
    Q = {r.vec_id: np.array(
        [round(min(max(float(x), -1.0), 1.0) * 127) for x in r.embedding],
        dtype=np.int64) for r in e}
    by_q: dict[int, list] = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    assert set(by_q) == set(range(FC.N_QUERIES))
    for qid, sel in by_q.items():
        sel.sort(key=lambda r: r.mmr_rank)
        assert [r.mmr_rank for r in sel] == list(range(1, FC.MMR_K + 1))
        rel = {v: int(Q[qid] @ Q[v]) for v in Q if v != qid}
        cand = sorted(rel, key=lambda v: (-rel[v], v))[:FC.MMR_CAND]
        chosen: list[int] = []
        for r in sel:
            pool = [c for c in cand if c not in chosen]
            if not chosen:
                scores = {c: 2 * rel[c] for c in pool}
            else:
                scores = {c: 2 * rel[c]
                          - max(int(Q[c] @ Q[s]) for s in chosen)
                          for c in pool}
            want = min(pool, key=lambda c: (-scores[c], c))
            assert r.vec_id == want, (qid, r.mmr_rank, r.vec_id, want)
            assert r.score3 == scores[want]
            chosen.append(want)
