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


def test_forecast_eval_is_holt_on_the_holdout_prefix(spark):
    """Backtest contract: the forecast for each user equals running the
    q_events_holt recursion on the series WITHOUT its last observation,
    and the error is |forecast - actual|."""
    rows = {r.user_id: r for r in
            FC.q_events_forecast_eval(spark, SF_ORACLE).collect()}
    ev = domain.load_table(spark, SF_ORACLE, "events").collect()
    series: dict[int, list] = {}
    for r in ev:
        series.setdefault(r.user_id, []).append(
            (r.ts, r.event_id, math.floor(r.value * 1000)))
    for uid, obs in series.items():
        obs.sort()
        if len(obs) < 2:
            assert uid not in rows
            continue
        fit_vals = [v for _, _, v in obs[:-1]][-FC.HOLT_WINDOW:]
        lvl, trd = fit_vals[0], 0
        for x in fit_vals[1:]:
            nl = (x + lvl + trd) // 2
            trd = (nl - lvl + 3 * trd) // 4
            lvl = nl
        actual = obs[-1][2]
        r = rows[uid]
        assert r.n_fit == len(fit_vals)
        assert r.forecast_milli == lvl + trd
        assert r.actual_milli == actual
        assert r.abs_err_milli == abs(lvl + trd - actual)


def test_wav_segments_are_maximal_active_islands(spark):
    from safeascent_spark.operators import multimodal as MM
    segs = MM.q_multimodal_wav_segments(spark, SF_ORACLE).collect()
    frames = {(r.media_id, r.frame_idx): r.energy for r in
              MM.extract_wav_energy(
                  MM.wav_media_df(spark, SF_ORACLE)).collect()}
    th = MM.WAV_ACTIVE_ENERGY
    by_media: dict[int, list] = {}
    for s in segs:
        by_media.setdefault(s.media_id, []).append(s)
    for mid, ss in by_media.items():
        ss.sort(key=lambda s: s.seg_idx)
        for a, b in zip(ss, ss[1:]):
            assert a.end_frame + 1 < b.start_frame   # maximality: a gap
        for s in ss:
            total = 0
            for f in range(s.start_frame, s.end_frame + 1):
                assert frames[(mid, f)] >= th        # all frames active
                total += frames[(mid, f)]
            assert s.energy_sum == total
            assert s.n_frames == s.end_frame - s.start_frame + 1
            # boundary frames outside the segment are inactive or absent
            for edge in (s.start_frame - 1, s.end_frame + 1):
                e = frames.get((mid, edge))
                if e is not None and not any(
                        x.start_frame <= edge <= x.end_frame for x in ss):
                    assert e < th
    # every active frame is covered by exactly one segment
    covered = {(mid, f) for mid, ss in by_media.items()
               for s in ss for f in range(s.start_frame, s.end_frame + 1)}
    active = {k for k, e in frames.items() if e >= th}
    assert covered == active


def test_learnability_gain_matches_model_recomputation(spark):
    from safeascent_spark.operators import curation as CU
    rows = CU.q_sample_learnability(spark, SF_ORACLE).collect()
    n = len(rows)
    total = sum(r.gain_micro for r in rows)
    n_sel = 0
    for r in rows:
        assert r.gain_micro == r.uni_bits_micro - r.bi_bits_micro
        assert r.selected == (r.gain_micro * n > total)
        n_sel += r.selected
    assert 0 < n_sel < n
    # the bigram model must beat unigram on average (it has strictly
    # more structure to exploit) — sanity that gains are mostly positive
    assert total > 0
