"""Round-5 wave-4 retrieval operators: BM25, hybrid RRF fusion, and the
distributed-exact equi-depth histogram's remainder path.

The sf0.01 oracle-parity sweep (test_oracle_parity) covers hash equality;
these tests pin the SEMANTIC contracts parity alone cannot see — known
hand-checked outcomes, the ntile remainder arithmetic on a count that does
not divide evenly, and cross-operator consistency between the fused result
and its two legs.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from safeascent_spark.operators import similarity as S
from safeascent_spark.operators import text as T
from tests.conftest import SF_ORACLE


def test_bm25_idf_orders_rarer_terms_higher(spark, tmp_path):
    """Hand-checkable corpus: with equal tf and equal dl, a doc matching a
    RARE term must outrank a doc matching a COMMON one, and a doc matching
    both must outrank either."""
    common, rare = T.BM25_TERMS[0], T.BM25_TERMS[1]  # merge, filter
    filler = "aaa bbb ccc ddd eee fff"
    rows = [
        {"doc_id": 1, "text": f"{common} {rare} {filler}",
         "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 2, "text": f"{rare} xxx {filler}",
         "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 3, "text": f"{common} xxx {filler}",
         "lang": "en", "source": "s", "n_chars": 1},
        # three more docs containing the common term -> df(common) = 5,
        # df(rare) = 2, so idf(rare) > idf(common)
        {"doc_id": 4, "text": f"{common} yyy {filler}",
         "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 5, "text": f"{common} zzz {filler}",
         "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 6, "text": f"{common} www {filler}",
         "lang": "en", "source": "s", "n_chars": 1},
    ]
    d = tmp_path / "bm25"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    got = T.q_text_bm25_topk(spark, str(d)).collect()
    order = [r.doc_id for r in got]
    assert order[0] == 1, got                 # both terms wins
    assert order.index(2) < order.index(3), got  # rare beats common
    assert all(r.bm25 > 0 for r in got)


def test_bm25_length_normalization(spark, tmp_path):
    """Same tf, same df: the SHORTER document must score higher (b > 0)."""
    term = T.BM25_TERMS[0]
    rows = [
        {"doc_id": 1, "text": f"{term} one two",
         "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 2, "text": f"{term} one two three four five six seven",
         "lang": "en", "source": "s", "n_chars": 1},
    ]
    d = tmp_path / "bm25len"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    got = {r.doc_id: r.bm25 for r in T.q_text_bm25_topk(spark, str(d)).collect()}
    assert got[1] > got[2], got


def test_hybrid_rrf_consistent_with_its_legs(spark):
    """Every fused row's ranks must equal the standalone legs' ranks, and
    the RRF score must be exactly the two reciprocal terms."""
    fused = S.q_search_hybrid_rrf(spark, SF_ORACLE).collect()
    sparse = {r.doc_id: i + 1
              for i, r in enumerate(T.q_text_bm25_topk(spark, SF_ORACLE)
                                     .collect())}
    dense = {r.neighbor_id: r.rank
             for r in S.cosine_topk_df(spark, SF_ORACLE).collect()
             if r.query_id == S.RRF_DENSE_QUERY}
    assert len(fused) == S.RRF_TOP_K
    for row in fused:
        assert row.sparse_rank == sparse.get(row.doc_id), row
        assert row.dense_rank == dense.get(row.doc_id), row
        expect = ((1.0 / (S.RRF_C + row.sparse_rank) if row.sparse_rank else 0)
                  + (1.0 / (S.RRF_C + row.dense_rank) if row.dense_rank else 0))
        assert abs(row.rrf - expect) < 1e-9, row
    # a doc present in BOTH legs must outrank any single-leg doc whose
    # best rank is no better than both of its ranks (RRF's fusion property
    # on this fixed corpus: doc 388 carries two terms)
    both = [r for r in fused if r.sparse_rank and r.dense_rank]
    if both:
        assert fused[0].sparse_rank and fused[0].dense_rank


def test_length_histogram_remainder_path(spark, tmp_path):
    """47 docs: ntile(10) gives 7 buckets of 5 and 3 of 4 (first rem
    buckets take the extra row).  The distributed rank+arithmetic form
    must reproduce DuckDB's native ntile exactly — this is the path the
    sf0.01 parity sweep (500 docs, rem = 0) never exercises."""
    rows = [{"doc_id": i, "text": "x", "lang": "en", "source": "s",
             # duplicate lengths across band boundaries on purpose
             "n_chars": (i * 37) % 300}
            for i in range(47)]
    d = tmp_path / "hist47"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    got = [(r.bucket, r.n_docs, r.min_chars, r.max_chars)
           for r in T.q_text_length_histogram(spark, str(d)).collect()]
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    want = [tuple(r) for r in con.sql(T.sql_text_length_histogram()).fetchall()]
    assert got == want, (got, want)
    assert [n for _, n, _, _ in got] == [5] * 7 + [4] * 3


def test_phash_twins_and_discrimination(spark, tmp_path):
    """Two docs with identical generator params (doc_id ≡ mod 32/13/143 and
    same n_chars) must hash identically and surface as a hamming-0 pair;
    a doc with different frequencies must NOT pair with them at the
    threshold."""
    from safeascent_spark.operators import multimodal as M
    # doc_ids 7 and 7 + 4576 (lcm(32,13,143)*? -> 4576 = 32*143) share
    # w (id%32), fr (id%13), fc ((id//13)%11); same n_chars -> same image
    a, b = 7, 7 + 4576
    assert a % 32 == b % 32 and a % 13 == b % 13 \
        and (a // 13) % 11 == (b // 13) % 11
    rows = [
        {"doc_id": a, "text": "x", "lang": "en", "source": "s", "n_chars": 40},
        {"doc_id": b, "text": "x", "lang": "en", "source": "s", "n_chars": 40},
        {"doc_id": 9, "text": "x", "lang": "en", "source": "s", "n_chars": 171},
    ]
    d = tmp_path / "phash"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    hashes = {r.media_id: (r.b0, r.b1, r.b2, r.b3)
              for r in M.q_multimodal_phash(spark, str(d)).collect()}
    assert hashes[a] == hashes[b]
    assert hashes[a] != hashes[9]
    pairs = [(r.media_a, r.media_b, r.hamming)
             for r in M.q_multimodal_phash_pairs(spark, str(d)).collect()]
    assert (a, b, 0) in pairs


def test_phash_matches_real_decode(spark):
    """The Spark-side hash must come from REAL pixel decode, not the
    generative shortcut: recompute one image's bands from decode_png_pixels
    directly and compare."""
    from safeascent_spark.operators import multimodal as M
    payload = M.encode_png_grad(20, 25, 77, 3, 5)
    bands = M.ahash_bands(M.decode_png_pixels(payload))
    assert len(bands) == 4 and all(0 <= v < 65536 for v in bands)
    # independent recomputation from the generator formula
    import numpy as np
    img = np.array([[(77 + 3 * r + 5 * c) % 256 for c in range(20)]
                    for r in range(25)], dtype=np.int64)
    ri = (np.arange(25) * 8) // 25
    ci = (np.arange(20) * 8) // 20
    want = []
    cell_sum = np.zeros((8, 8), dtype=np.int64)
    cell_n = np.zeros((8, 8), dtype=np.int64)
    for r in range(25):
        for c in range(20):
            cell_sum[ri[r], ci[c]] += img[r, c]
            cell_n[ri[r], ci[c]] += 1
    tot = int(img.sum())
    bits = (cell_sum * (20 * 25) > tot * cell_n).reshape(-1)
    for bnd in range(4):
        want.append(sum(1 << j for j in range(16) if bits[bnd * 16 + j]))
    assert bands == want


def _reference_bpe(word_counts: dict[str, int], n_merges: int):
    """Straight-line reference BPE (Sennrich alg.) over a word-count dict."""
    state = {tuple(w) + (T.BPE_EOW,): n for w, n in word_counts.items()}
    out = []
    for step in range(1, n_merges + 1):
        pc: dict[tuple[str, str], int] = {}
        for syms, n in state.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] = pc.get((syms[i], syms[i + 1]), 0) + n
        if not pc:
            break
        (l, r), c = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((step, l, r, l + r, c))
        new_state: dict[tuple, int] = {}
        for syms, n in state.items():
            merged, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == l and syms[i + 1] == r:
                    merged.append(l + r)
                    i += 2
                else:
                    merged.append(syms[i])
                    i += 1
            key = tuple(merged)
            new_state[key] = new_state.get(key, 0) + n
        state = new_state
    return out


def test_bpe_matches_reference_on_overlap_heavy_corpus(spark, tmp_path):
    """Words with back-to-back repeats ('aaaa', 'ababab') are where the
    string-replace device could diverge from true BPE (overlap handling,
    re-merge of freshly created symbols).  Pin against a straight-line
    reference implementation."""
    docs = {
        1: "aaaa aaaa aaaa abab",
        2: "ababab ababab aaaa",
        3: "baaab abba aaaa abab",
    }
    rows = [{"doc_id": k, "text": v, "lang": "en", "source": "s",
             "n_chars": len(v)} for k, v in docs.items()]
    d = tmp_path / "bpeov"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    wc: dict[str, int] = {}
    for v in docs.values():
        for w in v.split():
            wc[w] = wc.get(w, 0) + 1
    want = _reference_bpe(wc, 6)
    got = [tuple(r) for r in T.q_bpe_train(spark, str(d)).collect()]
    assert got == want, (got, want)
    # and the oracle agrees on the same corpus
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{d}/documents.parquet')")
    assert [tuple(r) for r in con.sql(T.sql_bpe_train()).fetchall()] == want


def test_events_ema_dyadic_weights(spark, tmp_path):
    """Hand-checked Horner weighting: values [10, 20, 30] (chronological)
    -> num = 4*30 + 2*20 + 10 = 170 milli*? ... with milli scaling:
    v = [10000, 20000, 30000], num = 4*30000 + 2*20000 + 10000 = 170000,
    denom = 2^3 - 1 = 7, ema_ppm = 170000 * 1e6 // 7."""
    from safeascent_spark.operators import analytics as A
    rows = [
        {"event_id": 1, "ts": 1_000, "user_id": 5, "event_type": "view",
         "value": 10.0, "props": "{}"},
        {"event_id": 2, "ts": 2_000, "user_id": 5, "event_type": "view",
         "value": 20.0, "props": "{}"},
        {"event_id": 3, "ts": 3_000, "user_id": 5, "event_type": "view",
         "value": 30.0, "props": "{}"},
        {"event_id": 4, "ts": 1_500, "user_id": 6, "event_type": "view",
         "value": 7.0, "props": "{}"},
    ]
    d = tmp_path / "ema"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(d / "events.parquet")
    got = {r.user_id: (r.ema_len, r.ema_num, r.ema_ppm)
           for r in A.q_events_ema(spark, str(d)).collect()}
    assert got[5] == (3, 4 * 30000 + 2 * 20000 + 10000,
                      (170000 * 1_000_000) // 7)
    # single event: ema == the value exactly
    assert got[6] == (1, 7000, 7000 * 1_000_000)


def test_winnowing_detection_guarantee(spark, tmp_path):
    """The winnowing guarantee (Schleimer et al. 2003): two documents
    sharing a token run of length >= W + K - 1 (= 6 here) MUST share at
    least one selected fingerprint.  Documents with no common k-gram must
    share none."""
    from safeascent_spark.operators import dedup as D
    shared = "alpha beta gamma delta epsilon zeta"   # 6 tokens = W+K-1
    rows = [
        {"doc_id": 1, "text": f"one two {shared} three four",
         "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 2, "text": f"five six seven {shared} eight",
         "lang": "en", "source": "s", "n_chars": 1},
        {"doc_id": 3, "text": "nine ten eleven twelve thirteen fourteen",
         "lang": "en", "source": "s", "n_chars": 1},
    ]
    d = tmp_path / "winnow"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    fps = {}
    for r in D.q_text_winnowing(spark, str(d)).collect():
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2], "shared 6-token run must share a fingerprint"
    assert not (fps[1] & fps[3])
    assert not (fps[2] & fps[3])
    # storage bound: selected fingerprints <= k-gram count
    for did, s in fps.items():
        n_toks = len(rows[did - 1]["text"].split())
        assert len(s) <= n_toks - D.WINNOW_K + 1


def test_wav_energy_matches_stdlib_wave_reader(spark):
    """Cross-validate the frame energies against the stdlib `wave` reader
    on one payload (independent of our own decoder)."""
    import io
    import wave as stdwave
    import struct as _struct
    from safeascent_spark.operators import multimodal as M
    payload = M.encode_wav(8000, 300, 17)
    with stdwave.open(io.BytesIO(payload)) as w:
        n = w.getnframes()
        raw = w.readframes(n)
    samples = _struct.unpack(f"<{n}h", raw)
    ours = M.decode_wav_samples(payload)
    assert list(samples) == ours
    # frame 0 energy from stdlib samples == our extractor's arithmetic
    seg = samples[:M.WAV_FRAME]
    assert sum(v * v for v in seg) == sum(v * v for v in ours[:M.WAV_FRAME])


def test_search_eval_metrics_consistency(spark):
    """Recall/MRR must be consistent with a direct recomputation from the
    two top-k lists."""
    from safeascent_spark.operators import similarity as S2
    exact = {}
    for r in S2.cosine_topk_df(spark, SF_ORACLE).collect():
        exact.setdefault(r.query_id, {})[r.neighbor_id] = r.rank
    approx = {}
    for r in S2.q_ann_lsh(spark, SF_ORACLE).collect():
        approx.setdefault(r.query_id, {})[r.neighbor_id] = r.rank
    for row in S2.q_search_eval_metrics(spark, SF_ORACLE).collect():
        ex = exact.get(row.query_id, {})
        ap = approx.get(row.query_id, {})
        inter = set(ex) & set(ap)
        assert row.n_hits == len(inter)
        assert row.recall_ppm == len(inter) * 1_000_000 // S2.TOP_K
        best = [n for n, rk in ex.items() if rk == 1]
        if best and best[0] in ap:
            assert row.mrr_ppm == 1_000_000 // ap[best[0]]
        else:
            assert row.mrr_ppm == 0


def test_nb_classifier_learns_separable_corpus(spark, tmp_path):
    """On a corpus where each language has its own dominant vocabulary the
    NB prediction must be a perfect diagonal."""
    mk = lambda i, txt, lang: {"doc_id": i, "text": txt, "lang": lang,
                               "source": "s", "n_chars": len(txt)}
    rows = [
        mk(1, "hund katze maus hund katze", "de"),
        mk(2, "katze hund maus maus hund", "de"),
        mk(3, "dog cat mouse dog cat", "en"),
        mk(4, "cat dog mouse mouse dog", "en"),
        mk(5, "perro gato raton perro gato", "es"),
        mk(6, "gato perro raton raton perro", "es"),
    ]
    d = tmp_path / "nb"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    got = [(r.lang_actual, r.lang_pred, r.n_docs)
           for r in T.q_text_nb_confusion(spark, str(d)).collect()]
    assert got == [("de", "de", 2), ("en", "en", 2), ("es", "es", 2)], got


def test_polygon_crossing_matches_reference_raycast(spark):
    """The Column-fold even-odd test must agree with a straight-line
    Python ray caster on a deterministic point grid (including points
    near edges and vertices)."""
    from safeascent_spark.operators import relational as R

    def ref_inside(yp, xp):
        n, cnt = len(R.POLYGON_UDEG), 0
        for i in range(n):
            y1, x1 = R.POLYGON_UDEG[i]
            y2, x2 = R.POLYGON_UDEG[(i + 1) % n]
            cross = (x2 - x1) * (yp - y1) - (y2 - y1) * (xp - x1)
            if (y1 <= yp < y2 and cross > 0) or (y2 <= yp < y1 and cross < 0):
                cnt += 1
        return cnt % 2 == 1

    pts = [(25_000_000 + i * 997_003, -125_000_000 + j * 1_003_007)
           for i in range(20) for j in range(20)]
    df = spark.createDataFrame(pts, "yp bigint, xp bigint")
    from pyspark.sql import functions as F2
    got = {(r.yp, r.xp): r.inside
           for r in df.select("yp", "xp",
                              ((R._poly_crossings(F2.col("yp"),
                                                  F2.col("xp")) % 2) == 1)
                              .alias("inside")).collect()}
    want = {(y, x): ref_inside(y, x) for y, x in pts}
    assert got == want
    assert sum(want.values()) > 0 and sum(want.values()) < len(pts)


def test_ab_test_detects_a_planted_effect(spark, tmp_path):
    """Plant a real effect: cohort 0 users (even ids) emit 20 'buy'
    events each, cohort 1 users emit 5 — the z-test must flag 'buy' as
    significant and leave the balanced 'view' type insignificant."""
    from safeascent_spark.operators import analytics as A
    rows = []
    eid = 0
    for uid in range(40):
        n_buy = 20 if uid % 2 == 0 else 5
        for i in range(n_buy):
            rows.append({"event_id": eid, "ts": 1000 + eid, "user_id": uid,
                         "event_type": "buy", "value": 1.0, "props": "{}"})
            eid += 1
        for i in range(16):  # balanced heavy usage for both cohorts
            rows.append({"event_id": eid, "ts": 1000 + eid, "user_id": uid,
                         "event_type": "view", "value": 1.0, "props": "{}"})
            eid += 1
    d = tmp_path / "ab"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(d / "events.parquet")
    got = {r.event_type: r for r in A.q_events_ab_test(spark, str(d)).collect()}
    assert got["buy"].significant, got["buy"]
    assert got["buy"].rate_a_ppm == 1_000_000 and got["buy"].rate_b_ppm == 0
    assert not got["view"].significant
    assert got["view"].z_micro is None  # degenerate pool (all heavy) -> NULL


def test_video_container_corruption_contract():
    """Corrupt containers must fail with ValueError (the WAV-codec
    contract): bad magic, truncated header, overrunning frame, trailing
    garbage — never an opaque slice/unpack error."""
    import pytest
    from safeascent_spark.operators import multimodal as M
    good = M.encode_video(16, 16, 10, 3, 5, 4)
    assert len(M.decode_video_frames(good)) == 4
    with pytest.raises(ValueError):
        M.decode_video_frames(b"XXXX" + good[4:])
    with pytest.raises(ValueError):
        M.decode_video_frames(good[:-3])       # truncated final frame
    with pytest.raises(ValueError):
        M.decode_video_frames(good + b"\x00")  # trailing bytes
    # round-trip: every frame decodes with the real PNG codec and matches
    # the per-frame gray advance
    for f, png in enumerate(M.decode_video_frames(good)):
        w, h, _, _, psum = M.decode_png(png)
        assert (w, h) == (16, 16)
        expect = sum(((10 + 7 * f) % 256 + 3 * r + 5 * c) % 256
                     for r in range(16) for c in range(16))
        assert psum == expect


def test_mixture_quality_allocation_invariants(spark):
    """Greedy quality-first allocation: per domain, taken tokens sum to
    min(take_d, available); a band is partially taken only if every
    better band is fully taken; keep rates are consistent."""
    from safeascent_spark.operators import text as T2
    rows = T2.q_sample_mixture_quality(spark, SF_ORACLE).collect()
    by_dom: dict[str, list] = {}
    for r in rows:
        by_dom.setdefault(r.domain, []).append(r)
    for dom, rs in by_dom.items():
        rs = sorted(rs, key=lambda r: -r.band)
        partial_seen = False
        for r in rs:
            assert 0 <= r.tok_taken <= r.tok_avail
            assert r.keep_rate_pm == r.tok_taken * 1000 // r.tok_avail
            if partial_seen:
                assert r.tok_taken == 0, (dom, r)
            if r.tok_taken < r.tok_avail:
                partial_seen = True
        assert sum(r.tok_taken for r in rs) <= sum(r.tok_avail for r in rs)
