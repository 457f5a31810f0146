"""Round-8 wave-30 semantics, each cross-checked against a driver-side
brute force at sf0.001: token chunker + chunk dedup, vocabulary-novelty
growth, temperature mixing with largest-remainder quotas, daily
autocorrelation, per-type Gini, and k-core peeling."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from safeascent_spark import domain
from safeascent_spark.operators import analytics as A
from safeascent_spark.operators import curation as CU
from safeascent_spark.operators import graph as G
from safeascent_spark.operators import text as TX
from tests.conftest import SF_SMOKE


def _docs(spark):
    return [(r.doc_id, r.text, r.source)
            for r in domain.load_table(spark, SF_SMOKE, "documents")
                           .select("doc_id", "text", "source").collect()]


def _chunked_texts(doc_id, text):
    if doc_id % TX.CHK_SEED_MOD == TX.CHK_SEED_REM:
        text = TX._CHK_TEMPLATE_UNIT * TX._CHK_TEMPLATE_REPS + text
    ws = [t for t in text.split(" ") if t]
    n, S, ST = len(ws), TX.CHUNK_SIZE, TX.CHUNK_STRIDE
    starts = list(range(1, max(n - S + 1, 1) + 1, ST))
    return [(st, " ".join(ws[st - 1:st - 1 + S])) for st in starts]


def test_chunking_matches_bruteforce(spark):
    rows = defaultdict(list)
    for r in TX.q_text_chunking(spark, SF_SMOKE).collect():
        rows[r.doc_id].append(r)
    want_chunks = {}
    dup = Counter()
    for doc_id, text, _ in _docs(spark):
        cs = _chunked_texts(doc_id, text)
        want_chunks[doc_id] = cs
        dup.update(c for _, c in cs)
    assert set(rows) == set(want_chunks)
    for doc_id, cs in want_chunks.items():
        got = sorted(rows[doc_id], key=lambda r: r.chunk_idx)
        assert [r.chunk_idx for r in got] == list(range(1, len(cs) + 1))
        for r, (st, ctext) in zip(got, cs):
            assert r.tok_start == st
            toks = [t for t in ctext.split(" ") if t]
            assert r.n_tokens == len(toks)
            assert r.n_chars == len(ctext)
            assert r.n_dup == dup[ctext]
    # the seeded template makes chunk-level dedup OBSERVABLE: every
    # seeded doc's first chunk is the identical 32-token template
    seeded = [d for d in want_chunks
              if d % TX.CHK_SEED_MOD == TX.CHK_SEED_REM]
    assert len(seeded) > 1
    first = rows[seeded[0]][0]
    assert first.n_dup >= len(seeded)


def test_vocab_novelty_matches_bruteforce(spark):
    rows = {r.bucket: r for r in
            TX.q_text_vocab_novelty(spark, SF_SMOKE).collect()}
    per = defaultdict(set)
    for doc_id, text, _ in _docs(spark):
        ws = [t for t in text.split(" ") if t]
        bkt = doc_id // TX.NOVELTY_BUCKET
        for i in range(len(ws) - TX.NOVELTY_W + 1):
            per[bkt].add(" ".join(ws[i:i + TX.NOVELTY_W]))
    first_seen = {}
    for bkt in sorted(per):
        for g in per[bkt]:
            first_seen.setdefault(g, bkt)
    assert set(rows) == set(per)
    for bkt, grams in per.items():
        new = sum(1 for g in grams if first_seen[g] == bkt)
        r = rows[bkt]
        assert r.n_distinct_grams == len(grams)
        assert r.n_new_grams == new
        assert r.novelty_ppm == new * 1_000_000 // len(grams)
    # the first bucket is 100% novel by definition
    assert rows[min(per)].novelty_ppm == 1_000_000


def test_temperature_mixing_is_exact_hamilton(spark):
    rows = {r.source: r for r in
            CU.q_sample_temperature(spark, SF_SMOKE).collect()}
    n = Counter(src for _, _, src in _docs(spark))
    assert set(rows) == set(n)
    w = {s: math.floor(math.sqrt(c) * 1_000_000) for s, c in n.items()}
    tw = sum(w.values())
    B = CU.TEMP_BUDGET
    base = {s: B * wv // tw for s, wv in w.items()}
    rem = {s: B * wv % tw for s, wv in w.items()}
    leftover = B - sum(base.values())
    order = sorted(n, key=lambda s: (-rem[s], s))
    alloc = {s: base[s] + (1 if order.index(s) < leftover else 0)
             for s in n}
    for s in n:
        r = rows[s]
        assert (r.n_docs, r.weight_micro) == (n[s], w[s])
        assert r.share_ppm == w[s] * 1_000_000 // tw
        assert r.alloc == alloc[s], s
    # the whole point of Hamilton: the quota is hit exactly
    assert sum(r.alloc for r in rows.values()) == B
    # temperature flattens: smaller sources get a LARGER share than raw
    big = max(n, key=lambda s: (n[s], s))
    small = min(n, key=lambda s: (n[s], s))
    if n[big] > n[small]:
        raw_ratio = n[big] / n[small]
        mixed_ratio = rows[big].alloc / rows[small].alloc
        assert mixed_ratio < raw_ratio


def test_autocorr_matches_bruteforce(spark):
    rows = {r.lag: r for r in
            A.q_events_autocorr(spark, SF_SMOKE).collect()}
    days = Counter()
    for r in (domain.load_table(spark, SF_SMOKE, "events")
                    .select("ts").collect()):
        days[r.ts // (86_400 * 10**9)] += 1
    for lag in range(1, A.ACF_MAX_LAG + 1):
        pairs = [(days[d], days[d + lag]) for d in days if d + lag in days]
        nn = len(pairs)
        sx = sum(x for x, _ in pairs)
        sy = sum(y for _, y in pairs)
        sxy = sum(x * y for x, y in pairs)
        sxx = sum(x * x for x, _ in pairs)
        syy = sum(y * y for _, y in pairs)
        num = nn * sxy - sx * sy
        dx, dy = nn * sxx - sx * sx, nn * syy - sy * sy
        r = rows[lag]
        assert r.n_pairs == nn
        if dx > 0 and dy > 0:
            want = math.floor(num * 1_000_000 /
                              (math.sqrt(dx) * math.sqrt(dy)))
            assert r.acf_micro == want, lag
            assert -1_000_000 <= r.acf_micro <= 1_000_000
        else:
            assert r.acf_micro is None


def test_gini_matches_bruteforce_and_bounds(spark):
    rows = {r.event_type: r for r in
            A.q_events_user_gini(spark, SF_SMOKE).collect()}
    cnt = Counter()
    for r in (domain.load_table(spark, SF_SMOKE, "events")
                    .select("event_type", "user_id").collect()):
        cnt[(r.event_type, r.user_id)] += 1
    per = defaultdict(list)
    for (t, u), x in cnt.items():
        per[t].append((x, u))
    assert set(rows) == set(per)
    for t, xs in per.items():
        xs.sort()
        n = len(xs)
        tot = sum(x for x, _ in xs)
        six = sum((i + 1) * x for i, (x, _) in enumerate(xs))
        want = (2 * six - (n + 1) * tot) * 1_000_000 // (n * tot)
        r = rows[t]
        assert (r.n_users, r.total_events) == (n, tot)
        assert r.gini_ppm == want
        assert 0 <= r.gini_ppm < 1_000_000


def test_kcore_is_the_converged_core(spark):
    """The fixed KC_ROUNDS budget reaches the true fixpoint on the test
    graph (each round only removes nodes), and the result is exactly
    the brute-force peel."""
    rows = {r.vid: r for r in G.q_graph_kcore(spark, SF_SMOKE).collect()}
    edges = set()
    r = (domain.routes_df(spark, SF_SMOKE)
         .select("route_id", "location_id").collect())
    for row in r:
        rid, lid = row.route_id + G._ROUTE_V, int(row.location_id)
        edges.add((rid, lid))
        edges.add((rid, (row.route_id % 7) + G._HUB_V))
    for lid in {int(row.location_id) for row in r}:
        if lid > 0:
            edges.add((lid, lid // 10))
    und = {(u, v) for u, v in edges if u != v}
    und |= {(v, u) for u, v in und}
    alive = {u for u, _ in und}
    rounds = 0
    while True:
        deg = Counter(u for u, v in und if u in alive and v in alive)
        nxt = {u for u in alive if deg[u] >= G.KC_K}
        if nxt == alive:
            break
        alive = nxt
        rounds += 1
    assert rounds <= G.KC_ROUNDS, rounds  # budget reaches the fixpoint
    deg = Counter(u for u, v in und if u in alive and v in alive)
    want = {u: deg[u] for u in alive if deg[u] >= G.KC_K}
    assert {v: r.core_deg for v, r in rows.items()} == want
    # the 2-core keeps route cycles: some routes AND their anchors
    kinds = {r.kind for r in rows.values()}
    assert {"route", "location", "type_hub"} <= kinds
