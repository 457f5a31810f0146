"""Semantics of the round-6 curation wave (beyond oracle parity):
brute-force parity on raw text, transform behavior on constructed PII,
target-enrichment of DSIR, and conservation laws."""

from __future__ import annotations

from pyspark.sql import functions as F

from safeascent_spark.operators import curation as CU
from safeascent_spark.operators import text as TX
from tests.conftest import SF_ORACLE


def test_gopher_rules_match_bruteforce(spark):
    rows = CU.q_text_gopher_rules(spark, SF_ORACLE).collect()
    docs = {r.doc_id: r.text
            for r in TX.docs_df(spark, SF_ORACLE).collect()}
    assert len(rows) == len(docs)
    n_keep = 0
    for r in rows:
        ws = [w for w in docs[r.doc_id].split(" ") if w]
        assert r.n_words == len(ws)
        if ws:
            assert r.mean_word_len_milli == \
                sum(len(w) for w in ws) * 1000 // len(ws)
            assert r.alpha_word_pm == \
                sum(1 for w in ws if any(c.isalpha() for c in w)) \
                * 1000 // len(ws)
        assert r.n_stop_distinct == \
            len({w for w in ws if w in TX.STOPWORDS})
        want_keep = (CU.GOPHER_MIN_WORDS <= r.n_words
                     <= CU.GOPHER_MAX_WORDS
                     and CU.GOPHER_MIN_MWL_MILLI <= r.mean_word_len_milli
                     <= CU.GOPHER_MAX_MWL_MILLI
                     and r.alpha_word_pm >= CU.GOPHER_MIN_ALPHA_PM
                     and r.n_stop_distinct >= CU.GOPHER_MIN_STOP_DISTINCT)
        assert r.keep == want_keep
        assert r.keep == (r.rule_word_count and r.rule_mean_word_len
                          and r.rule_alpha_words and r.rule_stopwords)
        n_keep += r.keep
    # the gate genuinely splits this corpus (not all-pass / all-fail)
    assert 0 < n_keep < len(rows)


def test_pii_redact_replaces_constructed_pii(spark):
    """The fixture corpus has no PII-shaped strings (the registered query
    pins the no-op case); the replace behavior itself is pinned here on
    constructed rows through the same Column expression."""
    df = spark.createDataFrame(
        [(1, "mail me at bob.smith+x@example.co.uk today"),
         (2, "see https://a.example.com/p?q=1 and http://b.io"),
         (3, "card 1234567890 pin 999 ok"),
         (4, "clean text only")],
        ["doc_id", "text"])
    got = {r.doc_id: r.red for r in
           df.select("doc_id",
                     CU.redacted_col(F.col("text")).alias("red")).collect()}
    assert got[1] == "mail me at <EMAIL> today"
    assert got[2] == "see <URL> and <URL>"
    assert got[3] == "card <NUM> pin 999 ok"   # 6+ digits only
    assert got[4] == "clean text only"


def test_pii_redact_noop_is_witnessed_on_fixture(spark):
    rows = CU.q_text_pii_redact(spark, SF_ORACLE).collect()
    for r in rows:
        assert r.n_emails == r.n_urls == r.n_long_numbers == 0
        assert r.n_chars_after == r.n_chars_before


def test_dsir_enriches_the_target_language(spark):
    """The whole point of DSIR: selecting is_targetlike docs must yield a
    higher target-language share than the raw corpus."""
    rows = CU.q_sample_dsir(spark, SF_ORACLE).collect()
    sel = [r for r in rows if r.is_targetlike]
    assert 0 < len(sel) < len(rows)
    share_sel = sum(r.lang == CU.DSIR_TARGET_LANG for r in sel) / len(sel)
    share_raw = sum(r.lang == CU.DSIR_TARGET_LANG
                    for r in rows) / len(rows)
    assert share_sel > share_raw
    # and the flag is exactly the above-corpus-mean contract
    n = len(rows)
    total = sum(r.dsir_per_token_micro for r in rows)
    for r in rows:
        assert r.is_targetlike == (r.dsir_per_token_micro * n > total)


def test_distinct_ngrams_conservation(spark):
    rows = CU.q_text_distinct_ngrams(spark, SF_ORACLE).collect()
    docs = [(r.source, [w for w in r.text.split(" ") if w])
            for r in TX.docs_df(spark, SF_ORACLE).collect()]
    for n in (1, 2, 3):
        per_src_total: dict[str, int] = {}
        per_src_grams: dict[str, set] = {}
        for src, ws in docs:
            grams = [" ".join(ws[i:i + n])
                     for i in range(len(ws) - n + 1)]
            per_src_total[src] = per_src_total.get(src, 0) + len(grams)
            per_src_grams.setdefault(src, set()).update(grams)
        for r in [x for x in rows if x.n == n]:
            assert r.total_ngrams == per_src_total[r.source]
            assert r.distinct_ngrams == len(per_src_grams[r.source])
            assert r.distinct_ppm == \
                r.distinct_ngrams * 1_000_000 // r.total_ngrams
    # diversity must fall with n coverage present for every (source, n)
    assert len(rows) == len({r.source for r in rows}) * 3


def test_bpe_fertility_accounts_every_token(spark):
    rows = CU.q_bpe_fertility(spark, SF_ORACLE).collect()
    n_tokens = TX.tokens_df(spark, SF_ORACLE).count()
    assert sum(r.n_words for r in rows) == n_tokens
    for r in rows:
        # every word encodes to >= 1 symbol, so fertility >= 1.0
        assert r.n_bpe_tokens >= r.n_words
        assert r.fertility_ppm == r.n_bpe_tokens * 1_000_000 // r.n_words
        assert r.chars_per_token_ppm > 0


def test_psi_drift_matches_bruteforce(spark):
    import math
    from safeascent_spark.operators import monitor as MON
    from safeascent_spark import domain
    rows = {r.event_type: r for r in
            MON.q_events_psi_drift(spark, SF_ORACLE).collect()}
    ev = domain.load_table(spark, SF_ORACLE, "events").collect()
    mn = min(r.ts for r in ev)
    mid = mn + (max(r.ts for r in ev) - mn) // 2
    cells: dict[tuple, list] = {}
    for r in ev:
        b = math.floor(r.value / MON.PSI_BUCKET_WIDTH)
        k = (r.event_type, b)
        cells.setdefault(k, [0, 0])
        cells[k][0 if r.ts <= mid else 1] += 1
    by_type: dict[str, list] = {}
    for (t, _b), (p, q) in cells.items():
        by_type.setdefault(t, []).append((p, q))
    for t, pq in by_type.items():
        P = sum(p for p, _ in pq)
        Q = sum(q for _, q in pq)
        nb = len(pq)
        # recompute exactly as the engines do: floor applied per cell
        psi = sum(
            math.floor(MON.PSI_SCALE *
                       (((p + 1) / (P + nb) - (q + 1) / (Q + nb))
                        * math.log(((p + 1) / (P + nb))
                                   / ((q + 1) / (Q + nb)))))
            for p, q in pq)
        r = rows[t]
        assert (r.n_early, r.n_late, r.n_buckets) == (P, Q, nb)
        assert r.psi_micro == psi, (t, r.psi_micro, psi)
        # an arbitrary mid-split of a stationary stream drifts little
        assert abs(r.psi_micro) < 250_000, (t, r.psi_micro)


def test_skew_profile_matches_bruteforce(spark):
    from collections import Counter
    from safeascent_spark.operators import monitor as MON
    from safeascent_spark import domain
    rows = {(r.table_name, r.column_name): r
            for r in MON.q_dq_skew_profile(spark, SF_ORACLE).collect()}
    assert set(rows) == set(MON._PROFILE_COLS)
    for table, col in [("events", "user_id"), ("documents", "source")]:
        data = [str(getattr(r, col)) for r in
                domain.load_table(spark, SF_ORACLE, table).collect()]
        c = Counter(data)
        r = rows[(table, col)]
        assert r.n_rows == len(data)
        assert r.n_distinct == len(c)
        top = min((k for k, v in c.items() if v == max(c.values())))
        assert (r.top_key, r.top_count) == (top, max(c.values()))
        assert r.skew_ratio_milli == \
            max(c.values()) * len(c) * 1000 // len(data)


def test_ndcg_matches_bruteforce(spark):
    import math
    import numpy as np
    from safeascent_spark import domain
    rows = CU.q_search_ndcg(spark, SF_ORACLE).collect()
    e = domain.load_table(spark, SF_ORACLE, "embeddings").collect()
    Q = {r.vec_id: (np.array([round(min(max(float(x), -1.0), 1.0) * 127)
                              for x in r.embedding], dtype=np.int64),
                    r.label) for r in e}
    assert len(rows) == 5
    for r in rows:
        qv, qlab = Q[r.query_id]
        assert r.qlabel == qlab
        scored = sorted(((int(qv @ v), vid, lab)
                         for vid, (v, lab) in Q.items()
                         if vid != r.query_id),
                        key=lambda t: (-t[0], t[1]))
        dcg = sum(math.floor(1_000_000 / math.log2(i + 2))
                  for i, (_, _, lab) in enumerate(scored[:CU.NDCG_K])
                  if lab == qlab)
        n_rel = sum(1 for vid, (_, lab) in Q.items()
                    if lab == qlab and vid != r.query_id)
        idcg = sum(math.floor(1_000_000 / math.log2(i + 2))
                   for i in range(min(CU.NDCG_K, n_rel)))
        assert (r.n_rel, r.dcg_micro, r.idcg_micro) == (n_rel, dcg, idcg)
        assert r.ndcg_ppm == dcg * 1_000_000 // idcg
        assert 0 <= r.ndcg_ppm <= 1_000_000


def test_boilerplate_flags_the_modal_leading_trigram(spark):
    from collections import Counter
    rows = CU.q_text_strip_boilerplate(spark, SF_ORACLE).collect()
    docs = TX.docs_df(spark, SF_ORACLE).collect()
    by_src: dict[str, Counter] = {}
    leads = {}
    for d in docs:
        ws = [w for w in d.text.split(" ") if w]
        lead = " ".join(ws[:3]) if len(ws) >= 3 else None
        leads[d.doc_id] = (d.source, lead, len(ws))
        if lead is not None:
            by_src.setdefault(d.source, Counter())[lead] += 1
    for r in rows:
        src, lead, n = leads[r.doc_id]
        c = by_src[src]
        top_count = max(c.values())
        top = min(k for k, v in c.items() if v == top_count)
        assert r.source_boilerplate == top
        assert r.boilerplate_docs == top_count
        want = (lead == top and top_count >= CU.BOILERPLATE_MIN_DOCS)
        assert r.has_boilerplate == want
        assert r.stripped_n_words == (n - 3 if want else n)
