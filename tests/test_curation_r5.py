"""Round-5 curation additions: kNN label propagation + leakage-safe split.

Both carry full oracles in test_oracle_parity; these tests pin the
SEMANTIC contracts the parity check can't see:
  * the split sends exact-duplicate documents to the same side (the
    leakage-safety property that motivates splitting on content);
  * the kNN vote tie-breaks deterministically and its plan keeps the
    probe side broadcast (corpus streams, no corpus x corpus join).
"""

from __future__ import annotations

import pandas as pd
import pytest

from tests.conftest import SF_ORACLE, SF_SMOKE


@pytest.fixture(scope="module")
def dup_corpus_dir(tmp_path_factory):
    # 3 distinct texts, each duplicated under distant doc_ids; plus an
    # empty and a whitespace-only doc (both must fall back to group 0).
    texts = {
        "alpha ridge route with bolted anchors near the summit": (0, 500),
        "loose talus approach cross the gully before first light": (1, 777),
        "classic crack climb sustained hands to the chains": (2, 901),
    }
    rows = []
    for text, ids in texts.items():
        for i in ids:
            rows.append({"doc_id": i, "text": text, "lang": "en",
                         "source": "syn", "n_chars": len(text)})
    rows.append({"doc_id": 50, "text": "", "lang": "en", "source": "syn",
                 "n_chars": 0})
    rows.append({"doc_id": 51, "text": "   ", "lang": "en", "source": "syn",
                 "n_chars": 3})
    d = tmp_path_factory.mktemp("dupcorpus")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_split_sends_duplicates_to_the_same_side(spark, dup_corpus_dir):
    from safeascent_spark.operators import text as T
    out = {r["doc_id"]: r for r in
           T.q_sample_split(spark, dup_corpus_dir).collect()}
    assert out[0]["split"] == out[500]["split"]
    assert out[0]["fingerprint"] == out[500]["fingerprint"]
    assert out[1]["split"] == out[777]["split"]
    assert out[2]["split"] == out[901]["split"]
    # content-free docs collapse into the fingerprint-0 group together
    assert out[50]["fingerprint"] == 0 == out[51]["fingerprint"]
    assert out[50]["split"] == out[51]["split"]


def test_split_is_total_and_stable_under_repartition(spark):
    from safeascent_spark.operators import text as T
    base = T.q_sample_split(spark, SF_SMOKE).collect()
    docs = T.docs_df(spark, SF_SMOKE)
    assert len(base) == docs.count()  # every doc assigned exactly once
    again = T.q_sample_split(spark, SF_SMOKE).collect()
    assert base == again


def test_knn_vote_is_full_coverage_and_bounded(spark):
    from safeascent_spark.operators import similarity as S
    rows = S.q_knn_classify(spark, SF_ORACLE).collect()
    assert [r["query_id"] for r in rows] == list(range(S.KNN_QUERIES))
    for r in rows:
        assert 1 <= r["votes"] <= S.KNN_K
        assert r["agreement_ppm"] == r["votes"] * 1_000_000 // S.KNN_K


def test_knn_plan_broadcasts_probes_not_corpus(spark):
    from safeascent_spark.operators import similarity as S
    plan = S.q_knn_classify(spark, SF_ORACLE)._jdf.queryExecution() \
            .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan  # probe side broadcast
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan


# --- containment + funnel (r5 second batch) ----------------------------------

def test_containment_finds_embedded_doc_jaccard_misses(spark, tmp_path_factory):
    """A short doc fully embedded in a long one must surface as a
    containment pair even when its Jaccard similarity sits far below the
    Jaccard threshold."""
    from safeascent_spark.operators import dedup as D
    small = "granite slab pitch with delicate friction moves up high"
    filler = " ".join(f"word{i} token{i} extra{i}" for i in range(40))
    rows = [
        {"doc_id": 1, "text": small, "lang": "en", "source": "syn",
         "n_chars": len(small)},
        {"doc_id": 2, "text": filler + " " + small, "lang": "en",
         "source": "syn", "n_chars": 1},
        {"doc_id": 3, "text": "completely different content about rivers",
         "lang": "en", "source": "syn", "n_chars": 1},
    ]
    d = tmp_path_factory.mktemp("containcorpus")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    pairs = {(r["doc_small"], r["doc_big"], r["containment"])
             for r in D.q_dedup_containment(spark, str(d)).collect()}
    assert (1, 2, 1.0) in pairs
    jacc = {(r["doc_a"], r["doc_b"]) for r in
            D.q_dedup_jaccard(spark, str(d)).collect()
            if r["jaccard"] >= 0.5}
    assert (1, 2) not in jacc  # union-normalized similarity is diluted


def test_funnel_is_strictly_ordered_and_windowed(spark, tmp_path_factory):
    """click before any view must not count; a purchase outside the
    7-day step window must not count."""
    import pandas as pd_
    from safeascent_spark.operators import analytics as A
    ns = 1_000_000_000
    day = 86_400 * ns
    rows = [
        # user 1: full ordered funnel inside windows
        (1, "view", 10 * ns), (1, "click", 20 * ns),
        (1, "purchase", 30 * ns),
        # user 2: click BEFORE first view -> stops at view
        (2, "click", 5 * ns), (2, "view", 10 * ns),
        # user 3: purchase 8 days after click -> outside step window
        (3, "view", 0), (3, "click", 1 * ns),
        (3, "purchase", 1 * ns + 8 * day),
    ]
    df = pd_.DataFrame(
        [{"event_id": i, "ts": t, "user_id": u, "event_type": s,
          "value": 0.0, "props": "{}"} for i, (u, s, t) in enumerate(rows)])
    d = tmp_path_factory.mktemp("funnelevents")
    df.to_parquet(d / "events.parquet")
    got = {r["step"]: r["n_users"]
           for r in A.q_events_funnel(spark, str(d)).collect()}
    assert got == {"view": 3, "click": 2, "purchase": 1}


def test_heavy_hitters_deterministic_under_any_partitioning(spark):
    """The MG sketch's surviving set varies with batch boundaries, but the
    exact-confirm stage must make the OUTPUT partitioning-invariant."""
    from pyspark.sql import functions as F
    from safeascent_spark.operators import text as T
    t = T.tokens_df(spark, SF_ORACLE)
    n_total = t.count()

    def run(parts):
        cands = T._mg_candidates(t.repartition(parts))
        exact = (t.join(F.broadcast(cands), "word")
                  .groupBy("word").agg(F.count(F.lit(1)).alias("n")))
        return sorted((r["word"], r["n"]) for r in
                      exact.filter(F.col("n") * T.HH_K > n_total).collect())

    a, b = run(2), run(13)
    assert a == b and len(a) > 0
    # and the registered query agrees with the brute-force top list
    hh = {r["word"]: r["n"]
          for r in T.q_text_heavy_hitters(spark, SF_ORACLE).collect()}
    assert dict(a) == hh
