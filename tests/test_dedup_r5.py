"""Round-5 dedup additions: intra-corpus repeated n-grams (boilerplate) and
SemDeDup-style semantic dedup.

Covers the hand-computable semantics the parametrized sf0.01 parity test
cannot pin (which windows count as repeated, that seeded twins are the
pruned set) plus the plan shapes that make both operators 100 TB-safe
(equi-joins only — no cartesian, no broadcast of the corpus side).
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from safeascent_spark.operators import dedup as D
from safeascent_spark.operators import similarity as SIM

SHARED8 = "granite ridge traverse at dawn needs careful footwork"  # 8 tokens


@pytest.fixture(scope="module")
def rng_corpus_dir(tmp_path_factory):
    # doc_ids chosen so none hits the seeded-header branch (id % 7 == 2)
    # except 9, 16, 23 — three seeded docs with three DIFFERENT variants.
    rows = []
    for i in (0, 1, 3):  # natural 8-token boilerplate shared by 3 docs
        text = f"{SHARED8} uniq{i}"
        rows.append({"doc_id": i, "text": text, "lang": "en",
                     "source": "synthetic", "n_chars": len(text)})
    rows.append({"doc_id": 4, "text": "eight completely unique tokens "
                                      "never repeated anywhere else",
                 "lang": "en", "source": "synthetic", "n_chars": 60})
    for i in (9, 16, 23):  # % 7 == 2 -> seeded header, variants 0/1/2
        rows.append({"doc_id": i, "text": f"body text only {i}",
                     "lang": "en", "source": "synthetic", "n_chars": 20})
    d = tmp_path_factory.mktemp("rngcorpus")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_repeated_ngrams_semantics(spark, rng_corpus_dir):
    got = {r["doc_id"]: r for r in
           D.q_dedup_repeated_ngrams(spark, rng_corpus_dir).collect()}
    # 9-token docs -> 2 windows; the SHARED8 window has df=3 -> repeated
    for i in (0, 1, 3):
        assert (got[i]["n_windows"], got[i]["repeated_windows"],
                got[i]["any_repeated"]) == (2, 1, True)
    # 8 unique tokens -> 1 window, df=1 -> nothing repeated
    assert (got[4]["n_windows"], got[4]["repeated_windows"],
            got[4]["any_repeated"]) == (1, 0, False)
    # seeded docs have DIFFERENT variants, but the header's variant-free
    # suffix window ("all rights ... document") is shared by all three ->
    # each counts >= 1 repeated window; the variant-bearing windows do not
    # reach df=3, so repeated < n_windows.
    for i in (9, 16, 23):
        assert got[i]["any_repeated"]
        assert 0 < got[i]["repeated_windows"] < got[i]["n_windows"]


def test_repeated_ngrams_oracle_on_synthetic_corpus(spark, rng_corpus_dir):
    spark_rows = [tuple(r) for r in
                  D.q_dedup_repeated_ngrams(spark, rng_corpus_dir).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{rng_corpus_dir}/documents.parquet')")
    assert spark_rows == con.execute(D.sql_dedup_repeated_ngrams()).fetchall()


def test_repeated_ngrams_plan_is_equi_join_only(spark):
    plan = (D.q_dedup_repeated_ngrams(spark, "/root/testdata/sf0.001")
             ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # both aggregations must partial-aggregate below their exchange
    assert plan.count("HashAggregate") >= 4


def test_semdedup_prunes_the_seeded_twins(spark):
    res = SIM.q_dedup_semantic(spark, "/root/testdata/sf0.001").collect()
    by_id = {r["vec_id"]: r for r in res}
    twins = [r for r in res if r["vec_id"] >= SIM.TWIN_OFFSET]
    assert len(twins) == SIM.TWIN_COUNT
    pruned = {r["vec_id"] for r in res if r["pruned"]}
    assert pruned, "twin seeding must make the prune set non-empty"
    for vid in pruned:
        if vid >= SIM.TWIN_OFFSET:
            # a pruned twin must share its cell with its (earlier) original
            assert by_id[vid]["cell"] == by_id[vid - SIM.TWIN_OFFSET]["cell"]
    # deterministic parallel keep-rule: an original (lowest id in its
    # near-dup group) is only pruned if some LOWER id is cosine-close; the
    # twins cannot cause that (twin ids are all > original ids), so every
    # pruned twin's original with no other neighbor stays kept.  Spot-check
    # the global invariant instead: at least one member of every
    # (original, twin) same-cell pair survives.
    for vid in pruned:
        if vid >= SIM.TWIN_OFFSET:
            assert not by_id[vid - SIM.TWIN_OFFSET]["pruned"] or \
                (vid - SIM.TWIN_OFFSET) in pruned


def test_semdedup_plan_is_cell_equi_join(spark):
    plan = (SIM.q_dedup_semantic(spark, "/root/testdata/sf0.001")
               ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "cell" in plan  # the self-join key is the SRP cell


@pytest.fixture(scope="module")
def soft_corpus_dir(tmp_path_factory):
    rows = []
    # two identical rare docs (one near-dup cluster of 2) + two singletons
    dup = "rare alpine couloir beta sequence description words tokens here"
    for i in (10, 11):
        rows.append({"doc_id": i, "text": dup, "lang": "en",
                     "source": "synthetic", "n_chars": len(dup)})
    for i in (20, 21):
        t = f"completely unrelated singleton document number {i} with words"
        rows.append({"doc_id": i, "text": t, "lang": "en",
                     "source": "synthetic", "n_chars": len(t)})
    d = tmp_path_factory.mktemp("softcorpus")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_softdedup_weight_contract(spark, soft_corpus_dir):
    got = {r["doc_id"]: r for r in
           D.q_sample_softdedup(spark, soft_corpus_dir).collect()}
    # identical docs share one cluster of 2; both keep a row (soft dedup
    # never drops) at exactly half a singleton's weight for their band
    assert got[10]["cluster_size"] == got[11]["cluster_size"] == 2
    assert got[10]["weight_ppm"] == got[11]["weight_ppm"]
    m = D.SOFT_BAND_MULT[got[10]["quality_band"]]
    assert got[10]["weight_ppm"] == m * D.SOFT_SCALE // 2
    for i in (20, 21):
        assert got[i]["cluster_size"] == 1
        mi = D.SOFT_BAND_MULT[got[i]["quality_band"]]
        assert got[i]["weight_ppm"] == mi * D.SOFT_SCALE
