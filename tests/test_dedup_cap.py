"""Hot-shingle document-frequency cap: a boilerplate shingle shared by k
docs must NOT emit C(k,2) candidate pairs in the Jaccard inverted-index
join, while genuine near-dups still pair up — and the DuckDB oracle agrees
on the same synthetic corpus."""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from safeascent_spark.operators import dedup as D

BOILER = "lorem ipsum dolor sit amet consectetur"
N_BOILER_DOCS = 120  # > MAX_SHINGLE_DF -> boilerplate shingles get capped


@pytest.fixture(scope="module")
def hot_corpus_dir(tmp_path_factory):
    rows = []
    for i in range(N_BOILER_DOCS):
        text = f"{BOILER} unique{i} tokens{i} here{i} extra{i} words{i}"
        rows.append({"doc_id": i, "text": text, "lang": "en",
                     "source": "synthetic", "n_chars": len(text)})
    # one genuine near-dup pair: identical rare bodies
    for i in (200, 201):
        text = "rare alpine couloir beta sequence description"
        rows.append({"doc_id": i, "text": text, "lang": "en",
                     "source": "synthetic", "n_chars": len(text)})
    d = tmp_path_factory.mktemp("hotcorpus")
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    return str(d)


def test_hot_shingles_are_capped_out_of_the_join(spark, hot_corpus_dir):
    assert N_BOILER_DOCS > D.MAX_SHINGLE_DF
    sh = D.shingles_df(spark, hot_corpus_dir)
    hot = (sh.groupBy("sid").agg(F.count(F.lit(1)).alias("df"))
             .filter(F.col("df") > D.MAX_SHINGLE_DF))
    assert hot.count() >= 3  # the boilerplate 3-grams really are hot
    kept = sh.join(F.broadcast(hot.select("sid")), "sid", "left_anti")
    max_df = (kept.groupBy("sid").agg(F.count(F.lit(1)).alias("df"))
                  .agg(F.max("df")).collect()[0][0])
    # bounded fan-out: no surviving inverted-index key exceeds the cap
    assert max_df <= D.MAX_SHINGLE_DF


def test_jaccard_pairs_bounded_and_oracle_agrees(spark, hot_corpus_dir):
    pairs = D.q_dedup_jaccard(spark, hot_corpus_dir).collect()
    got = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs}
    # boilerplate alone never pairs; the genuine near-dup does, at 1.0
    assert got == {(200, 201): 1.0}

    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{hot_corpus_dir}/documents.parquet')")
    oracle = con.execute(D.sql_dedup_jaccard()).fetchall()
    assert [(a, b, j) for a, b, j in oracle] == [(200, 201, 1.0)]


def test_decontam_oracle_tokenizes_irregular_spacing(spark, tmp_path):
    """ADVICE r4 (medium): the decontamination oracle must whitespace-
    normalize the CORPUS side too — a fragment occurrence with
    consecutive/irregular spaces must match in BOTH engines, and the two
    must agree on a corpus that is NOT single-spaced.  Also pins the
    negative-id namespace for seeded leaky docs (disjoint from any real
    doc_id by construction, no additive-offset collision)."""
    donor_frag = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        # donor: doc_id % 97 == 3, >= 8 tokens; (3 div 97) % 2 == 0 so it
        # seeds a leaky doc with doc_id == -3
        {"doc_id": 3, "text": donor_frag + " trailing words here",
         "lang": "en", "source": "s", "n_chars": 1},
        # corpus doc containing the fragment with IRREGULAR spacing
        {"doc_id": 10,
         "text": "prefix  alpha beta  gamma delta epsilon zeta  eta theta suffix",
         "lang": "en", "source": "s", "n_chars": 1},
        # corpus doc without the fragment
        {"doc_id": 11, "text": "nothing of interest in this one at all",
         "lang": "en", "source": "s", "n_chars": 1},
    ]
    d = tmp_path / "decon"
    d.mkdir()
    pd.DataFrame(rows).to_parquet(d / "documents.parquet")
    got = [(r.doc_id, r.n_frags_leaked)
           for r in D.q_decontam_substring(spark, str(d)).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{d}/documents.parquet')")
    oracle = con.execute(D.sql_decontam_substring()).fetchall()
    assert got == [(-3, 1), (10, 1)], got
    assert [tuple(r) for r in oracle] == got, (oracle, got)
