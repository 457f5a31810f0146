"""Round-9 ADVICE regression guards.

Two low findings from the r8 advisor, both parity-preserving (each
engine mirrored the other's flaw) but semantically wrong — so each
gets a hostile tmp-parquet fixture that exercises the exact edge,
runs the REAL operator, and cross-checks the DuckDB oracle:

1. (low) ``text_vocab_novelty``: the per-bucket readout inner-joined
   the first-seen counts, so a bucket whose every trigram was already
   seen in earlier buckets — the exact "crawler stuck re-fetching"
   signal the readout exists to catch — silently vanished from the
   output.  Fixed with a LEFT join + COALESCE(n_new_grams, 0) in both
   engines, surfacing novelty_ppm=0 explicitly.
2. (low) ``dq_benford``: abs() was applied AFTER floor(), so a
   negative sub-cent total (floor(-0.4) = -1) was counted as digit 1
   while its positive mirror (floor(0.4) = 0) was dropped.  Fixed by
   flooring abs(price) — now truly sign-blind (the distinguishing
   fixture lives in test_advice_r8.py::test_benford_sign_guard, which
   pins the NEW behavior).
"""

from __future__ import annotations

import duckdb
import pandas as pd

from safeascent_spark.operators import text as TX


def _write_parquet(path, name, pdf):
    pdf.to_parquet(f"{path}/{name}.parquet", index=False)
    return str(path)


def test_vocab_novelty_zero_bucket_surfaces(spark, tmp_path):
    """A bucket contributing NO new trigrams appears with
    n_new_grams=0 / novelty_ppm=0 instead of vanishing."""
    # NOVELTY_BUCKET=100 docs per bucket: doc 0 -> bucket 0,
    # docs 100/101 -> bucket 1.  Bucket 1's only trigrams ("a b c",
    # "b c d") were both first seen in bucket 0.
    pdf = pd.DataFrame({
        "doc_id": [0, 100, 101],
        "text": ["a b c d e", "a b c", "b c d"],
        "lang": ["xx"] * 3,
        "source": ["t"] * 3,
        "n_chars": [9, 5, 5],
    })
    sf = _write_parquet(tmp_path, "documents", pdf)
    rows = {r.bucket: (r.n_distinct_grams, r.n_new_grams, r.novelty_ppm)
            for r in TX.q_text_vocab_novelty(spark, sf).collect()}
    # bucket 0: trigrams {a b c, b c d, c d e} all new
    # bucket 1: trigrams {a b c, b c d} — ZERO new (the fixed row)
    assert rows == {0: (3, 3, 1000000), 1: (2, 0, 0)}
    con = duckdb.connect()
    con.register("documents", pdf)
    orc = {b: (d, n, p) for b, d, n, p in
           con.execute(TX.sql_text_vocab_novelty()).fetchall()}
    assert orc == rows
