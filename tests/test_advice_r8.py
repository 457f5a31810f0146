"""Round-8 ADVICE regression guards.

Two latent Spark/DuckDB divergences flagged by the r7 advisor, both
invisible on the stock fixtures (min doc length 47; all order totals
positive) — so each gets a hostile tmp-parquet fixture that exercises
the exact edge, runs the REAL operator over it, and cross-checks the
DuckDB oracle on the same rows:

1. (medium) ``text_char_trigram_profile``: Spark ``sequence(1, 0)``
   descends to ``[1, 0]`` instead of returning an empty array, so an
   unguarded index sequence emits bogus 1-2-char "trigrams" for docs
   shorter than 3 chars.  Fixed with a ``length(text) >= 3`` filter
   before the explode, mirrored in the oracle.
2. (low) ``dq_benford``: the leading digit used to come from a string
   cast of the signed cent integer — Spark turns a leading '-' into a
   NULL digit while DuckDB raises a conversion error.  Fixed by taking
   ``abs()`` first and dropping zero rows, mirrored in the oracle.
"""

from __future__ import annotations

from collections import Counter

import duckdb
import pandas as pd

from safeascent_spark.operators import monitor as MON
from safeascent_spark.operators import text as TX


def _write_parquet(path, name, pdf):
    pdf.to_parquet(f"{path}/{name}.parquet", index=False)
    return str(path)


def test_trigram_profile_short_doc_guard(spark, tmp_path):
    """Docs shorter than 3 chars emit ZERO trigrams (no [1,0] descent)."""
    texts = ["", "a", "ab", "abc", "abcd", "zzzzz"]
    pdf = pd.DataFrame({
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["xx"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": [len(t) for t in texts],
    })
    sf = _write_parquet(tmp_path, "documents", pdf)
    rows = TX.q_text_char_trigram_profile(spark, sf).collect()
    # Brute force over ONLY the >=3-char docs.
    want = Counter()
    for t in texts:
        want.update(t[i:i + 3] for i in range(len(t) - 2))
    got = {(r.tri, r.cnt) for r in rows}
    assert got == set(want.items())
    # The poison pills: every emitted trigram is exactly 3 chars.
    assert all(len(r.tri) == 3 for r in rows)
    # Oracle agrees on the same fixture.
    con = duckdb.connect()
    con.register("documents", pdf)
    orc = con.execute(TX.sql_text_char_trigram_profile()).fetchall()
    assert {(t, c) for _, _, t, c in orc} == got


def test_benford_sign_guard(spark, tmp_path):
    """Sign-blindness (ADVICE r8): abs() rides INSIDE the floor, so a
    negative sub-cent total (-0.004) is dropped exactly like its
    positive mirror instead of being counted as digit 1; zeros are
    dropped; and the oracle runs WITHOUT a conversion error on the
    same rows."""
    totals = [123.45, -987.60, 0.0, 0.004, -0.004, -0.01, 55.0, 5.5]
    pdf = pd.DataFrame({
        "o_orderkey": list(range(len(totals))),
        "o_totalprice": totals,
    })
    sf = _write_parquet(tmp_path, "orders", pdf)
    rows = {r.digit: r.n_obs for r in
            MON.q_dq_benford(spark, sf).collect()}
    # cents of abs: 12345, 98760, 0 (drop), 0 (drop), 0 (drop —
    # floor-then-abs would have said 1), 1, 5500, 550
    assert rows == {1: 2, 9: 1, 5: 2}
    con = duckdb.connect()
    con.register("orders", pdf)
    orc = {d: n for d, n, *_ in
           con.execute(MON.sql_dq_benford()).fetchall()}
    assert orc == rows
