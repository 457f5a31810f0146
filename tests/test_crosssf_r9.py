"""Regression guards for the late-r9 cross-SF audit findings.

Each defect below was invisible at the sf0.01 driver gate and surfaced
only when the full registry was bit-exact-compared at sf0.1; these
fixtures reproduce the exact triggering conditions at test scale so
the classes stay dead:

1. ``text_quality_score`` 6-decimal half-boundary: a document whose
   TRUE composed quality is exactly 0.5060625 made Spark (HALF_UP)
   round to 0.506063 and DuckDB to 0.506062.  The readout now emits
   the exact integer ``quality_u`` (truncating per-term formula), so
   the fixture pins the one true integer both engines must agree on.
2. ``ml._moment_aggs`` int64 overflow: the label is the micro-unit
   UNCAPPED influence sum, so sum(yi*yi) rides ~n * risk^2 and blew
   past int64 at sf0.1.  The aggregates must survive label values
   whose squared sum exceeds 2^63.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from safeascent_spark import ml as ML
from safeascent_spark.operators import text as TX


def test_quality_half_boundary_is_integer_exact(spark, tmp_path):
    """ntok=48, nstop=6, n_chars=257 -> true quality = 0.5060625,
    EXACTLY on the 6-decimal rounding half-boundary (the sf0.1 doc-819
    trigger).  The integer readout must give the same quality_u in
    both engines, with the truncating per-term value 506062."""
    toks = ["the"] * 6 + [f"w{i}" for i in range(42)]
    pdf = pd.DataFrame({
        "doc_id": [0],
        "text": [" ".join(toks)],
        "lang": ["xx"],
        "source": ["t"],
        "n_chars": [257],
    })
    pdf.to_parquet(f"{tmp_path}/documents.parquet", index=False)
    row = TX.q_quality_score(spark, str(tmp_path)).collect()[0]
    # per-term: 4000*48=192000 (cap 400000) + 1200000*6//48=150000
    #           + 300000*210//384=164062  => 506062 ('medium')
    assert (row.n_tokens, row.stopword_ppm, row.mean_word_len_milli,
            row.quality_u, row.quality_band) == (48, 125000, 4375,
                                                 506062, "medium")
    con = duckdb.connect()
    con.register("documents", pdf)
    orc = con.execute(TX.sql_quality_score()).fetchall()[0]
    assert tuple(orc) == tuple(row)
    # the band expression used by composing consumers agrees
    band = con.execute(
        f"SELECT {TX.sql_quality_band_expr()} FROM documents"
    ).fetchone()[0]
    assert band == row.quality_band
    got_band = TX.quality_band_df(spark, str(tmp_path)).collect()[0]
    assert got_band.quality_band == row.quality_band


def test_moment_aggs_survive_int64_overflow(spark):
    """Labels at the observed sf0.1 magnitude (yi = 1e8 = the saturated
    100.000000 risk cap) and beyond: three rows of yi = 4e9 give
    sum(yi*yi) = 4.8e19 > 2^63 - 1, which the old BIGINT sum rejected
    under ANSI mode.  The DECIMAL(38,0) aggregates must return the
    exact integer."""
    df = spark.createDataFrame(
        [(1, 10, 4_000_000_000), (2, 20, 4_000_000_000),
         (3, 30, 4_000_000_000)],
        "ei long, pi long, yi long")
    row = df.agg(*ML._moment_aggs()).collect()[0]
    assert int(row.syy0) == 3 * 4_000_000_000 ** 2  # 4.8e19 > int64
    assert int(row.s1y) == (1 + 2 + 3) * 4_000_000_000
    assert int(row.s11) == 1 + 4 + 9
    # DuckDB mirror: HUGEINT product-sums give the same exact integer
    con = duckdb.connect()
    con.register("t", pd.DataFrame(
        {"ei": [1, 2, 3], "pi": [10, 20, 30],
         "yi": [4_000_000_000] * 3}))
    o = con.execute(
        "SELECT sum(CAST(yi AS HUGEINT) * yi) AS syy0,"
        "       sum(CAST(ei AS HUGEINT) * yi) AS s1y FROM t"
    ).fetchone()
    assert int(o[0]) == int(row.syy0) and int(o[1]) == int(row.s1y)
