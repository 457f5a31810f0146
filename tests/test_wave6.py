"""Semantics of the round-5 sixth-wave operators (beyond oracle parity)."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from safeascent_spark.operators import text as TX
from tests.conftest import SF_ORACLE


def test_perplexity_terciles_balanced_per_source(spark):
    """ntile(3) per source: bucket sizes within a source differ by <= 1,
    keep is exactly head+middle, and ordering is consistent — every head
    doc has bits/token <= every tail doc of the same source."""
    rows = TX.q_text_perplexity_filter(spark, SF_ORACLE).collect()
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
        assert r.keep == (r.ppl_bucket != "tail")
    assert len(by_source) > 1
    for src, rs in by_source.items():
        sizes = Counter(r.ppl_bucket for r in rs)
        if len(rs) >= 3:
            assert max(sizes.values()) - min(sizes.values()) <= 1, (src, sizes)
        head_max = max((r.bits_per_token for r in rs
                        if r.ppl_bucket == "head"), default=None)
        tail_min = min((r.bits_per_token for r in rs
                        if r.ppl_bucket == "tail"), default=None)
        if head_max is not None and tail_min is not None:
            assert head_max <= tail_min, (src, head_max, tail_min)


def test_perplexity_covers_every_tokenized_doc(spark):
    n_docs = (TX.docs_df(spark, SF_ORACLE)
              .filter(F.trim(F.col("text")) != "").count())
    n_scored = TX.q_text_perplexity_filter(spark, SF_ORACLE).count()
    assert n_scored == n_docs
