"""Every queries() entry must hash-match its oracle_sql() at sf0.01.

This mirrors the driver's CORRECTNESS gate locally (value compare instead of
hash, with a tiny float tolerance — the driver's hash compare is assumed to
normalize float noise; we additionally check exact string/int equality).
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry
from tests.conftest import SF_ORACLE, assert_parity

QUERIES = entry.queries()
ORACLES = entry.oracle_sql()


def test_every_query_has_oracle_or_is_declared():
    missing = set(QUERIES) - set(ORACLES)
    # Non-SQL-expressible (iterative MLlib) ops get the driver's weaker
    # rows-only check; keep the list explicit.  ml_risk_model left this list
    # in round 3 (closed-form ridge with a hard oracle); the two KMeans
    # queries carry quality floors in tests/test_ml.py instead.
    allowed_weak = {"ann_ivf_topk", "ann_pq_topk", "embedding_kmeans_cells"}
    assert missing <= allowed_weak, f"queries missing oracles: {missing}"


def test_no_orphan_oracles():
    assert set(ORACLES) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_parity(name, spark, duck):
    df = QUERIES[name](spark, SF_ORACLE)
    assert_parity(df, duck, ORACLES[name])
