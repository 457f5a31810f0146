"""Stream-stream interval join: the streaming form must emit exactly the
batch join's pairs over the same finite input, and the batch form must
match its DuckDB range-join oracle."""

from __future__ import annotations

import duckdb

from safeascent_spark.streaming import correlate as C

SF = "/root/testdata/sf0.001"


def _key(r):
    return (r["user_id"], r["error_id"], r["purchase_id"])


def test_stream_matches_batch(spark, tmp_path):
    out = str(tmp_path / "corr")
    C.run_correlation(spark, SF, out)
    got = {_key(r) for r in spark.read.parquet(out).collect()}
    want = {_key(r) for r in C.correlated_batch(spark, SF).collect()}
    assert len(want) > 0, "sf0.001 must contain error->purchase conversions"
    # availableNow inner join: every pair emitted exactly once, none lost
    assert got == want


def test_batch_matches_duckdb_oracle(spark):
    srows = [tuple(r) for r in C.q_events_correlated(spark, SF).collect()]
    con = duckdb.connect()
    con.execute("CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{SF}/events.parquet')")
    orows = con.execute(C.sql_events_correlated()).fetchall()
    assert len(srows) == len(orows) > 0
    assert srows == orows


def test_stream_state_is_watermark_bounded(spark):
    # the physical plan must carry event-time watermarks on BOTH inputs of
    # the stream-stream join (the state-eviction contract)
    plan = C.correlated_stream(spark, SF)._jdf.queryExecution() \
        .analyzed().toString()
    assert plan.count("EventTimeWatermark") == 2
