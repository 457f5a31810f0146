"""Streaming sliding-window trending: the availableNow pass must emit every
watermark-closed window exactly once, matching the batch computation over
the same file, and the serving top-k must rank deterministically."""

from __future__ import annotations

from pyspark.sql import functions as F

from safeascent_spark.streaming import trending as TR
from tests.conftest import SF_SMOKE


def _batch_expected(spark):
    """Batch mirror of the windowed counts over the same parquet."""
    from safeascent_spark import domain
    e = domain.load_table(spark, SF_SMOKE, "events")
    with_time = e.withColumn(
        "event_time", F.timestamp_seconds(F.expr("ts div 1000000000")))
    counts = (with_time
              .groupBy(F.window("event_time", TR.TREND_WINDOW,
                                TR.TREND_SLIDE).alias("w"),
                       "event_type")
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(F.expr("CAST(floor(value * 1000) AS BIGINT)"))
                    .alias("v_milli")))
    return counts.select(
        F.col("w.start").cast("long").alias("w_start"),
        F.col("w.end").cast("long").alias("w_end"),
        "event_type", "n", "v_milli")


def test_stream_matches_batch_for_closed_windows(spark, tmp_path):
    out = str(tmp_path / "trend_sink")
    n = TR.run_trending(spark, SF_SMOKE, out)
    assert n > 0
    got = {(r.w_start, r.event_type): (r.n, r.v_milli)
           for r in spark.read.parquet(out).collect()}
    # no window emitted twice (exactly-once append contract)
    assert len(got) == spark.read.parquet(out).count()
    expected = _batch_expected(spark).collect()
    # every CLOSED window (watermark passed) must match the batch numbers.
    # The final watermark is (max EVENT time - 1 h) — windows whose END
    # precedes it are closed; later windows (sliding windows extend up to
    # a day past the last event) legitimately stay in state and are NOT
    # emitted by the append-mode availableNow pass.
    from safeascent_spark import domain
    e = domain.load_table(spark, SF_SMOKE, "events")
    max_event = e.agg(F.max(F.expr("ts div 1000000000"))).collect()[0][0]
    closed = [r for r in expected if r.w_end <= max_event - 3600]
    assert closed, "test data too small to close any window"
    for r in closed:
        assert got.get((r.w_start, r.event_type)) == (r.n, r.v_milli), r
    # nothing in the sink disagrees with batch (no partial/corrupt windows)
    exp_all = {(r.w_start, r.event_type): (r.n, r.v_milli) for r in expected}
    for k, v in got.items():
        assert exp_all[k] == v


def test_trending_topk_ranks_each_window(spark, tmp_path):
    out = str(tmp_path / "trend_sink2")
    TR.run_trending(spark, SF_SMOKE, out)
    rows = TR.read_trending_topk(spark, out).collect()
    assert rows
    by_win: dict[int, list] = {}
    for r in rows:
        by_win.setdefault(r.w_start, []).append(r)
    for ws, rs in by_win.items():
        assert [r.rnk for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) <= TR.TREND_TOP_K
        ns = [r.n for r in rs]
        assert ns == sorted(ns, reverse=True)
