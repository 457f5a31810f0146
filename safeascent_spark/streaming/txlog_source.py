"""Incremental (streaming) consumption of a txlog table — the Delta
``spark.readStream.table`` / CDF-source analog for the engine's own table
format (§2.9).

Spark's built-in file stream source tails directories; a transactional
table must instead be tailed at COMMIT grain, replaying
``txlog.table_changes(v-1, v)`` per committed version.  This module
implements that as an availableNow micro-batch driver with a durable
version cursor:

* the CURSOR (last fully-processed version) lives in a checkpoint file,
  committed via atomic rename AFTER the sink call for a version returns;
* the sink receives ``(delta_df, version)`` and must be idempotent by
  version — a crash between sink write and cursor commit replays that
  version on restart, and because manifests are immutable the replayed
  ``table_changes`` frame is byte-identical (same guarantee, and same
  epoch-keyed overwrite pattern, as ``streaming.ingest_dedup``);
* unchanged partitions cost nothing per version (``table_changes`` prunes
  them metadata-only), so tailing a table whose nightly job rewrites one
  date partition of thousands is O(changed partitions) per commit.

Compaction / z-order commits rewrite files without changing rows; their
``table_changes`` frame is empty and the sink is skipped — downstream
consumers never reprocess a maintenance commit (Delta CDF's
"no change rows for OPTIMIZE" semantics).
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from .. import txlog


def read_cursor(checkpoint: str) -> int:
    p = Path(checkpoint) / "cursor.json"
    if not p.exists():
        return 0
    return json.loads(p.read_text())["version"]


def commit_cursor(checkpoint: str, version: int) -> None:
    """Atomic cursor advance: tmp-write + os.replace (rename is atomic on
    POSIX), so a crash can never leave a torn cursor — only an old one,
    which the idempotent sink absorbs as a version replay."""
    d = Path(checkpoint)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".tmp-{uuid.uuid4().hex}.json"
    tmp.write_text(json.dumps({"version": version}))
    os.replace(tmp, d / "cursor.json")


def run_table_stream(spark: SparkSession, root: str, checkpoint: str,
                     sink, key: str = "route_id",
                     fail_after_version: int | None = None,
                     include_preimages: bool = False) -> list[int]:
    """One availableNow pass over the table's unprocessed commits.

    Calls ``sink(delta_df, version)`` for every version in
    (cursor, head] whose change feed is non-empty, committing the cursor
    after each sink return.  Returns the versions for which the sink ran.

    ``fail_after_version`` injects a crash AFTER that version's sink call
    but BEFORE its cursor commit — the worst-case at-least-once window the
    restart test exercises.
    """
    processed: list[int] = []
    # Walk MAIN-lineage versions only: with named refs, side-branch
    # commits interleave in the global version sequence and must not leak
    # into the main change stream; deltas diff consecutive MAIN versions,
    # not consecutive version numbers.  On a table without refs this is
    # exactly range(1, head + 1).
    lineage = txlog.main_lineage_versions(root)
    cursor = read_cursor(checkpoint)
    prev = max((v for v in lineage if v <= cursor), default=0)
    for v in (v for v in lineage if v > cursor):
        delta = txlog.table_changes(spark, root, prev, v, key=key,
                                    include_preimages=include_preimages) \
                     .withColumn("_commit_version", F.lit(v))
        if not delta.isEmpty():
            sink(delta, v)
            processed.append(v)
            if fail_after_version is not None and v >= fail_after_version:
                raise RuntimeError(
                    f"injected crash after version {v} sink call, "
                    "before cursor commit")
        commit_cursor(checkpoint, v)
        prev = v
    return processed


def run_table_stream_to_parquet(spark: SparkSession, root: str,
                                checkpoint: str, out_path: str,
                                key: str = "route_id",
                                fail_after_version: int | None = None
                                ) -> list[int]:
    """The standard sink: each version's change rows land under
    ``out_path/version=<v>`` with mode=overwrite — idempotent by version,
    so replays rewrite their own directory instead of duplicating."""

    def sink(delta, version: int) -> None:
        delta.drop("_commit_version").write.mode("overwrite") \
             .parquet(f"{out_path}/version={version}")

    return run_table_stream(spark, root, checkpoint, sink, key=key,
                            fail_after_version=fail_after_version)


def read_change_log(spark: SparkSession, out_path: str):
    """Everything the parquet sink has emitted so far (version column
    restored from the partition directory)."""
    return spark.read.option("basePath", out_path).parquet(out_path)


def incremental_sum_delta(changes, group_cols: list[str], value_col: str):
    """Per-group additive state delta from a PRE-IMAGE-bearing change feed
    (``table_changes(include_preimages=True)``): post-images and inserts
    add, pre-images and deletes subtract — so a maintained running
    (sum, count) per group tracks the table exactly without re-reading it
    (the incremental materialized-view maintenance identity; proven
    against full recompute in tests/test_dv_stream.py).

    Scale: one map-side-combined aggregate over O(changed rows); the
    maintained state itself is only ever touched at group grain."""
    ct = F.col("_change_type")
    sign = (F.when(ct.isin("insert", "update_postimage"), F.lit(1))
             .when(ct.isin("delete", "update_preimage"), F.lit(-1))
             .otherwise(F.lit(0)))
    rows = (F.when(ct == "insert", F.lit(1))
             .when(ct == "delete", F.lit(-1)).otherwise(F.lit(0)))
    return (changes
            .groupBy(*group_cols)
            .agg(F.sum(F.col(value_col) * sign).alias(f"{value_col}_delta"),
                 F.sum(rows).alias("row_delta")))
