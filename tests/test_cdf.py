"""Change-data-feed between txlog versions: row-level insert / update /
delete tags, with untouched partitions pruned at the manifest level."""

from __future__ import annotations

from pyspark.sql import functions as F

from safeascent_spark import txlog


def _df(spark, rows):
    return spark.createDataFrame(rows, "route_id bigint, score double") \
        .coalesce(1).localCheckpoint()


def test_changes_tags_inserts_updates_deletes(spark, tmp_path):
    root = str(tmp_path / "t")
    # v1: two partitions
    txlog.commit_overwrite_partition(
        _df(spark, [(1, 1.0), (2, 2.0), (3, 3.0)]), root, "d1")
    v1 = txlog.commit_overwrite_partition(
        _df(spark, [(9, 9.0)]), root, "d0")
    # v2: d1 rewritten — key 2 updated, key 3 dropped, key 4 inserted,
    # key 1 UNCHANGED (rewritten byte-identical); d0 untouched
    v2 = txlog.commit_overwrite_partition(
        _df(spark, [(1, 1.0), (2, 2.5), (4, 4.0)]), root, "d1")
    ch = txlog.table_changes(spark, root, v1, v2).collect()
    got = {(r["route_id"], r["_change_type"], r["_partition"]) for r in ch}
    assert got == {(2, "update_postimage", "d1"),
                   (3, "delete", "d1"),
                   (4, "insert", "d1")}
    # the unchanged-key row must NOT appear, and the untouched partition
    # must be pruned by the manifest diff (no d0 rows at all)
    assert all(r["_partition"] != "d0" for r in ch)
    # update carries the post-image value
    assert {r["score"] for r in ch if r["route_id"] == 2} == {2.5}


def test_changes_new_partition_is_all_inserts(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = txlog.commit_overwrite_partition(_df(spark, [(1, 1.0)]), root, "a")
    v2 = txlog.commit_overwrite_partition(
        _df(spark, [(10, 1.0), (11, 2.0)]), root, "b")
    ch = txlog.table_changes(spark, root, v1, v2)
    got = {(r["route_id"], r["_change_type"], r["_partition"])
           for r in ch.collect()}
    assert got == {(10, "insert", "b"), (11, "insert", "b")}


def test_changes_merge_then_feed_equals_snapshot_diff(spark, tmp_path):
    # applying the feed to the old snapshot must reproduce the new one
    root = str(tmp_path / "t")
    v1 = txlog.commit_overwrite_partition(
        _df(spark, [(1, 1.0), (2, 2.0)]), root, "d")
    v2 = txlog.merge_scores(_df(spark, [(2, 20.0), (5, 5.0)]), root, "d")
    ch = txlog.table_changes(spark, root, v1, v2)
    old = txlog.read_snapshot(spark, root, version=v1, partition="d") \
        .select("route_id", "score")
    upserts = ch.filter(F.col("_change_type") != "delete") \
        .select("route_id", "score")
    deletes = ch.filter(F.col("_change_type") == "delete").select("route_id")
    applied = (old.join(upserts.select("route_id"), "route_id", "left_anti")
                  .join(deletes, "route_id", "left_anti")
                  .unionByName(upserts))
    new = txlog.read_snapshot(spark, root, version=v2, partition="d") \
        .select("route_id", "score")
    assert sorted(map(tuple, applied.collect())) == \
        sorted(map(tuple, new.collect()))


def test_changes_empty_when_nothing_changed(spark, tmp_path):
    root = str(tmp_path / "t")
    v1 = txlog.commit_overwrite_partition(_df(spark, [(1, 1.0)]), root, "d")
    assert txlog.table_changes(spark, root, v1, v1).count() == 0
