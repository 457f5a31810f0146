"""Z-order clustering (OPTIMIZE ZORDER analog): a 2-D box predicate must
prune multiplicatively more files from a z-clustered layout than from a
single-column-sorted one, and the clustered read must stay exact."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from safeascent_spark import txlog

N_SIDE = 120           # 120 x 120 grid = 14 400 points in [0, 120)^2
# 64 files = 8x8 Morton blocks (~15 units/axis) vs 64 lat slabs (~1.9
# units).  The margin matters: repartitionByRange picks boundaries by
# SAMPLING, so per-file ranges wobble run to run; with the 20-unit box a
# 4x4 block layout could tie the ~3-slab linear count under unlucky
# boundaries (observed as an order-dependent flake), while at 8x8 the
# linear layout keeps ~12 slabs vs z's ~4-9 blocks — sampling-proof.
N_FILES = 64
BOX = (30.0, 50.0)     # ~1/36 of the area in 2-D


@pytest.fixture(scope="module")
def grid_df(spark):
    return (spark.range(N_SIDE * N_SIDE)
                 .select(F.col("id").alias("route_id"),
                         (F.col("id") % N_SIDE).cast("double").alias("lat"),
                         (F.col("id") / N_SIDE).cast("double").alias("lon")))


def _surviving(root: str, box: dict) -> tuple[int, int]:
    files = [e for fs in txlog.read_manifest(root)["partitions"].values()
             for e in fs]
    kept = 0
    for e in files:
        ok = True
        for c, (lo, hi) in box.items():
            rng = e.get("cols", {}).get(c)
            if rng is not None and (rng[1] < lo or rng[0] > hi):
                ok = False
        kept += ok
    return kept, len(files)


def test_zorder_prunes_2d_box_better_than_linear_sort(spark, tmp_path, grid_df):
    lin_root = str(tmp_path / "linear")
    z_root = str(tmp_path / "zorder")
    # linear layout: range-partitioned by lat only (the compact() shape),
    # with the same per-column stats recorded so the comparison is fair
    lin = grid_df.repartitionByRange(N_FILES, "lat").localCheckpoint()
    files = txlog._write_data_files(lin, lin_root, stats_cols=("lat", "lon"))
    txlog._retrying_commit(lin_root, lambda base: {"d": files})
    # z-ordered layout: same rows, Morton-interleaved (lat, lon)
    txlog.commit_overwrite_partition(grid_df.localCheckpoint(), z_root, "d")
    txlog.cluster_zorder(spark, z_root, "d", cols=("lat", "lon"),
                         target_files=N_FILES)

    box = {"lat": BOX, "lon": BOX}
    lin_kept, lin_total = _surviving(lin_root, box)
    z_kept, z_total = _surviving(z_root, box)
    assert lin_total == N_FILES and z_total == N_FILES
    # lat-sorted prunes on lat but keeps every file's full lon range; the
    # z-layout's per-file ranges are tight on BOTH axes
    assert z_kept < lin_kept
    # a lon-only predicate cannot prune the lat-sorted layout at all
    lon_only = {"lon": BOX}
    assert _surviving(lin_root, lon_only)[0] == N_FILES
    assert _surviving(z_root, lon_only)[0] < N_FILES


def test_zorder_read_is_exact(spark, tmp_path, grid_df):
    root = str(tmp_path / "t")
    txlog.commit_overwrite_partition(grid_df.localCheckpoint(), root, "d")
    txlog.cluster_zorder(spark, root, "d", cols=("lat", "lon"),
                         target_files=N_FILES)
    box = {"lat": BOX, "lon": BOX}
    got = (txlog.read_snapshot(spark, root, partition="d", cols_between=box)
                .select("route_id").orderBy("route_id").collect())
    want = (grid_df.filter(F.col("lat").between(*BOX)
                           & F.col("lon").between(*BOX))
                   .select("route_id").orderBy("route_id").collect())
    assert got == want and len(got) > 0


def test_zorder_noop_on_missing_partition(spark, tmp_path):
    root = str(tmp_path / "empty")
    assert txlog.cluster_zorder(spark, root, "d", cols=("lat",)) == 0
