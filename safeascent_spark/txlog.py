"""Versioned-manifest table format: atomic commits over plain parquet.

The reference upserts scores with ``INSERT ... ON CONFLICT DO UPDATE``
under PostgreSQL's transactional guarantees
(safety_computation_optimized.py:827-905).  The filesystem merge-on-read
stand-in in ``sinks.py`` is single-writer; this module supplies the missing
catalog-table semantics — the same protocol Delta Lake / Iceberg use,
reduced to its core:

* A table is ``<root>/data/*.parquet`` plus a log ``<root>/_txlog/v{N}.json``.
  Each manifest lists the EXACT data files of that snapshot (grouped by
  partition value), so readers never list directories and never see
  half-written files: files are written first under fresh unique names,
  then referenced.
* Commits are optimistic: build the next manifest against the current
  version, then publish with ``os.link(tmp, v{N+1}.json)`` — hard-link
  creation is atomic and fails with EEXIST if another writer took the
  version, in which case the commit REBASES on the new head and retries
  (bounded).  Readers always see a complete manifest or the previous one.
* Old manifests stay until ``vacuum`` — which yields snapshot isolation and
  time travel for free (``read_snapshot(version=K)``).
* Manifest entries carry per-file statistics (row count, key min/max read
  from the parquet footers at commit) so ``read_snapshot(key_between=...)``
  skips files whose range is disjoint from the predicate — Iceberg-style
  data skipping without opening a single pruned file.

Partition-grain operations rewrite only the partitions they touch; MERGE
(latest-wins by key) rewrites only partitions present in the source.
"""

from __future__ import annotations

import json
import os
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflict(RuntimeError):
    """Another writer advanced the table while this commit was retried out."""


def _log_dir(root: str) -> Path:
    return Path(root) / "_txlog"


def _manifest_path(root: str, version: int) -> Path:
    return _log_dir(root) / f"v{version}.json"


def current_version(root: str) -> int:
    """Highest committed version, 0 if the table does not exist yet."""
    d = _log_dir(root)
    if not d.exists():
        return 0
    vs = [int(p.stem[1:]) for p in d.glob("v*.json")]
    return max(vs, default=0)


def read_manifest(root: str, version: int | None = None,
                  ref: str | None = None) -> dict:
    """Manifest for ``version``, a named ``ref``, or the default head.

    Default head = the ``main`` branch when refs exist (branch commits
    must not change what default readers see), else the max version —
    bit-identical to the pre-refs behavior for tables without refs."""
    if ref is not None:
        version = resolve_ref(root, ref)
    if version is None:
        if _has_refs(root):
            version = resolve_ref(root, MAIN)
        else:
            version = current_version(root)
    if version == 0:
        return {"version": 0, "partitions": {}}
    with open(_manifest_path(root, version)) as f:
        return json.load(f)


def _bloom_build(values, bits_per_key: int = 10, k: int = 7) -> dict:
    """Classic Bloom filter over a file's key values (Kirsch-Mitzenmacher
    double hashing off sha256, ~0.8% fpp at 10 bits/key, k=7), serialized
    as a hex bitset for the JSON manifest.  Keys hash via their canonical
    ``str()`` so int64 and string keys both round-trip exactly.

    Scale note: the bitset costs bits_per_key * rows / 4 hex chars per
    file (a 1M-row file -> ~2.5 MB manifest entry); production tables
    beyond that should move blooms to sidecar stats files (Iceberg's
    puffin layout) — the probe contract below is unchanged."""
    import hashlib
    m = 64
    while m < max(1, len(values)) * bits_per_key:
        m <<= 1
    bits = 0
    for v in values:
        h = hashlib.sha256(str(v).encode()).digest()
        h1 = int.from_bytes(h[:8], "little")
        h2 = int.from_bytes(h[8:16], "little") | 1
        for i in range(k):
            bits |= 1 << ((h1 + i * h2) % m)
    return {"m": m, "k": k, "bits": format(bits, "x")}


def _bloom_may_contain(bloom: dict, value) -> bool:
    import hashlib
    m, k = bloom["m"], bloom["k"]
    bits = int(bloom["bits"], 16)
    h = hashlib.sha256(str(value).encode()).digest()
    h1 = int.from_bytes(h[:8], "little")
    h2 = int.from_bytes(h[8:16], "little") | 1
    return all((bits >> ((h1 + i * h2) % m)) & 1 for i in range(k))


def _file_stats(path: Path, key: str,
                stats_cols: tuple[str, ...] = (),
                bloom_key: bool = False) -> dict:
    """Per-file stats from the parquet footer (no data read): row count and
    the key column's min/max across row groups — the Iceberg-manifest
    metadata that makes reader-side data skipping possible.  Extra
    ``stats_cols`` land under ``"cols": {name: [min, max]}`` so clustered
    layouts (``cluster_zorder``) can expose multi-column ranges."""
    import pyarrow.parquet as pq
    md = pq.ParquetFile(path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}

    def _minmax(col: str):
        lo = hi = None
        if col not in idx:
            return None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[col]).statistics
            if st is None or not st.has_min_max:
                return None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        return None if lo is None else (lo, hi)

    out = {"rows": md.num_rows}
    mm = _minmax(key)
    out["min_key"], out["max_key"] = mm if mm else (None, None)
    cols = {}
    for c in stats_cols:
        mm = _minmax(c)
        if mm is not None:
            cols[c] = [mm[0], mm[1]]
    if cols:
        out["cols"] = cols
    if bloom_key and key in idx:
        # one single-column columnar read at commit time (the Iceberg
        # write-side stats pass); min/max can't prune point lookups on
        # unsorted keys — the bloom can
        import pyarrow.parquet as pq2
        vals = pq2.read_table(path, columns=[key]).column(0).to_pylist()
        out["bloom"] = _bloom_build([v for v in vals if v is not None])
    return out


def _write_data_files(df: DataFrame, root: str, key: str = "route_id",
                      stats_cols: tuple[str, ...] = (),
                      bloom_key: bool = False) -> list[dict]:
    """Materialize ``df`` under a fresh unique directory; return manifest
    entries [{path, rows, min_key, max_key[, cols]}] (paths relative to
    root).  Unreferenced until a manifest commit."""
    sub = f"data/{uuid.uuid4().hex}"
    out = Path(root) / sub
    df.write.mode("error").parquet(str(out))
    return sorted(
        ({"path": f"{sub}/{p.name}",
          **_file_stats(p, key, stats_cols, bloom_key)}
         for p in out.iterdir() if p.name.endswith(".parquet")),
        key=lambda e: e["path"])


def _publish(root: str, manifest: dict) -> bool:
    """Atomically publish ``manifest`` as the next version via hard link.

    Returns False when the version was taken by a concurrent writer."""
    d = _log_dir(root)
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".tmp-{uuid.uuid4().hex}.json"
    tmp.write_text(json.dumps(manifest, indent=1, sort_keys=True))
    try:
        os.link(tmp, _manifest_path(root, manifest["version"]))
        return True
    except FileExistsError:
        return False
    finally:
        tmp.unlink()


def read_snapshot(spark: SparkSession, root: str,
                  version: int | None = None,
                  partition: str | None = None,
                  key_between: tuple | None = None,
                  key: str = "route_id",
                  cols_between: dict | None = None,
                  key_eq=None,
                  ref: str | None = None) -> DataFrame:
    """Read a committed snapshot (optionally one partition / an old
    version).  Loads exactly the manifest's file list — no directory
    listing, no exposure to in-flight writers.

    ``key_between=(lo, hi)`` performs manifest-level data skipping: files
    whose ``key`` min/max range (captured from parquet footers at commit)
    is disjoint from [lo, hi] are never opened, and the exact filter is
    re-applied to the survivors.  Files without stats are conservatively
    kept.  ``key`` must match the column the files were committed with
    (``_write_data_files``'s key) — it is also the column of the
    single-key empty-table fallback schema, which exists only so "read an
    empty/missing table" composes; callers needing a real schema should
    check ``read_manifest`` first (r3 ADVICE: the fallback previously
    hardcoded route_id even for tables keyed otherwise).

    ``cols_between={col: (lo, hi), ...}`` skips on the per-column ranges a
    clustered commit recorded (``cluster_zorder``'s ``stats_cols``): a file
    is pruned when ANY filtered column's recorded range is disjoint from
    its predicate — the conjunctive-skip rule Delta/Iceberg apply to
    ZORDER-clustered tables.  Files lacking stats for a column are
    conservatively kept, and every surviving file is re-filtered exactly.

    ``key_eq=value`` is the point-lookup form: beyond the min/max range
    check it probes each file's Bloom filter (committed with
    ``bloom_key=True``) — the pruning min/max cannot do when keys are
    hash-distributed across files.  False positives only cost an extra
    file read; the exact ``key == value`` filter is always re-applied.
    Files committed without a bloom are conservatively kept."""
    m = read_manifest(root, version, ref=ref)
    parts = m["partitions"]
    if partition is not None:
        parts = {partition: parts.get(partition, [])}
    frames = []
    for pval, entries in sorted(parts.items()):
        # deletion vectors: tombstone entries list DELETED keys
        # (merge-on-read row deletes, see delete_where); they ride the
        # same pruning as data files — a tombstone whose key range is
        # disjoint from the predicate cannot affect any surviving row,
        # because survivors are re-filtered exactly below
        tombs = [e for e in entries if e.get("tombstone")]
        files = [e for e in entries if not e.get("tombstone")]

        def _prune(fs: list[dict]) -> list[dict]:
            if key_between is not None:
                lo, hi = key_between
                fs = [e for e in fs
                      if e.get("min_key") is None
                      or not (e["max_key"] < lo or e["min_key"] > hi)]
            if key_eq is not None:
                fs = [e for e in fs
                      if (e.get("min_key") is None
                          or e["min_key"] <= key_eq <= e["max_key"])
                      and (e.get("bloom") is None
                           or _bloom_may_contain(e["bloom"], key_eq))]
            if cols_between is not None:
                def _survives(e: dict) -> bool:
                    for c, (lo, hi) in cols_between.items():
                        rng = e.get("cols", {}).get(c)
                        if rng is not None and (rng[1] < lo or rng[0] > hi):
                            return False
                    return True
                fs = [e for e in fs if _survives(e)]
            return fs

        files, tombs = _prune(files), _prune(tombs)
        if not files:
            continue
        df = spark.read.parquet(*[str(Path(root) / e["path"]) for e in files])
        if tombs:
            dead = spark.read.parquet(
                *[str(Path(root) / e["path"]) for e in tombs]) \
                .select(key).distinct()
            # deleted-key sets are bounded per maintenance cycle (compact /
            # merge materialize them away), so the anti-join broadcasts
            df = df.join(F.broadcast(dead), key, "left_anti")
        frames.append(df.withColumn("prediction_date", F.lit(pval)))
    if not frames:
        return spark.createDataFrame([], f"{key} bigint") \
            .withColumn("prediction_date", F.lit(None).cast("string"))
    out = frames[0]
    for f in frames[1:]:
        # allowMissingColumns: partitions committed before a column was
        # added read as null for it (additive schema evolution — the
        # Delta mergeSchema read semantics)
        out = out.unionByName(f, allowMissingColumns=True)
    if key_between is not None:
        out = out.filter(F.col(key).between(*key_between))
    if key_eq is not None:
        out = out.filter(F.col(key) == key_eq)
    if cols_between is not None:
        for c, (lo, hi) in cols_between.items():
            out = out.filter(F.col(c).between(lo, hi))
    return out


def _retrying_commit(root: str, build, max_retries: int = 10):
    """Optimistic-commit loop: ``build(base_manifest)`` returns the changed
    partition->files mapping; on a lost race the commit rebases on the new
    head and retries.  Partition-disjoint writers therefore both land.

    Once refs exist, legacy commits ARE main-branch commits (base = main
    head, pointer advances) — the version-number CAS alone would otherwise
    stop detecting same-branch conflicts, because the global allocator
    hands concurrent writers different numbers."""
    if _has_refs(root):
        return branch_commit(root, MAIN, build, max_retries)
    for _ in range(max_retries):
        base = read_manifest(root)
        changed = build(base)
        nxt = {"version": base["version"] + 1,
               "partitions": {**base["partitions"], **changed}}
        if _publish(root, nxt):
            return nxt["version"]
    raise CommitConflict(f"lost {max_retries} commit races on {root}")


def commit_overwrite_partition(df: DataFrame, root: str,
                               partition: str,
                               bloom_key: bool = False,
                               branch: str | None = None) -> int:
    """Replace one partition's contents atomically (the nightly re-score
    unit).  Returns the committed version.  ``bloom_key=True`` additionally
    commits a per-file Bloom filter on the key column for ``read_snapshot``
    point-lookup skipping (one extra single-column read per file).
    ``branch`` commits onto that branch instead of the default head."""
    files = _write_data_files(df, root, bloom_key=bloom_key)
    build = lambda base: {partition: files}
    if branch is not None:
        return branch_commit(root, branch, build)
    return _retrying_commit(root, build)


def merge_scores(df: DataFrame, root: str, partition: str,
                 key: str = "route_id") -> int:
    """Row-level MERGE (the reference's ON CONFLICT DO UPDATE): source rows
    replace same-key rows of the partition, others are inserted.

    Reads the CURRENT snapshot of the partition inside the retry loop, so a
    rebased retry merges against the concurrent writer's rows instead of
    clobbering them — the anomaly the round-2 advice flagged for the
    directory-sequence stand-in.
    """
    spark = df.sparkSession
    src = df.localCheckpoint(eager=True)  # pin source rows across retries

    def build(base: dict) -> dict:
        entries = base["partitions"].get(partition, [])
        cur_files = [e for e in entries if not e.get("tombstone")]
        tombs = [e for e in entries if e.get("tombstone")]
        if cur_files:
            cur = spark.read.parquet(
                *[str(Path(root) / e["path"]) for e in cur_files])
            if tombs:  # apply deletion vectors before merging, else the
                # rewrite would resurrect rows deleted by delete_where
                dead = spark.read.parquet(
                    *[str(Path(root) / e["path"]) for e in tombs]) \
                    .select(key).distinct()
                cur = cur.join(F.broadcast(dead), key, "left_anti")
            keep = cur.join(src.select(key).distinct(), key, "left_anti")
            merged = keep.unionByName(src.select(*keep.columns))
        else:
            merged = src
        # the rewrite materializes the deletes: tombstones do not carry over
        return {partition: _write_data_files(merged, root)}

    return _retrying_commit(root, build)


def delete_where(spark: SparkSession, root: str, partition: str,
                 predicate, key: str = "route_id") -> int:
    """Row-level DELETE as merge-on-read deletion vectors (the Delta DV /
    Iceberg positional-delete analog, key-grain): commit a TOMBSTONE file
    listing the deleted keys instead of rewriting any data file.

    Why it matters at 100 TB: a GDPR-style delete of a handful of keys
    from a date partition otherwise rewrites the whole partition
    (``merge_scores``'s shape — O(partition)); a deletion vector writes
    O(deleted keys) and defers the rewrite to the next ``compact`` /
    ``merge_scores`` / ``cluster_zorder`` of that partition, all of which
    materialize the deletes and drop the tombstones.  Readers apply the
    tombstones as a broadcast anti-join (``read_snapshot``), so snapshot
    semantics, time travel, ``table_changes`` (the deletes surface as
    ``delete`` change rows) and vacuum's reference tracking all compose
    unchanged.

    ``predicate`` is a Column or SQL string evaluated against the
    partition's CURRENT snapshot inside the optimistic-commit loop (a
    rebased retry re-evaluates against the winner's rows).  No-op (current
    version returned) when the partition is missing or nothing matches."""
    pred = F.expr(predicate) if isinstance(predicate, str) else predicate

    def build(base: dict) -> dict:
        entries = base["partitions"].get(partition, [])
        if not [e for e in entries if not e.get("tombstone")]:
            return {}
        snap = read_snapshot(spark, root, version=base["version"],
                             partition=partition, key=key)
        dead = snap.filter(pred).select(key).distinct() \
                   .localCheckpoint(eager=True)
        if dead.isEmpty():
            return {}
        tomb = [{**e, "tombstone": True}
                for e in _write_data_files(dead, root, key=key)]
        return {partition: entries + tomb}

    def _noop_aware_commit():
        for _ in range(10):
            base = read_manifest(root)
            changed = build(base)
            if not changed:
                return base["version"]
            nxt = {"version": base["version"] + 1,
                   "partitions": {**base["partitions"], **changed}}
            if _publish(root, nxt):
                return nxt["version"]
        raise CommitConflict(f"lost 10 commit races on {root}")

    return _noop_aware_commit()


def vacuum(root: str, keep_versions: int = 1,
           grace_seconds: float = 600.0) -> list[str]:
    """Drop manifests older than the newest ``keep_versions`` and delete
    data files no surviving manifest references.  Returns removed files.

    Unreferenced files younger than ``grace_seconds`` (mtime) are KEPT: a
    concurrent writer materializes data files *before* publishing its
    manifest (the documented unreferenced-until-commit window, including
    ``merge_scores`` retry attempts), so a zero-grace vacuum could delete
    files whose manifest is about to publish — the Delta/Iceberg retention
    threshold exists for exactly this (r3 ADVICE item 1).  Pass
    ``grace_seconds=0`` only when the caller holds exclusive access."""
    import time
    cutoff = time.time() - grace_seconds
    head = current_version(root)
    keep = range(max(1, head - keep_versions + 1), head + 1)
    # named refs pin their versions (and those files) unconditionally: a
    # tag or a parked branch must stay readable through any vacuum
    ref_pins = {meta["version"] for meta in list_refs(root).values()}
    referenced: set[str] = set()
    for v in set(keep) | ref_pins:
        if v >= 1 and _manifest_path(root, v).exists():
            for files in read_manifest(root, v)["partitions"].values():
                referenced.update(e["path"] for e in files)
    removed, grace_kept = [], set()
    data = Path(root) / "data"
    if data.exists():
        for sub in data.iterdir():
            for p in sub.glob("*.parquet"):
                rel = str(p.relative_to(root))
                if rel not in referenced:
                    try:
                        if p.stat().st_mtime > cutoff:
                            grace_kept.add(rel)
                            continue  # inside an in-flight commit's window
                    except OSError:
                        continue  # already gone (concurrent vacuum)
                    p.unlink()
                    removed.append(rel)
            if not any(sub.iterdir()):
                sub.rmdir()
    for v in range(1, keep.start):
        if v in ref_pins:
            continue  # a ref points here — manifest must survive
        mp = _manifest_path(root, v)
        if not mp.exists():
            continue
        # keep the old manifest while the grace window protects any of its
        # files — time travel to it must stay consistent until then
        vfiles = {e["path"] for files in
                  read_manifest(root, v)["partitions"].values() for e in files}
        if vfiles & grace_kept:
            continue
        mp.unlink()
    return sorted(removed)


def compact(spark: SparkSession, root: str, partition: str,
            target_files: int = 4) -> int:
    """OPTIMIZE analog: rewrite one partition's current snapshot as
    ``target_files`` files and commit the swap atomically.

    Readers are never disturbed — they hold whichever manifest version they
    opened (old files persist until ``vacuum``), and a concurrent MERGE that
    wins the version race simply makes this compaction rebase and rewrite
    on top of it.  A missing/empty partition is a no-op returning the
    current version — committing the empty-table fallback's degenerate
    schema over a real partition was the r3 ADVICE item 2 hazard.  Returns
    the committed version."""
    m = read_manifest(root)
    if not m["partitions"].get(partition):
        return m["version"]
    cur = read_snapshot(spark, root, partition=partition) \
        .drop("prediction_date").coalesce(target_files) \
        .localCheckpoint(eager=True)
    return commit_overwrite_partition(cur, root, partition)


ZORDER_BITS = 12  # per-dimension quantization width (2 cols -> 24-bit z)


def _zvalue(cols: list, bounds: list[tuple[float, float]],
            bits: int = ZORDER_BITS):
    """Bit-interleaved Morton code over quantized columns (Column expr).

    Each column is linearly quantized to ``bits`` bits against its
    [lo, hi] data bounds, then the bit planes are interleaved so that
    lexicographic order on the z-value approximates locality in EVERY
    dimension at once — the property that makes per-file min/max tight on
    all clustered columns simultaneously."""
    q = []
    for c, (lo, hi) in zip(cols, bounds):
        span = (hi - lo) or 1.0
        scaled = (c - F.lit(float(lo))) / F.lit(float(span)) \
            * F.lit((1 << bits) - 1)
        q.append(F.round(scaled, 0).cast("long"))
    z = F.lit(0).cast("long")
    n = len(q)
    for b in range(bits):
        for i, qc in enumerate(q):
            z = z + (F.shiftright(qc, b) % 2) * F.lit(1 << (b * n + i))
    return z


def cluster_zorder(spark: SparkSession, root: str, partition: str,
                   cols: tuple[str, ...], target_files: int = 8) -> int:
    """OPTIMIZE ZORDER BY analog: rewrite one partition's snapshot ordered
    by the Morton interleave of ``cols`` and commit the swap atomically,
    recording per-file min/max for every clustered column in the manifest.

    Generalizes ``sinks.write_zordered`` (fixed lat/lon geo-bounds, plain
    directory write, row-group-level skipping only) to arbitrary column
    sets with data-driven bounds INSIDE the transactional format, where
    the manifest's per-column ranges let ``read_snapshot(cols_between=…)``
    prune whole files without opening a footer.

    Why it matters at 100 TB: ``compact``/linear sort makes ONE column's
    per-file ranges tight — a 2-D predicate (lat box x lon box, the radius
    scan S2's shape) still opens every file for the dominant column's
    range.  Z-ordering bounds every clustered column's per-file range to
    ~|domain| / target_files^(1/n_cols), so ``read_snapshot(cols_between=
    {...})`` prunes multiplicatively across dimensions.  The rewrite is one
    range-exchange on the z-value (repartitionByRange = sample + range
    shuffle, no skew pile-up on hot cells); bounds come from one bounded
    4-scalar aggregate.  Concurrency story is compact()'s: losing a commit
    race rebases and rewrites on the winner's rows."""
    m = read_manifest(root)
    if not m["partitions"].get(partition):
        return m["version"]
    cur = read_snapshot(spark, root, partition=partition) \
        .drop("prediction_date")
    agg = cur.agg(*[f(F.col(c)).alias(f"{f.__name__}_{c}")
                    for c in cols for f in (F.min, F.max)]).collect()[0]
    bounds = [(float(agg[f"min_{c}"]), float(agg[f"max_{c}"]))
              for c in cols]
    z = _zvalue([F.col(c) for c in cols], bounds)
    clustered = (cur.withColumn("_z", z)
                    .repartitionByRange(target_files, "_z")
                    .sortWithinPartitions("_z")
                    .drop("_z")
                    .localCheckpoint(eager=True))
    files = _write_data_files(clustered, root, stats_cols=tuple(cols))
    return _retrying_commit(root, lambda base: {partition: files})


def table_changes(spark: SparkSession, root: str, v_from: int, v_to: int,
                  key: str = "route_id",
                  include_preimages: bool = False) -> DataFrame:
    """Row-level change feed between two committed versions (the Delta
    CDF / Iceberg incremental-read analog): returns the rows that were
    inserted, updated, or deleted going v_from -> v_to, tagged
    ``_change_type`` in {'insert', 'update_postimage', 'delete'}.

    Two-level pruning before any row comparison:
    * partitions whose manifest file lists are IDENTICAL between the two
      versions are skipped outright (a merge/compact/zorder rewrites the
      partitions it touches, so an unchanged file list proves unchanged
      rows) — the manifest diff is metadata-only;
    * within a changed partition, the old and new snapshots are compared
      by a full outer join on ``key``: new-only keys are inserts,
      old-only keys are deletes, and both-sides keys are updates only
      when any non-key column differs.

    The downstream consumer cost is therefore O(changed partitions), not
    O(table) — the property that makes incremental consumption viable on
    a table where the nightly job rewrites one date partition of
    thousands.  Deterministic: no timestamps, versions are the cursor.

    ``include_preimages=True`` additionally emits an
    ``update_preimage``-tagged row (the OLD values) for every updated
    key — the Delta CDF four-type contract.  Pre-images are what make
    the feed ALGEBRAICALLY consumable: an incremental aggregate
    maintainer adds post-images and subtracts pre-images/deletes
    (``streaming.txlog_source.incremental_sum_delta``) without ever
    re-reading the table."""
    m_from, m_to = read_manifest(root, v_from), read_manifest(root, v_to)
    p_from, p_to = m_from["partitions"], m_to["partitions"]
    changed = [p for p in set(p_from) | set(p_to)
               if [e["path"] for e in p_from.get(p, [])]
               != [e["path"] for e in p_to.get(p, [])]]
    out = None
    for part in sorted(changed):
        old = read_snapshot(spark, root, version=v_from, partition=part,
                            key=key)
        new = read_snapshot(spark, root, version=v_to, partition=part,
                            key=key)
        # align schemas: a partition absent in one version yields the
        # single-key fallback frame; compare on the union of columns
        cols = [c for c in new.columns if c != "prediction_date"] \
            if len(new.columns) > 2 else \
            [c for c in old.columns if c != "prediction_date"]
        value_cols = [c for c in cols if c != key]
        o = old.select(*[F.col(c).alias(f"_o_{c}") for c in cols]) \
            if set(cols) <= set(old.columns) else None
        n = new.select(*cols) if set(cols) <= set(new.columns) else None
        if o is None:  # partition newly created: all inserts
            delta = new.select(*cols).withColumn(
                "_change_type", F.lit("insert"))
        elif n is None:  # partition dropped: all deletes
            delta = old.select(*cols).withColumn(
                "_change_type", F.lit("delete"))
        else:
            j = n.join(o, F.col(key) == F.col(f"_o_{key}"), "full_outer")
            diff = F.lit(False)
            for c in value_cols:
                diff = diff | ~F.col(c).eqNullSafe(F.col(f"_o_{c}"))
            tag = (F.when(F.col(f"_o_{key}").isNull(), "insert")
                    .when(F.col(key).isNull(), "delete")
                    .when(diff, "update_postimage"))
            picked = [F.coalesce(F.col(c), F.col(f"_o_{c}")).alias(c)
                      for c in cols]
            delta = (j.withColumn("_change_type", tag)
                      .filter(F.col("_change_type").isNotNull())
                      .select(*picked, "_change_type"))
            if include_preimages:
                pre = (j.filter(F.col(key).isNotNull()
                                & F.col(f"_o_{key}").isNotNull() & diff)
                        .select(*[F.col(f"_o_{c}").alias(c) for c in cols])
                        .withColumn("_change_type",
                                    F.lit("update_preimage")))
                delta = delta.unionByName(pre)
        delta = delta.withColumn("_partition", F.lit(part))
        out = delta if out is None else out.unionByName(delta)
    if out is None:
        return spark.createDataFrame(
            [], f"{key} bigint, _change_type string, _partition string")
    return out


def restore_table(root: str, version: int) -> int:
    """RESTORE TABLE TO VERSION analog: republish version ``version``'s
    partition mapping as a NEW head version (no data movement — manifests
    are pointers), so the rollback is itself an auditable commit and time
    travel to the bad interval keeps working until ``vacuum``.  Goes
    through the optimistic-commit loop, so a concurrent writer cannot be
    silently clobbered: the restore lands on top of whatever won."""
    target = read_manifest(root, version)["partitions"]

    def build(base: dict) -> dict:
        # replace the whole mapping: partitions created after `version`
        # must revert to absent, which the merge in _retrying_commit can't
        # express additively — so return every key, absent ones as []
        return {p: target.get(p, []) for p in
                set(base["partitions"]) | set(target)}

    return _retrying_commit(root, build)


# --- Named refs: branches and tags (Iceberg-style) ----------------------------
# A ref is a named pointer into the version log: TAGS are immutable (pin a
# snapshot for audits/releases), BRANCHES move under commits (staging /
# experiment isolation: writers on a branch never change what default
# readers see until a fast-forward).  All snapshots share ONE global
# version allocator; branch history is a DAG recorded by each manifest's
# ``parent`` field.  Ref updates reuse the hard-link CAS primitive of
# ``_publish`` (a per-ref entry log), so concurrent same-branch commits
# conflict-and-retry exactly like version commits — no locks anywhere.
#
# Backward compatibility: a table with NO refs behaves exactly as before
# (default read = max version).  Creating the first ref materializes
# ``main`` at the current head; from then on default reads resolve
# ``main`` and legacy writers advance it.

MAIN = "main"


def _refs_dir(root: str) -> Path:
    return _log_dir(root) / "refs"


def _has_refs(root: str) -> bool:
    d = _refs_dir(root)
    return d.exists() and any(d.iterdir())


def list_refs(root: str) -> dict[str, dict]:
    """{name: {'version': v, 'type': 'branch'|'tag'}} for every ref."""
    out: dict[str, dict] = {}
    d = _refs_dir(root)
    if not d.exists():
        return out
    for sub in sorted(d.iterdir()):
        if sub.is_dir():
            _, meta = _ref_head_meta(root, sub.name)
            out[sub.name] = meta
    return out


def _ref_head_meta(root: str, name: str) -> tuple[int, dict]:
    d = _refs_dir(root) / name
    ks = [int(p.stem[1:]) for p in d.glob("v*.json")] if d.exists() else []
    if not ks:
        raise KeyError(f"no such ref: {name!r}")
    k = max(ks)
    return k, json.loads((d / f"v{k}.json").read_text())


def resolve_ref(root: str, name: str) -> int:
    """Version a ref currently points at."""
    return _ref_head_meta(root, name)[1]["version"]


def _ref_publish(root: str, name: str, entry: int, version: int,
                 ref_type: str) -> bool:
    d = _refs_dir(root) / name
    d.mkdir(parents=True, exist_ok=True)
    tmp = d / f".tmp-{uuid.uuid4().hex}"
    tmp.write_text(json.dumps({"version": version, "type": ref_type}))
    try:
        os.link(tmp, d / f"v{entry}.json")
        return True
    except FileExistsError:
        return False
    finally:
        tmp.unlink()


def _ensure_main(root: str) -> None:
    """Materialize ``main`` at the current head on first ref creation."""
    try:
        _ref_head_meta(root, MAIN)
    except KeyError:
        _ref_publish(root, MAIN, 1, current_version(root), "branch")


def create_tag(root: str, name: str, version: int | None = None) -> int:
    """Immutable named snapshot pointer; errors if the name exists."""
    _ensure_main(root)
    v = current_version(root) if version is None else version
    if (_refs_dir(root) / name).exists():
        raise ValueError(f"ref exists: {name!r}")
    _ref_publish(root, name, 1, v, "tag")
    return v


def create_branch(root: str, name: str, version: int | None = None) -> int:
    """Movable branch pointer starting at ``version`` (default: head)."""
    _ensure_main(root)
    v = (resolve_ref(root, MAIN) if version is None else version)
    if (_refs_dir(root) / name).exists():
        raise ValueError(f"ref exists: {name!r}")
    _ref_publish(root, name, 1, v, "branch")
    return v


def branch_commit(root: str, name: str, build,
                  max_retries: int = 10) -> int:
    """Optimistic commit ON A BRANCH: base = the branch head's manifest,
    the new manifest records ``parent``/``branch``, and the branch pointer
    advances via the ref CAS.  A lost pointer race orphans the published
    manifest (vacuum collects it) and rebases."""
    for _ in range(max_retries):
        entry, meta = _ref_head_meta(root, name)
        if meta.get("type") == "tag":
            raise ValueError(f"cannot commit to tag {name!r}")
        base = read_manifest(root, meta["version"])
        changed = build(base)
        published = None
        for _ in range(max_retries):
            v = current_version(root) + 1
            nxt = {"version": v, "parent": meta["version"], "branch": name,
                   "partitions": {**base["partitions"], **changed}}
            if _publish(root, nxt):
                published = v
                break
        if published is None:
            break
        if _ref_publish(root, name, entry + 1, published, "branch"):
            return published
        # branch pointer lost to a concurrent same-branch writer: the
        # published manifest is unreachable; rebase on the winner
    raise CommitConflict(f"lost {max_retries} branch races on {name!r}")


def fast_forward(root: str, name: str = MAIN, to_ref: str | None = None,
                 to_version: int | None = None) -> int:
    """Publish another ref's state onto branch ``name`` (the publish step
    of a branch workflow).  This creates a NEW commit on ``name`` whose
    partition mapping equals the source snapshot (no data movement —
    manifests are pointers), rather than moving the pointer backwards in
    version-number space: the merge is therefore auditable, and the
    commit-grain streaming source's monotone version cursor surfaces it
    like any other main commit."""
    v = resolve_ref(root, to_ref) if to_ref else to_version
    if v is None:
        raise ValueError("need to_ref or to_version")
    target = read_manifest(root, v)["partitions"]

    def build(base: dict) -> dict:
        # full replacement (partitions absent in the source revert to [])
        return {p: target.get(p, []) for p in
                set(base["partitions"]) | set(target)}

    return branch_commit(root, name, build)


def main_lineage_versions(root: str) -> list[int]:
    """Ascending versions that belong to main: manifests with no branch
    field (pre-ref history) or branch == 'main', plus any version main
    was fast-forwarded to."""
    head = current_version(root)
    keep = []
    # every version main has EVER pointed at (the ref entry log) counts:
    # a historical fast-forward target carries a foreign branch label but
    # was main's head at the time
    ff = set()
    d = _refs_dir(root) / MAIN
    if d.exists():
        for p in d.glob("v*.json"):
            ff.add(json.loads(p.read_text())["version"])
    for v in range(1, head + 1):
        if not _manifest_path(root, v).exists():
            continue
        m = read_manifest(root, v)
        if m.get("branch", MAIN) == MAIN or v in ff:
            keep.append(v)
    return keep
