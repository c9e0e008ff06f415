"""Keyed-table MERGE over partitioned parquet — the lakehouse
``MERGE INTO`` analog (Delta/Iceberg upsert) from plain Spark
primitives, with copy-on-write restricted to partitions that contain
changed keys.

Why this exists at 100 TB: plain parquet cannot update a row, and
rewriting the whole table per correction batch is O(table). Here a
merge reads ONLY the partitions named by the updates (manifest-pruned —
no scan even touches the others), anti-joins the changed keys, writes
the merged partitions into a FRESH version dir, and atomically swaps a
manifest that maps every partition value to its current directory —
changed partitions point into the new version, untouched partitions
keep pointing at their existing files. Write amplification per merge is
O(partitions touched), crash safety is the manifest rename (same
discipline as the continuous rollup and tag-index manifests, whose
``_publish`` this module reuses).

Layout::

    table_dir/
      _LATEST                       <- {"meta": ..., "snapshot": N, "partitions": {val: rel}}
      _snapshots/snap-<N>.json      <- every published manifest, immutable
      v=<hex>/_pval=<value>/part-*.parquet

Every publish also lands an immutable numbered snapshot file, so
``read_table(..., snapshot=N)`` time-travels to any retained state —
audits ("what did the table say when the model trained?") and
reproducible re-runs read old snapshots while writers move on. Vacuum
keeps the versions referenced by the newest ``retain_snapshots``
manifests and deletes the older snapshot files with their orphaned
versions.

The partition column is duplicated into a shadow dir key (``_pval``) so
the real column survives inside the data files — reading a leaf
partition dir directly would otherwise lose it.
"""

from __future__ import annotations

import json
import os
import uuid
from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..streaming.rollup import _POINTER, _publish
from .cas import HardlinkSlotStore


class ConcurrentMergeError(RuntimeError):
    """Another writer committed a snapshot after this merge read its
    base state — the merge result would silently drop that writer's
    changes if published. Re-read and re-run the merge (the standard
    optimistic-concurrency retry, same single-winner contract as the
    fact store's conditional appends)."""


class SnapshotGoneError(ValueError):
    """A referenced snapshot manifest is missing — vacuumed away or
    never published. Distinct from other ValueErrors (wrong table,
    bad columns, non-summable dtypes) so recovery paths like
    ivm.refresh_materialized_aggregate(rebootstrap_on_gap=True) can
    rebootstrap on EXACTLY this condition instead of masking real
    configuration bugs behind a silent full recompute."""


def _read_manifest(table_dir: str, snapshot: int | None = None) -> dict | None:
    path = (
        os.path.join(table_dir, _POINTER)
        if snapshot is None
        else os.path.join(table_dir, "_snapshots", f"snap-{snapshot}.json")
    )
    try:
        with open(path, encoding="utf-8") as fh:
            raw = fh.read().strip()
    except FileNotFoundError:
        if snapshot is not None:
            raise SnapshotGoneError(
                f"snapshot {snapshot} not found (vacuumed or never published)"
            )
        return None
    m = json.loads(raw) if raw else None
    if m is not None and m.get("meta", {}).get("kind") != "merge_table":
        raise ValueError(f"{table_dir} is not a merge table")
    return m


def _max_snapshot_on_disk(table_dir: str) -> int:
    snap_dir = os.path.join(table_dir, "_snapshots")
    best = 0
    if os.path.isdir(snap_dir):
        for name in os.listdir(snap_dir):
            if name.startswith("snap-") and name.endswith(".json"):
                try:
                    best = max(best, int(name[len("snap-"):-len(".json")]))
                except ValueError:
                    pass
    return best


def _head_manifest(table_dir: str) -> dict | None:
    """The true head: the SNAPSHOT LOG is the source of truth, _LATEST
    is a cache — a writer that crashed between landing its snapshot and
    swapping the pointer must not be lost (or every later merge would
    conflict against its invisible commit forever)."""
    latest = _read_manifest(table_dir)
    disk_n = _max_snapshot_on_disk(table_dir)
    if disk_n > (latest.get("snapshot", 0) if latest else 0):
        head = _read_manifest(table_dir, disk_n)
        try:
            _publish(table_dir, head)  # opportunistic pointer repair
        except OSError:
            # read-only caller (or read-only mount): the repair is a
            # cache refresh, never a correctness requirement — serve
            # the true head regardless
            pass
        return head
    return latest


def _publish_snapshot(table_dir: str, manifest: dict, base_snapshot: int) -> dict:
    """Single-winner commit: the next snapshot file is claimed with the
    hardlink O_EXCL CAS (storage/cas.py). If snap-(base+1) already
    exists, another writer committed after this merge read its base —
    raising instead of publishing is what keeps two racing merges from
    silently losing one side's rows. The _LATEST swap after a won claim
    is cache maintenance, not the commit (see _head_manifest)."""
    snap_dir = os.path.join(table_dir, "_snapshots")
    os.makedirs(snap_dir, exist_ok=True)
    n = base_snapshot + 1
    manifest = dict(manifest, snapshot=n)
    store = HardlinkSlotStore(snap_dir)
    won = store.put_if_absent(
        f"snap-{n}.json", json.dumps(manifest, sort_keys=True).encode()
    )
    if not won:
        raise ConcurrentMergeError(
            f"merge based on snapshot {base_snapshot} lost to a concurrent "
            f"commit of snapshot {n}; re-read the table and re-run the merge"
        )
    _publish(table_dir, manifest)
    return manifest


def _require_unique_keys(df: DataFrame, key_cols: list[str], what: str) -> None:
    """One row per key is the table's invariant; a duplicate-key batch
    would make merge results order-dependent — fail loudly instead."""
    dup = (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"{what} has duplicate keys (e.g. "
            f"{tuple(dup[0][k] for k in key_cols)}); dedupe to one row per "
            "key (pick your winner explicitly) before merging"
        )


def validate_keyed_batch(df: DataFrame, key_cols, what: str, extra_aggs=None):
    """Single-pass keyed-batch validation core, shared by the merge and
    SCD2 layers: uniqueness (total count vs key-group count — groupBy
    puts null-keyed rows in one group, so null-keyed duplicates are
    counted, matching the old countDistinct(struct) probe) and null-key
    rejection (a null key field can never be matched by the merge
    anti-join — standard joins are not null-safe — so "upserting" it
    again would silently DUPLICATE the row instead of replacing it), in
    ONE aggregate job. r14: grouped two-level formulation instead of a
    global ``countDistinct`` — the distinct aggregate plans an Expand
    that doubles every input row entering the partial aggregate (guide
    §2.3, shuffle/scan fewer bytes); one exchange keyed by the batch
    keys computes the same counts exactly. ``extra_aggs`` (name ->
    aggregate Column, or ``(aggregate Column, final_combiner)``) ride
    the per-key-group pass and are combined across groups — the
    default combiner is ``F.max``, exact for the 0/1 indicator flags
    the callers pass; set-valued aggregates pass their own combiner.
    The returned Row carries them for the caller's own checks. The
    detailed duplicate probe (_require_unique_keys) runs only on the
    error path, to name an offending key."""
    null_key = reduce(lambda a, b: a | b, [F.col(c).isNull() for c in key_cols])
    extras = {
        k: (v if isinstance(v, tuple) else (v, F.max))
        for k, v in (extra_aggs or {}).items()
    }
    per_key = df.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("_kn"),
        F.max(F.when(null_key, 1).otherwise(0)).alias("_null_k"),
        *[agg.alias(f"_x_{k}") for k, (agg, _) in extras.items()],
    )
    row = per_key.agg(
        # coalesce: an EMPTY batch aggregates to one row of n=0, nk=0
        # (sum over zero groups is null; the old global agg said 0)
        F.coalesce(F.sum("_kn"), F.lit(0)).alias("n"),
        F.count(F.lit(1)).alias("nk"),
        F.max("_null_k").alias("null_k"),
        *[comb(F.col(f"_x_{k}")).alias(k) for k, (_, comb) in extras.items()],
    ).collect()[0]
    if row.null_k:
        raise ValueError(
            f"{what} has NULL key fields ({list(key_cols)}); null keys can "
            "never be re-matched by a merge (joins are not null-safe) — map "
            "them to a sentinel value upstream"
        )
    if row.n != row.nk:
        _require_unique_keys(df, key_cols, what)  # names the key; raises
        raise ValueError(f"{what} has duplicate keys")  # unreachable safety
    return row


def _validate_batch(
    df: DataFrame, key_cols: list[str], partition_col: str, what: str
) -> list[str]:
    """Merge-table batch validation: the shared keyed core plus
    null-partition rejection and the distinct partition values, all in
    the same single aggregate job."""
    row = validate_keyed_batch(
        df, key_cols, what,
        extra_aggs={
            "null_p": F.max(
                F.when(F.col(partition_col).isNull(), 1).otherwise(0)
            ),
            # per-key-group sets, combined by exact set union across
            # groups (order irrelevant: the caller sorts)
            "vals": (
                F.collect_set(F.col(partition_col).cast("string")),
                lambda c: F.array_distinct(F.flatten(F.collect_list(c))),
            ),
        },
    )
    if row.null_p:
        raise ValueError(f"{partition_col} must be non-null for merge tables")
    return sorted(row.vals)


# Partition-count ceiling for riding the manifest stats on the write
# job itself (observe): each partition value adds two aggregate
# columns to the plan, so very wide batches fall back to the read-back
# pass rather than bloating codegen.
_OBSERVE_STATS_MAX_PARTS = 64


def _write_version(
    df: DataFrame,
    table_dir: str,
    partition_col: str,
    sort_col: Column | None = None,
    stats_for: tuple[list, list] | None = None,
) -> tuple[str, dict | None]:
    """Write one version dir. With ``stats_for=(key_cols, vals)`` the
    per-partition manifest stats (row count + order-independent key
    hash) are computed by the SAME job that writes, via an Observation
    over the write plan — the batch is scanned once instead of written
    and then fully re-read (r14: the read-back was a whole extra pass
    over every written byte per merge; at scale it doubled merge I/O).
    Returns ``(version, stats | None)`` — None when stats did not ride
    the write (no ``stats_for``, or too many partition values) and the
    caller must fall back to the read-back pass."""
    version = f"v={uuid.uuid4().hex[:12]}"
    clustered = df.withColumn("_pval", F.col(partition_col).cast("string"))
    obs = None
    vals: list = []
    if stats_for is not None and len(stats_for[1]) <= _OBSERVE_STATS_MAX_PARTS:
        from pyspark.sql import Observation

        key_cols, vals = stats_for
        kh = F.xxhash64(*[F.col(k).cast("string") for k in key_cols]).cast(
            "decimal(38,0)"
        )
        aggs = []
        for i, v in enumerate(vals):
            cond = F.col("_pval") == F.lit(v)
            aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"n{i}"))
            aggs.append(F.sum(F.when(cond, kh)).alias(f"h{i}"))
        obs = Observation()
        clustered = clustered.observe(obs, *aggs)
    # Cluster by the partition key before the partitioned write
    # (SCALE.md rule #7): without it every shuffle partition writes
    # a sliver into every partition dir (measured 32 files where 1
    # suffices). One file per partition per version is the classic
    # CoW unit; a table whose single partitions outgrow one task
    # should range-repartition on (_pval, key) here instead.
    clustered = clustered.repartition(F.col("_pval"))
    if sort_col is not None:
        # in-partition clustering (compact_table's zorder_by): tight
        # ROW-GROUP stats on the sort expression inside each partition
        # file — the pruning grain below the one-file CoW unit. The
        # helper column is uuid-suffixed: a fixed name would silently
        # replace-and-drop a user column of the same name (withColumn
        # replaces case-insensitively; no reserved-name guard exists
        # for table columns beyond _pval).
        zc = f"_zsort_{uuid.uuid4().hex[:8]}"
        clustered = clustered.withColumn(zc, sort_col).sortWithinPartitions(
            "_pval", zc
        ).drop(zc)
    (
        clustered
        .write.mode("overwrite")
        .partitionBy("_pval")
        .parquet(os.path.join(table_dir, version))
    )
    if obs is None:
        return version, None
    try:
        got = obs.get
    except Exception:
        # The optimizer can eliminate the CollectMetrics node when the
        # written frame folds to an empty relation (e.g. a pure-delete
        # batch emptying its partitions), leaving the observation with
        # no metrics row. Fall back to the read-back stats pass — by
        # construction these are (near-)empty writes, so the fallback
        # re-reads little or nothing.
        return version, None
    stats = {}
    for i, v in enumerate(vals):
        n = got[f"n{i}"]
        if n:
            stats[v] = {"rows": int(n), "key_hash": str(got[f"h{i}"])}
    return version, stats


def _partition_stats(df: DataFrame, key_cols, partition_col: str) -> dict:
    """Per-partition row count + order-independent key hash (decimal
    sum of xxhash64 over the key columns) for the manifest: detects a
    lost, duplicated, or wrong-partition KEY at validation time. Value-
    level corruption detection is the parquet page checksums' job."""
    kh = F.xxhash64(*[F.col(k).cast("string") for k in key_cols])
    rows = (
        df.groupBy(F.col(partition_col).cast("string").alias("_p"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("rows"),
            F.sum(kh.cast("decimal(38,0)")).alias("key_hash"),
        )
        .collect()
    )
    return {r._p: {"rows": r.rows, "key_hash": str(r.key_hash)} for r in rows}


def _pval_dirs(table_dir: str, version: str) -> dict[str, str]:
    """Map partition VALUE -> the on-disk relative path the writer
    actually created for one version dir. Spark percent-escapes
    special characters ('/', '=', ':', '%', ...) in partition
    directory names, so a manifest built as f"_pval={value}" would
    point at a non-existent directory for any value needing escaping —
    record what was written, decoded back to the value."""
    from urllib.parse import unquote

    out = {}
    vdir = os.path.join(table_dir, version)
    if os.path.isdir(vdir):
        for name in os.listdir(vdir):
            if name.startswith("_pval="):
                out[unquote(name[len("_pval="):])] = os.path.join(version, name)
    return out


def create_table(
    df: DataFrame,
    table_dir: str,
    key_cols: list[str],
    partition_col: str,
) -> dict:
    """Initial full write + manifest publish. ``key_cols`` must be
    unique per row (checked); ``partition_col`` must be non-null (null
    partitions have no directory identity — map them to a sentinel
    value upstream)."""
    vals = _validate_batch(df, key_cols, partition_col, "create_table input")
    os.makedirs(table_dir, exist_ok=True)
    version, stats = _write_version(
        df, table_dir, partition_col, stats_for=(list(key_cols), vals)
    )
    if stats is None:  # wide batch: stats could not ride the write
        stats = _partition_stats(
            _read_version_df(df.sparkSession, table_dir, version, df.schema),
            key_cols,
            partition_col,
        )
    manifest = {
        "meta": {
            "kind": "merge_table",
            "key_cols": list(key_cols),
            "partition_col": partition_col,
            # The table's authoritative column set (ordered). Schema
            # checks in merge_upsert validate every batch against THIS,
            # not against whichever partitions the batch happens to
            # touch — a batch landing only on fresh partition values
            # must pass the same add-only evolution rules.
            "columns": list(df.columns),
        },
        # one read-back pass yields BOTH the partition map and its
        # stats; paths come from what the writer actually created
        # (Spark escapes special chars in partition dir names)
        "partitions": {v: _pval_dirs(table_dir, version)[v] for v in stats},
        "stats": stats,
    }
    return _publish_snapshot(table_dir, manifest, base_snapshot=0)


def read_table(
    spark: SparkSession, table_dir: str, snapshot: int | None = None
) -> DataFrame | None:
    """The current table — or, with ``snapshot=N``, the table exactly
    as published at snapshot N (time travel; raises if N was vacuumed).
    Reads only manifest-named directories; a crashed (unpublished)
    merge's version dir is invisible."""
    m = _head_manifest(table_dir) if snapshot is None else _read_manifest(table_dir, snapshot)
    if not m or not m["partitions"]:
        return None
    paths = [os.path.join(table_dir, rel) for rel in m["partitions"].values()]
    # mergeSchema: partitions written before a schema-evolving merge
    # lack the new columns; without it Spark picks one file's schema
    # arbitrarily and silently drops columns from the others.
    return spark.read.option("mergeSchema", "true").parquet(*paths)


def merge_upsert(
    updates: DataFrame,
    table_dir: str,
    delete_col: str | None = None,
    merge_schema: bool = False,
    base_manifest: dict | None = None,
) -> dict:
    """Upsert (and optionally delete) by key: rows whose key exists are
    replaced, new keys are inserted, and — when ``delete_col`` names a
    boolean column — rows flagged true are removed instead. Only
    partitions present in ``updates`` are read or rewritten; a key's
    partition value must not change across merges (that is an
    anti-join miss in its OLD partition — reassignments must be a
    delete in the old partition plus an insert in the new one, stated
    loudly here rather than silently duplicating). With
    ``merge_schema=True`` the update batch may carry NEW columns
    (existing rows read back null there — parquet schema merge across
    versions); without it a new column is an analysis error, never a
    silent drop.

    ``base_manifest`` pins the snapshot this merge is BASED on. Pass it
    when the batch was DERIVED from a read of the table (read-modify-
    write, e.g. scd2_upsert computing interval closes from the open
    rows): if another writer commits after that read, the snapshot CAS
    fails with :class:`ConcurrentMergeError` instead of publishing rows
    computed against stale state. Plain last-writer-wins upserts (the
    batch is self-contained truth per key) can keep the default
    head-read base."""
    m = base_manifest if base_manifest is not None else _head_manifest(table_dir)
    if m is None:
        raise ValueError(f"{table_dir} has no published manifest; create_table first")
    meta = m["meta"]
    key_cols, partition_col = meta["key_cols"], meta["partition_col"]
    spark = updates.sparkSession
    vals = _validate_batch(updates, key_cols, partition_col, "merge_upsert updates")
    if not vals:
        return m
    prev_paths = [
        os.path.join(table_dir, m["partitions"][v]) for v in vals if v in m["partitions"]
    ]
    deletes = None
    if delete_col is not None:
        deletes = updates.filter(F.col(delete_col))
        updates = updates.filter(~F.col(delete_col) | F.col(delete_col).isNull())
        updates = updates.drop(delete_col)
        deletes = deletes.drop(delete_col)
    # Schema discipline runs against the MANIFEST's column set, never
    # against whichever partitions the batch happens to touch — a batch
    # landing only on fresh partition values gets the exact same
    # add-only checks (the prev_paths-empty bypass was a silent
    # cross-partition schema-divergence hole). Legacy manifests written
    # before meta carried "columns" fall back to the data files.
    table_cols = meta.get("columns")
    if table_cols is None and m["partitions"]:
        current = read_table(spark, table_dir)
        table_cols = list(current.columns) if current is not None else None
    if table_cols is not None:
        known = set(table_cols)
        new_cols = [c for c in updates.columns if c not in known]
        if new_cols and not merge_schema:
            raise ValueError(
                f"update batch adds columns {sorted(new_cols)}; pass "
                "merge_schema=True to evolve the table schema (old rows "
                "read back null there) — silent drops are not an option"
            )
        # Schema evolution is ADD-only: a batch missing an EXISTING
        # column would null it out on every updated row via
        # allowMissingColumns — that is data loss, not evolution, and
        # it fails loudly on both paths. Exception: a PURE-DELETE batch
        # (every row flagged) legitimately carries only key/partition/
        # delete columns — deletes never write row data.
        missing = [c for c in table_cols if c not in set(updates.columns)]
        pure_delete = bool(missing) and deletes is not None and not updates.take(1)
        if missing and not pure_delete:
            raise ValueError(
                f"update batch is missing existing table columns "
                f"{sorted(missing)}; carry every current column (nulls "
                "are fine) — omitting one would silently erase it on "
                "updated rows"
            )
        # pure-delete batches never write row data, so they never
        # evolve the schema either
        final_cols = table_cols if pure_delete else table_cols + new_cols
    else:
        new_cols, pure_delete = [], False
        final_cols = list(updates.columns)
    if prev_paths:
        prev = spark.read.option("mergeSchema", "true").parquet(*prev_paths)
        changed_keys = updates.select(*key_cols)
        if deletes is not None:
            changed_keys = changed_keys.unionByName(deletes.select(*key_cols))
        keep = prev.join(changed_keys, key_cols, "left_anti")
        if pure_delete:
            merged = keep
        else:
            # allowMissingColumns covers BOTH directions of legitimate
            # drift: keep partitions written before an evolution lack
            # the new columns, and an evolving batch adds them — the
            # column-set contract was already enforced above, so any
            # remaining mismatch here is schema history, not data loss.
            merged = keep.unionByName(
                updates.select(*final_cols), allowMissingColumns=True
            )
    else:
        merged = updates.limit(0) if pure_delete else updates.select(*final_cols)
    version, new_stats = _write_version(
        merged, table_dir, partition_col, stats_for=(list(key_cols), vals)
    )
    new_manifest = {
        "meta": dict(meta, columns=final_cols),
        "partitions": dict(m["partitions"]),
        "stats": dict(m.get("stats", {})),
    }
    if new_stats is None:  # wide batch: stats could not ride the write
        written = _read_version_df(spark, table_dir, version, merged.schema)
        new_stats = _partition_stats(written, key_cols, partition_col)
    merged_vals = set(new_stats)
    dirmap = _pval_dirs(table_dir, version)
    for v in vals:
        if v in merged_vals:
            new_manifest["partitions"][v] = dirmap[v]
            new_manifest["stats"][v] = new_stats[v]
        else:
            # every row of the partition was deleted
            new_manifest["partitions"].pop(v, None)
            new_manifest["stats"].pop(v, None)
    return _publish_snapshot(table_dir, new_manifest, base_snapshot=m["snapshot"])


def _read_version_df(spark, table_dir: str, version: str, schema) -> DataFrame:
    """Read back one version dir with the writer's schema (schema
    inference would fail on a zero-row write) — manifest stats must
    hash the WRITTEN files, not the plan that produced them."""
    keep = [f for f in schema.fields if f.name != "_pval"]
    from pyspark.sql.types import StructType

    return spark.read.schema(StructType(keep)).parquet(
        os.path.join(table_dir, version)
    )


def validate_table(spark: SparkSession, table_dir: str) -> dict:
    """Loader-side integrity check: recompute per-partition row counts
    and key hashes from the manifest-named files and compare — catches
    a lost/duplicated/misplaced key before anything consumes the table.
    Returns {"ok": bool, "problems": [...]}. Validates the TRUE head
    (snapshot log, not the _LATEST pointer cache) so a writer that
    crashed between the snapshot CAS and the pointer swap is validated
    against its committed state, not the stale predecessor."""
    m = _head_manifest(table_dir)
    if m is None:
        raise ValueError(f"{table_dir} has no published manifest")
    meta = m["meta"]
    problems = []
    # Driver-side pre-checks, then ONE Spark job per VERSION dir (not
    # per partition): reading a version with basePath set parses the
    # _pval directory name back as a column, so the stats aggregate
    # groups by DIRECTORY identity — a row sitting in the wrong
    # partition dir is counted where it physically lives, exactly what
    # the per-dir F.lit(v) loop asserted, at 1/N the job count (a
    # compacted table validates in a single aggregate).
    by_version: dict[str, list[str]] = {}
    for v, want in m.get("stats", {}).items():
        rel = m["partitions"].get(v)
        if rel is None:
            problems.append(f"partition {v}: stats but no directory mapping")
            continue
        if not os.path.isdir(os.path.join(table_dir, rel)):
            problems.append(f"partition {v}: directory missing on disk")
            continue
        by_version.setdefault(rel.split(os.sep, 1)[0], []).append(v)
    got_stats: dict[str, dict] = {}
    # Partition-type inference OFF for these reads: the manifest keys
    # are the partition values AS STRINGS, and inference would parse
    # _pval=007 as int 7 or _pval=1.50 as 1.5 — a false stats mismatch
    # on any numeric-looking string value. Discovery runs eagerly at
    # read() time, so the conf toggle is scoped to this loop.
    inf_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    prev_inf = spark.conf.get(inf_key, None)
    spark.conf.set(inf_key, "false")
    try:
        for version, vals in by_version.items():
            paths = [os.path.join(table_dir, m["partitions"][v]) for v in vals]
            df = (
                spark.read.option("mergeSchema", "true")
                .option("basePath", os.path.join(table_dir, version))
                .parquet(*paths)
            )
            # the parsed _pval column IS the directory identity; feed
            # it to the shared stats aggregate as the partition column
            got_stats.update(
                _partition_stats(
                    df.withColumn(
                        meta["partition_col"], F.col("_pval").cast("string")
                    ).drop("_pval"),
                    meta["key_cols"],
                    meta["partition_col"],
                )
            )
    finally:
        if prev_inf is None:
            spark.conf.unset(inf_key)
        else:
            spark.conf.set(inf_key, prev_inf)
    for v, want in m.get("stats", {}).items():
        if v not in {p for vs in by_version.values() for p in vs}:
            continue  # already reported as a mapping/dir problem
        got = got_stats.get(v)
        if got is None:
            problems.append(f"partition {v}: no rows on disk")
        elif got["rows"] != want["rows"] or got["key_hash"] != want["key_hash"]:
            problems.append(
                f"partition {v}: rows/key_hash mismatch "
                f"(disk {got} vs manifest {want})"
            )
    for v in m["partitions"]:
        if v not in m.get("stats", {}):
            problems.append(f"partition {v}: no stats in manifest")
    return {"ok": not problems, "problems": problems}


def vacuum_table(
    table_dir: str,
    retain_seconds: float = 3600.0,
    retain_snapshots: int = 1,
) -> dict:
    """Delete version dirs referenced by NO retained snapshot and idle
    longer than ``retain_seconds`` (grace for in-flight readers; aged
    by the newest mtime under the version so an unpublished in-progress
    merge is never reaped). ``retain_snapshots`` newest snapshots stay
    time-travelable; older snapshot files are removed with their
    orphaned versions — the standard retention/time-travel trade,
    chosen explicitly by the operator."""
    import shutil
    import time

    m = _head_manifest(table_dir) or {"partitions": {}, "snapshot": 0}
    head = m.get("snapshot", 0)
    keep_snaps = {n for n in range(head - max(retain_snapshots, 1) + 1, head + 1) if n >= 1}
    live = set()
    snap_dir = os.path.join(table_dir, "_snapshots")
    removed_snaps = []
    if os.path.isdir(snap_dir):
        for name in sorted(os.listdir(snap_dir)):
            if not (name.startswith("snap-") and name.endswith(".json")):
                continue
            try:
                n = int(name[len("snap-"):-len(".json")])
            except ValueError:
                continue
            if n in keep_snaps:
                snap = _read_manifest(table_dir, n)
                live |= {
                    rel.split(os.sep, 1)[0] for rel in snap["partitions"].values()
                }
            else:
                os.remove(os.path.join(snap_dir, name))
                removed_snaps.append(n)
    live |= {rel.split(os.sep, 1)[0] for rel in m["partitions"].values()}
    now = time.time()
    removed = []
    for name in os.listdir(table_dir):
        if not name.startswith("v=") or name in live:
            continue
        path = os.path.join(table_dir, name)
        try:
            newest = os.path.getmtime(path)
            for root, _dirs, files in os.walk(path):
                for f in files:
                    try:
                        newest = max(newest, os.path.getmtime(os.path.join(root, f)))
                    except OSError:
                        pass
            if now - newest <= retain_seconds:
                continue
        except OSError:
            continue
        shutil.rmtree(path, ignore_errors=True)
        removed.append(name)
    return {
        "removed": removed,
        "removed_snapshots": removed_snaps,
        "live": sorted(live),
        "retained_snapshots": sorted(keep_snaps),
    }


def compact_table(
    spark: SparkSession,
    table_dir: str,
    partitions: list | None = None,
    zorder_by: list[str] | None = None,
) -> dict:
    """Rewrite live partitions into ONE fresh version dir — the
    OPTIMIZE / rewrite-data-files analog for this layout. Every merge
    is copy-on-write per partition, so after many narrow merges the
    live table is scattered across as many version dirs as there were
    distinct write batches: each read opens every one of them, vacuum
    can reclaim nothing (every dir still carries some live partition),
    and partitions written before a schema evolution still lack the
    evolved columns on disk (papered over per-read by mergeSchema).
    Compaction rewrites the selected partitions (default: all live)
    into a single version, materializing the merged schema as typed
    nulls, then publishes through the SAME snapshot CAS as any merge —
    a concurrent writer wins cleanly (ConcurrentMergeError; compaction
    is stateless and retryable), never silently loses rows.

    Content contract, enforced in-operator: the manifest's
    per-partition stats (row count + order-independent key hash) are
    layout-independent, so the rewritten files must reproduce them
    EXACTLY; any drift raises and the new version dir is abandoned
    unpublished (invisible to readers, reclaimed by vacuum).

    Shape at 100 TB: pass ``partitions`` to compact incrementally (the
    cold tail first — hot partitions get rewritten by their next merge
    anyway); the rewrite is one cluster-by-partition shuffle of
    exactly the selected bytes, no driver data path.

    ``zorder_by=[c1, c2]`` additionally clusters rows INSIDE each
    partition file by the z-curve of the two columns (equi-depth-rank
    Morton interleave — operators/layout.py:zorder_col), so
    conjunctive predicates on both columns prune at the row-group
    grain within the one-file-per-partition CoW unit: the
    OPTIMIZE ... ZORDER BY analog. Layout-only — the stats-equality
    contract below still certifies the content unchanged."""
    m = _head_manifest(table_dir)
    if m is None:
        raise ValueError(f"{table_dir} has no published manifest; create_table first")
    meta = m["meta"]
    key_cols, partition_col = meta["key_cols"], meta["partition_col"]
    if partitions is None:
        vals = sorted(m["partitions"])
    else:
        vals = [str(p) for p in partitions if str(p) in m["partitions"]]
    versions_before = sorted(
        {rel.split(os.sep, 1)[0] for rel in m["partitions"].values()}
    )
    if not vals:
        return {
            "snapshot": m["snapshot"],
            "compacted": [],
            "versions_before": len(versions_before),
            "versions_after": len(versions_before),
        }
    paths = [os.path.join(table_dir, m["partitions"][v]) for v in vals]
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    # canonical column order = the manifest's schema history; columns
    # evolved in partitions OUTSIDE this subset stay absent from these
    # files (no dtype to conjure) — a later full compaction or their
    # own next merge normalizes them
    cols = meta.get("columns") or list(df.columns)
    ordered = [c for c in cols if c in df.columns] + [
        c for c in df.columns if c not in cols
    ]
    sort_col = None
    if zorder_by is not None:
        from ..operators.layout import zorder_col

        missing = [c for c in zorder_by if c not in df.columns]
        if missing:
            raise ValueError(f"compact_table: zorder_by columns {missing} not in table")
        sort_col = zorder_col(df, zorder_by)
    # compaction keeps the post-write READ-BACK: the stats-equality
    # contract below certifies the REWRITTEN files reproduce the
    # manifest, which an observation over the write plan cannot attest
    version, _ = _write_version(
        df.select(*ordered), table_dir, partition_col, sort_col=sort_col
    )
    written = _read_version_df(spark, table_dir, version, df.select(*ordered).schema)
    new_stats = _partition_stats(written, key_cols, partition_col)
    old_stats = m.get("stats", {})
    for v in vals:
        want, got = old_stats.get(v), new_stats.get(v)
        if want is not None and got != want:
            raise RuntimeError(
                f"compaction stats drift for partition {v}: wrote {got}, "
                f"manifest says {want} — version {version} left unpublished"
            )
    dirmap = _pval_dirs(table_dir, version)
    new_manifest = {
        "meta": dict(meta),
        "partitions": dict(m["partitions"]),
        "stats": dict(old_stats),
    }
    for v in vals:
        new_manifest["partitions"][v] = dirmap[v]
        new_manifest["stats"][v] = new_stats[v]
    published = _publish_snapshot(table_dir, new_manifest, base_snapshot=m["snapshot"])
    versions_after = sorted(
        {rel.split(os.sep, 1)[0] for rel in published["partitions"].values()}
    )
    return {
        "snapshot": published["snapshot"],
        "compacted": vals,
        "versions_before": len(versions_before),
        "versions_after": len(versions_after),
    }


def start_merge_stream(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    delete_col: str | None = None,
    available_now: bool = False,
    max_retries: int = 10,
):
    """Continuously upsert a stream into a merge table: foreachBatch
    merges each micro-batch, retrying on ConcurrentMergeError so a
    concurrent batch writer and the stream can share the table (the
    stream is just another optimistic committer). Re-delivery of a
    micro-batch after a sink failure re-merges the same rows — an
    idempotent no-op, since identical keys get identical values — so
    end-to-end semantics stay effectively-once without any sink-side
    transaction log beyond the snapshot CAS. Batches must be unique
    per key, like every merge (aggregated/keyed streams are; dedupe
    upstream otherwise)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        if not batch_df.take(1):
            return
        for attempt in range(max_retries):
            try:
                merge_upsert(batch_df, table_dir, delete_col=delete_col)
                return
            except ConcurrentMergeError:
                continue
        raise ConcurrentMergeError(
            f"micro-batch {epoch_id} starved after {max_retries} merge attempts"
        )

    writer = (
        stream.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def maintain_table(
    spark: SparkSession,
    table_dir: str,
    zorder_by: list[str] | None = None,
    retain_seconds: float = 3600.0,
    retain_snapshots: int = 2,
) -> dict:
    """One-call table maintenance — the scheduler-slot composition a
    production merge table runs nightly (the FactStore.maintain analog
    for the lakehouse substrate): compact the live partitions into one
    version (optionally z-ordered on two columns for row-group-grain
    conjunctive pruning), validate the rewritten head against the
    manifest stats, then vacuum superseded versions and snapshots past
    the retention window. Validation BEFORE vacuum: if the compacted
    head ever failed its stats check, the superseded versions are
    still on disk to read (the compaction itself also self-checks
    pre-publish; this is defense in depth at the operational seam).
    Each step inherits its own concurrency contract — a racing merge
    surfaces as ConcurrentMergeError from the compaction and the
    table is untouched; rerun in the next slot."""
    rep = compact_table(spark, table_dir, zorder_by=zorder_by)
    check = validate_table(spark, table_dir)
    if not check["ok"]:
        raise ValueError(
            f"maintain_table: post-compaction validation failed, vacuum "
            f"skipped (superseded versions retained): {check['problems']}"
        )
    vac = vacuum_table(
        table_dir,
        retain_seconds=retain_seconds,
        retain_snapshots=retain_snapshots,
    )
    out = {
        "snapshot": rep["snapshot"],
        "versions_before": rep["versions_before"],
        "versions_after": rep["versions_after"],
        "validated": True,
        "vacuumed_versions": vac["removed"],
        "vacuumed_snapshots": vac["removed_snapshots"],
    }
    # Key index is opt-in (built once via build_key_index); compaction
    # republished the head, so refresh it in the same slot. A table
    # whose rows were ALL deleted has nothing to index — skip instead
    # of failing every later maintenance tick.
    if os.path.isdir(os.path.join(table_dir, _KEY_INDEX_DIR)):
        m = _head_manifest(table_dir)
        if m and m["partitions"]:
            out["key_index"] = build_key_index(spark, table_dir)
        else:
            out["key_index"] = {"built": False, "reason": "empty table"}
    return out


def _live_files(table_dir: str, manifest: dict) -> dict[str, int]:
    """{relpath: size} of the head snapshot's LIVE file set — the
    manifest's partition dirs only, never superseded versions that
    coexist on disk for time travel. A file the manifest names but the
    FS lacks means the snapshot was vacuumed under us."""
    out: dict[str, int] = {}
    for rel in manifest["partitions"].values():
        d = os.path.join(table_dir, rel)
        # os.walk on a missing dir yields an EMPTY walk, not an error —
        # a silently-dropped partition would make point lookups return
        # partial results; check existence explicitly.
        if not os.path.isdir(d):
            raise SnapshotGoneError(
                f"manifest partition dir vanished (racing vacuum?): {d}"
            )
        for root, _dirs, names in os.walk(d):
            for n in names:
                if n.endswith(".parquet") and not n.startswith("."):
                    p = os.path.join(root, n)
                    try:
                        out[os.path.relpath(p, table_dir)] = os.path.getsize(p)
                    except FileNotFoundError as e:
                        raise SnapshotGoneError(
                            f"live file vanished under the head snapshot "
                            f"(racing vacuum?): {p}"
                        ) from e
    return out


_KEY_INDEX_DIR = "_keyidx"


def build_key_index(spark: SparkSession, table_dir: str) -> dict:
    """Bloom point index over the table's HEAD snapshot
    (storage/bloomindex.py): per-file bitsets on the manifest's
    key_cols, pinned to the snapshot's live file set (a directory
    inventory would see superseded versions kept for time travel).
    Point lookups and key semi-joins then open only candidate files —
    the findById-class fast path for keyed lakehouse tables, where
    partition pruning helps only when the partition value is known.
    Rebuild after compaction/merge (maintain_table does it when the
    index exists); a stale index degrades reads to the full scan."""
    from .bloomindex import build_bloom_index

    m = _head_manifest(table_dir)
    if not m or not m["partitions"]:
        raise ValueError(f"no published merge table at {table_dir}")
    return build_bloom_index(
        spark,
        table_dir,
        m["meta"]["key_cols"],
        os.path.join(table_dir, _KEY_INDEX_DIR),
        files=_live_files(table_dir, m),
    )


def point_lookup(
    spark: SparkSession, table_dir: str, keys: list, on_stale: str = "scan",
    probe=None,
) -> DataFrame | None:
    """Exact rows for the given keys (scalars, or tuples matching the
    table's composite key order) from the head snapshot, through the
    key index when fresh — candidate files only — and the full pinned
    scan otherwise. Column set matches read_table. None if the table
    doesn't exist / is empty (read_table contract). ``probe``: a
    BloomProbe the caller already holds for these keys against the
    current snapshot (see pruned_lookup) — skips the sidecar job."""
    from .bloomindex import pruned_lookup

    m = _head_manifest(table_dir)
    if not m or not m["partitions"]:
        return None
    df = pruned_lookup(
        spark,
        table_dir,
        m["meta"]["key_cols"],
        keys,
        os.path.join(table_dir, _KEY_INDEX_DIR),
        on_stale=on_stale,
        files=_live_files(table_dir, m),
        probe=probe,
    )
    # pin read_table's column surface (schema-merged subset reads can
    # surface evolved columns in any file order). A column absent from
    # EVERY candidate file backfills as a TYPED null — the type comes
    # from the pinned full read's merged schema (rare path: only when
    # all candidates predate a schema evolution). Legacy manifests
    # written before meta carried 'columns' (merge_upsert degrades via
    # meta.get at its own read site) fall back to that same pinned
    # schema instead of raising KeyError.
    cols = m["meta"].get("columns")
    full_schema = None
    if cols is None:
        from .bloomindex import _read_pinned

        full_schema = _read_pinned(
            spark, table_dir, _live_files(table_dir, m)
        ).schema
        cols = [f.name for f in full_schema.fields]
    missing = [c for c in cols if c not in df.columns]
    types = {}
    if missing:
        if full_schema is None:
            from .bloomindex import _read_pinned

            full_schema = _read_pinned(
                spark, table_dir, _live_files(table_dir, m)
            ).schema
        types = {f.name: f.dataType for f in full_schema.fields}
    return df.select(
        *[
            F.col(c)
            if c in df.columns
            else (
                F.lit(None).cast(types[c]).alias(c)
                if c in types
                else F.lit(None).alias(c)
            )
            for c in cols
        ]
    )


def table_history(table_dir: str) -> list[dict]:
    """Operator introspection: every retained snapshot, oldest first,
    with its partition map size and version dirs — the `DESCRIBE
    HISTORY` analog for audits and retention decisions. Reads only
    manifest JSON; never touches data files."""
    snap_dir = os.path.join(table_dir, "_snapshots")
    out = []
    if not os.path.isdir(snap_dir):
        return out
    ns = sorted(
        int(name[len("snap-"):-len(".json")])
        for name in os.listdir(snap_dir)
        if name.startswith("snap-") and name.endswith(".json")
        and name[len("snap-"):-len(".json")].isdigit()
    )
    for n in ns:
        m = _read_manifest(table_dir, n)
        out.append(
            {
                "snapshot": n,
                "n_partitions": len(m["partitions"]),
                "versions": sorted(
                    {rel.split(os.sep, 1)[0] for rel in m["partitions"].values()}
                ),
            }
        )
    return out


def table_diff(
    spark: SparkSession,
    table_dir: str,
    from_snapshot: int,
    to_snapshot: int | None = None,
    include_values: bool = False,
) -> DataFrame:
    """CDC-style diff between two published snapshots: one row per key
    whose state changed, ``change_type`` in insert / delete / update —
    the change-data-feed read a downstream incremental consumer wants
    instead of re-diffing full table scans.

    Scale shape — CHANGED-PARTITION PRUNING: a partition value mapping
    to the SAME version path in both manifests is byte-identical by
    construction (merge never rewrites in place), so only partitions
    whose path differs are read on either side. A merge that touched
    one partition of ten thousand diffs by scanning one partition, not
    the table. Within the changed set it is one full-outer join on the
    key columns; unchanged rows inside rewritten partitions (the
    keep-side rows a merge carries over) hash-compare equal and drop
    out. Schema evolution is handled by aligning both sides to the
    UNION of the two snapshots' column sets (absent = null, the same
    read semantics mergeSchema gives): a column added between
    snapshots marks a row updated only if its value is non-null.

    With ``include_values=True`` the diff also carries the CDC pre/post
    images — ``old_<col>`` / ``new_<col>`` for every non-key column
    (the Delta change-data-feed preimage/postimage shape, flattened to
    one row per key). Insert rows have null ``old_*``, delete rows null
    ``new_*``. This is what an incremental consumer (storage/ivm.py)
    needs to maintain a downstream aggregate WITHOUT re-reading either
    snapshot: the one diff join already holds both sides.

    Raises ``ValueError`` if either snapshot is unknown (vacuumed or
    never published). ``to_snapshot=None`` means the current head.
    """
    ma = _read_manifest(table_dir, from_snapshot)
    mb = (
        _head_manifest(table_dir)
        if to_snapshot is None
        else _read_manifest(table_dir, to_snapshot)
    )
    if ma is None or mb is None:
        raise SnapshotGoneError(
            f"table_diff: unknown snapshot(s) {from_snapshot} -> "
            f"{to_snapshot} in {table_dir}"
        )
    key_cols = list(ma["meta"]["key_cols"])
    pa, pb = ma["partitions"], mb["partitions"]
    a_paths = [
        os.path.join(table_dir, rel)
        for v, rel in pa.items()
        if pb.get(v) != rel
    ]
    b_paths = [
        os.path.join(table_dir, rel)
        for v, rel in pb.items()
        if pa.get(v) != rel
    ]
    cols_a = list(ma["meta"].get("columns") or [])
    cols_b = list(mb["meta"].get("columns") or [])
    union_cols = cols_a + [c for c in cols_b if c not in cols_a]
    val_cols = [c for c in union_cols if c not in key_cols]
    out_schema = ", ".join(
        [f"`{c}` string" for c in key_cols] + ["change_type string"]
    )

    df_a = (
        spark.read.option("mergeSchema", "true").parquet(*a_paths)
        if a_paths else None
    )
    df_b = (
        spark.read.option("mergeSchema", "true").parquet(*b_paths)
        if b_paths else None
    )
    # Union-schema dtype map: a column absent from one side (schema
    # evolution) must surface as a TYPED null — an untyped lit(None) is
    # VOID and poisons downstream consumers (ivm's dtype check rejects
    # a delete-only diff of an evolved column). A column in the
    # manifest but in neither changed read (it lives only in unchanged
    # partitions) falls back to string.
    dtypes = {}
    for df in (df_a, df_b):
        if df is not None:
            for fld in df.schema.fields:
                dtypes.setdefault(fld.name, fld.dataType)
    if any(c not in dtypes for c in val_cols):
        # rare corner: an evolved column lives only in UNCHANGED
        # partitions (e.g. delete-only diff of a pre-evolution
        # partition). Resolve its true type from the snapshot footers —
        # schema-only reads, paid only when the corner actually occurs.
        for snap_m in (mb, ma):
            rels = sorted(set(snap_m["partitions"].values()))
            if not rels:
                continue
            full = spark.read.option("mergeSchema", "true").parquet(
                *[os.path.join(table_dir, rel) for rel in rels]
            )
            for fld in full.schema.fields:
                dtypes.setdefault(fld.name, fld.dataType)
            if all(c in dtypes for c in val_cols):
                break

    def side(df, tag):
        if df is None:
            return None
        have = set(df.columns)
        return df.select(
            *key_cols,
            *[
                (
                    F.col(c) if c in have
                    else F.lit(None).cast(dtypes.get(c, "string"))
                ).alias(f"_{tag}_{c}")
                for c in val_cols
            ],
            F.lit(True).alias(f"_{tag}_present"),
        )

    a = side(df_a, "a")
    b = side(df_b, "b")

    def value_cols(frame, present_tags: set[str]) -> list:
        """old_/new_ projections; a side that is not present in
        ``frame`` surfaces as typed nulls (insert has no preimage,
        delete no postimage)."""
        out = []
        for prefix, tag in (("old", "a"), ("new", "b")):
            for c in val_cols:
                src = f"_{tag}_{c}"
                if tag in present_tags:
                    out.append(F.col(src).alias(f"{prefix}_{c}"))
                else:
                    other = f"_{'b' if tag == 'a' else 'a'}_{c}"
                    out.append(
                        F.lit(None)
                        .cast(frame.schema[other].dataType)
                        .alias(f"{prefix}_{c}")
                    )
        return out

    if a is None and b is None:
        # no changed partitions: empty diff, typed off the real table
        # when it has any data (the string-schema fallback only covers
        # a table that is empty on both sides)
        base = read_table(spark, table_dir, snapshot=to_snapshot)
        if base is None:
            base = read_table(spark, table_dir, snapshot=from_snapshot)
        if base is None:
            if include_values:
                out_schema += ", " + ", ".join(
                    f"`{p}_{c}` string"
                    for p in ("old", "new")
                    for c in val_cols
                )
            return spark.createDataFrame([], out_schema)
        sel = [
            *key_cols,
            F.lit(None).cast("string").alias("change_type"),
        ]
        if include_values:
            have = set(base.columns)
            sel += [
                (F.col(c) if c in have else F.lit(None).cast("string")).alias(
                    f"{p}_{c}"
                )
                for p in ("old", "new")
                for c in val_cols
            ]
        return base.select(*sel).filter(F.lit(False))
    if a is None or b is None:
        only = b if a is None else a
        ctype = "insert" if a is None else "delete"
        sel = [*key_cols, F.lit(ctype).alias("change_type")]
        if include_values:
            sel += value_cols(only, {"b"} if a is None else {"a"})
        return only.select(*sel)
    j = a.join(b, key_cols, "full_outer")
    changed = F.lit(False)
    for c in val_cols:
        changed = changed | ~F.col(f"_a_{c}").eqNullSafe(F.col(f"_b_{c}"))
    sel = [*key_cols, "change_type"]
    if include_values:
        sel += value_cols(j, {"a", "b"})
    return (
        j.withColumn(
            "change_type",
            F.when(F.col("_a_present").isNull(), F.lit("insert"))
            .when(F.col("_b_present").isNull(), F.lit("delete"))
            .when(changed, F.lit("update")),
        )
        .filter(F.col("change_type").isNotNull())
        .select(*sel)
    )
