"""Continuous rollup — the hypertable/continuous-aggregate analog
(TimescaleDB continuous aggregates, Druid rollup segments): a
time-bucketed aggregate over a fact stream, maintained INCREMENTALLY
as micro-batches arrive instead of recomputed from the raw log.

Shape: Structured Streaming keeps the running (bucket, key) totals in
its aggregation state store; every micro-batch emits only the CHANGED
cells (update mode), and ``foreachBatch`` upserts them into a
DATE-PARTITIONED versioned parquet table. Query cost is O(buckets);
write amplification per refresh is O(cells in partitions containing
changed cells) — an untouched date partition's files are not rewritten
(or even read). At 100 TB with years of minute x key cells this is
what keeps maintenance cost proportional to the arrival window rather
than to table history: a steady stream touches only today's partition,
so refresh cost stays flat over time instead of growing with the
table.

Layout::

    out_dir/
      _LATEST                      <- JSON manifest {date: relpath}
      v=<epoch>-<hex>/bucket_date=<date>/part-*.parquet

Each refresh writes ONE new version directory holding only the changed
dates' merged partitions (a single partitioned Spark write), then
atomically publishes a new manifest mapping every date to its current
partition directory — changed dates point into the new version,
untouched dates keep pointing at their existing directories. Crash
safety is unchanged from the whole-table design: the manifest rename
is the only publish step, so a crash mid-write leaves the previous
manifest (and every directory it references) intact, and Structured
Streaming's checkpoint replays the unpublished batch — the upsert is
idempotent (same cells, same totals).
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_LATEST"


def _publish(out_dir: str, manifest: dict[str, str]) -> None:
    tmp = os.path.join(out_dir, f".{_POINTER}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh, sort_keys=True)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(out_dir, _POINTER))
    # fsync the DIRECTORY too: os.replace orders the rename in memory,
    # but power loss can still drop the directory entry after
    # Structured Streaming commits the epoch — and a committed batch
    # never replays, so the rename must be durable before foreachBatch
    # returns.
    dir_fd = os.open(out_dir, os.O_RDONLY)
    try:
        os.fsync(dir_fd)
    finally:
        os.close(dir_fd)


def current_manifest(out_dir: str) -> dict[str, str] | None:
    """The published {bucket_date: relative partition dir} mapping, or
    None before the first publish."""
    try:
        with open(os.path.join(out_dir, _POINTER), encoding="utf-8") as fh:
            raw = fh.read().strip()
    except FileNotFoundError:
        return None
    return json.loads(raw) if raw else None


def read_rollup(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The current rollup table, or None before the first publish."""
    manifest = current_manifest(out_dir)
    if not manifest:
        return None
    paths = [os.path.join(out_dir, rel) for rel in manifest.values()]
    return spark.read.parquet(*paths)


_AGG_FNS = {
    "count": lambda c: F.count(F.lit(1) if c == "*" else F.col(c)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}


def vacuum_rollup(out_dir: str, retain_seconds: float = 3600.0) -> dict:
    """Delete version directories no longer referenced by the published
    manifest and older than ``retain_seconds`` (the grace window lets a
    reader that resolved the previous manifest finish its scan — same
    retention contract as the commit-log claim sweep). Run periodically
    alongside the stream; refreshes themselves never delete, so a crash
    during vacuum costs disk, not data."""
    import shutil
    import time

    manifest = current_manifest(out_dir) or {}
    live_versions = {rel.split(os.sep, 1)[0] for rel in manifest.values()}
    now = time.time()
    removed = []
    for name in os.listdir(out_dir):
        if not name.startswith("v=") or name in live_versions:
            continue
        path = os.path.join(out_dir, name)
        try:
            # Age by the NEWEST mtime anywhere under the version dir,
            # not the top-level dir alone: files landing in nested
            # bucket_date partitions don't bump the parent's mtime, so
            # a long in-flight (not yet published) refresh would look
            # idle and get deleted mid-write. The walk is O(files in
            # one version) and vacuum is rare.
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
    return {"removed": removed, "live": sorted(live_versions)}


def start_continuous_rollup(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    bucket: str = "1 minute",
    time_col: str = "appended_at",
    key_col: str = "type",
    aggs=(("count", "*", "n"),),
    watermark: str | None = None,
    available_now: bool = False,
):
    """Start maintaining ``out_dir`` as the rolled-up view of
    ``stream``: per (time bucket, key) aggregate cells. ``aggs`` is a
    sequence of (function, column, output_name) with function in
    {count, sum, min, max} — the ALGEBRAIC aggregates Structured
    Streaming's update-mode state maintains incrementally (avg =
    sum/count downstream; distinct counts belong in the HLL sketch
    cube). Returns the StreamingQuery. The rollup equals
    ``groupBy(window, key).agg(...)`` over everything ever streamed —
    asserted against the batch recomputation in tests — and each
    refresh reads and rewrites ONLY the date partitions that contain
    changed cells (asserted byte-identical for untouched partitions in
    tests).

    ``watermark`` (e.g. ``"1 hour"``): bound the streaming aggregation
    state — without it, update-mode keeps EVERY (bucket, key) cell's
    state forever, which on an unbounded 100 TB stream grows without
    limit; with it, cells older than the watermark are finalized and
    evicted (arrivals later than the delay are dropped, the standard
    late-data trade). The published table keeps all history either
    way — eviction only bounds the in-flight state store."""
    for fn, _, _ in aggs:
        if fn not in _AGG_FNS:
            raise ValueError(f"non-algebraic rollup aggregate: {fn!r}")
    if watermark is not None:
        stream = stream.withWatermark(time_col, watermark)
    agg = (
        stream.groupBy(F.window(F.col(time_col), bucket).alias("w"), F.col(key_col))
        .agg(*[_AGG_FNS[fn](col).alias(out) for fn, col, out in aggs])
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col(key_col).alias("key"),
            *[F.col(out) for _, _, out in aggs],
        )
    )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        # Partition date from UTC epoch arithmetic, NOT date_format
        # (which renders in spark.sql.session.timeZone: a stream
        # resumed under a different session TZ would map existing
        # cells to different dates, miss their prior versions in the
        # anti-join, and leave duplicate cells in the published
        # table). date_add on a DATE is timezone-free.
        epoch_days = F.floor(
            F.unix_micros(F.col("bucket_start")) / F.lit(86_400_000_000)
        ).cast("int")
        changed = batch_df.withColumn(
            "bucket_date",
            F.date_add(F.to_date(F.lit("1970-01-01")), epoch_days).cast("string"),
        ).persist()
        try:
            # Bounded driver collect: one row per distinct DATE in the
            # micro-batch (a steady stream touches 1-2 dates).
            dates = sorted(
                r[0] for r in changed.select("bucket_date").distinct().collect()
            )
            if not dates:
                return
            manifest = current_manifest(out_dir) or {}
            prev_paths = [
                os.path.join(out_dir, manifest[d]) for d in dates if d in manifest
            ]
            if prev_paths:
                # Only the changed dates' partitions are ever read —
                # partition pruning by construction of the manifest.
                # Kept rows re-derive bucket_date with the SAME UTC
                # epoch arithmetic as the changed side: date_format
                # renders in the session TZ, so under a non-UTC
                # session the kept cells would be relabeled into a
                # date the manifest remap below never covers — written
                # to an unreferenced partition dir and silently
                # dropped from the published table.
                prev = spark.read.parquet(*prev_paths).withColumn(
                    "bucket_date",
                    F.date_add(
                        F.to_date(F.lit("1970-01-01")),
                        F.floor(
                            F.unix_micros(F.col("bucket_start"))
                            / F.lit(86_400_000_000)
                        ).cast("int"),
                    ).cast("string"),
                )
                keep = prev.join(
                    changed.select("bucket_start", "key"),
                    ["bucket_start", "key"],
                    "left_anti",
                )
                merged = keep.unionByName(changed.select(*keep.columns))
            else:
                merged = changed
            version = f"v={epoch_id}-{uuid.uuid4().hex[:8]}"
            # Cluster by the partition key before the partitioned write
            # (SCALE.md rule #7): otherwise every shuffle partition
            # writes a sliver into every changed date's dir.
            merged.repartition(F.col("bucket_date")).write.mode(
                "overwrite"
            ).partitionBy("bucket_date").parquet(os.path.join(out_dir, version))
            new_manifest = dict(manifest)
            for d in dates:
                new_manifest[d] = os.path.join(version, f"bucket_date={d}")
            _publish(out_dir, new_manifest)
        finally:
            changed.unpersist()

    os.makedirs(out_dir, exist_ok=True)
    writer = (
        agg.writeStream.outputMode("update")
        .foreachBatch(upsert)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
