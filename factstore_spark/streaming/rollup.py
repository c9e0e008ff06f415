"""Continuous rollup — the hypertable/continuous-aggregate analog
(TimescaleDB continuous aggregates, Druid rollup segments): a
time-bucketed aggregate over a fact stream, maintained INCREMENTALLY
as micro-batches arrive instead of recomputed from the raw log.

Shape: Structured Streaming keeps the running (bucket, key) totals in
its aggregation state store; every micro-batch emits only the CHANGED
cells (update mode), and ``foreachBatch`` upserts them into a
versioned parquet table. Query cost is O(buckets), not O(facts); the
write amplification per batch is O(changed cells). At 100 TB the
rollup table is partitionable by bucket date exactly like the
compacted fact layout.

Crash safety: each upsert writes a complete new version directory
``v=<epoch_id>`` and then atomically publishes it via a pointer-file
rename; readers resolve the pointer so a crash mid-write leaves the
previous version intact, and Structured Streaming's checkpoint replays
the unpublished batch (the upsert is idempotent — same cells, same
totals).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_POINTER = "_LATEST"


def _publish(out_dir: str, version: str) -> None:
    tmp = os.path.join(out_dir, f".{_POINTER}.{uuid.uuid4().hex}.tmp")
    with open(tmp, "w", encoding="utf-8") as fh:
        fh.write(version)
        fh.flush()
        os.fsync(fh.fileno())
    os.replace(tmp, os.path.join(out_dir, _POINTER))


def _current_version(out_dir: str) -> str | None:
    try:
        with open(os.path.join(out_dir, _POINTER), encoding="utf-8") as fh:
            return fh.read().strip() or None
    except FileNotFoundError:
        return None


def read_rollup(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """The current rollup table, or None before the first publish."""
    version = _current_version(out_dir)
    if version is None:
        return None
    return spark.read.parquet(os.path.join(out_dir, version))


def start_continuous_rollup(
    stream: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    bucket: str = "1 minute",
    time_col: str = "appended_at",
    key_col: str = "type",
    available_now: bool = False,
):
    """Start maintaining ``out_dir`` as the rolled-up view of
    ``stream``: per (time bucket, key) fact counts. Returns the
    StreamingQuery. The rollup equals ``groupBy(window, key).count()``
    over everything ever streamed — asserted against the batch
    recomputation in tests — but each refresh touches only changed
    cells."""
    agg = (
        stream.groupBy(F.window(F.col(time_col), bucket).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("bucket_start"),
            F.col(key_col).alias("key"),
            F.col("n"),
        )
    )

    def upsert(batch_df: DataFrame, epoch_id: int) -> None:
        spark = batch_df.sparkSession
        changed = batch_df.persist()
        try:
            if changed.isEmpty():
                return
            prev = read_rollup(spark, out_dir)
            if prev is not None:
                keep = prev.join(
                    changed.select("bucket_start", "key"),
                    ["bucket_start", "key"],
                    "left_anti",
                )
                merged = keep.unionByName(changed)
            else:
                merged = changed
            version = f"v={epoch_id}-{uuid.uuid4().hex[:8]}"
            merged.write.mode("overwrite").parquet(os.path.join(out_dir, version))
            _publish(out_dir, version)
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
