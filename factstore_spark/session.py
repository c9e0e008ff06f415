"""SparkSession helpers.

The engine itself works with ANY SparkSession; this builder applies the
configs we want when we own session creation (tests, bench):

- AQE on (runtime re-planning, skew-join handling at scale)
- shuffle partitions sized by env (32 on the local[32] harness; on a
  1000-executor cluster this would be ~2-3x total cores or auto via AQE)
- UTC session timezone for deterministic timestamp semantics
- Arrow enabled for any pandas-UDF operators
- ``nanosAsLong`` so the driver testdata's TIMESTAMP(NANOS) events table
  is readable (Spark has no nanosecond timestamp type)
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

NANOS_CONF = "spark.sql.legacy.parquet.nanosAsLong"


def get_spark(
    app_name: str = "factstore-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = master or f"local[{cpus}]"
    # Ensure executor Python workers can import this package (local mode
    # inherits the process env; on a cluster you'd ship a wheel/zip).
    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    existing = os.environ.get("PYTHONPATH", "")
    if repo_dir not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            repo_dir + (os.pathsep + existing if existing else "")
        )
    parts = shuffle_partitions or int(os.environ.get("SPARK_SHUFFLE_PARTITIONS", "32"))
    return (
        SparkSession.builder.appName(app_name)
        .master(master)
        # Local mode: the driver JVM hosts all executor threads — the
        # 1g default heap GC-thrashes on wide-array operators. Only
        # effective at JVM launch (ignored on getOrCreate of a live session).
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "16g"))
        .config("spark.sql.shuffle.partitions", str(parts))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config(NANOS_CONF, "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def ensure_nanos_readable(spark: SparkSession) -> bool:
    """Set the nanos-as-long legacy conf on an existing session (it is a
    runtime SQL conf). Returns True if reading TIMESTAMP(NANOS) parquet
    will yield a BIGINT (nanos) column."""
    try:
        spark.conf.set(NANOS_CONF, "true")
        return True
    except Exception:
        return spark.conf.get(NANOS_CONF, "false") == "true"


def release_local_checkpoint(df) -> bool:
    """Free a SUPERSEDED localCheckpoint's storage blocks NOW.

    ``df.unpersist()`` is a silent NO-OP for checkpoint blocks — they
    belong to the materialized RDD, not the CacheManager — and the
    async ContextCleaner reclaims them only after JVM weak-reference
    processing, which on a big-heap driver can lag whole jobs behind
    (measured: hundreds of MB of dead superstep pins resident across
    bench entries, surviving explicit System.gc). This resolves the
    checkpoint's LogicalRDD id from the analyzed plan and unpersists
    the RDD itself through the SparkContext, which removes the blocks
    from every block manager immediately.

    DANGER: the frame — and anything whose lineage still reads its
    blocks — becomes unreadable afterwards (local checkpoints cannot
    recompute). Only call on pins the caller has fully replaced with a
    NEWER eager checkpoint or consumed to driver data. Returns True if
    a checkpoint was released; False (never raises) on non-checkpoint
    frames or reflection failures, so callers can use it as a
    best-effort drop.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return False
        rdd_id = plan.rdd().id()
        sc = df.sparkSession.sparkContext
        # private[spark] in Scala, public in bytecode; non-blocking —
        # removal completes async, correctness never depends on timing
        sc._jsc.sc().unpersistRDD(rdd_id, False)
        return True
    except Exception:
        return False


def sweep_checkpoint_blocks(spark: SparkSession) -> int:
    """Unpersist EVERY RDD still holding storage blocks — the
    between-independent-workloads sweep. After ``clearCache()`` the
    remaining storage is localCheckpoint blocks whose frames have been
    consumed but whose JVM-side reclaim (py4j detach -> weak-ref
    processing -> async ContextCleaner) lags jobs behind; a bench or a
    many-corpora session accumulates hundreds of MB of dead pins
    (measured: a PageRank call leaves its edge-scale checkpoints
    resident until collector pressure). Returns the number of RDDs
    swept.

    ONLY call between workloads with no live checkpointed frames: any
    still-referenced local checkpoint becomes unreadable (local
    checkpoints cannot recompute)."""
    try:
        jsc = spark.sparkContext._jsc.sc()
        infos = jsc.getRDDStorageInfo()
        ids = [infos[i].id() for i in range(len(infos))]
        for rid in ids:
            jsc.unpersistRDD(rid, False)
        return len(ids)
    except Exception:
        return 0
