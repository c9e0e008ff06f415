"""localCheckpoint storage hygiene (round 10): df.unpersist() is a
silent no-op for checkpoint blocks (they live on the RDD, not in the
CacheManager), so the engine frees superseded pins explicitly via
session.release_local_checkpoint and sweeps dead blocks between
independent workloads via session.sweep_checkpoint_blocks."""

from pyspark.sql import functions as F

from factstore_spark.session import (
    release_local_checkpoint,
    sweep_checkpoint_blocks,
)


def _pinned_mb(spark) -> float:
    infos = spark.sparkContext._jsc.sc().getRDDStorageInfo()
    return sum(infos[i].memSize() for i in range(len(infos))) / 1048576


def test_unpersist_is_noop_release_actually_frees(spark):
    sweep_checkpoint_blocks(spark)
    df = spark.range(300_000).select("id", (F.col("id") * 2).alias("v"))
    pin = df.localCheckpoint()
    pin.count()
    before = _pinned_mb(spark)
    assert before > 0
    pin.unpersist(blocking=True)
    assert _pinned_mb(spark) == before  # the documented no-op
    assert release_local_checkpoint(pin) is True
    assert _pinned_mb(spark) < before


def test_release_is_safe_noop_on_plain_frames(spark):
    df = spark.range(10)
    assert release_local_checkpoint(df) is False


def test_sweep_clears_pagerank_residue_and_results_survive(spark):
    """The operator that motivated the sweep: pagerank leaves its
    edge/state pins resident after the result is consumed; the sweep
    zeroes storage and a fresh call still computes the same answer."""
    from factstore_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [(i % 50, (i * 7) % 50) for i in range(2000)], "src long, dst long"
    )
    first = {r.node: r.rank for r in pagerank(edges, n_iter=6).collect()}
    assert len(first) == 50
    sweep_checkpoint_blocks(spark)
    assert _pinned_mb(spark) == 0.0
    again = {r.node: r.rank for r in pagerank(edges, n_iter=6).collect()}
    assert again == first
