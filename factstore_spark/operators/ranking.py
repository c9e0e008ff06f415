"""Distributed order statistics: exact global ranks WITHOUT the
single-partition window.

``Window.orderBy(...)`` with no partition key moves the entire dataset
into ONE task's sort — the classic scale antipattern (Spark even logs a
WindowExec warning for it). Exact global ranks don't need it: range-
repartition on the sort key (range partition i holds keys strictly
below partition i+1's), rank within each partition, then add the total
row count of all earlier partitions — a driver-side cumulative sum over
``n_partitions`` integers. Ranks are EXACT regardless of where the
range sampler places boundaries; the sampling only balances work.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_global_rank(
    df: DataFrame,
    order_cols: Sequence[Column],
    rank_col: str = "rank",
    num_partitions: int = 32,
    with_total: bool = False,
):
    """``row_number() over (ORDER BY order_cols)`` computed scalably:
    one range shuffle + per-partition windows + a broadcast of
    ``num_partitions`` cumulative offsets. ``order_cols`` must be a
    TOTAL order (add unique tie-breakers) or ranks are arbitrary within
    ties, same as the window form. Adds ``rank_col`` (1-based long).

    ``with_total=True`` returns ``(df, total_rows)`` — the total is the
    sum of the per-partition sizes the offsets pass ALREADY collected,
    so callers that need N (NTILE arithmetic) skip a redundant count
    job over the checkpointed data."""
    # localCheckpoint PINS the range partitioning: the size job below
    # and the rank job later must see the SAME boundaries (the range
    # sampler is re-seeded per execution, so without materialization
    # the two jobs could disagree and offsets would be garbage).
    ranged = (
        df.repartitionByRange(num_partitions, *order_cols)
        .localCheckpoint(eager=True)
        .withColumn("_pid", F.spark_partition_id())
    )
    # n_partitions rows to the driver — the only collect, O(partitions)
    sizes = {r._pid: r.n for r in ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("n")).collect()}
    offsets = {}
    acc = 0
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    off_map = F.create_map(
        *[F.lit(x) for kv in offsets.items() for x in kv]
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        ranged.withColumn(
            rank_col,
            (F.row_number().over(w) + off_map[F.col("_pid")]).cast("long"),
        )
        .drop("_pid")
    )
    if with_total:
        return out, acc
    return out


def ntile_of_rank(rank: Column, n: Column, tiles: int) -> Column:
    """Standard SQL NTILE(tiles) from a precomputed exact global rank
    and total count: the first ``n % tiles`` tiles carry
    ``ceil(n/tiles)`` rows — identical to the window NTILE on the same
    total order, without the single-partition sort."""
    q = (n / tiles).cast("long")
    r = n % tiles
    big = q + 1
    cutoff = r * big
    return (
        F.when(rank <= cutoff, F.ceil(rank / big))
        .otherwise(r + F.ceil((rank - cutoff) / F.when(q > 0, q).otherwise(1)))
        .cast("long")
    )
