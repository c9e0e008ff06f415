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


def with_grouped_rank(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    rank_col: str = "rank",
    count_col: str | None = None,
    num_partitions: int = 32,
) -> DataFrame:
    """``row_number() over (PARTITION BY group_cols ORDER BY
    order_cols)`` without capping parallelism at group cardinality.

    ``Window.partitionBy(group)`` puts each ENTIRE group into one
    task's sort — fine for high-cardinality keys, a straggler's sort
    when a handful of groups span the corpus (5 event types over 1e9
    rows = 5 tasks). Same trick as :func:`with_global_rank`, keyed:

    1. range-repartition on ``(group_cols, order_cols)`` — each
       partition holds a CONTIGUOUS slice of each group's total order,
       so partition boundaries respect per-group rank order;
    2. collect per-(partition, group) sizes — O(partitions x groups)
       rows, the only driver data;
    3. cumulative-sum those sizes per group into offsets, broadcast-
       join them back, and window only within the (partition, group)
       cell: parallelism = partitions x groups, each task sorts
       ~1/partitions of one group.

    ``order_cols`` must total-order rows WITHIN a group (add unique
    tie-breakers). ``count_col`` additionally attaches each group's
    total row count (free — the offsets pass already summed it),
    which is what median/NTILE callers need next."""
    gcols = [F.col(g) for g in group_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *gcols, *order_cols)
        .localCheckpoint(eager=True)  # pin boundaries; see with_global_rank
        .withColumn("_pid", F.spark_partition_id())
    )
    size_rows = (
        ranged.groupBy("_pid", *group_cols)
        .agg(F.count(F.lit(1)).alias("_n"))
        .collect()
    )
    # Driver-side cumulative sum per group over sorted partition ids.
    totals: dict[tuple, int] = {}
    offset_rows = []
    for r in sorted(size_rows, key=lambda r: r["_pid"]):
        g = tuple(r[c] for c in group_cols)
        offset_rows.append(tuple(r[c] for c in group_cols) + (r["_pid"], totals.get(g, 0)))
        totals[g] = totals.get(g, 0) + r["_n"]
    from pyspark.sql.types import LongType, StructField, StructType

    gfields = [ranged.schema[c] for c in group_cols]
    off_schema = StructType(
        [StructField(f.name, f.dataType, f.nullable) for f in gfields]
        + [StructField("_pid", LongType(), False), StructField("_off", LongType(), False)]
    )
    spark = ranged.sparkSession
    offs = spark.createDataFrame(
        [row[:-2] + (int(row[-2]), int(row[-1])) for row in offset_rows], off_schema
    )
    if count_col is not None:
        tot_rows = [g + (int(n),) for g, n in totals.items()]
        tot_schema = StructType(
            [StructField(f.name, f.dataType, f.nullable) for f in gfields]
            + [StructField(count_col, LongType(), False)]
        )
        tots_df = spark.createDataFrame(tot_rows, tot_schema)
        tcond = None
        for g in group_cols:
            c = offs[g].eqNullSafe(tots_df[g])
            tcond = c if tcond is None else (tcond & c)
        offs = offs.join(F.broadcast(tots_df), tcond).drop(*[tots_df[g] for g in group_cols])
    # NULL-SAFE group equality: a plain equi-join on the group columns
    # would silently DROP rows whose group value is null, while the
    # window form this replaces keeps them as their own group.
    cond = ranged["_pid"] == offs["_pid"]
    for g in group_cols:
        cond = cond & ranged[g].eqNullSafe(offs[g])
    w = Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
    return (
        ranged.join(F.broadcast(offs), cond)
        .drop(offs["_pid"], *[offs[g] for g in group_cols])
        .withColumn(rank_col, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )


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
