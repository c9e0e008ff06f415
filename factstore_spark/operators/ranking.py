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

from typing import Callable, Sequence

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
    if not offsets:
        # Empty input: F.create_map() with no entries is map<void,void>
        # and off_map[_pid] fails ANALYSIS (not just returns null) — an
        # empty frame must rank to an empty frame, not raise.
        out = ranged.withColumn(rank_col, F.lit(None).cast("long")).drop("_pid")
        return (out, 0) if with_total else out
    # One parsed map literal instead of 2 x num_partitions F.lit py4j
    # round trips (round 15, guide §7.3). Long-typed values: identical
    # final values (the rank is cast long anyway), and immune to int
    # overflow past 2^31 ranks.
    off_map = F.expr(
        "map("
        + ", ".join(f"{pid}, {off}L" for pid, off in offsets.items())
        + ")[_pid]"
    )
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    out = (
        ranged.withColumn(
            rank_col,
            (F.row_number().over(w) + off_map).cast("long"),
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
    target_ranks: Callable[[Column], Sequence[Column]] | None = None,
    size_sums: dict | None = None,
):
    """``row_number() over (PARTITION BY group_cols ORDER BY
    order_cols)`` without capping parallelism at group cardinality.

    ``Window.partitionBy(group)`` puts each ENTIRE group into one
    task's sort — fine for high-cardinality keys, a straggler's sort
    when a handful of groups span the corpus (5 event types over 1e9
    rows = 5 tasks). Same trick as :func:`with_global_rank`, keyed:

    1. range-repartition on ``(group_cols, order_cols)`` — each
       partition holds a CONTIGUOUS slice of each group's total order,
       so partition boundaries respect per-group rank order;
    2. aggregate per-(partition, group) sizes — O(partitions x groups)
       rows — and cumulative-sum them per group with a window over
       that TINY frame (each window cell is one group's <=partitions
       rows), entirely distributed: unlike with_global_rank's
       O(partitions) driver fold, grouped offsets can reach
       O(groups x partitions) rows, which must never ride through the
       driver;
    3. broadcast-join the offsets back and window only within the
       (partition, group) cell: parallelism = partitions x groups,
       each task sorts ~1/partitions of one group.

    ``order_cols`` must total-order rows WITHIN a group (add unique
    tie-breakers). ``count_col`` additionally attaches each group's
    total row count (free — the same window pass sums it), which is
    what median/NTILE callers need next.

    ``target_ranks`` (optional): a callable taking the per-group total
    count Column and returning the rank positions the caller will
    consume (e.g. the two middle ranks for a median). When given, the
    offsets frame — which already knows each (partition, group) cell's
    rank interval ``(_off, _off + _n]`` — is filtered to cells that can
    contain a target, and the broadcast join back prunes every other
    row BEFORE the window sort: the rank pass then sorts ~|targets|
    cells per group (each ~1/partitions of a group) instead of the
    whole corpus. Ranks are only attached (and only valid) at rows in
    surviving cells; the caller's rank filter is unchanged.

    ``size_sums`` (optional): ``{name: row-level Column}`` whose
    per-group SUM the caller also needs. The sums ride the sizes
    aggregation this operator already runs over the pinned input, so
    a full-corpus witness (e.g. "how many rows <= this estimate")
    costs zero extra scans — instead of a separate read + join + agg
    job beside the rank pass. When given, the return becomes
    ``(ranked, group_stats)`` with group_stats =
    ``group_cols + [n (BIGINT group total)] + summed names``.

    Regime: built for group cardinality SMALL relative to the corpus
    (event types, sources, domains) — where Window.partitionBy(group)
    serializes. There the offsets frame (groups x partitions rows)
    broadcasts trivially. With millions of groups the plain window
    already parallelizes fine and is the better plan."""
    gcols = [F.col(g) for g in group_cols]
    ranged = (
        df.repartitionByRange(num_partitions, *gcols, *order_cols)
        .localCheckpoint(eager=True)  # pin boundaries; see with_global_rank
        .withColumn("_pid", F.spark_partition_id())
    )
    sizes = ranged.groupBy("_pid", *group_cols).agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(expr).alias(f"_ss_{k}") for k, expr in (size_sums or {}).items()],
    )
    group_stats = None
    if size_sums:
        group_stats = sizes.groupBy(*group_cols).agg(
            F.sum("_n").cast("long").alias("n"),
            *[F.sum(f"_ss_{k}").alias(k) for k in size_sums],
        )
    ow = Window.partitionBy(*group_cols).orderBy("_pid")
    offs = sizes.select(
        "_pid",
        *group_cols,
        "_n",
        F.coalesce(
            F.sum("_n").over(ow.rowsBetween(Window.unboundedPreceding, -1)), F.lit(0)
        ).alias("_off"),
        F.sum("_n")
        .over(ow.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing))
        .alias("_gtot"),
    )
    if target_ranks is not None:
        hit = F.lit(False)
        for t in target_ranks(F.col("_gtot")):
            hit = hit | ((t > F.col("_off")) & (t <= F.col("_off") + F.col("_n")))
        offs = offs.filter(hit)
    if count_col is not None:
        offs = offs.withColumn(count_col, F.col("_gtot").cast("long"))
    offs = offs.drop("_gtot", "_n")
    # NULL-SAFE group equality: a plain equi-join on the group columns
    # would silently DROP rows whose group value is null, while the
    # window form this replaces keeps them as their own group.
    cond = ranged["_pid"] == offs["_pid"]
    for g in group_cols:
        cond = cond & ranged[g].eqNullSafe(offs[g])
    w = Window.partitionBy("_pid", *group_cols).orderBy(*order_cols)
    ranked = (
        ranged.join(F.broadcast(offs), cond)
        .drop(offs["_pid"], *[offs[g] for g in group_cols])
        .withColumn(rank_col, (F.row_number().over(w) + F.col("_off")).cast("long"))
        .drop("_pid", "_off")
    )
    if group_stats is not None:
        return ranked, group_stats
    return ranked


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
