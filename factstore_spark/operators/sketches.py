"""Mergeable distinct-count sketches over fact/event streams — the
pre-aggregated-cube pattern every large-scale metrics pipeline runs:
build one small HLL sketch per fine-grained cell (day x type), then
answer ANY coarser distinct-count rollup by UNIONING sketches instead
of rescanning raw facts.

Why sketches and not countDistinct at 100 TB: exact distinct is a
full shuffle of the distinct keys per query; sketch cells are built
once (one pass, map-side partial aggregation, each cell a few KB
regardless of cardinality) and every later rollup is an aggregation
over O(cells) bytes. Sketches are Apache DataSketches HLL via Spark's
built-in ``hll_sketch_agg`` / ``hll_union_agg`` — JVM-side, mergeable,
with a standard error of ~1.04/sqrt(2^lg_k).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def hll_cells(
    df: DataFrame,
    cell_cols: Sequence[str],
    value_col: str,
    lg_k: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col`` per ``cell_cols`` cell — the
    finest granularity kept; everything coarser derives by merging.
    One shuffle on the cell key with map-side partial sketches."""
    return df.groupBy(*cell_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lg_k)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def hll_rollup(cells: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge sketch cells up to ``group_cols``: distinct estimates for
    the coarser grouping WITHOUT touching raw data. Aggregation input
    is O(cells), not O(facts)."""
    return cells.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg(F.col("sketch"))).alias("est_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )


def hll_set_ops(
    cells_a: DataFrame,
    cells_b: DataFrame,
    group_cols: Sequence[str],
) -> DataFrame:
    """Distinct-set ALGEBRA on two HLL cell frames: per group, the
    estimated |A|, |B|, |A∪B| (true sketch merge via ``hll_union``),
    |A∩B| (inclusion-exclusion, clamped at 0) and |A∖B| — the
    segment-overlap question ("how many users did BOTH X and Y?",
    "how much of corpus A is new vs corpus B?") answered from O(cells)
    bytes of pre-built sketches, never a rescan of either input.

    Why this shape at 100 TB: exact overlap is a distinct-key shuffle
    of BOTH sides per question; sketch cells are built once per side
    and every later A/B/overlap query is an aggregation over a few KB
    per cell. Union estimates carry the standard ~1.04/sqrt(2^lg_k)
    error; the intersection inherits up to err(A)+err(B)+err(A∪B)
    (inclusion-exclusion compounds), so small intersections of large
    sets are the honest weak spot — callers needing tight small-∩
    bounds should sketch the pre-joined key instead. A group present
    on only one side union-merges against an empty side (full outer
    join; absent estimates read as 0)."""
    # Global (ungrouped) algebra joins on a constant key so the planner
    # gets an equi-join (broadcast hash), not a nested-loop cross join.
    keys = list(group_cols) if group_cols else ["_g"]
    if not group_cols:
        cells_a = cells_a.withColumn("_g", F.lit(1))
        cells_b = cells_b.withColumn("_g", F.lit(1))
    ua = cells_a.groupBy(*keys).agg(
        F.hll_union_agg(F.col("sketch")).alias("sk_a")
    )
    ub = cells_b.groupBy(*keys).agg(
        F.hll_union_agg(F.col("sketch")).alias("sk_b")
    )
    j = ua.join(ub, keys, "full_outer")
    est_a = F.when(F.col("sk_a").isNull(), F.lit(0.0)).otherwise(
        F.hll_sketch_estimate(F.col("sk_a"))
    )
    est_b = F.when(F.col("sk_b").isNull(), F.lit(0.0)).otherwise(
        F.hll_sketch_estimate(F.col("sk_b"))
    )
    est_u = (
        F.when(
            F.col("sk_a").isNull(), F.hll_sketch_estimate(F.col("sk_b"))
        )
        .when(F.col("sk_b").isNull(), F.hll_sketch_estimate(F.col("sk_a")))
        .otherwise(
            F.hll_sketch_estimate(F.hll_union(F.col("sk_a"), F.col("sk_b")))
        )
    ).cast("double")  # hll_sketch_estimate is BIGINT; align with est_a/b
    return j.select(
        *group_cols,
        est_a.alias("est_a"),
        est_b.alias("est_b"),
        est_u.alias("est_union"),
        F.greatest(F.lit(0.0), est_a + est_b - est_u).alias("est_intersect"),
        F.greatest(F.lit(0.0), est_u - est_b).alias("est_only_a"),
        F.greatest(F.lit(0.0), est_u - est_a).alias("est_only_b"),
    )


def cm_cells(
    df: DataFrame,
    cell_cols: Sequence[str],
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Count-Min sketch counters per ``cell_cols`` cell — the
    point-FREQUENCY companion to the HLL distinct cube and the
    Misra-Gries heavy hitters: ``cm_query`` later answers "how many
    times did key x occur?" for ANY key over ANY coarser slice from
    O(cells x depth x width) counter rows, never a rescan, with the
    one-sided guarantee est >= true (collisions only ever ADD).

    Representation is sparse relational counters
    ``(cells..., d, w, cnt)`` — a zero counter is an absent row — so
    building is one JVM-side explode+groupBy (xxhash64 per depth, no
    UDF, map-side combined) and merging is a SUM by (group, d, w).
    Per-cell size is bounded by depth x min(width, distinct keys)."""
    if depth < 1 or width < 1:
        raise ValueError("depth and width must be >= 1")
    return (
        df.select(*cell_cols, F.col(key_col).alias("_key"))
        .select(
            *cell_cols,
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
            "_key",
        )
        .select(
            *cell_cols,
            "d",
            F.pmod(
                F.xxhash64(F.col("_key"), F.concat(F.lit("cm"), F.col("d"))),
                F.lit(width),
            ).alias("w"),
        )
        .groupBy(*cell_cols, "d", "w")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def cm_merge(cells: DataFrame, group_cols: Sequence[str]) -> DataFrame:
    """Merge counter cells up to ``group_cols`` — CM sketches are
    linear, so a sum by (group, d, w) IS the sketch of the union."""
    return cells.groupBy(*group_cols, "d", "w").agg(
        F.sum("cnt").cast("long").alias("cnt")
    )


def cm_query(
    merged: DataFrame,
    keys_df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Frequency estimates for ``keys_df[key_col]`` against a merged
    counter set (no group columns left): est = min over depths of the
    key's counter, absent counters read as 0. Always est >= true;
    overcount is bounded by the smallest depth's collision mass
    (classically <= 2N/width with probability >= 1 - 2^-depth).
    ``depth``/``width`` must match the build. The merged counter set
    (O(depth x width) rows, a few KB) broadcasts; the probe keys
    stream — the left side of an outer join cannot be the build side."""
    probe = (
        keys_df.select(F.col(key_col).alias("_key"))
        .distinct()
        .select(
            "_key",
            F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
        )
        .select(
            "_key",
            "d",
            F.pmod(
                F.xxhash64(F.col("_key"), F.concat(F.lit("cm"), F.col("d"))),
                F.lit(width),
            ).alias("w"),
        )
    )
    joined = probe.join(F.broadcast(merged), ["d", "w"], "left")
    return (
        joined.groupBy("_key")
        .agg(
            F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est")
        )
        .withColumnRenamed("_key", key_col)
    )


def heavy_hitters(df: DataFrame, col: str, k: int = 256) -> DataFrame:
    """Approximate frequent items (heavy hitters) via per-partition
    Misra-Gries summaries merged by candidate-sum — the frequency
    companion to the HLL distinct cube.

    Why not exact groupBy at 100 TB: an exact count shuffles EVERY
    distinct key; MG keeps <= k counters per partition and shuffles
    only O(partitions x k) candidate rows. Guarantees (standard MG
    merge bounds, carried in the output):

    - ``est_cnt`` never overestimates: est_cnt <= true count;
    - true count <= est_cnt + ``err_bound`` (err_bound = total mass
      decremented across all partitions);
    - every item with true count > err_bound is PRESENT in the
      candidates (so a frequency threshold above the bound has perfect
      recall).

    The per-partition summary runs as an Arrow-batched ``mapInPandas``
    (Counter per batch at C speed, fold into the k-bounded state, batch
    decrement by the (len-k)-th smallest on overflow) — the documented
    custom-sketch slow path, O(k) memory regardless of cardinality.
    Output: (item, est_cnt, err_bound), err_bound identical on every
    row."""

    def mg(batches):
        import pandas as pd
        from collections import Counter

        state: Counter = Counter()
        decr = 0
        for pdf in batches:
            state.update(Counter(pdf[col].dropna()))
            if len(state) > k:
                # decrement by the (len-k)-th smallest count; counts
                # are positive so t >= 1 always
                vals = sorted(state.values())
                t = vals[len(state) - k - 1]
                decr += t
                state = Counter({i: c - t for i, c in state.items() if c > t})
        rows = [(str(i), int(c), 0) for i, c in state.items()]
        rows.append((None, 0, int(decr)))
        yield pd.DataFrame(rows, columns=["item", "cnt", "decr"])

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        mg, "item string, cnt long, decr long"
    )
    # ONE aggregation serves both the candidate sums and the error
    # bound (the null-item rows carry each partition's decrement), so
    # the mapInPandas pass scans the input exactly once. The bound is
    # then spread over the aggregated set with an unpartitioned window
    # — safe here because that set is bounded at O(partitions x k)
    # rows by the sketch itself, never O(distinct keys).
    agg = summaries.groupBy("item").agg(
        F.sum("cnt").alias("est_cnt"), F.sum("decr").alias("decr")
    )
    return (
        agg.withColumn("err_bound", F.sum("decr").over(Window.partitionBy()))
        .filter(F.col("item").isNotNull())
        .select(
            "item",
            F.col("est_cnt").cast("long").alias("est_cnt"),
            F.col("err_bound").cast("long").alias("err_bound"),
        )
    )


def quantile_cells(
    df: DataFrame,
    cell_cols: Sequence[str],
    value_col: str,
    n_bins: int = 64,
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-cell equi-depth histogram — the mergeable QUANTILE cell to
    go with the HLL distinct cell: ``n_bins + 1`` breakpoints at evenly
    spaced ranks via ``percentile_approx`` (Greenwald-Khanna — a
    bounded-memory distributed aggregate, never a per-cell sort
    collect), plus the row count. One shuffle on the cell key.
    Output: (*cell_cols, breaks array<double>, n_rows)."""
    # one parsed array literal, not n_bins+1 F.lit py4j round trips
    # (round 15, guide §7.3); repr() round-trips doubles exactly
    qs = F.expr(
        "array(" + ", ".join(f"{i / n_bins!r}D" for i in range(n_bins + 1)) + ")"
    )
    return df.groupBy(*cell_cols).agg(
        F.percentile_approx(F.col(value_col).cast("double"), qs, F.lit(accuracy)).alias(
            "breaks"
        ),
        # count(value_col), NOT count(*): percentile_approx ignores
        # nulls, so the histogram mass must too — counting null rows
        # would overweight high-null cells in the rollup and push its
        # cum-mass threshold past what the breakpoints can reach
        # (NULL high quantiles on all-null cells).
        F.count(F.col(value_col)).alias("n_rows"),
    )


def quantile_rollup(
    cells: DataFrame,
    group_cols: Sequence[str],
    quantiles: Sequence[float],
) -> DataFrame:
    """Merge quantile cells up to ``group_cols`` WITHOUT re-reading raw
    data: each cell's histogram contributes ``n_rows / n_bins`` mass at
    every breakpoint (equi-depth by construction); the merged q-th
    quantile is the smallest breakpoint whose cumulative mass reaches
    q x N. Error: one bin's mass per cell (1/n_bins) + the GK accuracy
    of the build — tested with a CI ceiling. Aggregation input is
    O(cells x n_bins), never O(rows).
    Output: (*group_cols, n_rows, q_<label> per requested quantile)."""
    # a global rollup (no group cols) rides an internal constant key
    group_cols = list(group_cols)
    drop_key = not group_cols
    if drop_key:
        cells = cells.withColumn("_g", F.lit(0))
        group_cols = ["_g"]
    n_bins = F.size(F.col("breaks")) - 1
    mass = cells.select(
        *group_cols, (F.col("n_rows") / n_bins.cast("double")).alias("m"), "breaks"
    )
    bins = mass.select(
        *group_cols, "m", F.posexplode("breaks").alias("bin_idx", "val")
    ).filter(F.col("bin_idx") > 0)
    w = (
        Window.partitionBy(*group_cols)
        .orderBy(F.col("val").asc(), F.col("bin_idx").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = bins.withColumn("cum", F.sum("m").over(w))
    totals = cells.groupBy(*group_cols).agg(F.sum("n_rows").alias("n_rows"))
    joined = cum.join(totals, list(group_cols))
    aggs = [
        # relative epsilon on the threshold: cum is n_bins float
        # additions of n_rows/n_bins, so full mass can land a few ulps
        # BELOW q*N (e.g. 6 x 1/6 = 0.9999999999999999) and q=1.0
        # would return NULL instead of the max breakpoint; 1e-9
        # relative covers accumulation error out to ~10^7 bins while
        # staying far under one bin's mass. One parsed expression per
        # quantile (round 15, guide §7.3 — same tree, same FP order).
        F.expr(
            f"min(CASE WHEN cum >= {q!r}D * n_rows * {1.0 - 1e-9!r}D "
            "THEN val END)"
        ).alias(f"q_{str(q).replace('.', '_')}")
        for q in quantiles
    ]
    out = joined.groupBy(*group_cols).agg(
        F.max("n_rows").alias("n_rows"), *aggs
    )
    return out.drop("_g") if drop_key else out
