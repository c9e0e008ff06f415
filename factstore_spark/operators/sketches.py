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
                vals = sorted(state.values())
                t = vals[len(state) - k - 1] if len(state) > k else 0
                if t:
                    decr += t
                    state = Counter(
                        {i: c - t for i, c in state.items() if c > t}
                    )
        rows = [(str(i), int(c), 0) for i, c in state.items()]
        rows.append((None, 0, int(decr)))
        yield pd.DataFrame(rows, columns=["item", "cnt", "decr"])

    summaries = df.select(F.col(col).cast("string").alias(col)).mapInPandas(
        mg, "item string, cnt long, decr long"
    )
    cand = (
        summaries.filter(F.col("item").isNotNull())
        .groupBy("item")
        .agg(F.sum("cnt").alias("est_cnt"))
    )
    bound = summaries.agg(F.sum("decr").alias("err_bound"))
    return cand.join(F.broadcast(bound)).select(
        "item", F.col("est_cnt").cast("long").alias("est_cnt"),
        F.col("err_bound").cast("long").alias("err_bound"),
    )
