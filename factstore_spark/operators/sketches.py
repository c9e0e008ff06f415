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
