"""Multi-dimensional file clustering: z-order (Morton) layout.

A parquet scan prunes files/row-groups whose column min/max stats
exclude the predicate. Sorting the table by ONE key makes that key's
stats tight and every other key's stats table-wide — a second
predicate prunes nothing. Interleaving the bits of two keys and
range-writing by the interleaved value keeps BOTH columns' per-file
ranges narrow (each file covers a small z-curve square), so conjunctive
predicates like ``user_id BETWEEN ... AND day BETWEEN ...`` skip most
files on either or both dimensions — the Delta/Iceberg OPTIMIZE ZORDER
capability, expressed with plain Spark primitives.

Everything is JVM-side column arithmetic (shift/mask chains — no UDF),
so the layout pass is one range shuffle + a sorted write at any scale.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SPREAD_STEPS = [
    (32, 0x1F00000000FFFF),
    (16, 0x1F0000FF0000FF),
    (8, 0x100F00F00F00F00F),
    (4, 0x10C30C30C30C30C3),
    (2, 0x1249249249249249),
]


def _spread_bits(x: Column) -> Column:
    """Spread a 21-bit value so its bits occupy every 3rd position —
    the standard 64-bit Morton magic-mask chain, as Column arithmetic."""
    x = x.bitwiseAND(F.lit((1 << 21) - 1))
    for shift, mask in _SPREAD_STEPS:
        x = (x.bitwiseOR(F.shiftleft(x, shift))).bitwiseAND(F.lit(mask))
    return x


def zorder_value(a: Column, b: Column) -> Column:
    """64-bit z-value interleaving two NON-NEGATIVE integer dimensions
    (each clamped to 21 bits — callers bucket/rank wider domains down
    first; ids and epoch-days fit directly). Nulls order first (z 0)."""
    a = F.coalesce(a.cast("long"), F.lit(0))
    b = F.coalesce(b.cast("long"), F.lit(0))
    return _spread_bits(a).bitwiseOR(F.shiftleft(_spread_bits(b), 1))


def write_zordered(
    df: DataFrame,
    dims: Sequence[str],
    path: str,
    num_files: int = 32,
) -> None:
    """Write ``df`` as parquet clustered on the z-curve of two integer
    dimension columns: range-partition by z-value (balanced files —
    the range sampler splits the curve by data density, not key space),
    sort within each file so row-group stats are tight too, drop the
    helper column. One shuffle, one write; no driver data path."""
    if len(dims) != 2:
        raise ValueError("write_zordered interleaves exactly two dimensions")
    z = zorder_value(F.col(dims[0]), F.col(dims[1]))
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )
