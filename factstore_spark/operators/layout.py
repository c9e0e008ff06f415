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

import glob
import os
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
    the standard 64-bit Morton magic-mask chain, as Column arithmetic.
    Out-of-range values CLAMP to the domain edges (a bare mask would
    wrap k and k+2^21 onto the same spread bits, silently interleaving
    unrelated ranges and erasing the layout's pruning)."""
    x = F.least(F.greatest(x, F.lit(0)), F.lit((1 << 21) - 1))
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


def zorder_col(df: DataFrame, dims: Sequence[str]) -> Column:
    """The z-value Column for ``df`` over two dimension columns, each
    first rank-normalized to an equi-depth bucket id (up to 64
    approx-quantile buckets, one metadata-light pass per dim — see
    write_zordered's docstring for why ranks, not raw bits). Shared by
    the standalone layout writer and merge-table compaction
    (``compact_table(zorder_by=...)``)."""
    if len(dims) != 2:
        raise ValueError("z-order interleaves exactly two dimensions")
    n_buckets = 64
    probs = [i / n_buckets for i in range(1, n_buckets)]
    # ONE approxQuantile call for both dims = one scan, not two —
    # compact_table calls this on an unpersisted multi-version read
    both = df.stat.approxQuantile(list(dims), probs, 0.01)

    def _norm(col: str, raw) -> Column:
        bounds = sorted(set(raw))
        if not bounds:
            return F.lit(0).cast("long")  # all-null or constant dimension
        arr = F.array(*[F.lit(float(v)) for v in bounds])
        c = F.coalesce(F.col(col).cast("double"), F.lit(float(bounds[0]) - 1.0))
        # equi-depth bucket id = #boundaries <= value (nulls -> 0)
        return F.aggregate(
            arr,
            F.lit(0),
            lambda acc, b: acc + F.when(c >= b, 1).otherwise(0),
        ).cast("long")

    return zorder_value(_norm(dims[0], both[0]), _norm(dims[1], both[1]))


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
    helper column. One shuffle, one write; no driver data path.

    Each dimension is first rank-normalized to an equi-depth bucket id
    (up to 64 approx-quantile buckets, one metadata-light pass per dim)
    before interleaving. Interleaving RAW values lets whichever
    dimension happens to span more varying bits dominate the curve —
    e.g. an id spanning 20 bits against an epoch-day whose high bits
    are constant degenerates to id-major order, and the day dimension's
    pruning silently vanishes. Quantile buckets rather than min/max
    affine scaling: one sentinel outlier (a 2^40 'unknown' id) would
    collapse an affine domain so every real value lands in bucket 0 —
    equi-depth ranks are outlier-immune and give equal-density curve
    tiles, which is the actual Delta/Iceberg OPTIMIZE ZORDER discipline
    (range-partition ids per column, then interleave)."""
    z = zorder_col(df, dims)
    (
        df.withColumn("_z", z)
        .repartitionByRange(num_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def candidate_files(path: str, box: dict[str, tuple]) -> tuple[int, int]:
    """Footer-stats pruning simulation: (total files, files whose
    column min/max stats INTERSECT the conjunctive ``box`` of
    ``{column: (lo, hi)}`` inclusive bounds) — exactly the
    file-skipping decision a scan planner makes from parquet column
    statistics. Driver-side and metadata-only (one footer per file,
    never a data page), bounded by the file count of the layout under
    inspection. A file with absent stats for a boxed column is kept
    (a planner cannot prune what it cannot see)."""
    import pyarrow.parquet as pq

    files = sorted(glob.glob(os.path.join(path, "*.parquet")))
    n_candidates = 0
    for f in files:
        md = pq.read_metadata(f)
        lo_hi: dict[str, list] = {}
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                if name not in box:
                    continue
                st = col.statistics
                if st is None or not st.has_min_max:
                    lo_hi[name] = None  # unknowable -> never prunes
                    continue
                cur = lo_hi.get(name)
                if cur is None and name in lo_hi:
                    continue
                if cur is None:
                    lo_hi[name] = [st.min, st.max]
                else:
                    cur[0] = min(cur[0], st.min)
                    cur[1] = max(cur[1], st.max)
        keep = True
        for name, (lo, hi) in box.items():
            span = lo_hi.get(name)
            if span is None:
                continue  # missing stats: cannot prune on this column
            if span[1] < lo or span[0] > hi:
                keep = False
                break
        n_candidates += 1 if keep else 0
    return len(files), n_candidates
