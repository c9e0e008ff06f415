"""Skew guards: salted two-phase aggregation and salted joins.

At 100 TB a handful of hot keys (one viral user, one default tag, one
empty-string fingerprint) can put most of a shuffle into one reducer.
AQE's skew-join splitting handles the JOIN case after the fact when
partition-size stats reveal it; these operators remove the hot spot by
construction, which also covers the aggregation case AQE does not
split:

- ``salted_groupby``: phase 1 aggregates on (keys + salt) — the hot
  key spreads over ``salt`` reducers — phase 2 combines the
  per-salt partials on the real keys (a tiny shuffle: |groups| x salt
  rows). Only ALGEBRAIC aggregates compose this way; count/sum/min/max
  are provided (avg = sum/count downstream).
- ``salted_join``: the skewed fact side gets a deterministic row salt,
  the dimension side is replicated ``salt`` times, the join key becomes
  (key, salt) — a hot key's probe rows land on ``salt`` different
  reducers. For dimensions small enough to broadcast, broadcast
  instead (no salt needed); this is for the medium dimension that
  can't broadcast but joins a skewed fact.

The salt: pass ``row_id_col`` (any unique column — an event id, a
position) and the salt is ``xxhash64(row_id) % salt`` — fully
DETERMINISTIC under task retries AND uniform over exact-duplicate hot
rows (ids differ even when content doesn't; a whole-row hash would
send identical rows to one reducer, and duplicate floods are a common
skew source). Without ``row_id_col`` the salt falls back to
``xxhash64(monotonically_increasing_id()) % salt``: same spreading,
but the expression is NONDETERMINISTIC — if an executor is lost and
only part of a stage is recomputed, rows can re-salt differently than
the partials already fetched (the SPARK-23207 class of hazard; Spark
mitigates by rolling back indeterminate stages, but the deterministic
id salt removes the question entirely). Prefer ``row_id_col``
wherever a unique column exists. The final RESULT is
salt-independent by construction (phase 2 re-groups on the real keys;
the join drops the salt), so the oracle-determinism contract is
unaffected by which salt a row gets.
"""

from __future__ import annotations

import uuid
from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_PARTIAL = {
    "count": lambda c: F.count(F.lit(1) if c == "*" else F.col(c)),
    "sum": lambda c: F.sum(c),
    "min": lambda c: F.min(c),
    "max": lambda c: F.max(c),
}
# how phase 2 combines phase-1 partials
_FINAL = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def _salt_col(salt: int, row_id_col: str | None = None):
    src = (
        F.col(row_id_col) if row_id_col is not None
        else F.monotonically_increasing_id()
    )
    return F.pmod(F.xxhash64(src), F.lit(salt))


def salted_groupby(
    df: DataFrame,
    keys: Sequence[str],
    aggs: Sequence[tuple[str, str, str]],
    salt: int = 16,
    row_id_col: str | None = None,
) -> DataFrame:
    """Two-phase skew-proof aggregation. ``aggs`` is a list of
    (function, column, output_name) with function in
    {count, sum, min, max}; pass column "*" for count(*). Result equals
    ``df.groupBy(keys).agg(...)`` exactly (test- and oracle-asserted)
    but no reducer ever sees more than ~1/salt of a hot key's rows."""
    for fn, _, _ in aggs:
        if fn not in _PARTIAL:
            raise ValueError(f"non-algebraic aggregate: {fn!r}")
    salted = df.withColumn("_salt", _salt_col(salt, row_id_col))
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[_PARTIAL[fn](col).alias(f"_p_{out}") for fn, col, out in aggs]
    )
    return phase1.groupBy(*keys).agg(
        *[_FINAL[fn](f"_p_{out}").alias(out) for fn, _, out in aggs]
    )


def salted_join(
    skewed: DataFrame,
    dim: DataFrame,
    on: Sequence[str],
    salt: int = 16,
    how: str = "inner",
    row_id_col: str | None = None,
) -> DataFrame:
    """Equi-join a skewed fact side to a (non-broadcastable) dimension
    with the hot keys spread over ``salt`` reducers: fact rows get a
    deterministic salt, the dimension replicates ``salt`` times, and
    the join key becomes (*on, salt). Shuffle volume: facts unchanged,
    dimension x salt — the standard trade. Supported ``how``: inner,
    left (semantics preserved because every fact row's (key, salt)
    finds exactly the replicas of its key).

    Pass ``row_id_col`` (any unique fact column) wherever one exists —
    the monotonically_increasing_id fallback is nondeterministic under
    partial stage recomputation (the module-docstring caveat), which
    for a JOIN means recomputed rows can land in different reduce
    partitions than already-fetched partial output (the SPARK-23207
    class of duplicated/lost rows). The internal salt column is
    collision-proofed: a caller-owned ``_salt`` column passes through
    untouched."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    on = list(on)
    sc = f"_salt_{uuid.uuid4().hex[:8]}"
    s = skewed.withColumn(sc, _salt_col(salt, row_id_col))
    d = dim.withColumn(sc, F.explode(F.sequence(F.lit(0), F.lit(salt - 1))))
    return s.join(d, on + [sc], how).drop(sc)
