"""Incremental view maintenance over merge-table snapshots.

A 100 TB merge table with a handful of dashboards / downstream
aggregates cannot afford a full recompute per refresh: the standard
engine answer (Delta/materialized-view style IVM) is to maintain each
aggregate from the table's CHANGE FEED — cost proportional to what
changed, not to table history. This module is that consumer for the
engine's own CDC read (storage/merge.py:table_diff):

- ``aggregate_state`` — the initial full aggregate at a snapshot
  (COUNT + SUMs per group; one shuffle, map-side combined).
- ``delta_from_diff`` — turns a values-carrying diff
  (``table_diff(..., include_values=True)``) into per-group signed
  deltas in ONE pass: each changed key contributes its postimage with
  sign +1 (insert/update) and its preimage with sign -1
  (update/delete) via an in-row 2-element array explode — the diff
  frame is consumed once, never joined back to the table. A group-by
  column that CHANGES in an update migrates mass correctly by
  construction (the -1 lands in the old group, the +1 in the new).
- ``apply_delta`` — full-outer merge of state and delta; groups whose
  row count reaches zero drop out of the state (so state size tracks
  live groups, not history).
- ``refresh_aggregate`` — the driver loop: diff from the state's
  snapshot to the head (changed-partition pruned), delta, apply.

Maintained aggregates are COUNT and SUM — the self-maintainable class
(every delete is fully determined by the preimage) — plus MIN/MAX via
the HYBRID path (``extrema_state`` / ``refresh_extrema``): a deleted
extremum needs a rescan of its group by definition, so the refresh
maintains inserts/updates incrementally and rescans ONLY groups whose
stored extremum a leaving preimage touched; a refresh with no
extremum deletes does zero table reads.

Only exact integer/long sums are maintained (the battery's
no-floats-across-aggregation-boundaries rule): incremental float sums
would drift from a recompute by accumulation order alone.

Correctness contract (tested in tests/test_ivm.py): after any chain of
merges, ``refresh_aggregate`` equals ``aggregate_state`` on the head —
including group migration, delete-to-zero groups, and replayed
(idempotent) refreshes keyed by snapshot.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .merge import SnapshotGoneError, read_table, table_diff

_COUNT = "n_rows"


def aggregate_state(
    table_df: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Full recompute: one row per group with ``n_rows`` plus
    ``sum_<c>`` for each sum column (exact BIGINT; nulls count 0)."""
    _check_cols(group_cols, sum_cols)
    _check_sum_dtypes(table_df, sum_cols, "aggregate_state")
    return table_df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias(_COUNT),
        *[
            F.coalesce(F.sum(F.col(c).cast("long")), F.lit(0))
            .cast("long")
            .alias(f"sum_{c}")
            for c in sum_cols
        ],
    )


def delta_from_diff(
    diff: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Per-group signed deltas from a ``table_diff(...,
    include_values=True)`` frame. ``group_cols`` / ``sum_cols`` may be
    key columns (stable across a change — the diff carries them bare)
    or value columns (the diff carries ``old_<c>`` / ``new_<c>``)."""
    _check_cols(group_cols, sum_cols)
    _check_sum_dtypes(
        diff.select(
            *[
                F.col(f"new_{c}").alias(c)
                for c in sum_cols
                if f"new_{c}" in diff.columns
            ]
        ),
        sum_cols,
        "delta_from_diff",
    )
    have = set(diff.columns)

    def image(c: str, side: str):
        tagged = f"{side}_{c}"
        if tagged in have:
            return F.col(tagged)
        if c in have:  # key column: same on both sides
            return F.col(c)
        raise ValueError(
            f"delta_from_diff: column {c!r} not in diff (was the diff "
            "built with include_values=True?)"
        )

    def contrib(side: str, sign: int):
        return F.struct(
            *[image(c, side).alias(f"g_{c}") for c in group_cols],
            F.lit(sign).cast("long").alias("_sign"),
            *[
                (F.lit(sign) * F.coalesce(image(c, side).cast("long"), F.lit(0)))
                .alias(f"d_{c}")
                for c in sum_cols
            ],
        )

    exploded = diff.select(
        F.explode(
            F.array(
                F.when(F.col("change_type") != "delete", contrib("new", 1)),
                F.when(F.col("change_type") != "insert", contrib("old", -1)),
            )
        ).alias("c")
    ).filter(F.col("c").isNotNull())
    return exploded.groupBy(
        *[F.col(f"c.g_{c}").alias(c) for c in group_cols]
    ).agg(
        F.sum("c._sign").cast("long").alias(f"d_{_COUNT}"),
        *[
            F.sum(F.col(f"c.d_{c}")).cast("long").alias(f"d_sum_{c}")
            for c in sum_cols
        ],
    )


def apply_delta(
    state: DataFrame,
    delta: DataFrame,
    group_cols: list[str],
    sum_cols: list[str],
) -> DataFrame:
    """Merge signed deltas into a state frame; zero-count groups drop
    out. Null-safe on group columns (a null group value is a group)."""
    _check_cols(group_cols, sum_cols)
    joined = state.alias("s").join(
        delta.alias("d"),
        [state[c].eqNullSafe(delta[c]) for c in group_cols],
        "full_outer",
    )
    zero = F.lit(0).cast("long")
    out = joined.select(
        *[
            F.coalesce(F.col(f"s.{c}"), F.col(f"d.{c}")).alias(c)
            for c in group_cols
        ],
        (
            F.coalesce(F.col(f"s.{_COUNT}"), zero)
            + F.coalesce(F.col(f"d.d_{_COUNT}"), zero)
        ).alias(_COUNT),
        *[
            (
                F.coalesce(F.col(f"s.sum_{c}"), zero)
                + F.coalesce(F.col(f"d.d_sum_{c}"), zero)
            ).alias(f"sum_{c}")
            for c in sum_cols
        ],
    )
    return out.filter(F.col(_COUNT) != 0)


def refresh_aggregate(
    spark: SparkSession,
    table_dir: str,
    state: DataFrame,
    from_snapshot: int,
    group_cols: list[str],
    sum_cols: list[str],
    to_snapshot: int | None = None,
) -> DataFrame:
    """One refresh step: state maintained at ``from_snapshot`` ->
    state at ``to_snapshot`` (default head). Reads only the diff
    (changed partitions); never rescans the table."""
    diff = table_diff(
        spark, table_dir, from_snapshot, to_snapshot, include_values=True
    )
    return apply_delta(
        state, delta_from_diff(diff, group_cols, sum_cols), group_cols, sum_cols
    )


def full_state(
    spark: SparkSession,
    table_dir: str,
    group_cols: list[str],
    sum_cols: list[str],
    snapshot: int | None = None,
) -> DataFrame:
    """``aggregate_state`` over a (possibly time-traveled) table read —
    the bootstrap and the recompute used to certify a refresh chain."""
    _check_cols(group_cols, sum_cols)
    t = read_table(spark, table_dir, snapshot=snapshot)
    if t is None:
        raise ValueError(f"full_state: empty/unknown table at {table_dir}")
    # A sum column added by later schema evolution is absent from a
    # pre-evolution snapshot read; surface it as null (= the mergeSchema
    # read semantics), which aggregate_state coalesces to 0 — matching
    # what the diff's null preimages contribute.
    for c in sum_cols:
        if c not in t.columns:
            t = t.withColumn(c, F.lit(None).cast("long"))
    missing = [c for c in group_cols if c not in t.columns]
    if missing:
        raise ValueError(f"full_state: group columns {missing} not in table")
    return aggregate_state(t, group_cols, sum_cols)


# ---------------------------------------------------------------------------
# MIN/MAX: the hybrid (incremental + group-rescan) maintenance
# ---------------------------------------------------------------------------
#
# MIN/MAX are not self-maintainable: deleting a group's extremum needs
# a rescan of that group BY DEFINITION (the runner-up is not in the
# state). The hybrid completes the aggregate family honestly:
#
# - inserts and arriving update postimages maintain incrementally
#   (least/greatest of state and candidate — exact);
# - a refresh rescans ONLY the groups where a LEAVING preimage touched
#   the stored extremum (value <= min or >= max) and the group still
#   has rows. Everything else never rereads the table.
#
# Cost: O(changes) + one filtered scan of the endangered groups' data.
# Group by the partition column and the rescan is partition-pruned;
# the common refresh (no extremum deleted) does ZERO table reads — the
# empty-endangered fast path is checked driver-side on a frame bounded
# by the diff's group count.


def extrema_state(
    table_df: DataFrame, group_cols: list[str], ext_cols: list[str]
) -> DataFrame:
    """Full recompute: one row per group with ``n_rows`` plus
    ``min_<c>`` / ``max_<c>`` for each extremum column (exact BIGINT;
    null iff every value in the group is null)."""
    _check_cols(group_cols, ext_cols, extrema=True)
    _check_sum_dtypes(table_df, ext_cols, "extrema_state")
    return table_df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).cast("long").alias(_COUNT),
        *[
            agg
            for c in ext_cols
            for agg in (
                F.min(F.col(c).cast("long")).alias(f"min_{c}"),
                F.max(F.col(c).cast("long")).alias(f"max_{c}"),
            )
        ],
    )


def full_extrema(
    spark: SparkSession,
    table_dir: str,
    group_cols: list[str],
    ext_cols: list[str],
    snapshot: int | None = None,
) -> DataFrame:
    """``extrema_state`` over a (possibly time-traveled) table read."""
    t = read_table(spark, table_dir, snapshot=snapshot)
    if t is None:
        raise ValueError(f"full_extrema: empty/unknown table at {table_dir}")
    for c in ext_cols:
        if c not in t.columns:
            t = t.withColumn(c, F.lit(None).cast("long"))
    return extrema_state(t, group_cols, ext_cols)


def refresh_extrema(
    spark: SparkSession,
    table_dir: str,
    state: DataFrame,
    from_snapshot: int,
    group_cols: list[str],
    ext_cols: list[str],
    to_snapshot: int | None = None,
) -> DataFrame:
    """One MIN/MAX refresh step: state at ``from_snapshot`` -> state at
    ``to_snapshot`` (default head). Incremental for everything except
    groups whose stored extremum was touched by a leaving preimage —
    exactly those are recomputed from the live table (see the section
    comment for the cost model)."""
    _check_cols(group_cols, ext_cols, extrema=True)
    diff = table_diff(
        spark, table_dir, from_snapshot, to_snapshot, include_values=True
    )
    have = set(diff.columns)

    def image(c: str, side: str):
        tagged = f"{side}_{c}"
        if tagged in have:
            return F.col(tagged)
        if c in have:  # key column: stable across a change
            return F.col(c)
        raise ValueError(
            f"refresh_extrema: column {c!r} not in diff (was the diff "
            "built with include_values=True?)"
        )

    # signed row-count delta rides the existing sum machinery
    cnt_delta = delta_from_diff(diff, group_cols, [])

    # arriving postimages: per-group extremum candidates (exact to merge)
    post = (
        diff.filter(F.col("change_type") != "delete")
        .groupBy(*[image(c, "new").alias(c) for c in group_cols])
        .agg(
            *[
                agg
                for c in ext_cols
                for agg in (
                    F.min(image(c, "new").cast("long")).alias(f"cand_min_{c}"),
                    F.max(image(c, "new").cast("long")).alias(f"cand_max_{c}"),
                )
            ]
        )
    )

    # leaving preimages: endangered iff the value ties or beats the
    # stored extremum (<= min catches ties — several rows can share the
    # extremum and ONE leaving is already unsafe to keep incrementally)
    pre = diff.filter(F.col("change_type") != "insert").select(
        *[image(c, "old").alias(c) for c in group_cols],
        *[image(c, "old").cast("long").alias(f"_lv_{c}") for c in ext_cols],
    )
    p, st = pre.alias("p"), state.alias("st")
    cond = [
        F.col(f"p.{c}").eqNullSafe(F.col(f"st.{c}")) for c in group_cols
    ]
    touch = F.lit(False)
    for c in ext_cols:
        v = F.col(f"p._lv_{c}")
        touch = touch | (
            v.isNotNull()
            & ((v <= F.col(f"st.min_{c}")) | (v >= F.col(f"st.max_{c}")))
        )
    endangered = (
        p.join(st, cond, "inner")
        .filter(touch)
        .select(*[F.col(f"p.{c}") for c in group_cols])
        .distinct()
        .localCheckpoint()  # consumed by anti-join + semi-join below
    )

    # incremental path: count via signed delta, extrema via least/greatest
    s, d = state.alias("s"), cnt_delta.alias("d")
    base = s.join(
        d,
        [F.col(f"s.{c}").eqNullSafe(F.col(f"d.{c}")) for c in group_cols],
        "full_outer",
    )
    zero = F.lit(0).cast("long")
    incremental = (
        base.join(
            post.alias("po"),
            [
                F.coalesce(F.col(f"s.{c}"), F.col(f"d.{c}")).eqNullSafe(
                    F.col(f"po.{c}")
                )
                for c in group_cols
            ],
            "left",
        )
        .select(
            *[
                F.coalesce(F.col(f"s.{c}"), F.col(f"d.{c}")).alias(c)
                for c in group_cols
            ],
            (
                F.coalesce(F.col(f"s.{_COUNT}"), zero)
                + F.coalesce(F.col(f"d.d_{_COUNT}"), zero)
            ).alias(_COUNT),
            *[
                col
                for c in ext_cols
                for col in (
                    F.least(F.col(f"s.min_{c}"), F.col(f"po.cand_min_{c}"))
                    .alias(f"min_{c}"),
                    F.greatest(F.col(f"s.max_{c}"), F.col(f"po.cand_max_{c}"))
                    .alias(f"max_{c}"),
                )
            ],
        )
        .filter(F.col(_COUNT) != 0)
    )

    # empty-endangered fast path: ZERO table reads on the common refresh
    # (the frame is bounded by the diff's changed-group count, so the
    # existence probe is one tiny job, not a collect of unbounded keys)
    if not endangered.limit(1).count():
        return incremental

    head = read_table(spark, table_dir, snapshot=to_snapshot)
    if head is None:  # table fully deleted: nothing left to rescan
        return incremental
    for c in ext_cols:
        if c not in head.columns:
            head = head.withColumn(c, F.lit(None).cast("long"))
    e = endangered.alias("e")
    rescan = extrema_state(
        head.alias("h").join(
            F.broadcast(e),
            [F.col(f"h.{c}").eqNullSafe(F.col(f"e.{c}")) for c in group_cols],
            "left_semi",
        ),
        group_cols,
        ext_cols,
    )
    kept = incremental.alias("i").join(
        F.broadcast(e),
        [F.col(f"i.{c}").eqNullSafe(F.col(f"e.{c}")) for c in group_cols],
        "left_anti",
    )
    return kept.unionByName(rescan)


# ---------------------------------------------------------------------------
# Persisted materialized aggregate (incremental materialized view)
# ---------------------------------------------------------------------------
#
# The refresh loop above is in-memory; production wants the state to
# SURVIVE — a materialized view with incremental refresh. Same
# publication discipline as merge.py: state versions are immutable
# uniquely-named directories, and each meta version is CLAIMED through
# the hardlink O_EXCL CAS (storage/cas.py) — two concurrent refreshers
# cannot both publish version N, so a slower refresher can never
# regress the cursor over a faster one's result (a last-writer-wins
# pointer swap could). The loser raises ConcurrentRefreshError and
# simply re-reads + retries; a crash between state write and meta
# claim leaves an unreferenced state dir that vacuum reaps after a
# grace period, with the previous state still readable throughout.


class ConcurrentRefreshError(RuntimeError):
    """Another refresher published this meta version first. Re-read
    the aggregate and retry (often a no-op: the winner already reached
    the head)."""


def _metas_dir(agg_dir: str) -> str:
    return os.path.join(agg_dir, "_metas")


def _read_meta(agg_dir: str) -> dict | None:
    """Highest claimed meta version — the published state."""
    try:
        names = os.listdir(_metas_dir(agg_dir))
    except FileNotFoundError:
        return None
    best = -1
    for n in names:
        if n.startswith("meta-") and n.endswith(".json"):
            try:
                best = max(best, int(n[5:-5]))
            except ValueError:
                continue
    if best < 0:
        return None
    with open(os.path.join(_metas_dir(agg_dir), f"meta-{best}.json")) as f:
        return json.load(f)


def _publish(
    spark: SparkSession,
    state: DataFrame,
    agg_dir: str,
    snapshot: int,
    version: int,
    group_cols: list[str],
    sum_cols: list[str],
    agg_kind: str = "sum",
) -> dict:
    import uuid

    from .cas import HardlinkSlotStore

    rel = f"s-{uuid.uuid4().hex[:12]}"  # unique per attempt: racing
    # refreshers never write into each other's state directories
    state.write.mode("errorifexists").parquet(os.path.join(agg_dir, rel))
    meta = {
        "kind": "materialized_aggregate",
        # "sum" = COUNT/SUM self-maintainable state; "extrema" =
        # MIN/MAX hybrid state (sum_cols then holds the extremum
        # columns — the key name is kept stable for old metas, which
        # predate agg_kind and read back as "sum")
        "agg_kind": agg_kind,
        "snapshot": snapshot,
        "version": version,
        "state": rel,
        "group_cols": list(group_cols),
        "sum_cols": list(sum_cols),
    }
    os.makedirs(_metas_dir(agg_dir), exist_ok=True)
    won = HardlinkSlotStore(_metas_dir(agg_dir)).put_if_absent(
        f"meta-{version}.json", json.dumps(meta, sort_keys=True).encode()
    )
    if not won:
        raise ConcurrentRefreshError(
            f"materialized-aggregate version {version} was published by a "
            f"concurrent refresher; re-read and retry"
        )
    return meta


def create_materialized_aggregate(
    spark: SparkSession,
    table_dir: str,
    agg_dir: str,
    group_cols: list[str],
    sum_cols: list[str],
    snapshot: int | None = None,
    agg_kind: str = "sum",
) -> dict:
    """Bootstrap: full aggregate at the table's head (or ``snapshot``),
    persisted under ``agg_dir`` behind an atomic meta pointer.
    ``agg_kind="extrema"`` bootstraps a MIN/MAX state instead of
    COUNT/SUM (``sum_cols`` then names the extremum columns); its
    refreshes take the hybrid path (see ``refresh_extrema``)."""
    from .merge import _head_manifest  # head id for the cursor

    if agg_kind not in ("sum", "extrema"):
        raise ValueError(f"unknown agg_kind {agg_kind!r}")
    _check_cols(group_cols, sum_cols, extrema=agg_kind == "extrema")
    if _read_meta(agg_dir) is not None:
        raise ValueError(f"materialized aggregate already exists: {agg_dir}")
    head = _head_manifest(table_dir)
    if head is None:
        raise ValueError(f"create_materialized_aggregate: no table at {table_dir}")
    snap = head["snapshot"] if snapshot is None else snapshot
    bootstrap = full_extrema if agg_kind == "extrema" else full_state
    state = bootstrap(spark, table_dir, group_cols, sum_cols, snapshot=snap)
    os.makedirs(agg_dir, exist_ok=True)
    return _publish(
        spark, state, agg_dir, snap, 1, group_cols, sum_cols, agg_kind
    )


def create_materialized_extrema(
    spark: SparkSession,
    table_dir: str,
    agg_dir: str,
    group_cols: list[str],
    ext_cols: list[str],
    snapshot: int | None = None,
) -> dict:
    """MIN/MAX materialized view — sugar for
    ``create_materialized_aggregate(..., agg_kind="extrema")``."""
    return create_materialized_aggregate(
        spark, table_dir, agg_dir, group_cols, ext_cols,
        snapshot=snapshot, agg_kind="extrema",
    )


def read_materialized_aggregate(
    spark: SparkSession, agg_dir: str, version: int | None = None
) -> DataFrame:
    """The published state — or, with ``version=N``, the state exactly
    as published at version N (time travel along the refresh history;
    raises if that version's state dir was vacuumed). Metas are tiny
    and kept forever; vacuum reclaims only state DIRECTORIES."""
    if version is None:
        meta = _read_meta(agg_dir)
        if meta is None:
            raise ValueError(f"no materialized aggregate at {agg_dir}")
    else:
        try:
            with open(
                os.path.join(_metas_dir(agg_dir), f"meta-{version}.json")
            ) as f:
                meta = json.load(f)
        except FileNotFoundError:
            raise ValueError(
                f"no published version {version} at {agg_dir}"
            ) from None
    state_dir = os.path.join(agg_dir, meta["state"])
    if not os.path.isdir(state_dir):
        raise ValueError(
            f"version {meta['version']}'s state was vacuumed from {agg_dir}"
        )
    return spark.read.parquet(state_dir)


def refresh_materialized_aggregate(
    spark: SparkSession,
    table_dir: str,
    agg_dir: str,
    rebootstrap_on_gap: bool = False,
) -> dict:
    """Advance the persisted state from its cursor snapshot to the
    table head by replaying the change feed (cost: O(changed
    partitions), never table history). Head == cursor is a no-op (the
    published meta is returned unchanged — safe to call on a timer or
    after every streaming micro-batch). If the cursor snapshot has
    been vacuumed away (diff base unknown), raises — or, with
    ``rebootstrap_on_gap``, falls back to one full recompute and
    publishes that (the documented recovery path). Dispatches on the
    meta's ``agg_kind``: COUNT/SUM states refresh via the pure change
    feed, MIN/MAX states via the hybrid ``refresh_extrema`` (which
    additionally rescans extremum-endangered groups).

    Concurrency: the meta claim is single-winner (hardlink CAS); a
    racing refresher raises ``ConcurrentRefreshError`` — re-call this
    function, which re-reads the winner's cursor (usually a no-op)."""
    from .merge import _head_manifest

    meta = _read_meta(agg_dir)
    if meta is None:
        raise ValueError(f"no materialized aggregate at {agg_dir}")
    head = _head_manifest(table_dir)
    if head is None:
        raise ValueError(f"refresh_materialized_aggregate: no table at {table_dir}")
    if head["snapshot"] == meta["snapshot"]:
        return meta
    if head["snapshot"] < meta["snapshot"]:
        raise ValueError(
            f"aggregate cursor {meta['snapshot']} is ahead of table head "
            f"{head['snapshot']} — wrong table?"
        )
    group_cols, sum_cols = meta["group_cols"], meta["sum_cols"]
    # metas written before agg_kind existed are COUNT/SUM states
    agg_kind = meta.get("agg_kind", "sum")
    do_refresh = refresh_extrema if agg_kind == "extrema" else refresh_aggregate
    do_full = full_extrema if agg_kind == "extrema" else full_state
    state = read_materialized_aggregate(spark, agg_dir)
    try:
        new_state = do_refresh(
            spark,
            table_dir,
            state,
            meta["snapshot"],
            group_cols,
            sum_cols,
            to_snapshot=head["snapshot"],
        )
    except SnapshotGoneError:
        # ONLY the vacuumed-diff-base condition triggers the recovery
        # recompute; any other ValueError (wrong table, bad columns,
        # non-summable dtype) is a real bug and must propagate.
        if not rebootstrap_on_gap:
            raise
        new_state = do_full(
            spark, table_dir, group_cols, sum_cols, snapshot=head["snapshot"]
        )
    return _publish(
        spark,
        new_state,
        agg_dir,
        head["snapshot"],
        meta["version"] + 1,
        group_cols,
        sum_cols,
        agg_kind,
    )


def vacuum_materialized_aggregate(
    agg_dir: str, keep: int = 2, retain_seconds: float = 3600.0
) -> list[str]:
    """Remove state dirs NOT referenced by the newest ``keep`` metas
    (default keeps the published state plus its predecessor for
    in-flight readers) and idle longer than ``retain_seconds`` — the
    grace that protects a refresher that has written its state dir but
    not yet claimed its meta (mirroring merge.py's vacuum). Crashed-
    attempt debris and losing racers are reaped here. Returns removed
    relative dirs; never touches a referenced state."""
    if keep < 1:
        raise ValueError("keep must be >= 1")
    meta = _read_meta(agg_dir)
    if meta is None:
        raise ValueError(f"no materialized aggregate at {agg_dir}")
    keep_rel = set()
    for v in range(meta["version"], max(0, meta["version"] - keep), -1):
        try:
            with open(
                os.path.join(_metas_dir(agg_dir), f"meta-{v}.json")
            ) as f:
                keep_rel.add(json.load(f)["state"])
        except FileNotFoundError:
            continue
    removed = []
    now = time.time()
    for name in sorted(os.listdir(agg_dir)):
        if not name.startswith("s-") or name in keep_rel:
            continue
        path = os.path.join(agg_dir, name)
        newest = max(
            (
                os.path.getmtime(os.path.join(root, f))
                for root, _, files in os.walk(path)
                for f in files
            ),
            default=os.path.getmtime(path),
        )
        if now - newest >= retain_seconds:
            shutil.rmtree(path)
            removed.append(name)
    return removed


def _check_cols(
    group_cols: list[str], sum_cols: list[str], extrema: bool = False
) -> None:
    if not group_cols:
        raise ValueError("ivm: need at least one group column")
    overlap = set(group_cols) & set(sum_cols)
    if overlap:
        raise ValueError(f"ivm: columns both grouped and summed: {overlap}")
    # each KIND owns its own state-schema prefixes; a group column with
    # those names would silently collide in the state select. The
    # reserved set is per-kind on purpose — widening the SUM set would
    # break refresh of pre-existing persisted views whose group column
    # legally used e.g. 'min_level' before the extrema kind existed.
    # The extrema set INCLUDES sum_/d_: its refresh rides
    # delta_from_diff for the count (d_n_rows), so a d_-prefixed group
    # column must fail at CREATE, not at the first refresh.
    reserved = (
        ("sum_", "d_", "min_", "max_", "cand_", "_lv_")
        if extrema
        else ("sum_", "d_")
    )
    bad = [
        c for c in group_cols if c == _COUNT or c.startswith(reserved)
    ]
    if bad:
        raise ValueError(
            f"ivm: group column names reserved by the state schema: {bad}"
        )


def _check_sum_dtypes(df: DataFrame, sum_cols: list[str], what: str) -> None:
    """Only exact integral sums are maintainable (the module's no-
    float rule); a double column would silently truncate through the
    cast("long") instead of failing loudly."""
    for c in sum_cols:
        if c not in df.columns:
            continue  # absent = evolved-in later; nulls sum to 0
        dt = dict(df.dtypes)[c]
        if dt not in ("bigint", "int", "smallint", "tinyint", "long"):
            raise ValueError(
                f"{what}: sum column {c!r} has non-integral type {dt}; "
                "maintain integer units (e.g. cents) instead"
            )
