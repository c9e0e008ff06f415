"""Incremental view maintenance (storage/ivm.py) over merge tables.

The contract: after ANY chain of merges, a state maintained purely
from change feeds equals a full recompute on the head — including
group migration, delete-to-zero groups, and schema-evolved columns.
"""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from factstore_spark.storage.ivm import (
    aggregate_state,
    apply_delta,
    delta_from_diff,
    full_state,
    refresh_aggregate,
)
from factstore_spark.storage.merge import (
    create_table,
    merge_upsert,
    table_diff,
)


@pytest.fixture()
def tdir():
    d = tempfile.mkdtemp(prefix="ivm-tbl-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _rows(df):
    rows = [tuple(r[c] for c in sorted(df.columns)) for r in df.collect()]
    return sorted(rows, key=lambda t: tuple((x is None, x) for x in t))


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "k long, part string, grp string, v long, is_deleted boolean"
    ).select("k", "part", "grp", "v", "is_deleted")


def _base(spark, tdir):
    base = _mk(
        spark,
        [
            (1, "p1", "a", 10, False),
            (2, "p1", "a", 20, False),
            (3, "p2", "b", 30, False),
            (4, "p2", "b", 40, False),
        ],
    ).drop("is_deleted")
    create_table(base, tdir, ["k"], "part")
    return base


def test_incremental_equals_full_after_each_snapshot(spark, tdir):
    _base(spark, tdir)
    state = full_state(spark, tdir, ["grp"], ["v"], snapshot=1)

    # snapshot 2: update (value), insert, delete
    merge_upsert(
        _mk(
            spark,
            [
                (1, "p1", "a", 15, False),   # update value
                (5, "p2", "b", 50, False),   # insert
                (3, "p2", "b", 30, True),    # delete
            ],
        ),
        tdir,
        delete_col="is_deleted",
    )
    state = refresh_aggregate(spark, tdir, state, 1, ["grp"], ["v"])
    assert _rows(state) == _rows(full_state(spark, tdir, ["grp"], ["v"]))

    # snapshot 3: group migration (grp a -> b) + another insert
    merge_upsert(
        _mk(
            spark,
            [
                (2, "p1", "b", 20, False),   # migrates group a -> b
                (6, "p1", "c", 60, False),   # new group
            ],
        ),
        tdir,
        delete_col="is_deleted",
    )
    state = refresh_aggregate(spark, tdir, state, 2, ["grp"], ["v"])
    full = full_state(spark, tdir, ["grp"], ["v"])
    assert _rows(state) == _rows(full)
    got = {r["grp"]: (r["n_rows"], r["sum_v"]) for r in state.collect()}
    assert got == {"a": (1, 15), "b": (3, 110), "c": (1, 60)}


def test_delete_to_zero_group_drops_out(spark, tdir):
    _base(spark, tdir)
    state = full_state(spark, tdir, ["grp"], ["v"], snapshot=1)
    merge_upsert(
        _mk(
            spark,
            [(3, "p2", "b", 30, True), (4, "p2", "b", 40, True)],
        ),
        tdir,
        delete_col="is_deleted",
    )
    state = refresh_aggregate(spark, tdir, state, 1, ["grp"], ["v"])
    assert {r["grp"] for r in state.collect()} == {"a"}
    assert _rows(state) == _rows(full_state(spark, tdir, ["grp"], ["v"]))


def test_group_by_key_column_and_multi_sum(spark, tdir):
    """Group cols may be the merge key itself (carried bare in the
    diff); multiple sum columns ride one delta pass."""
    base = spark.createDataFrame(
        [(1, "p1", 10, 1), (2, "p1", 20, 2)], "k long, part string, v long, w long"
    )
    create_table(base, tdir, ["k"], "part")
    state = full_state(spark, tdir, ["k"], ["v", "w"], snapshot=1)
    merge_upsert(
        spark.createDataFrame(
            [(1, "p1", 11, 5, False), (3, "p1", 30, 3, False)],
            "k long, part string, v long, w long, is_deleted boolean",
        ),
        tdir,
        delete_col="is_deleted",
    )
    state = refresh_aggregate(spark, tdir, state, 1, ["k"], ["v", "w"])
    assert _rows(state) == _rows(full_state(spark, tdir, ["k"], ["v", "w"]))


def test_diff_include_values_images(spark, tdir):
    _base(spark, tdir)
    merge_upsert(
        _mk(
            spark,
            [
                (1, "p1", "a", 15, False),
                (5, "p2", "b", 50, False),
                (3, "p2", "b", 30, True),
            ],
        ),
        tdir,
        delete_col="is_deleted",
    )
    d = {
        r["k"]: r
        for r in table_diff(spark, tdir, 1, include_values=True).collect()
    }
    assert d[1]["change_type"] == "update"
    assert (d[1]["old_v"], d[1]["new_v"]) == (10, 15)
    assert d[5]["change_type"] == "insert"
    assert d[5]["old_v"] is None and d[5]["new_v"] == 50
    assert d[3]["change_type"] == "delete"
    assert d[3]["old_v"] == 30 and d[3]["new_v"] is None


def test_empty_diff_yields_noop_refresh(spark, tdir):
    _base(spark, tdir)
    state = full_state(spark, tdir, ["grp"], ["v"], snapshot=1)
    # diff head -> head is empty
    out = refresh_aggregate(
        spark, tdir, state, 1, ["grp"], ["v"], to_snapshot=1
    )
    assert _rows(out) == _rows(state)


def test_null_group_values_are_a_group(spark, tdir):
    base = spark.createDataFrame(
        [(1, "p1", None, 10), (2, "p1", "a", 20)],
        "k long, part string, grp string, v long",
    )
    create_table(base, tdir, ["k"], "part")
    state = full_state(spark, tdir, ["grp"], ["v"], snapshot=1)
    merge_upsert(
        spark.createDataFrame(
            [(3, "p1", None, 30, False)],
            "k long, part string, grp string, v long, is_deleted boolean",
        ),
        tdir,
        delete_col="is_deleted",
    )
    state = refresh_aggregate(spark, tdir, state, 1, ["grp"], ["v"])
    assert _rows(state) == _rows(full_state(spark, tdir, ["grp"], ["v"]))
    got = {r["grp"]: (r["n_rows"], r["sum_v"]) for r in state.collect()}
    assert got[None] == (2, 40)


def test_schema_evolution_new_sum_column(spark, tdir):
    """A column added by merge_schema=True: old images are null -> the
    delta treats them as 0, matching the recompute's coalesce."""
    base = spark.createDataFrame(
        [(1, "p1", 10), (2, "p1", 20)], "k long, part string, v long"
    )
    create_table(base, tdir, ["k"], "part")
    merge_upsert(
        spark.createDataFrame(
            [(1, "p1", 11, 100, False), (3, "p1", 30, 300, False)],
            "k long, part string, v long, extra long, is_deleted boolean",
        ),
        tdir,
        delete_col="is_deleted",
        merge_schema=True,
    )
    state = full_state(spark, tdir, ["part"], ["v", "extra"], snapshot=1)
    state = refresh_aggregate(spark, tdir, state, 1, ["part"], ["v", "extra"])
    assert _rows(state) == _rows(
        full_state(spark, tdir, ["part"], ["v", "extra"])
    )


def test_validation_errors(spark, tdir):
    _base(spark, tdir)
    with pytest.raises(ValueError, match="group column"):
        full_state(spark, tdir, [], ["v"])
    with pytest.raises(ValueError, match="grouped and summed"):
        full_state(spark, tdir, ["v"], ["v"])
    merge_upsert(
        _mk(spark, [(1, "p1", "a", 15, False)]), tdir, delete_col="is_deleted"
    )
    with pytest.raises(ValueError, match="include_values"):
        delta_from_diff(
            table_diff(spark, tdir, 1, include_values=False), ["grp"], ["v"]
        )


def test_refresh_is_pure_no_table_rescan(spark, tdir):
    """The refresh plan reads only diff-side version dirs: with a
    merge touching one partition of two, the other partition's files
    never appear in the refresh's input files."""
    base = spark.createDataFrame(
        [(1, "p1", "a", 10), (2, "p2", "b", 20)],
        "k long, part string, grp string, v long",
    )
    create_table(base, tdir, ["k"], "part")
    state = full_state(spark, tdir, ["grp"], ["v"], snapshot=1)
    merge_upsert(
        spark.createDataFrame(
            [(1, "p1", "a", 11, False)],
            "k long, part string, grp string, v long, is_deleted boolean",
        ),
        tdir,
        delete_col="is_deleted",
    )
    diff = table_diff(spark, tdir, 1, include_values=True)
    files = diff.inputFiles()
    assert files, "diff should read the changed partition"
    assert all("part=p2" not in f for f in files), files
    out = apply_delta(
        state, delta_from_diff(diff, ["grp"], ["v"]), ["grp"], ["v"]
    )
    assert _rows(out) == _rows(full_state(spark, tdir, ["grp"], ["v"]))


# ---------------------------------------------------------------------------
# Persisted materialized aggregate (incremental materialized view)
# ---------------------------------------------------------------------------

from factstore_spark.storage.ivm import (  # noqa: E402
    create_materialized_aggregate,
    read_materialized_aggregate,
    refresh_materialized_aggregate,
    vacuum_materialized_aggregate,
)


@pytest.fixture()
def adir():
    d = tempfile.mkdtemp(prefix="ivm-agg-")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_materialized_bootstrap_refresh_equals_recompute(spark, tdir, adir):
    _base(spark, tdir)
    meta = create_materialized_aggregate(
        spark, tdir, adir, ["grp"], ["v"]
    )
    assert (meta["snapshot"], meta["version"]) == (1, 1)
    merge_upsert(
        _mk(
            spark,
            [
                (1, "p1", "a", 15, False),
                (5, "p2", "b", 50, False),
                (3, "p2", "b", 30, True),
            ],
        ),
        tdir,
        delete_col="is_deleted",
    )
    meta = refresh_materialized_aggregate(spark, tdir, adir)
    assert (meta["snapshot"], meta["version"]) == (2, 2)
    got = read_materialized_aggregate(spark, adir)
    assert _rows(got) == _rows(full_state(spark, tdir, ["grp"], ["v"]))


def test_refresh_at_head_is_noop(spark, tdir, adir):
    import os

    _base(spark, tdir)
    m1 = create_materialized_aggregate(spark, tdir, adir, ["grp"], ["v"])
    m2 = refresh_materialized_aggregate(spark, tdir, adir)
    assert m2 == m1  # same published meta, no new state dir
    assert len([n for n in os.listdir(adir) if n.startswith("s-")]) == 1


def test_crashed_refresh_leaves_previous_state_readable(spark, tdir, adir):
    """Simulate a crash between state write and meta claim: debris
    s-* dir exists, highest meta still points at the old state —
    reads see the old state, the retried refresh publishes version 2
    into a FRESH dir, and vacuum (grace elapsed) reaps the debris."""
    import os

    _base(spark, tdir)
    create_materialized_aggregate(spark, tdir, adir, ["grp"], ["v"])
    merge_upsert(
        _mk(spark, [(1, "p1", "a", 99, False)]), tdir, delete_col="is_deleted"
    )
    # plant crashed-attempt debris (state dir written, meta never claimed)
    os.makedirs(os.path.join(adir, "s-deadbeef0000"))
    with open(os.path.join(adir, "s-deadbeef0000", "junk"), "w") as f:
        f.write("crashed attempt")
    before = read_materialized_aggregate(spark, adir)
    assert _rows(before) == _rows(
        full_state(spark, tdir, ["grp"], ["v"], snapshot=1)
    )
    meta = refresh_materialized_aggregate(spark, tdir, adir)
    assert meta["version"] == 2
    got = read_materialized_aggregate(spark, adir)
    assert _rows(got) == _rows(full_state(spark, tdir, ["grp"], ["v"]))
    removed = vacuum_materialized_aggregate(adir, keep=2, retain_seconds=0.0)
    assert removed == ["s-deadbeef0000"]


def test_rebootstrap_on_vacuumed_gap(spark, tdir, adir):
    from factstore_spark.storage.merge import vacuum_table

    _base(spark, tdir)
    create_materialized_aggregate(spark, tdir, adir, ["grp"], ["v"])
    merge_upsert(
        _mk(spark, [(1, "p1", "a", 15, False)]), tdir, delete_col="is_deleted"
    )
    merge_upsert(
        _mk(spark, [(2, "p1", "a", 25, False)]), tdir, delete_col="is_deleted"
    )
    vacuum_table(tdir, retain_seconds=0.0, retain_snapshots=1)
    with pytest.raises(ValueError):
        refresh_materialized_aggregate(spark, tdir, adir)
    meta = refresh_materialized_aggregate(
        spark, tdir, adir, rebootstrap_on_gap=True
    )
    assert meta["snapshot"] == 3
    got = read_materialized_aggregate(spark, adir)
    assert _rows(got) == _rows(full_state(spark, tdir, ["grp"], ["v"]))


def test_vacuum_keeps_referenced_states(spark, tdir, adir):
    import os

    _base(spark, tdir)
    create_materialized_aggregate(spark, tdir, adir, ["grp"], ["v"])
    for cents in [11, 12, 13]:
        merge_upsert(
            _mk(spark, [(1, "p1", "a", cents, False)]),
            tdir,
            delete_col="is_deleted",
        )
        refresh_materialized_aggregate(spark, tdir, adir)
    # 4 published states; keep the newest 2, grace waived
    removed = vacuum_materialized_aggregate(adir, keep=2, retain_seconds=0.0)
    assert len(removed) == 2
    assert len([n for n in os.listdir(adir) if n.startswith("s-")]) == 2
    got = read_materialized_aggregate(spark, adir)
    assert _rows(got) == _rows(full_state(spark, tdir, ["grp"], ["v"]))
    # grace: a fresh unreferenced dir survives a graceful vacuum
    os.makedirs(os.path.join(adir, "s-freshattempt"))
    assert vacuum_materialized_aggregate(adir, keep=2) == []


def test_materialized_errors(spark, tdir, adir):
    _base(spark, tdir)
    with pytest.raises(ValueError, match="no materialized aggregate"):
        refresh_materialized_aggregate(spark, tdir, adir)
    create_materialized_aggregate(spark, tdir, adir, ["grp"], ["v"])
    with pytest.raises(ValueError, match="already exists"):
        create_materialized_aggregate(spark, tdir, adir, ["grp"], ["v"])
    with pytest.raises(ValueError, match="keep must be"):
        vacuum_materialized_aggregate(adir, keep=0)


def test_streaming_merge_feeds_materialized_aggregate(spark, tdir, adir):
    """The streaming composition: start_merge_stream lands micro-
    batches into the table; refresh_materialized_aggregate after the
    drain advances the view incrementally; result equals a full
    recompute."""
    import os

    from factstore_spark.storage.merge import start_merge_stream

    _base(spark, tdir)
    create_materialized_aggregate(spark, tdir, adir, ["grp"], ["v"])

    src_dir = tempfile.mkdtemp(prefix="ivm-stream-src-")
    chk_dir = tempfile.mkdtemp(prefix="ivm-stream-chk-")
    try:
        batch = _mk(
            spark,
            [
                (1, "p1", "a", 100, False),
                (7, "p2", "c", 70, False),
                (4, "p2", "b", 40, True),
            ],
        )
        batch.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(batch.schema).parquet(src_dir)
        q = start_merge_stream(
            stream, tdir, chk_dir, delete_col="is_deleted", available_now=True
        )
        q.awaitTermination(120)
        meta = refresh_materialized_aggregate(spark, tdir, adir)
        assert meta["snapshot"] >= 2
        got = read_materialized_aggregate(spark, adir)
        assert _rows(got) == _rows(full_state(spark, tdir, ["grp"], ["v"]))
        gm = {r["grp"]: (r["n_rows"], r["sum_v"]) for r in got.collect()}
        assert gm["c"] == (1, 70) and gm["b"] == (1, 30)
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(chk_dir, ignore_errors=True)


def test_reserved_and_float_columns_rejected(spark, tdir):
    base = spark.createDataFrame(
        [(1, "p1", 10, 1.5)], "k long, part string, v long, f double"
    )
    create_table(base, tdir, ["k"], "part")
    with pytest.raises(ValueError, match="reserved"):
        full_state(spark, tdir, ["n_rows"], ["v"])
    with pytest.raises(ValueError, match="non-integral"):
        full_state(spark, tdir, ["part"], ["f"])
    merge_upsert(
        spark.createDataFrame(
            [(2, "p1", 20, 2.5, False)],
            "k long, part string, v long, f double, is_deleted boolean",
        ),
        tdir,
        delete_col="is_deleted",
    )
    with pytest.raises(ValueError, match="non-integral"):
        delta_from_diff(
            table_diff(spark, tdir, 1, include_values=True), ["part"], ["f"]
        )


def test_model_based_random_merge_chain_matches_recompute(spark, tdir):
    """Model-based: a seeded random sequence of merge batches (mixed
    updates with value AND group changes, inserts, deletes — including
    re-inserts of previously-deleted keys) maintained purely through
    refresh_aggregate equals a full recompute after EVERY snapshot,
    and a Python dict model agrees with both."""
    import random

    rnd = random.Random(20260815)
    groups = ["a", "b", "c", None]
    parts = ["p1", "p2", "p3"]

    live = {}  # key -> (part, grp, v)   the Python model
    next_key = 100
    rows0 = []
    for _ in range(30):
        k = next_key
        next_key += 1
        row = (rnd.choice(parts), rnd.choice(groups), rnd.randrange(-50, 500))
        live[k] = row
        rows0.append((k, *row))
    base = spark.createDataFrame(
        rows0, "k long, part string, grp string, v long"
    )
    create_table(base, tdir, ["k"], "part")
    state = full_state(spark, tdir, ["grp"], ["v"], snapshot=1)

    for snap in range(2, 7):
        batch = []
        used = set()
        # updates (value and/or group; partition NEVER changes)
        for k in rnd.sample(sorted(live), min(8, len(live))):
            part, grp, v = live[k]
            ng = rnd.choice(groups) if rnd.random() < 0.5 else grp
            nv = rnd.randrange(-50, 500)
            live[k] = (part, ng, nv)
            batch.append((k, part, ng, nv, False))
            used.add(k)
        # deletes
        for k in rnd.sample(sorted(set(live) - used), 3):
            part, grp, v = live.pop(k)
            batch.append((k, part, grp, v, True))
            used.add(k)
        # inserts (fresh keys, and occasionally a resurrected key)
        for _ in range(4):
            if rnd.random() < 0.3:
                dead = [
                    k
                    for k in range(100, next_key)
                    if k not in live and k not in used
                ]
                k = rnd.choice(dead) if dead else next_key
            else:
                k = next_key
            if k == next_key:
                next_key += 1
            row = (
                rnd.choice(parts),
                rnd.choice(groups),
                rnd.randrange(-50, 500),
            )
            live[k] = row
            batch.append((k, *row, False))
            used.add(k)
        merge_upsert(
            spark.createDataFrame(
                batch,
                "k long, part string, grp string, v long, is_deleted boolean",
            ),
            tdir,
            delete_col="is_deleted",
        )
        state = refresh_aggregate(
            spark, tdir, state, snap - 1, ["grp"], ["v"]
        )
        # model expectation
        want = {}
        for part, grp, v in live.values():
            n, s = want.get(grp, (0, 0))
            want[grp] = (n + 1, s + v)
        got = {
            r["grp"]: (r["n_rows"], r["sum_v"]) for r in state.collect()
        }
        assert got == want, f"snapshot {snap}"
        assert _rows(state) == _rows(
            full_state(spark, tdir, ["grp"], ["v"])
        ), f"snapshot {snap} vs recompute"


def test_concurrent_refresh_single_winner(spark, tdir, adir):
    """Two refreshers racing to publish version 2: the hardlink CAS
    admits exactly one; the loser raises ConcurrentRefreshError, and
    its retry is a no-op that lands on the winner's (correct) state.
    A last-writer-wins pointer could regress the cursor here."""
    import threading

    from factstore_spark.storage.ivm import ConcurrentRefreshError

    _base(spark, tdir)
    create_materialized_aggregate(spark, tdir, adir, ["grp"], ["v"])
    merge_upsert(
        _mk(spark, [(1, "p1", "a", 77, False)]), tdir, delete_col="is_deleted"
    )
    results, errors = [], []
    gate = threading.Barrier(2)

    def run():
        try:
            gate.wait()
            results.append(refresh_materialized_aggregate(spark, tdir, adir))
        except ConcurrentRefreshError as e:
            errors.append(e)

    ts = [threading.Thread(target=run) for _ in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert len(results) + len(errors) == 2
    assert len(results) >= 1  # at least one won
    if errors:  # the loser's retry converges as a no-op
        meta = refresh_materialized_aggregate(spark, tdir, adir)
        assert meta["version"] == 2
    got = read_materialized_aggregate(spark, adir)
    assert _rows(got) == _rows(full_state(spark, tdir, ["grp"], ["v"]))


def test_one_sided_diff_values_and_refresh(spark, tdir, adir):
    """A merge that only INSERTS into a brand-new partition exercises
    table_diff's one-sided path (no a-side paths): change_type all
    insert, old_* typed nulls, and the IVM refresh still equals the
    recompute."""
    _base(spark, tdir)
    state = full_state(spark, tdir, ["grp"], ["v"], snapshot=1)
    merge_upsert(
        _mk(
            spark,
            [(8, "p9", "z", 80, False), (9, "p9", "z", 90, False)],
        ),
        tdir,
        delete_col="is_deleted",
    )
    diff = table_diff(spark, tdir, 1, include_values=True)
    rows = diff.collect()
    assert {r["change_type"] for r in rows} == {"insert"}
    assert all(r["old_v"] is None and r["old_grp"] is None for r in rows)
    assert {r["new_v"] for r in rows} == {80, 90}
    # the one-sided old_* columns must be TYPED (not NullType), or the
    # delta's long cast breaks
    assert dict(diff.dtypes)["old_v"] == "bigint"
    state = refresh_aggregate(spark, tdir, state, 1, ["grp"], ["v"])
    assert _rows(state) == _rows(full_state(spark, tdir, ["grp"], ["v"]))


def test_materialized_version_time_travel(spark, tdir, adir):
    _base(spark, tdir)
    create_materialized_aggregate(spark, tdir, adir, ["grp"], ["v"])
    v1 = _rows(read_materialized_aggregate(spark, adir))
    merge_upsert(
        _mk(spark, [(1, "p1", "a", 99, False)]), tdir, delete_col="is_deleted"
    )
    refresh_materialized_aggregate(spark, tdir, adir)
    # head moved; version 1 still reads the bootstrap state
    assert _rows(read_materialized_aggregate(spark, adir, version=1)) == v1
    assert _rows(read_materialized_aggregate(spark, adir)) == _rows(
        full_state(spark, tdir, ["grp"], ["v"])
    )
    with pytest.raises(ValueError, match="no published version 9"):
        read_materialized_aggregate(spark, adir, version=9)
    # vacuum the old state away: time travel fails LOUDLY, head fine
    merge_upsert(
        _mk(spark, [(2, "p1", "a", 5, False)]), tdir, delete_col="is_deleted"
    )
    refresh_materialized_aggregate(spark, tdir, adir)
    vacuum_materialized_aggregate(adir, keep=1, retain_seconds=0.0)
    with pytest.raises(ValueError, match="vacuumed"):
        read_materialized_aggregate(spark, adir, version=1)
    read_materialized_aggregate(spark, adir).collect()


# ---------------------------------------------------------------------------
# ADVICE r8: SnapshotGoneError discipline + evolved-column diff typing
# ---------------------------------------------------------------------------


def test_table_diff_unknown_snapshot_is_snapshot_gone(spark, tdir):
    from factstore_spark.storage.merge import SnapshotGoneError

    _base(spark, tdir)
    assert issubclass(SnapshotGoneError, ValueError)
    with pytest.raises(SnapshotGoneError):
        table_diff(spark, tdir, 99)


def test_rebootstrap_catches_only_snapshot_gone(spark, tdir, adir, monkeypatch):
    """rebootstrap_on_gap recovers from a vacuumed diff base ONLY; any
    other ValueError out of the incremental path (misconfigured
    columns, bad dtype, wrong table) must propagate, never be masked
    by a silent full recompute."""
    import factstore_spark.storage.ivm as ivm_mod

    _base(spark, tdir)
    create_materialized_aggregate(spark, tdir, adir, ["grp"], ["v"])
    merge_upsert(
        _mk(spark, [(1, "p1", "a", 15, False)]), tdir, delete_col="is_deleted"
    )

    def boom(*a, **k):
        raise ValueError("misconfigured: not a gap")

    monkeypatch.setattr(ivm_mod, "refresh_aggregate", boom)
    with pytest.raises(ValueError, match="not a gap"):
        refresh_materialized_aggregate(spark, tdir, adir, rebootstrap_on_gap=True)


def test_delete_only_diff_of_evolved_column_is_typed(spark, tdir):
    """Delete-only one-sided diff where the deleted partition's files
    PREDATE a schema-evolved column: old_w/new_w must come out typed
    (resolved from the snapshot footers), never VOID — ivm's dtype
    check rejects a void feed even though the delta is well-defined."""
    _base(spark, tdir)
    # evolve: add column w to partition p1 only (snapshot 2)
    merge_upsert(
        spark.createDataFrame(
            [(1, "p1", "a", 10, 7)],
            "k long, part string, grp string, v long, w long",
        ),
        tdir,
        merge_schema=True,
    )
    # snapshot 3: delete ALL rows of p2 (whose files lack w)
    merge_upsert(
        _mk(spark, [(3, "p2", "b", 30, True), (4, "p2", "b", 40, True)]),
        tdir,
        delete_col="is_deleted",
    )
    diff = table_diff(spark, tdir, 2, include_values=True)
    rows = diff.collect()
    assert {r["change_type"] for r in rows} == {"delete"}
    assert {int(r["k"]) for r in rows} == {3, 4}
    dt = dict(diff.dtypes)
    assert dt["old_w"] == "bigint" and dt["new_w"] == "bigint"
    assert dt["old_v"] == "bigint" and dt["new_v"] == "bigint"
    assert all(r["new_v"] is None and r["old_v"] is not None for r in rows)


# ---------------------------------------------------------------------------
# MIN/MAX hybrid maintenance (extrema_state / refresh_extrema)
# ---------------------------------------------------------------------------

from factstore_spark.storage.ivm import (  # noqa: E402
    extrema_state,
    full_extrema,
    refresh_extrema,
)


def test_extrema_refresh_equals_recompute_under_extremum_deletes(spark, tdir):
    """The defining case: delete a group's stored MIN and (elsewhere) a
    stored MAX — the hybrid must rescan exactly those groups and land
    on the recompute, runner-up values and all."""
    base = _mk(
        spark,
        [
            (1, "p1", "a", 10, False),
            (2, "p1", "a", 20, False),
            (3, "p1", "a", 30, False),
            (4, "p2", "b", 40, False),
            (5, "p2", "b", 50, False),
            (6, "p2", "b", 60, False),
        ],
    ).drop("is_deleted")
    create_table(base, tdir, ["k"], "part")
    state = full_extrema(spark, tdir, ["grp"], ["v"], snapshot=1)
    # delete group a's min (k=1, v=10) and group b's max (k=6, v=60)
    merge_upsert(
        _mk(spark, [(1, "p1", "a", 10, True), (6, "p2", "b", 60, True)]),
        tdir,
        delete_col="is_deleted",
    )
    got = refresh_extrema(spark, tdir, state, 1, ["grp"], ["v"])
    assert _rows(got) == _rows(full_extrema(spark, tdir, ["grp"], ["v"]))
    rows = {r["grp"]: (r["n_rows"], r["min_v"], r["max_v"]) for r in got.collect()}
    assert rows == {"a": (2, 20, 30), "b": (2, 40, 50)}


def test_extrema_tie_delete_rescans_correctly(spark, tdir):
    """Two rows share the min; deleting ONE of them must keep the min
    (the naive 'deleted value == stored min -> unknown' shortcut that
    skips the rescan would wrongly bump it)."""
    base = _mk(
        spark,
        [
            (1, "p1", "a", 10, False),
            (2, "p1", "a", 10, False),
            (3, "p1", "a", 30, False),
        ],
    ).drop("is_deleted")
    create_table(base, tdir, ["k"], "part")
    state = full_extrema(spark, tdir, ["grp"], ["v"], snapshot=1)
    merge_upsert(
        _mk(spark, [(1, "p1", "a", 10, True)]), tdir, delete_col="is_deleted"
    )
    got = refresh_extrema(spark, tdir, state, 1, ["grp"], ["v"])
    assert _rows(got) == _rows(full_extrema(spark, tdir, ["grp"], ["v"]))
    r = got.collect()[0]
    assert (r["n_rows"], r["min_v"], r["max_v"]) == (2, 10, 30)


def test_extrema_insert_update_migration_incremental(spark, tdir):
    """Inserts, improving updates, and group migration maintain
    incrementally; chained refreshes equal the recompute at each step."""
    _base(spark, tdir)  # a: (10, 20), b: (30, 40)
    state = full_extrema(spark, tdir, ["grp"], ["v"], snapshot=1)
    # insert new max into a; migrate k=3 from b to a (taking b's min
    # away -> endangered); update k=4 to a new max of b
    merge_upsert(
        _mk(
            spark,
            [
                (5, "p1", "a", 99, False),
                (3, "p2", "a", 30, False),
                (4, "p2", "b", 70, False),
            ],
        ),
        tdir,
        delete_col="is_deleted",
    )
    state = refresh_extrema(spark, tdir, state, 1, ["grp"], ["v"])
    assert _rows(state) == _rows(full_extrema(spark, tdir, ["grp"], ["v"]))
    # second refresh on top of the maintained state: delete-to-zero group
    merge_upsert(
        _mk(spark, [(4, "p2", "b", 70, True)]), tdir, delete_col="is_deleted"
    )
    state = refresh_extrema(spark, tdir, state, 2, ["grp"], ["v"])
    assert _rows(state) == _rows(full_extrema(spark, tdir, ["grp"], ["v"]))
    assert {r["grp"] for r in state.collect()} == {"a"}


def test_extrema_no_endangered_refresh_reads_no_table_files(spark, tdir, monkeypatch):
    """A refresh whose changes never touch a stored extremum must not
    reread the table: the empty-endangered fast path returns before
    read_table is ever called."""
    import factstore_spark.storage.ivm as ivm_mod

    base = _mk(
        spark,
        [
            (1, "p1", "a", 10, False),
            (2, "p1", "a", 20, False),   # strictly-interior value
            (3, "p1", "a", 30, False),
            (4, "p2", "b", 40, False),
            (5, "p2", "b", 60, False),
        ],
    ).drop("is_deleted")
    create_table(base, tdir, ["k"], "part")
    state = full_extrema(spark, tdir, ["grp"], ["v"], snapshot=1)
    # insert 50 strictly inside b's (40, 60) + interior update 20 -> 25:
    # no leaving preimage touches a stored extremum
    merge_upsert(
        _mk(spark, [(6, "p2", "b", 50, False), (2, "p1", "a", 25, False)]),
        tdir,
        delete_col="is_deleted",
    )

    def forbidden(*a, **k):
        raise AssertionError("refresh_extrema reread the table without need")

    monkeypatch.setattr(ivm_mod, "read_table", forbidden)
    got = refresh_extrema(spark, tdir, state, 1, ["grp"], ["v"])
    monkeypatch.undo()
    assert _rows(got) == _rows(full_extrema(spark, tdir, ["grp"], ["v"]))


def test_extrema_float_column_rejected(spark, tdir):
    _base(spark, tdir)
    t = spark.createDataFrame([(1, "a", 1.5)], "k long, grp string, v double")
    with pytest.raises(ValueError, match="non-integral"):
        extrema_state(t, ["grp"], ["v"])


def test_materialized_extrema_lifecycle(spark, tdir, adir):
    """Persisted MIN/MAX materialized view: bootstrap, hybrid refresh
    (incl. an extremum delete -> group rescan), version time travel,
    and vacuum — the same CAS-published machinery as the COUNT/SUM
    kind, dispatched by the meta's agg_kind."""
    from factstore_spark.storage.ivm import create_materialized_extrema

    _base(spark, tdir)
    create_materialized_extrema(spark, tdir, adir, ["grp"], ["v"])
    v1 = _rows(read_materialized_aggregate(spark, adir))
    assert v1 == _rows(full_extrema(spark, tdir, ["grp"], ["v"]))
    # delete group a's max and insert a new b row in one batch
    merge_upsert(
        _mk(spark, [(2, "p1", "a", 20, True), (5, "p2", "b", 5, False)]),
        tdir,
        delete_col="is_deleted",
    )
    meta = refresh_materialized_aggregate(spark, tdir, adir)
    assert meta["version"] == 2 and meta["agg_kind"] == "extrema"
    got = {r["grp"]: (r["n_rows"], r["min_v"], r["max_v"])
           for r in read_materialized_aggregate(spark, adir).collect()}
    assert got == {"a": (1, 10, 10), "b": (3, 5, 40)}
    # version 1 still reads the bootstrap state (time travel)
    assert _rows(read_materialized_aggregate(spark, adir, version=1)) == v1
    # head == cursor: refresh is a no-op returning the same meta
    assert refresh_materialized_aggregate(spark, tdir, adir)["version"] == 2


def test_materialized_extrema_rebootstrap_on_gap(spark, tdir, adir):
    from factstore_spark.storage.ivm import create_materialized_extrema
    from factstore_spark.storage.merge import vacuum_table

    _base(spark, tdir)
    create_materialized_extrema(spark, tdir, adir, ["grp"], ["v"])
    merge_upsert(
        _mk(spark, [(1, "p1", "a", 99, False)]), tdir, delete_col="is_deleted"
    )
    merge_upsert(
        _mk(spark, [(2, "p1", "a", 98, False)]), tdir, delete_col="is_deleted"
    )
    vacuum_table(tdir, retain_seconds=0.0, retain_snapshots=1)
    with pytest.raises(ValueError):
        refresh_materialized_aggregate(spark, tdir, adir)
    meta = refresh_materialized_aggregate(
        spark, tdir, adir, rebootstrap_on_gap=True
    )
    assert meta["agg_kind"] == "extrema"
    assert _rows(read_materialized_aggregate(spark, adir)) == _rows(
        full_extrema(spark, tdir, ["grp"], ["v"])
    )


def test_streaming_merge_feeds_materialized_extrema(spark, tdir, adir):
    """Streaming twin for the MIN/MAX kind: micro-batches land through
    start_merge_stream (including an extremum DELETE that forces the
    hybrid rescan), the post-drain refresh dispatches through the
    persisted meta's agg_kind, and the view equals a full recompute."""
    from factstore_spark.storage.ivm import create_materialized_extrema
    from factstore_spark.storage.merge import start_merge_stream

    _base(spark, tdir)  # a: (10, 20), b: (30, 40)
    create_materialized_extrema(spark, tdir, adir, ["grp"], ["v"])

    src_dir = tempfile.mkdtemp(prefix="ivm-ext-src-")
    chk_dir = tempfile.mkdtemp(prefix="ivm-ext-chk-")
    try:
        batch = _mk(
            spark,
            [
                (4, "p2", "b", 40, True),    # deletes b's stored MAX
                (7, "p2", "c", 70, False),   # new group
                (1, "p1", "a", 5, False),    # new MIN for a
            ],
        )
        batch.write.mode("overwrite").parquet(src_dir)
        stream = spark.readStream.schema(batch.schema).parquet(src_dir)
        q = start_merge_stream(
            stream, tdir, chk_dir, delete_col="is_deleted", available_now=True
        )
        q.awaitTermination(120)
        meta = refresh_materialized_aggregate(spark, tdir, adir)
        assert meta["agg_kind"] == "extrema"
        got = read_materialized_aggregate(spark, adir)
        assert _rows(got) == _rows(full_extrema(spark, tdir, ["grp"], ["v"]))
        gm = {r["grp"]: (r["n_rows"], r["min_v"], r["max_v"])
              for r in got.collect()}
        assert gm == {"a": (2, 5, 20), "b": (1, 30, 30), "c": (1, 70, 70)}
    finally:
        shutil.rmtree(src_dir, ignore_errors=True)
        shutil.rmtree(chk_dir, ignore_errors=True)


def test_sum_views_allow_min_prefixed_group_columns(spark, tdir, adir):
    """The extrema kind's reserved prefixes (min_/max_/...) must NOT
    leak into the COUNT/SUM kind's validation: a round-8 persisted view
    grouped by a column named 'min_level' stays refreshable."""
    base = spark.createDataFrame(
        [(1, "p1", "lo", 10), (2, "p1", "hi", 20)],
        "k long, part string, min_level string, v long",
    )
    create_table(base, tdir, ["k"], "part")
    create_materialized_aggregate(spark, tdir, adir, ["min_level"], ["v"])
    merge_upsert(
        spark.createDataFrame(
            [(3, "p1", "lo", 30, False)],
            "k long, part string, min_level string, v long, is_deleted boolean",
        ),
        tdir,
        delete_col="is_deleted",
    )
    refresh_materialized_aggregate(spark, tdir, adir)
    got = {r["min_level"]: (r["n_rows"], r["sum_v"])
           for r in read_materialized_aggregate(spark, adir).collect()}
    assert got == {"lo": (2, 40), "hi": (1, 20)}
    # and the extrema kind still rejects its own reserved names
    with pytest.raises(ValueError, match="reserved"):
        extrema_state(
            spark.createDataFrame([(1, "a", 2)], "k long, min_x string, v long"),
            ["min_x"], ["v"],
        )


def test_extrema_rejects_d_prefixed_group_col_at_create(spark, tdir, adir):
    """The extrema refresh rides delta_from_diff for its count, so a
    d_-prefixed group column must fail at CREATE — not create fine and
    then raise on every refresh forever (review finding, round 9)."""
    from factstore_spark.storage.ivm import create_materialized_extrema

    base = spark.createDataFrame(
        [(1, "p1", "x", 10)], "k long, part string, d_code string, v long"
    )
    create_table(base, tdir, ["k"], "part")
    with pytest.raises(ValueError, match="reserved"):
        create_materialized_extrema(spark, tdir, adir, ["d_code"], ["v"])
