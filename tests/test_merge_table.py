"""Keyed-table MERGE (storage/merge.py): upsert/delete with
partition-restricted copy-on-write and manifest-swap crash safety."""

import os

import pytest
from pyspark.sql import functions as F

from factstore_spark.storage.merge import (
    create_table,
    merge_upsert,
    read_table,
    vacuum_table,
    validate_table,
)


def _rows(spark, data):
    return spark.createDataFrame(data, "id long, part string, v string")


def _snap(spark, d):
    return {(r.id): (r.part, r.v) for r in read_table(spark, d).collect()}


def test_create_read_roundtrip_and_validation(spark, tmp_path):
    d = str(tmp_path / "t")
    df = _rows(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")])
    create_table(df, d, ["id"], "part")
    assert _snap(spark, d) == {1: ("a", "x"), 2: ("a", "y"), 3: ("b", "z")}

    with pytest.raises(ValueError, match="duplicate keys"):
        create_table(
            _rows(spark, [(1, "a", "x"), (1, "a", "y")]), str(tmp_path / "t2"),
            ["id"], "part",
        )
    with pytest.raises(ValueError, match="non-null"):
        create_table(
            _rows(spark, [(1, None, "x")]), str(tmp_path / "t3"), ["id"], "part"
        )
    assert read_table(spark, str(tmp_path / "nothing")) is None
    alien = tmp_path / "alien"
    alien.mkdir()
    (alien / "_LATEST").write_text('{"2024-01-01": "v=x/bucket_date=2024-01-01"}')
    with pytest.raises(ValueError, match="not a merge table"):
        read_table(spark, str(alien))


def test_upsert_rewrites_only_touched_partitions(spark, tmp_path):
    d = str(tmp_path / "t")
    m0 = create_table(
        _rows(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z"), (4, "c", "w")]),
        d, ["id"], "part",
    )
    # update key 1, insert key 5 — both in partition a; b and c untouched
    m1 = merge_upsert(_rows(spark, [(1, "a", "X"), (5, "a", "new")]), d)
    assert _snap(spark, d) == {
        1: ("a", "X"), 2: ("a", "y"), 3: ("b", "z"), 4: ("c", "w"), 5: ("a", "new"),
    }
    assert m1["partitions"]["a"] != m0["partitions"]["a"]
    for untouched in ("b", "c"):
        assert m1["partitions"][untouched] == m0["partitions"][untouched]
        assert os.path.isdir(os.path.join(d, m0["partitions"][untouched]))


def test_delete_col_removes_rows_and_empty_partitions(spark, tmp_path):
    d = str(tmp_path / "t")
    create_table(
        _rows(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")]), d, ["id"], "part"
    )
    upd = spark.createDataFrame(
        [(2, "a", "y2", False), (3, "b", None, True)],
        "id long, part string, v string, is_deleted boolean",
    )
    m = merge_upsert(upd, d, delete_col="is_deleted")
    assert _snap(spark, d) == {1: ("a", "x"), 2: ("a", "y2")}
    assert "b" not in m["partitions"]  # fully-deleted partition unlinked


def test_unpublished_version_invisible_and_vacuum_reaps(spark, tmp_path):
    d = str(tmp_path / "t")
    m0 = create_table(_rows(spark, [(1, "a", "x")]), d, ["id"], "part")
    # a crashed merge: version dir on disk, never published
    ghost = os.path.join(d, "v=deadbeefcafe", "_pval=a")
    os.makedirs(ghost)
    with open(os.path.join(ghost, "junk.txt"), "w") as fh:
        fh.write("partial")
    assert _snap(spark, d) == {1: ("a", "x")}  # reader never sees it

    merge_upsert(_rows(spark, [(1, "a", "x2")]), d)
    out = vacuum_table(d, retain_seconds=0.0)
    assert "v=deadbeefcafe" in out["removed"]
    old_version = m0["partitions"]["a"].split(os.sep)[0]
    assert old_version in out["removed"]  # superseded version reaped
    assert _snap(spark, d) == {1: ("a", "x2")}  # live version intact


def test_merge_model_based_random_batches(spark, tmp_path):
    """Model-based: random upsert/delete batch sequences must leave the
    table equal to a driver-side dict model after every merge —
    including re-deletes of absent keys, re-inserts of deleted keys,
    and batches touching one or many partitions."""
    import random

    rnd = random.Random(13)
    parts = ["p0", "p1", "p2"]
    d = str(tmp_path / "model")
    init = [(k, parts[k % 3], f"v{k}") for k in range(20)]
    model = {k: (p, v) for k, p, v in init}
    create_table(_rows(spark, init), d, ["id"], "part")

    for step in range(6):
        batch = []
        for _ in range(rnd.randint(1, 8)):
            k = rnd.randint(0, 29)
            p = parts[k % 3]  # a key's partition never changes (contract)
            if rnd.random() < 0.3:
                batch.append((k, p, None, True))
            else:
                batch.append((k, p, f"s{step}k{k}", False))
        # one row per key: keep the LAST op for a key (explicit winner)
        dedup = {}
        for row in batch:
            dedup[row[0]] = row
        batch = list(dedup.values())
        for k, p, v, is_del in batch:
            if is_del:
                model.pop(k, None)
            else:
                model[k] = (p, v)
        upd = spark.createDataFrame(
            batch, "id long, part string, v string, is_deleted boolean"
        )
        merge_upsert(upd, d, delete_col="is_deleted")
        got = read_table(spark, d)
        got_d = (
            {} if got is None else {r.id: (r.part, r.v) for r in got.collect()}
        )
        assert got_d == model, f"diverged at step {step}"


def test_time_travel_snapshots_and_retention(spark, tmp_path):
    """Every publish is an immutable numbered snapshot: old snapshots
    read exactly their historical state while the head moves on; vacuum
    with retain_snapshots=2 keeps the last two readable and reaps the
    rest (reading a reaped snapshot raises)."""
    from factstore_spark.storage.merge import _read_manifest

    d = str(tmp_path / "tt")
    m1 = create_table(_rows(spark, [(1, "a", "x"), (2, "b", "y")]), d, ["id"], "part")
    assert m1["snapshot"] == 1
    m2 = merge_upsert(_rows(spark, [(1, "a", "x2")]), d)
    m3 = merge_upsert(_rows(spark, [(3, "b", "z")]), d)
    assert (m2["snapshot"], m3["snapshot"]) == (2, 3)

    def snap(n):
        return {r.id: (r.part, r.v) for r in read_table(spark, d, snapshot=n).collect()}

    assert snap(1) == {1: ("a", "x"), 2: ("b", "y")}
    assert snap(2) == {1: ("a", "x2"), 2: ("b", "y")}
    assert snap(3) == {1: ("a", "x2"), 2: ("b", "y"), 3: ("b", "z")}
    assert _snap(spark, d) == snap(3)

    out = vacuum_table(d, retain_seconds=0.0, retain_snapshots=2)
    assert out["removed_snapshots"] == [1]
    assert snap(2) and snap(3)  # retained snapshots still readable
    with pytest.raises(ValueError, match="snapshot 1 not found"):
        read_table(spark, d, snapshot=1)
    # version dirs still referenced by snapshot 2 must survive
    for rel in _read_manifest(d, 2)["partitions"].values():
        assert os.path.isdir(os.path.join(d, rel.split(os.sep, 1)[0]))


def test_concurrent_merge_single_winner_and_pointer_repair(spark, tmp_path):
    """A merge that read base N must lose if snap-(N+1) lands before its
    publish (its result would drop the winner's rows); a writer that
    crashed between snapshot and _LATEST swap is recovered — the
    snapshot log is the truth, the pointer a cache."""
    import json

    from factstore_spark.storage.merge import (
        ConcurrentMergeError,
        _publish_snapshot,
        _read_manifest,
    )

    d = str(tmp_path / "race")
    create_table(_rows(spark, [(1, "a", "x")]), d, ["id"], "part")

    # pointer-repair: competitor commits snap 2, then its _LATEST swap
    # "crashes" (we rewind the pointer). The next merge must see snap 2
    # through the log, base on it, and commit 3 — not conflict forever.
    m1 = _read_manifest(d)
    merge_upsert(_rows(spark, [(2, "a", "w")]), d)
    with open(os.path.join(d, "_LATEST"), "w") as fh:
        json.dump(m1, fh)
    m3 = merge_upsert(_rows(spark, [(3, "a", "z")]), d)
    assert m3["snapshot"] == 3
    assert _snap(spark, d) == {1: ("a", "x"), 2: ("a", "w"), 3: ("a", "z")}

    # single-winner: a publish based on snapshot 2 while snap-3 exists
    # is exactly "competitor landed between my read and my publish"
    with pytest.raises(ConcurrentMergeError, match="re-run the merge"):
        _publish_snapshot(d, dict(m3), base_snapshot=2)

    # and the loser's retry against the refreshed head succeeds
    m4 = merge_upsert(_rows(spark, [(4, "a", "q")]), d)
    assert m4["snapshot"] == 4
    assert _snap(spark, d)[4] == ("a", "q")


def test_threaded_merge_race_applies_every_batch_exactly_once(spark, tmp_path):
    """Four threads each merge three disjoint batches concurrently,
    retrying on ConcurrentMergeError: every batch must land exactly
    once (no lost updates — the failure mode the CAS claim exists to
    prevent) and the snapshot numbers must be a contiguous single-
    winner sequence."""
    import threading

    from factstore_spark.storage.merge import ConcurrentMergeError

    d = str(tmp_path / "race2")
    create_table(_rows(spark, [(0, "a", "seed")]), d, ["id"], "part")
    errors = []

    def worker(wid):
        try:
            for b in range(3):
                base = 1000 * wid + 10 * b
                batch = _rows(
                    spark,
                    [(base + i, "a", f"w{wid}b{b}") for i in range(3)],
                )
                for attempt in range(30):
                    try:
                        merge_upsert(batch, d)
                        break
                    except ConcurrentMergeError:
                        continue
                else:
                    raise AssertionError(f"worker {wid} starved")
        except Exception as e:  # surface into the main thread
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(w,)) for w in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, errors

    got = _snap(spark, d)
    want_keys = {0} | {
        1000 * w + 10 * b + i for w in range(4) for b in range(3) for i in range(3)
    }
    assert set(got) == want_keys
    for w in range(4):
        for b in range(3):
            for i in range(3):
                assert got[1000 * w + 10 * b + i] == ("a", f"w{w}b{b}")
    # contiguous snapshot history: 1 (create) + 12 merges
    from factstore_spark.storage.merge import _read_manifest

    assert _read_manifest(d)["snapshot"] == 13
    for n in range(1, 14):
        assert read_table(spark, d, snapshot=n) is not None


def test_schema_evolution_opt_in(spark, tmp_path):
    """A batch with a new column fails loudly by default; with
    merge_schema=True the column lands, old rows read back null in it
    (mergeSchema read across versions), and the previous behavior is
    unchanged for the old columns."""
    d = str(tmp_path / "evolve")
    create_table(_rows(spark, [(1, "a", "x"), (2, "b", "y")]), d, ["id"], "part")
    upd = spark.createDataFrame(
        [(1, "a", "x2", 9)], "id long, part string, v string, score long"
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        merge_upsert(upd, d)
    merge_upsert(upd, d, merge_schema=True)
    got = {r.id: (r.part, r.v, r.score) for r in read_table(spark, d).collect()}
    assert got == {1: ("a", "x2", 9), 2: ("b", "y", None)}


def test_streaming_merge_sink_upserts_micro_batches(spark, tmp_path):
    """A keyed stream drained through start_merge_stream must leave the
    table equal to last-value-per-key of the streamed updates, across
    multiple micro-batches (maxFilesPerTrigger=1)."""
    import time as _time

    from factstore_spark.storage.merge import start_merge_stream

    d = str(tmp_path / "stream-tbl")
    create_table(_rows(spark, [(1, "a", "x"), (2, "b", "y")]), d, ["id"], "part")

    src = tmp_path / "updates"
    src.mkdir()
    _rows(spark, [(1, "a", "x2"), (3, "a", "new")]).coalesce(1).write.parquet(
        str(src / "b0")
    )
    _time.sleep(1.1)
    _rows(spark, [(1, "a", "x3"), (4, "b", "w")]).coalesce(1).write.parquet(
        str(src / "b1")
    )
    stream = (
        spark.readStream.schema("id long, part string, v string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    q = start_merge_stream(
        stream, d, checkpoint_dir=str(tmp_path / "ckpt"), available_now=True
    )
    assert q.awaitTermination(180)
    assert _snap(spark, d) == {
        1: ("a", "x3"), 2: ("b", "y"), 3: ("a", "new"), 4: ("b", "w"),
    }


def test_one_file_per_partition_per_version(spark, tmp_path):
    """Rule #7 applied to the table writer: each version dir holds ONE
    file per partition value, not one sliver per shuffle partition."""
    d = str(tmp_path / "files")
    df = (
        spark.range(5000)
        .selectExpr("id", "CAST(id % 3 AS STRING) part", "CAST(id AS STRING) v")
        .repartition(16)
    )
    m = create_table(df, d, ["id"], "part")
    # All 3 partition values must be present — an empty/short partitions
    # map would otherwise skip the loop body and pass vacuously.
    assert set(m["partitions"]) == {"0", "1", "2"}, sorted(m["partitions"])
    for rel in m["partitions"].values():
        files = [
            f for f in os.listdir(os.path.join(d, rel)) if f.endswith(".parquet")
        ]
        assert len(files) == 1, (rel, files)


def test_merge_schema_never_nulls_omitted_existing_columns(spark, tmp_path):
    """A batch missing an EXISTING column must fail loudly on both
    paths — allowMissingColumns would otherwise silently null it on
    every updated row (data loss, not evolution)."""
    d = str(tmp_path / "omit")
    create_table(_rows(spark, [(1, "a", "x")]), d, ["id"], "part")
    partial = spark.createDataFrame([(1, "a")], "id long, part string")  # no v
    with pytest.raises(ValueError, match="missing existing table columns"):
        merge_upsert(partial, d)
    with pytest.raises(ValueError, match="missing existing table columns"):
        merge_upsert(partial, d, merge_schema=True)
    partial_plus = spark.createDataFrame(
        [(1, "a", 5)], "id long, part string, score long"  # new col, still no v
    )
    with pytest.raises(ValueError, match="missing existing table columns"):
        merge_upsert(partial_plus, d, merge_schema=True)


def test_pure_delete_batch_needs_only_key_partition_delete_cols(spark, tmp_path):
    """Deletes never write row data, so a batch of ONLY flagged deletes
    may omit the value columns; a MIXED batch missing them still fails."""
    d = str(tmp_path / "puredel")
    create_table(
        _rows(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")]), d, ["id"], "part"
    )
    dele = spark.createDataFrame(
        [(2, "a", True)], "id long, part string, is_deleted boolean"
    )
    merge_upsert(dele, d, delete_col="is_deleted")
    assert _snap(spark, d) == {1: ("a", "x"), 3: ("b", "z")}
    mixed = spark.createDataFrame(
        [(1, "a", True), (4, "a", False)], "id long, part string, is_deleted boolean"
    )
    with pytest.raises(ValueError, match="missing existing table columns"):
        merge_upsert(mixed, d, delete_col="is_deleted")


def test_table_history_lists_retained_snapshots(spark, tmp_path):
    from factstore_spark.storage.merge import table_history, vacuum_table

    d = str(tmp_path / "hist")
    create_table(_rows(spark, [(1, "a", "x")]), d, ["id"], "part")
    merge_upsert(_rows(spark, [(2, "b", "y")]), d)
    h = table_history(d)
    assert [e["snapshot"] for e in h] == [1, 2]
    assert h[0]["n_partitions"] == 1 and h[1]["n_partitions"] == 2
    vacuum_table(d, retain_seconds=0.0, retain_snapshots=1)
    assert [e["snapshot"] for e in table_history(d)] == [2]


def test_validate_table_catches_tampering(spark, tmp_path):
    """Manifest stats (rows + key hash per partition) must re-derive
    from the written files; a vanished partition dir is caught."""
    import shutil

    from factstore_spark.storage.merge import validate_table

    d = str(tmp_path / "integ")
    create_table(
        _rows(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z")]), d, ["id"], "part"
    )
    merge_upsert(_rows(spark, [(2, "a", "y2"), (4, "b", "w")]), d)
    v = validate_table(spark, d)
    assert v["ok"], v["problems"]

    # nuke partition b's current files
    from factstore_spark.storage.merge import _read_manifest

    rel = _read_manifest(d)["partitions"]["b"]
    shutil.rmtree(os.path.join(d, rel))
    v2 = validate_table(spark, d)
    assert not v2["ok"] and any("b" in p for p in v2["problems"])


def test_schema_checks_apply_on_fresh_partition_values(spark, tmp_path):
    """A batch touching ONLY new partition values gets the same
    add-only schema discipline as one touching existing partitions —
    the checks run against the manifest's column set, so an empty
    prev_paths list is not a bypass."""
    d = str(tmp_path / "freshpart")
    create_table(_rows(spark, [(1, "a", "x")]), d, ["id"], "part")
    partial = spark.createDataFrame([(9, "z")], "id long, part string")  # no v
    with pytest.raises(ValueError, match="missing existing table columns"):
        merge_upsert(partial, d)
    extra = spark.createDataFrame(
        [(9, "z", "w", 5)], "id long, part string, v string, score long"
    )
    with pytest.raises(ValueError, match="merge_schema=True"):
        merge_upsert(extra, d)
    merge_upsert(extra, d, merge_schema=True)
    got = {r.id: (r.part, r.v, r.score) for r in read_table(spark, d).collect()}
    assert got == {1: ("a", "x", None), 9: ("z", "w", 5)}


def test_evolved_columns_remembered_across_partitions(spark, tmp_path):
    """After an evolution lands on one partition, later batches are
    validated against the EVOLVED column set everywhere — including
    partitions whose files predate the evolution."""
    d = str(tmp_path / "evmem")
    create_table(_rows(spark, [(1, "a", "x"), (2, "b", "y")]), d, ["id"], "part")
    merge_upsert(
        spark.createDataFrame(
            [(1, "a", "x2", 7)], "id long, part string, v string, score long"
        ),
        d, merge_schema=True,
    )
    # partition b's files predate the evolution; a batch carrying score
    # must pass WITHOUT merge_schema — score is already a table column
    merge_upsert(
        spark.createDataFrame(
            [(2, "b", "y2", 8)], "id long, part string, v string, score long"
        ),
        d,
    )
    # and a batch missing score now fails even on a fresh partition
    with pytest.raises(ValueError, match="missing existing table columns"):
        merge_upsert(_rows(spark, [(9, "zz", "q")]), d)
    got = {r.id: (r.part, r.v, r.score) for r in read_table(spark, d).collect()}
    assert got == {1: ("a", "x2", 7), 2: ("b", "y2", 8)}


def test_validate_table_checks_snapshot_head_not_pointer(spark, tmp_path):
    """A writer that crashed between the snapshot CAS and the _LATEST
    swap has COMMITTED; validate_table must validate that head (and
    repair the pointer), not the stale pointed-to predecessor."""
    import json
    import shutil

    from factstore_spark.storage.merge import _read_manifest, validate_table

    d = str(tmp_path / "headval")
    m1 = create_table(_rows(spark, [(1, "a", "x")]), d, ["id"], "part")
    merge_upsert(_rows(spark, [(1, "a", "x2")]), d)
    # simulate the crash window: stale pointer back in place, and the
    # superseded snap-1 version dir vacuumed away
    with open(os.path.join(d, "_LATEST"), "w") as fh:
        fh.write(json.dumps(m1))
    shutil.rmtree(os.path.join(d, m1["partitions"]["a"].split(os.sep)[0]))
    v = validate_table(spark, d)
    assert v["ok"], v["problems"]  # head (snap-2) is what gets validated
    assert _read_manifest(d)["snapshot"] == 2  # pointer repaired


def test_partition_values_needing_escaping_round_trip(spark, tmp_path):
    """Spark percent-escapes special characters in partition dir names;
    the manifest must record the REAL paths, or values like '2024/01'
    publish a manifest pointing at directories that do not exist."""
    d = str(tmp_path / "esc")
    df = spark.createDataFrame(
        [(1, "2024/01", "x"), (2, "a=b", "y"), (3, "c:d%e", "z")],
        "id long, part string, v string",
    )
    create_table(df, d, ["id"], "part")
    assert _snap(spark, d) == {
        1: ("2024/01", "x"), 2: ("a=b", "y"), 3: ("c:d%e", "z"),
    }
    merge_upsert(
        spark.createDataFrame([(1, "2024/01", "x2")], "id long, part string, v string"),
        d,
    )
    assert _snap(spark, d)[1] == ("2024/01", "x2")
    from factstore_spark.storage.merge import validate_table

    v = validate_table(spark, d)
    assert v["ok"], v["problems"]


def test_head_manifest_repair_survives_read_only_dir(spark, tmp_path, monkeypatch):
    """The opportunistic _LATEST repair is cache maintenance: a
    read-only consumer must still be served the true head after a
    writer crashed between the snapshot CAS and the pointer swap.

    The failure is injected by making _publish raise (chmod 0o555
    cannot block a root-run suite — the original chmod version of this
    test passed vacuously via the ordinary writable-dir repair path)."""
    import json
    import os as _os

    from factstore_spark.storage import merge as merge_mod

    d = str(tmp_path / "ro")
    m1 = create_table(_rows(spark, [(1, "a", "x")]), d, ["id"], "part")
    merge_upsert(_rows(spark, [(1, "a", "x2")]), d)
    with open(_os.path.join(d, "_LATEST"), "w") as fh:
        fh.write(json.dumps(m1))  # stale pointer = the crash window
    denied = {"hit": False}

    def deny_publish(table_dir, manifest):
        denied["hit"] = True
        raise OSError(30, "Read-only file system", table_dir)

    monkeypatch.setattr(merge_mod, "_publish", deny_publish)
    assert _snap(spark, d) == {1: ("a", "x2")}  # true head served
    assert denied["hit"], "repair write was never attempted"
    monkeypatch.undo()
    # Next read repairs the pointer for real.
    assert _snap(spark, d) == {1: ("a", "x2")}
    assert json.load(open(_os.path.join(d, "_LATEST")))["snapshot"] == 2


def test_merge_rejects_null_keys(spark, tmp_path):
    """Null business keys are unmergeable: the anti-join is not
    null-safe, so 'upserting' a null-keyed row again would silently
    DUPLICATE it instead of replacing it (reproduced before the guard:
    two upserts of the same null-keyed row -> two table rows). Both the
    create and the merge path must reject them loudly."""
    import pytest
    from factstore_spark.storage.merge import create_table, merge_upsert, read_table

    d = str(tmp_path / "t")
    with pytest.raises(ValueError, match="NULL key"):
        create_table(
            spark.createDataFrame([(None, "a", 1.0)], "k long, p string, v double"),
            d, ["k"], "p",
        )
    create_table(
        spark.createDataFrame([(1, "a", 1.0)], "k long, p string, v double"),
        d, ["k"], "p",
    )
    with pytest.raises(ValueError, match="NULL key"):
        merge_upsert(
            spark.createDataFrame([(None, "a", 9.0)], "k long, p string, v double"), d
        )
    assert read_table(spark, d).count() == 1  # nothing leaked


def test_table_diff_classifications(spark, tmp_path):
    from factstore_spark.storage.merge import table_diff

    d = str(tmp_path / "t")
    create_table(
        _rows(spark, [(1, "a", "x"), (2, "a", "y"), (3, "b", "z"), (4, "b", "w")]),
        d, ["id"], "part",
    )
    # update 1, delete 3, insert 5; 2 and 4 untouched (4's partition IS
    # rewritten by the delete — its carried-over row must NOT diff)
    batch = _rows(spark, [(1, "a", "X"), (5, "b", "new"), (3, "b", "z")])
    merge_upsert(
        batch.withColumn("is_deleted", F.col("id") == 3),
        d, delete_col="is_deleted",
    )
    got = {(r.id): r.change_type for r in table_diff(spark, d, 1).collect()}
    assert got == {1: "update", 3: "delete", 5: "insert"}
    # explicit to_snapshot and the no-change diff
    assert table_diff(spark, d, 2, 2).count() == 0
    assert table_diff(spark, d, 1, 2).count() == 3
    with pytest.raises(ValueError, match="not found"):
        table_diff(spark, d, 99)


def test_table_diff_prunes_unchanged_partitions(spark, tmp_path):
    from factstore_spark.storage.merge import table_diff

    d = str(tmp_path / "t")
    create_table(
        _rows(spark, [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")]), d,
        ["id"], "part",
    )
    merge_upsert(_rows(spark, [(2, "b", "Y")]), d)
    diff = table_diff(spark, d, 1)
    assert {(r.id, r.change_type) for r in diff.collect()} == {(2, "update")}
    # partition pruning: only part=b version dirs are ever read
    files = diff.inputFiles()
    assert files and all("_pval=b" in f for f in files)


def test_table_diff_schema_evolution(spark, tmp_path):
    from factstore_spark.storage.merge import table_diff

    d = str(tmp_path / "t")
    create_table(_rows(spark, [(1, "a", "x"), (2, "a", "y")]), d, ["id"], "part")
    evolved = spark.createDataFrame(
        [(1, "a", "x", "extra")], "id long, part string, v string, note string"
    )
    merge_upsert(evolved, d, merge_schema=True)
    got = {(r.id): r.change_type for r in table_diff(spark, d, 1).collect()}
    # row 1 gains a non-null new column -> update; row 2 rides along in
    # the rewritten partition with note=null == absent -> no change
    assert got == {1: "update"}


def test_compact_table_collapses_versions_and_preserves_content(spark, tmp_path):
    from factstore_spark.storage.merge import compact_table, table_history, validate_table

    d = str(tmp_path / "t")
    create_table(_rows(spark, [(1, "a", "x"), (2, "b", "y"), (3, "c", "z")]), d, ["id"], "part")
    # three narrow merges -> live partitions scattered across 4 versions
    merge_upsert(_rows(spark, [(1, "a", "X")]), d)
    merge_upsert(_rows(spark, [(2, "b", "Y")]), d)
    merge_upsert(_rows(spark, [(4, "c", "w")]), d)
    before = _snap(spark, d)
    hist = table_history(d)
    assert len(hist[-1]["versions"]) == 3  # a, b, c dirs from 3 different merges

    rep = compact_table(spark, d)
    assert rep["versions_before"] == 3 and rep["versions_after"] == 1
    assert sorted(rep["compacted"]) == ["a", "b", "c"]
    assert _snap(spark, d) == before  # content byte-identical
    assert validate_table(spark, d)["ok"]
    # compaction is a snapshot like any other: time travel still works
    assert rep["snapshot"] == 5
    # old versions now unreferenced by head -> vacuum can reclaim them
    v = vacuum_table(d, retain_seconds=0.0, retain_snapshots=1)
    assert len(v["removed"]) == 4  # create + 3 merges
    assert _snap(spark, d) == before


def test_compact_table_materializes_evolved_schema(spark, tmp_path):
    from factstore_spark.storage.merge import compact_table

    d = str(tmp_path / "t")
    create_table(_rows(spark, [(1, "a", "x"), (2, "b", "y")]), d, ["id"], "part")
    # evolve schema touching only partition a: partition b's files lack
    # the new column on disk (mergeSchema papers over it per-read)
    evolved = spark.createDataFrame(
        [(1, "a", "x2", 7)], "id long, part string, v string, extra long"
    )
    merge_upsert(evolved, d, merge_schema=True)
    compact_table(spark, d)
    got = {r.id: (r.v, r.extra) for r in read_table(spark, d).collect()}
    assert got == {1: ("x2", 7), 2: ("y", None)}
    # after compaction the head's single version carries the evolved
    # column for EVERY partition (typed null), not just the touched one
    from factstore_spark.storage.merge import _head_manifest
    m = _head_manifest(d)
    rels = set(m["partitions"].values())
    assert len({rel.split(os.sep, 1)[0] for rel in rels}) == 1
    for rel in rels:
        df = spark.read.parquet(os.path.join(d, rel))
        assert "extra" in df.columns


def test_compact_table_subset_and_concurrent_writer(spark, tmp_path):
    from factstore_spark.storage.merge import (
        ConcurrentMergeError,
        _head_manifest,
        _publish_snapshot,
        compact_table,
    )

    d = str(tmp_path / "t")
    create_table(_rows(spark, [(1, "a", "x"), (2, "b", "y")]), d, ["id"], "part")
    merge_upsert(_rows(spark, [(2, "b", "Y")]), d)
    rep = compact_table(spark, d, partitions=["a", "zzz-not-live"])
    assert rep["compacted"] == ["a"]
    assert _snap(spark, d) == {1: ("a", "x"), 2: ("b", "Y")}

    # a writer that lands between head-read and publish wins the CAS
    m = _head_manifest(d)
    _publish_snapshot(d, dict(m), base_snapshot=m["snapshot"])

    import factstore_spark.storage.merge as M

    stale = dict(m)  # the head compact_table will base on (now stale)
    orig = M._head_manifest
    M._head_manifest = lambda td: stale
    try:
        with pytest.raises(ConcurrentMergeError):
            compact_table(spark, d)
    finally:
        M._head_manifest = orig
    # losing the race published nothing: table unchanged and valid
    assert _snap(spark, d) == {1: ("a", "x"), 2: ("b", "Y")}


def test_compact_table_stats_drift_aborts_unpublished(spark, tmp_path, monkeypatch):
    """If the rewritten files fail to reproduce the manifest's
    per-partition stats (torn write, bad disk, bug), compaction must
    raise and leave the new version UNPUBLISHED — readers keep the old
    layout, vacuum reaps the orphan."""
    import factstore_spark.storage.merge as M

    d = str(tmp_path / "t")
    create_table(_rows(spark, [(1, "a", "x"), (2, "b", "y")]), d, ["id"], "part")
    merge_upsert(_rows(spark, [(2, "b", "Y")]), d)
    before = _snap(spark, d)
    head_before = M._head_manifest(d)["snapshot"]

    real = M._partition_stats

    def corrupted(df, key_cols, partition_col):
        stats = real(df, key_cols, partition_col)
        return {v: dict(s, rows=s["rows"] + 1) for v, s in stats.items()}

    monkeypatch.setattr(M, "_partition_stats", corrupted)
    with pytest.raises(RuntimeError, match="stats drift"):
        M.compact_table(spark, d)
    monkeypatch.undo()

    # nothing published: same head, same content, table still valid
    assert M._head_manifest(d)["snapshot"] == head_before
    assert _snap(spark, d) == before
    assert M.validate_table(spark, d)["ok"]
    # the abandoned version dir is an unreferenced orphan vacuum reaps
    v = vacuum_table(d, retain_seconds=0.0, retain_snapshots=10)
    assert len(v["removed"]) == 1
    assert _snap(spark, d) == before


def test_compact_table_zorder_clusters_rows(spark, tmp_path):
    """compact_table(zorder_by=[a, b]) — the OPTIMIZE ZORDER analog:
    content stays byte-identical (the stats-equality contract), and
    inside each partition file the rows land z-clustered, so per-
    row-group min/max stats are NARROW on both dimensions (grid data:
    a and b uncorrelated — a single-column sort would leave the other
    dimension's ranges full-width)."""
    import glob

    import pyarrow.parquet as pq

    from factstore_spark.storage.merge import compact_table, validate_table

    d = str(tmp_path / "t")
    # dense grid in ONE partition, two uncorrelated dims (enough rows
    # that the shrunken parquet block size yields many row groups)
    grid = spark.range(100_000).selectExpr(
        "id", "'p' as part", "id % 32 as a", "(id * 7) % 32 as b"
    )
    create_table(grid, d, ["id"], "part")
    merge_upsert(
        spark.createDataFrame(
            [(1, "p", 1, 7, False)],
            "id long, part string, a long, b long, is_deleted boolean",
        ),
        d,
        delete_col="is_deleted",
    )
    def snap():
        from factstore_spark.storage.merge import read_table

        return sorted(
            tuple(r) for r in read_table(spark, d).select(
                "id", "part", "a", "b"
            ).collect()
        )

    before = snap()

    # small row groups so the clustering is visible in footer stats
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    old = {k: hconf.get(k) for k in ("parquet.block.size", "parquet.page.size")}
    hconf.set("parquet.block.size", str(16 * 1024))
    hconf.set("parquet.page.size", str(4 * 1024))
    try:
        rep = compact_table(spark, d, zorder_by=["a", "b"])
    finally:
        for k, v in old.items():
            if v is None:
                hconf.unset(k)
            else:
                hconf.set(k, v)
    assert rep["versions_after"] == 1
    assert snap() == before  # layout-only: content unchanged
    assert validate_table(spark, d)["ok"]

    # inspect the compacted partition file's row-group stats
    head = _read_head_version(d)
    files = glob.glob(os.path.join(d, head, "_pval=p", "*.parquet"))
    assert len(files) == 1
    md = pq.read_metadata(files[0])
    names = md.schema.names
    spans = {"a": [], "b": []}
    for rg in range(md.num_row_groups):
        row = md.row_group(rg)
        for ci in range(row.num_columns):
            col = row.column(ci)
            if col.path_in_schema in spans and col.statistics is not None:
                st = col.statistics
                spans[col.path_in_schema].append(st.max - st.min)
    assert md.num_row_groups >= 4, md.num_row_groups
    # full range is 31 on both dims; z-clustered row groups must
    # average far narrower on BOTH (a single-dim sort would leave the
    # other at ~31 for every group)
    for dim in ("a", "b"):
        avg = sum(spans[dim]) / len(spans[dim])
        assert avg <= 24, (dim, spans[dim])

    with pytest.raises(ValueError, match="zorder_by"):
        compact_table(spark, d, zorder_by=["a", "nope"])


def _read_head_version(d):
    from factstore_spark.storage.merge import _head_manifest

    m = _head_manifest(d)
    vs = {rel.split(os.sep, 1)[0] for rel in m["partitions"].values()}
    assert len(vs) == 1
    return vs.pop()


def test_zorder_compaction_preserves_user_zsort_column(spark, tmp_path):
    """A user column literally named '_zsort' must survive zorder
    compaction — the helper sort column is uuid-suffixed so withColumn
    can never replace-and-drop user data (review finding, round 9)."""
    from factstore_spark.storage.merge import compact_table, read_table

    d = str(tmp_path / "t")
    g = spark.range(500).selectExpr(
        "id", "'p' as part", "id % 8 as a", "(id * 3) % 8 as b",
        "id * 2 as _zsort",
    )
    create_table(g, d, ["id"], "part")
    compact_table(spark, d, zorder_by=["a", "b"])
    back = read_table(spark, d)
    assert "_zsort" in back.columns
    assert back.filter("_zsort <> id * 2").count() == 0


def test_maintain_table_one_call(spark, tmp_path):
    """maintain_table = compact (optionally z-ordered) + validate +
    vacuum in one scheduler slot; content unchanged, sprawl collapsed,
    superseded versions reclaimed, retained snapshots still readable."""
    from factstore_spark.storage.merge import maintain_table, read_table

    d = str(tmp_path / "t")
    create_table(
        _rows(spark, [(1, "a", "x"), (2, "b", "y"), (3, "a", "z")]),
        d, ["id"], "part",
    )
    merge_upsert(_rows(spark, [(1, "a", "X")]), d)
    merge_upsert(_rows(spark, [(2, "b", "Y")]), d)
    before = _snap(spark, d)
    out = maintain_table(spark, d, retain_seconds=0.0, retain_snapshots=1)
    assert out["validated"] and out["versions_after"] == 1
    assert len(out["vacuumed_versions"]) >= 2  # superseded CoW sprawl gone
    assert _snap(spark, d) == before
    # the maintenance snapshot is the only retained one
    with pytest.raises(ValueError, match="not found"):
        read_table(spark, d, snapshot=1)


def test_validate_table_numeric_string_partitions(spark, tmp_path):
    """r12 regression: validate_table's batched per-version read must
    NOT let partition-type inference mangle numeric-looking STRING
    partition values (_pval=007 -> int 7, _pval=1.50 -> 1.5) into
    false stats mismatches against the manifest's string keys."""
    d = str(tmp_path / "numtbl")
    base = spark.range(0, 60).select(
        F.col("id").alias("k"),
        F.when(F.col("id") % 3 == 0, "007")
        .when(F.col("id") % 3 == 1, "1.50")
        .otherwise("2026-01-02")
        .alias("p"),
        (F.col("id") * 2).alias("v"),
    )
    create_table(base, d, ["k"], "p")
    val = validate_table(spark, d)
    assert val["ok"], val["problems"]
    # and real corruption in such a partition is still detected
    import glob
    import shutil

    victim = glob.glob(os.path.join(d, "v=*", "_pval=007"))[-1]
    shutil.rmtree(victim)
    val = validate_table(spark, d)
    assert not val["ok"]
    assert any("007" in p for p in val["problems"])
