"""Log-derived subject-head index (storage/heads.py) — the round-13
replacement for the O(all-subjects-ever) heads.json cache (VERDICT r12
task #1). Covers: subj_fps commit skipping (zero file opens for cold
subjects), snapshot shard lookups, incremental vs full folds, the
Spark-distributed rebuild matching the pyarrow shard function exactly,
bulk-commit fingerprints (capped and over-cap), and post-compaction
lookups against a stale snapshot."""

import json
import os

import pytest

from factstore_spark.model import FactInput, FactPayload
from factstore_spark.results import Appended
from factstore_spark.storage.heads import HeadsIndex, choose_shards
from factstore_spark.storage.layout import (
    MAX_SUBJ_FPS,
    commit_subj_fps,
    subject_fingerprint,
)
from factstore_spark.store import FactStore

STORE = "heads-probe"


def fi(subject="S:1", n=0, tags=None):
    return FactInput(
        type="Probe",
        subject=subject,
        payload=FactPayload(json.dumps({"n": n}).encode(), format="json"),
        tags=tags or {},
    )


def _layout(fs, store=STORE):
    return fs._layout(fs.catalog.find_by_name(store).id)


def test_commit_records_carry_subject_fps(fs):
    fs.create(STORE)
    fs.append(STORE, [fi("A"), fi("B"), fi("A")])
    lay = _layout(fs)
    (c,) = [c for c in lay.read_commits() if c.rows > 0]
    assert c.subj_fps == sorted(
        {subject_fingerprint("A"), subject_fingerprint("B")}
    )


def test_subj_fps_caps_to_none():
    rows = [{"subject": f"s{i}"} for i in range(MAX_SUBJ_FPS + 1)]
    assert commit_subj_fps(rows) is None
    assert commit_subj_fps(rows[:MAX_SUBJ_FPS]) is not None


def test_lookup_prunes_cold_subjects_to_zero_file_opens(fs, monkeypatch):
    """A subject no commit's subj_fps contains must resolve (to its
    snapshot entry or None) WITHOUT opening any tail fact file — the
    100 TB property: lookup cost is independent of tail length for
    cold subjects."""
    fs.create(STORE)
    for i in range(8):
        fs.append(STORE, fi(f"S:{i}", i))
    lay = _layout(fs)

    opened = []
    idx = HeadsIndex(lay)
    real = HeadsIndex._max_position_row

    def counting(self, files, subject):
        opened.extend(files)
        return real(self, files, subject)

    monkeypatch.setattr(HeadsIndex, "_max_position_row", counting)
    assert idx.lookup("S:never") is None
    assert opened == [], "cold-subject lookup opened tail files"
    # hot subject: exactly its own newest commit's file
    hit = idx.lookup("S:3")
    assert hit is not None
    assert len(opened) == 1


def test_hot_subject_early_exits_at_newest_commit(fs, monkeypatch):
    """A subject appended in many commits costs ONE file open — the
    newest-first early exit."""
    fs.create(STORE)
    results = [fs.append(STORE, fi("HOT", i)) for i in range(10)]
    lay = _layout(fs)
    calls = []
    real = HeadsIndex._max_position_row

    def counting(self, files, subject):
        calls.append(files)
        return real(self, files, subject)

    monkeypatch.setattr(HeadsIndex, "_max_position_row", counting)
    hit = HeadsIndex(lay).lookup("HOT")
    assert hit == (results[-1].fact_ids[0], lay.head_position())
    assert len(calls) == 1


def test_snapshot_fold_and_shard_lookup(fs):
    fs.create(STORE)
    heads = {}
    for i in range(20):
        r = fs.append(STORE, fi(f"S:{i % 7}", i))
        heads[f"S:{i % 7}"] = r.fact_ids[0]
    lay = _layout(fs)
    idx = HeadsIndex(lay)
    out = idx.refresh()
    assert out["built"] and out["mode"] == "rebuild-local"
    assert idx.snap_meta()["through_seq"] == lay.last_commit().seq
    for s, fid in heads.items():
        got = idx.lookup(s)
        assert got is not None and got[0] == fid
    # incremental fold after more commits touches only their shards
    r = fs.append(STORE, fi("S:0", 99))
    out2 = idx.refresh()
    assert out2["built"] and out2["mode"] == "incremental"
    assert out2["touched_shards"] == 1
    assert idx.lookup("S:0")[0] == r.fact_ids[0]
    # untouched subjects still resolve through hardlinked shards
    for s, fid in heads.items():
        if s != "S:0":
            assert idx.lookup(s)[0] == fid


def test_spark_rebuild_matches_local_shard_function(fs, spark):
    """The distributed rebuild's conv(substring(md5..)) shard column
    must land every subject in the shard subject_fingerprint() % S
    picks, or lookups would miss snapshot entries."""
    fs.create(STORE)
    heads = {}
    for i in range(25):
        r = fs.append(STORE, fi(f"Subj:{i}", i))
        heads[f"Subj:{i}"] = r.fact_ids[0]
    lay = _layout(fs)
    idx = HeadsIndex(lay)
    out = idx.refresh(spark)
    assert out["built"] and out["mode"] == "rebuild-spark"
    assert out["heads"] == 25
    for s, fid in heads.items():
        got = idx.lookup(s)
        assert got is not None and got[0] == fid, s
    assert idx.lookup("Subj:absent") is None


@pytest.mark.parametrize("backend", ["flock", "optimistic"])
def test_bulk_commit_subject_fps_and_lookup(spark, store_root, backend):
    fs = FactStore(spark, store_root, commit_backend=backend)
    fs.create(STORE)
    df = spark.createDataFrame(
        [(f"B:{i % 5}", "Bulk", bytearray(b"{}"), "json", {}) for i in range(50)],
        "subject string, type string, payload_data binary, payload_format string, tags map<string,string>",
    ).selectExpr(
        "type",
        "subject",
        "named_struct('data', payload_data, 'format', payload_format) as payload",
        "tags",
    )
    res = fs.append_dataframe(STORE, df)
    assert isinstance(res, Appended)
    lay = _layout(fs)
    bulk = [c for c in lay.read_commits() if c.rows == 50]
    assert bulk and bulk[0].subj_fps is not None
    assert len(bulk[0].subj_fps) == 5
    # lookup resolves through the bulk commit
    for i in range(5):
        got = lay.last_fact_of_subject(f"B:{i}")
        assert got is not None
    assert lay.last_fact_of_subject("B:99") is None
    # a row-wise append after the bulk supersedes the bulk head
    r = fs.append(STORE, [fi("B:0", 7)])
    assert lay.last_fact_of_subject("B:0") == (
        r.fact_ids[0],
        lay.head_position(),
    )


def test_bulk_over_cap_records_none_and_still_resolves(spark, store_root):
    fs = FactStore(spark, store_root)
    fs.create(STORE)
    n = MAX_SUBJ_FPS + 20
    df = spark.createDataFrame(
        [(f"C:{i}", "Bulk", bytearray(b"{}"), "json", {}) for i in range(n)],
        "subject string, type string, payload_data binary, payload_format string, tags map<string,string>",
    ).selectExpr(
        "type",
        "subject",
        "named_struct('data', payload_data, 'format', payload_format) as payload",
        "tags",
    )
    assert isinstance(fs.append_dataframe(STORE, df), Appended)
    lay = _layout(fs)
    bulk = [c for c in lay.read_commits() if c.rows == n]
    assert bulk and bulk[0].subj_fps is None  # over cap: must-scan
    assert lay.last_fact_of_subject("C:5") is not None
    assert lay.last_fact_of_subject("C:absent") is None


def test_lookup_after_compaction_with_stale_snapshot(fs):
    """Compaction purges per-commit files; a snapshot older than the
    compaction horizon must fall through to the compacted layout's
    subject-pushdown scan — exact, with no per-commit files left."""
    fs.create(STORE)
    heads = {}
    for i in range(12):
        r = fs.append(STORE, fi(f"S:{i % 4}", i, tags={"d": "x"}))
        heads[f"S:{i % 4}"] = r.fact_ids[0]
    lay = _layout(fs)
    out = fs.compact(STORE)
    assert out.get("compacted"), out
    idx = HeadsIndex(lay)
    assert idx.snap_meta()["through_seq"] == -1  # never folded
    for s, fid in heads.items():
        got = idx.lookup(s)
        assert got is not None and got[0] == fid, s
    assert idx.lookup("S:none") is None
    # post-compaction appends are found first (tail over compacted)
    r = fs.append(STORE, fi("S:1", 99))
    assert idx.lookup("S:1")[0] == r.fact_ids[0]
    # a refresh now takes the rebuild path (gap superseded by compaction)
    out2 = idx.refresh()
    assert out2["built"] and out2["mode"].startswith("rebuild")
    for s, fid in heads.items():
        if s != "S:1":
            assert idx.lookup(s)[0] == fid


def test_maintain_folds_heads_snapshot(fs):
    fs.create(STORE)
    for i in range(6):
        fs.append(STORE, fi(f"M:{i}", i, tags={"t": "v"}))
    steps = fs.maintain(STORE)
    assert steps["heads_snapshot"]["built"], steps["heads_snapshot"]
    lay = _layout(fs)
    info = fs.describe_store(STORE)
    assert info["heads_snapshot_through"] == lay.last_commit().seq


def test_choose_shards_scales():
    assert choose_shards(0) == 16
    assert choose_shards(10_000) == 16
    s = choose_shards(50_000_000)
    assert s > 16 and s <= 4096
    assert choose_shards(10**10) == 4096


def test_corrupt_snapshot_pointer_degrades_to_tail_scan(fs):
    """A corrupt/garbage pointer file must read as 'no snapshot'
    (lookups fall back to the exact tail scan), never crash or divide
    by zero; the next refresh rebuilds cleanly."""
    fs.create(STORE)
    r = fs.append(STORE, fi("P:1", 1))
    lay = _layout(fs)
    idx = HeadsIndex(lay)
    idx.refresh()
    import os

    for garbage in ('{"through_seq": 3, "dir": "x", "shards": 0}', "not json", ""):
        with open(idx.pointer_path, "w") as f:
            f.write(garbage)
        assert idx.snap_meta()["dir"] is None
        assert lay.last_fact_of_subject("P:1") == (
            r.fact_ids[0],
            lay.head_position(),
        )
    out = idx.refresh()
    assert out["built"] and out["mode"].startswith("rebuild")
    assert lay.last_fact_of_subject("P:1")[0] == r.fact_ids[0]


def test_late_published_reservation_does_not_shadow_newer_head(spark, store_root):
    """Optimistic backend: a bulk commit PUBLISHED after a snapshot
    fold carries positions from its earlier RESERVATION — lower than
    commits folded meanwhile. A tail hit from it must not shadow the
    snapshot's newer head (the r12 heads.json silently did): the lookup
    position-compares against the snapshot's max_position bound and
    returns the higher head. Same for the incremental fold's merge."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from factstore_spark.schema import FACT_ARROW_SCHEMA, POSITION_STRIDE
    from factstore_spark.storage.layout import utcnow_us

    fs = FactStore(spark, store_root, commit_backend="optimistic")
    fs.create(STORE)
    lay = _layout(fs)

    # seed so the reservation lands above live data
    fs.append(STORE, fi("S", 0))
    seq, base = lay.reserve_position_range(10, utcnow_us())

    # two newer row commits touch S at HIGHER positions
    fs.append(STORE, fi("S", 1))
    r2 = fs.append(STORE, fi("S", 2))
    true_head = (r2.fact_ids[0], lay.head_position())

    # snapshot fold covers everything published so far
    idx = HeadsIndex(lay)
    assert idx.refresh()["built"]
    assert lay.last_fact_of_subject("S") == true_head

    # now PUBLISH the reserved bulk containing S at the LOW positions
    dir_name = f"commit-{seq:010d}-bulk"
    bulk_dir = os.path.join(lay.data_dir, dir_name)
    os.makedirs(bulk_dir, exist_ok=True)
    rows = [
        {
            "id": "bulk-fact", "type": "Bulk", "subject": "S",
            "appended_at": utcnow_us(), "position": base + 3,
            "payload": {"data": b"{}", "format": "json", "schema_ref": None},
            "metadata": {}, "tags": {},
        }
    ]
    pq.write_table(
        pa.Table.from_pylist(rows, schema=FACT_ARROW_SCHEMA),
        os.path.join(bulk_dir, "part-0.parquet"),
    )
    from factstore_spark.storage.layout import subject_fingerprint

    pseq = lay.publish_bulk(
        dir_name, 1, base + 3, utcnow_us(), None,
        subj_fps=[subject_fingerprint("S")],
    )
    assert pseq is not None
    assert base + 3 < true_head[1]  # the bulk really is below the head

    # lookup: the tail hit (bulk) must NOT shadow the snapshot head
    assert lay.last_fact_of_subject("S") == true_head

    # and the incremental fold must keep the higher head too
    out = idx.refresh()
    assert out["built"], out
    assert lay.last_fact_of_subject("S") == true_head
    # while a subject ONLY in the bulk resolves normally
    rows2 = lay.last_fact_of_subject("S")  # stability double-check
    assert rows2 == true_head


# ---------------------------------------------------------------------------
# Round-14: incremental folds across compaction (VERDICT r13 task #1)
# ---------------------------------------------------------------------------


def test_maintain_cycles_never_rebuild_heads(fs):
    """The r13 scale defect: maintain() compacted FIRST, superseding the
    tail files the incremental fold needed, so every compacting
    maintenance cycle forced a full O(store) heads rebuild. With the
    fold reordered before compact (plus the cheap post-compact
    re-align), repeated maintain cycles with new data + compaction must
    report incremental/pointer-only modes — never rebuild."""
    fs.create(STORE)
    for i in range(4):
        fs.append(STORE, fi(f"C:init:{i}", i))
    first = fs.refresh_heads_snapshot(STORE)
    assert first["built"] and first["mode"].startswith("rebuild")  # initial build only
    heads = {}
    for cycle in range(2):
        for i in range(5):
            r = fs.append(STORE, fi(f"C:{cycle}:{i}", i))
            heads[f"C:{cycle}:{i}"] = r.fact_ids[0]
        steps = fs.maintain(STORE)
        assert steps["compact"].get("compacted"), steps["compact"]
        pre = steps["heads_snapshot_pre"]
        assert pre["built"] and pre["mode"] == "incremental", (cycle, pre)
        post = steps["heads_snapshot_post"]
        assert not str(post.get("mode", "")).startswith("rebuild"), (cycle, post)
        lay = _layout(fs)
        idx = HeadsIndex(lay)
        snap = idx.snap_meta()
        commits = lay.read_commits()
        ct = max(
            (c.compacted_through for c in commits if c.compacted_through is not None),
            default=-1,
        )
        # snapshot horizon at/above the compaction horizon: lookups stay
        # on the shard path, never the compacted-layout scan
        assert snap["through_seq"] >= ct, (snap, ct)
    for s, fid in heads.items():
        assert _layout(fs).last_fact_of_subject(s)[0] == fid, s


def test_refresh_incremental_over_superseded_on_disk_files(fs):
    """A commit that lands between the heads fold and a compaction is
    superseded with its files still on disk (compact keeps the current
    generation at its old paths) — the next refresh folds it
    incrementally instead of rebuilding."""
    fs.create(STORE)
    for i in range(4):
        fs.append(STORE, fi(f"R:{i}", i))
    fs.refresh_heads_snapshot(STORE)
    r = fs.append(STORE, fi("R:raced", 9))  # lands after the fold
    out = fs.compact(STORE)  # supersedes it; files survive on disk
    assert out.get("compacted"), out
    res = fs.refresh_heads_snapshot(STORE)
    assert res["built"] and res["mode"] == "incremental", res
    lay = _layout(fs)
    assert lay.last_fact_of_subject("R:raced")[0] == r.fact_ids[0]
    idx = HeadsIndex(lay)
    commits = lay.read_commits()
    ct = max(
        (c.compacted_through for c in commits if c.compacted_through is not None),
        default=-1,
    )
    assert idx.snap_meta()["through_seq"] >= ct


def test_checkpoint_folded_gap_forces_rebuild(fs):
    """When a checkpoint has folded away per-commit records the snapshot
    never saw, the gap is not enumerable — refresh must detect it and
    rebuild (with the reason surfaced), never fold a partial gap."""
    fs.create(STORE)
    for i in range(3):
        fs.append(STORE, fi(f"K:{i}", i))
    fs.refresh_heads_snapshot(STORE)
    r = fs.append(STORE, fi("K:raced", 7))
    assert fs.compact(STORE).get("compacted")
    assert fs.checkpoint(STORE).get("checkpointed")  # drops the raced record
    res = fs.refresh_heads_snapshot(STORE)
    assert res["built"] and res["mode"].startswith("rebuild"), res
    assert res.get("reason") == "checkpoint folded the gap", res
    lay = _layout(fs)
    assert lay.last_fact_of_subject("K:raced")[0] == r.fact_ids[0]


def test_sweep_waits_for_supersession_not_creation(fs):
    """ADVICE r13: the 1 h reap grace must count from when a snapshot
    dir was SUPERSEDED, not from its creation — folds running less
    often than hourly must not reap the old dir the instant a new
    pointer publishes (a reader may still be on it)."""
    import time

    fs.create(STORE)
    fs.append(STORE, fi("W:1", 1))
    lay = _layout(fs)
    idx = HeadsIndex(lay)
    idx.refresh()
    dir_a = idx.snap_meta()["dir"]
    p_a = os.path.join(idx.root, dir_a)
    old = time.time() - 7200
    os.utime(p_a, (old, old))  # created >1h ago, still live
    fs.append(STORE, fi("W:2", 2))
    out = idx.refresh()
    assert out["built"], out
    assert idx.snap_meta()["dir"] != dir_a
    assert os.path.isdir(p_a), (
        "superseded dir reaped immediately (grace counted from creation, "
        "not supersession)"
    )
    os.utime(p_a, (old, old))  # now: superseded >1h ago
    idx._sweep_old()
    assert not os.path.isdir(p_a)


def test_shard_lookup_survives_raced_sweep(fs):
    """ADVICE r13: a lookup that resolved the old pointer just before a
    sweep reaped its dir must re-resolve and answer exactly — never
    silently report 'no head' (which could let an ExpectedLastFact
    condition falsely succeed: a lost update)."""
    import shutil

    fs.create(STORE)
    r1 = fs.append(STORE, fi("V:1", 1))
    lay = _layout(fs)
    idx = HeadsIndex(lay)
    idx.refresh()
    stale = idx.snap_meta()
    fs.append(STORE, fi("V:2", 2))
    idx.refresh()  # publishes a new snapshot dir
    assert idx.snap_meta()["dir"] != stale["dir"]
    shutil.rmtree(os.path.join(idx.root, stale["dir"]))  # the raced sweep
    got = idx._shard_lookup(stale, "V:1")
    assert got is not None and got[0] == r1.fact_ids[0]
