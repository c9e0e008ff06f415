"""Systematic fault-schedule sweep over the shared staged-publish
protocol (VERDICT r10 next-round #3).

The IVF/minhash/bloom/merge writers share one publish shape: take a
LEASE via the versioned-manifest CAS -> stage data into a private dir
-> FENCE (finalize CAS that commits counts + a 'publishing' marker)
-> idempotent renames into the serving layout -> release -> reap.
The existing race tests probe known holes one at a time; this sweep
kills (or gracefully fails) a writer at EVERY protocol step and
asserts the invariant trio after recovery:

  1. serving state never mixed — the assignments dir holds only
     complete rows; queries keep serving throughout;
  2. counts never drift — the manifest's n_vectors equals the rows
     actually on disk (post-recovery);
  3. recovery completes exactly once — no vector duplicated, none
     lost, regardless of where the dead writer stopped.

Two crash modes per fault point:
  - 'crash': a kill -9 — the writer's own exception cleanup never
    runs (release/rmtree are disabled during the fault);
  - 'graceful': the exception path runs as written (only distinct
    from 'crash' for faults inside the try block).

The manifest-log substrate is pluggable (storage/cas.py:
set_manifest_store_factory): the full sweep runs on the hardlink
default, and the two most dangerous schedules (dead-after-stage,
dead-after-fence) re-run on the HDFS-style create-no-overwrite store
and the object-store conditional-PUT store — the 100 TB multi-writer
story on all three substrates the reference's FDB transactions stand
in for (FdbFactAppender.kt:33-65).
"""

import os
import shutil
import time

import pytest
from pyspark.sql import functions as F

from factstore_spark.operators import similarity as S
from factstore_spark.storage import cas as cas_mod
from factstore_spark.storage.cas import (
    ExclCreateSlotStore,
    FakeObjectStoreSlotStore,
    HardlinkSlotStore,
    ObjectStoreServer,
    read_versioned_manifest,
    set_manifest_store_factory,
)


class Killed(BaseException):
    """Simulated writer death — BaseException so nothing upstream
    accidentally swallows it as a data error."""


@pytest.fixture()
def corpus(spark):
    emb = (
        spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .limit(90)
        .cache()
    )
    emb.count()
    return emb


@pytest.fixture()
def objstore_server():
    srv = ObjectStoreServer()
    spec = srv.start()
    rest = spec[len("optimistic+objstore://"):]
    hostport, _, key = rest.partition("/")
    host, _, port = hostport.partition(":")
    yield host, int(port), key.encode()
    srv.stop()


def _substrate_factory(name, objstore):
    if name == "hardlink":
        return None
    if name == "excl":
        return ExclCreateSlotStore
    if name == "objstore":
        host, port, key = objstore
        return lambda d: FakeObjectStoreSlotStore(host, port, key, prefix=d)
    raise AssertionError(name)


# (fault point, counts_committed_at_death): where the writer dies, and
# whether the fencing finalize already committed the delta's counts —
# which decides what recovery must do with the staged rows (publish
# them exactly once vs never publish them).
FAULT_POINTS = [
    ("after_lease", False),
    ("after_stage", False),
    ("after_finalize", True),
    ("mid_publish", True),
    ("before_release", True),
]


def _install_fault(monkeypatch, point, mode):
    """Arm the fault. Returns nothing; the fault raises Killed."""
    real_swap = cas_mod.cas_swap_manifest
    if point == "after_lease":

        def swap(root, manifest, base, wp, what="manifest"):
            v = real_swap(root, manifest, base, wp, what=what)
            if what == "ivf-refresh lease":
                raise Killed(point)
            return v

        monkeypatch.setattr(cas_mod, "cas_swap_manifest", swap)
    elif point == "after_stage":
        # die attempting the fencing finalize: staged data exists,
        # counts NOT committed
        def swap(root, manifest, base, wp, what="manifest"):
            if what == "ivf-refresh":
                raise Killed(point)
            return real_swap(root, manifest, base, wp, what=what)

        monkeypatch.setattr(cas_mod, "cas_swap_manifest", swap)
    elif point == "after_finalize":
        def publish(staging, assignments):
            raise Killed(point)

        monkeypatch.setattr(S, "_publish_staged_cells", publish)
    elif point == "mid_publish":
        real_rename = os.rename
        calls = {"n": 0}

        def rename(src, dst, **kw):
            calls["n"] += 1
            if calls["n"] >= 2:
                raise Killed(point)
            return real_rename(src, dst, **kw)

        monkeypatch.setattr(os, "rename", rename)
    elif point == "before_release":
        def release(index_dir, lease):
            raise Killed(point)

        monkeypatch.setattr(S, "_release_ivf_lease", release)
    else:
        raise AssertionError(point)
    if mode == "crash":
        # kill -9: the writer's own cleanup (lease release, staging
        # rmtree) never runs. For before_release the release IS the
        # fault site, already patched above.
        if point != "before_release":
            monkeypatch.setattr(S, "_release_ivf_lease", lambda *a, **k: None)
        real_rmtree = shutil.rmtree

        def rmtree(path, **kw):
            if "_staging" in str(path):
                return  # dead process can't clean its staging
            return real_rmtree(path, **kw)

        monkeypatch.setattr(shutil, "rmtree", rmtree)


def _assert_recovered(spark, idx, expected_ids):
    """The invariant trio, post-recovery."""
    adir, _cpath, _m = S._ivf_paths(idx)
    ids = [
        r.neighbor_id
        for r in spark.read.parquet(adir).select("neighbor_id").collect()
    ]
    assert len(ids) == len(set(ids)), "a vector published twice"
    assert set(ids) == expected_ids, "rows lost or foreign rows served"
    head, _v = read_versioned_manifest(idx, S._read_ivf_manifest)
    assert head["n_vectors"] == len(ids), "manifest count drifted from data"
    assert "pending" not in head, "recovery left a zombie lease"


def _run_schedule(spark, corpus, tmp_path, monkeypatch, point,
                  counts_committed, mode):
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    delta = corpus.filter(F.col("vec_id") % 2 == 1)
    all_ids = {r.vec_id for r in corpus.select("vec_id").collect()}
    base_ids = {r.vec_id for r in base.select("vec_id").collect()}
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(base, idx, n_cells=4, train_iterations=1)

    with monkeypatch.context() as mp:
        _install_fault(mp, point, mode)
        with pytest.raises(Killed):
            S.refresh_ivf_index(spark, delta, idx, lease_seconds=0.7)

    # --- post-death safety: serving state is never mixed ---------------
    adir, _cpath, _m = S._ivf_paths(idx)
    got = [
        r.neighbor_id
        for r in spark.read.parquet(adir).select("neighbor_id").collect()
    ]
    assert len(got) == len(set(got)), "duplicates visible after death"
    assert set(got) <= all_ids and base_ids <= set(got)
    head, _v = read_versioned_manifest(idx, S._read_ivf_manifest)
    if counts_committed:
        # the documented window: counts fenced ahead of data until the
        # next writer completes the dead publish
        assert head["n_vectors"] == len(all_ids)
    elif mode == "crash":
        assert head["n_vectors"] == len(base_ids)

    # --- recovery: next writer supersedes the lapsed lease -------------
    if mode == "crash":
        time.sleep(0.8)  # let the dead writer's declared lease lapse
    out = S.refresh_ivf_index(spark, corpus, idx, lease_seconds=60.0)
    _assert_recovered(spark, idx, all_ids)
    # the recovery's own delta detection agrees with the final state:
    # re-running finds nothing new (exactly-once, idempotent)
    assert S.refresh_ivf_index(spark, corpus, idx)["n_new"] == 0
    _assert_recovered(spark, idx, all_ids)
    return out


@pytest.mark.parametrize("point,counts_committed", FAULT_POINTS)
def test_crash_schedule_hardlink(spark, corpus, tmp_path, monkeypatch,
                                 point, counts_committed):
    _run_schedule(
        spark, corpus, tmp_path, monkeypatch, point, counts_committed,
        mode="crash",
    )


def test_graceful_failure_after_stage_releases_immediately(
    spark, corpus, tmp_path, monkeypatch
):
    """A writer that FAILS (exception, not kill -9) at the fencing
    finalize runs its cleanup: the lease is released and staging
    removed, so the next writer proceeds immediately — no expiry wait,
    and the staged-but-unfenced rows are never published."""
    base = corpus.filter(F.col("vec_id") % 2 == 0)
    delta = corpus.filter(F.col("vec_id") % 2 == 1)
    all_ids = {r.vec_id for r in corpus.select("vec_id").collect()}
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(base, idx, n_cells=4, train_iterations=1)
    with monkeypatch.context() as mp:
        _install_fault(mp, "after_stage", mode="graceful")
        with pytest.raises(Killed):
            S.refresh_ivf_index(spark, delta, idx, lease_seconds=3600.0)
    head, _v = read_versioned_manifest(idx, S._read_ivf_manifest)
    assert "pending" not in head, "graceful failure must release its lease"
    assert not os.path.isdir(os.path.join(idx, "_staging")) or not os.listdir(
        os.path.join(idx, "_staging")
    )
    # no expiry sleep: the very next refresh lands the delta
    out = S.refresh_ivf_index(spark, delta, idx)
    assert out["n_new"] == delta.count()
    _assert_recovered(spark, idx, all_ids)


@pytest.mark.parametrize("substrate", ["excl", "objstore"])
@pytest.mark.parametrize(
    "point,counts_committed", [("after_stage", False), ("after_finalize", True)]
)
def test_crash_schedule_other_substrates(
    spark, corpus, tmp_path, monkeypatch, objstore_server, substrate,
    point, counts_committed,
):
    """The two most dangerous schedules (dead before/after the fence)
    on the create-no-overwrite and conditional-PUT manifest substrates:
    same protocol, same invariant trio."""
    factory = _substrate_factory(substrate, objstore_server)
    set_manifest_store_factory(factory)
    try:
        _run_schedule(
            spark, corpus, tmp_path, monkeypatch, point, counts_committed,
            mode="crash",
        )
    finally:
        set_manifest_store_factory(None)


def test_torn_manifest_slot_serves_prior_snapshot(tmp_path):
    """Create-no-overwrite substrates can expose a reserved-but-empty
    snap slot (HDFS semantics): the reader must fall back to the last
    COMPLETE snapshot instead of crashing or serving a torn head."""
    root = str(tmp_path / "idx")
    snaps = os.path.join(root, "_manifests")
    store = HardlinkSlotStore(snaps)
    assert store.put_if_absent("snap-1.json", b'{"n_vectors": 7}')
    # a dead excl-create writer reserved snap-2 but never wrote it
    open(os.path.join(snaps, "snap-2.json"), "wb").close()
    m, v = read_versioned_manifest(root, lambda r: {})
    assert (m, v) == ({"n_vectors": 7}, 1)
    # a writer based on v=1 LOSES to the YOUNG reservation (the dead
    # writer might still be mid-publish) — with the DISTINCT torn-slot
    # error naming the age gate, not the generic retry advice
    from factstore_spark.storage.cas import (
        TornManifestSlotError,
        cas_swap_manifest,
    )

    with pytest.raises(TornManifestSlotError, match="reclaimable"):
        cas_swap_manifest(root, {"n_vectors": 8}, 1, lambda r, man: None)
    # the failed attempt must not have disturbed the serving state
    m, v = read_versioned_manifest(root, lambda r: {})
    assert (m, v) == ({"n_vectors": 7}, 1)


def test_torn_manifest_slot_reclaimed_past_age_gate(tmp_path, monkeypatch):
    """ADVICE r11 (medium): a dead writer's reserved-but-unparseable
    slot must not wedge commits forever. Once the carcass ages past
    TORN_SLOT_RECLAIM_AGE_SECONDS, the next writer deletes it and
    re-claims the same version — no manual cleanup, no livelock."""
    root = str(tmp_path / "idx")
    snaps = os.path.join(root, "_manifests")
    store = HardlinkSlotStore(snaps)
    assert store.put_if_absent("snap-1.json", b'{"n_vectors": 7}')
    open(os.path.join(snaps, "snap-2.json"), "wb").close()
    # backdate the carcass past the (real, untouched) 30s gate
    old = time.time() - 2 * cas_mod.TORN_SLOT_RECLAIM_AGE_SECONDS
    os.utime(os.path.join(snaps, "snap-2.json"), (old, old))
    from factstore_spark.storage.cas import cas_swap_manifest

    ptr = {}
    got = cas_swap_manifest(
        root, {"n_vectors": 8}, 1, lambda r, man: ptr.update(man)
    )
    assert got == 2
    m, v = read_versioned_manifest(root, lambda r: {})
    assert (m, v) == ({"n_vectors": 8}, 2)
    assert ptr == {"n_vectors": 8}
    # and a PARSEABLE slot is never reclaimed, however old: a real
    # writer committed it (single-winner contract stays intact)
    os.utime(os.path.join(snaps, "snap-2.json"), (old, old))
    from factstore_spark.storage.cas import (
        ConcurrentManifestSwapError,
        TornManifestSlotError,
    )

    with pytest.raises(ConcurrentManifestSwapError) as exc:
        cas_swap_manifest(root, {"n_vectors": 10}, 1, lambda r, man: None)
    assert not isinstance(exc.value, TornManifestSlotError)
    m, v = read_versioned_manifest(root, lambda r: {})
    assert (m, v) == ({"n_vectors": 8}, 2)


def test_read_path_creates_no_dirs(tmp_path):
    """Manifest reads on a never-written root must not create
    _manifests (read-only mounts; describe paths)."""
    root = str(tmp_path / "ro")
    os.makedirs(root)
    m, v = read_versioned_manifest(root, lambda r: None)
    assert (m, v) == (None, 0)
    assert not os.path.exists(os.path.join(root, "_manifests"))


# ---------------------------------------------------------------------------
# Minhash segment writer: the OTHER user of the shared manifest CAS
# (segment-append shape: write-all-then-swap, no staging/fence needed)
# ---------------------------------------------------------------------------


@pytest.fixture()
def docs(spark):
    d = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text")
        .cache()
    )
    d.count()
    return d


@pytest.mark.parametrize("point", ["before_swap", "after_swap"])
def test_minhash_append_crash_schedule(spark, docs, tmp_path, monkeypatch,
                                       point):
    """Kill an index append around its single commit point. Dead
    BEFORE the swap: the segment is an invisible orphan — the index
    serves exactly the pre-append state and a retried append lands
    exactly once. Dead AFTER the swap (before the caller observed
    success): the commit already happened — the effectively-once
    contract is that a blind retry re-appends duplicate SIGNATURES,
    which the candidate-join distinct absorbs (pair results identical)
    and compaction collapses."""
    from factstore_spark.operators import dedup as D

    archive = docs.filter(F.col("doc_id") % 10 != 0)
    inc = docs.filter(F.col("doc_id") % 10 == 0)
    idx = str(tmp_path / "mh")
    D.write_minhash_index(archive, idx)
    want_pairs = sorted(
        (r.id_a, r.id_b)
        for r in D.incremental_minhash_pairs(inc, idx).collect()
    )
    m0, _v0 = D._read_minhash_manifest_versioned(idx)
    real_swap = D._cas_swap_minhash_manifest

    def dying_swap(index_dir, manifest, base):
        if point == "before_swap":
            raise Killed(point)
        real_swap(index_dir, manifest, base)
        raise Killed(point)

    with monkeypatch.context() as mp:
        mp.setattr(D, "_cas_swap_minhash_manifest", dying_swap)
        with pytest.raises(Killed):
            D.append_minhash_index(inc, idx)

    m1, _v1 = D._read_minhash_manifest_versioned(idx)
    if point == "before_swap":
        # nothing published: manifest unchanged, probe results identical
        assert m1.get("segments") == m0.get("segments")
        got = sorted(
            (r.id_a, r.id_b)
            for r in D.incremental_minhash_pairs(inc, idx).collect()
        )
        assert got == want_pairs
    # retry (the stream sink's redelivery path)
    D.append_minhash_index(inc, idx)
    m2, _v2 = D._read_minhash_manifest_versioned(idx)
    n_new_segments = len(m2["segments"]) - len(m0.get("segments") or [])
    assert n_new_segments == (1 if point == "before_swap" else 2)
    # every manifest-referenced segment exists on disk (no torn refs)
    for seg in m2["segments"]:
        assert os.path.isdir(os.path.join(idx, seg)) or seg == "."
    # the index is self-consistent either way: a FURTHER increment
    # dedups against the appended docs without duplicate pairs
    probe = docs.filter(F.col("doc_id") % 10 == 0).limit(20)
    rows = D.incremental_minhash_pairs(probe, idx).collect()
    seen = [(r.id_a, r.id_b) for r in rows]
    assert len(seen) == len(set(seen)), "duplicate pairs from retry segments"
    # compaction collapses segments (and the orphan never resurfaces)
    D.compact_minhash_index(spark, idx, retain_seconds=0)
    m3, _v3 = D._read_minhash_manifest_versioned(idx)
    assert len(m3["segments"]) == 1
    rows = D.incremental_minhash_pairs(probe, idx).collect()
    seen = [(r.id_a, r.id_b) for r in rows]
    assert len(seen) == len(set(seen))
