"""Optimistic (lock-free claim-retry) backend: full engine lifecycle —
appends, conditions, idempotency, bulk reserve/publish, finders,
replay, compaction — must behave identically to the flock backend.
The cross-process races live in test_multiprocess_race.py."""

import pytest
from pyspark.sql import functions as F

from factstore_spark import ExpectedLastFact, FactInput, TagOnlyQueryItem, TagQuery
from factstore_spark.results import AlreadyApplied, Appended, AppendConditionViolated
from factstore_spark.store import FactStore

STORE = "opt-store"


@pytest.fixture()
def fso(spark, store_root):
    return FactStore(spark, store_root, commit_backend="optimistic")


def test_append_and_finders_roundtrip(fso):
    fso.create(STORE)
    r1 = fso.append(STORE, FactInput(type="A", subject="S1", tags={"k": "v"}))
    r2 = fso.append(STORE, FactInput(type="B", subject="S1"))
    assert isinstance(r1, Appended) and isinstance(r2, Appended)
    assert r2.positions[0] > r1.positions[0]

    hist = fso.find_by_subject(STORE, "S1")
    assert [f.type for f in hist.facts] == ["A", "B"]
    tagged = fso.find_by_tags(STORE, {"k": "v"})
    assert len(tagged.facts) == 1
    assert fso.find_by_id(STORE, r1.fact_ids[0]).fact.type == "A"


def test_conditions_and_idempotency(fso):
    fso.create(STORE)
    r1 = fso.append(STORE, FactInput(type="A", subject="S"),
                    condition=ExpectedLastFact("S", None))
    assert isinstance(r1, Appended)
    stale = fso.append(STORE, FactInput(type="B", subject="S"),
                       condition=ExpectedLastFact("S", None))
    assert isinstance(stale, AppendConditionViolated)

    key = "11111111-2222-3333-4444-555555555555"
    a = fso.append(STORE, FactInput(type="C", subject="S"), idempotency_key=key)
    b = fso.append(STORE, FactInput(type="C", subject="S"), idempotency_key=key)
    assert isinstance(a, Appended) and isinstance(b, AlreadyApplied)


def test_bulk_reserve_publish_roundtrip(fso, spark):
    fso.create(STORE)
    fso.append(STORE, FactInput(type="ROW", subject="pre"))
    df = spark.range(50).repartition(4).select(
        F.lit("BULK").alias("type"),
        F.concat(F.lit("S"), F.col("id")).alias("subject"),
        F.struct(
            F.lit(b"").alias("data"),
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("string").alias("schema_ref"),
        ).alias("payload"),
        F.create_map().cast("map<string,string>").alias("metadata"),
        F.create_map().cast("map<string,string>").alias("tags"),
    )
    res = fso.append_dataframe(STORE, df)
    assert isinstance(res, Appended)
    lo, hi = res.positions
    assert hi - lo == 49
    # row append after bulk lands above the published range
    after = fso.append(STORE, FactInput(type="ROW", subject="post"))
    assert after.positions[0] > hi
    assert fso.facts_df(STORE).count() == 52
    # bulk idempotency through reserve/publish
    key = "99999999-8888-7777-6666-555555555555"
    fso.append_dataframe(STORE, df, idempotency_key=key)
    again = fso.append_dataframe(STORE, df, idempotency_key=key)
    assert isinstance(again, AlreadyApplied)
    # caller-position validation still enforced
    bad = df.withColumn("position", F.lit(-1))
    assert isinstance(fso.append_dataframe(STORE, bad), AppendConditionViolated)


def test_bulk_auto_position_instability_rejected_optimistic(fso, spark, monkeypatch):
    """Optimistic branch: the post-write aggregate (not the pre-write
    evaluation of ``df``) enforces unique in-range positions; a
    duplicate-producing assignment aborts before publish, leaving only
    the harmless reservation hole."""
    import factstore_spark.store as store_mod

    def unstable(df, base, with_count=False):
        out = df.withColumn("position", F.lit(base).cast("long"))
        return (out, df.count()) if with_count else out

    monkeypatch.setattr(store_mod, "assign_contiguous_positions", unstable)
    fso.create(STORE)
    df = spark.range(5).repartition(2).select(
        F.lit("BULK").alias("type"),
        F.concat(F.lit("S"), F.col("id")).alias("subject"),
        F.struct(
            F.lit(b"").alias("data"),
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("string").alias("schema_ref"),
        ).alias("payload"),
        F.create_map().cast("map<string,string>").alias("metadata"),
        F.create_map().cast("map<string,string>").alias("tags"),
    )
    res = fso.append_dataframe(STORE, df)
    assert isinstance(res, AppendConditionViolated)
    assert "not unique" in res.reason
    assert fso.facts_df(STORE).count() == 0
    # store still accepts a clean bulk afterwards
    monkeypatch.undo()
    ok = fso.append_dataframe(STORE, df)
    assert isinstance(ok, Appended)
    assert fso.facts_df(STORE).count() == 5


def test_orphan_bulk_dir_from_crashed_reserve_is_swept(fso, spark):
    """A crashed reserve-then-publish bulk ingest leaves a data dir
    whose reserve seq IS in the commit log (the zero-row reservation
    claim), so seq-membership must not shield it: once both the
    reservation claim and the dir are past the age gate with no publish
    record referencing the dir, the sweep reclaims it. A published dir
    of the same age survives."""
    import os
    import time

    from factstore_spark.storage.layout import utcnow_us

    fso.create(STORE)
    fso.append(STORE, FactInput(type="ROW", subject="s"))
    meta = fso.catalog.find_by_name(STORE)
    layout = fso._layout(meta.id)

    # published bulk dir (real reserve-then-publish ingest) — must
    # survive any sweep regardless of age: its publish record's `file`
    # field references the dir.
    df = spark.range(3).select(
        F.lit("BULK").alias("type"),
        F.concat(F.lit("S"), F.col("id")).alias("subject"),
        F.struct(
            F.lit(b"").alias("data"),
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("string").alias("schema_ref"),
        ).alias("payload"),
        F.create_map().cast("map<string,string>").alias("metadata"),
        F.create_map().cast("map<string,string>").alias("tags"),
    )
    res = fso.append_dataframe(STORE, df)
    assert isinstance(res, Appended)
    published_dirs = [
        d for d in os.listdir(layout.data_dir) if d.endswith("-bulk")
    ]
    assert len(published_dirs) == 1
    pub_dir = os.path.join(layout.data_dir, published_dirs[0])

    # simulate the crash: reserve a range, write the data dir, never publish
    seq, base = layout.reserve_position_range(9, utcnow_us())
    dir_name = f"commit-{seq:010d}-bulk"
    out_dir = os.path.join(layout.data_dir, dir_name)
    os.makedirs(out_dir)
    open(os.path.join(out_dir, "part-00000.parquet"), "wb").close()

    # fresh reservation: sweep must NOT touch the dir (publish may land)
    with layout.commit_lock():
        pass
    assert os.path.isdir(out_dir)

    # age everything past the 1 h gate — orphan AND published dir
    old = time.time() - 7200
    os.utime(out_dir, (old, old))
    os.utime(os.path.join(layout.log_dir, f"{seq:020d}.json"), (old, old))
    os.utime(pub_dir, (old, old))
    with layout.commit_lock():
        pass
    assert not os.path.exists(out_dir)  # leak reclaimed
    assert os.path.isdir(pub_dir)  # published dir shielded by its `file` record
    # the store is still fully functional and all committed data intact
    assert fso.facts_df(STORE).count() == 4


def test_replay_and_compaction(fso):
    fso.create(STORE)
    for i in range(30):
        fso.append(STORE, FactInput(type=f"T{i % 3}", subject=f"S{i % 5}",
                                    tags={"p": str(i % 2)}))
    batches = list(fso.replay(STORE))
    all_rows = [f for b in batches for f in b]
    assert len(all_rows) == 30
    positions = [f.position for f in all_rows]
    assert positions == sorted(positions)

    stats = fso.compact(STORE)
    assert stats["compacted"]
    q = TagQuery([TagOnlyQueryItem({"p": "1"})])
    assert len(fso.find_by_tag_query(STORE, q).facts) == 15
    # appends keep working after compaction (claim log + compaction record coexist)
    r = fso.append(STORE, FactInput(type="NEW", subject="S-new"))
    assert isinstance(r, Appended)
    assert fso.facts_df(STORE).count() == 31


def test_maintenance_lease_serializes_and_reclaims_expired(tmp_path):
    """The optimistic backend's commit_lock is a CAS lease, not flock:
    (a) two concurrent holders serialize; (b) an expired lease is
    reclaimed instead of deadlocking forever."""
    import os
    import threading
    import time

    from factstore_spark.storage.optimistic import OptimisticStoreLayout

    layout = OptimisticStoreLayout(str(tmp_path / "store"))
    layout.initialize()

    order = []

    def hold(tag):
        with layout.commit_lock():
            order.append(("in", tag))
            time.sleep(0.3)
            order.append(("out", tag))

    t1 = threading.Thread(target=hold, args=("a",))
    t2 = threading.Thread(target=hold, args=("b",))
    t1.start(); time.sleep(0.05); t2.start()
    t1.join(); t2.join()
    # strictly serialized: in/out pairs never interleave
    assert [e for e, _ in order] == ["in", "out", "in", "out"]

    # expired lease: plant a dead holder's slot, backdate it past TTL
    assert layout.slots.put_if_absent(layout.LEASE_SLOT, b"dead-holder")
    lease_path = os.path.join(layout.log_dir, layout.LEASE_SLOT)
    old = time.time() - layout.LEASE_TTL - 10
    os.utime(lease_path, (old, old))
    t0 = time.time()
    with layout.commit_lock():
        pass
    assert time.time() - t0 < 5  # reclaimed promptly, no TTL-long wait


def test_reclaim_storm_single_winner(tmp_path):
    """Concurrent reclaimers of ONE expired lease must never produce
    two simultaneous holders. The bare delete-then-put reclaim had a
    race (reclaimer A deletes + acquires, reclaimer B's pending delete
    removes A's FRESH lease and B acquires too); the delete is now
    gated on a per-generation reclaim token, so a stale delete misses.
    A barrier-synced storm maximizes the old race window."""
    import os
    import threading
    import time

    from factstore_spark.storage.optimistic import OptimisticStoreLayout

    layout = OptimisticStoreLayout(str(tmp_path / "store"))
    layout.initialize()
    assert layout.slots.put_if_absent(layout.LEASE_SLOT, b"dead-holder")
    lease_path = os.path.join(layout.log_dir, layout.LEASE_SLOT)
    old = time.time() - layout.LEASE_TTL - 10
    os.utime(lease_path, (old, old))

    n = 8
    barrier = threading.Barrier(n)
    active, overlaps, entered, errors = [], [], [], []
    lock = threading.Lock()

    def worker():
        barrier.wait()
        try:
            with layout.commit_lock():
                with lock:
                    if active:
                        overlaps.append(tuple(active))
                    active.append(threading.get_ident())
                    entered.append(threading.get_ident())
                time.sleep(0.05)
                with lock:
                    active.remove(threading.get_ident())
        except Exception as e:  # noqa: BLE001 — surfaced below
            errors.append(e)

    threads = [threading.Thread(target=worker) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    # Every reclaimer must have ACQUIRED (not crashed): a regression
    # that raises in the token-CAS retry loop would otherwise leave
    # overlaps empty and the test green with 7/8 workers dead.
    assert not errors, errors
    assert not any(t.is_alive() for t in threads), "worker wedged"
    assert len(entered) == n, f"only {len(entered)}/{n} reclaimers acquired"
    assert overlaps == []
    # everyone released; neither the lease nor any reclaim token leaks
    assert layout.slots.read(layout.LEASE_SLOT) is None
    leftover = [s for s in os.listdir(layout.log_dir) if "lease" in s]
    assert leftover == []


def test_maintain_end_to_end_on_object_store_backend(spark, tmp_path):
    """Full maintenance cycle (compact + checkpoint + tag-index
    refresh) through the conditional-PUT substrate: no flock involved
    anywhere — the coarse exclusion rides the CAS lease."""
    from factstore_spark.storage.cas import ObjectStoreServer

    srv = ObjectStoreServer()
    spec = srv.start()
    try:
        fs = FactStore(spark, str(tmp_path / "root"), commit_backend=spec)
        fs.create("m-store")
        for i in range(6):
            fs.append(
                "m-store",
                FactInput(type=f"T{i}", subject=f"s{i % 2}", tags={"k": f"v{i % 3}"}),
            )
        stats = fs.maintain("m-store")
        assert stats["compact"].get("compacted") is True
        hist = fs.find_by_subject("m-store", "s0")
        assert [f.type for f in hist.facts] == ["T0", "T2", "T4"]
        tagged = fs.find_by_tags("m-store", {"k": "v1"})
        assert len(tagged.facts) == 2
    finally:
        srv.stop()


def test_compaction_purge_protects_live_referenced_bulk_dir(fso, spark):
    """A bulk dir is named by its RESERVE seq; the publish can land
    under a LATER seq. The compaction purge must protect any dir a
    still-live commit references via ``file`` (and young unreferenced
    dirs), even when the name-embedded seq sits below prev_ct —
    deleting it would be permanent data loss."""
    import os
    import time

    from factstore_spark.storage.compact import compact_store
    from factstore_spark.storage.layout import utcnow_us

    fso.create(STORE)
    fso.append(STORE, FactInput(type="ROW", subject="seed"))
    meta = fso.catalog.find_by_name(STORE)
    layout = fso._layout(meta.id)

    # reserve EARLY: the range (and its low seq) is ours while the
    # long write "runs" across the compactions below
    seq, base = layout.reserve_position_range(2, utcnow_us())
    dir_name = f"commit-{seq:010d}-bulk"
    out_dir = os.path.join(layout.data_dir, dir_name)

    # two compactions move prev_ct past the reserve seq
    fso.append(STORE, FactInput(type="ROW", subject="mid1"))
    compact_store(spark, layout)
    fso.append(STORE, FactInput(type="ROW", subject="mid2"))
    compact_store(spark, layout)

    # the write finishes AFTER both compactions, in the engine's own
    # format (borrow a real published bulk commit's bytes), then the
    # publish lands under a late seq referencing the early-named dir
    df = spark.range(1).select(
        F.lit("BULK").alias("type"),
        F.lit("bulk-src").alias("subject"),
        F.struct(
            F.lit(b"").alias("data"),
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("string").alias("schema_ref"),
        ).alias("payload"),
        F.create_map().cast("map<string,string>").alias("metadata"),
        F.create_map().cast("map<string,string>").alias("tags"),
    )
    res = fso.append_dataframe(STORE, df)
    assert isinstance(res, Appended)
    import shutil

    real_dirs = sorted(
        d for d in os.listdir(layout.data_dir) if d.endswith("-bulk")
    )
    src = os.path.join(layout.data_dir, real_dirs[-1])
    shutil.copytree(src, out_dir)
    for f in list(os.listdir(out_dir)):
        if f.endswith(".crc") or f.startswith("_"):
            os.unlink(os.path.join(out_dir, f))  # stale Hadoop checksums
    import pyarrow.parquet as pq
    import pyarrow as pa

    # rebase the copied rows into the reserved range + rename subject
    for f in os.listdir(out_dir):
        if not f.endswith(".parquet"):
            continue
        p = os.path.join(out_dir, f)
        t = pq.read_table(p)
        if t.num_rows == 0:
            continue
        t = t.set_column(
            t.schema.get_field_index("position"),
            "position",
            pa.array([base], pa.int64()),
        )
        t = t.set_column(
            t.schema.get_field_index("id"), "id", pa.array(["id-b0"])
        )
        t = t.set_column(
            t.schema.get_field_index("subject"), "subject", pa.array(["bulk-subj"])
        )
        # INT96 like the engine's own writer: the session reads
        # TIMESTAMP(NANOS) as long (nanosAsLong), so a pyarrow-default
        # nanos annotation would type-mismatch appended_at
        pq.write_table(t, p, use_deprecated_int96_timestamps=True)
    pseq = layout.publish_bulk(dir_name, 1, base, utcnow_us(), "bulk-key")
    assert pseq is not None

    # age the dir so only the protected-set (not the age gate) saves it,
    # then compact again — the purge must skip the referenced dir
    old = time.time() - 7200
    os.utime(out_dir, (old, old))
    fso.append(STORE, FactInput(type="ROW", subject="mid3"))
    compact_store(spark, layout)
    assert os.path.isdir(out_dir), "live-referenced bulk dir was purged"
    got = fso.find_by_subject(STORE, "bulk-subj")
    assert [f.id for f in got.facts] == ["id-b0"]


def test_read_commits_probes_holes_below_lowest_listed_claim(fso):
    """A listing hole BELOW min(listed claims) — right above the jsonl
    checkpoint horizon — must be direct-read-probed like any interior
    hole; skipping it hands conditional appends a gappy snapshot."""
    fso.create(STORE)
    for i in range(4):
        fso.append(STORE, FactInput(type="T", subject=f"s{i}"))
    meta = fso.catalog.find_by_name(STORE)
    layout = fso._layout(meta.id)
    all_seqs = sorted(c.seq for c in layout.read_commits())

    hidden = min(
        int(n.split(".")[0]) for n in layout.slots.list_names()
        if n.endswith(".json") and "-" not in n
    )

    class HidingSlots:
        def __init__(self, inner, hide_name):
            self._inner, self._hide = inner, hide_name

        def list_names(self):
            return [n for n in self._inner.list_names() if n != self._hide]

        def __getattr__(self, item):
            return getattr(self._inner, item)

    layout.slots = HidingSlots(layout.slots, f"{hidden:020d}.json")
    layout._claim_memo.clear()
    seqs = sorted(c.seq for c in layout.read_commits())
    assert seqs == all_seqs, "hole below min(listed) was not probed"


def test_bulk_reeval_to_zero_rows_publishes_empty_commit(fso, spark):
    """A nondeterministic source that shrinks to ZERO rows between the
    pre-reserve count and the write must yield a clean empty Appended
    (idempotency honored), not an int(None) crash."""
    import os
    import tempfile

    marker = os.path.join(tempfile.mkdtemp(), "seen")

    from pyspark.sql.functions import udf

    @udf("boolean", useArrow=False)
    def first_eval_only(_x):
        import os as _os

        if _os.path.exists(marker):
            return False
        open(marker, "w").close()
        return True

    keep = first_eval_only.asNondeterministic()
    fso.create(STORE)
    df = (
        spark.range(1).coalesce(1)
        .select(
            F.lit("T").alias("type"),
            F.lit("reeval-subj").alias("subject"),
            F.struct(
                F.lit(b"").alias("data"),
                F.lit(None).cast("string").alias("format"),
                F.lit(None).cast("string").alias("schema_ref"),
            ).alias("payload"),
            F.create_map().cast("map<string,string>").alias("metadata"),
            F.create_map().cast("map<string,string>").alias("tags"),
            F.col("id"),
        )
        .filter(keep(F.col("id")))
        .drop("id")
    )
    res = fso.append_dataframe(STORE, df, idempotency_key="reeval-key")
    assert isinstance(res, Appended)
    assert res.positions == ()
    # key honored: the retry reports AlreadyApplied
    from factstore_spark.results import AlreadyApplied

    res2 = fso.append_dataframe(STORE, df, idempotency_key="reeval-key")
    assert isinstance(res2, AlreadyApplied)


def test_crashed_reclaimer_token_ages_out(tmp_path):
    """Crash injection for the reclaim token wedge (VERDICT r5 #7): a
    reclaimer that died BETWEEN claiming the per-generation token and
    deleting the expired lease must not wedge that generation forever.
    Plant exactly that state (expired lease + orphan token, both from
    'crashed' holders), then race several live reclaimers: acquisition
    happens only AFTER RECLAIM_TTL ages the orphan token out, exactly
    one holder at a time, and nothing leaks."""
    import hashlib
    import os
    import threading
    import time

    from factstore_spark.storage.optimistic import OptimisticStoreLayout

    layout = OptimisticStoreLayout(str(tmp_path / "store"))
    layout.initialize()
    layout.RECLAIM_TTL = 1.0  # instance override: keep the test fast

    # dead holder's expired lease
    assert layout.slots.put_if_absent(layout.LEASE_SLOT, b"dead-holder")
    lease_path = os.path.join(layout.log_dir, layout.LEASE_SLOT)
    old = time.time() - layout.LEASE_TTL - 10
    os.utime(lease_path, (old, old))
    # crashed reclaimer: token claimed for THIS generation, delete never ran
    gen = hashlib.sha256(b"dead-holder").hexdigest()[:16]
    token = f"{layout.LEASE_SLOT}.reclaim-{gen}"
    assert layout.slots.put_if_absent(token, b"crashed-reclaimer")

    n = 4
    barrier = threading.Barrier(n)
    active, overlaps, entered_at = [], [], []
    lock = threading.Lock()
    t0 = time.time()

    def worker():
        barrier.wait()
        with layout.commit_lock():
            with lock:
                if active:
                    overlaps.append(tuple(active))
                active.append(threading.get_ident())
                entered_at.append(time.time() - t0)
            time.sleep(0.05)
            with lock:
                active.remove(threading.get_ident())

    threads = [threading.Thread(target=worker) for _ in range(n)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not active, "a worker never released (wedged)"
    assert len(entered_at) == n, "a worker never acquired (generation wedged)"
    assert overlaps == [], "two simultaneous holders during reclaim"
    # nobody got in before the orphan token's TTL elapsed
    assert min(entered_at) >= layout.RECLAIM_TTL - 0.1, entered_at
    # the orphan token itself was aged out, and nothing leaks
    assert layout.slots.read(layout.LEASE_SLOT) is None
    leftover = [s for s in os.listdir(layout.log_dir) if "lease" in s]
    assert leftover == []
