"""Eventual-consistency mode of the fake object store (storage/cas.py):
the lag windows themselves, and the commit protocol's tolerance —
append-then-read must stay correct under a lagged LISTING because the
optimistic reader probes missing/fresh slots with direct reads (the
race/equivalence suites additionally prove the concurrent story; here
we pin the single-client semantics and the raw service behavior)."""

import time

import pytest

from factstore_spark import FactInput
from factstore_spark.results import Appended
from factstore_spark.store import FactStore
from factstore_spark.storage.cas import FakeObjectStoreSlotStore, ObjectStoreServer


@pytest.fixture()
def lagged_spec():
    srv = ObjectStoreServer()
    try:
        yield srv.start(list_lag=0.4, read_lag=0.0)
    finally:
        srv.stop()


def _client(spec, prefix="p"):
    rest = spec.split("objstore://", 1)[1]
    hostport, _, key = rest.partition("/")
    host, _, port = hostport.partition(":")
    return FakeObjectStoreSlotStore(host, int(port), key.encode(), prefix)


def test_list_after_write_and_delete_lag(lagged_spec):
    c = _client(lagged_spec)
    assert c.put_if_absent("a", b"1")
    # fresh object: hidden from listing, visible to direct read
    assert "a" not in c.list_names()
    assert c.read("a") == b"1"
    time.sleep(0.45)
    assert "a" in c.list_names()
    # delete: tombstone still listed inside the window, read misses now
    c.delete("a")
    assert "a" in c.list_names()
    assert c.read("a") is None
    time.sleep(0.45)
    assert "a" not in c.list_names()


def test_read_lag_hides_fresh_objects():
    srv = ObjectStoreServer()
    spec = srv.start(read_lag=0.4)
    try:
        c = _client(spec)
        assert c.put_if_absent("k", b"v")
        assert c.read("k") is None  # read-after-write anomaly window
        time.sleep(0.45)
        assert c.read("k") == b"v"
    finally:
        srv.stop()


def test_lease_release_under_read_lag(tmp_path):
    """A maintenance-lease holder that finishes INSIDE the read-lag
    window must still release: an unexpired lease cannot have been
    taken over (reclaim deletes are gated on TTL expiry), so release
    is unconditional. Previously release read the slot back to verify
    ownership — under read lag a fresh slot reads as None, the lease
    leaked, and the next commit_lock() spun until LEASE_TTL (600 s)."""
    from factstore_spark.storage.optimistic import OptimisticStoreLayout

    srv = ObjectStoreServer()
    spec = srv.start(read_lag=5.0)
    try:
        slot_spec = spec.split("optimistic+", 1)[-1]
        layout = OptimisticStoreLayout(str(tmp_path / "store"), slot_spec=slot_spec)
        layout.initialize()
        t0 = time.time()
        with layout.commit_lock():
            pass
        with layout.commit_lock():  # must not spin toward LEASE_TTL
            pass
        assert time.time() - t0 < 5.0
    finally:
        srv.stop()


def test_conditional_put_stays_linearizable_under_lag(lagged_spec):
    c = _client(lagged_spec)
    assert c.put_if_absent("slot", b"w1")
    # the slot is invisible to LIST, but the CAS must still refuse
    assert "slot" not in c.list_names()
    assert not c.put_if_absent("slot", b"w2")
    assert c.read("slot") == b"w1"


def test_append_then_read_consistent_under_list_lag(spark, store_root, lagged_spec):
    """Single-client sanity under a 400 ms listing lag: every append
    lands with a unique position and an immediate read sees ALL of them
    — the reader's forward probe finds slots the listing still hides."""
    fs = FactStore(spark, store_root, commit_backend=lagged_spec)
    fs.create("lag-store")
    for i in range(6):
        res = fs.append("lag-store", FactInput(type=f"T{i}", subject="s"))
        assert isinstance(res, Appended)
    got = fs.find_by_subject("lag-store", "s")
    assert [f.type for f in got.facts] == [f"T{i}" for i in range(6)]


def test_dcb_condition_sees_fresh_commit_under_list_lag(spark, store_root, lagged_spec):
    """TagQueryBased (DCB) must fail-fast against a commit the lagged
    LISTING still hides: the condition path reads commit records
    through the same probing reader as the finders, so a fresh commit
    carrying the fail-if tags refuses the append even inside the lag
    window (a listing-only reader would wrongly admit it)."""
    from factstore_spark.model import TagOnlyQueryItem, TagQuery, TagQueryBased
    from factstore_spark.results import AppendConditionViolated

    fs = FactStore(spark, store_root, commit_backend=lagged_spec)
    fs.create("dcb-lag")
    res = fs.append(
        "dcb-lag", FactInput(type="CREATED", subject="U:1", tags={"user": "u1"})
    )
    assert isinstance(res, Appended)
    # PREMISE pin, not just a comment: the commit above must still be
    # hidden from the lagged listing when the condition evaluates, or
    # this silently degenerates to the ordinary visible-commit case.
    meta = fs.catalog.find_by_name("dcb-lag")
    layout = fs._layout(meta.id)
    newest = max(c.seq for c in layout.read_commits())
    assert f"{newest:020d}.json" not in layout.slots.list_names(), (
        "lag window already expired — the probing-reader path is not being tested"
    )
    cond = TagQueryBased(TagQuery([TagOnlyQueryItem({"user": "u1"})]))
    dup = fs.append(
        "dcb-lag", FactInput(type="CREATED", subject="U:1b", tags={"user": "u1"}),
        condition=cond,
    )
    assert isinstance(dup, AppendConditionViolated)
    # a condition on untouched tags still passes under the same lag
    ok = fs.append(
        "dcb-lag", FactInput(type="CREATED", subject="U:2", tags={"user": "u2"}),
        condition=TagQueryBased(TagQuery([TagOnlyQueryItem({"user": "u2"})])),
    )
    assert isinstance(ok, Appended)


def test_dcb_race_exactly_one_winner_under_list_lag(spark, store_root, lagged_spec):
    """THE DCB race (AbstractFactStoreTest.kt:385-420 shape) on the
    eventually-consistent substrate: 8 threads race the SAME
    fail-if-match condition while every fresh commit is hidden from
    listings for 400 ms. The optimistic claim CAS stays linearizable
    and losers re-validate against the probing reader, so exactly one
    append wins — lagged listings must never admit two."""
    from concurrent.futures import ThreadPoolExecutor

    from factstore_spark.model import TagOnlyQueryItem, TagQuery, TagQueryBased
    from factstore_spark.results import AppendConditionViolated

    fs = FactStore(spark, store_root, commit_backend=lagged_spec)
    fs.create("dcb-race-lag")
    cond = TagQueryBased(TagQuery([TagOnlyQueryItem({"slot": "s1"})]))

    def racer(i):
        return fs.append(
            "dcb-race-lag",
            FactInput(type=f"CLAIM_{i}", subject=f"W:{i}", tags={"slot": "s1"}),
            condition=cond,
        )

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(racer, range(8)))
    wins = [r for r in results if isinstance(r, Appended)]
    losses = [r for r in results if isinstance(r, AppendConditionViolated)]
    assert len(wins) == 1 and len(losses) == 7
    # the surviving history holds exactly the winner's fact
    time.sleep(0.5)  # age past the listing lag before the read-side check
    got = fs.find_by_tag_query(
        "dcb-race-lag", TagQuery([TagOnlyQueryItem({"slot": "s1"})])
    )
    assert len(got.facts) == 1


@pytest.fixture()
def long_lagged_spec():
    """A 15 s listing lag: maintain() runs seconds of Spark work AFTER
    writing its compaction/checkpoint records, so the default 0.4 s
    window has always expired by the first post-maintenance append —
    the index-served-under-lag premise needs a window that outlives the
    maintenance tail (correctness never depends on listings, so the
    long lag costs nothing but honesty)."""
    srv = ObjectStoreServer()
    try:
        yield srv.start(list_lag=15.0, read_lag=0.0)
    finally:
        srv.stop()


def test_dcb_index_served_path_under_list_lag(spark, store_root, long_lagged_spec):
    lagged_spec = long_lagged_spec
    """The index-served DCB fast path under lag: right after maintain()
    the tag index is fresh, but the compaction/checkpoint commit
    records it is gated on are themselves still inside the listing-lag
    window. built_through()/last_commit() must agree through the
    probing reader — the condition keeps refusing matching tags and
    admitting clean ones; and after ONE more lagged append the now
    stale index must fall through to the fingerprint-skip scan path,
    still correctly."""
    from factstore_spark.model import TagOnlyQueryItem, TagQuery, TagQueryBased
    from factstore_spark.results import AppendConditionViolated

    fs = FactStore(spark, store_root, commit_backend=lagged_spec)
    fs.create("dcb-idx-lag")
    fs.append(
        "dcb-idx-lag", FactInput(type="T", subject="s1", tags={"k": "v1"})
    )
    st = fs.maintain("dcb-idx-lag")
    assert st["compact"].get("compacted") is True
    # PREMISE pin: the compaction record the fast path is gated on must
    # STILL be hidden by the listing lag — otherwise this is the plain
    # visible-commit case and the probing reader goes untested.
    # st proved the record was WRITTEN; the lagged listing must not
    # show it (or any commit slot) yet.
    meta = fs.catalog.find_by_name("dcb-idx-lag")
    layout = fs._layout(meta.id)
    listed = layout.slots.list_names()
    assert not any(n.endswith(".json") for n in listed), listed
    # inside the lag window after maintenance: index-served refusal + admit
    hit = fs.append(
        "dcb-idx-lag", FactInput(type="T", subject="s2", tags={"k": "v1"}),
        condition=TagQueryBased(TagQuery([TagOnlyQueryItem({"k": "v1"})])),
    )
    assert isinstance(hit, AppendConditionViolated)
    ok = fs.append(
        "dcb-idx-lag", FactInput(type="T", subject="s3", tags={"k": "v2"}),
        condition=TagQueryBased(TagQuery([TagOnlyQueryItem({"k": "v2"})])),
    )
    assert isinstance(ok, Appended)
    # the ok-append made the index stale; a condition on ITS tag must be
    # served by the scan fallback against the still-lag-hidden commit
    hit2 = fs.append(
        "dcb-idx-lag", FactInput(type="T", subject="s4", tags={"k": "v2"}),
        condition=TagQueryBased(TagQuery([TagOnlyQueryItem({"k": "v2"})])),
    )
    assert isinstance(hit2, AppendConditionViolated)
