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
