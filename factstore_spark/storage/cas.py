"""Pluggable CAS slot-claim primitive for the optimistic commit log.

The lock-free commit protocol (storage/optimistic.py) needs exactly one
operation from its storage substrate: *atomically create a named,
immutable slot, failing if the name is taken*. Everything else — retry,
condition re-evaluation, position assignment — is protocol, not
storage. This module isolates that one operation behind ``SlotStore``
so the protocol is provably portable across the substrates a 100 TB
deployment actually meets:

- ``HardlinkSlotStore`` — shared POSIX filesystem (NFS, Lustre):
  content is written + fsynced to a temp file FIRST, then ``os.link``
  publishes it under the slot name — link(2) fails with EEXIST if the
  slot is taken, and a visible slot is always complete.
- ``ExclCreateSlotStore`` — HDFS-style ``create(path,
  overwrite=false)``: O_CREAT|O_EXCL reserves the name, content lands
  after. The CLAIM is atomic; a reader can observe an in-flight slot
  with partial content, which the commit-log reader tolerates (it skips
  unparseable slots and re-reads — claims are immutable once complete,
  so the skip is transient). This is exactly the consistency HDFS
  create-no-overwrite gives.
- ``FakeObjectStoreSlotStore`` — S3/GCS conditional PUT
  (``If-None-Match: *``): a whole-object PUT that fails if the key
  exists, served by an in-memory object-store process
  (``ObjectStoreServer``) that client processes reach over a
  ``multiprocessing.managers`` connection. Object stores make whole
  objects visible atomically, so readers never see partial slots.

All three run under the SAME multiprocess exactly-one-winner race
tests (tests/test_multiprocess_race.py) and the model-based
flock-equivalence suite (tests/test_backend_equivalence.py) — the
contract the reference gets from FoundationDB transaction conflict
ranges (factstore-foundationdb FdbFactAppender.kt:33-65) is here a
property of any store offering compare-and-set creation.

Spec strings (``FactStore(commit_backend=...)``):

- ``"optimistic"`` / ``"optimistic+hardlink"`` — hardlink claims;
- ``"optimistic+excl"`` — create-no-overwrite claims;
- ``"optimistic+objstore://HOST:PORT/AUTHKEYHEX"`` — conditional-PUT
  claims against a running ``ObjectStoreServer``.
"""

from __future__ import annotations

import os
import threading
import time
import uuid
from multiprocessing.managers import BaseManager
from typing import Optional


class SlotStore:
    """Atomic named-slot creation over some storage substrate.

    Contract: ``put_if_absent`` is linearizable — for any name, exactly
    one concurrent caller (across threads, processes, hosts) returns
    True; slots are immutable once created; ``list_names``/``read``
    eventually observe every created slot and never a deleted one.
    """

    def put_if_absent(self, name: str, data: bytes) -> bool:
        raise NotImplementedError

    def list_names(self) -> list[str]:
        raise NotImplementedError

    def read(self, name: str) -> Optional[bytes]:
        raise NotImplementedError

    def delete(self, name: str) -> None:
        raise NotImplementedError

    def mtime(self, name: str) -> Optional[float]:
        """Creation/modification time for age-gated maintenance; None
        if the slot does not exist."""
        raise NotImplementedError


class HardlinkSlotStore(SlotStore):
    """Shared-POSIX-FS slots: fsync-to-temp then hardlink-as-O_EXCL.

    A linked slot is always complete, so readers never need to tolerate
    partial content on this substrate."""

    def __init__(self, directory: str):
        self.dir = directory
        # dir creation is LAZY (first put): read_versioned_manifest
        # constructs slot stores on pure read paths, which must work
        # on read-only mounts and must not strew empty _manifests dirs

    def put_if_absent(self, name: str, data: bytes) -> bool:
        os.makedirs(self.dir, exist_ok=True)
        tmp = os.path.join(self.dir, f".tmp-{uuid.uuid4().hex}")
        fd = os.open(tmp, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        try:
            os.write(fd, data)
            os.fsync(fd)
        finally:
            os.close(fd)
        try:
            os.link(tmp, os.path.join(self.dir, name))
            won = True
        except FileExistsError:
            # NFS lost-reply hazard: a retransmit of a SUCCESSFUL
            # link(2) returns EEXIST — declaring a loss here while OUR
            # link actually landed would make the caller delete the
            # data file its durably-published claim references. The
            # inode tells the truth: our tmp has nlink == 2 iff our
            # link is the one that landed.
            won = os.stat(tmp).st_nlink == 2
        finally:
            os.unlink(tmp)
        if won:
            dfd = os.open(self.dir, os.O_RDONLY)
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)
        return won

    def list_names(self) -> list[str]:
        try:
            return [n for n in os.listdir(self.dir) if not n.startswith(".tmp-")]
        except FileNotFoundError:
            return []

    def read(self, name: str) -> Optional[bytes]:
        try:
            with open(os.path.join(self.dir, name), "rb") as f:
                return f.read()
        except OSError:
            return None

    def delete(self, name: str) -> None:
        try:
            os.unlink(os.path.join(self.dir, name))
        except OSError:
            pass

    def mtime(self, name: str) -> Optional[float]:
        try:
            return os.path.getmtime(os.path.join(self.dir, name))
        except OSError:
            return None


class ExclCreateSlotStore(HardlinkSlotStore):
    """HDFS-create-no-overwrite-shaped slots: O_CREAT|O_EXCL reserves
    the final name atomically, then the content is written into it.

    Readers may transiently observe a reserved-but-unfinished slot
    (exactly HDFS semantics); the commit-log reader skips unparseable
    slots and re-reads, and writers never reuse the name because the
    reservation itself is what claims it. Listing/read/delete/mtime are
    inherited plain-file operations."""

    def put_if_absent(self, name: str, data: bytes) -> bool:
        os.makedirs(self.dir, exist_ok=True)
        path = os.path.join(self.dir, name)
        try:
            fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
        except FileExistsError:
            return False
        try:
            os.write(fd, data)
            os.fsync(fd)
        finally:
            os.close(fd)
        return True


# ---------------------------------------------------------------------------
# Fake object store: conditional-PUT semantics served cross-process
# ---------------------------------------------------------------------------


class _ObjectStoreService:
    """The object store itself: whole-object atomic PUTs keyed by
    string, conditional on absence — the If-None-Match: * subset of
    S3/GCS that the commit protocol needs. Runs inside the
    ObjectStoreServer process; the manager serves each client in its
    own thread, so the lock provides the linearizable CAS.

    **Eventual-consistency injection** (``configure``): real object
    stores differ in listing/read freshness (S3 is strongly consistent
    today; GCS listings and several S3-compatible stores are not
    always). Two windows model that:

    - ``list_lag`` seconds: a freshly-created object is OMITTED from
      ``list_prefix`` until it ages past the window, and a freshly-
      DELETED object is still listed until its tombstone ages out —
      the classic list-after-write / list-after-delete lag.
    - ``read_lag`` seconds: ``get`` of a freshly-created object
      returns None until the window passes (pre-2020 S3
      read-after-write anomaly).

    The conditional PUT itself stays linearizable in every mode —
    that matches every real store's conditional-write contract and is
    the only operation the commit protocol's SAFETY rests on; the lag
    windows exercise its LIVENESS/readers instead."""

    def __init__(self):
        self._objects: dict[str, bytes] = {}
        self._mtimes: dict[str, float] = {}
        self._tombstones: dict[str, float] = {}
        self._list_lag = 0.0
        self._read_lag = 0.0
        self._lock = threading.Lock()

    def configure(self, list_lag: float = 0.0, read_lag: float = 0.0) -> None:
        with self._lock:
            self._list_lag = float(list_lag)
            self._read_lag = float(read_lag)

    def put_if_absent(self, key: str, data: bytes) -> bool:
        with self._lock:
            if key in self._objects:
                return False
            self._objects[key] = bytes(data)
            self._mtimes[key] = time.time()
            self._tombstones.pop(key, None)
            return True

    def get(self, key: str):
        with self._lock:
            data = self._objects.get(key)
            if data is None:
                return None
            if self._read_lag and time.time() - self._mtimes[key] < self._read_lag:
                return None  # fresh object not yet read-visible
            return data

    def list_prefix(self, prefix: str) -> list[str]:
        with self._lock:
            now = time.time()
            out = [
                k
                for k in self._objects
                if k.startswith(prefix)
                and not (
                    self._list_lag and now - self._mtimes[k] < self._list_lag
                )
            ]
            if self._list_lag:
                out.extend(
                    k
                    for k, t in self._tombstones.items()
                    if k.startswith(prefix)
                    and now - t < self._list_lag
                    and k not in self._objects
                )
            return out

    def delete(self, key: str) -> None:
        with self._lock:
            if self._objects.pop(key, None) is not None:
                self._tombstones[key] = time.time()
            self._mtimes.pop(key, None)

    def mtime(self, key: str):
        with self._lock:
            return self._mtimes.get(key)


class _ObjectStoreManager(BaseManager):
    pass


_SERVICE_SINGLETON: Optional[_ObjectStoreService] = None


def _service() -> _ObjectStoreService:
    global _SERVICE_SINGLETON
    if _SERVICE_SINGLETON is None:
        _SERVICE_SINGLETON = _ObjectStoreService()
    return _SERVICE_SINGLETON


_ObjectStoreManager.register(
    "store",
    callable=_service,
    exposed=["put_if_absent", "get", "list_prefix", "delete", "mtime", "configure"],
)


class ObjectStoreServer:
    """In-memory fake object store reachable from other processes.

    ``start()`` returns the backend spec string
    (``optimistic+objstore://host:port/authkeyhex``) that any process —
    including subprocess race workers — passes to
    ``FactStore(commit_backend=...)`` to commit through conditional
    PUTs against this server."""

    def __init__(self):
        self._authkey = uuid.uuid4().hex.encode()
        self._mgr = _ObjectStoreManager(
            address=("127.0.0.1", 0), authkey=self._authkey
        )

    def start(self, list_lag: float = 0.0, read_lag: float = 0.0) -> str:
        """Start the server; non-zero lags turn on the eventual-
        consistency mode (see _ObjectStoreService docstring)."""
        self._mgr.start()
        if list_lag or read_lag:
            self._mgr.store().configure(list_lag=list_lag, read_lag=read_lag)
        host, port = self._mgr.address
        return f"optimistic+objstore://{host}:{port}/{self._authkey.decode()}"

    def stop(self) -> None:
        self._mgr.shutdown()


class FakeObjectStoreSlotStore(SlotStore):
    """Client leg of the fake object store: slots are objects under a
    per-store key prefix; every operation is one RPC to the server,
    whose lock makes the conditional PUT linearizable across all client
    processes."""

    def __init__(self, host: str, port: int, authkey: bytes, prefix: str):
        self._prefix = prefix.rstrip("/") + "/"
        mgr = _ObjectStoreManager(address=(host, port), authkey=authkey)
        mgr.connect()
        self._proxy = mgr.store()

    def put_if_absent(self, name: str, data: bytes) -> bool:
        return self._proxy.put_if_absent(self._prefix + name, data)

    def list_names(self) -> list[str]:
        plen = len(self._prefix)
        return [k[plen:] for k in self._proxy.list_prefix(self._prefix)]

    def read(self, name: str) -> Optional[bytes]:
        return self._proxy.get(self._prefix + name)

    def delete(self, name: str) -> None:
        self._proxy.delete(self._prefix + name)

    def mtime(self, name: str) -> Optional[float]:
        return self._proxy.mtime(self._prefix + name)


# ---------------------------------------------------------------------------
# Spec parsing
# ---------------------------------------------------------------------------

OBJSTORE_SCHEME = "objstore://"


def make_slot_store(spec: str, log_dir: str) -> SlotStore:
    """Build the SlotStore for an optimistic commit-log spec.

    ``spec`` is the part after ``optimistic+`` (empty/"hardlink" for
    the default); ``log_dir`` is the store's commit-log directory —
    the slot directory for filesystem substrates and the key prefix
    for the object store (unique per store by construction)."""
    if spec in ("", "hardlink"):
        return HardlinkSlotStore(log_dir)
    if spec == "excl":
        return ExclCreateSlotStore(log_dir)
    if spec.startswith(OBJSTORE_SCHEME):
        rest = spec[len(OBJSTORE_SCHEME):]
        hostport, _, key = rest.partition("/")
        host, _, port = hostport.partition(":")
        if not (host and port and key):
            raise ValueError(f"bad objstore spec: {spec!r}")
        return FakeObjectStoreSlotStore(host, int(port), key.encode(), log_dir)
    raise ValueError(f"unknown slot-store spec: {spec!r}")


# ---------------------------------------------------------------------------
# Versioned manifest CAS: single-winner swaps for index manifests
# ---------------------------------------------------------------------------


class ConcurrentManifestSwapError(RuntimeError):
    """A racing writer committed a manifest version first.

    Raised by the hardlink-O_EXCL versioned swap instead of letting a
    second plain rename silently last-win the other writer's state
    away (same substrate as the merge table's snapshot commit above).
    Re-read the index and re-run."""


class TornManifestSlotError(ConcurrentManifestSwapError):
    """The next manifest slot is reserved but unparseable — a writer
    died between claiming the name and landing its content (possible
    only on create-no-overwrite substrates; hardlink slots are always
    complete). Unlike the parent error, "re-read and re-run" cannot
    succeed until the carcass ages past TORN_SLOT_RECLAIM_AGE_SECONDS
    (at which point cas_swap_manifest reclaims it automatically) or is
    deleted manually; the message names both remedies."""


# How old a reserved-but-unparseable slot must be before a later
# writer may delete and re-claim it. A live writer reserves and writes
# its JSON in one put_if_absent call, so anything torn for this long
# is a dead writer's carcass, not an in-flight publish. Module-level
# so tests (and unusual deployments) can tighten/loosen it.
TORN_SLOT_RECLAIM_AGE_SECONDS = 30.0


# Pluggable manifest-log substrate (round 11): the versioned-manifest
# CAS shared by the IVF / minhash / bloom / rollup writers claims
# ``_manifests/snap-N.json`` slots through a SlotStore, so the SAME
# publish protocol runs on a shared POSIX FS (hardlink, the default),
# HDFS-style create-no-overwrite, or an object store's conditional PUT
# — deploy-time choice, no per-writer signature churn. The fault-
# schedule sweep (tests/test_fault_schedule.py) exercises every
# protocol step on all three.
_MANIFEST_STORE_FACTORY = None


def set_manifest_store_factory(factory) -> None:
    """Install ``factory(manifest_dir) -> SlotStore`` for manifest-log
    claims (None restores the hardlink default). The factory receives
    the ``<root>/_manifests`` path — filesystem substrates use it as
    their slot directory, object-store substrates as the key prefix."""
    global _MANIFEST_STORE_FACTORY
    _MANIFEST_STORE_FACTORY = factory


def _manifest_store(root) -> SlotStore:
    snap_dir = os.path.join(root, "_manifests")
    if _MANIFEST_STORE_FACTORY is not None:
        return _MANIFEST_STORE_FACTORY(snap_dir)
    return HardlinkSlotStore(snap_dir)


def read_versioned_manifest(root, read_pointer):
    """(manifest, version) with the ``_manifests/snap-N.json`` CAS log
    as the source of truth and the caller's pointer file as a
    legacy/cache fallback — a writer that crashed between winning its
    claim and refreshing the pointer must not be lost (mirrors
    storage/merge.py:_head_manifest). Version 0 = pre-CAS state
    (pointer only) or an empty root. ``read_pointer(root) -> dict``
    reads the legacy pointer.

    Reads descend from the highest snap and skip unparseable slots:
    the create-no-overwrite substrate can expose a reserved-but-
    unfinished slot (exactly HDFS semantics, see ExclCreateSlotStore)
    — a torn head is transient, the last COMPLETE snapshot serves."""
    import json as _json
    import re as _re

    store = _manifest_store(root)
    versions = []
    for name in store.list_names():
        mo = _re.fullmatch(r"snap-(\d+)\.json", name)
        if mo:
            versions.append((int(mo.group(1)), name))
    for n, name in sorted(versions, reverse=True):
        raw = store.read(name)
        if raw is None:
            continue  # deleted (or not yet read-visible) under us
        try:
            return _json.loads(raw), n
        except ValueError:
            continue  # in-flight excl-create slot: fall to prior snap
    return read_pointer(root), 0


def cas_swap_manifest(root, manifest, base_version, write_pointer, what="manifest"):
    """Single-winner manifest commit: claim snap-(base+1) through the
    configured SlotStore CAS (hardlink O_EXCL by default); a racing
    writer loses LOUDLY (ConcurrentManifestSwapError). The pointer
    refresh after a won claim is cache maintenance for legacy readers,
    not the commit, and is taken from the LOG HEAD so a stalled winner
    can never overwrite a later committed head with its older
    manifest. Old snapshots are pruned past a 10-version tail.
    ``write_pointer(root, manifest)`` writes the legacy pointer.
    Returns the committed version.

    **Torn-slot reclamation.** On a create-no-overwrite substrate
    (ExclCreateSlotStore / object-store factory) a writer killed
    between reserving snap-N and landing its JSON leaves an
    unparseable slot that readers skip FOREVER: every later writer
    recomputes base N-1, loses the snap-N claim to the dead
    reservation, and the generic "re-read and re-run" advice livelocks
    (readers keep serving N-1, so the re-read keeps yielding base
    N-1). A lost claim therefore inspects the winning slot: if its
    content parses, a real writer won — raise. If it is torn AND older
    than TORN_SLOT_RECLAIM_AGE_SECONDS, the reservation's owner is
    dead (a live writer reserves and writes in one call — sub-second),
    so delete the carcass and retry the claim ONCE; two concurrent
    reclaimers then race on the fresh put_if_absent and exactly one
    wins, preserving the single-winner contract. A young torn slot
    raises TornManifestSlotError (distinct type, names the slot and
    the age gate) instead of advising a retry that cannot succeed yet.
    """
    import json as _json

    n = base_version + 1
    name = f"snap-{n}.json"
    store = _manifest_store(root)
    payload = _json.dumps(manifest, sort_keys=True).encode()
    won = store.put_if_absent(name, payload)
    if not won:
        raw = store.read(name)
        torn = True
        if raw is not None:
            try:
                _json.loads(raw)
                torn = False
            except ValueError:
                pass
        if raw is not None and torn:
            mt = store.mtime(name)
            age = time.time() - (mt or time.time())
            if age < TORN_SLOT_RECLAIM_AGE_SECONDS:
                raise TornManifestSlotError(
                    f"{what} slot {name} in {root} is reserved but "
                    f"unparseable (a writer died mid-publish); it becomes "
                    f"reclaimable {TORN_SLOT_RECLAIM_AGE_SECONDS - age:.1f}s "
                    f"from now (age gate "
                    f"{TORN_SLOT_RECLAIM_AGE_SECONDS}s) — retry after the "
                    f"gate, or delete the slot manually to recover sooner"
                )
            # Token-gated delete (same two-reclaimer-safe pattern as
            # optimistic._maybe_reclaim_empty_slot): a naive delete here
            # races another reclaimer's delete + RE-CLAIM — this writer
            # would then destroy a freshly COMMITTED slot it read as
            # torn moments earlier. Only the per-(slot, mtime) token
            # winner deletes, re-reading right before: the slot is
            # immutable while it exists, so nothing can re-claim the
            # name between the re-read and the delete.
            token = f"{name}.reclaim-{int(mt or 0)}"
            if store.put_if_absent(token, b"reclaim"):
                try:
                    raw2 = store.read(name)
                    torn2 = True
                    if raw2 is not None:
                        try:
                            _json.loads(raw2)
                            torn2 = False
                        except ValueError:
                            pass
                    if raw2 is not None and torn2 and store.mtime(name) == mt:
                        store.delete(name)
                finally:
                    store.delete(token)
        if raw is None or torn:
            # slot vanished under us (pruned/reclaimed by us or a
            # sibling): one fresh claim attempt — losers still lose
            won = store.put_if_absent(name, payload)
    if not won:
        raise ConcurrentManifestSwapError(
            f"{what} swap based on version {base_version} lost to a "
            f"concurrent commit of version {n} in {root}; re-read and re-run"
        )
    head, _hv = read_versioned_manifest(root, lambda _root: manifest)
    write_pointer(root, head)
    if n > 10:
        store.delete(f"snap-{n - 10}.json")
    return n
