"""Cross-PROCESS conditional-append race: the commit protocol must give
exactly one winner even when contenders are separate OS processes
(threads share too much to prove it). Run against ALL backends:

- flock — the per-store fcntl lock is the FDB-transaction stand-in;
- optimistic — the lock-free claim-retry commit log (the Delta/Iceberg
  -shaped protocol, storage/optimistic.py): losers must detect the
  conflict at claim time, re-evaluate their condition, and report the
  violation — over each CAS substrate (storage/cas.py):
  hardlink-as-O_EXCL (shared POSIX FS), O_CREAT|O_EXCL
  create-no-overwrite (the HDFS shape), and conditional PUT against an
  in-memory object-store server (the S3/GCS shape). The last one is
  the multi-writer story at 100 TB: racing processes commit through
  If-None-Match PUTs, nothing filesystem-atomic involved.

Workers use pure pyarrow engine paths (no Spark needed to append)."""

import json
import subprocess
import sys
import tempfile

import pytest

from factstore_spark import FactInput
from factstore_spark.results import Appended
from factstore_spark.store import FactStore

BACKENDS = ["flock", "optimistic", "optimistic+excl", "objstore", "objstore-lagged"]


@pytest.fixture(params=BACKENDS)
def backend(request):
    """Backend spec string, starting/stopping the fake object-store
    server for the conditional-PUT substrate (its spec embeds the
    server address, so it must be minted per test). The lagged variant
    injects a 300 ms list-after-write/-delete window (GCS-style
    eventually-consistent listing): safety must come from the CAS PUT
    + the reader's direct-read probing alone."""
    if request.param.startswith("objstore"):
        from factstore_spark.storage.cas import ObjectStoreServer

        srv = ObjectStoreServer()
        lag = 0.3 if request.param == "objstore-lagged" else 0.0
        try:
            yield srv.start(list_lag=lag)
        finally:
            srv.stop()
    else:
        yield request.param

# Start barrier shared by both workers: interpreter+import startup
# (hundreds of jittery ms) dwarfs the few-append window, so without a
# barrier the processes can fully SERIALIZE and the exactly-one-winner
# assertion passes without any actual cross-process contention.
BARRIER = r"""
import os, time
barrier_dir, wid = sys.argv[-2], sys.argv[-1]
open(os.path.join(barrier_dir, "ready-" + wid), "w").close()
deadline = time.time() + 60
while not os.path.exists(os.path.join(barrier_dir, "go")):
    if time.time() > deadline:
        raise SystemExit("barrier timeout")
    time.sleep(0.002)
"""

WORKER = (
    r"""
import json, sys
sys.path.insert(0, "/root/repo")
from factstore_spark.model import ExpectedLastFact, FactInput
from factstore_spark.store import FactStore

root, seed_id, n, backend = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
fs = FactStore(spark=None, root=root, commit_backend=backend)
"""
    + BARRIER
    + r"""
results = []
for i in range(n):
    res = fs.append(
        "race-store",
        FactInput(type=f"W{i}", subject="USER:RACE"),
        condition=ExpectedLastFact("USER:RACE", seed_id),
    )
    results.append(type(res).__name__)
print(json.dumps(results))
"""
)


def _release_when_ready(barrier_dir, n_workers):
    """Wait (in-process) for every worker's ready file, then open the
    gate so all workers enter their append loops together."""
    import os
    import time

    deadline = time.time() + 60
    while len([f for f in os.listdir(barrier_dir) if f.startswith("ready-")]) < n_workers:
        if time.time() > deadline:
            raise AssertionError("workers never reached the barrier")
        time.sleep(0.002)
    open(os.path.join(barrier_dir, "go"), "w").close()


def test_multiprocess_exactly_one_winner(spark, store_root, backend):
    fs = FactStore(spark, store_root, commit_backend=backend)
    fs.create("race-store")
    seed = fs.append("race-store", FactInput(type="SEED", subject="USER:RACE"))
    assert isinstance(seed, Appended)
    seed_id = seed.fact_ids[0]

    barrier_dir = tempfile.mkdtemp(prefix="race-barrier-")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", WORKER, store_root, seed_id, "3", backend,
             barrier_dir, str(w)],
            stdout=subprocess.PIPE,
        )
        for w in range(4)
    ]
    _release_when_ready(barrier_dir, 4)
    outcomes = []
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0
        outcomes.extend(json.loads(out))

    assert outcomes.count("Appended") == 1
    assert outcomes.count("AppendConditionViolated") == len(outcomes) - 1
    history = fs.find_by_subject("race-store", "USER:RACE")
    assert len(history.facts) == 2  # seed + the one winner


def test_multiprocess_unconditional_appends_all_land(spark, store_root, backend):
    """Unconditional appends from racing processes must ALL commit with
    unique seqs/positions — on the optimistic backend every loser
    retries until it claims its own slot."""
    worker = (
        r"""
import json, sys
sys.path.insert(0, "/root/repo")
from factstore_spark.model import FactInput
from factstore_spark.store import FactStore
root, n, backend, wid = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]
fs = FactStore(spark=None, root=root, commit_backend=backend)
"""
        + BARRIER
        + r"""
ok = 0
for i in range(n):
    res = fs.append("mp-store", FactInput(type="E", subject=f"S{wid}-{i}"))
    ok += type(res).__name__ == "Appended"
print(json.dumps(ok))
"""
    )
    fs = FactStore(spark, store_root, commit_backend=backend)
    fs.create("mp-store")
    barrier_dir = tempfile.mkdtemp(prefix="race-barrier-")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, store_root, "5", backend, str(w),
             barrier_dir, str(w)],
            stdout=subprocess.PIPE,
        )
        for w in range(4)
    ]
    _release_when_ready(barrier_dir, 4)
    total = 0
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0
        total += json.loads(out)
    assert total == 20
    facts = fs.facts_df("mp-store").collect()
    assert len(facts) == 20
    positions = [f.position for f in facts]
    assert len(set(positions)) == 20  # strict unique total order


def test_multiprocess_minhash_manifest_swap_exactly_one_winner(tmp_path):
    """Signature-index manifest CAS (VERDICT r9 #4): racing appenders
    used to last-win a segment away via plain rename; the swap now goes
    through the hardlink-O_EXCL claim, so exactly ONE of N processes
    racing from the same base version commits and every loser raises
    ConcurrentIndexSwapError. The surviving manifest must be the
    winner's, byte-consistent with its claimed snapshot."""
    import json as _json
    import os

    from factstore_spark.operators.dedup import (
        _read_minhash_manifest_versioned,
    )

    idx = str(tmp_path / "mh-idx")
    os.makedirs(idx)
    # seed a version-1 manifest (stand-in for write_minhash_index's
    # commit — the race is about the swap, not the segment contents)
    from factstore_spark.operators.dedup import _cas_swap_minhash_manifest

    base_manifest = {"kind": "minhash", "segments": ["seg-base"], "seed": 42}
    _cas_swap_minhash_manifest(idx, base_manifest, 0)

    worker = (
        r"""
import json, sys
sys.path.insert(0, "/root/repo")
from factstore_spark.operators.dedup import (
    ConcurrentIndexSwapError,
    _cas_swap_minhash_manifest,
    _read_minhash_manifest_versioned,
)
idx, wid_arg = sys.argv[1], sys.argv[2]
m, base = _read_minhash_manifest_versioned(idx)
assert base == 1, base
"""
        + BARRIER
        + r"""
try:
    _cas_swap_minhash_manifest(
        idx, dict(m, segments=m["segments"] + ["seg-from-" + wid_arg]), base
    )
    print(json.dumps("won"))
except ConcurrentIndexSwapError:
    print(json.dumps("lost"))
"""
    )
    barrier_dir = tempfile.mkdtemp(prefix="race-barrier-")
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", worker, idx, str(w), barrier_dir, str(w)],
            stdout=subprocess.PIPE,
        )
        for w in range(4)
    ]
    _release_when_ready(barrier_dir, 4)
    outcomes = []
    for p in procs:
        out, _ = p.communicate(timeout=60)
        assert p.returncode == 0
        outcomes.append(_json.loads(out))
    assert outcomes.count("won") == 1, outcomes
    assert outcomes.count("lost") == 3, outcomes

    head, version = _read_minhash_manifest_versioned(idx)
    assert version == 2
    winner = outcomes.index("won")
    assert head["segments"] == ["seg-base", f"seg-from-{winner}"]
    # pointer cache agrees with the snapshot log head
    with open(os.path.join(idx, "manifest.json")) as fh:
        assert _json.load(fh) == head
