"""Sustained-contention soak of the optimistic commit protocol
(VERDICT r12 task #4): exactly-one-winner was proven at 4 processes for
a FEW appends; this drives 8 writer PROCESSES through ~100 commits EACH
against one store, on all three CAS substrates, and asserts:

- completion: every writer lands every commit (no starvation, no
  256-retry exhaustion);
- integrity: the store holds exactly writers*per_writer rows with
  unique positions, and the commit log agrees;
- bounded retry amplification: mean conflicts/commit stays well under
  the writer count (jittered exponential backoff desynchronizes the
  losers; a bare loop re-collides every round — super-linear);
- fairness: no writer's conflict rate exceeds 4x the mean (a starved
  writer shows up as a retry outlier long before exhaustion);
- tail latency: per-commit p99 under the soak stays below 2 s
  (generous; the reference's own bound is append p90 < 500 ms at far
  lower contention).

Workers are separate interpreters on pure pyarrow engine paths (no
Spark), released together by a filesystem barrier so the contention is
real, not interleaved startup. Measured numbers: docs/SCALE.md.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

import pytest

from factstore_spark.store import FactStore

WRITERS = 8
PER_WRITER = 100

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, "/root/repo")
from factstore_spark.model import FactInput, FactPayload
from factstore_spark.results import Appended
from factstore_spark.store import FactStore

root, backend, wid, n, outp, barrier_dir = (
    sys.argv[1], sys.argv[2], sys.argv[3], int(sys.argv[4]), sys.argv[5],
    sys.argv[6],
)
fs = FactStore(spark=None, root=root, commit_backend=backend)
open(os.path.join(barrier_dir, "ready-" + wid), "w").close()
deadline = time.time() + 120
while not os.path.exists(os.path.join(barrier_dir, "go")):
    if time.time() > deadline:
        raise SystemExit("barrier timeout")
    time.sleep(0.002)

lat = []
ok = 0
for i in range(n):
    f = FactInput(
        type="Soak",
        subject=f"w{wid}",
        payload=FactPayload(json.dumps({"i": i}).encode(), format="json"),
        tags={},
    )
    t0 = time.perf_counter()
    r = fs.append("soak", [f], idempotency_key=f"w{wid}-{i}")
    lat.append(time.perf_counter() - t0)
    if isinstance(r, Appended):
        ok += 1
lat.sort()
with open(outp, "w") as fh:
    json.dump(
        {
            "wid": wid,
            "ok": ok,
            "retries": fs.append_conflict_retries,
            "p50": lat[len(lat) // 2],
            "p99": lat[int(len(lat) * 0.99)],
            "max": lat[-1],
            "wall": sum(lat),
        },
        fh,
    )
"""


def _run_soak(backend: str, writers: int = WRITERS, per_writer: int = PER_WRITER):
    root = tempfile.mkdtemp(prefix="soak-")
    seed = FactStore(spark=None, root=root, commit_backend=backend)
    seed.create("soak")
    barrier = tempfile.mkdtemp(prefix="soak-barrier-")
    outs = []
    procs = []
    for w in range(writers):
        outp = os.path.join(barrier, f"out-{w}.json")
        outs.append(outp)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-c", WORKER, root, backend, str(w),
                    str(per_writer), outp, barrier,
                ],
                stdout=subprocess.PIPE,
                stderr=subprocess.PIPE,
            )
        )
    deadline = time.time() + 60
    while time.time() < deadline:
        if all(
            os.path.exists(os.path.join(barrier, f"ready-{w}"))
            for w in range(writers)
        ):
            break
        time.sleep(0.01)
    open(os.path.join(barrier, "go"), "w").close()
    results = []
    for p, outp in zip(procs, outs):
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()[-2000:]
        with open(outp) as fh:
            results.append(json.load(fh))
    return root, results


def _assert_soak(
    backend,
    root,
    results,
    writers=WRITERS,
    per_writer=PER_WRITER,
    enforce_p99=True,
):
    # completion — no starvation, no retry exhaustion
    assert all(r["ok"] == per_writer for r in results), results
    # integrity from a fresh handle: exact row count, unique positions
    fs = FactStore(spark=None, root=root, commit_backend=backend)
    lay = fs._layout(fs.catalog.find_by_name("soak").id)
    commits = [c for c in lay.read_commits() if c.rows > 0]
    assert sum(c.rows for c in commits) == writers * per_writer
    import pyarrow.dataset as pa_ds

    from factstore_spark.schema import FACT_ARROW_SCHEMA

    t = pa_ds.dataset(lay.data_files(), schema=FACT_ARROW_SCHEMA).to_table(
        columns=["position"]
    )
    poss = t.column("position").to_pylist()
    assert len(poss) == writers * per_writer
    assert len(set(poss)) == len(poss), "duplicate positions under soak"
    # retry amplification: mean conflicts/commit well under writer count
    total_retries = sum(r["retries"] for r in results)
    per_commit = total_retries / (writers * per_writer)
    assert per_commit < writers, (
        f"super-linear retry amplification: {per_commit:.2f} conflicts/commit "
        f"with {writers} writers"
    )
    # fairness: no writer's conflict rate is a >4x outlier
    mean_r = total_retries / writers
    if mean_r > 1:
        worst = max(r["retries"] for r in results)
        assert worst <= 4 * mean_r + per_writer * 0.1, results
    # tail latency — enforcement is the caller's call: correctness
    # asserts above ALWAYS run; the wall-clock bound goes through the
    # rerun adjudication below when ambient load may be the cause
    worst_p99 = max(r["p99"] for r in results)
    if enforce_p99:
        assert worst_p99 < P99_BOUND_S, f"p99 {worst_p99:.3f}s under soak"
    return {
        "retries_per_commit": round(per_commit, 3),
        "p50_ms": round(sorted(r["p50"] for r in results)[writers // 2] * 1e3, 1),
        "worst_p99_ms": round(worst_p99 * 1e3, 1),
    }


P99_BOUND_S = 2.0


def _soak_adjudicated(backend, per_writer=PER_WRITER):
    """Run + assert one soak with the bench's rerun-on-breach rule
    (VERDICT r13 task #4): correctness (completion, integrity, retry
    amplification, fairness) is enforced unconditionally on the FIRST
    run — ambient load never excuses a lost update. Only when the
    wall-clock p99 bound breaches is the soak re-run once after a
    settle, and the rerun must meet the bound — a slow host window
    shows up as breach-then-pass; a real protocol regression fails
    both runs."""
    root, results = _run_soak(backend, per_writer=per_writer)
    stats = _assert_soak(
        backend, root, results, per_writer=per_writer, enforce_p99=False
    )
    if stats["worst_p99_ms"] < P99_BOUND_S * 1e3:
        return stats
    time.sleep(2.0)
    root2, results2 = _run_soak(backend, per_writer=per_writer)
    stats2 = _assert_soak(backend, root2, results2, per_writer=per_writer)
    stats2["adjudicated"] = {"first_run_p99_ms": stats["worst_p99_ms"]}
    return stats2


@pytest.mark.slow
@pytest.mark.parametrize("substrate", ["optimistic", "optimistic+excl"])
def test_contention_soak_filesystem_substrates(substrate):
    stats = _soak_adjudicated(substrate)
    print(f"\n[soak {substrate}] {stats}")


@pytest.mark.slow
def test_contention_soak_objstore():
    from factstore_spark.storage.cas import ObjectStoreServer

    srv = ObjectStoreServer()
    spec = srv.start()
    try:
        # conditional-PUT RPCs per attempt make this substrate the
        # slowest; half the per-writer volume keeps the soak < ~2 min
        stats = _soak_adjudicated(spec, per_writer=PER_WRITER // 2)
        print(f"\n[soak objstore] {stats}")
    finally:
        srv.stop()


@pytest.mark.slow
def test_contention_soak_survives_ambient_load():
    """VERDICT r13 task #4 'done' check: the p99 assert once failed CI
    purely because parallel jobs were stealing CPUs. Reproduce that
    deliberately — CPU burners take ~half the box during the first
    soak — and require (a) every correctness invariant to hold UNDER
    load (ambient load must never excuse a lost update or starvation),
    and (b) the adjudication to settle the latency verdict on a clean
    rerun once the load is gone."""
    n_burn = max(2, (os.cpu_count() or 4) // 2)
    burners = [
        subprocess.Popen(
            [sys.executable, "-c", "while True:\n pass"],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        for _ in range(n_burn)
    ]
    try:
        root, results = _run_soak("optimistic")
        stats = _assert_soak("optimistic", root, results, enforce_p99=False)
    finally:
        for p in burners:
            p.kill()
        for p in burners:
            p.wait()
    if stats["worst_p99_ms"] >= P99_BOUND_S * 1e3:
        # latency breached under deliberate load — the clean rerun is
        # the verdict, exactly what CI does for an ambient-load breach
        time.sleep(2.0)
        root2, results2 = _run_soak("optimistic")
        stats = _assert_soak("optimistic", root2, results2)
    print(f"\n[soak under-load adjudication] {stats}")
