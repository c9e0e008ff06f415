"""Model-based equivalence: the SAME randomized operation sequence run
against the flock backend and the optimistic backend must produce the
same observable behavior — identical result types per operation,
identical fact sequences (content + relative order; ids/instants/raw
positions are backend-assigned and excluded), identical finder and
replay results. This is the contract that lets a deployment swap the
commit backend without the application noticing."""

import random

import pytest

from factstore_spark import (
    ExpectedLastFact,
    FactInput,
    FactPayload,
    TagOnlyQueryItem,
    TagQuery,
    TagQueryBased,
)
from factstore_spark.results import Appended
from factstore_spark.store import FactStore

STORE = "eq-store"


def observable(fs):
    """Backend-independent view: fact content in position order."""
    rows = fs.facts_df(STORE).orderBy("position").collect()
    return [
        (r.type, r.subject, dict(r.tags), bytes(r.payload.data or b""))
        for r in rows
    ]


def run_sequence(fs, seed: int):
    """Deterministic op sequence; conditions reference THIS store's own
    returned fact ids (ids differ per backend, the references are
    symmetric). Returns the outcome-type trace."""
    rnd = random.Random(seed)
    fs.create(STORE)
    trace = []
    last_ids: dict[str, str] = {}
    used_keys = []
    for i in range(40):
        if i == 20:
            # Full maintenance mid-sequence: compaction, commit-log
            # checkpoint, tag-index refresh. Every subsequent op then
            # runs against a compacted layout + checkpointed log +
            # (briefly) fresh index — the indexed DCB path, the folded
            # idempotency keys, and the staleness fallback all get
            # exercised under the SAME random workload on every
            # backend, and must not change a single outcome.
            stats = fs.maintain(STORE)
            trace.append(("maintain", bool(stats["compact"].get("compacted"))))
        subject = f"s{rnd.randint(0, 4)}"
        tags = {f"k{rnd.randint(0, 2)}": f"v{rnd.randint(0, 2)}"}
        roll = rnd.random()
        condition = None
        if roll < 0.25:
            # optimistic-concurrency on this subject's CURRENT head —
            # half the time deliberately stale (expect a violation)
            expected = last_ids.get(subject)
            if rnd.random() < 0.5:
                expected = None if expected is not None else "ghost"
            condition = ExpectedLastFact(subject, expected)
        elif roll < 0.45:
            condition = TagQueryBased(
                TagQuery([TagOnlyQueryItem({f"k{rnd.randint(0, 2)}": f"v{rnd.randint(0, 2)}"})])
            )
        key = None
        if used_keys and rnd.random() < 0.15:
            key = rnd.choice(used_keys)  # replay a key -> AlreadyApplied
        elif rnd.random() < 0.3:
            key = f"00000000-0000-0000-0000-{i:012d}"
            used_keys.append(key)
        fi = FactInput(
            type=f"T{rnd.randint(0, 3)}",
            subject=subject,
            payload=FactPayload(f"payload-{i}".encode()),
            tags=tags,
        )
        kwargs = {"idempotency_key": key}
        if condition is not None:
            kwargs["condition"] = condition
        res = fs.append(STORE, fi, **kwargs)
        trace.append(type(res).__name__)
        if isinstance(res, Appended):
            last_ids[subject] = res.fact_ids[0]
    return trace


@pytest.mark.parametrize("seed", [101, 202])
def test_backends_equivalent_under_random_ops(spark, tmp_path, seed):
    """flock vs the optimistic protocol over EVERY CAS substrate
    (hardlink, create-no-overwrite, object-store conditional PUT) —
    swapping the commit substrate must be invisible to the app."""
    from factstore_spark.storage.cas import ObjectStoreServer

    srv = ObjectStoreServer()
    objspec = srv.start()
    # Second server with a 250 ms eventually-consistent LISTING window:
    # every append's condition evaluation and every finder runs against
    # a lagged list, so equivalence passing proves the protocol's
    # direct-read probing restores a consistent log view.
    srv_lag = ObjectStoreServer()
    lagspec = srv_lag.start(list_lag=0.25)
    try:
        fa = FactStore(spark, str(tmp_path / "flock"), commit_backend="flock")
        others = [
            FactStore(spark, str(tmp_path / "opt"), commit_backend="optimistic"),
            FactStore(spark, str(tmp_path / "excl"), commit_backend="optimistic+excl"),
            FactStore(spark, str(tmp_path / "objs"), commit_backend=objspec),
            FactStore(spark, str(tmp_path / "objl"), commit_backend=lagspec),
        ]
        trace_a = run_sequence(fa, seed)
        # The trace must exercise ALL outcome types, or a drift in the
        # random thresholds/seeds silently reduces this to
        # unconditional-append equivalence — the DCB/idempotency paths
        # are the hard part of swapping the commit substrate.
        assert {"Appended", "AppendConditionViolated", "AlreadyApplied"} <= set(
            trace_a
        ), sorted(set(trace_a))
        obs_a = observable(fa)
        subj_a = {
            s: [(f.type, f.subject) for f in fa.find_by_subject(STORE, s).facts]
            for s in [f"s{i}" for i in range(5)]
        }
        q = TagQuery([TagOnlyQueryItem({"k0": "v0"})])
        q_a = [(f.type, f.subject) for f in fa.find_by_tag_query(STORE, q).facts]
        replay_a = [f.type for b in fa.replay(STORE) for f in b]

        for fo in others:
            assert run_sequence(fo, seed) == trace_a  # same outcome per op
            assert observable(fo) == obs_a  # same facts, same order
            for s, expect in subj_a.items():
                got = [
                    (f.type, f.subject) for f in fo.find_by_subject(STORE, s).facts
                ]
                assert got == expect
            assert [
                (f.type, f.subject) for f in fo.find_by_tag_query(STORE, q).facts
            ] == q_a
            assert [f.type for b in fo.replay(STORE) for f in b] == replay_a
    finally:
        srv.stop()
        srv_lag.stop()
