"""Conditional append + idempotency TCK port
(AbstractFactStoreTest.kt:338-470, 1339-1419, 1452-1476)."""

import uuid
from concurrent.futures import ThreadPoolExecutor

from factstore_spark import (
    AllConditions,
    ExpectedLastFact,
    FactInput,
    TagQuery,
    TagQueryBased,
    TagTypeItem,
)
from factstore_spark.results import AlreadyApplied, Appended, AppendConditionViolated

STORE = "default-test-store"


def fi(type_="USER_CREATED", subject="USER:ALICE", tags=None):
    return FactInput(type=type_, subject=subject, tags=tags or {})


# -- ExpectedLastFact -------------------------------------------------------


def test_expected_last_fact_chain(fs):
    """Happy path + stale expectation (AbstractFactStoreTest.kt:338-382)."""
    fs.create(STORE)
    r1 = fs.append(STORE, fi(), condition=ExpectedLastFact("USER:ALICE", None))
    assert isinstance(r1, Appended)
    r2 = fs.append(
        STORE, fi("USER_UPDATED"), condition=ExpectedLastFact("USER:ALICE", r1.fact_ids[0])
    )
    assert isinstance(r2, Appended)
    # Re-using the now-stale expectation must be rejected.
    r3 = fs.append(
        STORE, fi("USER_LOCKED"), condition=ExpectedLastFact("USER:ALICE", r1.fact_ids[0])
    )
    assert isinstance(r3, AppendConditionViolated)


def test_expected_no_facts_violated_when_history_exists(fs):
    fs.create(STORE)
    fs.append(STORE, fi())
    r = fs.append(STORE, fi(), condition=ExpectedLastFact("USER:ALICE", None))
    assert isinstance(r, AppendConditionViolated)


def test_expected_last_fact_subject_normalized_like_fact_input(fs):
    """FactInput strips its subject on append, so the condition must
    check the SAME normalized stream — 'USER:ALICE ' with a trailing
    space must see ALICE's facts, not an empty phantom subject (which
    would let the None-expectation guard pass a duplicate 'first')."""
    fs.create(STORE)
    fs.append(STORE, FactInput(type="USER_CREATED", subject="USER:ALICE "))
    r = fs.append(STORE, fi(), condition=ExpectedLastFact("USER:ALICE ", None))
    assert isinstance(r, AppendConditionViolated)


def test_expected_last_fact_other_subject_unaffected(fs):
    fs.create(STORE)
    fs.append(STORE, fi(subject="USER:BOB"))
    r = fs.append(STORE, fi(), condition=ExpectedLastFact("USER:ALICE", None))
    assert isinstance(r, Appended)


def test_concurrent_conditional_appends_exactly_one_winner(fs):
    """THE concurrency contract (AbstractFactStoreTest.kt:385-420):
    1 seed + 8 racing appends expecting the seed as last fact ->
    exactly 1 Appended, 7 violated, history size 2."""
    fs.create(STORE)
    seed = fs.append(STORE, fi())
    assert isinstance(seed, Appended)
    cond = ExpectedLastFact("USER:ALICE", seed.fact_ids[0])

    def racer(i):
        return fs.append(STORE, fi(f"RACER_{i}"), condition=cond)

    with ThreadPoolExecutor(max_workers=8) as pool:
        results = list(pool.map(racer, range(8)))

    wins = [r for r in results if isinstance(r, Appended)]
    losses = [r for r in results if isinstance(r, AppendConditionViolated)]
    assert len(wins) == 1 and len(losses) == 7
    history = fs.find_by_subject(STORE, "USER:ALICE")
    assert len(history.facts) == 2


# -- All (composite) --------------------------------------------------------


def test_dcb_commit_skipping_prunes_files(fs):
    """Commit-level tag-fingerprint skipping: a DCB condition on tags
    no commit carries must resolve WITHOUT opening any data file; a
    matching tag set must keep exactly the carrying commits eligible."""
    from factstore_spark.storage.layout import tag_fingerprint

    fs.create(STORE)
    fs.append(STORE, fi(tags={"state": "open"}))
    fs.append(STORE, fi(tags={"state": "closed"}))
    fs.append(STORE, fi(tags={"other": "x"}))

    meta = fs.catalog.find_by_name(STORE)
    layout = fs._layout(meta.id)

    fresh = [[tag_fingerprint("state", "nope")]]
    assert layout.dcb_candidate_files(fresh, -1) == []

    hit = [[tag_fingerprint("state", "open")]]
    assert len(layout.dcb_candidate_files(hit, -1)) == 1

    # AND semantics: both pairs required in ONE commit -> no candidate
    both = [[tag_fingerprint("state", "open"), tag_fingerprint("state", "closed")]]
    assert layout.dcb_candidate_files(both, -1) == []

    # OR across items: either pair alone -> both carrying commits
    either = [[tag_fingerprint("state", "open")], [tag_fingerprint("state", "closed")]]
    assert len(layout.dcb_candidate_files(either, -1)) == 2

    # position pruning composes: everything at/below the cursor drops
    head = layout.head_position()
    assert layout.dcb_candidate_files(either, head) == []

    # unprunable item (no tags) -> all eligible files scanned
    assert len(layout.dcb_candidate_files([[]], -1)) == 3

    # end-to-end: the DCB condition itself still behaves
    res = fs.append(
        STORE,
        fi(subject="USER:NEW"),
        condition=TagQueryBased(TagQuery([TagTypeItem({"USER_CREATED"}, {"state": "open"})])),
    )
    assert isinstance(res, AppendConditionViolated)
    ok = fs.append(
        STORE,
        fi(subject="USER:NEW"),
        condition=TagQueryBased(TagQuery([TagTypeItem({"USER_CREATED"}, {"state": "nope"})])),
    )
    assert isinstance(ok, Appended)


def test_heads_exact_at_any_snapshot_staleness(fs):
    """Heads are log-derived (storage/heads.py): there is no per-append
    cache that a crash can leave stale, so the historical crash-gap
    window (a process dying between the commit-log fsync and a heads
    write, ADVICE r1) is structurally gone. Assert the replacement
    contract directly: ExpectedLastFact resolves the post-crash truth
    with (a) no snapshot at all, (b) an arbitrarily stale snapshot plus
    a commit tail, and (c) a freshly folded snapshot."""
    from factstore_spark.storage.heads import HeadsIndex

    fs.create(STORE)
    r1 = fs.append(STORE, fi())
    assert isinstance(r1, Appended)
    r2 = fs.append(STORE, fi())
    assert isinstance(r2, Appended)

    meta = fs.catalog.find_by_name(STORE)
    layout = fs._layout(meta.id)
    idx = HeadsIndex(layout)

    # (a) no snapshot: pure tail resolution
    assert idx.snap_meta()["through_seq"] == -1
    stale = fs.append(
        STORE, fi(), condition=ExpectedLastFact("USER:ALICE", r1.fact_ids[0])
    )
    assert isinstance(stale, AppendConditionViolated)
    ok = fs.append(
        STORE, fi(), condition=ExpectedLastFact("USER:ALICE", r2.fact_ids[0])
    )
    assert isinstance(ok, Appended)

    # (b) stale snapshot + newer commits: the tail supersedes the shard
    idx.refresh()  # folds through ok's commit
    r4 = fs.append(STORE, fi())  # newer than the snapshot
    assert isinstance(r4, Appended)
    stale2 = fs.append(
        STORE, fi(), condition=ExpectedLastFact("USER:ALICE", ok.fact_ids[0])
    )
    assert isinstance(stale2, AppendConditionViolated)
    ok2 = fs.append(
        STORE, fi(), condition=ExpectedLastFact("USER:ALICE", r4.fact_ids[0])
    )
    assert isinstance(ok2, Appended)

    # (c) fresh snapshot, cold subject: shard lookup
    idx.refresh()
    assert layout.last_fact_of_subject("USER:ALICE") == (
        ok2.fact_ids[0],
        layout.head_position(),
    )
    assert layout.last_fact_of_subject("USER:NOBODY") is None


def test_all_condition_composite(fs):
    """AbstractFactStoreTest.kt:423-470."""
    fs.create(STORE)
    r1 = fs.append(STORE, fi())
    cond = AllConditions(
        [
            ExpectedLastFact("USER:ALICE", r1.fact_ids[0]),
            ExpectedLastFact("USER:BOB", None),
        ]
    )
    r2 = fs.append(STORE, fi("USER_UPDATED"), condition=cond)
    assert isinstance(r2, Appended)
    # Now USER:ALICE moved on -> same composite fails.
    r3 = fs.append(STORE, fi("USER_LOCKED"), condition=cond)
    assert isinstance(r3, AppendConditionViolated)


# -- TagQueryBased (DCB) ----------------------------------------------------


def test_tag_query_based_dcb(fs):
    """AbstractFactStoreTest.kt:1339-1419 (FIXTURES.md §3)."""
    fs.create(STORE)
    query = TagQuery([TagTypeItem({"USER_CREATED"}, {"user": "ALICE"})])

    # No matching fact anywhere -> append allowed.
    r1 = fs.append(
        STORE,
        fi(tags={"user": "ALICE"}),
        condition=TagQueryBased(fail_if_facts_match=query),
    )
    assert isinstance(r1, Appended)

    # A match now exists -> cursor-less condition fails.
    r2 = fs.append(
        STORE,
        fi(tags={"user": "ALICE"}),
        condition=TagQueryBased(fail_if_facts_match=query),
    )
    assert isinstance(r2, AppendConditionViolated)

    # With the cursor at the existing fact -> nothing matches after it -> passes.
    r3 = fs.append(
        STORE,
        fi("USER_UPDATED", tags={"user": "ALICE"}),
        condition=TagQueryBased(fail_if_facts_match=query, after=r1.fact_ids[0]),
    )
    assert isinstance(r3, Appended)

    # Stale cursor: a USER_CREATED for ALICE after r1? No (r3 was USER_UPDATED)
    # -> still passes; but a fresh USER_CREATED then invalidates it.
    r4 = fs.append(STORE, fi(tags={"user": "ALICE"}))
    r5 = fs.append(
        STORE,
        fi(tags={"user": "ALICE"}),
        condition=TagQueryBased(fail_if_facts_match=query, after=r1.fact_ids[0]),
    )
    assert isinstance(r4, Appended)
    assert isinstance(r5, AppendConditionViolated)


def test_tag_query_based_unknown_cursor(fs):
    fs.create(STORE)
    query = TagQuery([TagTypeItem({"T"}, {"a": "b"})])
    r = fs.append(
        STORE,
        fi(),
        condition=TagQueryBased(fail_if_facts_match=query, after="missing-id"),
    )
    assert isinstance(r, AppendConditionViolated)


# -- idempotency ------------------------------------------------------------


def test_idempotent_retry_already_applied(fs):
    """AbstractFactStoreTest.kt:1452-1476."""
    fs.create(STORE)
    key = str(uuid.uuid4())
    r1 = fs.append(STORE, fi(), idempotency_key=key)
    assert isinstance(r1, Appended)
    r2 = fs.append(STORE, fi(), idempotency_key=key)
    assert isinstance(r2, AlreadyApplied)
    assert len(fs.find_by_subject(STORE, "USER:ALICE").facts) == 1


def test_convenience_append_not_retry_idempotent(fs):
    """Fresh key per call (FactAppender.kt:16-42)."""
    fs.create(STORE)
    fs.append(STORE, fi())
    fs.append(STORE, fi())
    assert len(fs.find_by_subject(STORE, "USER:ALICE").facts) == 2


def test_idempotency_keys_are_per_store(fs):
    fs.create("store-1")
    fs.create("store-2")
    key = str(uuid.uuid4())
    assert isinstance(fs.append("store-1", fi(), idempotency_key=key), Appended)
    assert isinstance(fs.append("store-2", fi(), idempotency_key=key), Appended)
