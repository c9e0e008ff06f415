"""Round-15 optimization equivalence/contract tests.

Each test pins an optimization from OPTIMIZATION_r15.md to its
contract: the optimized path must produce results identical to the
unoptimized formulation (or, for the group-commit protocol, preserve
the append path's atomicity/durability/idempotency contracts the
fault-schedule suite asserts)."""

import json
import os
import threading

import pytest

from factstore_spark.model import FactInput, StartPosition
from factstore_spark.results import AlreadyApplied, Appended
from factstore_spark.storage import layout as layout_mod
from factstore_spark.store import FactStore


def _fact(subject: str, n: int) -> FactInput:
    return FactInput(type="Probe", subject=subject, tags={"k": f"v{n % 3}"})


# ---------------------------------------------------------------------------
# Group commit (storage/layout.py sync_commit_log — guide §2.6/§5 on the
# append path: one fsync covers every queued writer's commit-log line)
# ---------------------------------------------------------------------------


def test_group_commit_concurrent_appends_all_durable(tmp_path):
    """10 threads x 20 appends race one store: every append acks, every
    acked fact is readable from a FRESH handle (new-process analog),
    positions are unique, and the commit log parses clean."""
    fs = FactStore(None, str(tmp_path))
    fs.create("gc")
    results: list = []
    lock = threading.Lock()

    def writer(wid: int) -> None:
        for i in range(20):
            r = fs.append("gc", _fact(f"w{wid}", i))
            with lock:
                results.append(r)

    threads = [threading.Thread(target=writer, args=(w,)) for w in range(10)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 200
    assert all(isinstance(r, Appended) for r in results)
    positions = [p for r in results for p in r.positions]
    assert len(set(positions)) == 200

    fresh = FactStore(None, str(tmp_path))
    seen = set()
    for batch in fresh.subscribe("gc", StartPosition.Beginning(), poll_interval=0.01):
        for f in batch:
            seen.add(f.position)
        if len(seen) >= 200:
            break
    assert seen == set(positions)


def test_group_commit_single_fsync_covers_queued_writers(tmp_path, monkeypatch):
    """The sharing contract itself: lines written with defer_sync get
    tickets; ONE sync_commit_log fsync covers every ticket handed out
    before it, so later syncs for earlier tickets do no syscall."""
    fs = FactStore(None, str(tmp_path))
    fs.create("gc2")
    layout = fs._layout(fs.find_by_name("gc2").id)

    from factstore_spark.storage.layout import utcnow_us

    with layout.commit_lock():
        commits = layout.read_commits()
        _, _, t1 = layout.append_commit(
            [], utcnow_us(), "key-1", commits, defer_sync=True
        )
        _, _, t2 = layout.append_commit(
            [], utcnow_us(), "key-2", layout.read_commits(), defer_sync=True
        )
    assert 0 < t1 < t2

    calls = []
    real_fsync = os.fsync

    def counting_fsync(fd):
        calls.append(fd)
        return real_fsync(fd)

    monkeypatch.setattr(layout_mod.os, "fsync", counting_fsync)
    layout.sync_commit_log(t2)  # leader: one fsync covers t1 too
    assert len(calls) == 1
    layout.sync_commit_log(t1)  # already covered: no syscall
    layout.sync_commit_log(0)  # inline-synced sentinel: no syscall
    assert len(calls) == 1
    # both records durable and parseable from a fresh handle
    fresh = FactStore(None, str(tmp_path))
    flayout = fresh._layout(fresh.find_by_name("gc2").id)
    keys = {c.idempotency_key for c in flayout.read_commits()}
    assert {"key-1", "key-2"} <= keys


def test_group_commit_unsynced_line_still_recovers_idempotent(tmp_path):
    """Crash-point analog: a writer dies after the flock section but
    before its group fsync ran. The line is on disk (visible), the
    append was never acked; a retry with the same key must see
    AlreadyApplied — exactly one application, same as the fault sweep's
    post-log-line point."""
    fs = FactStore(None, str(tmp_path))
    fs.create("gc3")
    layout = fs._layout(fs.find_by_name("gc3").id)
    from factstore_spark.model import new_fact_id
    from factstore_spark.storage.layout import utcnow_us

    row = {
        "id": new_fact_id(),
        "type": "Probe",
        "subject": "s",
        "appended_at": utcnow_us(),
        "position": 0,
        "payload": {"data": b"", "format": None, "schema_ref": None},
        "metadata": {},
        "tags": {},
    }
    with layout.commit_lock():
        layout.append_commit(
            [row], utcnow_us(), "crash-key", layout.read_commits(),
            defer_sync=True,
        )
    # no sync_commit_log: the "dead" writer never fsynced.
    fresh = FactStore(None, str(tmp_path))
    retry = fresh.append("gc3", _fact("s", 0), idempotency_key="crash-key")
    assert isinstance(retry, AlreadyApplied)
    seen = []
    for b in fresh.subscribe("gc3", StartPosition.Beginning(), poll_interval=0.01):
        seen.extend(b)
        if seen:
            break
    assert len(seen) == 1


# ---------------------------------------------------------------------------
# py4j-thin expression builders (guide §7.3): the SQL-string forms must
# be exactly equivalent to the Column-DSL forms they replaced
# ---------------------------------------------------------------------------


def test_bpe_sql_merge_fold_handles_quotes_and_backslashes(spark):
    """The per-round merge fold now embeds corpus tokens as SQL string
    literals; tokens containing quotes/backslashes must round-trip
    (escaped), pinned against the pure-Python reference learner."""
    from factstore_spark.operators.bpe import learn_bpe, learn_bpe_reference

    texts = [
        "don't don't don't can't \\path\\to \\path\\to 'q' 'q' 'q'",
        "don't can't \\path\\to 'q' it's it's",
    ] * 3
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = learn_bpe(docs, n_merges=12)
    want = learn_bpe_reference(texts, n_merges=12)
    assert got == want


def test_quality_and_lang_sql_builders_match_reference_rows(spark):
    """with_quality_score/with_lang_id (now single parsed SQL
    expressions) on edge-case rows: empty text, whitespace-only,
    marker ties, null text."""
    from factstore_spark.operators.text import with_lang_id, with_quality_score

    docs = spark.createDataFrame(
        [
            (1, "the quick fox is in the yard and it is quick"),
            (2, "el la de que y"),
            (3, ""),
            (4, "   \t\n"),
            (5, None),
            (6, "der la"),  # de/es one marker each -> first sorted lang wins
        ],
        "doc_id int, text string",
    )
    rows = {
        r.doc_id: r
        for r in with_quality_score(with_lang_id(docs)).collect()
    }
    assert rows[1].pred_lang == "en" and rows[1].n_tokens == 11
    assert rows[2].pred_lang == "es" and rows[2].n_tokens == 5
    assert rows[3].pred_lang == "und" and rows[3].n_tokens == 0
    assert rows[3].quality_score == 0.0 and rows[3].stopword_ratio == 0.0
    assert rows[4].pred_lang == "und" and rows[4].n_tokens == 0
    assert rows[5].pred_lang == "und" and rows[5].n_tokens is None
    assert rows[6].pred_lang == "de"  # tie broken by sorted lang order
    # stopword ratio exact: the/is/in/the/and/it/is = 7 hits of 11 tokens
    assert abs(rows[1].stopword_ratio - 7 / 11) < 1e-12


def test_dup_clusters_distributed_path_converges_and_matches(spark):
    """The distributed pointer-jumping path (driver_threshold=0) with
    the convergence flag riding the round's own checkpoint must match
    the driver union-find path exactly — including a long chain (many
    rounds) and singleton pairs."""
    from factstore_spark.operators.dedup import dup_clusters

    pairs = [(i, i + 1) for i in range(40)]  # one 41-node chain
    pairs += [(100, 101), (200, 201), (200, 202)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    dist = {
        (r.doc_id, r.cluster_id)
        for r in dup_clusters(df, driver_threshold=0).collect()
    }
    drv = {
        (r.doc_id, r.cluster_id)
        for r in dup_clusters(df, driver_threshold=10_000).collect()
    }
    assert dist == drv
    assert all(c == 0 for n, c in dist if n <= 40)
