"""Replay + subscribe TCK port (AbstractFactStoreTest.kt:777-948)."""

import threading
import time

from factstore_spark import FactInput, ReplayStart, StartPosition
from factstore_spark.results import FactIdNotFound, StoreNotFound

STORE = "default-test-store"


def fi(t):
    return FactInput(type=t, subject="USER:ALICE")


# -- replay (bounded) -------------------------------------------------------


def test_replay_from_beginning_completes(fs):
    """AbstractFactStoreTest.kt:888-897."""
    fs.create(STORE)
    for t in ("A", "B", "C"):
        fs.append(STORE, fi(t))
    batches = list(fs.replay(STORE))
    facts = [f for b in batches for f in b]
    assert [f.type for f in facts] == ["A", "B", "C"]


def test_replay_excludes_facts_appended_after_open(fs):
    """Pinned head (AbstractFactStoreTest.kt:900-915)."""
    fs.create(STORE)
    fs.append(STORE, fi("A"))
    fs.append(STORE, fi("B"))
    it = fs.replay(STORE)
    fs.append(STORE, fi("LATE"))
    facts = [f for b in it for f in b]
    assert [f.type for f in facts] == ["A", "B"]


def test_replay_after_cursor(fs):
    """AbstractFactStoreTest.kt:918-928."""
    fs.create(STORE)
    r1 = fs.append(STORE, fi("A"))
    fs.append(STORE, fi("B"))
    fs.append(STORE, fi("C"))
    facts = [
        f for b in fs.replay(STORE, ReplayStart.After(r1.fact_ids[0])) for f in b
    ]
    assert [f.type for f in facts] == ["B", "C"]


def test_replay_empty_store_completes_immediately(fs):
    """AbstractFactStoreTest.kt:931-948."""
    fs.create(STORE)
    assert list(fs.replay(STORE)) == []


def test_replay_empty_delta(fs):
    fs.create(STORE)
    r = fs.append(STORE, fi("A"))
    assert list(fs.replay(STORE, ReplayStart.After(r.fact_ids[0]))) == []


def test_replay_unknown_cursor(fs):
    fs.create(STORE)
    fs.append(STORE, fi("A"))
    assert isinstance(fs.replay(STORE, ReplayStart.After("nope")), FactIdNotFound)


def test_replay_missing_store(fs):
    assert isinstance(fs.replay("non-existing-store"), StoreNotFound)


def test_replay_batching(fs):
    fs.create(STORE)
    fs.append(STORE, [fi(f"T{i}") for i in range(10)])
    batches = list(fs.replay(STORE, batch_size=4))
    assert [len(b) for b in batches] == [4, 4, 2]
    flat = [f.type for b in batches for f in b]
    assert flat == [f"T{i}" for i in range(10)]


# -- subscribe (live tail, generator variant) -------------------------------


def _drain(gen, n, timeout=10.0):
    """Collect n facts from a live subscription in a worker thread."""
    out, done = [], threading.Event()

    def worker():
        for batch in gen:
            out.extend(batch)
            if len(out) >= n:
                done.set()
                return

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    done.wait(timeout)
    return out


def test_subscribe_from_beginning_catches_up(fs):
    """AbstractFactStoreTest.kt:777-828."""
    fs.create(STORE)
    for t in ("A", "B", "C"):
        fs.append(STORE, fi(t))
    gen = fs.subscribe(STORE, StartPosition.Beginning(), poll_interval=0.05)
    facts = _drain(gen, 3)
    assert [f.type for f in facts] == ["A", "B", "C"]


def test_subscribe_from_end_sees_only_new_facts(fs):
    """AbstractFactStoreTest.kt:832-873. The End offset is captured at
    subscribe time, not at first poll."""
    fs.create(STORE)
    fs.append(STORE, fi("OLD1"))
    fs.append(STORE, fi("OLD2"))
    gen = fs.subscribe(STORE, StartPosition.End(), poll_interval=0.05)
    time.sleep(0.1)
    fs.append(STORE, fi("NEW1"))
    fs.append(STORE, fi("NEW2"))
    facts = _drain(gen, 2)
    assert [f.type for f in facts] == ["NEW1", "NEW2"]


def test_subscribe_after_cursor(fs):
    fs.create(STORE)
    r1 = fs.append(STORE, fi("A"))
    fs.append(STORE, fi("B"))
    gen = fs.subscribe(STORE, StartPosition.After(r1.fact_ids[0]), poll_interval=0.05)
    facts = _drain(gen, 1)
    assert [f.type for f in facts] == ["B"]


def test_subscribe_unknown_cursor(fs):
    fs.create(STORE)
    fs.append(STORE, fi("A"))
    assert isinstance(
        fs.subscribe(STORE, StartPosition.After("nope")), FactIdNotFound
    )


def test_subscribe_live_tail_receives_later_appends(fs):
    fs.create(STORE)
    fs.append(STORE, fi("A"))
    gen = fs.subscribe(STORE, StartPosition.Beginning(), poll_interval=0.05)
    facts = _drain(gen, 1)
    assert [f.type for f in facts] == ["A"]
    fs.append(STORE, fi("B"))
    more = _drain(gen, 1)
    assert [f.type for f in more] == ["B"]


# -- subscribe (Structured Streaming variant) -------------------------------


def test_subscribe_stream_catchup_available_now(fs, spark, tmp_path):
    """The Spark-native subscription: file-source streaming DataFrame,
    drained with Trigger.AvailableNow into a memory sink."""
    fs.create(STORE)
    for t in ("A", "B", "C"):
        fs.append(STORE, fi(t))
    stream = fs.subscribe_stream(STORE, StartPosition.Beginning())
    q = (
        stream.writeStream.format("memory")
        .queryName("sub_catchup")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select type from sub_catchup order by position").collect()
    assert [r.type for r in rows] == ["A", "B", "C"]


def test_subscribe_stream_missing_store(fs):
    assert isinstance(fs.subscribe_stream("non-existing-store"), StoreNotFound)


def test_subscribe_stream_live_tail_processing_time(fs, spark, tmp_path):
    """Continuous micro-batch query: facts appended AFTER the stream
    starts must flow into the sink (the watch-loop analog,
    FdbFactStreamer.kt:178-193)."""
    fs.create("live-store")
    fs.append("live-store", fi("OLD"))
    stream = fs.subscribe_stream("live-store", StartPosition.Beginning())
    q = (
        stream.writeStream.format("memory")
        .queryName("live_tail")
        .option("checkpointLocation", str(tmp_path / "ckpt-live"))
        .trigger(processingTime="300 milliseconds")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.sql("select count(*) c from live_tail").collect()[0].c >= 1:
                break
            time.sleep(0.2)
        fs.append("live-store", fi("LIVE1"))
        fs.append("live-store", fi("LIVE2"))
        while time.time() < deadline:
            if spark.sql("select count(*) c from live_tail").collect()[0].c >= 3:
                break
            time.sleep(0.2)
        rows = spark.sql("select type from live_tail order by position").collect()
        assert [r.type for r in rows] == ["OLD", "LIVE1", "LIVE2"]
    finally:
        q.stop()


def test_subscribe_stream_sees_bulk_ingested_facts(fs, spark, tmp_path, sf_dir):
    """Bulk commits live in subdirectories — the streaming source must
    pick them up (recursiveFileLookup)."""
    from factstore_spark.sources.events import events_as_facts

    fs.create("bulk-sub")
    facts_df = events_as_facts(spark, sf_dir).drop("id", "appended_at").limit(50)
    fs.append_dataframe("bulk-sub", facts_df)
    fs.append("bulk-sub", fi("ROW"))
    stream = fs.subscribe_stream("bulk-sub", StartPosition.Beginning())
    q = (
        stream.writeStream.format("memory")
        .queryName("bulk_sub")
        .option("checkpointLocation", str(tmp_path / "ckpt-bulk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    n = spark.sql("select count(*) c from bulk_sub").collect()[0].c
    assert n == 51


def test_subscribe_stream_resumes_from_checkpoint_across_compaction(
    fs, spark, tmp_path
):
    """Checkpoint-resumable consumption (the FactReplayer.kt:8-16
    contract carried onto Structured Streaming): stop a subscription,
    run full maintenance — compaction rewrites every file under data/
    — append more facts, then restart from the SAME checkpoint. The
    resumed query must deliver exactly the facts the first run never
    saw: no loss, and no redelivery of the pre-stop prefix even though
    compaction replaced all the files the first run read (the stream/
    hardlink mirror keeps the source's file set stable; a stream over
    data/ would see the compacted rewrite as all-new files and
    duplicate everything)."""
    fs.create("resume-store")
    for i in range(5):
        fs.append("resume-store", fi(f"PRE{i}"))
    ckpt = str(tmp_path / "ckpt-resume")
    sink = str(tmp_path / "sink-resume")  # parquet sink: checkpoint-recoverable

    def drain():
        stream = fs.subscribe_stream("resume-store", StartPosition.Beginning())
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        return [
            r.type
            for r in spark.read.parquet(sink).orderBy("position").collect()
        ]

    assert drain() == [f"PRE{i}" for i in range(5)]

    # subscription is down: full maintenance (compact + log checkpoint +
    # index refresh) rewrites data/, then the store keeps moving
    stats = fs.maintain("resume-store")
    assert stats["compact"].get("compacted") is True
    for i in range(3):
        fs.append("resume-store", fi(f"POST{i}"))

    # resume from the SAME checkpoint: the sink ends with exactly the
    # union — no loss, no dups, no compaction-induced replay of PRE*
    assert drain() == [f"PRE{i}" for i in range(5)] + [
        f"POST{i}" for i in range(3)
    ]


def test_tail_poll_opens_only_new_commit_files(spark, store_root):
    """The subscription's per-poll prune (data_files_after_position):
    a cursor at the tail must resolve ONLY the files of commits past
    it — not the whole store — and still deliver exactly the new
    facts, including across a compaction."""
    from factstore_spark.model import FactInput, StartPosition
    from factstore_spark.store import FactStore

    fs = FactStore(spark, store_root)
    fs.create("tailprune")
    meta = fs.catalog.find_by_name("tailprune")
    layout = fs._layout(meta.id)
    for i in range(10):
        fs.append("tailprune", FactInput(type=f"E{i}", subject=f"s{i % 3}"))
    head = layout.published_head_position()
    all_files = layout.data_files()
    assert len(all_files) >= 10
    # cursor at head: nothing to open
    assert layout.data_files_after_position(head) == []
    # cursor two commits back: exactly the last two commits' files
    two_back = layout.data_files_after_position(head - 2)
    assert 1 <= len(two_back) <= 2
    assert set(two_back) <= set(all_files)
    # delivery correctness through the pruned read path
    gen = fs.subscribe(
        "tailprune", StartPosition.Beginning(), poll_interval=0.01
    )
    got = []
    for batch in gen:
        got.extend(batch)
        if len(got) >= 10:
            break
    assert [f.position for f in got] == sorted(f.position for f in got)
    assert len(got) == 10
    # compaction rewrites data/ — the prune must serve the compacted
    # prefix when the cursor predates it and skip it when past it
    fs.compact("tailprune")
    assert layout.data_files_after_position(head) == []
    again = layout.data_files_after_position(-1)
    assert again, "cursor before everything must include compacted data"
    fs.append("tailprune", FactInput(type="post", subject="s9"))
    post = layout.data_files_after_position(head)
    assert len(post) == 1 and "compacted" not in post[0]


# -- subscribe watch wakeup (round 11) ---------------------------------------


def test_subscribe_watch_delivers_and_matches_poll_semantics(fs):
    """watch=True changes only WHEN the tail wakes, never WHAT it
    delivers: same facts, same order, through appends that land while
    the subscriber is idle-waiting."""
    fs.create(STORE)
    fs.append(STORE, fi("A"))
    gen = fs.subscribe(
        STORE, StartPosition.Beginning(), poll_interval=0.5, watch=True
    )
    facts = _drain(gen, 1)
    assert [f.type for f in facts] == ["A"]
    for t in ("B", "C"):
        fs.append(STORE, fi(t))
        got = _drain(gen, 1)
        assert [f.type for f in got] == [t]


def test_subscribe_watch_beats_poll_interval_on_idle_tail(fs):
    """The point of the watch: with a LONG poll (1 s), an append into
    an idle tail must still deliver in a small fraction of the poll
    interval (token stat every 4 ms). Bound loose (250 ms) for CI
    noise; the bench records the honest single-digit-ms figure."""
    fs.create(STORE)
    received = {}
    gen = fs.subscribe(
        STORE, StartPosition.End(), poll_interval=1.0, watch=True
    )

    def run():
        for batch in gen:
            received["t"] = time.monotonic()
            return

    th = threading.Thread(target=run, daemon=True)
    th.start()
    time.sleep(0.3)  # let the subscriber reach its idle wait
    t0 = time.monotonic()
    fs.append(STORE, fi("LATE"))
    th.join(timeout=5.0)
    assert "t" in received, "watch subscriber never woke"
    assert received["t"] - t0 < 0.25, (
        f"watch latency {received['t'] - t0:.3f}s not << poll 1.0s"
    )


def test_subscribe_stream_exactly_once_across_live_compaction(
    fs, spark, tmp_path
):
    """Soak (VERDICT r11 #6): a LIVE Structured-Streaming subscription
    with concurrent appends and a compaction forced MID-STREAM. The
    stream reads the stream/ hardlink mirror, which compaction never
    touches (store.py subscribe_stream) — asserted here end to end:
    the sink receives every committed position EXACTLY once, through
    two compactions that rewrite all of data/ under the query's feet."""
    fs.create("soak-store")
    for i in range(6):
        fs.append("soak-store", fi(f"PRE{i}"))
    stream = fs.subscribe_stream("soak-store", StartPosition.Beginning())
    q = (
        stream.writeStream.format("memory")
        .queryName("soak_sink")
        .option("checkpointLocation", str(tmp_path / "soak-ckpt"))
        .trigger(processingTime="150 milliseconds")
        .start()
    )
    try:
        total = 6
        for wave in range(2):
            # appends land WHILE the query is triggering
            for i in range(8):
                fs.append("soak-store", fi(f"W{wave}N{i}"))
                total += 1
                time.sleep(0.02)
            # mid-stream compaction: rewrites every file under data/
            stats = fs.compact("soak-store")
            assert stats.get("compacted") is True
            for i in range(4):
                fs.append("soak-store", fi(f"W{wave}P{i}"))
                total += 1
        deadline = time.monotonic() + 60
        while time.monotonic() < deadline:
            n = spark.sql("SELECT count(*) c FROM soak_sink").collect()[0].c
            if n >= total:
                break
            time.sleep(0.2)
        rows = spark.sql(
            "SELECT position, type FROM soak_sink ORDER BY position"
        ).collect()
    finally:
        q.stop()
    got_positions = [r.position for r in rows]
    # exactly once: no dup positions, no missing positions
    assert len(got_positions) == total, (
        f"sink has {len(got_positions)} rows, committed {total}"
    )
    assert len(set(got_positions)) == len(got_positions), "duplicates in sink"
    committed = set()
    for b in fs.replay("soak-store"):
        committed.update(f.position for f in b)
    assert set(got_positions) == committed, "sink/store position set drift"


def test_subscribe_watch_exactly_once_across_live_compaction(fs):
    """The watch-generator twin of the streaming soak: subscribe(
    watch=True) follows the tail while appends and a mid-stream
    compaction run concurrently — every position delivered exactly
    once, in order (the generator reads files resolved through commit
    records, so the data/ rewrite must be invisible to it too)."""
    fs.create("soak-watch")
    for i in range(5):
        fs.append("soak-watch", fi(f"PRE{i}"))
    seen: list[int] = []
    total = 5 + 6 + 6  # known up front so the subscriber can stop itself
    done = threading.Event()

    def subscriber():
        gen = fs.subscribe(
            "soak-watch", StartPosition.Beginning(),
            poll_interval=0.2, watch=True,
        )
        for batch in gen:
            seen.extend(f.position for f in batch)
            if len(seen) >= total:
                done.set()
                return

    th = threading.Thread(target=subscriber, daemon=True)
    th.start()
    for i in range(6):
        fs.append("soak-watch", fi(f"A{i}"))
        time.sleep(0.02)
    stats = fs.compact("soak-watch")
    assert stats.get("compacted") is True
    for i in range(6):
        fs.append("soak-watch", fi(f"B{i}"))
        time.sleep(0.02)
    assert done.wait(timeout=30), f"subscriber saw {len(seen)}/{total}"
    assert len(seen) == total
    assert len(set(seen)) == total, "duplicate positions delivered"
    assert seen == sorted(seen), "out-of-order delivery"
    committed = set()
    for b in fs.replay("soak-watch"):
        committed.update(f.position for f in b)
    assert set(seen) == committed
