"""Compaction: many small commits -> one partitioned/sorted layout,
with positions, cursors, finder results and post-compaction appends all
preserved."""

from factstore_spark import FactInput, ReplayStart, TimeRange
from factstore_spark.results import Appended

STORE = "default-test-store"


def seed(fs, n=30):
    fs.create(STORE)
    ids = []
    for i in range(n):
        res = fs.append(
            STORE,
            FactInput(
                type=f"T{i % 3}",
                subject=f"S{i % 5}",
                tags={"parity": str(i % 2)},
            ),
        )
        assert isinstance(res, Appended)
        ids.append(res.fact_ids[0])
    return ids


def test_compaction_preserves_everything(fs):
    ids = seed(fs)
    before = fs.find_in_time_range(STORE, TimeRange()).facts
    stats = fs.compact(STORE)
    assert stats["compacted"] and stats["files_before"] == 30
    after = fs.find_in_time_range(STORE, TimeRange()).facts
    assert [f.id for f in after] == [f.id for f in before]
    assert [f.position for f in after] == [f.position for f in before]
    # Finders still work, including cursors into pre-compaction facts.
    hist = fs.find_by_subject(STORE, "S2")
    assert [f.subject for f in hist.facts] == ["S2"] * 6
    replayed = [f for b in fs.replay(STORE, ReplayStart.After(ids[27])) for f in b]
    assert [f.id for f in replayed] == ids[28:]
    tagged = fs.find_by_tags(STORE, {"parity": "1"})
    assert len(tagged.facts) == 15


def test_append_after_compaction(fs):
    seed(fs, 10)
    fs.compact(STORE)
    res = fs.append(STORE, FactInput(type="LATE", subject="S9"))
    assert isinstance(res, Appended)
    facts = fs.find_in_time_range(STORE, TimeRange()).facts
    assert len(facts) == 11
    assert facts[-1].type == "LATE"
    # Position strictly beyond all compacted positions.
    assert facts[-1].position > facts[-2].position
    # Second compaction folds the tail in.
    stats = fs.compact(STORE)
    assert stats["compacted"]
    facts2 = fs.find_in_time_range(STORE, TimeRange()).facts
    assert [f.id for f in facts2] == [f.id for f in facts]


def test_concurrent_compactions_one_winner(fs, spark):
    """Two compactions over the same snapshot: exactly one swaps, the
    other reports a lost race (or up-to-date) — never an exception
    (ADVICE r1: the guard is re-checked inside the commit lock)."""
    from concurrent.futures import ThreadPoolExecutor

    import threading

    seed(fs, n=12)
    # Force a TRUE race: both compactions must capture their snapshot
    # (the first read_commits call) before either proceeds to the swap.
    # Without this the threads can serialize — the loser reports
    # 'up to date' and the in-lock guard re-check never fires.
    meta = fs.catalog.find_by_name(STORE)
    layout = fs._layout(meta.id)
    real_read = layout.read_commits
    barrier = threading.Barrier(2, timeout=30)
    synced = threading.local()

    def synced_read(*a, **kw):
        out = real_read(*a, **kw)
        if not getattr(synced, "done", False):
            synced.done = True
            barrier.wait()
        return out

    layout.read_commits = synced_read
    try:
        with ThreadPoolExecutor(max_workers=2) as ex:
            futures = [ex.submit(fs.compact, STORE) for _ in range(2)]
            results = [f.result() for f in futures]
    finally:
        layout.read_commits = real_read
    wins = [r for r in results if r.get("compacted")]
    losses = [r for r in results if not r.get("compacted")]
    assert len(wins) == 1 and len(losses) == 1
    # Both read the same snapshot, so the loser MUST have lost the
    # race at the in-lock guard — 'up to date' would mean it never
    # raced at all.
    assert losses[0].get("reason") == "lost race", losses[0]
    # store still fully readable after the race
    assert len(fs.find_by_subject(STORE, "S1").facts) > 0


def test_compaction_empty_store(fs):
    fs.create(STORE)
    stats = fs.compact(STORE)
    assert stats == {"files_before": 0, "compacted": False}


def test_new_subscription_after_compaction_no_duplicates(fs, spark, tmp_path):
    """The stream mirror is compaction-proof: a fresh Beginning
    subscription after compact() sees every fact exactly once."""
    from factstore_spark import StartPosition

    ids = seed(fs, 12)
    fs.compact(STORE)
    fs.append(STORE, FactInput(type="POST", subject="SP"))
    stream = fs.subscribe_stream(STORE, StartPosition.Beginning())
    q = (
        stream.writeStream.format("memory")
        .queryName("post_compact_sub")
        .option("checkpointLocation", str(tmp_path / "ckpt-pc"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    rows = spark.sql("select id, position from post_compact_sub").collect()
    assert len(rows) == 13                       # no duplicates
    assert len({r.id for r in rows}) == 13       # all distinct facts
    assert set(ids) <= {r.id for r in rows}      # pre-compaction facts present


def test_facts_df_max_position_is_time_travel_across_maintenance(fs, spark):
    """max_position pins an as-of snapshot (Delta-style time travel):
    the pinned view must reproduce the historical state bit-for-bit
    even after later appends, compaction, and commit-log checkpointing
    rewrite the physical layout."""
    from factstore_spark.model import FactInput

    store = "timetravel-store"
    fs.create(store)
    r1 = fs.append(store, [FactInput(type="T", subject=f"s{i}") for i in range(5)])
    head = max(r1.positions)
    before = sorted(
        (r.id, r.position)
        for r in fs.facts_df(store).select("id", "position").collect()
    )

    fs.append(store, [FactInput(type="T", subject=f"late{i}") for i in range(7)])
    fs.maintain(store)  # compact + checkpoint + tag index: layout fully rewritten

    pinned = sorted(
        (r.id, r.position)
        for r in fs.facts_df(store, max_position=head).select("id", "position").collect()
    )
    assert pinned == before
    # and the live view sees everything
    assert fs.facts_df(store).count() == 12


def test_incremental_compaction_hardlinks_untouched_dates(fs, spark):
    """Once a snapshot exists, recompaction only rewrites the date
    partitions new commits touch: historical date partitions in the new
    snapshot are HARDLINKS of the previous generation's files (same
    inode — nothing was read or copied), and the full read-back still
    equals position order."""
    import os

    # two distinct historical dates built directly (appended_at is
    # caller-supplied through the bulk-ingest path)
    fs.create("inc-store")
    import datetime as dt

    rows = []
    for day, n in ((1, 4), (2, 3)):
        for i in range(n):
            rows.append(
                {
                    "id": f"h{day}-{i}",
                    "type": "H",
                    "subject": f"s{day}",
                    "appended_at": dt.datetime(2024, 1, day, 8, 0, i),
                    "payload": {"data": b"", "format": None, "schema_ref": None},
                    "metadata": {},
                    "tags": {},
                }
            )
    hist_schema = (
        "id string, type string, subject string, appended_at timestamp, "
        "payload struct<data binary, format string, schema_ref string>, "
        "metadata map<string,string>, tags map<string,string>"
    )
    hist = spark.createDataFrame(rows, hist_schema)
    fs.append_dataframe("inc-store", hist)
    s1 = fs.compact("inc-store")
    assert s1["compacted"]
    meta = fs.find_by_name("inc-store")
    layout = fs._layout(meta.id)
    gen1 = s1["out_dir"]
    gen1_inodes = {}
    for part in os.listdir(gen1):
        if part.startswith("fact_date="):
            for f in os.listdir(os.path.join(gen1, part)):
                if f.endswith(".parquet"):
                    gen1_inodes[(part, f)] = os.stat(
                        os.path.join(gen1, part, f)
                    ).st_ino

    # new commits land TODAY -> only today's partition should be written
    from factstore_spark import FactInput

    for i in range(3):
        fs.append("inc-store", FactInput(type="N", subject="snew"))
    before = [(f.id, f.position) for f in fs.find_in_time_range("inc-store", TimeRange()).facts]
    s2 = fs.compact("inc-store")
    assert s2["compacted"]
    gen2 = s2["out_dir"]
    parts2 = sorted(n for n in os.listdir(gen2) if n.startswith("fact_date="))
    assert "fact_date=2024-01-01" in parts2 and "fact_date=2024-01-02" in parts2
    assert len(parts2) == 3  # two historical + today
    for part in ("fact_date=2024-01-01", "fact_date=2024-01-02"):
        for f in os.listdir(os.path.join(gen2, part)):
            if f.endswith(".parquet"):
                assert os.stat(os.path.join(gen2, part, f)).st_ino == gen1_inodes[
                    (part, f)
                ], "historical partition was rewritten, not hardlinked"
    after = [(f.id, f.position) for f in fs.find_in_time_range("inc-store", TimeRange()).facts]
    assert after == before
