"""Streaming window/stateful operators, drained with Trigger.AvailableNow
into memory sinks over the fact store's subscribe_stream source."""

import time
from datetime import datetime, timedelta, timezone

import pytest

from factstore_spark import FactInput, StartPosition
from factstore_spark.streaming.windows import (
    running_totals_stateful,
    session_counts,
    windowed_counts,
)

STORE = "default-test-store"


@pytest.fixture()
def seeded_stream(fs):
    fs.create(STORE)
    fs.append(
        STORE,
        [
            FactInput(type="A", subject="s1"),
            FactInput(type="A", subject="s1"),
            FactInput(type="B", subject="s2"),
        ],
    )
    fs.append(STORE, FactInput(type="A", subject="s2"))
    return fs.subscribe_stream(STORE, StartPosition.Beginning())


def _drain(stream_df, name, tmp_path, spark, mode="update"):
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(mode)
        .option("checkpointLocation", str(tmp_path / f"ckpt-{name}-{time.time_ns()}"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return spark.sql(f"select * from {name}")


def test_windowed_counts(seeded_stream, spark, tmp_path):
    out = _drain(windowed_counts(seeded_stream), "win_counts", tmp_path, spark)
    rows = {(r.type): r.n for r in out.collect()}
    # All appends land within one minute-window per type.
    assert rows == {"A": 3, "B": 1}


def test_session_counts(seeded_stream, spark, tmp_path):
    # Session-window aggregation requires append/complete output; with
    # complete, windows emit regardless of watermark progress.
    out = _drain(
        session_counts(seeded_stream), "sess_counts", tmp_path, spark, mode="complete"
    )
    rows = {r.subject: r.n_events for r in out.collect()}
    assert rows == {"s1": 2, "s2": 2}


def test_running_totals_stateful(seeded_stream, spark, tmp_path):
    out = _drain(
        running_totals_stateful(seeded_stream), "run_totals", tmp_path, spark
    )
    # Last emitted total per subject.
    rows = {}
    for r in out.collect():
        rows[r.subject] = max(rows.get(r.subject, 0), r.n_facts)
    assert rows == {"s1": 2, "s2": 2}


def test_dedup_stream_drops_repeats(fs, spark, tmp_path):
    """Streaming dedup on (type, subject): retransmitted facts within
    the watermark horizon are dropped; distinct keys all pass."""
    from factstore_spark.streaming.windows import dedup_stream

    fs.create(STORE)
    fs.append(
        STORE,
        [
            FactInput(type="A", subject="s1"),
            FactInput(type="A", subject="s1"),  # dup key
            FactInput(type="A", subject="s2"),
            FactInput(type="B", subject="s1"),
        ],
    )
    stream = fs.subscribe_stream(STORE, StartPosition.Beginning())
    out = _drain(
        dedup_stream(stream, ["type", "subject"]),
        "dedup_keys",
        tmp_path,
        spark,
        mode="append",
    )
    keys = sorted((r.type, r.subject) for r in out.collect())
    assert keys == [("A", "s1"), ("A", "s2"), ("B", "s1")]


def test_dedup_stream_by_content(fs, spark, tmp_path):
    from factstore_spark.model import FactPayload
    from factstore_spark.streaming.windows import dedup_stream_by_content

    fs.create(STORE)
    fs.append(
        STORE,
        [
            FactInput(type="A", subject="a", payload=FactPayload(b"same text")),
            FactInput(type="B", subject="b", payload=FactPayload(b"same text")),
            FactInput(type="C", subject="c", payload=FactPayload(b"different")),
        ],
    )
    stream = fs.subscribe_stream(STORE, StartPosition.Beginning())
    out = _drain(
        dedup_stream_by_content(stream, text_col="payload.data"),
        "dedup_content",
        tmp_path,
        spark,
        mode="append",
    )
    rows = out.collect()
    assert len(rows) == 2  # one survivor per distinct content
    # Exactly ONE of the duplicate pair {A, B} survives (a <= {A,B,C}
    # subset check would be tautological — the store contains nothing
    # else), and the unique content C always survives.
    assert len({r.type for r in rows} & {"A", "B"}) == 1
    assert "C" in {r.type for r in rows}


def test_dedup_stream_binary_case_sensitive(fs, spark, tmp_path):
    """Binary payloads are hashed as raw bytes: two payloads differing
    only in ASCII case are DISTINCT content and must both survive (a
    string round-trip would lower-case them into the same fingerprint
    and silently drop one — data loss in the ingest dedup stage)."""
    from factstore_spark.model import FactPayload
    from factstore_spark.streaming.windows import dedup_stream_by_content

    fs.create(STORE)
    fs.append(
        STORE,
        [
            FactInput(type="A", subject="a", payload=FactPayload(b"Same Text")),
            FactInput(type="B", subject="b", payload=FactPayload(b"same text")),
            FactInput(type="C", subject="c", payload=FactPayload(b"same text")),
        ],
    )
    stream = fs.subscribe_stream(STORE, StartPosition.Beginning())
    out = _drain(
        dedup_stream_by_content(stream, text_col="payload.data"),
        "dedup_content_bin",
        tmp_path,
        spark,
        mode="append",
    )
    rows = out.collect()
    assert len(rows) == 2  # A and one of {B, C}; never 1
    assert "A" in {r.type for r in rows}


def test_curate_stream_filters_and_dedups(spark, tmp_path):
    """Streaming curation: junk and retransmits never reach the sink."""
    from pyspark.sql import functions as F
    from factstore_spark.streaming.windows import curate_stream

    good = ("the data of the table is a good row and it is the best "
            "table of all the data in the set and the value is good ") * 3
    rows = [
        (0, good + "alpha one", "2024-01-01 10:00:00"),
        (1, good + "alpha one", "2024-01-01 10:02:00"),   # retransmit -> dropped
        (2, "el la de que y " * 30, "2024-01-01 10:03:00"),  # wrong lang
        (3, "the a of", "2024-01-01 10:04:00"),              # too short
        (4, good + "beta two", "2024-01-01 10:05:00"),
    ]
    src_dir = tmp_path / "stream-src"
    src_dir.mkdir()
    batch = spark.createDataFrame(rows, "doc_id long, text string, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    batch.write.parquet(str(src_dir / "part0"))
    stream = spark.readStream.schema(batch.schema).parquet(str(src_dir / "*"))
    out = _drain(
        curate_stream(stream, time_col="ts"), "curated_stream", tmp_path, spark,
        mode="append",
    )
    got = {r.doc_id for r in out.collect()}
    # junk (2: wrong lang, 3: too short) never lands; exactly ONE of the
    # retransmit twins survives (dropDuplicatesWithinWatermark keeps an
    # arbitrary member of the duplicate set, not a deterministic one)
    assert 4 in got and len(got & {0, 1}) == 1
    assert got <= {0, 1, 4}


def test_join_streams_matches_batch_band_join(spark, tmp_path):
    """Stream-stream time-band join == the same band join run in batch
    over identical data (inner and left_outer): clicks attach to
    purchases of the same user within 10 minutes."""
    import datetime as dt

    from pyspark.sql import Row
    from factstore_spark.streaming.windows import join_streams

    def ts(m):
        return dt.datetime(2024, 1, 1, 12, m, 0)

    clicks = [Row(user="u1", c_ts=ts(0), click_id=1),
              Row(user="u1", c_ts=ts(30), click_id=2),
              Row(user="u2", c_ts=ts(5), click_id=3),
              Row(user="u3", c_ts=ts(1), click_id=4)]
    buys = [Row(user="u1", p_ts=ts(4), buy_id=10),    # within 10m of click 1
            Row(user="u1", p_ts=ts(29), buy_id=11),   # within 10m of click 2
            Row(user="u2", p_ts=ts(45), buy_id=12),   # 40m after click 3: out
            Row(user="u9", p_ts=ts(6), buy_id=13)]    # no clicks
    cdir, bdir = str(tmp_path / "clicks"), str(tmp_path / "buys")
    spark.createDataFrame(clicks).write.parquet(cdir)
    spark.createDataFrame(buys).write.parquet(bdir)

    batch_c, batch_b = spark.read.parquet(cdir), spark.read.parquet(bdir)

    for how in ("inner", "left_outer"):
        cs = spark.readStream.schema(batch_c.schema).parquet(cdir)
        bs = spark.readStream.schema(batch_b.schema).parquet(bdir)
        joined = join_streams(
            cs, bs, key="user", left_time="c_ts", right_time="p_ts",
            within="10 minutes", watermark="10 minutes", how=how,
        ).select("click_id", "buy_id")
        name = f"ssj_{how}"
        q = (
            joined.writeStream.format("memory").queryName(name)
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / f"ck-{how}"))
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.click_id, r.buy_id) for r in spark.table(name).collect()
        )
        from pyspark.sql import functions as F

        bb = batch_b.withColumnRenamed("user", "_rkey")
        want = sorted(
            (r.click_id, r.buy_id)
            for r in batch_c.join(
                bb,
                (batch_c.user == bb._rkey)
                & (bb.p_ts >= F.expr("c_ts - INTERVAL 10 minutes"))
                & (bb.p_ts <= F.expr("c_ts + INTERVAL 10 minutes")),
                how,
            ).collect()
        )
        assert got == want, (how, got, want)
        assert (1, 10) in got and (2, 11) in got
        if how == "inner":
            assert all(c != 3 for c, _ in got)  # out-of-band purchase
        else:
            assert (3, None) in got and (4, None) in got


def test_running_totals_stateful_honors_key_col_name(seeded_stream, spark, tmp_path):
    """A non-default key column keeps its OWN name in the output — a
    hardcoded 'subject' label over type values would silently mislabel
    downstream joins."""
    out = _drain(
        running_totals_stateful(seeded_stream, key_col="type"),
        "run_totals_type", tmp_path, spark,
    )
    assert "type" in out.columns and "subject" not in out.columns
    rows = {}
    for r in out.collect():
        rows[r.type] = max(rows.get(r.type, 0), r.n_facts)
    assert sum(rows.values()) == 4


# ---------------------------------------------------------------------------
# SS == batch: OHLC bars and hopping windows over the events table
# ---------------------------------------------------------------------------

SF_EVENTS = "/root/testdata/sf0.001"


def _events_stream(spark, sf_dir=SF_EVENTS):
    """The events table as a file-source STREAM, with the same ts
    normalization load_events applies to the batch side. The file
    source wants a DIRECTORY; testdata is read-only, so the single
    events.parquet is symlinked into a scratch dir."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    path = sf_dir + "/events.parquet"
    stream_dir = tempfile.mkdtemp(prefix="events-stream-")
    os.symlink(path, os.path.join(stream_dir, "events.parquet"))
    schema = spark.read.parquet(path).schema
    src = spark.readStream.schema(schema).parquet(stream_dir)
    ts_type = {f.name: f.dataType.simpleString() for f in schema}["ts"]
    if ts_type == "bigint":  # TIMESTAMP(NANOS) under nanosAsLong
        src = src.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":
        # UTC session (conftest): wall-clock-as-UTC == instant
        src = src.withColumn("ts", F.col("ts").cast("timestamp"))
    return src.withColumn(
        "value_cents", F.floor(F.col("value") * F.lit(100)).cast("long")
    )


def test_streaming_ohlc_equals_batch(spark, tmp_path):
    """ohlc_bars_stream over the events file-stream must produce the
    batch events_ohlc_bars result exactly — same bars, same open/close
    tie-breaks — across whatever micro-batch boundaries the trigger
    picks."""
    from pyspark.sql import functions as F

    from factstore_spark.queries import events_ohlc_bars
    from factstore_spark.streaming.windows import ohlc_bars_stream

    want = {
        (r.user_id, r.minute_us): (
            r.open_cents, r.high_cents, r.low_cents, r.close_cents,
            r.n_trades, r.volume_cents,
        )
        for r in events_ohlc_bars(spark, SF_EVENTS).collect()
    }
    out = _drain(
        ohlc_bars_stream(_events_stream(spark)), "ohlc_ss", tmp_path, spark,
        mode="complete",
    )
    got = {
        (r.user_id, r.bar_us): (r.open, r.high, r.low, r.close, r.n_trades, r.volume)
        for r in out.select(
            "user_id", F.unix_micros("bar_start").alias("bar_us"),
            "open", "high", "low", "close", "n_trades", "volume",
        ).collect()
    }
    assert got == want and want  # `and want`: empty==empty must not pass


def test_streaming_hopping_equals_batch(spark, tmp_path):
    """hopping_counts (native window(ts, 5m, 1m)) must equal the batch
    events_sliding_windows explode-by-slide-ratio expansion, window for
    window."""
    from pyspark.sql import functions as F

    from factstore_spark.queries import events_sliding_windows
    from factstore_spark.streaming.windows import hopping_counts

    # sf0.01, not sf0.001: at sf0.001 NO 5-minute window accrues 3
    # events of one type, both sides are empty, and the equivalence
    # would pass vacuously (it did, until the `and want` guard below).
    sf = "/root/testdata/sf0.01"
    want = {
        (r.window_start_us, r.event_type): (r.n, r.value_cents)
        for r in events_sliding_windows(spark, sf).collect()
    }
    out = _drain(
        hopping_counts(_events_stream(spark, sf)), "hop_ss", tmp_path, spark,
        mode="complete",
    )
    got = {
        (r.ws_us, r.event_type): (r.n, r.value_sum)
        for r in out.filter(F.col("n") >= 3)  # the batch entry's HAVING
        .select(
            F.unix_micros("window_start").alias("ws_us"), "event_type", "n", "value_sum"
        ).collect()
    }
    assert got == want and want  # `and want`: empty==empty must not pass


def test_streaming_type_transitions_equals_batch(spark, tmp_path):
    """type_transitions_stream's per-key stateful lag must reproduce
    the batch events_type_transitions edge counts exactly over the
    events file-stream."""
    from pyspark.sql import functions as F

    from factstore_spark.queries import events_type_transitions
    from factstore_spark.streaming.windows import type_transitions_stream

    want = {
        (r.from_type, r.to_type): r.n
        for r in events_type_transitions(spark, SF_EVENTS).collect()
    }
    out = _drain(
        type_transitions_stream(_events_stream(spark)), "trans_ss", tmp_path, spark,
        mode="append",
    )
    got = {
        (r.from_type, r.to_type): r.n
        for r in out.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == want and want


def test_streaming_type_transitions_state_carries_across_batches(spark, tmp_path):
    """The cross-batch contract: with the events time-split into two
    files and maxFilesPerTrigger=1 (so availableNow processes them as
    separate micro-batches, oldest first), the carried last-event
    state must stitch each key's boundary pair — total edges still
    equal the batch lag."""
    import time as _time

    from pyspark.sql import functions as F

    from factstore_spark.queries import events_type_transitions, load_events
    from factstore_spark.streaming.windows import type_transitions_stream

    ev = load_events(spark, SF_EVENTS).select(
        "user_id", "event_type", F.expr("ts_ns div 1000").alias("ts_us"), "event_id"
    )
    cut = ev.approxQuantile("ts_us", [0.5], 0.001)[0]
    src_dir = tmp_path / "split-events"
    src_dir.mkdir()
    early = ev.filter(F.col("ts_us") <= cut)
    late = ev.filter(F.col("ts_us") > cut)
    early.coalesce(1).write.parquet(str(src_dir / "batch0"))
    _time.sleep(1.1)  # distinct mtimes: the file source orders oldest-first
    late.coalesce(1).write.parquet(str(src_dir / "batch1"))

    schema = early.schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    out = _drain(
        type_transitions_stream(src), "trans_split_ss", tmp_path, spark,
        mode="append",
    )
    got = {
        (r.from_type, r.to_type): r.n
        for r in out.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    want = {
        (r.from_type, r.to_type): r.n
        for r in events_type_transitions(spark, SF_EVENTS).collect()
    }
    assert got == want and want


def test_streaming_rolling_dau_equals_batch(spark, tmp_path):
    """rolling_dau_stream (window fan-out + dropDuplicates +
    windowed count — chained stateful operators, exact not HLL) must
    equal the batch events_rolling_dau (day, dau) pairs."""
    from factstore_spark.queries import events_rolling_dau
    from factstore_spark.streaming.windows import rolling_dau_stream

    want = {
        r.day: r.dau for r in events_rolling_dau(spark, SF_EVENTS).collect()
    }
    out = _drain(
        rolling_dau_stream(_events_stream(spark)), "dau_ss", tmp_path, spark,
        mode="complete",
    )
    got = {r.day: r.dau for r in out.collect()}
    assert got == want and want


def test_streaming_heavy_hitters_mg_bounds(spark, tmp_path):
    """Misra-Gries contract over the events stream, split into two
    micro-batches (maxFilesPerTrigger=1) so the per-batch summary
    reduction and cross-batch counter merge both execute: estimates
    never overcount, undercount by <= the emitted max_undercount, any
    value with true count > max_undercount is present, and state holds
    <= m counters per key."""
    import time as _time

    from pyspark.sql import functions as F

    from factstore_spark.queries import load_events
    from factstore_spark.streaming.windows import heavy_hitters_stream

    M = 16
    ev = load_events(spark, SF_EVENTS).select(
        "event_type", F.col("user_id").cast("string").alias("user_id"), "event_id"
    )
    src_dir = tmp_path / "hh-events"
    src_dir.mkdir()
    half = ev.approxQuantile("event_id", [0.5], 0.001)[0]
    ev.filter(F.col("event_id") <= half).coalesce(1).write.parquet(str(src_dir / "b0"))
    _time.sleep(1.1)
    ev.filter(F.col("event_id") > half).coalesce(1).write.parquet(str(src_dir / "b1"))
    src = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src_dir / "*"))
    )
    out = _drain(
        heavy_hitters_stream(src, key_col="event_type", value_col="user_id", m=M),
        "hh_ss", tmp_path, spark, mode="update",
    )
    rows = out.collect()
    assert rows
    # final snapshot per key = rows from its max n_seen emission
    latest_n = {}
    for r in rows:
        latest_n[r.event_type] = max(latest_n.get(r.event_type, 0), r.n_seen)
    final = [r for r in rows if r.n_seen == latest_n[r.event_type]]
    exact = {
        (r.event_type, r.user_id): r.n
        for r in ev.groupBy("event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_per_key = {}
    for (k, _), n in exact.items():
        n_per_key[k] = n_per_key.get(k, 0) + n
    by_key = {}
    for r in final:
        by_key.setdefault(r.event_type, []).append(r)
    # Every key with events must appear in the stream output — the
    # per-key loops below iterate over EMITTED keys, so without this a
    # whole key silently dropped by the operator would pass green.
    assert set(by_key) == set(n_per_key), (set(by_key), set(n_per_key))
    for k, ests in by_key.items():
        assert len(ests) <= M, (k, len(ests))
        assert ests[0].n_seen == n_per_key[k], "n_seen must count every event"
        d = ests[0].max_undercount
        present = {r.value: r.est for r in ests}
        for (ek, v), true_n in exact.items():
            if ek != k:
                continue
            if v in present:
                assert present[v] <= true_n, "MG must never overcount"
                assert present[v] >= true_n - d, "undercount beyond bound"
            else:
                assert true_n <= d, f"missed a heavy value: {v} ({true_n} > d={d})"


def test_streaming_type_transitions_late_batch_never_regresses_state(spark, tmp_path):
    """A micro-batch that is entirely OLDER than the carried state must
    not rewind last-seen: subsequent in-order events chain off the
    newest event ever observed, not the stale late one."""
    import time as _time

    from pyspark.sql import functions as F

    from factstore_spark.streaming.windows import type_transitions_stream

    src = tmp_path / "late-events"
    src.mkdir()
    schema = "user_id string, event_type string, ts_us long, event_id long"

    def write(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(
            str(src / name)
        )
        _time.sleep(1.1)

    write("b0", [("u", "A", 100, 1)])
    write("b1", [("u", "B", 50, 0)])   # purely-late batch
    write("b2", [("u", "C", 150, 2)])  # in-order again
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    out = _drain(
        type_transitions_stream(stream), "late_trans_ss", tmp_path, spark,
        mode="append",
    )
    edges = sorted((r.from_type, r.to_type) for r in out.collect())
    # A->B is the documented best-effort chaining of the late batch;
    # the regression under test is C chaining off B instead of A.
    assert ("A", "C") in edges, edges
    assert ("B", "C") not in edges, edges


def test_streaming_type_transitions_survives_null_timestamps(spark, tmp_path):
    """A null-ts event must be dropped, not NaN-poison the stateful
    chain and kill the query on every replay."""
    from pyspark.sql import functions as F

    from factstore_spark.streaming.windows import type_transitions_stream

    src = tmp_path / "null-ts-events"
    src.mkdir()
    schema = "user_id string, event_type string, ts_us long, event_id long"
    spark.createDataFrame(
        [("u", "A", 100, 1), ("u", "X", None, 9), ("u", "B", 200, 2)], schema
    ).coalesce(1).write.parquet(str(src / "b0"))
    stream = (
        spark.readStream.schema(schema)
        .parquet(str(src / "*"))
        .withColumn("ts", F.timestamp_micros(F.col("ts_us")))
    )
    out = _drain(
        type_transitions_stream(stream), "nullts_trans_ss", tmp_path, spark,
        mode="append",
    )
    edges = sorted((r.from_type, r.to_type) for r in out.collect())
    assert edges == [("A", "B")]


def test_streaming_sessionize_equals_batch(spark, tmp_path):
    """Native session_window (30 min gap) over the events file-stream
    must reproduce the batch events_sessionize lag+cumsum result —
    per user, same session count and same event total. (The two
    formulations differ only on a gap of EXACTLY 30 minutes — batch
    `gap > 30m` starts a session, session_window splits at `>= 30m`;
    microsecond timestamps make an exact tie absent from the data, and
    a tie would fail this assertion loudly rather than silently.)"""
    from pyspark.sql import functions as F

    from factstore_spark.queries import events_sessionize
    from factstore_spark.streaming.windows import session_counts

    want = {
        (r.user_id): (r.n_sessions, r.n_events)
        for r in events_sessionize(spark, SF_EVENTS).collect()
    }
    out = _drain(
        session_counts(
            _events_stream(spark), time_col="ts", key_col="user_id",
            gap="30 minutes", watermark="2 hours",
        ),
        "sess_ss", tmp_path, spark, mode="complete",
    )
    got = {
        r.user_id: (r.n_sessions, r.n_events)
        for r in out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
        .collect()
    }
    assert got == want and want


def test_running_totals_stateful_bigint_key(spark, tmp_path):
    """A numeric grouping key must work: the output schema declares the
    key as string, so the operator casts the grouping column first —
    otherwise Arrow dies on int64-vs-string at the first micro-batch."""
    from pyspark.sql import functions as F

    out = _drain(
        running_totals_stateful(_events_stream(spark), key_col="user_id"),
        "rt_bigint", tmp_path, spark, mode="update",
    )
    got = {r.user_id: r.n_facts for r in out.groupBy("user_id")
           .agg(F.max("n_facts").alias("n_facts")).collect()}
    want = {
        str(r.user_id): r.n
        for r in spark.read.parquet(SF_EVENTS + "/events.parquet")
        .groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want and want


def test_dedup_stream_by_content_preserves_caller_fp_column(fs, spark, tmp_path):
    """A caller-owned '_content_fp' column (e.g. a prior stage's audit
    output) must survive the content dedup untouched."""
    from pyspark.sql import functions as F

    from factstore_spark import FactInput, FactPayload, StartPosition
    from factstore_spark.streaming.windows import dedup_stream_by_content

    fs.create("fp-store")
    fs.append("fp-store", [
        FactInput(type="T", subject="s1", payload=FactPayload(data=b"one")),
        FactInput(type="T", subject="s2", payload=FactPayload(data=b"one")),
        FactInput(type="T", subject="s3", payload=FactPayload(data=b"two")),
    ])
    stream = fs.subscribe_stream("fp-store", StartPosition.Beginning()).withColumn(
        "_content_fp", F.lit("caller-owned")
    )
    out = _drain(
        dedup_stream_by_content(stream, text_col="payload.data"),
        "fp_keep", tmp_path, spark, mode="append",
    )
    rows = out.collect()
    assert len(rows) == 2  # b"one" deduped
    assert all(r._content_fp == "caller-owned" for r in rows)


def test_streaming_quality_gate_equals_batch(spark, tmp_path):
    """quality_gate_stream with an offline-trained model must score a
    document file-stream EXACTLY as the batch transform scores the
    same corpus — the model is a pure map, so micro-batch boundaries
    cannot move a single prediction."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from factstore_spark.operators.quality_model import (
        _featurize,
        train_quality_classifier,
    )
    from factstore_spark.streaming.windows import quality_gate_stream

    docs_path = SF_EVENTS + "/documents.parquet"
    docs = spark.read.parquet(docs_path)
    model = train_quality_classifier(docs.filter(F.col("doc_id") % 2 == 0))

    want = {
        r.doc_id: int(r.prediction)
        for r in model.transform(_featurize(docs, "text"))
        .select("doc_id", "prediction")
        .collect()
    }

    stream_dir = tempfile.mkdtemp(prefix="docs-stream-")
    os.symlink(docs_path, os.path.join(stream_dir, "documents.parquet"))
    stream = spark.readStream.schema(docs.schema).parquet(stream_dir)
    out = _drain(
        quality_gate_stream(stream, model), "qgate_ss", tmp_path, spark,
        mode="append",
    )
    got = {r.doc_id: int(r.keep_pred) for r in out.select("doc_id", "keep_pred").collect()}
    assert got == want and want

    # keep_only drops rejects and restores the input schema
    kept = _drain(
        quality_gate_stream(
            spark.readStream.schema(docs.schema).parquet(stream_dir),
            model,
            keep_only=True,
        ),
        "qgate_keep_ss", tmp_path, spark, mode="append",
    )
    assert kept.columns == docs.columns
    assert {r.doc_id for r in kept.select("doc_id").collect()} == {
        d for d, p in want.items() if p == 1
    }


def test_streaming_quality_gate_preserves_caller_columns(spark, tmp_path):
    """A stream already carrying a column named like a feature
    (n_tokens, quality_score, ...) must get it back UNTOUCHED — the
    gate computes features under the packed-struct projection, never
    over caller-owned names (same contract as
    dedup_stream_by_content's caller-fp test)."""
    import os
    import tempfile

    from pyspark.sql import functions as F

    from factstore_spark.operators.quality_model import train_quality_classifier
    from factstore_spark.streaming.windows import quality_gate_stream

    docs = spark.read.parquet(SF_EVENTS + "/documents.parquet").select(
        "doc_id", "text",
        F.lit(-7).cast("long").alias("n_tokens"),      # caller-owned!
        F.lit(0.5).alias("quality_score"),             # caller-owned!
    )
    model = train_quality_classifier(spark.read.parquet(SF_EVENTS + "/documents.parquet"))
    d = tempfile.mkdtemp(prefix="docs-clash-")
    docs.write.mode("overwrite").parquet(os.path.join(d, "docs.parquet"))
    stream = spark.readStream.schema(docs.schema).parquet(os.path.join(d, "docs.parquet"))
    out = _drain(quality_gate_stream(stream, model), "qgate_clash_ss", tmp_path, spark, mode="append")
    rows = out.collect()
    assert rows
    assert all(r.n_tokens == -7 and r.quality_score == 0.5 for r in rows)
    assert out.columns == ["doc_id", "text", "n_tokens", "quality_score", "keep_pred"]
