"""K=100 decade legs for the STREAMING paths (VERDICT r10 next-round
#2): the K=100 table in docs/SCALE.md covers minhash/PageRank/IVM/
Bloom; this probe extends it to the three streaming stories, each run
at K=10 and K=100 over the sf1_battery_bench amplification (events
1M -> 10M facts, documents 50k -> 500k):

1. **dedup stream sink**: bootstrap the minhash index over the 99%%
   archive slice (timed separately — an index build is O(archive) by
   definition), then stream the 1%% increment through
   start_dedup_stream as three availableNow micro-batches. The claim
   under test: per-batch cost is probe-capped O(batch), NOT
   O(archive) — sink wall at K=100 must sit far under 10x the K=10
   wall even though the archive is 10x.
2. **subscribe_stream catch-up** (the scale path): bulk-ingest the
   amplified events as facts, then drain a Beginning subscription to
   a memory sink with availableNow and count every fact. Linear in
   the store (it reads everything once): ratio ~<= 10x + overhead.
3. **replay + live tail vs store size**: bounded replay measured as
   time-to-first-batch plus a FIXED 300k-fact drain (the sort before
   the iterator is O(store) — reported, not hidden; the drain rate
   itself must be flat), and the subscribe generator's idle-tail
   delivery latency (30 probe appends, poll 100 ms, watch on and off)
   which must be STORE-SIZE-INDEPENDENT (tail prune: a poll opens
   only commits past the cursor).

Usage: python scripts/k100_stream_probe.py [k_small] [k_big] [base_out_dir]
Prints one markdown table at the end. Results -> docs/SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from factstore_spark import FactStore  # noqa: E402
from factstore_spark.model import FactInput, StartPosition  # noqa: E402
from factstore_spark.session import get_spark  # noqa: E402
from sf1_battery_bench import ensure_build  # noqa: E402

Row = tuple[str, float, int]


def leg_stream_sink(spark, out: str) -> list[Row]:
    from factstore_spark.operators.dedup import (
        start_dedup_stream,
        write_minhash_index,
    )

    docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
    archive = docs.filter(F.col("doc_id") % 100 != 0)
    inc = docs.filter(F.col("doc_id") % 100 == 0)
    root = tempfile.mkdtemp(prefix="k100-sink-")
    rows: list[Row] = []
    try:
        idx = os.path.join(root, "idx")
        t0 = time.time()
        write_minhash_index(archive, idx)
        rows.append(("sink_index_bootstrap", time.time() - t0, archive.count()))
        src = os.path.join(root, "src")
        inc.repartition(3).write.parquet(src)
        stream = spark.readStream.schema(docs.schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(src)
        t0 = time.time()
        q = start_dedup_stream(
            stream, idx, os.path.join(root, "pairs"),
            os.path.join(root, "ckpt"), available_now=True,
        )
        q.awaitTermination()
        wall = time.time() - t0
        n_pairs = spark.read.parquet(os.path.join(root, "pairs")).count()
        rows.append(("sink_stream_3batches", wall, n_pairs))
        return rows
    finally:
        shutil.rmtree(root, ignore_errors=True)


def _ingest_store(spark, out: str, root: str) -> tuple[FactStore, int]:
    from factstore_spark.sources.events import events_as_facts

    fs = FactStore(spark, root)
    fs.create("k100")
    facts = events_as_facts(spark, out).drop("id", "appended_at")
    fs.append_dataframe("k100", facts)
    n = fs.facts_df("k100").count()
    return fs, n


def leg_catchup_and_tail(spark, out: str) -> list[Row]:
    rows: list[Row] = []
    root = tempfile.mkdtemp(prefix="k100-store-")
    try:
        t0 = time.time()
        fs, n = _ingest_store(spark, out, root)
        rows.append(("store_bulk_ingest", time.time() - t0, n))

        # -- subscribe_stream availableNow catch-up (scale path) --------
        stream = fs.subscribe_stream("k100", StartPosition.Beginning())
        name = f"k100catch_{int(time.time())}"
        t0 = time.time()
        q = (
            stream.groupBy().count().writeStream.outputMode("complete")
            .format("memory").queryName(name)
            .trigger(availableNow=True)
            .option(
                "checkpointLocation", os.path.join(root, "ckpt-catch")
            )
            .start()
        )
        q.awaitTermination()
        got = spark.sql(f"SELECT count FROM {name}").collect()[0][0]
        assert got == n, (got, n)
        rows.append(("stream_catchup_all", time.time() - t0, int(got)))

        # -- bounded replay: TTFB + fixed 300k drain ---------------------
        target = 300_000
        gen = fs.replay("k100", batch_size=10_000)
        t0 = time.time()
        drained = 0
        ttfb = None
        for batch in gen:
            if ttfb is None:
                ttfb = time.time() - t0
            drained += len(batch)
            if drained >= target:
                break
        rows.append(("replay_ttfb", ttfb or -1.0, n))
        rows.append(("replay_drain_300k", time.time() - t0 - (ttfb or 0),
                     drained))

        # -- live-tail latency vs store size (poll + watch) --------------
        for watch in (False, True):
            committed: dict[str, float] = {}
            received: dict[str, float] = {}
            done = threading.Event()

            def sub():
                gen = fs.subscribe(
                    "k100", StartPosition.End(), poll_interval=0.1,
                    watch=watch,
                )
                for batch in gen:
                    now = time.time()
                    for f in batch:
                        received[f.id] = now
                    if len(received) >= 30:
                        done.set()
                        return

            th = threading.Thread(target=sub, daemon=True)
            th.start()
            time.sleep(0.3)
            for i in range(30):
                r = fs.append("k100", FactInput(type="Probe", subject=f"s{i}"))
                committed[r.fact_ids[0]] = time.time()
                time.sleep(0.02)
            done.wait(timeout=30)
            lags = sorted(
                (received[k] - committed[k]) * 1000.0
                for k in committed
                if k in received
            )
            p50 = lags[len(lags) // 2] if lags else -1.0
            # stored in MILLISECONDS (the name says _ms): dividing into
            # seconds and printing %.2f would round the single-digit-ms
            # watch signal — the very thing this leg measures — to 0.00
            rows.append(
                (f"tail_p50_{'watch' if watch else 'poll100'}_ms",
                 p50, len(lags))
            )
        return rows
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    k_small = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    k_big = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    base = sys.argv[3] if len(sys.argv) > 3 else "/tmp/k100_probe"
    spark = get_spark(app_name="k100-stream-probe")
    results: dict[int, dict[str, tuple[float, int]]] = {}
    for k in (k_small, k_big):
        out = f"{base}_k{k}"
        ensure_build(spark, k, out)
        for t in ["events", "documents"]:
            spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        legs: dict[str, tuple[float, int]] = {}
        for fn in (leg_stream_sink, leg_catchup_and_tail):
            for name, sec, nrows in fn(spark, out):
                legs[name] = (sec, nrows)
                print(f"  K={k} {name}: {sec:.2f} (s, or ms for *_ms legs; rows={nrows:,})",
                      flush=True)
        results[k] = legs
    print(f"\n| leg (s; *_ms legs in ms) | K={k_small} | K={k_big} | ratio "
          f"({k_big // k_small}x data) | rows at K={k_big} |")
    print("|---|---|---|---|---|")
    for name in results[k_small]:
        s, _ = results[k_small][name]
        b, nb = results[k_big][name]
        print(f"| {name} | {s:.2f} | {b:.2f} | {b / max(s, 1e-9):.1f}x | {nb:,} |")
    spark.stop()


if __name__ == "__main__":
    main()
