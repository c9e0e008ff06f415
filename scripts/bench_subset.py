"""Like-for-like variance study: rerun exactly the round-2 bench
subset (27 queries + ingest + stream_catchup) on a quiet host, N
repetitions each, and print per-query min/median — the comparison the
round-3 verdict asked for to separate host noise from real drift.

Usage: python scripts/bench_subset.py [reps=3] [sf_dir=/root/testdata/sf0.1]
Prints one JSON line: {"queries": {name: {"median": s, "min": s}}, ...}
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from factstore_spark.queries import REGISTRY
from factstore_spark.session import get_spark

R2_QUERIES = [
    "fs_find_by_tag_query", "fs_replay_bounded", "q1_pricing_summary",
    "q3_top_orders", "q5_region_revenue", "events_sessionize",
    "events_topk_per_user", "events_minute_rollup", "events_type_stats",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_ngram_jaccard_capped",
    "dedup_clusters", "dedup_embedding_lsh", "dedup_minhash_lsh",
    "dedup_simhash", "text_token_stats", "text_quality", "text_fingerprint",
    "text_top_ngrams", "curation_contamination", "ann_cosine_topk",
    "ann_ivf_topk", "ann_pq_topk", "multimodal_meta",
]


def main() -> None:
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    spark = get_spark(app_name="bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    for t in ("events", "lineitem", "orders", "customer", "documents", "embeddings"):
        spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
    import pandas as pd  # noqa: F401

    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    out = {}
    for name in R2_QUERIES:
        fn, _ = REGISTRY[name]
        times = []
        for _ in range(reps):
            t0 = time.time()
            fn(spark, sf_dir).count()
            times.append(time.time() - t0)
        out[name] = {
            "median": round(statistics.median(times), 3),
            "min": round(min(times), 3),
        }
        print(f"# {name}: median {out[name]['median']}s min {out[name]['min']}s",
              file=sys.stderr)

    # write-path legs, same shape as bench.py
    import shutil
    import tempfile

    from factstore_spark.model import StartPosition
    from factstore_spark.sources.events import events_as_facts
    from factstore_spark.store import FactStore

    ingest_t, stream_t = [], []
    stream_timeouts = 0
    for r in range(reps):
        root = tempfile.mkdtemp(prefix="bench-subset-")
        try:
            fs = FactStore(spark, root)
            fs.create("b")
            facts = events_as_facts(spark, sf_dir).drop("id", "appended_at")
            t0 = time.time()
            fs.append_dataframe("b", facts)
            fs.facts_df("b").count()
            ingest_t.append(time.time() - t0)
            t0 = time.time()
            q = (
                fs.subscribe_stream("b", StartPosition.Beginning())
                .writeStream.format("noop")
                .option("checkpointLocation", os.path.join(root, "ckpt"))
                .trigger(availableNow=True)
                .start()
            )
            ok = q.awaitTermination(300)
            if not ok:
                q.stop()
            stream_t.append(time.time() - t0)
            if not ok:
                stream_timeouts += 1
        finally:
            shutil.rmtree(root, ignore_errors=True)
        print(f"# ingest/stream rep {r}: {ingest_t[-1]:.3f}/{stream_t[-1]:.3f}s",
              file=sys.stderr)
    out["ingest_events_bulk"] = {
        "median": round(statistics.median(ingest_t), 3),
        "min": round(min(ingest_t), 3),
    }
    out["stream_catchup"] = {
        "median": round(statistics.median(stream_t), 3),
        "min": round(min(stream_t), 3),
    }
    if stream_timeouts:
        # Timed-out reps keep their real elapsed cost in the stats; the
        # count is surfaced so a skewed median is never read as healthy.
        out["stream_catchup"]["timeouts"] = stream_timeouts
    print(json.dumps({"reps": reps, "sf_dir": sf_dir, "queries": out}))


if __name__ == "__main__":
    main()
