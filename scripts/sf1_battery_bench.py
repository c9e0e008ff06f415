"""sf1-ish bench of the top-20 battery entries (VERDICT r5 #8).

The per-operator scale probe (scale_probe.py) exercises operators in
isolation; this script times the ACTUAL registry entries — whole query
plans with their join fan-ins, AQE decisions and shuffle sizes — at
10x sf0.1 (~6M lineitem / 1M events / 50k docs / 20k vectors, i.e.
sf1-ish row counts).

Amplification keeps EVERY column and keeps join keys consistent:

- orders:   o_orderkey -> o_orderkey*K + rep (all other cols copied,
            o_orderdate copied — day-granular filters)
- lineitem: l_orderkey -> l_orderkey*K + rep per replica — the
            orders<->lineitem join stays key-consistent, per-order
            line counts unchanged, per-part/supplier volume grows Kx
            (the join-fan-in axis this bench exists to observe)
- events/documents/embeddings: same replica schemes as
  scale_probe.py, but preserving props/lang/source/n_chars/label
- region/nation/customer/supplier/part: copied as-is (dimensions; a
  true sf1 would also grow customer/part 10x — per-key fan-in here is
  therefore 10x sf1's, which only makes the skew test harsher)

Usage: python scripts/sf1_battery_bench.py [K] [out_dir] [entry ...]
Extra args select specific registry entries instead of TOP20 (reuses
an existing out_dir build when present). Prints one markdown table row
per entry (one run each, after a scan warm-up), for docs/SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from factstore_spark.queries import REGISTRY  # noqa: E402
from factstore_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
DIMS = ["region", "nation", "customer", "supplier", "part"]

TOP20 = [
    "dedup_embedding_recall",
    "dedup_simhash_recall",
    "dedup_minhash_recall",
    "text_heavy_tokens",
    "dedup_embedding_exact",
    "lineitem_price_deciles",
    "q2_min_cost_supplier",
    "customer_segment_set_ops",
    "q21_waiting_suppliers",
    "multimodal_features_topk",
    "events_value_quantile_cube",
    "text_tfdf_keywords",
    "q20_promotion_suppliers",
    "q11_important_parts",
    "events_asof_join_bucketed",
    "events_value_median",
    "events_sliding_windows",
    "q17_small_quantity_revenue",
    "events_props_rollup",
    "nation_order_full_outer",
]


def _reps(k):
    return F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep")


def build(spark, k: int, out: str) -> None:
    if os.path.isdir(out):
        shutil.rmtree(out)
    os.makedirs(out)
    for t in DIMS:
        shutil.copy(os.path.join(SF_DIR, f"{t}.parquet"), os.path.join(out, f"{t}.parquet"))

    def w(df, name):
        df.coalesce(8).write.mode("overwrite").parquet(os.path.join(out, f"{name}.parquet"))

    orders = spark.read.parquet(os.path.join(SF_DIR, "orders.parquet"))
    w(
        orders.select("*", _reps(k)).select(
            (F.col("o_orderkey") * k + F.col("rep")).alias("o_orderkey"),
            "o_custkey", "o_orderstatus", "o_totalprice",
            "o_orderdate",  # date filters are day-granular; replicas share it
            "o_orderpriority",
        ),
        "orders",
    )
    li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
    w(
        li.select("*", _reps(k)).select(
            (F.col("l_orderkey") * k + F.col("rep")).alias("l_orderkey"),
            "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
            "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
            "l_linestatus", "l_shipdate",
        ),
        "lineitem",
    )
    ev = spark.read.parquet(os.path.join(SF_DIR, "events.parquet"))
    w(
        ev.select("*", _reps(k)).select(
            (F.col("event_id") * k + F.col("rep")).alias("event_id"),
            F.timestamp_micros(
                F.unix_micros(F.col("ts").cast("timestamp")) + F.col("rep")
            ).alias("ts"),
            "user_id", "event_type", "value", "props",
        ),
        "events",
    )
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    w(
        docs.select("*", _reps(k)).select(
            (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" salt"), F.col("rep").cast("string")).alias("text"),
            "lang", "source",
            # ' salt' is 5 chars + however many digits rep has — a
            # constant +6 under-counts once K > 10 (rep >= 10 is 2 digits).
            (
                F.col("n_chars") + F.lit(5)
                + F.length(F.col("rep").cast("string"))
            ).alias("n_chars"),
        ),
        "documents",
    )
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))

    def jitter(x, i):
        h = F.xxhash64(
            F.col("vec_id").cast("string"), F.col("rep").cast("string"), i.cast("string")
        )
        return x.cast("double") + (F.pmod(h, F.lit(2001)) - 1000).cast("double") / 20000.0

    w(
        emb.select("*", _reps(k)).select(
            (F.col("vec_id") * k + F.col("rep")).alias("vec_id"),
            F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(0), F.size(F.col("embedding")) - 1),
                jitter,
            ).cast("array<float>").alias("embedding"),
            "label",
        ),
        "embeddings",
    )


def ensure_build(spark, k: int, out: str, reuse: bool = True) -> None:
    """Build (or reuse) a K-amplified corpus with the crash-safe marker
    protocol — the ONE home of this logic (also used by k100_probe):
    reuse only a build stamped with the SAME K, and invalidate the
    marker BEFORE rebuilding so a crash mid-rebuild can never leave the
    old K stamp over a half-overwritten mixed-K corpus (either way a
    later run would corrupt the SCALE.md ratios)."""
    k_marker = os.path.join(out, "_k.txt")
    if reuse and os.path.isdir(out):
        try:
            with open(k_marker) as fh:
                if int(fh.read().strip()) == k:
                    print(f"reusing existing K={k} build at {out}", flush=True)
                    return
        except (OSError, ValueError):
            pass
    t0 = time.time()
    try:
        os.remove(k_marker)
    except OSError:
        pass
    build(spark, k, out)
    with open(k_marker, "w") as fh:
        fh.write(str(k))
    print(f"amplified K={k} -> {out} in {time.time() - t0:.1f}s", flush=True)


def main():
    """Usage:
      python scripts/sf1_battery_bench.py [K] [out_dir] [entry ...]
      python scripts/sf1_battery_bench.py [K] [out_dir] --all [json_out]

    ``--all`` (r12 task #5) times EVERY registry entry at sf0.1 and at
    the K-amplified build and writes a JSON artifact
    ({entry: {sf01_s, sf1_s, ratio, rows_sf1, err}}) — the committed
    BENCH_SF1_r{N}.json that tests/test_sf1_battery_slow.py asserts
    growth ceilings against."""
    import json

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1_battery"
    all_mode = len(sys.argv) > 3 and sys.argv[3] == "--all"
    json_out = sys.argv[4] if all_mode and len(sys.argv) > 4 else None
    entries = list(REGISTRY) if all_mode else (sys.argv[3:] or TOP20)
    spark = get_spark(app_name="sf1-battery-bench")
    # entry-selecting runs may reuse; a full run always rebuilds
    ensure_build(spark, k, out, reuse=bool(sys.argv[3:]) and not all_mode)
    # scan warm-up
    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
    print("| entry | sf0.1 s | sf1 s | ratio | rows out |")
    print("|---|---|---|---|---|")
    results = {}
    for name in entries:
        fn = REGISTRY[name][0]
        try:
            t0 = time.time()
            n01 = fn(spark, SF_DIR).count()
            b = time.time() - t0
            t0 = time.time()
            n1 = fn(spark, out).count()
            dt = time.time() - t0
            ratio = dt / b if b > 0 else float("inf")
            results[name] = {
                "sf01_s": round(b, 3),
                "sf1_s": round(dt, 3),
                "ratio": round(ratio, 2),
                "rows_sf01": int(n01),
                "rows_sf1": int(n1),
                "err": None,
            }
            print(
                f"| {name} | {b:.2f} | {dt:.2f} | {ratio:.1f}x | {n1:,} |",
                flush=True,
            )
        except Exception as e:  # record, keep the battery moving
            results[name] = {
                "sf01_s": None, "sf1_s": None, "ratio": None,
                "rows_sf1": None, "err": f"{type(e).__name__}: {e}"[:300],
            }
            print(f"| {name} | ERR | {type(e).__name__} | | |", flush=True)
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"k": k, "entries": results}, f, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(results)} entries)")
    spark.stop()


if __name__ == "__main__":
    main()
