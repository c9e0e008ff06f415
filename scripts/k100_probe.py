"""K=100 (sf10-ish) end-to-end legs for three flagship pipelines
(VERDICT r9 task 3): one decade past the usual K=10 probes.

Legs, each run at K=10 AND K=100 over the sf1_battery_bench
amplification (~6M/60M lineitem, ~1M/10M events, 50k/500k docs):

1. incremental-minhash pipeline END TO END: index BUILD over the
   99%% archive slice, then a 1%% increment's pair harvest + segment
   append (the daily-ingest shape; the battery entry only probes a
   capped 2.5k-doc contract — this is the uncapped pipeline).
2. graph_part_pagerank: the full registry entry (edge build from the
   lineitem basket multigraph + 8 supersteps over both join legs).
3. MIN/MAX IVM under endangered deletes: create_table + merge_upsert
   (updates/inserts/deletes planted to delete per-group extrema) +
   refresh_extrema, with the REFRESH timed separately — the claim
   under test is that refresh cost follows the CHANGES, not the table.

A healthy (linear-or-better) operator shows t(K=100)/t(K=10) <= ~10x
plus fixed overhead; anything super-linear is a scale-killer to fix.

Usage: python scripts/k100_probe.py [k_small] [k_big] [base_out_dir]
Prints one markdown table row per (leg, K). Results -> docs/SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from factstore_spark.queries import REGISTRY, _cents  # noqa: E402
from factstore_spark.session import get_spark  # noqa: E402
from sf1_battery_bench import ensure_build  # noqa: E402


def leg_minhash(spark, out: str) -> list[tuple[str, float, int]]:
    from factstore_spark.operators.dedup import (
        append_minhash_index,
        incremental_minhash_pairs,
        write_minhash_index,
    )

    docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
    archive = docs.filter(F.col("doc_id") % 100 != 0)
    inc = docs.filter(F.col("doc_id") % 100 == 0)
    idx = tempfile.mkdtemp(prefix="k100-mh-")
    rows = []
    try:
        t0 = time.time()
        write_minhash_index(archive, idx)
        rows.append(("minhash_index_build", time.time() - t0,
                     archive.count()))
        t0 = time.time()
        n_pairs = incremental_minhash_pairs(inc, idx).count()
        rows.append(("minhash_increment_pairs", time.time() - t0, n_pairs))
        t0 = time.time()
        append_minhash_index(inc, idx)
        rows.append(("minhash_increment_append", time.time() - t0,
                     inc.count()))
    finally:
        shutil.rmtree(idx, ignore_errors=True)
    return rows


def leg_pagerank(spark, out: str) -> list[tuple[str, float, int]]:
    t0 = time.time()
    n = REGISTRY["graph_part_pagerank"][0](spark, out).count()
    return [("graph_part_pagerank", time.time() - t0, n)]


def leg_ivm(spark, out: str) -> list[tuple[str, float, int]]:
    from factstore_spark.storage.ivm import full_extrema, refresh_extrema
    from factstore_spark.storage.merge import create_table, merge_upsert

    orders = spark.read.parquet(os.path.join(out, "orders.parquet")).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_orderstatus").alias("status"),
        _cents(F.col("o_totalprice")).alias("cents"),
    )
    d = tempfile.mkdtemp(prefix="k100-ivm-")
    rows = []
    try:
        # FULL amplified orders as the table (the battery entry samples
        # 1/100 of keys; the scale claim needs the uncapped shape)
        base = orders.filter(F.col("k") % 200 != 3).localCheckpoint()
        inserts_src = orders.filter(F.col("k") % 200 == 3)
        t0 = time.time()
        create_table(base, d, ["k"], "status")
        state = full_extrema(spark, d, ["status"], ["cents"], snapshot=1)
        rows.append(("ivm_create_and_bootstrap", time.time() - t0,
                     base.count()))
        updates = (
            base.filter((F.col("k") % 3 == 0) & (F.col("k") % 7 != 0))
            .withColumn("cents", F.col("cents") + F.lit(500))
            .withColumn("is_deleted", F.lit(False))
        )
        inserts = inserts_src.withColumn("is_deleted", F.lit(False))
        deletes = base.filter(F.col("k") % 7 == 0).withColumn(
            "is_deleted", F.lit(True)
        )
        t0 = time.time()
        merge_upsert(
            updates.unionByName(inserts).unionByName(deletes),
            d,
            delete_col="is_deleted",
        )
        rows.append(("ivm_merge_upsert", time.time() - t0, 0))
        t0 = time.time()
        state = refresh_extrema(spark, d, state, 1, ["status"], ["cents"])
        n = state.count()
        rows.append(("ivm_refresh_extrema_endangered", time.time() - t0, n))
    finally:
        shutil.rmtree(d, ignore_errors=True)
    return rows


def main() -> None:
    k_small = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    k_big = int(sys.argv[2]) if len(sys.argv) > 2 else 100
    base = sys.argv[3] if len(sys.argv) > 3 else "/tmp/k100_probe"
    spark = get_spark(app_name="k100-probe")
    results: dict[int, dict[str, tuple[float, int]]] = {}
    for k in (k_small, k_big):
        out = f"{base}_k{k}"
        ensure_build(spark, k, out)
        for t in ["lineitem", "orders", "documents"]:
            spark.read.parquet(os.path.join(out, f"{t}.parquet")).count()
        legs: dict[str, tuple[float, int]] = {}
        for fn in (leg_minhash, leg_pagerank, leg_ivm):
            for name, sec, n in fn(spark, out):
                legs[name] = (sec, n)
                print(f"  K={k} {name}: {sec:.1f}s (rows/out={n:,})",
                      flush=True)
        results[k] = legs
    print(f"\n| leg | K={k_small} s | K={k_big} s | ratio "
          f"({k_big // k_small}x rows) | out rows at K={k_big} |")
    print("|---|---|---|---|---|")
    for name in results[k_small]:
        s, _ = results[k_small][name]
        b, n = results[k_big][name]
        print(f"| {name} | {s:.1f} | {b:.1f} | {b / max(s, 1e-9):.1f}x | {n:,} |")
    spark.stop()


if __name__ == "__main__":
    main()
