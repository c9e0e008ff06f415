"""Measured skew leg (VERDICT r9 task 4): plant a hot key owning ~10%
of rows and measure what the engine actually does about it, vs the
uniform twin of the same data.

Legs:

1. **Shuffle join, AQE skew handling ON vs OFF** — lineitem (amplified,
   10% of rows remapped to ONE hot orderkey) joined to orders with
   broadcast disabled, so the join shuffles on the skewed key. AQE
   splits a shuffle partition when it is BOTH > skewedPartitionFactor
   (default 5) x the median partition size AND >
   skewedPartitionThresholdInBytes (default 256 MB); the probe lowers
   the byte thresholds (8 MB / 2 MB advisory) because a local-scale
   hot partition is tens of MB — at 100 TB the same 10% key blows past
   256 MB on its own. Reports wall time and the skew-split count
   parsed from the final adaptive plan.
2. **Bucketed join on the same skewed data** — co-bucketed tables join
   with NO exchange, which also means NO AQE skew splitting (nothing
   to re-plan); the hot bucket is one task. This leg measures that
   foreclosure against leg 1.
3. **dup_clusters with a giant component** — 10% of nodes in one
   near-dup cluster (the realistic boilerplate-flood shape); the
   min-label propagation joins shuffle on cluster ids.
4. **find_by_subject on a hot subject** — one subject owns 10% of a
   store's facts; the finder is scan+filter+TakeOrdered (no shuffle),
   so skew shows up only as output volume, never as a straggler task.

Usage: python scripts/skew_probe.py [K]   (default K=30: ~18M lineitem)
Prints one markdown row per (leg, variant) for docs/SCALE.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F  # noqa: E402

from factstore_spark.session import get_spark  # noqa: E402

HOT_ORDER = 7_777_777
HOT_USER = 777_777


def _amplified_lineitem(spark, k: int, hot: bool):
    li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_extendedprice"
    )
    reps = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep")
    out = li.select("*", reps).select(
        (F.col("l_orderkey") * k + F.col("rep")).alias("l_orderkey"),
        "l_partkey", "l_quantity", "l_extendedprice",
    )
    if hot:
        # ~10% of rows collapse onto ONE orderkey
        out = out.withColumn(
            "l_orderkey",
            F.when(F.xxhash64("l_orderkey", "l_partkey") % 10 == 0,
                   F.lit(HOT_ORDER)).otherwise(F.col("l_orderkey")),
        )
    return out


def _orders_side(spark, k: int):
    o = spark.read.parquet("/root/testdata/sf0.1/orders.parquet").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    reps = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep")
    out = o.select("*", reps).select(
        (F.col("o_orderkey") * k + F.col("rep")).alias("o_orderkey"),
        "o_orderstatus", "o_totalprice",
    )
    hot_row = spark.createDataFrame(
        [(HOT_ORDER, "H", 0.0)], "o_orderkey long, o_orderstatus string, o_totalprice double"
    )
    return out.unionByName(hot_row)


def _timed_join(
    spark, li, orders, skew_on: bool, wide: bool = False
) -> tuple[float, int, int]:
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
    # local-scale trigger points; defaults (256 MB) are the 100 TB
    # ones. NOTE these are COMPRESSED map-output bytes — a partition
    # holding one repeated key lz4-compresses ~50x, so a planted-skew
    # probe must set thresholds far below the raw hot-partition size
    spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "256k"
    )
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "128k")
    joined = li.hint("merge").join(orders, li.l_orderkey == orders.o_orderkey)
    aggs = [F.count(F.lit(1)).alias("n")]
    if wide:
        # varied per-row values pruned INTO the shuffle: the hot
        # partition no longer compresses away its own byte signal
        aggs += [
            F.sum("l_quantity").alias("q"),
            F.sum("l_extendedprice").alias("p"),
            F.sum("l_partkey").alias("pk"),
        ]
    agg = joined.groupBy("o_orderstatus").agg(*aggs)
    t0 = time.time()
    rows = agg.collect()
    dt = time.time() - t0
    # parse the EXECUTED plan of the dataframe that actually ran — a
    # child frame's QueryExecution is a separate, never-finalized plan
    plan = agg._jdf.queryExecution().executedPlan().toString()
    n_skew_joins = plan.count("skew=true")
    total = sum(r.n for r in rows)
    return dt, n_skew_joins, total


def leg_shuffle_join(spark, k: int):
    rows = []
    for hot in (False, True):
        # multi-mapper inputs: AQE splits a skewed reduce partition at
        # MAP-OUTPUT granularity — from a single-file (one-mapper)
        # upstream the hot partition is one indivisible chunk and the
        # split NEVER fires (measured; the rule this probe exists for)
        li = _amplified_lineitem(spark, k, hot).repartition(48).localCheckpoint()
        orders = _orders_side(spark, k).repartition(16).localCheckpoint()
        variants = (
            [("aqe_skew_on", True, None, False)]
            if not hot
            else [
                ("aqe_skew_off", False, None, False),
                # default factor 5: a 10% key at P=32 reducers sits at
                # ~share*P + 1 = 4.2x the median in ROWS — and far less
                # in compressed BYTES for a narrow repeated-key row
                ("skew_on_factor5_narrow", True, None, False),
                ("skew_on_factor3_narrow", True, "3.0", False),
                ("skew_on_factor3_wide", True, "3.0", True),
                ("skew_on_factor1_5_narrow", True, "1.5", False),
            ]
        )
        for label, skew_on, factor, wide in variants:
            if factor is not None:
                spark.conf.set(
                    "spark.sql.adaptive.skewJoin.skewedPartitionFactor", factor
                )
            dt, n_skew, total = _timed_join(spark, li, orders, skew_on, wide)
            spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionFactor")
            rows.append((
                f"smj_{'hot10pct' if hot else 'uniform'}_{label}",
                dt, n_skew, total,
            ))
            print(f"  {rows[-1][0]}: {dt:.1f}s skew_joins={n_skew} rows={total:,}",
                  flush=True)
        li.unpersist()
        orders.unpersist()
    # restore EVERY conf this leg touched — the probe thresholds must
    # not leak into the other legs' measurements (128 KB advisory
    # partitions would inflate their task counts and wall times)
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.unset("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes")
    spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    return rows


def leg_bucketed_join(spark, k: int):
    from factstore_spark.storage.bucketing import write_bucketed

    rows = []
    warehouse = tempfile.mkdtemp(prefix="skew-bucketed-")
    li = _amplified_lineitem(spark, k, hot=True)
    orders = _orders_side(spark, k)
    write_bucketed(li, "skew_li", os.path.join(warehouse, "li"), "l_orderkey", 32)
    write_bucketed(orders, "skew_o", os.path.join(warehouse, "o"), "o_orderkey", 32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("skew_li")
            .join(spark.table("skew_o"),
                  F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderstatus")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        t0 = time.time()
        total = sum(r.n for r in j.collect())
        dt = time.time() - t0
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the leg's premise: the JOIN keys shuffle at WRITE time only —
        # a hashpartitioning exchange on either key means the bucket
        # spec was not picked up and this row would measure a shuffled
        # join under a "bucketed" label
        final = plan.split("== Initial Plan ==")[0]
        assert "hashpartitioning(l_orderkey" not in final, final[:800]
        assert "hashpartitioning(o_orderkey" not in final, final[:800]
        rows.append(("bucketed_hot10pct (no exchange -> no AQE split)",
                     dt, 0, total))
        print(f"  bucketed_hot10pct: {dt:.1f}s rows={total:,}", flush=True)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760b")
        spark.sql("DROP TABLE IF EXISTS skew_li")
        spark.sql("DROP TABLE IF EXISTS skew_o")
        shutil.rmtree(warehouse, ignore_errors=True)
    return rows


def leg_dup_clusters(spark, k: int):
    from factstore_spark.operators.dedup import dup_clusters

    n = 200_000 * max(1, k // 10)
    base = spark.range(n).select(F.col("id"))
    rows = []
    for hot in (False, True):
        if hot:
            # 10% of nodes STAR onto one hub (the boilerplate-flood
            # shape: every near-dup pairs with the template doc) —
            # skew on the hub's cluster id, diameter 1
            giant = base.filter((F.col("id") % 10 == 0) & (F.col("id") > 0)).select(
                F.lit(0).cast("long").alias("id_a"), F.col("id").alias("id_b")
            )
            rest = base.filter(F.col("id") % 10 != 0).select(
                F.col("id").alias("id_a"), (F.col("id") + 1_000_000_000).alias("id_b")
            )
            pairs = giant.unionByName(rest)
        else:
            pairs = base.select(
                F.col("id").alias("id_a"), (F.col("id") + 1_000_000_000).alias("id_b")
            )
        t0 = time.time()
        out_n = dup_clusters(pairs, driver_threshold=0).count()
        dt = time.time() - t0
        rows.append((f"dup_clusters_{'giant10pct' if hot else 'uniform'}",
                     dt, 0, out_n))
        print(f"  {rows[-1][0]}: {dt:.1f}s nodes={out_n:,}", flush=True)
    return rows


def leg_find_by_subject(spark, k: int):
    from factstore_spark import FactStore

    root = tempfile.mkdtemp(prefix="skew-store-")
    rows = []
    try:
        fs = FactStore(spark, root)
        fs.create("skew")
        n = 20_000 * max(1, k // 10)
        ev = spark.range(n).select(
            F.when(F.col("id") % 10 == 0, F.lit(f"USER:{HOT_USER}"))
            .otherwise(F.concat(F.lit("USER:"), (F.col("id") % 997).cast("string")))
            .alias("subject"),
            F.lit("evt").alias("type"),
            F.struct(
                F.encode(F.lit("{}"), "UTF-8").alias("data"),
                F.lit("json").alias("format"),
                F.lit(None).cast("string").alias("schema_ref"),
            ).alias("payload"),
            F.create_map().cast("map<string,string>").alias("metadata"),
            F.create_map().cast("map<string,string>").alias("tags"),
        )
        fs.append_dataframe("skew", ev)
        for name, subj in (("hot10pct", f"USER:{HOT_USER}"), ("uniform", "USER:42")):
            t0 = time.time()
            got = fs.find_by_subject_df("skew", subj, limit=100).count()
            dt = time.time() - t0
            rows.append((f"find_by_subject_{name}", dt, 0, got))
            print(f"  find_by_subject_{name}: {dt:.2f}s rows={got}", flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return rows


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 30
    spark = get_spark(app_name="skew-probe")
    all_rows = []
    for leg in (leg_shuffle_join, leg_bucketed_join, leg_dup_clusters,
                leg_find_by_subject):
        all_rows.extend(leg(spark, k))
    print("\n| leg | wall s | skew-split joins | rows |")
    print("|---|---|---|---|")
    for name, dt, n_skew, total in all_rows:
        print(f"| {name} | {dt:.1f} | {n_skew} | {total:,} |")
    spark.stop()


if __name__ == "__main__":
    main()
