"""PageRank broadcast-vs-SMJ leg probe (SCALE.md round-9 task).

The broadcast path (rank frame < broadcast_max_nodes) is the measured
default; the big-graph sort-merge path was plan-asserted but never
timed. This probe builds the same K-amplified part co-occurrence
multigraph the battery entry uses, then runs the identical pagerank
twice — broadcast hint on (default threshold) and forced off
(broadcast_max_nodes=0) — and reports wall time per leg plus the
superstep count, so the SMJ overhead is a recorded number instead of
an assumption.

Usage: python scripts/graph_smj_probe.py [K] [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from factstore_spark.operators.graph import pagerank
from factstore_spark.session import get_spark


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="graph-smj-probe")
    spark.sparkContext.setLogLevel("ERROR")

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_partkey"
    )
    # K-amplify orders (same trick as scale_probe.py: replicate with a
    # shifted key so basket structure repeats without exact duplication)
    reps = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep")
    li_k = li.select("l_orderkey", "l_partkey", reps).select(
        (F.col("l_orderkey") * k + F.col("rep")).alias("o"),
        (F.col("l_partkey") + F.col("rep")).alias("p"),
    )
    pairs = (
        li_k.alias("a")
        .join(li_k.alias("b"), "o")
        .filter(F.col("a.p") != F.col("b.p"))
        .select(F.col("a.p").alias("src"), F.col("b.p").alias("dst"))
    ).localCheckpoint()
    n_edges = pairs.count()
    n_nodes = pairs.select("src").union(pairs.select("dst")).distinct().count()
    print(f"# edges={n_edges} nodes={n_nodes}", file=sys.stderr)

    for label, bmax in (("broadcast", 5_000_000), ("smj", 0)):
        t0 = time.time()
        out = pagerank(pairs, n_iter=6, broadcast_max_nodes=bmax)
        top = out.orderBy(F.col("rank").desc(), "node").limit(5).collect()
        dt = round(time.time() - t0, 2)
        print(json.dumps({
            "leg": label, "k": k, "edges": n_edges, "nodes": n_nodes,
            "n_iter": 6, "sec": dt,
            "top": [(int(r["node"]), int(r["rank"])) for r in top],
        }))
    spark.stop()


if __name__ == "__main__":
    main()
