"""Scale probe: run the heavy operators on a synthetically amplified
corpus (default 10x sf0.1 = 50k docs / 20k vectors) and report wall
times next to the sf0.1 baselines. The point is the SHAPE of the
growth, not the absolute numbers: sub-quadratic operators should scale
roughly linearly in rows (bands/buckets bound the candidate volume);
anything super-linear here would be a scale-killer at 100 TB.

Amplification is deterministic: each source row is replicated K times
with a salt token appended to the text (so shingle sets shift — no
artificial 100% dup rate) and a seeded perturbation added to the
embedding (preserves geometry, breaks exact duplication).

Usage: python scripts/scale_probe.py [K] [sf_dir]
Prints one JSON line per operator: {"op", "rows", "sec"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from factstore_spark.operators import dedup as D
from factstore_spark.operators import similarity as S
from factstore_spark.operators import text as T
from factstore_spark.session import get_spark


def amplify_docs(docs, k: int):
    reps = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep")
    return (
        docs.select("doc_id", "text", reps)
        .select(
            (F.col("doc_id") * k + F.col("rep")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" salt"), F.col("rep").cast("string")).alias(
                "text"
            ),
        )
    )


def amplify_embeddings(emb, k: int):
    reps = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep")

    # Per-DIMENSION deterministic noise (a shared scalar would add a
    # common direction and artificially correlate the whole corpus).
    def jitter(x, i):
        h = F.xxhash64(
            F.col("vec_id").cast("string"), F.col("rep").cast("string"), i.cast("string")
        )
        return x.cast("double") + (F.pmod(h, F.lit(2001)) - 1000).cast("double") / 20000.0

    return (
        emb.select("vec_id", "embedding", "label", reps)
        .select(
            (F.col("vec_id") * k + F.col("rep")).alias("vec_id"),
            F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(0), F.size(F.col("embedding")) - 1),
                jitter,
            ).cast("array<float>").alias("embedding"),
            "label",
        )
    )


def amplify_events(ev, k: int):
    """K replicas per event, same user (per-user volume grows Kx — the
    skew axis as-of cares about), timestamps shifted by rep
    microseconds so replicas stay distinct instants."""
    reps = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep")
    return (
        ev.select("event_id", "ts", "user_id", "event_type", "value", reps)
        .select(
            (F.col("event_id") * k + F.col("rep")).alias("event_id"),
            # ts may arrive as TIMESTAMP_NTZ; cast via session-UTC for
            # a deterministic epoch (probe-only — queries.py uses
            # convert_timezone for the oracle-exact path)
            (F.unix_micros(F.col("ts").cast("timestamp")) + F.col("rep")).alias(
                "ts_us"
            ),
            "user_id",
            "event_type",
            "value",
        )
    )


def amplify_lineitem(li, k: int):
    reps = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("rep")
    return li.select(
        "l_orderkey", "l_linenumber", "l_extendedprice", reps
    )


def timed(name: str, fn):
    t0 = time.time()
    n = fn()
    dt = round(time.time() - t0, 2)
    print(json.dumps({"op": name, "rows": n, "sec": dt}))


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = amplify_docs(
        spark.read.parquet(os.path.join(sf_dir, "documents.parquet")), k
    ).repartition(32).cache()
    emb = amplify_embeddings(
        spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet")), k
    ).repartition(32).cache()
    print(json.dumps({"op": "corpus", "docs": docs.count(), "vectors": emb.count(), "k": k}))
    import pandas as pd  # noqa: F401 — warm the worker daemon

    spark.range(64).mapInPandas(lambda it: it, "id long").count()

    timed("minhash_lsh_pairs", lambda: D.minhash_lsh_pairs(docs, verify_jaccard=0.5).count())
    timed("simhash_pairs", lambda: D.simhash_near_dup_pairs(docs, max_hamming=3).count())
    timed(
        "ngram_jaccard_capped",
        lambda: D.ngram_jaccard_pairs(docs, n=3, min_jaccard=0.2, max_shingle_df=20 * k).count(),
    )
    # n_cells follows the operator's own scale policy (docstring:
    # "grow n_cells ~ sqrt(n) for O(n^1.5) total work") — pinning the
    # 1x cell count at Kx leaves cells Kx overfull and the candidate
    # self-join quadratic (measured: 32 cells at 10x = 34-69 s vs
    # ~6 s with sqrt-scaled cells, at ~5% fewer verified pairs).
    ivf_cells = max(32, int(32 * k**0.5))
    timed(
        "embedding_ivf_dedup",
        lambda: S.cosine_dup_pairs(
            emb, threshold=0.45, method="ivf", n_cells=ivf_cells, n_probe=2
        ).count(),
    )
    timed(
        "ann_pq_topk",
        lambda: S.pq_topk(
            emb, emb.filter(F.col("vec_id") < 10), k=5, n_cells=32, n_probe=4
        ).count(),
    )
    timed("text_quality", lambda: T.with_quality_score(docs).count())
    timed("top_ngrams", lambda: T.top_ngrams(docs, n=2, k=20).count())
    timed("gopher_rules", lambda: T.with_gopher_rules(docs).count())
    timed("tfdf_keywords", lambda: T.tfdf_keywords(docs, k=5).count())

    from factstore_spark.operators.sampling import weighted_priority_sample

    wdocs = docs.withColumn("n_chars", F.length("text"))
    timed(
        "weighted_sample_1k",
        lambda: weighted_priority_sample(wdocs, "n_chars", 1000, "doc_id").count(),
    )

    # SemDeDup probe: block sizes follow the operator's cluster
    # contract (cells ~ corpus/k). The amplified corpus reuses the
    # stored label split K ways by rep so blocks stay ~sf0.1-cluster
    # sized x sqrt(k) — the sqrt-cell policy the IVF probe documents.
    sem_blocks = max(10, int(10 * k**0.5))
    sem = emb.withColumn(
        "label", F.pmod(F.xxhash64(F.col("vec_id")), F.lit(sem_blocks)).cast("int")
    )
    timed(
        "semantic_dedup_pairs",
        lambda: D.semantic_dedup_pairs(sem, tau_num=30, tau_den=100).count(),
    )

    # Temporal + ranking heavy hitters at the sf1-ish row counts
    # (K=10 -> 1M events / 6M lineitem rows).
    from factstore_spark.operators import ranking as R
    from factstore_spark.operators import temporal as TP

    ev = (
        amplify_events(
            spark.read.parquet(os.path.join(sf_dir, "events.parquet")), k
        )
        .repartition(32)
        .cache()
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts_us"
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts_us")
    print(json.dumps({"op": "events_corpus", "rows": ev.count()}))
    cents = F.floor(F.col("value") * 100).cast("long")
    timed(
        "user_zscore_flags",
        lambda: (lambda e: (
            e.join(
                e.groupBy("user_id").agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum("value_cents").alias("s"),
                    F.sum(F.col("value_cents") * F.col("value_cents")).alias("ss"),
                ),
                "user_id",
            )
            .filter(
                (F.col("value_cents") * F.col("n") - F.col("s")).cast("decimal(38,0)")
                * (F.col("value_cents") * F.col("n") - F.col("s")).cast("decimal(38,0)")
                * (F.col("n") - 1).cast("decimal(38,0)")
                > F.lit(4).cast("decimal(38,0)") * F.col("n").cast("decimal(38,0)")
                * (F.col("n").cast("decimal(38,0)") * F.col("ss").cast("decimal(38,0)")
                   - F.col("s").cast("decimal(38,0)") * F.col("s").cast("decimal(38,0)"))
            )
            .count()
        ))(ev.withColumn("value_cents", cents)),
    )
    timed(
        "sliding_windows_5x",
        lambda: ev.select(
            "event_type",
            (F.col("ts_us") / 60_000_000).cast("long").alias("mi"),
            F.explode(F.sequence(F.lit(0), F.lit(4))).alias("off"),
        )
        .groupBy((F.col("mi") - F.col("off")).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .count(),
    )
    timed(
        "asof_join",
        lambda: TP.asof_join(
            purchases, clicks, on="user_id", left_time="ts_us",
            right_time="ts_us", value_cols=[],
        ).count(),
    )
    timed(
        "asof_join_bucketed_1h",
        lambda: TP.asof_join(
            purchases, clicks, on="user_id", left_time="ts_us",
            right_time="ts_us", value_cols=[], bucket=3_600_000_000,
        ).count(),
    )

    li = (
        amplify_lineitem(
            spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")), k
        )
        .repartition(32)
        .cache()
    )
    print(json.dumps({"op": "lineitem_corpus", "rows": li.count()}))
    timed(
        "lineitem_global_deciles",
        lambda: R.with_global_rank(
            li,
            [
                F.col("l_extendedprice"),
                F.col("l_orderkey"),
                F.col("l_linenumber"),
                F.col("rep"),
            ],
        )
        .groupBy(F.ceil(F.col("rank") * 10 / li.count()).alias("decile"))
        .agg(F.count(F.lit(1)).alias("n"), F.avg("l_extendedprice").alias("avg_price"))
        .count(),
    )
    spark.stop()


if __name__ == "__main__":
    main()
