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
        emb.select("vec_id", "embedding", reps)
        .select(
            (F.col("vec_id") * k + F.col("rep")).alias("vec_id"),
            F.zip_with(
                F.col("embedding"),
                F.sequence(F.lit(0), F.size(F.col("embedding")) - 1),
                jitter,
            ).cast("array<float>").alias("embedding"),
        )
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
    timed(
        "embedding_ivf_dedup",
        lambda: S.cosine_dup_pairs(
            emb, threshold=0.45, method="ivf", n_cells=32, n_probe=2
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
    spark.stop()


if __name__ == "__main__":
    main()
