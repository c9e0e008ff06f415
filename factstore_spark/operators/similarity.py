"""Similarity search over embedding columns (``array<float>``).

Two strategies:

- **Brute-force cosine top-k** — broadcast the (small) query set,
  one pass over the corpus computing dot/norms JVM-side
  (``zip_with`` + ``aggregate``), per-query top-k via window. Exact;
  the baseline and the verifier for the approximate path. At 100 TB the
  corpus scan is embarrassingly parallel; the only shuffle is the
  top-k by query_id (rows = |corpus| x |queries| before the window —
  use ``prune_margin``/IVF below when that product is large).

- **IVF (inverted-file) top-k** — coarse-quantize the corpus to
  ``n_cells`` centroids (deterministic seeded sample as centroids, one
  assignment pass), then search only the ``n_probe`` nearest cells per
  query. Classic FAISS-style IVF recall/speed trade; entirely
  DataFrame ops, centroids broadcast.

Sums fold left-to-right in array order, elements cast to double —
deterministic and reproducible (matches an ORDER BY-ed SUM oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Zero-norm vectors get similarity 0.0 (try_divide: ANSI mode would
    otherwise fail the whole job on a single degenerate row)."""
    return F.coalesce(F.try_divide(_dot(a, b), _norm(a) * _norm(b)), F.lit(0.0))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k. Output: (query_id, neighbor_id, sim, rank).

    Self-matches (same id) are excluded. Ties broken by neighbor_id
    ascending for full determinism."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_similarity(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """Approximate IVF top-k: deterministic seeded sample as coarse
    centroids; corpus rows assigned to their nearest centroid (one
    broadcast pass); each query searches only its ``n_probe`` nearest
    cells. Output: (query_id, neighbor_id, sim, rank)."""
    spark = corpus.sparkSession
    cents = (
        corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
        .orderBy(F.pmod(F.xxhash64(F.col("cid").cast("string"), F.lit(seed)), F.lit(1 << 31)))
        .limit(n_cells)
        .withColumn("cell", F.row_number().over(Window.orderBy("cid")) - 1)
        .select("cell", "cvec")
    )
    cents_b = F.broadcast(cents)

    def nearest_cells(df: DataFrame, vec: str, out: str, n: int) -> DataFrame:
        scored = df.crossJoin(cents_b).withColumn(
            "_csim", cosine_similarity(F.col(vec), F.col("cvec"))
        )
        w = Window.partitionBy(*[c for c in df.columns]).orderBy(
            F.col("_csim").desc(), F.col("cell").asc()
        )
        return (
            scored.withColumn("_r", F.row_number().over(w))
            .filter(F.col("_r") <= n)
            .select(*df.columns, F.col("cell").alias(out))
        )

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    assigned = nearest_cells(c, "c_vec", "cell", 1)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probes = nearest_cells(q, "q_vec", "cell", n_probe)

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_similarity(F.col("q_vec"), F.col("c_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
