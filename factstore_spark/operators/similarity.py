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


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    exact: bool = False,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine >= threshold.

    ``exact=True``: full O(n^2) cross product — the oracle path, fine up
    to ~10k vectors. Default: random-hyperplane LSH (sign sketch of
    ``n_planes`` projections, banded like MinHash) generates candidates
    sub-quadratically, then exact cosine verifies — the 100 TB path;
    recall follows the SimHash collision bound (1 - theta/pi per plane).

    Hyperplanes are seeded deterministic samples in [-1, 1]^d derived
    from xxhash64 — no driver-side randomness, no collect.
    """
    ids = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if exact:
        a = ids.withColumnsRenamed({"_id": "id_a", "_v": "va"})
        b = ids.withColumnsRenamed({"_id": "id_b", "_v": "vb"})
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
    else:
        # Random hyperplanes are data-independent constants: generate
        # them ONCE driver-side (seeded) and embed as literals — an
        # in-expression hash per (plane, dim) per row costs 1000x more.
        import random

        rnd = random.Random(seed)
        head = df.select(vec_col).first()
        if head is None:  # empty corpus -> empty result, id dtype preserved
            return df.select(
                F.col(id_col).alias("id_a"),
                F.col(id_col).alias("id_b"),
                F.lit(0.0).alias("sim"),
            ).limit(0)
        dim = len(head[0])
        planes = [
            F.array(*[F.lit(rnd.uniform(-1.0, 1.0)) for _ in range(dim)])
            for _ in range(n_planes)
        ]
        sig = F.array(
            *[
                F.when(
                    F.aggregate(
                        F.zip_with(
                            F.col("_v"), plane, lambda x, u: x.cast("double") * u
                        ),
                        F.lit(0.0),
                        lambda acc, v: acc + v,
                    )
                    >= 0,
                    F.lit(1),
                ).otherwise(F.lit(0))
                for plane in planes
            ]
        )
        rows_per_band = n_planes // bands
        sketched = ids.withColumn("_sig", sig)
        banded = sketched.select(
            "_id",
            "_v",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(i).alias("band"),
                            F.hash(
                                F.slice(F.col("_sig"), i * rows_per_band + 1, rows_per_band)
                            ).alias("bh"),
                        )
                        for i in range(bands)
                    ]
                )
            ).alias("b"),
        ).select("_id", "_v", "b.band", "b.bh")
        a = banded.alias("a")
        b = banded.alias("b")
        cand = (
            a.join(
                b,
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bh") == F.col("b.bh"))
                & (F.col("a._id") < F.col("b._id")),
            )
            .select(
                F.col("a._id").alias("id_a"),
                F.col("a._v").alias("va"),
                F.col("b._id").alias("id_b"),
                F.col("b._v").alias("vb"),
            )
            .dropDuplicates(["id_a", "id_b"])
        )
    return (
        cand.withColumn("sim", cosine_similarity(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def train_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list[list[float]]:
    """Lloyd's k-means over the embedding column (coarse quantizer
    training for IVF). Each iteration: broadcast current centroids as
    literals, one map-only nearest-centroid assignment pass, then a
    groupBy(cell) mean — the only shuffle. Returns unit-normalized
    centroids (driver-side list; centroid tables are tiny by design).

    Initialization is the deterministic seeded sample (xxhash64 order),
    so results are reproducible run-to-run.

    Scale note: the mean step collect_lists each cell's vectors into the
    aggregation buffer; at billions of rows per cell switch to
    posexplode(v) + groupBy(cell, dim) + sum — more shuffle rows, O(1)
    memory. Cell counts here are small enough that the simpler plan wins."""
    import numpy as np

    rows = (
        corpus.select(F.col(vec_col).alias("v"), F.col(id_col).alias("i"))
        .orderBy(F.pmod(F.xxhash64(F.col("i").cast("string"), F.lit(seed)), F.lit(1 << 31)))
        .limit(n_cells)
        .collect()
    )
    if not rows:
        return []  # empty corpus: nothing to train on
    cents = [np.asarray([float(x) for x in r.v], dtype=np.float64) for r in rows]
    cents = [c / (np.linalg.norm(c) or 1.0) for c in cents]

    for _ in range(iterations):
        cents_arr = F.array(
            *[F.array(*[F.lit(float(x)) for x in c]) for c in cents]
        )
        scores = F.transform(
            cents_arr,
            lambda cv: F.aggregate(
                F.zip_with(F.col("v"), cv, lambda x, c: x.cast("double") * c),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        # argmax via (neg score, idx) sort — same trick as top_cells
        idx = F.zip_with(
            scores,
            F.sequence(F.lit(0), F.lit(len(cents) - 1)),
            lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
        )
        assigned = corpus.select(F.col(vec_col).alias("v")).withColumn(
            "cell", F.element_at(F.array_sort(idx), 1)["cell"]
        )
        means = (
            assigned.groupBy("cell")
            .agg(
                F.aggregate(
                    F.collect_list("v"),
                    F.array_repeat(F.lit(0.0), len(cents[0])),
                    lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x.cast("double")),
                ).alias("sum_v"),
                F.count(F.lit(1)).alias("n"),
            )
            .collect()
        )
        new_cents = list(cents)
        for r in means:
            m = np.asarray(r.sum_v, dtype=np.float64) / r.n
            norm = np.linalg.norm(m)
            if norm > 0:
                new_cents[r.cell] = m / norm
        cents = new_cents
    return [c.tolist() for c in cents]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Approximate IVF top-k: deterministic seeded sample as coarse
    centroids; corpus rows assigned to their nearest centroid via a
    MAP-ONLY argmax over the centroid table embedded as a literal array
    (the FAISS pattern — centroids are tiny, data never shuffles for
    assignment); each query searches only its ``n_probe`` nearest cells.
    Pass ``centroids`` from ``train_centroids`` for k-means-trained
    cells; default is the deterministic seeded sample (one pass, no
    training). Output: (query_id, neighbor_id, sim, rank)."""
    if centroids is None:
        cents_rows = (
            corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
            .orderBy(F.pmod(F.xxhash64(F.col("cid").cast("string"), F.lit(seed)), F.lit(1 << 31)))
            .limit(n_cells)
            .orderBy("cid")
            .collect()
        )
        centroids = []
        for r in cents_rows:
            v = [float(x) for x in r.cvec]
            norm = sum(x * x for x in v) ** 0.5 or 1.0
            centroids.append([x / norm for x in v])
    # Literal array<array<double>> of unit-normalized centroids: nearest-
    # by-cosine == argmax dot product, computed per row with no shuffle.
    cents_arr = F.array(*[F.array(*[F.lit(x) for x in c]) for c in centroids])
    n_actual = len(centroids)

    def cell_scores(vec: Column) -> Column:
        """array of (dot(v, centroid_k)) for all cells."""
        return F.transform(
            cents_arr,
            lambda cv: F.aggregate(
                F.zip_with(vec, cv, lambda x, c: x.cast("double") * c),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ),
        )

    def top_cells(vec: Column, n: int) -> Column:
        """cells ranked by score desc, cell asc — as an array of ints."""
        scored = F.zip_with(
            cell_scores(vec),
            F.sequence(F.lit(0), F.lit(n_actual - 1)),
            lambda s, i: F.struct((-s).alias("neg"), i.alias("cell")),
        )
        return F.slice(F.transform(F.array_sort(scored), lambda st: st["cell"]), 1, n)

    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    assigned = c.withColumn("cell", F.element_at(top_cells(F.col("c_vec"), 1), 1))
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probes = q.withColumn(
        "cell", F.explode(top_cells(F.col("q_vec"), n_probe))
    ).select("query_id", "q_vec", "cell")

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
