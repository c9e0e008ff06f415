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

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..session import release_local_checkpoint


def _dot_sql(a: str, b: str) -> str:
    """SQL fragment form of the fold-ordered dot product (round 15,
    guide §7.3): one parsed expression instead of ~15 py4j round trips
    per call site. Same tree, same left-to-right FP fold — the oracle
    paths stay bit-identical."""
    return (
        f"aggregate(zip_with({a}, {b}, "
        "(x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v)"
    )


def _norm_sql(a: str) -> str:
    return (
        f"sqrt(aggregate(transform({a}, "
        "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
        "0.0D, (acc, v) -> acc + v))"
    )


def _dot(a: Column | str, b: Column | str) -> Column:
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(_dot_sql(a, b))
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a: Column | str) -> Column:
    if isinstance(a, str):
        return F.expr(_norm_sql(a))
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_similarity(a: Column | str, b: Column | str) -> Column:
    """Zero-norm vectors get similarity 0.0 (try_divide: ANSI mode would
    otherwise fail the whole job on a single degenerate row). String
    args (column names) build one parsed expression — identical tree."""
    if isinstance(a, str) and isinstance(b, str):
        return F.expr(
            f"coalesce(try_divide({_dot_sql(a, b)}, "
            f"{_norm_sql(a)} * {_norm_sql(b)}), 0.0D)"
        )
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
        .withColumn("sim", cosine_similarity("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def exact_cosine_pairs_bounded(
    df: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_rows: int = 10_000,
) -> DataFrame:
    """Exact all-pairs cosine >= threshold for a SIZE-BOUNDED corpus
    (recall-probe ground truth): one bounded collect, one float64 gemm,
    only qualifying (id_a, id_b) pairs re-enter Spark.

    The probe corpora this serves are capped at a fixed size
    (queries.py:RECALL_PROBE_TARGET), so the ground truth is
    O(target^2) = O(1) in corpus scale BY CONSTRUCTION — at that size
    the distributed all-pairs join is pure scheduling overhead (a
    ~10-stage plan moving every vector pair through Arrow), while one
    driver gemm is milliseconds. Same spirit as with_global_rank's
    O(partitions) offsets collect: bounded driver data is fine, and
    ``max_rows`` turns an unbounded misuse into a loud error instead
    of a silent driver OOM. Math matches cosine_batch (float64
    einsum), so verify-filtered candidate sets stay consistent.
    Null/empty vectors never qualify (zero norm -> sim 0), matching
    the join-form's behaviour of dropping them below any threshold."""
    rows = (
        df.select(F.col(id_col), F.col(vec_col))
        .filter(F.col(vec_col).isNotNull() & (F.size(F.col(vec_col)) > 0))
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"exact_cosine_pairs_bounded: corpus exceeds max_rows={max_rows}; "
            "this helper is for fixed-size probe corpora — use the "
            "distributed pair join for unbounded inputs"
        )
    spark = df.sparkSession
    schema = f"id_a {dict(df.dtypes)[id_col]}, id_b {dict(df.dtypes)[id_col]}"
    if not rows:
        return spark.createDataFrame([], schema)
    ids = [r[0] for r in rows]
    M = np.asarray([r[1] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0.0] = np.inf  # zero vectors never reach any threshold
    # Block the gemm: a full n x n similarity matrix is O(n^2) doubles
    # (800 MB at the 10k cap); 1024-row blocks keep peak memory at
    # O(block x n). The DIVISION order matches cosine_batch
    # (dot(a,b) / (|a|*|b|), not pre-normalized rows); the dot itself
    # is a BLAS gemm whose accumulation order can still differ from
    # einsum by a last ulp — acceptable because the probe thresholds
    # are not knife-edge by construction (0.45 over a noise corpus),
    # and removed entirely only by running one kernel on both sides.
    pairs = []
    block = 1024
    for lo in range(0, len(ids), block):
        S = (M[lo : lo + block] @ M.T) / (norms[lo : lo + block, None] * norms[None, :])
        ia, ib = np.where(S >= threshold)
        for x, y in zip((ia + lo).tolist(), ib.tolist()):
            if x < y:
                pairs.append(
                    (ids[x], ids[y]) if ids[x] < ids[y] else (ids[y], ids[x])
                )
    return spark.createDataFrame(pairs, schema)


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    """Seeded random hyperplane matrix (n_planes x dim), driver-side.
    Data-independent constants shipped to workers in the UDF closure
    (a few KB) — never recomputed per row."""
    import random

    rnd = random.Random(seed)
    return np.asarray(
        [[rnd.uniform(-1.0, 1.0) for _ in range(dim)] for _ in range(n_planes)],
        dtype=np.float64,
    )


def cosine_batch(a_col: Column, b_col: Column) -> Column:
    """Vectorized (Arrow-batched numpy) cosine for candidate VERIFY
    paths. float64 pairwise summation — may differ from the sequential
    HOF fold (`cosine_similarity`) in the last ulp, so use this only
    where outputs are ids/ranks or the threshold is not knife-edge; the
    oracle-checked exact entries keep the fold-ordered version."""

    @F.pandas_udf("double")
    def _cos(a: pd.Series, b: pd.Series) -> pd.Series:
        if len(a) == 0:
            return pd.Series([], dtype="float64")
        A = np.vstack(a.to_numpy()).astype(np.float64)
        B = np.vstack(b.to_numpy()).astype(np.float64)
        num = np.einsum("ij,ij->i", A, B)
        den = np.linalg.norm(A, axis=1) * np.linalg.norm(B, axis=1)
        with np.errstate(divide="ignore", invalid="ignore"):
            out = np.where(den == 0.0, 0.0, num / den)
        return pd.Series(out)

    return _cos(a_col, b_col)


def _rp_matrix(dim: int, out_dim: int, seed: int) -> np.ndarray:
    """Deterministic ±1/sqrt(out_dim) projection matrix
    (dim x out_dim) from a seeded PRNG — regenerated identically on
    every executor, so the operator ships a SEED, not a matrix."""
    import random as _random

    rnd = _random.Random(repr((seed, dim, out_dim)))
    scale = 1.0 / (out_dim**0.5)
    return np.asarray(
        [
            [scale if rnd.getrandbits(1) else -scale for _ in range(out_dim)]
            for _ in range(dim)
        ],
        dtype=np.float64,
    )


def random_project(
    df: DataFrame,
    out_dim: int = 32,
    seed: int = 8,
    vec_col: str = "embedding",
    out_col: str = "projection",
    dim: int | None = None,
) -> DataFrame:
    """Johnson-Lindenstrauss random projection: add ``out_col`` =
    ``vec @ R`` with a deterministic ±1/sqrt(out_dim) matrix derived
    from ``seed`` — the dimensionality-reduction stage in front of ANN
    or clustering (out_dim floats per row instead of dim; pairwise
    distances preserved to within JL distortion).

    Map-ONLY at any scale: one Arrow-batched numpy gemm per batch, and
    the matrix is regenerated from the seed inside each task — an
    all-executor constant is cheaper to recompute (~µs) than to
    broadcast, and nothing shuffles. Null/empty vectors project to
    null; ANY vector whose length differs from the input dimension
    raises loudly — the dimension is pinned up front (``dim``, or one
    cheap first() when omitted), never inferred per Arrow batch, so a
    corrupt mixed-length column fails regardless of which partition or
    batch boundary the lengths straddle (per-batch inference would
    silently project different batches with different matrices)."""
    if dim is None:
        first = (
            df.select(F.size(F.col(vec_col)).alias("d"))
            .filter(F.col("d") > 0)
            .first()
        )
        if first is None:
            return df.withColumn(
                out_col, F.lit(None).cast("array<float>")
            )  # no non-empty vectors: nothing to project
        dim = int(first.d)

    @F.pandas_udf("array<float>")
    def _proj(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        vals = v.to_numpy()
        mask = np.asarray([x is not None and len(x) > 0 for x in vals])
        out = np.empty(len(vals), dtype=object)
        out[~mask] = None
        if mask.any():
            M = np.vstack(vals[mask]).astype(np.float64)  # raises on ragged
            if M.shape[1] != dim:
                raise ValueError(
                    f"random_project: vector length {M.shape[1]} != pinned "
                    f"input dim {dim} — the embedding column is corrupt"
                )
            R = _rp_matrix(dim, out_dim, seed)
            P = (M @ R).astype(np.float32)
            # row-by-row assignment: a bulk 2-D assign would broadcast
            # into the object array instead of storing one array per cell
            for pos, row in zip(np.flatnonzero(mask), P):
                out[pos] = row
        return pd.Series(out)

    return df.withColumn(out_col, _proj(F.col(vec_col)))


def _band_hash_col(vec_col: Column, planes: np.ndarray, bands: int) -> Column:
    """array<long> of per-band bucket hashes: sign-sketch of
    ``planes @ v`` with each band's bits packed into one integer —
    bucket space is 2^(planes_per_band) per band, so widening a band
    shrinks candidate volume geometrically (VERDICT r1 fix: the old
    F.hash(slice) form capped the space at 2^4)."""
    n_planes = planes.shape[0]
    if bands <= 0 or n_planes % bands != 0:
        raise ValueError(
            f"n_planes ({n_planes}) must be a positive multiple of bands "
            f"({bands}) — a zero-width band hashes every vector into one "
            "bucket (full cross-product)"
        )
    rpb = n_planes // bands
    weights = (1 << np.arange(rpb, dtype=np.int64))

    @F.pandas_udf("array<long>")
    def _sig(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        M = np.vstack(v.to_numpy()).astype(np.float64)
        S = (M @ planes.T) >= 0.0  # n x n_planes signs
        H = np.empty((S.shape[0], bands), dtype=np.int64)
        for b in range(bands):
            H[:, b] = S[:, b * rpb : (b + 1) * rpb].astype(np.int64) @ weights
        return pd.Series(list(H))

    return _sig(vec_col)


def _centroid_cells_col(
    vec_col: Column, centroids: np.ndarray, n_probe: int
) -> Column:
    """array<int> of the ``n_probe`` nearest (by dot with unit
    centroids) cell ids — vectorized argpartition over the broadcast
    centroid matrix. Map-only: assignment never shuffles the data."""
    n_cells = centroids.shape[0]
    p = min(n_probe, n_cells)

    dim = centroids.shape[1]

    @F.pandas_udf("array<int>")
    def _cells(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        vals = v.to_numpy()
        # NULL / ragged-length embeddings yield a NULL cell list (the
        # row is excluded by downstream cell joins) instead of
        # crashing the whole task in np.vstack — matching the old
        # expression-based scoring, where a null vector null-ed out of
        # the argmax. array<float> columns are nullable by default, so
        # one missing embedding must not fail train/build/query.
        ok = np.fromiter(
            (x is not None and len(x) == dim for x in vals), dtype=bool, count=len(vals)
        )
        if not ok.any():
            return pd.Series([None] * len(vals), dtype="object")
        M = np.vstack(vals[ok]).astype(np.float64)
        scores = M @ centroids.T  # n_ok x n_cells
        # STABLE argsort, full width: n_cells is small by design, so a
        # full sort costs the same as argpartition while giving the
        # (score desc, cell asc) tie order every call site shares —
        # zero vectors (all-tie scores) probe cells 0..p-1, not an
        # argpartition-dependent arbitrary set.
        top = np.argsort(-scores, axis=1, kind="stable")[:, :p].astype(np.int32)
        out = [None] * len(vals)
        for j, i in enumerate(np.flatnonzero(ok)):
            out[i] = top[j]
        return pd.Series(out, dtype="object")

    return _cells(vec_col)


def _unit_rows(centroids) -> np.ndarray:
    """Centroid list/matrix -> unit-normalized float64 matrix. Every
    IVF site normalizes through HERE so the argmax-dot == nearest-by-
    cosine identity holds identically (to the bit) in train, build,
    refresh, inline query and indexed query — a site that normalized
    differently would break the persisted==inline equality contract."""
    C = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(C, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return C / norms


def _sample_centroids(
    df: DataFrame, n_cells: int, id_col: str, vec_col: str, seed: int
) -> np.ndarray:
    """Deterministic seeded-sample centroids (xxhash64 order), unit-
    normalized. Centroid tables are tiny by design — driver-side.
    Null embeddings are excluded (nullable columns must not crash the
    sample); a ragged-length row is excluded with them by keeping the
    majority dimension."""
    rows = (
        df.select(F.col(vec_col).alias("v"), F.col(id_col).alias("i"))
        .filter(F.col(vec_col).isNotNull())
        .orderBy(F.pmod(F.xxhash64(F.col("i").cast("string"), F.lit(seed)), F.lit(1 << 31)))
        .limit(n_cells)
        .collect()
    )
    if not rows:
        return np.zeros((0, 0), dtype=np.float64)  # empty corpus
    dim = max(
        (len(r.v) for r in rows),
        key=lambda d: sum(1 for r in rows if len(r.v) == d),
    )
    rows = [r for r in rows if len(r.v) == dim]
    C = np.asarray([[float(x) for x in r.v] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(C, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return C / norms


def cosine_dup_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 64,
    bands: int = 8,
    seed: int = 42,
    exact: bool = False,
    method: str = "hyperplane",
    n_cells: int = 32,
    n_probe: int = 2,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: all (id_a < id_b) with
    cosine >= threshold.

    ``exact=True``: full O(n^2) cross product with the fold-ordered HOF
    cosine — the oracle path (bit-identical to the DuckDB oracle), fine
    up to ~10k vectors.

    Approximate candidate generators (both verify candidates with the
    vectorized numpy cosine, so no false accepts):

    - ``method="hyperplane"`` — banded random-hyperplane sign LSH.
      Per-band bucket space is 2^(n_planes/bands); per-plane collision
      prob for angle theta is 1 - theta/pi, so this is the right tool
      for HIGH thresholds (>= ~0.8, theta <= ~37deg) where a few wide
      bands give near-1 recall with tiny candidate volume. At moderate
      thresholds (theta ~60deg) no (bands, width) setting is both
      sub-quadratic and high-recall — use "ivf" instead.

    - ``method="ivf"`` — centroid blocking: assign every vector to its
      ``n_probe`` nearest of ``n_cells`` seeded-sample (or caller-
      trained) unit centroids; candidates are pairs sharing a cell.
      Candidate volume ~ n^2 * n_probe^2 / (2 * n_cells) when cells are
      balanced; recall comes from cluster coherence, which is exactly
      what moderate-threshold near-dup corpora have. Scale path: grow
      n_cells ~ sqrt(n) for O(n^1.5) total work (the FAISS coarse-
      quantizer regime).

    Everything is deterministic: seeded hyperplanes / xxhash64-ordered
    centroid samples, no driver randomness, no unbounded collect.
    """
    ids = df.select(F.col(id_col).alias("_id"), F.col(vec_col).alias("_v"))
    if exact:
        from .dedup import _spread

        # Per-row norms are hoisted out of the pair loop: norm(v) is
        # the same fold expression either way, so sim stays bit-
        # identical to the oracle while the O(n^2) stage computes one
        # dot (not dot + two norms) per pair. The left side is spread
        # across the parallelism BEFORE the non-equi join — a small
        # parquet scan arrives in one split, and a 1-partition probe
        # side serializes the entire nested-loop stage on one core.
        a = _spread(ids).withColumnsRenamed({"_id": "id_a", "_v": "va"}).withColumn(
            "na", _norm("va")
        )
        b = ids.withColumnsRenamed({"_id": "id_b", "_v": "vb"}).withColumn(
            "nb", _norm("vb")
        )
        cand = a.join(b, F.col("id_a") < F.col("id_b"))
        sim = F.coalesce(
            F.try_divide(_dot("va", "vb"), F.col("na") * F.col("nb")),
            F.lit(0.0),
        )
        return (
            cand.withColumn("sim", sim)
            .filter(F.col("sim") >= threshold)
            .select("id_a", "id_b", "sim")
        )

    def _empty():
        return df.select(
            F.col(id_col).alias("id_a"),
            F.col(id_col).alias("id_b"),
            F.lit(0.0).alias("sim"),
        ).limit(0)

    # Candidates carry IDS ONLY: deduping (id_a, id_b) longs is a
    # HashAggregate; dragging the vectors through the self-join would
    # force a sort-based aggregate on array keys and shuffle the
    # payload once per band (measured 10x slower). Vectors are
    # re-fetched afterwards by id join — broadcast at small scale,
    # shuffle-hash at 100 TB (AQE picks).
    if method == "ivf":
        if centroids is not None:
            if len(centroids) == 0:  # empty corpus produced no centroids
                return _empty()
            C = np.asarray(centroids, dtype=np.float64)
            norms = np.linalg.norm(C, axis=1, keepdims=True)
            norms[norms == 0.0] = 1.0
            C = C / norms
        else:
            C = _sample_centroids(df, n_cells, id_col, vec_col, seed)
        if len(C) == 0:  # empty corpus
            return _empty()
        banded = ids.select(
            "_id",
            F.explode(_centroid_cells_col(F.col("_v"), C, n_probe)).alias("bh"),
        ).withColumn("band", F.lit(0))
    else:
        # Only the hyperplane path needs the corpus dim up front (the
        # plane matrix is data-independent); probing it here instead of
        # before the branch saves one driver job per ivf call — the
        # recall probe runs two of those per entry.
        head = df.select(vec_col).first()
        if head is None:
            return _empty()
        dim = len(head[0])
        planes = _hyperplanes(dim, n_planes, seed)
        banded = ids.select(
            "_id",
            F.posexplode(_band_hash_col(F.col("_v"), planes, bands)).alias("band", "bh"),
        )

    a = banded.alias("a")
    b = banded.alias("b")
    cand_ids = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    va = ids.select(F.col("_id").alias("id_a"), F.col("_v").alias("va"))
    vb = ids.select(F.col("_id").alias("id_b"), F.col("_v").alias("vb"))
    return (
        cand_ids.join(va, "id_a")
        .join(vb, "id_b")
        .withColumn("sim", cosine_batch(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= threshold)
        .select("id_a", "id_b", "sim")
    )


def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    iterations: int = 5,
    sample_size: int = 2048,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list:
    """Train product-quantization codebooks: split each vector into
    ``m`` subvectors and k-means each subspace to ``k`` centroids
    (numpy Lloyd's on a bounded, xxhash64-ordered driver sample —
    deterministic; codebooks are tiny: m*k*(dim/m) floats). The PQ code
    of a vector is then m bytes instead of dim floats — the
    memory-compression leg of FAISS-style IVF-PQ, which is what makes
    billion-vector ANN fit a cluster's RAM. Returns a nested list
    (m, k, dim//m).

    SAMPLE BOUND: codebooks reflect only ``sample_size`` rows. On a
    corpus whose mode count approaches or exceeds the sample size the
    sample provably misses modes and ADC recall degrades — use
    ``train_pq_codebooks_distributed`` (full-corpus, one
    combiner-backed shuffle per iteration) when distribution drift
    from any bounded sample is a concern."""
    rows = (
        corpus.select(F.col(vec_col).alias("v"), F.col(id_col).alias("i"))
        .orderBy(F.pmod(F.xxhash64(F.col("i").cast("string"), F.lit(seed)), F.lit(1 << 31)))
        .limit(sample_size)
        .collect()
    )
    if not rows:
        return []
    X = np.asarray([[float(x) for x in r.v] for r in rows], dtype=np.float64)
    n, dim = X.shape
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    rng = np.random.RandomState(seed)
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        kk = min(k, n)
        C = S[rng.choice(n, size=kk, replace=False)]
        for _ in range(iterations):
            d2 = ((S[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(kk):
                mask = assign == c
                if mask.any():
                    C[c] = S[mask].mean(axis=0)
        books.append(C.copy())
    return [b.tolist() for b in books]


def train_pq_codebooks_distributed(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    iterations: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> list:
    """Product-quantization codebooks trained on the FULL corpus — the
    scale path next to ``train_pq_codebooks``'s bounded driver sample.
    Same contract (nested (m, k, dim//m) list), different execution:
    each Lloyd's iteration is ONE distributed pass handling all m
    subspaces at once —

    1. broadcast the current codebooks (m*k*(dim/m) floats — tiny)
       and assign every vector's m sub-codes with the vectorized
       ``pq_encode_col`` (map-only, Arrow-batched);
    2. partial-sum the per-(subspace, code, dim) coordinate sums with
       one groupBy — posexplode fans each vector into dim rows, but
       map-side combine collapses them to O(partitions * k * dim)
       shuffle rows before the exchange (the k-means|| partial-sum
       shape, and exactly the scale note on ``train_centroids``);
    3. collect the O(k * dim) aggregated sums and form the new means
       driver-side (codebooks are tiny by design).

    Cost per iteration: one codegen scan + one combiner-backed shuffle;
    no vector ever travels to the driver. Prefer this when the corpus
    distribution drifts from any bounded sample (the sampled trainer
    documents its ``sample_size`` bound; at 100 TB a 2048-row sample
    can miss whole modes)."""
    head = corpus.select(vec_col).first()
    if head is None:
        return []
    dim = len(head[0])
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m

    # deterministic seeded init: k vectors in xxhash order, sliced per subspace
    rows = (
        corpus.select(F.col(vec_col).alias("v"), F.col(id_col).alias("i"))
        .orderBy(
            F.pmod(F.xxhash64(F.col("i").cast("string"), F.lit(seed)), F.lit(1 << 31))
        )
        .limit(k)
        .collect()
    )
    X0 = np.asarray([[float(x) for x in r.v] for r in rows], dtype=np.float64)
    kk = X0.shape[0]
    books = [X0[:, j * dsub : (j + 1) * dsub].copy() for j in range(m)]

    for _ in range(iterations):
        enc = corpus.select(
            F.col(vec_col).alias("v"),
            pq_encode_col(F.col(vec_col), [b.tolist() for b in books]).alias("code"),
        )
        expl = enc.select(
            F.col("code"), F.posexplode(F.col("v")).alias("pos", "x")
        ).select(
            F.floor(F.col("pos") / dsub).cast("int").alias("j"),
            F.col("pos").alias("pos"),
            F.element_at(
                F.col("code"), (F.floor(F.col("pos") / dsub) + 1).cast("int")
            ).alias("c"),
            F.col("x").cast("double").alias("x"),
        )
        agg = (
            expl.groupBy("j", "c", "pos")
            .agg(F.sum("x").alias("s"), F.count(F.lit(1)).alias("n"))
            .collect()
        )
        new_books = [b.copy() for b in books]
        for r in agg:
            if r.c is not None and r.c < kk:
                new_books[r.j][r.c, r.pos - r.j * dsub] = r.s / r.n
        books = new_books
    return [b.tolist() for b in books]


def pq_encode_col(vec_col: Column, codebooks: list) -> Column:
    """array<int> PQ code (length m) — nearest codebook centroid per
    subspace, vectorized numpy over Arrow batches. Map-only; at scale
    this is the one-off compression pass whose output (m bytes/vector)
    replaces the raw vectors in the search index."""
    B = [np.asarray(b, dtype=np.float64) for b in codebooks]
    m = len(B)
    dsub = B[0].shape[1]

    @F.pandas_udf("array<int>")
    def _enc(v: pd.Series) -> pd.Series:
        if len(v) == 0:
            return pd.Series([], dtype="object")
        X = np.vstack(v.to_numpy()).astype(np.float64)
        codes = np.empty((X.shape[0], m), dtype=np.int32)
        for j in range(m):
            S = X[:, j * dsub : (j + 1) * dsub]
            d2 = ((S[:, None, :] - B[j][None, :, :]) ** 2).sum(axis=2)
            codes[:, j] = d2.argmin(axis=1)
        return pd.Series(list(codes))

    return _enc(vec_col)


def pq_adc_score(q_col: Column, code_col: Column, codebooks: list) -> Column:
    """Asymmetric-distance (ADC) dot product: the query stays full
    precision, the corpus side is reconstructed from its PQ code —
    score = sum_j dot(q_sub_j, codebook[j][code_j]). Vectorized gather
    per Arrow batch; the corpus vectors themselves never travel."""
    B = np.stack([np.asarray(b, dtype=np.float64) for b in codebooks])  # (m,k,dsub)
    m, _, dsub = B.shape

    @F.pandas_udf("double")
    def _adc(q: pd.Series, codes: pd.Series) -> pd.Series:
        if len(q) == 0:
            return pd.Series([], dtype="float64")
        Q = np.vstack(q.to_numpy()).astype(np.float64).reshape(-1, m, dsub)
        C = np.vstack(codes.to_numpy()).astype(np.int64)  # (n, m)
        rows = B[np.arange(m)[None, :], C]  # (n, m, dsub) gathered centroids
        return pd.Series(np.einsum("nmd,nmd->n", Q, rows))

    return _adc(q_col, code_col)


def pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_codes: int = 16,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    codebooks: list | None = None,
    refine: int = 4,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-PQ approximate top-k: coarse IVF cells bound the candidate
    set, PQ codes bound the MEMORY — candidates are scored from m-byte
    codes via ADC, so the search index is ~dim*4/m times smaller than
    the raw vectors (the only way a multi-billion-vector index fits a
    cluster). ``refine`` > 0 adds the standard FAISS refinement: the
    ADC pass keeps a ``refine * k`` shortlist, whose FULL vectors are
    then fetched by id join and re-ranked with exact cosine — PQ
    resolves clusters, the refine pass resolves fine ranking inside
    them, and only shortlist-sized vector traffic ever moves.
    ``refine=0`` returns the raw ADC ranking (score = approximate dot).
    Output: (query_id, neighbor_id, score, rank); neighbor_id breaks
    ties."""
    head = corpus.select(vec_col).first()
    if head is None:
        return corpus.select(
            F.col(id_col).alias("query_id"),
            F.col(id_col).alias("neighbor_id"),
            F.lit(0.0).alias("score"),
            F.lit(0).cast("long").alias("rank"),
        ).limit(0)
    if codebooks is None:
        codebooks = train_pq_codebooks(
            corpus, m=m, k=n_codes, id_col=id_col, vec_col=vec_col, seed=seed
        )
    # caller-supplied coarse cells (k-means-trained or oracle-seeded),
    # unit-normalized like every IVF site; default: seeded sample
    if centroids is None:
        C = _sample_centroids(corpus, n_cells, id_col, vec_col, seed)
    else:
        C = _unit_rows(centroids)
    assigned = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.element_at(_centroid_cells_col(F.col(vec_col), C, 1), 1).alias("cell"),
        pq_encode_col(F.col(vec_col), codebooks).alias("code"),
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probes = q.withColumn(
        "cell", F.explode(_centroid_cells_col(F.col("q_vec"), C, n_probe))
    ).select("query_id", "q_vec", "cell")
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("score", pq_adc_score(F.col("q_vec"), F.col("code"), codebooks))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    if refine <= 0:
        return (
            scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))
        )
    shortlist = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= refine * k)
        .select("query_id", "q_vec", "neighbor_id")
    )
    vecs = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    refined = shortlist.join(vecs, "neighbor_id").withColumn(
        "score", cosine_batch(F.col("q_vec"), F.col("c_vec"))
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("neighbor_id").asc()
    )
    return (
        refined.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "score", F.col("rank").cast("long").alias("rank"))
    )


def train_centroids(
    corpus: DataFrame,
    n_cells: int = 16,
    iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    init_centroids=None,
) -> list[list[float]]:
    """Lloyd's k-means over the embedding column (coarse quantizer
    training for IVF). Each iteration: one map-only nearest-centroid
    assignment pass (vectorized matmul against the broadcast centroid
    matrix, _centroid_cells_col), then a groupBy(cell) mean — the only
    shuffle. Returns unit-normalized centroids (driver-side list;
    centroid tables are tiny by design).

    Initialization is the deterministic seeded sample (xxhash64 order),
    so results are reproducible run-to-run.

    Scale note: the mean step collect_lists each cell's vectors into the
    aggregation buffer; at billions of rows per cell switch to
    posexplode(v) + groupBy(cell, dim) + sum — more shuffle rows, O(1)
    memory. Cell counts here are small enough that the simpler plan wins."""
    import numpy as np

    if init_centroids is not None:
        # Caller already holds the seeded-sample centroids (e.g. the
        # recall probe runs the sampled quantizer first) — skip the
        # duplicate sample job; Lloyd iterations proceed identically.
        cents = [np.asarray(c, dtype=np.float64) for c in init_centroids]
        cents = [c / (np.linalg.norm(c) or 1.0) for c in cents]
        if not cents:
            return []
        for _ in range(iterations):
            cents = _lloyd_step(corpus, vec_col, cents)
        return [c.tolist() for c in cents]

    rows = (
        corpus.select(F.col(vec_col).alias("v"), F.col(id_col).alias("i"))
        # null embeddings can't seed centroids (nullable array<float>
        # columns must not crash training; such rows assign cell=null)
        .filter(F.col(vec_col).isNotNull())
        .orderBy(F.pmod(F.xxhash64(F.col("i").cast("string"), F.lit(seed)), F.lit(1 << 31)))
        .limit(n_cells)
        .collect()
    )
    if not rows:
        return []  # empty corpus: nothing to train on
    # A ragged-length sample row would make the centroid matrix
    # inhomogeneous; keep the majority dimension's rows.
    dim = max((len(r.v) for r in rows), key=lambda d: sum(1 for r in rows if len(r.v) == d))
    cents = [
        np.asarray([float(x) for x in r.v], dtype=np.float64)
        for r in rows
        if len(r.v) == dim
    ]
    cents = [c / (np.linalg.norm(c) or 1.0) for c in cents]

    for _ in range(iterations):
        cents = _lloyd_step(corpus, vec_col, cents)
    return [c.tolist() for c in cents]


def _lloyd_step(corpus: DataFrame, vec_col: str, cents):
    """One Lloyd iteration: vectorized nearest-centroid assignment
    (numpy matmul over Arrow batches — the old O(n_cells x dim) literal
    expression tree cost ~2 s of Catalyst re-analysis per iteration
    before a single row moved), then a groupBy(cell) mean (the only
    shuffle). Returns the updated unit centroids."""
    import numpy as np

    assigned = corpus.select(F.col(vec_col).alias("v")).withColumn(
        "cell",
        F.element_at(_centroid_cells_col(F.col("v"), _unit_rows(cents), 1), 1),
    )
    means = (
        assigned.groupBy("cell")
        .agg(
            F.expr(
                f"aggregate(collect_list(v), array_repeat(0.0D, {len(cents[0])}), "
                "(acc, v) -> zip_with(acc, v, (a, x) -> a + CAST(x AS DOUBLE)))"
            ).alias("sum_v"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    new_cents = list(cents)
    for r in means:
        if r.cell is None:
            continue  # null/ragged embeddings assign a null cell
        m = np.asarray(r.sum_v, dtype=np.float64) / r.n
        norm = np.linalg.norm(m)
        if norm > 0:
            new_cents[r.cell] = m / norm
    return new_cents


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
        C = _sample_centroids(corpus, n_cells, id_col, vec_col, seed)
    else:
        # normalize CALLER centroids too (cosine_dup_pairs does the
        # same): the argmax-dot == nearest-by-cosine identity below
        # only holds for unit centroids, and a longer centroid would
        # silently bias assignment toward its cell
        C = _unit_rows(centroids)
    # Vectorized assignment/probing over the broadcast unit-centroid
    # matrix (_centroid_cells_col) — map-only, no shuffle, and no
    # O(n_cells x dim) literal expression tree for Catalyst to chew.
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    assigned = c.withColumn(
        "cell", F.element_at(_centroid_cells_col(F.col("c_vec"), C, 1), 1)
    )
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probes = q.withColumn(
        "cell", F.explode(_centroid_cells_col(F.col("q_vec"), C, n_probe))
    ).select("query_id", "q_vec", "cell")

    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_similarity("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def build_ivf_index(
    corpus: DataFrame,
    index_dir: str,
    n_cells: int = 16,
    train_iterations: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    lease_seconds: float = 3600.0,
) -> dict:
    """Build-once persisted IVF index: k-means-trained centroids
    (JSON sidecar) + the cell-assigned corpus written PARTITIONED BY
    CELL. Query time then pays zero training and zero assignment, and
    — because ``cell`` is a partition column — a probe join only reads
    the probed cells' files (static or dynamic partition pruning),
    which is the actual FAISS-IVF promise: touch n_probe/n_cells of
    the data. Layout::

        index_dir/centroids.json
        index_dir/assignments/cell=<c>/part-*.parquet

    Returns build stats. The build is one training run + one map-only
    assignment pass + one partitioned write (the write shuffles by
    cell — paid once, like any index build).

    Crash/concurrency discipline (round 10): the rebuild writes into a
    FRESH versioned data dir (``assignments-<lease>``) plus a versioned
    centroid sidecar and publishes both in ONE manifest CAS — the
    published index is never touched in place, so a rebuild that loses
    the race (or dies mid-write) leaves the serving index byte-intact
    and only an orphan dir for the age reaper. Builds and refreshes
    serialize on the same lease; a loser raises
    ConcurrentManifestSwapError with nothing published."""
    import json
    import os
    import time as _time

    from ..storage.cas import cas_swap_manifest, read_versioned_manifest

    cents = train_centroids(
        corpus, n_cells=n_cells, iterations=train_iterations,
        id_col=id_col, vec_col=vec_col, seed=seed,
    )
    # Lease BEFORE touching the index (training above only reads the
    # corpus): a rebuild racing an in-flight refresh must lose at the
    # manifest, not interleave data writes. An EXPIRED lease still in
    # its publishing phase is recovered first — its counts are already
    # committed, so its staged rows must land even though this rebuild
    # is about to supersede them (otherwise the dead refresh's
    # n_appended history and the next delta detection would disagree).
    os.makedirs(index_dir, exist_ok=True)
    m, base = read_versioned_manifest(index_dir, _read_ivf_manifest)
    _raise_if_lease_live(m, index_dir, "rebuild")
    _recover_expired_publish(index_dir, m)
    lease = _new_lease(lease_seconds)
    base = cas_swap_manifest(
        index_dir, dict(m, pending=lease), base,
        _write_ivf_manifest, what="ivf-rebuild lease",
    )
    tag = lease["id"][:12]
    data_dir = f"assignments-{tag}"
    cent_name = f"centroids-{tag}.json"
    # NOTE: no legacy centroids.json is written — overwriting the fixed
    # sidecar in place (pre-CAS) corrupted a pre-versioning index when
    # the rebuild failed after it, and post-CAS it still couldn't serve
    # legacy READER CODE correctly (such code also reads the fixed
    # assignments/ dir, which a versioned rebuild never rewrites).
    # Pre-round-10 indexes keep working via _ivf_paths' fallbacks; the
    # first rebuild upgrades them to versioned names.
    assigned = None
    try:
        assigned = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.element_at(
                _centroid_cells_col(F.col(vec_col), _unit_rows(cents), 1), 1
            ).alias("cell"),
        ).localCheckpoint()  # one pass: write + n_vectors count share
        # the materialized assignment instead of re-scanning the corpus
        assigned.repartition("cell").write.mode("overwrite").partitionBy(
            "cell"
        ).parquet(os.path.join(index_dir, data_dir))
        with open(
            os.path.join(index_dir, cent_name), "w", encoding="utf-8"
        ) as fh:
            json.dump(cents, fh)
        n = assigned.count()
        # single atomic publish: data dir + centroids + counts flip
        # together (and the pending lease is dropped by not carrying
        # it). The superseded artifacts get TOMBSTONES (retirement
        # timestamps) — the reaper's grace runs from retirement, so an
        # in-flight reader that resolved the old paths just before this
        # publish keeps its files for a full grace window.
        now = _time.time()
        grace = max(float(lease_seconds), 3600.0)
        # carry forward only tombstones whose artifact still exists —
        # the list must not grow without bound across nightly rebuilds
        retired = [
            t for t in (m.get("retired") or [])
            if isinstance(t, dict) and t.get("name")
            and os.path.exists(os.path.join(index_dir, t["name"]))
        ]
        # a pre-versioning index serves the FIXED names; retire those
        # too on the first versioned rebuild, or the stale legacy copy
        # would be kept (and silently served to legacy reader code)
        # forever
        old_names = (
            (m.get("data_dir"), m.get("centroids"))
            if m.get("data_dir")
            else ("assignments", "centroids.json")
        )
        for old_name in old_names:
            if (
                old_name
                and old_name not in (data_dir, cent_name)
                and os.path.exists(os.path.join(index_dir, old_name))
            ):
                # each tombstone records ITS OWN grace window, so every
                # later reaper honors the retiring writer's declared
                # reader grace (same invariant as the lease records)
                retired.append({"name": old_name, "ts": now, "grace": grace})
        cas_swap_manifest(
            index_dir,
            {
                "n_vectors": n,
                "n_cells": len(cents),
                "data_dir": data_dir,
                "centroids": cent_name,
                "retired": retired,
            },
            base,
            _write_ivf_manifest,
            what="ivf-index",
        )
    except BaseException:
        _release_ivf_lease(index_dir, lease)
        raise
    finally:
        if assigned is not None:
            release_local_checkpoint(assigned)
    _reap_ivf_garbage(index_dir, lease_seconds)
    return {"n_vectors": n, "n_cells": len(cents), "index_dir": index_dir}


def _recover_expired_publish(index_dir: str, manifest: dict) -> None:
    """Complete a dead holder's post-fence publish (idempotent renames)
    — called by BOTH the refresh and the rebuild before they supersede
    an expired lease. The dead refresh's counts are already committed,
    so dropping its staged rows would leave the manifest permanently
    ahead of the data (and the next anti-join would re-append and
    double-count them)."""
    import os

    stale = manifest.get("pending")
    if stale and stale.get("publishing"):
        _publish_staged_cells(
            os.path.join(index_dir, "_staging", stale["id"]),
            os.path.join(index_dir, manifest.get("data_dir", "assignments")),
        )


def _new_lease(lease_seconds: float) -> dict:
    """Pending-lease record: the holder DECLARES its window so every
    checker honors the same expiry (a short-leased caller must not
    supersede a live long-leased holder)."""
    import time as _time
    import uuid as _uuid

    return {
        "id": _uuid.uuid4().hex,
        "ts": _time.time(),
        "lease_seconds": float(lease_seconds),
    }


def _lease_live(pending) -> bool:
    import time as _time

    return bool(pending) and _time.time() - float(
        pending.get("ts", 0)
    ) < float(pending.get("lease_seconds", 3600.0))


def _raise_if_lease_live(manifest: dict, index_dir: str, who: str) -> None:
    if _lease_live(manifest.get("pending")):
        from ..storage.cas import ConcurrentManifestSwapError

        p = manifest["pending"]
        raise ConcurrentManifestSwapError(
            f"ivf-index writer already in progress in {index_dir} "
            f"(lease {p.get('id')}); {who} after it finishes or its "
            f"{p.get('lease_seconds', 3600.0)}s lease lapses"
        )


def _release_ivf_lease(index_dir: str, lease: dict) -> None:
    """Best-effort lease release: a transient error must not block
    writers for the whole lease window, so the swap is RETRIED through
    brief I/O hiccups before giving up. Losing the swap (someone else
    holds a newer version) means a takeover superseded us — nothing to
    release. If every retry fails, the lease expires on its own clock
    and the next writer recovers; a completed-but-unreleased publish
    blocking writers for the residual window is the availability price
    of lease-based fencing (the alternative — dropping the lease at
    the fence — reopened the double-publish hole)."""
    import time as _time

    from ..storage.cas import cas_swap_manifest, read_versioned_manifest

    for attempt in range(3):
        try:
            head, hv = read_versioned_manifest(index_dir, _read_ivf_manifest)
            if (head.get("pending") or {}).get("id") == lease["id"]:
                head.pop("pending", None)
                cas_swap_manifest(
                    index_dir, head, hv, _write_ivf_manifest,
                    what="ivf lease release",
                )
            return
        except Exception:
            if attempt == 2:
                return
            _time.sleep(0.1 * (attempt + 1))


def _ivf_paths(index_dir: str) -> tuple[str, str, dict]:
    """(assignments dir, centroids path, head manifest) resolved via
    the versioned manifest; pre-versioning indexes fall back to the
    legacy fixed names."""
    import os

    from ..storage.cas import read_versioned_manifest

    m, _v = read_versioned_manifest(index_dir, _read_ivf_manifest)
    return (
        os.path.join(index_dir, m.get("data_dir", "assignments")),
        os.path.join(index_dir, m.get("centroids", "centroids.json")),
        m,
    )


def _reap_ivf_garbage(index_dir: str, lease_seconds: float) -> None:
    """Reclaim dead index artifacts, with READER grace:

    - RETIRED data dirs / centroid sidecars (superseded by a rebuild,
      tombstoned with their retirement timestamp in the manifest) are
      deleted only once retired longer than max(lease window, 1h) — an
      in-flight query that resolved the old paths just before the
      publish keeps its files for a full grace window, measured from
      UNREFERENCE time, never from the (possibly hours-old) mtime.
    - Orphan versioned dirs a crashed build left behind were NEVER
      referenced by any manifest (no reader could resolve them), so
      their mtime is a safe clock.
    - Staging dirs from dead refreshes likewise (private to their
      writer until published).

    The artifacts of the current manifest and the dir named by a
    live-or-publishing pending are never touched."""
    import os
    import shutil as _shutil
    import time as _time

    from ..storage.cas import read_versioned_manifest

    m, _v = read_versioned_manifest(index_dir, _read_ivf_manifest)
    keep = {
        m.get("data_dir", "assignments"),
        m.get("centroids", "centroids.json"),
        "manifest.json",
        "_manifests",
    }
    retired = {
        t["name"]: (float(t.get("ts", 0)), float(t.get("grace", 3600.0)))
        for t in (m.get("retired") or [])
        if isinstance(t, dict) and t.get("name")
    }
    # the fixed legacy names stay protected only while they are the
    # serving copy (pre-versioning manifest) — once a rebuild retired
    # them they age out like any tombstoned artifact
    if not m.get("data_dir"):
        keep.update({"assignments", "centroids.json"})
    pending = m.get("pending") or {}
    min_age = max(float(lease_seconds), 3600.0)
    now = _time.time()

    def _mtime_old(path: str) -> bool:
        try:
            return now - os.path.getmtime(path) > min_age
        except OSError:
            return False

    def _rm(path: str) -> None:
        if os.path.isdir(path):
            _shutil.rmtree(path, ignore_errors=True)
        else:
            try:
                os.unlink(path)
            except OSError:
                pass

    try:
        names = os.listdir(index_dir)
    except FileNotFoundError:
        return
    for name in names:
        path = os.path.join(index_dir, name)
        if name in keep:
            continue
        if name == "_staging":
            try:
                subs = os.listdir(path)
            except FileNotFoundError:
                continue
            for sub in subs:
                if sub == pending.get("id"):
                    continue
                spath = os.path.join(path, sub)
                if _mtime_old(spath):
                    _shutil.rmtree(spath, ignore_errors=True)
            continue
        versioned = name.startswith("assignments-") or name.startswith(
            "centroids-"
        )
        if name in retired:
            ts, grace = retired[name]
            if now - ts > grace:
                _rm(path)
        elif versioned and _mtime_old(path):
            _rm(path)


def _write_ivf_manifest(index_dir: str, manifest: dict) -> None:
    """Atomic manifest swap (tmp + rename), same discipline as the
    rollup/tag-index manifests: readers never observe a torn state."""
    import json
    import os
    import uuid as _uuid

    path = os.path.join(index_dir, "manifest.json")
    tmp = path + f".{_uuid.uuid4().hex}.tmp"
    with open(tmp, "w", encoding="utf-8") as fh:
        json.dump(manifest, fh)
    os.replace(tmp, path)


def _read_ivf_manifest(index_dir: str) -> dict:
    import json
    import os

    path = os.path.join(index_dir, "manifest.json")
    if not os.path.exists(path):
        return {}
    with open(path, encoding="utf-8") as fh:
        return json.load(fh)


def refresh_ivf_index(
    spark,
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    delta_only: bool = False,
    lease_seconds: float = 3600.0,
) -> dict:
    """Incrementally fold NEW corpus rows into a ``build_ivf_index``
    index — the append path that keeps the index usable without the
    full-rebuild fallback (re-training + re-assigning the whole
    corpus). Mirrors the derived tag index's refresh contract
    (storage/tag_index.py): detect the un-indexed delta, process ONLY
    it, commit the manifest through the single-winner CAS swap.

    Concurrency (since round 10): the refresh takes a LEASE via a
    versioned manifest claim BEFORE appending, so a racing refresh
    raises ConcurrentManifestSwapError instead of double-appending the
    same delta (duplicated vectors would surface as repeated top-k
    neighbors). Crash recovery is the anti-join itself: a refresh that
    died mid-append holds the lease for ``lease_seconds``, after which
    a new refresh supersedes it and re-detects whatever rows are still
    missing — partial appends are absorbed, never duplicated (unless
    the caller bypasses detection with ``delta_only=True``, which keeps
    the single-writer burden it always had).

    Like FAISS ``add()``, a refresh never re-trains: new vectors are
    assigned to the EXISTING centroids with the same map-only argmax
    the build uses, then appended into the cell partitions
    (``partitionBy("cell")`` append — touched cells gain one file
    each, untouched cells' files are never rewritten). Cost is
    O(delta), not O(corpus): the only look at existing index data is
    an ids-only column-pruned scan for delta detection, and even that
    disappears when the caller passes the delta directly
    (``delta_only=True``).

    Centroid drift: after heavy appends the un-retrained centroids
    recall less; ``describe_ivf_index`` exposes ``n_appended`` vs
    ``n_trained`` so a maintenance scheduler can decide when a full
    rebuild is worth paying — the same WHEN-to-run contract as
    ``describe_store``."""
    import json
    import os

    from ..storage.cas import cas_swap_manifest, read_versioned_manifest

    # LEASE before any data lands: two refreshes computing the same
    # delta would BOTH land it (silently duplicated vectors — the
    # top-k would return repeated neighbors); claiming a manifest
    # version with a pending marker makes the second refresh raise
    # BEFORE writing anything. An EXPIRED lease still in the
    # 'publishing' phase is recovered first (its counts are committed,
    # so its staged rows must land exactly once — the per-file renames
    # are idempotent, see _publish_staged_cells).
    manifest, base = read_versioned_manifest(index_dir, _read_ivf_manifest)
    _raise_if_lease_live(manifest, index_dir, "refresh")
    _recover_expired_publish(index_dir, manifest)
    lease = _new_lease(lease_seconds)
    base = cas_swap_manifest(
        index_dir, dict(manifest, pending=lease), base,
        _write_ivf_manifest, what="ivf-refresh lease",
    )
    manifest.pop("pending", None)

    assignments_dir, centroids_path, _m = _ivf_paths(index_dir)
    with open(centroids_path, encoding="utf-8") as fh:
        centroids = json.load(fh)
    n_cells = len(centroids)

    assigned = None
    staging = os.path.join(index_dir, "_staging", lease["id"])
    try:
        if delta_only:
            delta = corpus
        else:
            indexed_ids = spark.read.parquet(assignments_dir).select(
                F.col("neighbor_id").alias(id_col)
            )
            delta = corpus.join(indexed_ids, on=id_col, how="left_anti")

        assigned = delta.select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("c_vec"),
            F.element_at(
                _centroid_cells_col(F.col(vec_col), _unit_rows(centroids), 1), 1
            ).alias("cell"),
        ).localCheckpoint()  # one pass: count + write reuse the same
        # materialized delta instead of re-running the anti-join and the
        # n_cells-score argmax twice (the expensive stages of a refresh)
        n_new = assigned.count()
        if n_new:
            # STAGE, don't append: the write lands in a private dir the
            # readers never union, so a holder whose lease lapses
            # mid-job (long GC pause, slow stage) can never publish —
            # the finalize CAS below is the FENCING TOKEN, and only its
            # winner (or, after expiry, a recoverer completing its
            # marker) moves staged files into the live partitions.
            assigned.repartition("cell").write.mode("overwrite").partitionBy(
                "cell"
            ).parquet(staging)
        if "n_vectors" not in manifest:
            # Index predates manifests (bare build): derive the baseline
            # once from what IS on disk, so refresh/describe never report
            # a delta-only n_vectors or a fabricated n_cells=0 that would
            # trip the rebuild scheduler.
            manifest["n_cells"] = n_cells
            manifest["n_vectors"] = spark.read.parquet(assignments_dir).count()
        manifest["n_vectors"] = int(manifest.get("n_vectors", 0)) + n_new
        manifest["n_appended"] = int(manifest.get("n_appended", 0)) + n_new
        # FINALIZE = the fencing token, committed WITH the lease still
        # held and a 'publishing' marker: counts and staged data flip
        # together — a crash after this commit is recovered by the next
        # writer completing the publish (never re-counting), a loss of
        # this claim means a takeover superseded us and our staged rows
        # are never published. The count can never drift from the data.
        cas_swap_manifest(
            index_dir,
            dict(manifest, pending=dict(lease, publishing=True)),
            base,
            _write_ivf_manifest,
            what="ivf-refresh",
        )
    except BaseException:
        _release_ivf_lease(index_dir, lease)
        import shutil as _shutil

        _shutil.rmtree(staging, ignore_errors=True)
        raise
    finally:
        # free the pin on success AND failure (the publish below reads
        # staged FILES, never the frame)
        if assigned is not None:
            release_local_checkpoint(assigned)
    # publish under the held lease: idempotent deterministic renames —
    # a stalled twin (or a recoverer) moving the same files collides on
    # the same destination names and each file lands exactly once
    if n_new:
        _publish_staged_cells(staging, assignments_dir)
    # release: drop the pending marker. Losing THIS swap means our
    # lease expired mid-publish and a recoverer superseded us after
    # completing our publish — nothing left to do either way.
    _release_ivf_lease(index_dir, lease)
    _reap_ivf_garbage(index_dir, lease_seconds)
    return {"n_new": n_new, "n_vectors": manifest["n_vectors"], "index_dir": index_dir}


def _publish_staged_cells(staging: str, assignments: str) -> None:
    """Move a FENCED refresh's staged cell files into the live
    partition dirs (same-filesystem renames; POSIX/HDFS semantics),
    then remove the staging dir. IDEMPOTENT and race-safe: destination
    names derive deterministically from source names, so a stalled
    holder and a recoverer moving the same staging dir collide on the
    same dst and each file publishes exactly once (the loser's rename
    finds the source gone and skips). A missing staging dir is a
    completed publish. Spark's partitioned readers pick up new files
    in existing and new cell dirs alike."""
    import os as _os
    import shutil as _shutil

    tag = _os.path.basename(staging)[:12]
    try:
        cells = sorted(_os.listdir(staging))
    except FileNotFoundError:
        return  # a concurrent publisher already completed + removed it
    for cell in cells:
        src_cell = _os.path.join(staging, cell)
        if not cell.startswith("cell="):
            continue
        dst_cell = _os.path.join(assignments, cell)
        try:
            names = sorted(_os.listdir(src_cell))
        except (FileNotFoundError, NotADirectoryError):
            continue  # concurrent publisher finished this cell
        _os.makedirs(dst_cell, exist_ok=True)
        for name in names:
            if not name.endswith(".parquet"):
                continue
            try:
                _os.rename(
                    _os.path.join(src_cell, name),
                    _os.path.join(dst_cell, f"ref-{tag}-{name}"),
                )
            except FileNotFoundError:
                continue  # a concurrent publisher moved it first
    _shutil.rmtree(staging, ignore_errors=True)


def describe_ivf_index(spark, index_dir: str, corpus: DataFrame = None,
                       id_col: str = "vec_id") -> dict:
    """Health card for a persisted IVF index — what a maintenance
    scheduler reads to decide between ``refresh_ivf_index`` (cheap,
    O(delta)) and a full ``build_ivf_index`` (re-train, O(corpus)).
    With ``corpus`` given, ``fresh`` is EXACT: an ids-only anti-join
    counts corpus rows the index has not assigned (the tag index's
    is_fresh analog, paid as one column-pruned scan)."""
    import json
    import os

    assignments_dir, centroids_path, manifest = _ivf_paths(index_dir)
    if "n_vectors" not in manifest:
        # Manifest-less index (bare build): report real counts from
        # disk instead of zeros a rebuild scheduler would act on.
        with open(centroids_path, encoding="utf-8") as fh:
            manifest["n_cells"] = len(json.load(fh))
        manifest["n_vectors"] = spark.read.parquet(assignments_dir).count()
    out = {
        "index_dir": index_dir,
        "n_vectors": int(manifest.get("n_vectors", 0)),
        "n_cells": int(manifest.get("n_cells", 0)),
        "n_appended": int(manifest.get("n_appended", 0)),
        "n_trained": int(manifest.get("n_vectors", 0))
        - int(manifest.get("n_appended", 0)),
    }
    if corpus is not None:
        import os

        indexed_ids = spark.read.parquet(assignments_dir).select(
            F.col("neighbor_id").alias(id_col)
        )
        missing = corpus.join(indexed_ids, on=id_col, how="left_anti").count()
        out["missing_vectors"] = missing
        out["fresh"] = missing == 0
    return out


def ivf_topk_indexed(
    spark,
    index_dir: str,
    queries: DataFrame,
    k: int = 5,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query a ``build_ivf_index`` index: load the (tiny) centroid
    sidecar, rank each query's n_probe cells map-only, then a
    broadcast probe join against the cell-partitioned assignment
    table — the partition column lets Spark prune unprobed cells'
    files instead of scanning the corpus. Same output contract as
    ``ivf_topk``: (query_id, neighbor_id, sim, rank)."""
    import json

    assignments_dir, centroids_path, _m = _ivf_paths(index_dir)
    with open(centroids_path, encoding="utf-8") as fh:
        centroids = json.load(fh)

    assigned = spark.read.parquet(assignments_dir)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec"))
    probes = q.withColumn(
        "cell",
        F.explode(_centroid_cells_col(F.col("q_vec"), _unit_rows(centroids), n_probe)),
    ).select("query_id", "q_vec", "cell")
    scored = (
        assigned.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("sim", cosine_similarity("q_vec", "c_vec"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )
