"""Distributed dense linear algebra over embedding columns: exact
covariance/Gramian accumulation and PCA variance decomposition.

Scale design (what makes this the 100 TB shape):

- **One pass, fixed-size state.** The Gramian ``sum(x xᵀ)``, the sum
  vector and the row count are ASSOCIATIVE partials of size
  ``O(dim²)`` — each Arrow batch folds into a single numpy
  accumulator; each partition emits ONE partial row. The shuffle that
  combines them moves ``partitions × (dim² + dim + 1)`` integers,
  independent of row count. This is the classic distributed-PCA /
  whitening shape (the preprocessing step of SemDeDup-style embedding
  pipelines and of Mahalanobis outlier scoring).
- **Exact integer arithmetic across the aggregation boundary.**
  Float sums are order-dependent and Spark's combine order is not
  deterministic, so the accumulator QUANTIZES each coordinate to an
  integer grid (``floor(x * scale)``) and sums int64 exactly; the
  Spark-side combine casts partials to ``decimal(38,0)`` so even
  planetary totals cannot overflow. The decomposition is then a
  deterministic function of exact integers — rerunning the job gives
  bit-identical eigenvalues (SCALE.md rule #4: no floats across
  aggregation boundaries).
- **Driver work is O(dim²) only.** The combined partials (4,161
  values at dim=64) collapse to the driver, which does the ``eigh`` —
  the one step that is genuinely cheaper centralized than distributed
  for dims up to a few thousand.

Per-batch int64 overflow bound: ``q = floor(x * scale)`` with
``|x| <= B`` gives ``|q| <= B * scale``; a batch of ``r`` rows adds at
most ``r * (B * scale)²`` to a Gramian cell. With the default
``scale = 2^16`` and B ~ 4, that is ~6.9e10 per row — int64 holds
~1.3e8 such rows per PARTITION before overflow, far above any sane
Arrow batch/partition size; the cross-partition total is decimal-exact.
"""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def gram_partials(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1 << 16,
) -> DataFrame:
    """Per-partition exact quantized-Gramian partials.

    Output: one row per non-empty partition with
    ``(n long, acc array<long>)`` where ``acc`` is
    ``[sum(q)..., rowmajor sum(q qᵀ)...]`` of length ``dim + dim²``
    over quantized vectors ``q = floor(x * scale)``. Rows with null or
    wrong-length vectors are skipped (counted out of ``n``), as are
    vectors containing null/NaN/inf ELEMENTS — ``np.floor(nan)`` cast
    to int64 is undefined garbage on the Spark side while a SQL
    oracle's SUM silently skips nulls, so dirty elements must be
    excluded symmetrically rather than quantized.
    """

    def fold(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        s = np.zeros(dim, dtype=np.int64)
        g = np.zeros((dim, dim), dtype=np.int64)
        for pdf in batches:
            vecs = [
                v
                for v in pdf[vec_col]
                if v is not None and len(v) == dim
            ]
            if not vecs:
                continue
            x = np.asarray(np.stack(vecs), dtype=np.float64)
            finite = np.isfinite(x).all(axis=1)
            if not finite.all():
                x = x[finite]
                if x.shape[0] == 0:
                    continue
            q = np.floor(x * scale).astype(np.int64)
            n += q.shape[0]
            s += q.sum(axis=0)
            g += q.T @ q
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "acc": [np.concatenate([s, g.reshape(-1)]).tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(
        fold, schema="n long, acc array<long>"
    )


def combined_gram(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1 << 16,
) -> tuple[int, Optional[np.ndarray], Optional[np.ndarray]]:
    """Exact combined ``(n, mean, covariance)`` of the quantized grid.

    The partials posexplode to ``(pos, val)`` and combine with a
    ``decimal(38,0)`` sum — exact at any scale, and a shuffle of only
    ``partitions × (dim² + dim + 1)`` values. Returns float64
    ``mean``/``cov`` on the ORIGINAL (unquantized) axis scale;
    ``(0, None, None)`` on an empty input.
    """
    n, tot = _gram_sums(df, vec_col, dim, scale)
    if not n:
        return 0, None, None
    return (n, *_mean_cov(tot, n, dim, scale))


def combined_gram_with_trace(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1 << 16,
) -> tuple[int, Optional[np.ndarray], Optional[np.ndarray], int]:
    """``combined_gram`` plus the EXACT integer Gramian trace (Σ q·q
    over the quantized grid) from the SAME single pass — the witness
    column the battery's Mahalanobis oracle recomputes in SQL, without
    paying a second corpus scan for it."""
    n, tot = _gram_sums(df, vec_col, dim, scale)
    if not n:
        return 0, None, None, 0
    trace = sum(tot[dim + i * dim + i] for i in range(dim))
    return (n, *_mean_cov(tot, n, dim, scale), trace)


def _gram_sums(df, vec_col: str, dim: int, scale: int) -> tuple[int, list[int]]:
    """One pass: (row count, EXACT integer accumulator of length
    dim + dim²) — decimal(38,0) combine, Python-int results."""
    partials = gram_partials(df, vec_col, dim, scale)
    combined = (
        partials.select(
            F.col("n").cast("decimal(38,0)").alias("v0"),
            F.posexplode("acc").alias("pos", "v"),
        )
        .groupBy("pos")
        .agg(
            F.sum(F.col("v").cast("decimal(38,0)")).alias("sv"),
            F.sum("v0").alias("sn"),
        )
        .collect()
    )
    if not combined:
        return 0, []
    # sn repeats the total row count on every pos row (summed per
    # group over identical per-partial values / #pos — instead take it
    # from pos 0 where it is just sum(n)).
    tot = [0] * (dim + dim * dim)
    n = 0
    for row in combined:
        tot[row.pos] = int(row.sv)
        if row.pos == 0:
            n = int(row.sn)
    return n, tot


def _mean_cov(
    tot: list[int], n: int, dim: int, scale: int
) -> tuple[np.ndarray, np.ndarray]:
    total = np.asarray(tot, dtype=np.float64)
    s = total[:dim]
    g = total[dim:].reshape(dim, dim)
    mean = s / (n * scale)
    # E[qqᵀ]/scale² - mean meanᵀ: population covariance on the
    # quantized grid, exact given the integer sums.
    cov = g / (n * scale * scale) - np.outer(mean, mean)
    return mean, cov


def mahalanobis_topk(
    spark,
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1 << 16,
    top_k: int = 25,
    probe_k: int = 200,
    gram: Optional[tuple] = None,
) -> DataFrame:
    """Top-k embedding outliers by exact-covariance Mahalanobis
    distance — the covariance-aware outlier filter an embedding
    curation pass wants (isotropic cosine/L2 misses outliers that hide
    along high-variance axes).

    Two jobs: (1) the one-pass exact Gramian (``combined_gram`` —
    fixed-size partials, row-count-independent shuffle) gives the mean
    and a ridge-regularized precision matrix on the driver
    (``eps = 1e-6·trace/dim`` keeps Cholesky solvable on degenerate
    clouds); (2) a map-only scoring pass — mean/precision ship to
    executors as O(dim²) closure constants, each Arrow batch scores as
    one ``(Xc @ P * Xc).sum(1)`` gemm — followed by a global top-k
    (TakeOrdered: per-partition heaps, k rows to the driver; ties
    break by id).

    Contract columns (the rows-only gate enforces them):

    - ``probe_match_bp`` — the top-k distances recomputed DRIVER-side
      from the winners' own vectors with the same float64 expression
      must agree to 1e-9 relative (== 10000).
    - ``calib_bp`` — round(10000 · avg(d²) / dim). With the precision
      matrix inverted from this corpus's OWN population covariance,
      ``Σ d² = n·dim`` exactly (trace identity), so avg(d²)/dim must
      sit at 1 up to ridge + quantization slack; enforced in
      [9900, 10001] via ``calib_ok``.

    Output: one row per winner, rank 1..k by descending d².

    ``gram``: an already-computed ``(n, mean, cov)`` from
    :func:`combined_gram` / :func:`combined_gram_with_trace` — callers
    that also need the exact trace (the battery's oracle witness) pass
    it in so the corpus is scanned once for the Gramian, not twice.
    """
    n, mean, cov = gram if gram is not None else combined_gram(
        df, vec_col, dim, scale
    )
    empty_schema = (
        f"{id_col} long, rank long, d2 double, n_vectors long, "
        "probe_match_bp long, calib_bp long, calib_ok long"
    )
    if n == 0 or cov is None:
        return spark.createDataFrame([], empty_schema)
    eps = 1e-6 * float(np.trace(cov)) / dim
    prec = np.linalg.inv(cov + eps * np.eye(dim))
    prec = (prec + prec.T) / 2.0
    mean_b, prec_b = mean.copy(), prec.copy()

    def score(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            keep = [
                (i, v)
                for i, v in zip(pdf[id_col], pdf[vec_col])
                if v is not None and len(v) == dim
            ]
            if not keep:
                continue
            ids = np.asarray([i for i, _ in keep])
            x = np.asarray(
                np.stack([v for _, v in keep]), dtype=np.float64
            )
            # mirror gram_partials' exclusion of non-finite ELEMENTS:
            # the covariance never saw these rows, so scoring them
            # would emit NaN/inf d2 (Spark sorts NaN above everything,
            # a dirty vector would win the top-k) and poison the
            # calibration sum into a ValueError at the round()
            finite = np.isfinite(x).all(axis=1)
            if not finite.all():
                ids, x = ids[finite], x[finite]
                if x.shape[0] == 0:
                    continue
            xc = x - mean_b
            d2 = (xc @ prec_b * xc).sum(axis=1)
            yield pd.DataFrame({id_col: ids, "d2": d2})

    # ONE scoring pass: the (id, d2) frame is 16 bytes/row, so pinning
    # it lets the calibration aggregate AND the top-k read the same
    # materialization — unpinned, each action re-ran the full Arrow
    # gemm over the corpus (bench r10: the entry's 1.5x regression was
    # exactly this second scoring scan plus the winner probe).
    from ..session import release_local_checkpoint

    scored = (
        df.select(id_col, vec_col)
        .mapInPandas(score, schema=f"{id_col} long, d2 double")
        .localCheckpoint(eager=True)
    )
    try:
        # calibration over the FULL corpus: tolerance-banded, so the
        # order-dependent float sum across partitions is fine here
        stats = scored.agg(
            F.sum("d2").alias("s"), F.count(F.lit(1)).alias("m")
        ).collect()[0]
        if not stats.m:
            return spark.createDataFrame([], empty_schema)
        calib_bp = int(round(10000.0 * float(stats.s) / (stats.m * dim)))
        calib_ok = int(9900 <= calib_bp <= 10001)
        top = (
            scored.orderBy(F.col("d2").desc(), F.col(id_col).asc())
            .limit(top_k)
            .collect()
        )
    finally:
        release_local_checkpoint(scored)
    win_ids = [r[id_col] for r in top]
    probe = {
        r[id_col]: r[vec_col]
        for r in df.filter(F.col(id_col).isin(win_ids[:probe_k]))
        .select(id_col, vec_col)
        .collect()
    }
    ok = True
    for r in top[:probe_k]:
        v = probe.get(r[id_col])
        if v is None or len(v) != dim:
            ok = False
            break
        xc = np.asarray(v, dtype=np.float64) - mean_b
        want = float(xc @ prec_b @ xc)
        if abs(want - r.d2) > 1e-9 * max(abs(want), 1.0):
            ok = False
            break
    probe_match_bp = 10000 if ok else 0
    rows = [
        (
            int(r[id_col]),
            i + 1,
            float(r.d2),
            int(stats.m),
            probe_match_bp,
            calib_bp,
            calib_ok,
        )
        for i, r in enumerate(top)
    ]
    return spark.createDataFrame(rows, empty_schema)


def pca_variance(
    spark,
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1 << 16,
    top_k: int = 8,
) -> DataFrame:
    """PCA variance decomposition with self-validating contract columns.

    One row per top-``k`` principal component:
    ``component`` (0-based), ``evr_bp`` / ``cum_evr_bp`` (variance
    explained, basis points of total variance), plus contract columns
    the rows-only gate enforces:

    - ``trace_match_bp`` — round(10000 · Σλ / trace(cov)): eigenvalue
      sum must preserve the trace (== 10000).
    - ``psd_ok`` — smallest eigenvalue ≥ -1e-8 · largest (covariance
      matrices are PSD; quantization cannot break that).
    - ``monotone_ok`` — eigenvalues non-increasing down the rows.
    - ``orthonormal_ok`` — max |VᵀV − I| < 1e-8.

    Deterministic end to end: the integer sums are exact, so ``eigh``
    sees bit-identical input on every run.
    """
    n, _mean, cov = combined_gram(df, vec_col, dim, scale)
    if n == 0 or cov is None:
        return spark.createDataFrame(
            [],
            "component long, evr_bp long, cum_evr_bp long, n_vectors long, "
            "trace_match_bp long, psd_ok long, monotone_ok long, "
            "orthonormal_ok long",
        )
    w, v = np.linalg.eigh(cov)
    order = np.argsort(w)[::-1]
    w, v = w[order], v[:, order]
    trace = float(np.trace(cov))
    trace_match_bp = int(round(10000.0 * float(w.sum()) / trace)) if trace else 0
    psd_ok = int(bool(w[-1] >= -1e-8 * max(w[0], 1e-30)))
    monotone_ok = int(bool(np.all(np.diff(w) <= 1e-12)))
    orthonormal_ok = int(
        bool(np.max(np.abs(v.T @ v - np.eye(dim))) < 1e-8)
    )
    k = min(top_k, dim)
    evr_bp = np.floor(10000.0 * w / trace).astype(np.int64)
    cum = np.cumsum(w)
    cum_bp = np.floor(10000.0 * cum / trace).astype(np.int64)
    rows = [
        (
            int(i),
            int(evr_bp[i]),
            int(cum_bp[i]),
            int(n),
            trace_match_bp,
            psd_ok,
            monotone_ok,
            orthonormal_ok,
        )
        for i in range(k)
    ]
    return spark.createDataFrame(
        rows,
        "component long, evr_bp long, cum_evr_bp long, n_vectors long, "
        "trace_match_bp long, psd_ok long, monotone_ok long, "
        "orthonormal_ok long",
    )
