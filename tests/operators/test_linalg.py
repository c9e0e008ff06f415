"""Distributed-PCA invariants: the quantized Gramian must equal a
driver-side numpy computation on the same quantized grid exactly; the
spectrum contract columns must hold; malformed vectors are skipped."""

import numpy as np
import pytest

from factstore_spark.operators import linalg as L

DIM = 8
SCALE = 1 << 16


def _mk(spark, x):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    # anisotropic cloud: one dominant direction so evr is top-heavy
    base = rng.normal(size=(400, DIM)) * 0.05
    base[:, 0] += rng.normal(size=400) * 2.0
    # float32 round-trip first: that is what the array<float> column stores
    return base.astype(np.float32).astype(np.float64)


def test_combined_gram_exact_vs_numpy(spark, cloud):
    n, mean, cov = L.combined_gram(_mk(spark, cloud), dim=DIM, scale=SCALE)
    q = np.floor(cloud * SCALE).astype(np.int64)
    assert n == 400
    want_mean = q.sum(axis=0) / (n * SCALE)
    want_cov = (q.T @ q) / (n * SCALE * SCALE) - np.outer(want_mean, want_mean)
    # exact integer sums -> identical float64 derivation
    assert np.array_equal(mean, want_mean)
    assert np.array_equal(cov, want_cov)


def test_combined_gram_deterministic_across_partitioning(spark, cloud):
    df = _mk(spark, cloud)
    a = L.combined_gram(df.repartition(1), dim=DIM, scale=SCALE)
    b = L.combined_gram(df.repartition(13), dim=DIM, scale=SCALE)
    assert a[0] == b[0]
    assert np.array_equal(a[2], b[2])


def test_pca_variance_contract_and_spectrum(spark, cloud):
    out = L.pca_variance(spark, _mk(spark, cloud), dim=DIM, top_k=DIM).collect()
    assert len(out) == DIM
    for r in out:
        assert r.trace_match_bp == 10000
        assert r.psd_ok == 1 and r.monotone_ok == 1 and r.orthonormal_ok == 1
        assert r.n_vectors == 400
    # dominant direction captures almost all variance
    assert out[0].evr_bp > 9000
    assert out[-1].cum_evr_bp in (9999, 10000)
    # evr matches numpy eigh on the same quantized covariance
    q = np.floor(cloud * SCALE).astype(np.int64)
    m = q.sum(axis=0) / (400 * SCALE)
    cov = (q.T @ q) / (400 * SCALE * SCALE) - np.outer(m, m)
    w = np.sort(np.linalg.eigvalsh(cov))[::-1]
    want = np.floor(10000.0 * w / np.trace(cov)).astype(int)
    assert [r.evr_bp for r in out] == list(want)


def test_malformed_vectors_skipped(spark, cloud):
    good = _mk(spark, cloud[:50])
    bad = spark.createDataFrame(
        [(1000, None), (1001, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    n, _, cov = L.combined_gram(good.unionByName(bad), dim=DIM, scale=SCALE)
    n2, _, cov2 = L.combined_gram(good, dim=DIM, scale=SCALE)
    assert n == n2 == 50
    assert np.array_equal(cov, cov2)


def test_nonfinite_elements_skipped(spark, cloud):
    """A vector with a NaN/inf/null ELEMENT must be excluded entirely:
    np.floor(nan).astype(int64) is undefined garbage, while a SQL
    oracle's SUM silently skips nulls — symmetric exclusion is the only
    consistent contract (ADVICE r9, linalg.py:69)."""
    good = _mk(spark, cloud[:50])
    dirty = spark.createDataFrame(
        [
            (2000, [float("nan")] + [1.0] * (DIM - 1)),
            (2001, [float("inf")] + [1.0] * (DIM - 1)),
            (2002, [None] + [1.0] * (DIM - 1)),
        ],
        "vec_id long, embedding array<float>",
    )
    n, _, cov = L.combined_gram(good.unionByName(dirty), dim=DIM, scale=SCALE)
    n2, _, cov2 = L.combined_gram(good, dim=DIM, scale=SCALE)
    assert n == n2 == 50
    assert np.array_equal(cov, cov2)


def test_testdata_embeddings_all_finite(spark):
    """Guard for the bit-exact gram oracle: the sf0.001 embeddings
    table must contain no null/NaN/inf elements, so the Spark-side
    whole-row exclusion and the DuckDB SUM never diverge (mirrors
    test_frame_dup_oracle_char_byte_equivalence)."""
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    bad = emb.filter(
        F.exists(
            "embedding",
            lambda x: x.isNull() | F.isnan(x) | (F.abs(x) > F.lit(1e30)),
        )
    ).count()
    assert bad == 0


def test_empty_input(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    n, mean, cov = L.combined_gram(empty, dim=DIM)
    assert (n, mean, cov) == (0, None, None)
    assert L.pca_variance(spark, empty, dim=DIM).count() == 0


def test_mahalanobis_topk_matches_brute_force(spark, cloud):
    # plant an outlier along the LOW-variance axis: small L2 distance,
    # huge Mahalanobis — the covariance-awareness this operator exists for
    pts = cloud.copy()
    pts[0] = pts.mean(axis=0)
    pts[0, DIM - 1] += 1.0  # ~20x the 0.05 std of that axis
    pts = pts.astype(np.float32).astype(np.float64)
    out = L.mahalanobis_topk(
        spark, _mk(spark, pts), id_col="vec_id", dim=DIM, scale=SCALE, top_k=10
    ).collect()
    assert len(out) == 10
    for r in out:
        assert r.probe_match_bp == 10000
        assert r.calib_ok == 1 and 9900 <= r.calib_bp <= 10001
        assert r.n_vectors == 400
    assert out[0].vec_id == 0  # the planted outlier wins
    # brute force with the operator's own covariance definition
    q = np.floor(pts * SCALE).astype(np.int64)
    m = q.sum(axis=0) / (400 * SCALE)
    cov = (q.T @ q) / (400 * SCALE * SCALE) - np.outer(m, m)
    eps = 1e-6 * np.trace(cov) / DIM
    prec = np.linalg.inv(cov + eps * np.eye(DIM))
    prec = (prec + prec.T) / 2.0
    xc = pts - m
    d2 = (xc @ prec * xc).sum(axis=1)
    want = sorted(range(400), key=lambda i: (-d2[i], i))[:10]
    assert [r.vec_id for r in out] == want
    got_d2 = np.array([r.d2 for r in out])
    assert np.allclose(got_d2, d2[want], rtol=1e-9)


def test_mahalanobis_empty_and_malformed(spark):
    empty = spark.createDataFrame([], "vec_id long, embedding array<float>")
    assert L.mahalanobis_topk(spark, empty, dim=DIM).count() == 0
