"""Similarity-search invariants: exact top-k correctness on a corpus
with known geometry; IVF recall against brute force."""

import pytest

from factstore_spark.operators import similarity as S


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.9, 0.1]),   # closest to 2
        (4, [-1.0, 0.0, 0.0]),  # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_brute_force_topk_geometry(vectors):
    q = vectors.filter("vec_id = 0")
    out = S.brute_force_topk(vectors, q, k=2).collect()
    assert [(r.neighbor_id, r.rank) for r in out] == [(1, 1), (2, 2)]
    assert out[0].sim == pytest.approx(0.9 / (0.9**2 + 0.1**2) ** 0.5, rel=1e-6)


def test_topk_excludes_self_and_orders_desc(vectors):
    out = S.brute_force_topk(vectors, vectors, k=4).collect()
    by_query = {}
    for r in out:
        by_query.setdefault(r.query_id, []).append(r)
    for qid, rows in by_query.items():
        assert all(r.neighbor_id != qid for r in rows)
        sims = [r.sim for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert [r.rank for r in rows] == list(range(1, len(rows) + 1))


def test_ivf_recall_against_brute_force(spark):
    import random

    rnd = random.Random(7)
    rows = [
        (i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(200)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id < 5")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(df, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(df, q, k=5, n_cells=8, n_probe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5  # half the cells probed -> decent recall floor


def test_cosine_dup_pairs_exact_vs_lsh_recall(spark):
    """LSH candidates + exact verify must recover most of the exact
    pairs, and every LSH pair must BE an exact pair (no false accepts —
    candidates are verified with true cosine)."""
    import random

    rnd = random.Random(11)
    rows = []
    for i in range(100):
        base = [rnd.gauss(0, 1) for _ in range(16)]
        rows.append((2 * i, base))
        # near-duplicate: tiny perturbation
        rows.append((2 * i + 1, [x + rnd.gauss(0, 0.01) for x in base]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.id_a, r.id_b)
        for r in S.cosine_dup_pairs(df, threshold=0.99, exact=True).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in S.cosine_dup_pairs(df, threshold=0.99, n_planes=16, bands=8).collect()
    }
    assert len(exact) >= 100  # every perturbed twin pair found
    assert lsh <= exact      # verification removes all false positives
    assert len(lsh & exact) / len(exact) >= 0.9  # high recall at theta~8deg


def test_cosine_dup_pairs_ivf_blocking(spark):
    """Centroid-blocked candidates (the moderate-threshold scale path)
    must be a subset of the exact pairs (verified candidates) and find
    most of them on clustered data."""
    import random

    rnd = random.Random(5)
    rows = []
    # clustered corpus: blocking recall comes from cluster coherence
    for c in range(4):
        center = [rnd.gauss(0, 3) for _ in range(16)]
        for i in range(30):
            rows.append((c * 30 + i, [x + rnd.gauss(0, 0.4) for x in center]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    exact = {
        (r.id_a, r.id_b)
        for r in S.cosine_dup_pairs(df, threshold=0.9, exact=True).collect()
    }
    ivf = {
        (r.id_a, r.id_b)
        for r in S.cosine_dup_pairs(
            df, threshold=0.9, method="ivf", n_cells=8, n_probe=2
        ).collect()
    }
    assert len(exact) >= 100
    assert ivf <= exact
    assert len(ivf & exact) / len(exact) >= 0.9


def test_empty_corpus_dup_pairs_schema(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<float>")
    for method in ("hyperplane", "ivf"):
        out = S.cosine_dup_pairs(df, method=method)
        assert out.count() == 0
        assert [f.name for f in out.schema.fields] == ["id_a", "id_b", "sim"]
    # explicit empty centroids (what _sample_centroids yields on an
    # empty corpus) must return empty too, not crash on axis-1 norm
    out = S.cosine_dup_pairs(df, method="ivf", centroids=[])
    assert out.count() == 0


def test_pq_topk_finds_planted_neighbors(spark):
    """IVF-PQ with exact re-rank: planted near-duplicates (far closer
    than the cluster noise floor) must surface in the top-5. Within-
    cluster ordering of equidistant noise points is BELOW 8-byte
    quantization resolution by construction — that part is the refine
    pass's job, so we assert on the planted signal, not on noise
    ordering."""
    import random

    rnd = random.Random(13)
    rows = []
    planted = {}
    for c in range(4):
        center = [rnd.gauss(0, 3) for _ in range(32)]
        for i in range(50):
            vid = c * 50 + i
            vec = [x + rnd.gauss(0, 0.5) for x in center]
            rows.append((vid, vec))
            if i == 0:
                # plant a near-duplicate of each query vector
                twin = 1000 + c
                rows.append((twin, [x + rnd.gauss(0, 0.01) for x in vec]))
                planted[vid] = twin
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id % 50 = 0 and vec_id < 1000")
    pq = S.pq_topk(df, q, k=5, m=8, n_codes=16, n_cells=4, n_probe=4).collect()
    top = {}
    for r in pq:
        top.setdefault(r.query_id, []).append(r.neighbor_id)
    hits = sum(1 for qid, twin in planted.items() if twin in top.get(qid, []))
    assert hits >= 3  # >= 75% of planted twins surfaced in top-5
    # the twin should in fact be rank 1 for most queries
    rank1 = {r.query_id: r.neighbor_id for r in pq if r.rank == 1}
    assert sum(1 for qid, twin in planted.items() if rank1.get(qid) == twin) >= 3


def test_pq_encode_deterministic_and_bounded(spark):
    import random

    rnd = random.Random(17)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    books = S.train_pq_codebooks(df, m=4, k=8)
    assert len(books) == 4 and all(len(b) <= 8 for b in books)
    from pyspark.sql import functions as F

    enc = df.select("vec_id", S.pq_encode_col(F.col("embedding"), books).alias("code"))
    a = {r.vec_id: tuple(r.code) for r in enc.collect()}
    b = {r.vec_id: tuple(r.code) for r in enc.collect()}
    assert a == b  # deterministic encode
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in a.values())


def test_kmeans_trained_ivf_improves_recall(spark):
    """Lloyd's-trained centroids should match or beat the seeded-sample
    quantizer's recall on clustered data."""
    import random

    rnd = random.Random(3)
    rows = []
    # 8 well-separated clusters of 25 points each
    for c in range(8):
        center = [rnd.gauss(0, 5) for _ in range(12)]
        for i in range(25):
            rows.append((c * 25 + i, [x + rnd.gauss(0, 0.3) for x in center]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id % 25 = 0")
    exact = {(r.query_id, r.neighbor_id) for r in S.brute_force_topk(df, q, k=5).collect()}

    cents = S.train_centroids(df, n_cells=8, iterations=3)
    assert len(cents) == 8 and all(len(c) == 12 for c in cents)
    trained = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(df, q, k=5, n_cells=8, n_probe=2, centroids=cents).collect()
    }
    sampled = {
        (r.query_id, r.neighbor_id)
        for r in S.ivf_topk(df, q, k=5, n_cells=8, n_probe=2).collect()
    }
    recall_trained = len(exact & trained) / len(exact)
    recall_sampled = len(exact & sampled) / len(exact)
    assert recall_trained >= recall_sampled - 0.05  # never materially worse
    assert recall_trained >= 0.9  # separated clusters: near-perfect


def test_embedding_recall_entry_trained_beats_sampled(spark):
    """The dedup_embedding_recall entry emits BOTH quantizers' recall;
    on the real testdata the k-means-trained centroids must match or
    beat the seeded-sample ones, and the verify step guarantees
    precision 10000 bp for both (no false accepts ever)."""
    from factstore_spark.queries import dedup_embedding_recall_report

    row = dedup_embedding_recall_report(
        spark, "/root/testdata/sf0.001"
    ).collect()[0]
    assert row.trained_recall_bp >= row.sampled_recall_bp
    assert row.sampled_precision_bp == 10000
    assert row.trained_precision_bp == 10000


def test_persisted_ivf_index_matches_inline_ivf(spark, tmp_path):
    """build_ivf_index + ivf_topk_indexed must return EXACTLY what the
    inline ivf_topk returns when given the same trained centroids —
    the persisted index changes where work happens (build time vs
    query time), never the answer."""
    from factstore_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
        train_centroids,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.limit(6)
    stats = build_ivf_index(
        emb, str(tmp_path / "ivf"), n_cells=8, train_iterations=2
    )
    assert stats["n_vectors"] == emb.count() and stats["n_cells"] == 8

    import json

    from factstore_spark.operators.similarity import _ivf_paths

    _adir, cpath, _m = _ivf_paths(str(tmp_path / "ivf"))
    cents = json.load(open(cpath))
    inline = ivf_topk(emb, queries, k=5, n_probe=3, centroids=cents)
    indexed = ivf_topk_indexed(
        spark, str(tmp_path / "ivf"), queries, k=5, n_probe=3
    )
    key = lambda r: (r.query_id, r.rank)  # noqa: E731
    a = sorted(((r.query_id, r.rank, r.neighbor_id) for r in inline.collect()))
    b = sorted(((r.query_id, r.rank, r.neighbor_id) for r in indexed.collect()))
    assert a == b


def test_persisted_ivf_prunes_unprobed_cells(spark, tmp_path):
    """The assignment table is partitioned by cell, so the probe join
    must NOT read every cell: the scan carries a partition filter
    (dynamic pruning from the broadcast probe side) or, at minimum,
    the join side is the partitioned read with a broadcast probe."""
    import io
    from contextlib import redirect_stdout

    from factstore_spark.operators.similarity import build_ivf_index, ivf_topk_indexed

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    build_ivf_index(emb, str(tmp_path / "ivf"), n_cells=8, train_iterations=1)
    out = ivf_topk_indexed(spark, str(tmp_path / "ivf"), emb.limit(2), k=3, n_probe=2)
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "PartitionFilters" in plan


def test_ivf_refresh_appends_without_rebuild(spark, tmp_path):
    """refresh_ivf_index is the FAISS-add() path: new rows are assigned
    with the EXISTING centroids and appended into the cell partitions.
    Query-after-append must equal inline ivf_topk over the FULL corpus
    with those centroids; pre-existing index files survive untouched
    (append, never rewrite); the freshness probe flips stale -> fresh;
    a second refresh is a no-op."""
    import glob
    import json
    import os

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    old = emb.filter("vec_id % 10 != 0")
    new = emb.filter("vec_id % 10 = 0")
    idx = str(tmp_path / "ivf")
    S.build_ivf_index(old, idx, n_cells=8, train_iterations=2)

    d = S.describe_ivf_index(spark, idx, corpus=emb)
    assert d["fresh"] is False
    assert d["missing_vectors"] == new.count()

    adir, _cpath, _m = S._ivf_paths(idx)
    before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(adir, "cell=*", "part-*"))
    }
    stats = S.refresh_ivf_index(spark, emb, idx)  # detects the delta itself
    assert stats["n_new"] == new.count()
    after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(adir, "cell=*", "part-*"))
    }
    for p, mt in before.items():  # O(delta): old files never rewritten
        assert after[p] == mt

    d2 = S.describe_ivf_index(spark, idx, corpus=emb)
    assert d2["fresh"] is True
    assert d2["n_appended"] == new.count()
    assert d2["n_vectors"] == emb.count()

    _adir2, cpath2, _m2 = S._ivf_paths(idx)
    with open(cpath2) as fh:
        cents = json.load(fh)
    queries = emb.limit(6)
    inline = S.ivf_topk(emb, queries, k=5, n_probe=3, centroids=cents)
    indexed = S.ivf_topk_indexed(spark, idx, queries, k=5, n_probe=3)
    a = sorted((r.query_id, r.rank, r.neighbor_id) for r in inline.collect())
    b = sorted((r.query_id, r.rank, r.neighbor_id) for r in indexed.collect())
    assert a == b

    assert S.refresh_ivf_index(spark, emb, idx)["n_new"] == 0


def test_pq_distributed_training_full_corpus(spark):
    """train_pq_codebooks_distributed trains on the FULL corpus (one
    combiner-backed shuffle per iteration; no vector ever reaches the
    driver) and returns the same nested (m, k, dsub) contract. On
    multi-mode data it must match-or-beat a mode-starved driver
    sample, and its codebooks plug into pq_topk unchanged."""
    import random

    rnd = random.Random(11)
    rows = []
    for c in range(16):  # 16 separated modes — more than a tiny sample can see
        center = [rnd.gauss(0, 6) for _ in range(16)]
        for i in range(20):
            rows.append((c * 20 + i, [x + rnd.gauss(0, 0.3) for x in center]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter("vec_id % 20 = 0")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in S.brute_force_topk(df, q, k=5).collect()
    }

    dist_books = S.train_pq_codebooks_distributed(df, m=4, k=16, iterations=4)
    assert len(dist_books) == 4
    assert all(len(b) == 16 and len(b[0]) == 4 for b in dist_books)
    # sample_size=8 over 16 modes: the bounded driver sample CANNOT see
    # half the corpus's modes — the exact failure the full-corpus
    # trainer exists for (the sampled trainer documents this bound).
    samp_books = S.train_pq_codebooks(df, m=4, k=16, sample_size=8)

    def recall(books):
        got = {
            (r.query_id, r.neighbor_id)
            for r in S.pq_topk(
                df, q, k=5, m=4, n_cells=4, n_probe=4, codebooks=books, refine=4
            ).collect()
        }
        return len(exact & got) / len(exact)

    r_dist, r_samp = recall(dist_books), recall(samp_books)
    assert r_dist >= r_samp  # full-corpus training never worse than a starved sample
    assert r_dist >= 0.9  # deterministic seeds: observed 0.9375 vs 0.8125


def test_ivf_paths_tolerate_null_and_ragged_embeddings(spark, tmp_path):
    """A nullable array<float> column with a NULL (or wrong-length)
    embedding must not crash the vectorized centroid assignment — the
    bad row assigns a NULL cell and drops out of cell joins, matching
    the old expression-based scoring's null-propagation."""
    import random

    from factstore_spark.operators.similarity import (
        build_ivf_index,
        ivf_topk,
        ivf_topk_indexed,
        train_centroids,
    )

    rnd = random.Random(3)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)], 0) for i in range(40)]
    rows.append((100, None, 0))
    rows.append((101, [1.0, 2.0], 0))  # ragged: wrong dimension
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    queries = emb.filter("vec_id < 3")

    cents = train_centroids(emb, n_cells=4, iterations=2)
    assert len(cents) == 4
    out = ivf_topk(emb, queries, k=3, n_cells=4, n_probe=2, centroids=cents).collect()
    assert out and all(r.neighbor_id not in (100, 101) for r in out)

    stats = build_ivf_index(emb, str(tmp_path / "ivf"), n_cells=4, train_iterations=1)
    assert stats["n_vectors"] == 42  # bad rows still in the table, cell=null
    out2 = ivf_topk_indexed(spark, str(tmp_path / "ivf"), queries, k=3, n_probe=2).collect()
    assert out2 and all(r.neighbor_id not in (100, 101) for r in out2)


def test_exact_cosine_pairs_bounded_matches_join_form(spark):
    """The bounded-driver cosine ground truth (probe path) must equal
    the pair-join + cosine_batch form: same float64 einsum math, zero
    vectors never qualify, ids normalized id_a < id_b."""
    import random

    import pytest
    from pyspark.sql import functions as F

    from factstore_spark.operators.similarity import (
        cosine_batch,
        exact_cosine_pairs_bounded,
    )

    rnd = random.Random(5)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(60)]
    rows.append((60, [0.0] * 8))  # zero vector: must never pair
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    ids = df.select(F.col("vec_id").alias("_id"), F.col("embedding").alias("_v"))
    a = ids.withColumnsRenamed({"_id": "id_a", "_v": "va"})
    b = ids.withColumnsRenamed({"_id": "id_b", "_v": "vb"})
    want = set(
        tuple(r)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("s", cosine_batch(F.col("va"), F.col("vb")))
        .filter(F.col("s") >= 0.5)
        .select("id_a", "id_b")
        .collect()
    )
    got = set(
        tuple(r) for r in exact_cosine_pairs_bounded(df, threshold=0.5).collect()
    )
    assert got == want and want
    assert not any(60 in p for p in got)

    with pytest.raises(ValueError, match="max_rows"):
        exact_cosine_pairs_bounded(df, threshold=0.5, max_rows=10)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert exact_cosine_pairs_bounded(empty, threshold=0.5).count() == 0


def test_random_project_deterministic_null_safe_and_distance_preserving(spark):
    """random_project: same seed -> identical output regardless of
    partitioning/batching (the matrix is regenerated per task); nulls
    and empty vectors project to null; distances are preserved to
    within JL distortion; a different seed gives a different matrix."""
    import math
    import random

    import numpy as np

    from factstore_spark.operators.similarity import random_project

    rnd = random.Random(77)
    rows = [(i, [rnd.uniform(-1, 1) for _ in range(64)]) for i in range(300)]
    rows += [(900, None), (901, [])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    p1 = {
        r.vec_id: r.projection
        for r in random_project(df.repartition(7), out_dim=16).collect()
    }
    p2 = {
        r.vec_id: r.projection
        for r in random_project(df.coalesce(1), out_dim=16).collect()
    }
    assert p1[900] is None and p1[901] is None
    for k in p1:
        if p1[k] is None:
            assert p2[k] is None
            continue
        assert len(p1[k]) == 16
        assert p1[k] == pytest.approx(p2[k], abs=1e-6)

    pother = {
        r.vec_id: r.projection for r in random_project(df, out_dim=16, seed=99).collect()
    }
    assert any(
        p1[k] != pytest.approx(pother[k], abs=1e-6) for k in p1 if p1[k] is not None
    )

    # distance preservation on a handful of pairs (loose JL bars)
    orig = {i: np.asarray(v, dtype=np.float64) for i, v in rows[:40] if v}
    ratios = []
    ks = sorted(orig)
    for a, b in zip(ks[:-1], ks[1:]):
        do = float(((orig[a] - orig[b]) ** 2).sum())
        dp = float(
            ((np.asarray(p1[a], dtype=np.float64) - np.asarray(p1[b], dtype=np.float64)) ** 2).sum()
        )
        ratios.append(dp / do)
    m = sum(ratios) / len(ratios)
    assert 0.6 <= m <= 1.4, m
    assert not math.isnan(m)


def test_random_project_raises_on_ragged_vectors(spark):
    import pytest as _pytest
    from pyspark.errors.exceptions.base import PySparkException

    from factstore_spark.operators.similarity import random_project

    df = spark.createDataFrame(
        [(1, [1.0] * 8), (2, [1.0] * 9)], "vec_id long, embedding array<float>"
    ).coalesce(1)
    with _pytest.raises(PySparkException):
        random_project(df, out_dim=4).collect()


def test_random_project_pins_dim_across_batches(spark):
    """Mixed vector lengths must raise even when each length lives in
    its own partition/batch — the input dimension is pinned up front,
    never inferred per Arrow batch (per-batch inference would silently
    project different batches with different matrices)."""
    import pytest as _pytest
    from pyspark.errors.exceptions.base import PySparkException

    from factstore_spark.operators.similarity import random_project

    a = spark.createDataFrame([(i, [1.0] * 64) for i in range(50)],
                              "vec_id long, embedding array<float>").repartition(1)
    b = spark.createDataFrame([(100 + i, [1.0] * 32) for i in range(50)],
                              "vec_id long, embedding array<float>").repartition(1)
    mixed = a.union(b)
    with _pytest.raises(PySparkException, match="pinned|corrupt"):
        random_project(mixed, out_dim=8).collect()

    # all-empty input: projects to null without a job-killing inference
    empty = spark.createDataFrame([(1, None), (2, [])],
                                  "vec_id long, embedding array<float>")
    got = random_project(empty, out_dim=8).collect()
    assert all(r.projection is None for r in got)


def test_ivf_refresh_lease_blocks_racing_refresh(spark, tmp_path):
    """Two refreshes over the same delta would silently double-append
    (duplicated top-k neighbors); the lease claim makes the second one
    raise BEFORE writing anything."""
    import pytest as _pytest

    from factstore_spark.operators.similarity import (
        build_ivf_index,
        refresh_ivf_index,
    )
    from factstore_spark.storage.cas import (
        ConcurrentManifestSwapError,
        read_versioned_manifest,
    )
    from factstore_spark.operators.similarity import _read_ivf_manifest

    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), idx, n_cells=4)
    inc = emb.filter(F.col("vec_id") % 2 == 1)

    # simulate a refresh IN PROGRESS: plant a live lease at the head
    from factstore_spark.storage.cas import cas_swap_manifest
    import time

    m, v = read_versioned_manifest(idx, _read_ivf_manifest)
    cas_swap_manifest(
        idx, dict(m, pending={"id": "other", "ts": time.time()}), v,
        lambda root, man: None, what="test-lease",
    )
    with _pytest.raises(ConcurrentManifestSwapError, match="in progress"):
        refresh_ivf_index(spark, inc, idx)

    # a LAPSED lease is superseded and the refresh lands exactly once
    m, v = read_versioned_manifest(idx, _read_ivf_manifest)
    cas_swap_manifest(
        idx, dict(m, pending={"id": "stale", "ts": time.time() - 9999}), v,
        lambda root, man: None, what="test-lease",
    )
    out = refresh_ivf_index(spark, inc, idx, lease_seconds=3600.0)
    assert out["n_new"] == inc.count()
    head, _v2 = read_versioned_manifest(idx, _read_ivf_manifest)
    assert "pending" not in head
    assert head["n_vectors"] == emb.count()
    # idempotent: a re-run detects nothing new (no duplicates landed)
    again = refresh_ivf_index(spark, inc, idx)
    assert again["n_new"] == 0


def test_ivf_refresh_duplicate_protection_no_double_vectors(spark, tmp_path):
    """End to end: after a lapsed-lease takeover, the assignments hold
    each vector exactly once."""
    from pyspark.sql import functions as FF

    from factstore_spark.operators.similarity import (
        build_ivf_index,
        refresh_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(80)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(FF.col("vec_id") % 2 == 0), idx, n_cells=4)
    refresh_ivf_index(spark, emb, idx)
    refresh_ivf_index(spark, emb, idx)  # second refresh: nothing new
    from factstore_spark.operators.similarity import _ivf_paths

    adir, _c, _m = _ivf_paths(idx)
    counts = (
        spark.read.parquet(adir)
        .groupBy("neighbor_id")
        .count()
        .filter(FF.col("count") > 1)
        .count()
    )
    assert counts == 0


def test_ivf_refresh_stalled_holder_never_publishes(spark, tmp_path):
    """The FENCE: a refresh whose lease lapses mid-job (long stage /
    GC pause) must not publish its staged delta after a takeover
    already re-appended it. Thread A stalls just before its finalize
    claim until takeover B completes; A must raise and the assignments
    must hold every vector exactly once."""
    import threading
    import time

    from pyspark.sql import functions as F

    import factstore_spark.storage.cas as C
    from factstore_spark.operators.similarity import (
        build_ivf_index,
        refresh_ivf_index,
    )
    from factstore_spark.storage.cas import ConcurrentManifestSwapError

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(100)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), idx, n_cells=4)
    inc = emb.filter(F.col("vec_id") % 2 == 1)

    b_done = threading.Event()
    a_ident = []
    real = C.cas_swap_manifest

    def stall_a_finalize(root, manifest, base, wp, what="manifest"):
        if (
            what == "ivf-refresh"
            and a_ident
            and threading.get_ident() == a_ident[0]
        ):
            assert b_done.wait(120), "takeover never finished"
        return real(root, manifest, base, wp, what)

    C.cas_swap_manifest = stall_a_finalize
    a_result = {}

    def run_a():
        a_ident.append(threading.get_ident())
        try:
            refresh_ivf_index(spark, inc, idx, lease_seconds=0.5)
            a_result["outcome"] = "published"
        except ConcurrentManifestSwapError:
            a_result["outcome"] = "fenced"

    try:
        ta = threading.Thread(target=run_a, daemon=True)
        ta.start()
        time.sleep(1.0)  # A's lease (0.5s) lapses while it works
        out_b = refresh_ivf_index(spark, inc, idx, lease_seconds=0.5)
        b_done.set()
        ta.join(timeout=120)
    finally:
        C.cas_swap_manifest = real
    assert out_b["n_new"] == inc.count()
    assert a_result.get("outcome") == "fenced", a_result
    from factstore_spark.operators.similarity import _ivf_paths

    adir, _c, _m = _ivf_paths(idx)
    dup = (
        spark.read.parquet(adir)
        .groupBy("neighbor_id").count().filter(F.col("count") > 1).count()
    )
    assert dup == 0
    total = spark.read.parquet(adir).count()
    assert total == emb.count()


def test_ivf_refresh_recovers_expired_publish(spark, tmp_path):
    """Crash between the fencing finalize and the publish: the counts
    are committed with a 'publishing' lease marker, so the NEXT refresh
    must complete the dead holder's publish (idempotent renames) before
    taking its own lease — counts and data can never drift."""
    import json
    import os
    import time

    from pyspark.sql import functions as F

    from factstore_spark.operators.similarity import (
        _centroid_cells_col,
        _ivf_paths,
        _read_ivf_manifest,
        _unit_rows,
        build_ivf_index,
        refresh_ivf_index,
    )
    from factstore_spark.storage.cas import (
        cas_swap_manifest,
        read_versioned_manifest,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(90)
    third = [emb.filter(F.col("vec_id") % 3 == i) for i in range(3)]
    idx = str(tmp_path / "ivf")
    build_ivf_index(third[0], idx, n_cells=4)
    adir, cpath, m0 = _ivf_paths(idx)
    with open(cpath, encoding="utf-8") as fh:
        cents = json.load(fh)

    # simulate a refresh of third[1] that crashed AFTER its fencing
    # finalize: stage its delta + commit counts with an EXPIRED
    # publishing lease
    dead_id = "deadbeefdead"
    staging = os.path.join(idx, "_staging", dead_id)
    third[1].select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        F.element_at(
            _centroid_cells_col(F.col("embedding"), _unit_rows(cents), 1), 1
        ).alias("cell"),
    ).repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(staging)
    head, v = read_versioned_manifest(idx, _read_ivf_manifest)
    n1 = third[1].count()
    crashed = dict(
        head,
        n_vectors=int(head["n_vectors"]) + n1,
        n_appended=int(head.get("n_appended", 0)) + n1,
        pending={
            "id": dead_id, "ts": time.time() - 9999,
            "lease_seconds": 60.0, "publishing": True,
        },
    )
    cas_swap_manifest(idx, crashed, v, lambda r, man: None, what="test-crash")

    # the next refresh (third[2]) recovers the publish, then lands its
    # own delta; totals exact, zero duplicates
    out = refresh_ivf_index(spark, third[2], idx)
    assert out["n_new"] == third[2].count()
    assert out["n_vectors"] == emb.count()
    adir2, _c, _m = _ivf_paths(idx)
    got = spark.read.parquet(adir2)
    assert got.count() == emb.count()
    assert got.groupBy("neighbor_id").count().filter(F.col("count") > 1).count() == 0
    assert not os.path.isdir(staging)  # recovered and removed


def test_ivf_rebuild_keeps_superseded_dir_for_reader_grace(spark, tmp_path):
    """A rebuild retires the previous data dir with a TOMBSTONE instead
    of deleting it: an in-flight reader that resolved the old paths
    just before the publish keeps its files for a full grace window
    (age runs from retirement, not mtime)."""
    import os

    from pyspark.sql import functions as F

    from factstore_spark.operators.similarity import (
        _ivf_paths,
        build_ivf_index,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb.filter(F.col("vec_id") % 2 == 0), idx, n_cells=4)
    old_adir, old_cpath, _m = _ivf_paths(idx)
    build_ivf_index(emb, idx, n_cells=4)  # rebuild supersedes
    new_adir, new_cpath, head = _ivf_paths(idx)
    assert new_adir != old_adir
    # the old dir survives the rebuild's reap (tombstoned, in grace)
    assert os.path.isdir(old_adir) and os.path.exists(old_cpath)
    retired = {t["name"] for t in head.get("retired", [])}
    assert os.path.basename(old_adir) in retired
    assert os.path.basename(old_cpath) in retired
    # a pre-publish reader's plan still resolves
    assert spark.read.parquet(old_adir).count() == emb.filter(
        F.col("vec_id") % 2 == 0
    ).count()


def test_ivf_rebuild_recovers_expired_publish_first(spark, tmp_path):
    """A rebuild superseding a refresh that crashed AFTER its fence
    must complete that refresh's publish first — its counts are
    committed, so dropping the staged rows would leave the manifest
    history ahead of the data it describes."""
    import json
    import os
    import time

    from pyspark.sql import functions as F

    from factstore_spark.operators.similarity import (
        _centroid_cells_col,
        _ivf_paths,
        _read_ivf_manifest,
        _unit_rows,
        build_ivf_index,
    )
    from factstore_spark.storage.cas import (
        cas_swap_manifest,
        read_versioned_manifest,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    half = emb.filter(F.col("vec_id") % 2 == 0)
    idx = str(tmp_path / "ivf")
    build_ivf_index(half, idx, n_cells=4)
    adir, cpath, _m = _ivf_paths(idx)
    with open(cpath, encoding="utf-8") as fh:
        cents = json.load(fh)
    # crashed-after-fence refresh of the odd half
    inc = emb.filter(F.col("vec_id") % 2 == 1)
    dead = "deadbeefcafe"
    staging = os.path.join(idx, "_staging", dead)
    inc.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("embedding").alias("c_vec"),
        F.element_at(
            _centroid_cells_col(F.col("embedding"), _unit_rows(cents), 1), 1
        ).alias("cell"),
    ).repartition("cell").write.mode("overwrite").partitionBy("cell").parquet(staging)
    head, v = read_versioned_manifest(idx, _read_ivf_manifest)
    crashed = dict(
        head,
        n_vectors=int(head["n_vectors"]) + inc.count(),
        pending={"id": dead, "ts": time.time() - 9999,
                 "lease_seconds": 60.0, "publishing": True},
    )
    cas_swap_manifest(idx, crashed, v, lambda r, man: None, what="test-crash")

    build_ivf_index(emb, idx, n_cells=4)  # rebuild must recover first
    assert not os.path.isdir(staging)
    # the retired old dir holds BOTH halves: the dead refresh's rows
    # were published before supersession, matching its committed counts
    assert spark.read.parquet(adir).count() == emb.count()
    new_adir, _c, _h = _ivf_paths(idx)
    assert spark.read.parquet(new_adir).count() == emb.count()


def test_ivf_legacy_index_retired_on_first_versioned_rebuild(spark, tmp_path):
    """A pre-versioning index (fixed assignments/ + centroids.json, no
    manifest keys) must get its legacy copy TOMBSTONED by the first
    rebuild — not kept (and silently served to legacy readers) forever
    — and tombstones whose artifacts are gone must be pruned from the
    manifest instead of accumulating across nightly rebuilds."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from factstore_spark.operators.similarity import (
        _ivf_paths,
        _read_ivf_manifest,
        _write_ivf_manifest,
        build_ivf_index,
        ivf_topk_indexed,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(60)
    idx = str(tmp_path / "ivf")
    build_ivf_index(emb, idx, n_cells=4)
    adir, cpath, m = _ivf_paths(idx)
    # back-date to the legacy layout: fixed names, pointer-only
    # manifest without data_dir/centroids keys, no CAS log
    os.rename(adir, os.path.join(idx, "assignments"))
    os.rename(cpath, os.path.join(idx, "centroids.json"))
    shutil.rmtree(os.path.join(idx, "_manifests"))
    _write_ivf_manifest(idx, {"n_vectors": m["n_vectors"], "n_cells": m["n_cells"]})
    # legacy index serves via the fallbacks
    assert ivf_topk_indexed(spark, idx, emb.limit(3), k=3).count() > 0

    build_ivf_index(emb, idx, n_cells=4)  # first versioned rebuild
    _a2, _c2, head = _ivf_paths(idx)
    retired = {t["name"]: t for t in head.get("retired", [])}
    assert "assignments" in retired and "centroids.json" in retired
    assert all("grace" in t for t in retired.values())
    # still on disk (reader grace runs from the tombstone)
    assert os.path.isdir(os.path.join(idx, "assignments"))

    # artifact deleted out-of-band -> the tombstone is pruned on the
    # next rebuild instead of accumulating forever
    shutil.rmtree(os.path.join(idx, "assignments"))
    build_ivf_index(emb, idx, n_cells=4)
    _a3, _c3, head3 = _ivf_paths(idx)
    names3 = {t["name"] for t in head3.get("retired", [])}
    assert "assignments" not in names3
    assert "centroids.json" in names3  # its file still exists, still tracked


def test_pq_topk_caller_centroids_override(spark):
    """pq_topk accepts caller-supplied coarse cells (the oracle-seeded
    registry path and the trained-cells path share it): results must
    keep the (rank dense from 1, no self-match) contract and still
    surface an exactly-duplicated vector at rank 1."""
    import random

    rnd = random.Random(7)
    rows = [(i, [rnd.gauss(0, 1) for _ in range(16)]) for i in range(60)]
    rows.append((999, list(rows[0][1])))  # exact twin of vec 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = [rows[i][1] for i in range(4)]  # arbitrary caller cells
    q = df.filter("vec_id = 0")
    out = S.pq_topk(
        df, q, k=5, m=4, n_codes=8, n_cells=4, n_probe=4, centroids=cents
    ).collect()
    ranks = sorted(r.rank for r in out)
    assert ranks == list(range(1, len(ranks) + 1))
    assert all(r.neighbor_id != r.query_id for r in out)
    assert [r.neighbor_id for r in out if r.rank == 1] == [999]
