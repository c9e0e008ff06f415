"""Ranked retrieval: BM25 ordering on a hand-built corpus, RRF fusion
algebra, and the hybrid composition over a shared id space."""

import pytest
from pyspark.sql import functions as F

from factstore_spark.operators.retrieval import bm25_topk, hybrid_topk, rrf_fuse


def test_bm25_ranks_by_relevance(spark):
    """More query-term occurrences (per length) rank higher; docs
    without any query term are excluded; rarer terms weigh more."""
    rows = [
        (0, "spark spark spark engine"),          # tf=3, short -> top
        (1, "spark engine row table value"),      # tf=1
        (2, "row table value batch line"),        # no term -> excluded
        (3, "spark spark engine row table"),      # tf=2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = [(r.id, r.rank) for r in bm25_topk(df, ["spark"], k=10).collect()]
    assert [i for i, _ in out] == [0, 3, 1]
    assert [r for _, r in out] == [1, 2, 3]

    # a rare second term dominates a common one at equal tf
    rows2 = [
        (0, "common rare pad pad"),
        (1, "common pad pad pad"),
        (2, "common pad pad pad"),
        (3, "common pad pad pad"),
    ]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    out2 = [(r.id, r.rank) for r in bm25_topk(df2, ["common", "rare"], k=4).collect()]
    assert out2[0][0] == 0  # the only doc with the rare term wins


def test_bm25_requires_terms(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    with pytest.raises(ValueError):
        bm25_topk(df, [])


def test_rrf_fuse_prefers_agreement(spark):
    """An id ranked well by BOTH legs beats an id ranked best by one:
    1/(60+2) + 1/(60+2) > 1/(60+1) + 0."""
    a = spark.createDataFrame([(10, 1), (20, 2)], "id long, rank long")
    b = spark.createDataFrame([(30, 1), (20, 2)], "id long, rank long")
    out = [(r.id, r.rrf_rank) for r in rrf_fuse([a, b], k=3).collect()]
    assert out[0] == (20, 1)  # consensus id first
    assert {i for i, _ in out} == {10, 20, 30}
    # deterministic tie-break: 10 and 30 have identical scores -> id asc
    assert out[1:] == [(10, 2), (30, 3)]


def test_hybrid_topk_composes(spark):
    """Shared id space: the hybrid result is a fusion of both legs and
    never contains an id absent from both."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.filter(F.col("vec_id") == 0)
    out = hybrid_topk(docs, emb, ["vector"], q, k=5, depth=10)
    rows = out.collect()
    assert len(rows) == 5
    assert [r.rrf_rank for r in rows] == [1, 2, 3, 4, 5]
    kw_ids = {r.id for r in bm25_topk(docs, ["vector"], k=10).collect()}
    from factstore_spark.operators.similarity import brute_force_topk

    vec_ids = {r.neighbor_id for r in brute_force_topk(emb, q, k=10).collect()}
    assert {r.id for r in rows} <= (kw_ids | vec_ids)
