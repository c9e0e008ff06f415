"""Ranked retrieval operators — the query side of a RAG/search stack
over a curated corpus: BM25 keyword ranking, and hybrid fusion of a
keyword ranking with a vector ranking via Reciprocal Rank Fusion.

Scale shape (100 TB corpus):
- corpus statistics (N, avgdl, per-term document frequencies) are ONE
  tiny aggregate, cross-joined back as a broadcast literal row — never
  a per-row recompute and never a driver-side collect;
- per-doc term frequencies and the BM25 score are a single map-only
  projection over the scan (whole-stage codegen, no shuffle);
- top-k fuses orderBy+limit into TakeOrderedAndProject (per-partition
  top-k + one merge), so the full corpus is never globally sorted;
- RRF fusion joins two k-row rankings — driver-scale inputs by
  construction, broadcast automatically.

Determinism (oracle-checked against DuckDB): token matching is exact
whitespace-token equality (not substring), tie-breaks are id-ascending
everywhere, and RRF scores are sums of 1/(c+rank) over INTEGER ranks —
identical doubles in any IEEE engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .text import tokens_col


def bm25_topk(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 top-k for a bag-of-terms query. Output: (id, rank) with
    score-descending, id-ascending order — rank 1 is the best match.

    Standard Robertson/Sparck-Jones BM25 with the +1 idf floor
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5))), so scores stay positive
    even for terms in most documents."""
    if not terms:
        raise ValueError("bm25_topk requires at least one query term")
    # Tokens are lower-cased, so terms must be too — an uppercase query
    # term would otherwise silently never match (tf=0 everywhere) and
    # contribute nothing, including to the hybrid RRF fusion.
    terms = [t.lower() for t in terms]
    # Parsed SQL expressions throughout (round 15, guide §7.3): the
    # Column-DSL form cost ~25 py4j round trips PER TERM before any
    # task ran; trees and FP evaluation order are identical.
    from .text import tokens_sql

    def _lit(s: str) -> str:
        return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"

    toks = tokens_sql(text_col)

    def tf_sql(term: str) -> str:
        return f"size(filter({toks}, t -> t = {_lit(term)}))"

    # One corpus-stats row: N, avgdl, df per term — broadcast literal.
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr(f"avg(size({toks}))").alias("avgdl"),
        *[
            F.expr(f"sum(CAST(({tf_sql(t)} > 0) AS BIGINT))").alias(f"df_{i}")
            for i, t in enumerate(terms)
        ],
    )
    scored = docs.select(
        F.col(id_col).alias("id"),
        F.expr(f"size({toks})").alias("dl"),
        *[F.expr(tf_sql(term)).alias(f"tf_{i}") for i, term in enumerate(terms)],
    ).crossJoin(F.broadcast(stats))
    score_terms = []
    for i in range(len(terms)):
        idf = (
            f"ln(1.0D + (n_docs - df_{i} + 0.5D) / (df_{i} + 0.5D))"
        )
        tf_i = f"CAST(tf_{i} AS DOUBLE)"
        norm = (
            f"({tf_i} + {k1!r}D * (1.0D - {b!r}D + {b!r}D * dl / avgdl))"
        )
        score_terms.append(f"{idf} * ({tf_i} * {k1 + 1.0!r}D) / {norm}")
    score = F.expr("0.0D + " + " + ".join(score_terms))
    ranked = (
        scored.withColumn("score", score)
        .filter(F.col("score") > 0)  # at least one query term present
        .orderBy(F.col("score").desc(), F.col("id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
    return ranked.withColumn("rank", F.row_number().over(w)).select(
        "id", F.col("rank").cast("long").alias("rank")
    )


def rrf_fuse(
    rankings: list[DataFrame],
    k: int = 10,
    c: int = 60,
) -> DataFrame:
    """Reciprocal Rank Fusion over (id, rank) rankings:
    score(id) = sum over rankings of 1/(c + rank). The standard
    trained-weight-free hybrid combiner (Cormack et al.) — integer
    ranks in, identical IEEE doubles in any engine, final tie-break on
    id. Output: (id, rrf_rank)."""
    if not rankings:
        raise ValueError("rrf_fuse requires at least one ranking")
    part_expr = F.expr(f"1.0D / ({c} + rank)").alias("part")
    parts = [r.select(F.col("id"), part_expr) for r in rankings]
    allparts = parts[0]
    for p in parts[1:]:
        allparts = allparts.unionByName(p)
    fused = (
        allparts.groupBy("id")
        .agg(F.sum("part").alias("rrf"))
        .orderBy(F.col("rrf").desc(), F.col("id").asc())
        .limit(k)
    )
    w = Window.orderBy(F.col("rrf").desc(), F.col("id").asc())
    return fused.withColumn("rrf_rank", F.row_number().over(w)).select(
        "id", F.col("rrf_rank").cast("long").alias("rrf_rank")
    )


def hybrid_topk(
    docs: DataFrame,
    embeddings: DataFrame,
    terms: list[str],
    query_vec: DataFrame,
    k: int = 10,
    depth: int = 20,
    doc_id_col: str = "doc_id",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid retrieval: BM25 keyword ranking + exact-cosine vector
    ranking (shared id space), fused with RRF. ``query_vec`` is a
    1-row (vec_id, embedding) frame; ``depth`` is how deep each leg
    ranks before fusion. Output: (id, rrf_rank)."""
    from .similarity import brute_force_topk

    kw = bm25_topk(docs, terms, k=depth, id_col=doc_id_col)
    vec = brute_force_topk(embeddings, query_vec, k=depth, id_col=vec_id_col)
    vec_rank = vec.select(
        F.col("neighbor_id").alias("id"), F.col("rank").cast("long").alias("rank")
    )
    return rrf_fuse([kw, vec_rank], k=k)
