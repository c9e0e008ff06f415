"""The composed corpus-curation pipeline: one call from raw documents
to training-ready shard assignments.

Every stage is one of the engine's individually-oracled operators, so
the composition stays deterministic and engine-reproducible end to end
(the default configuration has a full DuckDB oracle in queries.py —
the whole pipeline, not just its stages, is auditable by an
independent engine). Stage order follows the standard curation recipe:

  language ID -> quality floor -> exact-dedup keep-first ->
  token-length bounds -> decontamination (exact fingerprint + n-gram
  overlap vs the benchmark) -> [optional MinHash near-dup cluster
  removal] -> deterministic shuffle-shard assignment

Scale shape: the signal stages are one projection over the scan; the
dedup window shuffles once on the content fingerprint; decontamination
broadcasts the benchmark; near-dup removal (off by default) runs the
banded MinHash path; the final shard assignment hashes — there is no
global sort and no driver-side loop anywhere.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def curate_corpus(
    docs: DataFrame,
    benchmark: Optional[DataFrame] = None,
    lang: str = "en",
    quality_threshold: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 5000,
    contamination_ngram: int = 8,
    near_dup: Optional[str] = None,
    minhash_verify_jaccard: float = 0.8,
    n_shards: int = 8,
    seed: str = "epoch0",
    id_col: str = "doc_id",
    text_col: str = "text",
    learned_gate=None,
) -> DataFrame:
    """Run the full curation pipeline; returns the curated corpus as
    training-read addresses ``(id, shard, pos)`` (join back on the id
    for text). ``near_dup="minhash"`` additionally drops every doc that
    is not its near-dup cluster's representative (minimum id).
    ``learned_gate`` (a fitted quality_model pipeline) adds the learned
    quality stage after the heuristic one — docs the model rejects are
    dropped before dedup pays for them. The gate scores ONLY the
    heuristic survivors and filters in place (a pure map over the
    surviving rows: feature projection + linear scorer); joining a
    separately-scored corpus back would shuffle the whole corpus
    twice for nothing."""
    from .dedup import dup_clusters, minhash_lsh_pairs
    from .sampling import ngram_contamination, shuffle_shards
    from .text import exact_fp_col, with_lang_id, with_quality_score

    flagged = with_quality_score(with_lang_id(docs, text_col), text_col).select(
        F.col(id_col),
        F.col(text_col),
        (F.col("pred_lang") == lang).alias("_lang_ok"),
        (F.col("quality_score") >= quality_threshold).alias("_q_ok"),
        F.col("n_tokens").alias("_n_tok"),
        exact_fp_col(text_col).alias("_fp"),
    )
    survivors = flagged.filter(F.col("_lang_ok") & F.col("_q_ok"))
    if learned_gate is not None:
        from .quality_model import score_features

        gate_cols = list(survivors.columns)
        survivors = (
            learned_gate.transform(score_features(survivors, text_col))
            .filter(F.col("prediction") == 1.0)
            .select(*gate_cols)
        )
    w = Window.partitionBy("_fp").orderBy(F.col(id_col).asc())
    kept = (
        survivors.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .filter(
            (F.col("_n_tok") >= min_tokens) & (F.col("_n_tok") <= max_tokens)
        )
    )
    if benchmark is not None:
        # Exact decontamination rides the ALREADY-COMPUTED ``_fp``
        # column as a broadcast anti-join (round 15, guide §1.2/§2.4).
        # The previous formulation called contamination_check(deduped)
        # — re-deriving the scan -> signals -> dedup-window subtree a
        # second time only to join the corpus against a projection of
        # itself on id. Row-identical: contamination_check flags
        # fp IN bench_fps via the same md5(lower(text)) fingerprint
        # (exact_fp_col, the shared single definition), and a null fp
        # survives both forms (left-join miss -> contaminated=false;
        # anti-join on a null key never matches -> kept).
        from .text import exact_fp_col as _fp_col

        bench_fps = benchmark.select(_fp_col(text_col).alias("_fp")).distinct()
        kept = kept.join(F.broadcast(bench_fps), "_fp", "left_anti")
    deduped = kept.select(id_col, text_col)
    if benchmark is not None:
        # Pin the survivors once: the n-gram leg and the final anti-join
        # both consume them, and without the pin each consumer re-runs
        # the full scan -> language/quality signals -> dedup window
        # (the plan showed three copies of that subtree; Spark does not
        # reuse the window exchange across the branches). Survivors are
        # a filtered (id, text) projection — far cheaper to hold than
        # to recompute (§5 caching rule: reused AND expensive).
        deduped = deduped.localCheckpoint(eager=True)
        ngram_hits = ngram_contamination(
            deduped, benchmark, n=contamination_ngram,
            text_col=text_col, id_col=id_col,
        ).select(id_col)
        deduped = deduped.join(ngram_hits, id_col, "left_anti")
    if near_dup == "minhash":
        pairs = minhash_lsh_pairs(
            deduped, id_col=id_col, text_col=text_col,
            verify_jaccard=minhash_verify_jaccard,
        )
        clusters = dup_clusters(pairs)
        non_reps = clusters.filter(F.col("cluster_id") != F.col("doc_id")).select(
            F.col("doc_id").alias(id_col)
        )
        deduped = deduped.join(non_reps, id_col, "left_anti")
    elif near_dup is not None:
        raise ValueError(f"unknown near_dup strategy: {near_dup!r}")
    return shuffle_shards(deduped, n_shards=n_shards, seed=seed, id_col=id_col)
