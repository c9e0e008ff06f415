"""Asserted scale probe (pytest -m slow): the 10x-amplification numbers
that used to live only in docs/SCALE.md prose, turned into CI-failing
invariants. Runs the heavy operators on deterministically amplified
corpora at K=1 and K=4 and asserts:

- runtime-ratio ceilings: 4x rows must cost well under the quadratic
  16x (candidate volume is band/bucket-bounded by construction);
- output-growth bounds: pair counts must not explode super-linearly;
- recall/precision floors on the amplified corpus: MinHash vs exact
  Jaccard, SimHash's exact pigeonhole contract, and the IVF embedding
  dedup against PLANTED near-duplicates (jittered replicas of the same
  source vector), which the noise corpus alone cannot provide.

Timing uses min-of-2 per op per scale to shield against transient host
noise (single-run spikes of 10x+ have been observed on shared hosts);
ceilings are set with headroom above the observed steady-state ratios
but far below the quadratic signature they exist to catch.
"""

import os
import sys
import time

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from scale_probe import amplify_docs, amplify_embeddings  # noqa: E402

from factstore_spark.operators import dedup as D  # noqa: E402
from factstore_spark.operators import sampling as SA  # noqa: E402
from factstore_spark.operators import similarity as S  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
K_SMALL, K_BIG = 1, 4
# 4x rows; quadratic would be ~16x runtime. Ceiling leaves noise
# headroom while still failing on a quadratic (or worse) regression.
# Output-pair counts are deliberately NOT bounded: amplification plants
# K*(K-1)/2 TRUE near-dup pairs per source row (a changed dup rate, by
# design), and the verify step already guarantees zero false accepts —
# candidate blow-up surfaces in runtime, which is what's bounded.
RUNTIME_RATIO_CEILING = 10.0


def _min_of_2(fn):
    best, n = None, 0
    for _ in range(2):
        t0 = time.time()
        n = fn()
        dt = time.time() - t0
        best = dt if best is None else min(best, dt)
    return best, n


@pytest.fixture(scope="module")
def corpora(spark):
    docs_raw = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    emb_raw = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    out = {}
    for k in (K_SMALL, K_BIG):
        docs = amplify_docs(docs_raw, k).repartition(8).cache()
        emb = amplify_embeddings(emb_raw, k).repartition(8).cache()
        docs.count(), emb.count()
        out[k] = (docs, emb)
    # warm the Python worker daemon so K=1 timings don't carry spawn cost
    spark.range(64).mapInPandas(lambda it: it, "id long").count()
    yield out
    for docs, emb in out.values():
        docs.unpersist()
        emb.unpersist()


OPS = {
    "minhash_lsh_pairs": lambda docs, emb, k: D.minhash_lsh_pairs(
        docs, verify_jaccard=0.5
    ).count(),
    "simhash_pairs": lambda docs, emb, k: D.simhash_near_dup_pairs(
        docs, max_hamming=3
    ).count(),
    "ngram_jaccard_capped": lambda docs, emb, k: D.ngram_jaccard_pairs(
        docs, n=3, min_jaccard=0.2, max_shingle_df=20 * k
    ).count(),
    "embedding_ivf_dedup": lambda docs, emb, k: S.cosine_dup_pairs(
        emb, threshold=0.45, method="ivf", n_cells=32, n_probe=2
    ).count(),
    # posting-list shape: shuffle volume O(corpus tokens), output one
    # row per doc — both linear in K by construction
    "substring_dup_spans": lambda docs, emb, k: D.substring_dup_spans(
        docs, n=8
    ).count(),
    # benchmark grams broadcast; corpus side is a map-only probe
    "ngram_contamination": lambda docs, emb, k: SA.ngram_contamination(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        n=8,
    ).count(),
}


@pytest.mark.slow
def test_runtime_and_output_growth_stays_subquadratic(corpora):
    docs1, emb1 = corpora[K_SMALL]
    docs4, emb4 = corpora[K_BIG]
    failures = []
    for name, op in OPS.items():
        # One full re-measure before declaring a breach: this host is
        # known to stall individual Spark jobs 10x+ for minutes at a
        # time, and a quadratic regression reproduces on re-run while
        # co-tenant noise does not.
        ratio = t1 = t4 = 0.0
        for _attempt in (1, 2):
            t1, _ = _min_of_2(lambda: op(docs1, emb1, K_SMALL))
            t4, _ = _min_of_2(lambda: op(docs4, emb4, K_BIG))
            ratio = t4 / max(t1, 0.05)  # floor: sub-50ms baselines are noise
            if ratio <= RUNTIME_RATIO_CEILING:
                break
        if ratio > RUNTIME_RATIO_CEILING:
            failures.append(f"{name}: runtime x{ratio:.1f} for x4 rows "
                            f"({t1:.2f}s -> {t4:.2f}s, reproduced twice)")
    assert not failures, "; ".join(failures)


@pytest.mark.slow
def test_minhash_recall_floor_on_amplified_corpus(corpora):
    """MinHash-LSH vs exact n-gram Jaccard on the K=4 corpus: the
    banding contract (recall >= ~0.9 at j >= 0.5) must survive
    amplification — a band-space regression shows up here first."""
    docs4, _ = corpora[K_BIG]
    approx = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs4, verify_jaccard=0.5)
        .select("id_a", "id_b").collect()
    }
    exact = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs4, n=3, min_jaccard=0.5)
        .select("id_a", "id_b").collect()
    }
    assert exact, "amplified corpus lost its duplicate structure"
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.85, f"minhash recall {recall:.3f} < 0.85 floor"
    # verify_jaccard re-checks candidates exactly -> no false accepts
    assert approx <= exact


@pytest.mark.slow
def test_simhash_pigeonhole_exact_on_amplified_corpus(corpora):
    """The 4-chunk SimHash banding is EXACT for Hamming <= 3 — recall
    must be 1.0 by pigeonhole, at any scale."""
    docs4, _ = corpora[K_BIG]
    approx = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_dup_pairs(docs4, max_hamming=3)
        .select("id_a", "id_b").collect()
    }
    sig = docs4.select(
        F.col("doc_id").alias("_id"), D.simhash_col("text").alias("sim")
    )
    a = sig.withColumnsRenamed({"_id": "id_a", "sim": "sim_a"})
    b = sig.withColumnsRenamed({"_id": "id_b", "sim": "sim_b"})
    exact = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))) <= 3)
        .select("id_a", "id_b").collect()
    }
    assert approx == exact


@pytest.mark.slow
def test_embedding_ivf_recall_on_planted_duplicates(corpora):
    """Amplification plants TRUE near-duplicates: the K jittered
    replicas of one source vector sit at cosine ~0.99+ of each other.
    The IVF-blocked dedup must recover nearly all planted pairs —
    tiny perturbations land in the same (or a probed) cell."""
    _, emb4 = corpora[K_BIG]
    found = {
        (r.id_a, r.id_b)
        for r in S.cosine_dup_pairs(
            emb4, threshold=0.9, method="ivf", n_cells=32, n_probe=2
        ).select("id_a", "id_b").collect()
    }
    # ground truth: exact cosine over the replica pairs only (same
    # source vector = same vec_id div K) — cheap, O(n_src * K^2)
    ids = emb4.select(
        F.col("vec_id").alias("_id"),
        F.col("embedding").alias("_v"),
        F.floor(F.col("vec_id") / K_BIG).alias("_src"),
    )
    a = ids.select(
        F.col("_id").alias("id_a"), F.col("_v").alias("va"), "_src"
    )
    b = ids.select(
        F.col("_id").alias("id_b"), F.col("_v").alias("vb"), "_src"
    )
    planted_exact = {
        (r.id_a, r.id_b)
        for r in a.join(b, ["_src"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("sim", S.cosine_batch(F.col("va"), F.col("vb")))
        .filter(F.col("sim") >= 0.9)
        .select("id_a", "id_b").collect()
    }
    assert len(planted_exact) >= 100, "amplification planted too few near-dups"
    recall = len(found & planted_exact) / len(planted_exact)
    assert recall >= 0.95, f"planted-duplicate recall {recall:.3f} < 0.95"


@pytest.mark.slow
def test_recall_probes_full_corpus_match_sampled_contract(spark):
    """The battery's three recall entries score on an md5-sampled probe
    corpus (queries.py:_probe_sample); this is the FULL-corpus run the
    entries' docstrings defer to. Asserts the same contracts at
    sample_pct=100: SimHash pigeonhole exactness, MinHash banding
    recall floor, and embedding precision-10000 / trained >= sampled
    on the whole sf0.01 corpus."""
    from factstore_spark.queries import (
        dedup_embedding_recall_report,
        dedup_minhash_recall_report,
        dedup_simhash_recall_report,
    )

    sim = dedup_simhash_recall_report(spark, SF_DIR, sample_pct=100).collect()[0]
    assert (sim.recall_bp, sim.precision_bp) == (10000, 10000)

    mh = dedup_minhash_recall_report(spark, SF_DIR, sample_pct=100).collect()[0]
    assert mh.recall_bp >= 8500, mh
    assert mh.precision_bp == 10000  # verify_jaccard filters false accepts

    emb = dedup_embedding_recall_report(spark, SF_DIR, sample_pct=100).collect()[0]
    assert emb.sampled_precision_bp == 10000
    assert emb.trained_precision_bp == 10000
    assert emb.trained_recall_bp >= emb.sampled_recall_bp
