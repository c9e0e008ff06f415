"""End-to-end curate_corpus semantics on a planted tiny corpus."""

import pytest

from factstore_spark.operators.pipeline import curate_corpus


GOOD = ("the data of the table is a good row and it is the best "
        "table of all the data in the set and the value is good ") * 3


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (0, GOOD + "alpha tail marker one"),        # survives
        (1, GOOD + "alpha tail marker one"),        # exact dup of 0 -> dropped
        (2, "el la de que y " * 30),                # spanish -> dropped
        (3, GOOD + "beta tail different marker"),   # survives
        (4, GOOD + "gamma entirely other ending"),  # survives
        (5, "the a of and is"),                     # too short -> dropped
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_corpus_stages_drop_planted_docs(spark, corpus):
    out = {r.doc_id for r in curate_corpus(corpus).collect()}
    assert out == {0, 3, 4}


TA = "the cat sat on the mat and it was a good day for all of the cats in town " * 3
TB = "a dog ran through the park and it is fun to watch the dogs play in the sun " * 3
TC = "the bird flew over the lake and it is nice to see the birds glide in air " * 3


def test_curate_corpus_decontaminates_against_benchmark(spark):
    docs = spark.createDataFrame(
        [(0, TA), (1, TB), (2, TC)], "doc_id long, text string"
    )
    # bench 100 = doc 1's text verbatim (exact fp hit); bench 101 embeds
    # an 8-gram of doc 2 (n-gram overlap hit); doc 0 is untouched
    bench = spark.createDataFrame(
        [
            (100, TB),
            (101, "prefix words " + "the bird flew over the lake and it " + "suffix"),
        ],
        "doc_id long, text string",
    )
    assert {r.doc_id for r in curate_corpus(docs).collect()} == {0, 1, 2}
    out = {r.doc_id for r in curate_corpus(docs, benchmark=bench).collect()}
    assert out == {0}


def test_curate_corpus_minhash_removes_near_dup_keeping_representative(spark):
    near = TA
    near2 = TA.replace("mat", "rug")  # one token changed -> high Jaccard
    # TC is real-distinct (J ~ 0.2): GOOD-style shared blocks would
    # collapse ALL docs into one cluster under set-of-shingles Jaccard
    df = spark.createDataFrame(
        [(0, near), (1, near2), (2, TC)],
        "doc_id long, text string",
    )
    out = {r.doc_id for r in curate_corpus(
        df, near_dup="minhash", minhash_verify_jaccard=0.5
    ).collect()}
    assert out == {0, 2}  # 1 collapses into 0's cluster; 0 is the min-id rep

    with pytest.raises(ValueError):
        curate_corpus(df, near_dup="simhashish")


def test_curate_corpus_output_is_shard_addressed(spark, corpus):
    rows = curate_corpus(corpus, n_shards=2).collect()
    assert {c for c in rows[0].asDict()} == {"doc_id", "shard", "pos"}
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))


def test_prepare_training_data_end_to_end(spark, tmp_path):
    """The full prepare-training-data story composed from its parts:
    curate -> leakage-safe cluster split -> physical shard write for the
    train split -> manifest validation. Invariants: every shard row is a
    curated TRAIN doc, no near-dup pair straddles train/eval, and the
    shard manifest re-validates from the written files."""
    import os

    from pyspark.sql import functions as F

    from factstore_spark.operators.dedup import (
        dup_clusters,
        ngram_jaccard_pairs,
    )
    from factstore_spark.operators.pipeline import curate_corpus
    from factstore_spark.operators.sampling import (
        split_bucket,
        validate_training_shards,
        write_training_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    curated = curate_corpus(docs, quality_threshold=0.3, min_tokens=5)
    kept = curated.select("doc_id")  # curate_corpus emits (id, shard, pos)
    assert kept.count() > 0

    pairs = ngram_jaccard_pairs(docs, n=3, min_jaccard=0.2, max_shingle_df=20)
    clusters = dup_clusters(pairs)
    assign = (
        kept.join(clusters, "doc_id", "left")
        .select("doc_id", F.coalesce("cluster_id", "doc_id").alias("unit"))
        .withColumn("b", split_bucket("unit", 100, salt="leakage"))
        .withColumn("split", F.when(F.col("b") < 90, "train").otherwise("eval"))
    )
    sa = assign.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa"))
    sb = assign.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb"))
    straddle = (
        pairs.join(sa, "id_a").join(sb, "id_b").filter(F.col("sa") != F.col("sb"))
    )
    assert straddle.count() == 0

    train = docs.join(
        assign.filter(F.col("split") == "train").select("doc_id"), "doc_id"
    )
    d = str(tmp_path / "train-shards")
    manifest = write_training_shards(train, d, n_shards=4)
    assert validate_training_shards(spark, d)["ok"]
    shard_rows = sum(v["rows"] for v in manifest["shards"].values())
    assert shard_rows == train.count()
    back_ids = {
        r.doc_id
        for r in spark.read.parquet(os.path.join(d, manifest["version"]))
        .select("doc_id").collect()
    }
    train_ids = {r.doc_id for r in train.select("doc_id").collect()}
    assert back_ids == train_ids


def test_curate_corpus_learned_gate_stage(spark):
    """The optional learned-gate stage drops model-rejected docs before
    dedup; with no gate the pipeline is unchanged."""
    from pyspark.sql import functions as F

    from factstore_spark.operators.pipeline import curate_corpus
    from factstore_spark.operators.quality_model import train_quality_classifier

    good = (
        "the quick brown foxes have jumped over the lazy dogs "
        "with great energy and style " * 2
    )
    rows = [
        (i, good + f"variant{i}" if i % 2 == 0 else "@@ ## $$")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    model = train_quality_classifier(docs)

    base = {r.doc_id for r in curate_corpus(docs, quality_threshold=0.0).collect()}
    gated = {
        r.doc_id
        for r in curate_corpus(docs, quality_threshold=0.0, learned_gate=model).collect()
    }
    # the junk docs die at the heuristic lang stage either way; the
    # gate must never ADD docs, and must keep the clearly-good ones
    assert gated <= base
    assert gated == {i for i in range(40) if i % 2 == 0}
