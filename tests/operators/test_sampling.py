"""Curation operator invariants: split determinism/stability, top-k
per group semantics, stratified sampling, contamination detection."""

from factstore_spark.operators.sampling import (
    contamination_check,
    stratified_sample,
    top_k_per_group,
    train_test_split,
)


def test_stratified_sample_per_stratum_fractions(spark):
    rows = [(i, "en" if i % 2 == 0 else "de") for i in range(2000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")
    out = stratified_sample(
        df, "lang", {"en": 0.5, "de": 0.1}, key_col="doc_id"
    ).collect()
    by_lang = {"en": 0, "de": 0}
    for r in out:
        by_lang[r.lang] += 1
    assert 0.4 < by_lang["en"] / 1000 < 0.6
    assert 0.05 < by_lang["de"] / 1000 < 0.16
    # determinism: identical selection on rerun
    again = stratified_sample(df, "lang", {"en": 0.5, "de": 0.1}, key_col="doc_id").collect()
    assert {r.doc_id for r in again} == {r.doc_id for r in out}
    # unlisted strata use the default fraction (0.0 -> dropped entirely)
    df2 = spark.createDataFrame([(i, "fr") for i in range(100)], "doc_id long, lang string")
    assert stratified_sample(df2, "lang", {"en": 1.0}, key_col="doc_id").count() == 0


def test_contamination_check_flags_exact_matches(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "THE QUICK BROWN FOX"),  # case-normalized match
            (3, "something else entirely"),
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame([(100, "the quick brown fox")], "doc_id long, text string")
    out = {r.doc_id: r.contaminated for r in contamination_check(corpus, bench).collect()}
    assert out == {1: True, 2: True, 3: False}


def test_split_deterministic_and_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(1000)], "doc_id long")
    a = {r.doc_id: r.split for r in train_test_split(df, "doc_id", 0.2).collect()}
    b = {r.doc_id: r.split for r in train_test_split(df, "doc_id", 0.2).collect()}
    assert a == b  # rerun-stable
    frac = sum(1 for v in a.values() if v == "test") / len(a)
    assert 0.15 < frac < 0.25  # md5 buckets approximate the fraction
    # Subset stability: the same key keeps its split in a smaller dataset
    # (no migration when data is refreshed — the leakage guard).
    small = spark.createDataFrame([(i,) for i in range(100)], "doc_id long")
    c = {r.doc_id: r.split for r in train_test_split(small, "doc_id", 0.2).collect()}
    assert all(a[k] == v for k, v in c.items())


def test_split_salt_changes_assignment(spark):
    df = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    a = {r.doc_id: r.split for r in train_test_split(df, "doc_id", 0.5, salt="s1").collect()}
    b = {r.doc_id: r.split for r in train_test_split(df, "doc_id", 0.5, salt="s2").collect()}
    assert a != b


def test_top_k_per_group(spark):
    rows = [(g, i, float((i * 7) % 10)) for g in ("a", "b") for i in range(10)]
    df = spark.createDataFrame(rows, "grp string, id long, score double")
    out = top_k_per_group(df, "grp", "score", 3, "id")
    by_group = {}
    for r in out.collect():
        by_group.setdefault(r.grp, []).append((r.score, r.id))
    for g, kept in by_group.items():
        assert len(kept) == 3
        assert min(s for s, _ in kept) >= 7.0  # top scores are 9,8,7


def test_pack_sequences_bins_and_totals(spark):
    """Crafted shard: doc tokens 300+300 overflow a 512 bin at the
    second doc (cum_before 300 -> bin 0), third doc opens bin 1
    (cum_before 600). Token totals are conserved exactly."""
    from factstore_spark.operators.sampling import pack_sequences

    rows = [(i, " ".join(["w"] * 300)) for i in range(4)]  # 300 tokens each
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, capacity=512, n_shards=1)
    bins = {(r.shard, r.bin): (r.n_docs, r.n_tokens) for r in out.collect()}
    # cum_before: 0, 300, 600, 900 -> bins 0, 0, 1, 1
    assert bins == {(0, 0): (2, 600), (0, 1): (2, 600)}
    # sharded run conserves docs and tokens
    out8 = pack_sequences(df, capacity=512, n_shards=8)
    totals = out8.groupBy().sum("n_docs", "n_tokens").collect()[0]
    assert totals[0] == 4 and totals[1] == 1200


def test_pack_sequences_vocab_token_exact(spark):
    """With a vocab, in-vocab tokens cost 1 id and OOV tokens fall back
    to char-level ids (len(token) each) — hand-computable on a crafted
    corpus."""
    from factstore_spark.operators.sampling import pack_sequences

    rows = [
        (0, "aa aa bb"),        # aa,aa in vocab (2) + OOV 'bb' (2 chars) = 4
        (1, "aa zzzz"),         # 1 + 4 = 5
        (2, "qq"),              # OOV only: 2
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    vocab = spark.createDataFrame([("aa", 0)], "token string, token_id long")
    out = pack_sequences(df, capacity=6, n_shards=1, vocab=vocab)
    bins = {(r.shard, r.bin): (r.n_docs, r.n_tokens) for r in out.collect()}
    # cum_before: 0, 4, 9 -> bins 0, 0, 1 ; totals 4+5=9 and 2
    assert bins == {(0, 0): (2, 9), (0, 1): (1, 2)}


def test_pack_sequences_deterministic_across_runs(spark):
    from factstore_spark.operators.sampling import pack_sequences

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = sorted(map(tuple, pack_sequences(docs).collect()))
    b = sorted(map(tuple, pack_sequences(docs.repartition(7)).collect()))
    assert a == b  # partitioning of the input never changes bins


def test_curation_funnel_monotone_and_exact(spark):
    """Hand-built corpus with one planted failure per stage: funnel
    counts must drop by exactly one survivor at each stage."""
    from factstore_spark.operators.sampling import curation_funnel

    good = ("the data of the table is a good row and it is the best "
            "table of all the data in the set and the value is good") * 3
    rows = [
        (0, good),                      # survives everything
        (1, good),                      # duplicate of 0 -> dropped at dedup
        (2, "el la de que y " * 30),    # spanish -> dropped at lang
        (3, "zzz qqq xxx " * 40),       # no markers -> und -> dropped at lang
        (4, good + " extra tail"),      # survives (distinct fp)
        (5, "the a of and is"),         # english but 5 tokens -> dropped at length
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.stage_name: r.n for r in curation_funnel(df, min_tokens=10).collect()}
    assert out["all"] == 6
    assert out["lang"] == 4          # 2 non-english dropped
    assert out["quality"] <= out["lang"]
    assert out["dedup"] == out["quality"] - 1   # the planted duplicate
    assert out["length"] == out["dedup"] - 1    # the 5-token doc
    ns = [r.n for r in curation_funnel(df, min_tokens=10).orderBy("stage").collect()]
    assert ns == sorted(ns, reverse=True)  # monotone non-increasing


def test_ngram_contamination_embedded_benchmark_text(spark):
    from factstore_spark.operators.sampling import ngram_contamination

    bench = spark.createDataFrame([(100, "a b c d e")], "doc_id long, text string")
    corpus = spark.createDataFrame(
        [
            (0, "z z a b c d e z"),   # embeds both bench 4-grams
            (1, "totally unrelated words here"),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.n_shared_grams for r in
           ngram_contamination(corpus, bench, n=4).collect()}
    assert out == {0: 2}  # 'a b c d' and 'b c d e'
    assert ngram_contamination(corpus, bench, n=4, min_shared=3).count() == 0


def test_ngram_contamination_broadcasts_benchmark(spark):
    import io
    from contextlib import redirect_stdout
    from factstore_spark.operators.sampling import ngram_contamination

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    bench = docs.filter("doc_id % 97 = 0")
    corpus = docs.filter("doc_id % 97 != 0")
    buf = io.StringIO()
    with redirect_stdout(buf):
        ngram_contamination(corpus, bench).explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()


def test_shuffle_shards_is_a_deterministic_permutation(spark):
    from factstore_spark.operators.sampling import shuffle_shards

    df = spark.createDataFrame([(i, f"d{i}") for i in range(200)], "doc_id long, text string")
    out = shuffle_shards(df, n_shards=4, seed="e0").collect()
    # every doc exactly once, shards in range
    assert sorted(r.doc_id for r in out) == list(range(200))
    assert {r.shard for r in out} <= set(range(4))
    # positions are contiguous 0..n-1 within each shard
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for positions in by_shard.values():
        assert sorted(positions) == list(range(len(positions)))
    # identical rerun -> identical assignment; new seed -> different order
    again = shuffle_shards(df, n_shards=4, seed="e0").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    other = shuffle_shards(df, n_shards=4, seed="e1").collect()
    assert sorted(map(tuple, out)) != sorted(map(tuple, other))
    # the within-shard order is md5-scrambled, not id order
    first_shard = sorted((r.pos, r.doc_id) for r in out if r.shard == 0)
    ids_in_pos_order = [d for _, d in first_shard]
    assert ids_in_pos_order != sorted(ids_in_pos_order)


def test_upsample_by_weights_copies_and_determinism(spark):
    """weight 2.5: every doc twice + a deterministic ~half a third
    time; weight 0: dropped; fractional-only weight: a subset once.
    Same rows on every run / any partitioning."""
    from factstore_spark.operators.sampling import upsample_by_weights

    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    mixed = upsample_by_weights(
        df, "source", {"a": 2.5, "b": 0.5, "c": 0.0}, key_col="doc_id"
    )
    per = {r.source: (r.n, r.docs) for r in mixed.groupBy("source").agg(
        __import__("pyspark.sql.functions", fromlist=["F"]).count("*").alias("n"),
        __import__("pyspark.sql.functions", fromlist=["F"]).countDistinct("doc_id").alias("docs"),
    ).collect()}
    assert "c" not in per                     # weight 0 drops the source
    a_n, a_docs = per["a"]
    assert a_docs == 100 and 200 <= a_n <= 300  # 2 copies + ~half a third
    b_n, b_docs = per["b"]
    assert b_n == b_docs and 0 < b_docs < 100   # fractional downsample
    again = upsample_by_weights(
        df.repartition(7), "source", {"a": 2.5, "b": 0.5, "c": 0.0}, key_col="doc_id"
    )
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, mixed.collect()))


def test_upsample_by_weights_exact_against_python_md5(spark):
    """The md5 bucket contract is auditable OUTSIDE Spark: recompute
    every doc's copy count in pure Python (hashlib) and require exact
    agreement — not just aggregate ranges."""
    import hashlib

    from factstore_spark.operators.sampling import upsample_by_weights

    weights = {"a": 2.5, "b": 0.5, "c": 0.0}
    rows = [(i, ["a", "b", "c"][i % 3]) for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, source string")

    def expected_copies(doc_id, source):
        w = weights.get(source, 1.0)
        bucket = int(hashlib.md5(f"mix{doc_id}".encode()).hexdigest()[:8], 16) % 100
        return int(w) + (1 if bucket < round((w % 1.0) * 100) else 0)

    want = {
        (i, s): expected_copies(i, s) for i, s in rows if expected_copies(i, s) > 0
    }
    got = {}
    for r in upsample_by_weights(df, "source", weights, key_col="doc_id").collect():
        got[(r.doc_id, r.source)] = max(got.get((r.doc_id, r.source), 0), r.copy)
    assert got == want


def test_cap_per_group_matches_window_form(spark):
    import random

    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from factstore_spark.operators.sampling import cap_per_group

    rnd = random.Random(5)
    rows = [(i, f"src{i % 4}", rnd.randint(0, 99)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, src string, w long").repartition(16)
    got = {
        (r.src, r.id)
        for r in cap_per_group(
            df, "src", 10, [F.col("w").desc(), F.col("id").asc()], num_partitions=8
        ).collect()
    }
    wdw = Window.partitionBy("src").orderBy(F.col("w").desc(), F.col("id").asc())
    want = {
        (r.src, r.id)
        for r in df.withColumn("rn", F.row_number().over(wdw))
        .filter(F.col("rn") <= 10)
        .collect()
    }
    assert got == want and len(got) == 40


def test_write_training_shards_deterministic_and_validated(spark, tmp_path):
    """Two writes of the same corpus+seed produce IDENTICAL manifests
    (md5 permutation, no RNG); the written files validate; per-shard
    positions are a contiguous permutation and every doc appears exactly
    once; deleting a shard's data is caught by validation."""
    import os
    import shutil

    from pyspark.sql import functions as F

    from factstore_spark.operators.sampling import (
        validate_training_shards,
        write_training_shards,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    p1, p2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    m1 = write_training_shards(docs, p1, n_shards=4)
    m2 = write_training_shards(docs, p2, n_shards=4)
    assert m1["shards"] == m2["shards"]
    assert sum(v["rows"] for v in m1["shards"].values()) == docs.count()

    v = validate_training_shards(spark, p1)
    assert v["ok"], v["problems"]
    vdir = m1["version"]
    back = spark.read.parquet(os.path.join(p1, vdir))
    assert back.select("doc_id").distinct().count() == docs.count()
    # one data file per non-empty shard: the sorted read order IS the epoch order
    for shard_dir in os.listdir(os.path.join(p1, vdir)):
        if shard_dir.startswith("shard="):
            files = [
                f for f in os.listdir(os.path.join(p1, vdir, shard_dir))
                if f.endswith(".parquet")
            ]
            assert len(files) == 1, (shard_dir, files)

    # re-shard with a new seed: a crash mid-write must never touch the
    # published epoch, so the NEW version lands beside the old and only
    # the manifest swap republishes — the old version dir survives
    m3 = write_training_shards(docs, p1, n_shards=4, seed="epoch1")
    assert m3["version"] != m1["version"]
    assert os.path.isdir(os.path.join(p1, vdir))  # previous epoch intact
    assert validate_training_shards(spark, p1)["ok"]

    shutil.rmtree(os.path.join(p1, m3["version"], "shard=1"))
    v2 = validate_training_shards(spark, p1)
    assert not v2["ok"] and any("shard 1" in p for p in v2["problems"])


def test_write_training_shards_empty_corpus_publishes_empty_manifest(spark, tmp_path):
    """A zero-row corpus must publish an empty-shards manifest (and
    validate), not crash schema inference on a data-file-less write."""
    from factstore_spark.operators.sampling import (
        validate_training_shards,
        write_training_shards,
    )

    empty = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(0)
    m = write_training_shards(empty, str(tmp_path / "empty-shards"), n_shards=4)
    assert m["shards"] == {}
    assert validate_training_shards(spark, str(tmp_path / "empty-shards"))["ok"]
