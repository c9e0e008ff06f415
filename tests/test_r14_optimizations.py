"""Round-14 optimization equivalence tests: every change here reshaped
an operator's internals (fewer passes / fewer boundary crossings) while
keeping its output bit-identical — these tests pin the equivalence."""

import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (i, "the quick brown fox jumps over the lazy dog variant %d" % (i % 4))
        for i in range(40)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_merge_observed_stats_match_read_back(spark, tmp_path):
    """The manifest stats that ride the write job (Observation) must be
    byte-identical to what the old post-write read-back computed."""
    from factstore_spark.storage.merge import (
        _head_manifest,
        _partition_stats,
        _read_version_df,
        create_table,
        merge_upsert,
    )

    d = str(tmp_path / "t")
    df = spark.range(97).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("p"),
        (F.col("id") * 3).alias("v"),
    )
    create_table(df, d, ["k"], "p")
    m = _head_manifest(d)
    version = next(iter(m["partitions"].values())).split("/", 1)[0]
    read_back = _partition_stats(
        _read_version_df(spark, d, version, df.schema), ["k"], "p"
    )
    assert m["stats"] == read_back

    up = spark.range(10).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("p"),
        F.lit(999).alias("v"),
    )
    m2 = merge_upsert(up, d)
    versions = {rel.split("/", 1)[0] for rel in m2["partitions"].values()}
    for version in versions:
        rb = _partition_stats(
            _read_version_df(spark, d, version, df.schema), ["k"], "p"
        )
        for pval, st in rb.items():
            if m2["partitions"][pval].startswith(version):
                assert m2["stats"][pval] == st


def test_validate_scd2_counts_ride_audit_pass(spark, tmp_path):
    from factstore_spark.storage.scd2 import (
        create_scd2_table,
        scd2_upsert,
        validate_scd2,
    )

    d = str(tmp_path / "dim")
    dim = spark.range(12).select(
        F.col("id").alias("k"),
        F.lit("a").alias("seg"),
        (F.col("id") % 2).cast("string").alias("p"),
        F.lit(10).alias("effective_ts"),
    )
    create_scd2_table(dim, d, ["k"], "p")
    b1 = spark.range(4).select(
        F.col("id").alias("k"),
        F.lit("b").alias("seg"),
        (F.col("id") % 2).cast("string").alias("p"),
        F.lit(20).alias("effective_ts"),
    )
    scd2_upsert(b1, d)
    v = validate_scd2(spark, d)
    assert v["ok"]
    # 12 keys, 12 initial + 4 changed (close+open adds one interval per
    # change), 12 open
    assert (v["n_keys"], v["n_intervals"], v["n_open"]) == (12, 16, 12)
    # an unchanged replay publishes nothing (n_write guard fast path)
    snap = scd2_upsert(b1, d)
    assert validate_scd2(spark, d)["n_intervals"] == 16
    assert snap["snapshot"] == 2  # unchanged manifest returned, not republished


def test_incremental_minhash_matches_oneshot_restriction(spark, docs, tmp_path):
    """The restructured candidate join (batch side broadcast, verify
    semi-joined to candidate ids) must reproduce the one-shot LSH
    restricted to pairs touching the increment — the same A/B the
    battery entry asserts, pinned here at unit scale."""
    import os

    from factstore_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_lsh_pairs,
        write_minhash_index,
    )

    idx = os.path.join(str(tmp_path), "idx")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    inc = docs.filter(F.col("doc_id") % 2 == 1)
    write_minhash_index(hist, idx)
    got = sorted(
        (r.id_a, r.id_b)
        for r in incremental_minhash_pairs(inc, idx).collect()
    )
    want = sorted(
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, verify_jaccard=0.5)
        .filter((F.col("id_a") % 2 == 1) | (F.col("id_b") % 2 == 1))
        .collect()
    )
    assert got == want and got  # non-vacuous


def test_fused_mp4_timing_equals_two_stage(spark, docs):
    from factstore_spark.operators import multimodal as mm

    ids = docs.select("doc_id").limit(25)
    two_stage = sorted(
        tuple(r)
        for r in mm.mp4_timing_stats(mm.synth_mp4_timing_corpus(ids)).collect()
    )
    fused = sorted(
        tuple(r) for r in mm.mp4_timing_stats_from_ids(ids).collect()
    )
    assert fused == two_stage and fused


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.mark.parametrize(
    "fused_kwargs,corpus_fn,probe_fn",
    [
        ({}, "synth_media_corpus", "decode_real_meta"),
        ({"group_mod": 40}, "synth_media_corpus", "decode_real_meta"),
        ({"corpus": "jpeg"}, "synth_jpeg_corpus", "decode_real_meta"),
        ({"corpus": "jpeg", "variant": "dri"}, "synth_jpeg_corpus", "decode_real_meta"),
        (
            {"corpus": "jpeg", "variant": "progressive"},
            "synth_jpeg_corpus",
            "decode_real_meta",
        ),
        ({"corpus": "mp4"}, "synth_mp4_corpus", "decode_real_meta"),
    ],
)
def test_fused_real_meta_equals_two_stage(
    spark, docs, fused_kwargs, corpus_fn, probe_fn
):
    """real_meta_from_ids must be row-identical to the two-stage
    synth → decode composition it replaces (all corpora/variants)."""
    from factstore_spark.operators import multimodal as mm

    ids = docs.select("doc_id").limit(30)
    synth_kwargs = {
        k: v for k, v in fused_kwargs.items() if k in ("group_mod", "variant")
    }
    media = getattr(mm, corpus_fn)(ids, **synth_kwargs)
    two_stage = _rows(getattr(mm, probe_fn)(media))
    fused = _rows(mm.real_meta_from_ids(ids, **fused_kwargs))
    assert fused == two_stage and fused


def test_fused_thumbnails_equal_two_stage(spark, docs):
    from factstore_spark.operators import multimodal as mm

    ids = docs.select("doc_id").limit(30)
    media = mm.synth_media_corpus(ids).filter(F.col("format") != "wav")
    two_stage = _rows(mm.real_thumbnails(media, target_w=8, target_h=8))
    fused = _rows(mm.thumbnails_from_ids(ids, target_w=8, target_h=8))
    assert fused == two_stage and fused


def test_fused_audio_gating_equals_two_stage(spark, docs):
    from factstore_spark.operators import multimodal as mm

    ids = docs.select("doc_id").filter(F.col("doc_id") % 3 == 2).limit(20)
    two_stage = _rows(mm.audio_gating_stats(mm.synth_media_corpus(ids)))
    fused = _rows(mm.audio_gating_stats_from_ids(ids))
    assert fused == two_stage and fused


def test_fused_mp4_container_meta_equals_two_stage(spark, docs):
    from factstore_spark.operators import multimodal as mm

    ids = docs.select("doc_id").limit(30)
    two_stage = _rows(mm.mp4_container_meta(mm.synth_mp4_edge_corpus(ids)))
    fused = _rows(mm.mp4_container_meta_from_ids(ids))
    assert fused == two_stage and fused


def test_fused_mp4_keyframe_stats_equal_two_stage(spark, docs):
    from factstore_spark.operators import multimodal as mm

    ids = docs.select("doc_id").limit(30)
    two_stage = _rows(mm.mp4_keyframe_stats(mm.synth_mp4_keyframe_corpus(ids)))
    fused = _rows(mm.mp4_keyframe_stats_from_ids(ids))
    assert fused == two_stage and fused


def test_fused_mp4_sample_stats_equal_two_stage(spark, docs):
    from factstore_spark.operators import multimodal as mm

    ids = docs.select("doc_id").limit(25)
    two_stage = _rows(mm.mp4_sample_stats(mm.synth_mp4_corpus(ids)))
    fused = _rows(mm.mp4_sample_stats_from_ids(ids))
    assert fused == two_stage and fused


def test_fused_frame_dup_pairs_equal_two_stage(spark, docs):
    from factstore_spark.operators import multimodal as mm

    # 2 docs per mod-40 content class, so same-class pairs exist
    ids = spark.range(80).select(F.col("id").alias("doc_id"))
    two_stage = _rows(mm.real_frame_dup_pairs(mm.synth_gif_corpus(ids), min_shared=1))
    fused = _rows(mm.real_frame_dup_pairs_from_ids(ids, min_shared=1))
    assert fused == two_stage and fused


def test_signature_cache_scopes_are_thread_local(spark):
    """Entries overlap independent Spark actions from driver threads
    (guide §2.6); the signature cache scopes must therefore be PER
    THREAD — one thread's scope exit must never pop (and unpersist)
    another thread's token, and a worker thread's registrations must
    not land in a scope the main thread opened."""
    import threading

    from factstore_spark.operators.dedup import (
        _cache_scopes,
        _scoped_cache,
        signature_cache_scope,
    )

    df_main = spark.range(10).select(F.col("id").alias("a"))
    df_thread = spark.range(20).select(F.col("id").alias("b"))
    seen = {}

    def worker():
        # the main thread holds an OPEN scope right now; this thread
        # must see an empty stack of its own
        seen["stack_at_entry"] = len(_cache_scopes())
        with signature_cache_scope():
            out = _scoped_cache(df_thread)
            out.count()
            seen["cached_inside"] = out.storageLevel.useMemory
        seen["released_after"] = not df_thread.storageLevel.useMemory

    with signature_cache_scope():
        main_cached = _scoped_cache(df_main)
        main_cached.count()
        t = threading.Thread(target=worker)
        t.start()
        t.join()
        # the worker's scope exit must NOT have popped this thread's
        # token: df_main is still registered and still cached
        assert main_cached.storageLevel.useMemory
    assert not df_main.storageLevel.useMemory  # released by OUR exit
    assert seen == {
        "stack_at_entry": 0,
        "cached_inside": True,
        "released_after": True,
    }


def test_stream_sink_concurrent_writes_match_sequential(spark, docs, tmp_path):
    """The sink now runs the pairs write and the index append
    concurrently; the harvested pair set and the committed segments
    must equal the documented sequential semantics (union of streamed
    pairs == one-shot LSH restricted to streamed docs; one segment per
    non-empty batch)."""
    import json
    import os

    from factstore_spark.operators.dedup import (
        minhash_lsh_pairs,
        start_dedup_stream,
        write_minhash_index,
    )

    hist = docs.filter(F.col("doc_id") % 3 == 0)
    inc = docs.filter(F.col("doc_id") % 3 != 0)
    idx = str(tmp_path / "idx")
    write_minhash_index(hist, idx)
    src = str(tmp_path / "src")
    inc.filter(F.col("doc_id") % 3 == 1).coalesce(1).write.mode(
        "append").parquet(src)
    inc.filter(F.col("doc_id") % 3 == 2).coalesce(1).write.mode(
        "append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = start_dedup_stream(
        stream, idx, str(tmp_path / "pairs"), str(tmp_path / "ckpt"),
        available_now=True,
    )
    q.awaitTermination(180)
    got = {
        (r.id_a, r.id_b)
        for r in spark.read.parquet(str(tmp_path / "pairs")).collect()
    }
    members = {r.doc_id for r in inc.select("doc_id").collect()}
    want = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, verify_jaccard=0.5).collect()
        if r.id_a in members or r.id_b in members
    }
    assert got == want and want
    m = json.load(open(os.path.join(idx, "manifest.json")))
    assert len(m["segments"]) == 3  # bootstrap + 2 non-empty batches


def test_validate_keyed_batch_grouped_formulation(spark):
    """The grouped two-level validation (r14: no countDistinct Expand)
    must reproduce the old global aggregate's semantics exactly:
    duplicate detection (incl. null-keyed duplicates), null-key and
    null-partition rejection, the partition-value set, and the
    empty-batch no-op."""
    from factstore_spark.storage.merge import (
        _validate_batch,
        validate_keyed_batch,
    )

    clean = spark.createDataFrame(
        [(1, "a", 10), (2, "a", 20), (3, "b", 30)], "k long, p string, v long"
    )
    assert _validate_batch(clean, ["k"], "p", "t") == ["a", "b"]
    row = validate_keyed_batch(clean, ["k"], "t")
    assert (row.n, row.nk) == (3, 3)

    # empty batch: n == nk == 0 (sum over zero groups must coalesce)
    empty = clean.limit(0)
    row = validate_keyed_batch(empty, ["k"], "t")
    assert (row.n, row.nk) == (0, 0)
    assert _validate_batch(empty, ["k"], "p", "t") == []

    # plain duplicate key
    dup = spark.createDataFrame(
        [(1, "a", 10), (1, "a", 11)], "k long, p string, v long"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        validate_keyed_batch(dup, ["k"], "t")

    # null-KEYED rows: a single null key row is rejected as null, and
    # two null-keyed rows are duplicates OF EACH OTHER (groupBy puts
    # them in one group, matching the old countDistinct(struct))
    nulled = spark.createDataFrame(
        [(None, "a", 10), (2, "a", 20)], "k long, p string, v long"
    )
    with pytest.raises(ValueError, match="NULL key"):
        validate_keyed_batch(nulled, ["k"], "t")

    # composite key: only one field null -> struct is non-null for
    # distinct-counting but the null-key check still fires first
    comp = spark.createDataFrame(
        [(1, None, "a"), (1, None, "b")], "k1 long, k2 long, p string"
    )
    with pytest.raises(ValueError, match="NULL key"):
        validate_keyed_batch(comp, ["k1", "k2"], "t")

    # null partition value rejected by the riding extra aggregate
    nullp = spark.createDataFrame(
        [(1, None, 10), (2, "a", 20)], "k long, p string, v long"
    )
    with pytest.raises(ValueError, match="non-null"):
        _validate_batch(nullp, ["k"], "p", "t")

    # partition-value set is the exact union across key groups
    many = spark.createDataFrame(
        [(i, "p%d" % (i % 7), i) for i in range(50)],
        "k long, p string, v long",
    )
    assert _validate_batch(many, ["k"], "p", "t") == sorted(
        {"p%d" % i for i in range(7)}
    )
