"""Multimodal plumbing: Arrow-batched mapInPandas schemas, deterministic
fake decode, frame-sampling explode shape."""

from pyspark.sql import functions as F

from factstore_spark.operators import multimodal as M


def test_extract_media_meta_schema_and_determinism(spark):
    df = spark.createDataFrame(
        [(1, b"\x89PNG....fake-bytes", "image/png"), (2, b"", "image/png")],
        "media_id long, data binary, format string",
    )
    out = {r.media_id: r for r in M.extract_media_meta(df).collect()}
    assert set(out[1].asDict()) == {"media_id", "format", "n_bytes", "width", "height", "n_frames"}
    assert out[1].n_bytes == 18
    assert out[2].n_bytes == 0
    # Deterministic: same input -> same fake dimensions.
    again = {r.media_id: r for r in M.extract_media_meta(df).collect()}
    assert out[1] == again[1]


def test_sample_frames_shape(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(200)))], "media_id long, data binary"
    )
    rows = M.sample_frames(df, every_nth=4).collect()
    assert len(rows) >= 1
    assert all(r.media_id == 1 for r in rows)
    assert all(r.frame_no % 4 == 0 for r in rows)
    assert all(isinstance(r.frame, (bytes, bytearray)) for r in rows)


def test_documents_as_media_adapter(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = M.documents_as_media(docs)
    meta = M.extract_media_meta(media)
    n = docs.count()
    assert meta.count() == n
    row = meta.filter("media_id = 0").collect()[0]
    assert row.n_bytes > 0 and row.width >= 16 and row.height >= 16


def test_extract_features_composes_with_similarity(spark, sf_dir):
    """Multimodal -> ANN pipeline: featurize bytes, then cosine top-k
    over the resulting embedding column."""
    from factstore_spark.operators import similarity as S

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
    media = M.documents_as_media(docs)
    emb = M.extract_features(media, dim=32).withColumnsRenamed({"media_id": "vec_id"})
    q = emb.filter("vec_id < 3")
    out = S.brute_force_topk(emb, q, k=2)
    rows = out.collect()
    assert len(rows) == 6  # 3 queries x k=2
    assert all(-1.0 <= r.sim <= 1.0001 for r in rows)
    # Determinism: same bytes -> same features -> same neighbors.
    again = S.brute_force_topk(emb, q, k=2).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_resize_media_shape(spark):
    df = spark.createDataFrame(
        [(1, bytes(range(256)) * 64)], "media_id long, data binary"
    )
    rows = M.resize_media(df, target_w=8, target_h=8).collect()
    assert len(rows) == 1
    assert rows[0].thumb_w == 8 and rows[0].thumb_h == 8
    assert len(rows[0].thumb) == 64


def test_frame_dup_pairs_finds_shared_frames(spark):
    """Identical media bytes share every sampled frame; unrelated bytes
    share none; a frame present in EVERY media (hot, logo-like) is
    capped out and creates no pairs on its own."""
    import os
    import random

    from pyspark.sql import functions as F

    from factstore_spark.operators.multimodal import frame_dup_pairs

    rnd = random.Random(4)
    blob = bytes(rnd.randrange(256) for _ in range(4096))
    other = bytes(rnd.randrange(256) for _ in range(4096))
    rows = [
        (1, bytearray(blob)),
        (2, bytearray(blob)),        # exact re-post of 1
        (3, bytearray(other)),       # unrelated
        (4, bytearray(blob[:2048] + other[2048:])),  # half shared with 1/2
    ]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    got = {
        (r.id_a, r.id_b): r.shared_frames
        for r in frame_dup_pairs(df, min_shared=2, max_frame_df=20).collect()
    }
    assert (1, 2) in got
    assert all(3 not in pair for pair in got)
    full = got[(1, 2)]
    assert full >= 2
    for pair in ((1, 4), (2, 4)):
        if pair in got:
            # partial overlap never shares MORE than the exact re-post
            # (with few sampled frames the counts can tie)
            assert got[pair] <= full

    # hot-frame cap: the same blob in MANY media exceeds max_frame_df
    many = spark.createDataFrame(
        [(i, bytearray(blob)) for i in range(30)], "media_id long, data binary"
    )
    assert frame_dup_pairs(many, min_shared=1, max_frame_df=20).count() == 0


def test_frame_dup_oracle_char_byte_equivalence(spark, sf_dir):
    """The MULTIMODAL_FRAME_DUP_SQL oracle slices frames as CHAR
    substrings while the sampler slices BYTES — equivalent only while
    the corpus is ASCII. Assert that here so a non-ASCII testdata
    refresh fails THIS test instead of hash-mismatching the driver."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_non_ascii = docs.filter(
        F.octet_length(F.col("text")) != F.length(F.col("text"))
    ).count()
    assert n_non_ascii == 0
