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
