"""Self-validating battery entries must emit a vacuous PASS (match_bp
10000 with zeroed counters), never NULLs, when the sampled corpus
yields zero candidate pairs — sum() over zero rows is NULL in SQL, so
the contract columns coalesce (ADVICE r7)."""

import uuid


def test_incremental_minhash_vacuous_pass_on_unique_corpus(spark, tmp_path):
    rows = [
        (i, " ".join(uuid.uuid4().hex for _ in range(30)), "en", "web", 100)
        for i in range(12)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    sf = tmp_path / "sf"
    sf.mkdir()
    docs.coalesce(1).write.parquet(str(sf / "documents.parquet"))

    from factstore_spark import queries

    out = queries.dedup_incremental_minhash(spark, str(sf)).collect()
    assert len(out) == 1
    r = out[0]
    # all-unique corpus: no pairs on either side, no exact cross
    # near-dups — the diffs are zero BY VACUITY and the witness column
    # makes that visible instead of indistinguishable from a real pass
    assert (r.n_only_incremental, r.n_only_oneshot) == (0, 0)
    assert r.n_exact_cross_pairs == 0
    # the 50%-ppm md5 sample keeps a deterministic subset of the 12
    assert 0 < r.n_index_docs + r.n_increment_docs <= 12
    assert r.match_bp == 10000
