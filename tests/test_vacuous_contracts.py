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
    assert (r.n_incremental, r.n_inline, r.n_common) == (0, 0, 0)
    assert r.match_bp == 10000
