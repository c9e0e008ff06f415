"""Curation operator invariants: split determinism/stability, top-k
per group semantics."""

from factstore_spark.operators.sampling import top_k_per_group, train_test_split


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
