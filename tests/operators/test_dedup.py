"""Dedup operator invariants: exact groups, Jaccard math, MinHash-LSH
recall vs the exact pairs, SimHash Hamming properties."""

import pytest
from pyspark.sql import functions as F

from factstore_spark.operators import dedup as D


@pytest.fixture(scope="module")
def corpus(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = "the quick brown fox jumps over the lazy dog again and again tonight"
    far = "completely different words about database engines and spark plans"
    rows = [(0, base), (1, base), (2, near), (3, far), (4, "tiny doc")]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_dedup_groups(corpus):
    out = {r.doc_id: r.dup_count for r in D.exact_dedup(corpus, ["text"]).collect()}
    assert out[0] == 2        # docs 0,1 collapse to min id 0
    assert 1 not in out
    assert out[2] == 1 and out[3] == 1


def test_ngram_jaccard_pairs_math(corpus):
    pairs = {
        (r.id_a, r.id_b): r for r in D.ngram_jaccard_pairs(corpus, min_jaccard=0.0).collect()
    }
    exact = pairs[(0, 1)]
    assert exact.jaccard == 1.0 and exact.intersect_cnt == exact.union_cnt
    near = pairs[(0, 2)]
    # 13-token docs differing in last token: 11 shared shingles of 12.
    assert near.intersect_cnt == 10
    assert 0.5 < near.jaccard < 1.0
    assert (0, 3) not in pairs or pairs[(0, 3)].jaccard < 0.1


def test_minhash_lsh_finds_exact_and_near_dups(corpus):
    got = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in D.minhash_lsh_pairs(corpus, verify_jaccard=0.5).collect()
    }
    assert got[(0, 1)] == 1.0  # identical docs: signatures agree everywhere
    assert (0, 2) in got and got[(0, 2)] >= 0.5
    assert (0, 3) not in got


def test_simhash_identical_docs_distance_zero(corpus):
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_near_dup_pairs(corpus, max_hamming=16).collect()
    }
    assert pairs[(0, 1)] == 0
    if (0, 2) in pairs:
        assert pairs[(0, 2)] <= 16


def test_shingles_short_doc(spark):
    df = spark.createDataFrame([(0, "one two")], "doc_id long, text string")
    sh = df.select(D.shingles_col(n=3).alias("s")).collect()[0].s
    assert sh == ["one two"]  # shorter than n -> whole doc as one shingle


def test_dup_clusters_connected_components(spark):
    """Chain 1-2-3, pair 10-11, chain 20-21-22-23 (via transitive links):
    every node labels to its component minimum."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long",
    )
    out = {r.doc_id: r.cluster_id for r in D.dup_clusters(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 20, 21: 20, 22: 20, 23: 20}


def test_dup_clusters_long_chain_converges(spark):
    n = 30
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "id_a long, id_b long"
    )
    out = {r.doc_id: r.cluster_id for r in D.dup_clusters(pairs, max_iterations=40).collect()}
    assert set(out.values()) == {0}
    assert len(out) == n + 1


def test_dup_clusters_distributed_path_matches_driver_path(spark):
    """Forcing the distributed propagation (threshold=0) must give the
    same components as the driver-side union-find."""
    import random

    rnd = random.Random(5)
    pairs_py = {(rnd.randrange(0, 60), rnd.randrange(0, 60)) for _ in range(40)}
    pairs_py = [(a, b) for a, b in pairs_py if a < b]
    df = spark.createDataFrame(pairs_py, "id_a long, id_b long")
    fast = {r.doc_id: r.cluster_id for r in D.dup_clusters(df).collect()}
    dist = {r.doc_id: r.cluster_id for r in D.dup_clusters(df, driver_threshold=0).collect()}
    assert fast == dist


def test_substring_dup_spans_hand_computed(spark):
    df = spark.createDataFrame(
        [
            (0, "a b c d e f"),     # windows: abcd, bcde, cdef
            (1, "x y a b c d"),     # windows: xyab, yabc, abcd
            (2, "p q r s t u"),     # unrelated
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in D.substring_dup_spans(df, n=4).collect()}
    assert (rows[0].n_windows, rows[0].n_dup_windows, rows[0].dup_bp) == (3, 1, 3333)
    assert (rows[1].n_windows, rows[1].n_dup_windows, rows[1].dup_bp) == (3, 1, 3333)
    assert (rows[2].n_windows, rows[2].n_dup_windows, rows[2].dup_bp) == (3, 0, 0)


def test_substring_dup_spans_short_docs_whole_text_window(spark):
    df = spark.createDataFrame(
        [(0, "hi there"), (1, "hi there"), (2, "bye now")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in D.substring_dup_spans(df, n=4).collect()}
    assert (rows[0].n_windows, rows[0].dup_bp) == (1, 10000)
    assert (rows[1].n_windows, rows[1].dup_bp) == (1, 10000)
    assert rows[2].dup_bp == 0


def test_signature_cache_scope_releases_caches(spark):
    """Session-reuse contract: after a signature_cache_scope exits, the
    CacheManager holds nothing — a many-corpora session doesn't
    accumulate evict-only signature storage (VERDICT r5 #6)."""
    from factstore_spark.operators.dedup import (
        minhash_lsh_pairs,
        signature_cache_scope,
        simhash_near_dup_pairs,
    )

    docs = spark.createDataFrame(
        [(i, f"the quick brown fox {i % 7} jumps over dog {i % 5}") for i in range(60)],
        "doc_id long, text string",
    )
    cm = spark._jsparkSession.sharedState().cacheManager()
    spark.catalog.clearCache()
    assert cm.isEmpty()
    with signature_cache_scope():
        minhash_lsh_pairs(docs, verify_jaccard=0.5).collect()
        simhash_near_dup_pairs(docs, max_hamming=3).collect()
        assert not cm.isEmpty()  # caches live while the scope is open
    assert cm.isEmpty()  # and are gone the moment it closes


def test_ngram_containment_catches_subset_duplication(spark):
    """A short doc embedded verbatim in a long one: Jaccard is tiny
    (small/union) but containment of the smaller side is 1.0 — the
    case the containment operator exists for."""
    from factstore_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long_doc = short + " " + " ".join(f"filler{i} pad{i} more{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long_doc), (3, "totally unrelated words here now")],
        "doc_id long, text string",
    )
    cont = {(r.id_a, r.id_b): r.containment
            for r in ngram_containment_pairs(docs, min_containment=0.8).collect()}
    assert (1, 2) in cont and cont[(1, 2)] == 1.0
    assert all(p == (1, 2) for p in cont)
    jac = {(r.id_a, r.id_b)
           for r in ngram_jaccard_pairs(docs, min_jaccard=0.5).collect()}
    assert (1, 2) not in jac  # Jaccard misses exactly this pair


def test_exact_hamming_pairs_bounded_matches_join_form(spark):
    """The bounded-driver Hamming ground truth (probe path) must equal
    the all-pairs join form bit-for-bit, including sign-bit signatures
    (int64 view of uint64 hashes)."""
    from pyspark.sql import functions as F

    from factstore_spark.operators.dedup import exact_hamming_pairs_bounded

    sigs = [
        (1, 0), (2, 1), (3, 3), (4, 7), (5, -1), (6, -2),  # negative = high bit set
        (7, 0x7FFFFFFFFFFFFFFF), (8, 12345), (9, 12344),
        (10, None),  # null sig (null text): join form never pairs it
    ]
    df = spark.createDataFrame(sigs, "_id long, sim long")
    a = df.withColumnsRenamed({"_id": "id_a", "sim": "sim_a"})
    b = df.withColumnsRenamed({"_id": "id_b", "sim": "sim_b"})
    want = set(
        tuple(r)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .filter(F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))) <= 3)
        .select("id_a", "id_b")
        .collect()
    )
    got = set(tuple(r) for r in exact_hamming_pairs_bounded(df, max_hamming=3).collect())
    assert got == want and want  # non-vacuous

    import pytest

    with pytest.raises(ValueError, match="max_rows"):
        exact_hamming_pairs_bounded(df, max_hamming=3, max_rows=5)
    assert exact_hamming_pairs_bounded(df.limit(1), max_hamming=3).count() == 0


def test_incremental_minhash_index_matches_batch_pairs(spark, tmp_path):
    """The persisted signature index contract: an increment's pairs
    (against history + within itself) must equal the one-shot
    minhash_lsh_pairs over the union, restricted to pairs touching the
    increment — and a second increment, after append, must also see
    FIRST-increment docs as history."""
    from pyspark.sql import functions as F

    from factstore_spark.operators.dedup import (
        append_minhash_index,
        incremental_minhash_pairs,
        minhash_lsh_pairs,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    c1, c2 = ids[len(ids) // 2], ids[3 * len(ids) // 4]
    hist = docs.filter(F.col("doc_id") <= c1)
    inc1 = docs.filter((F.col("doc_id") > c1) & (F.col("doc_id") <= c2))
    inc2 = docs.filter(F.col("doc_id") > c2)
    idx = str(tmp_path / "mh-index")
    write_minhash_index(hist, idx)

    def pairs_touching(corpus, members):
        got = minhash_lsh_pairs(corpus, verify_jaccard=0.5)
        return {
            (r.id_a, r.id_b, round(r.est_jaccard, 9))
            for r in got.collect()
            if r.id_a in members or r.id_b in members
        }

    m1 = {r.doc_id for r in inc1.select("doc_id").collect()}
    want1 = pairs_touching(docs.filter(F.col("doc_id") <= c2), m1)
    got1 = {
        (r.id_a, r.id_b, round(r.est_jaccard, 9))
        for r in incremental_minhash_pairs(inc1, idx).collect()
    }
    assert got1 == want1 and want1  # non-vacuous: the corpus has near-dups

    append_minhash_index(inc1, idx)
    m2 = {r.doc_id for r in inc2.select("doc_id").collect()}
    want2 = pairs_touching(docs, m2)
    got2 = {
        (r.id_a, r.id_b, round(r.est_jaccard, 9))
        for r in incremental_minhash_pairs(inc2, idx).collect()
    }
    assert got2 == want2

    import pytest

    with pytest.raises(ValueError, match="not a minhash"):
        incremental_minhash_pairs(inc1, str(tmp_path))


def test_minhash_index_crash_leaves_orphan_segment_invisible(spark, tmp_path):
    """Segment-commit atomicity: bucket/sig stores that never made it
    into the manifest (a crashed append) must not contribute pairs —
    the old in-place parquet append could publish bucket rows whose
    verify-side signatures were missing, silently dropping pairs."""
    import os

    from pyspark.sql import functions as F

    from factstore_spark.operators.dedup import (
        _minhash_banded_sig,
        _write_minhash_segment,
        incremental_minhash_pairs,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    inc = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "mh")
    write_minhash_index(hist, idx)
    before = {
        (r.id_a, r.id_b) for r in incremental_minhash_pairs(inc, idx).collect()
    }
    # simulate the crash: a fully-written segment that never reached
    # the manifest (write_minhash_segment without the manifest swap)
    sig, banded = _minhash_banded_sig(inc, "doc_id", "text", 3, 64, 16, 42)
    orphan = _write_minhash_segment(sig, banded, idx)
    assert os.path.isdir(os.path.join(idx, orphan))
    after = {
        (r.id_a, r.id_b) for r in incremental_minhash_pairs(inc, idx).collect()
    }
    assert after == before and before  # orphan invisible, pairs unchanged


def test_compact_minhash_index_one_segment_same_pairs(spark, tmp_path):
    """Compaction folds all committed segments into one and reclaims
    orphans past the grace window — incremental pairs are identical
    before and after (same rows, one scan root)."""
    import json
    import os

    from pyspark.sql import functions as F

    from factstore_spark.operators.dedup import (
        _minhash_banded_sig,
        _write_minhash_segment,
        append_minhash_index,
        compact_minhash_index,
        incremental_minhash_pairs,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    hist = docs.filter(F.col("doc_id") % 3 == 0)
    inc1 = docs.filter(F.col("doc_id") % 3 == 1)
    inc2 = docs.filter(F.col("doc_id") % 3 == 2)
    idx = str(tmp_path / "mh")
    write_minhash_index(hist, idx)
    append_minhash_index(inc1, idx)
    # an orphaned (crashed) segment to reclaim
    sig, banded = _minhash_banded_sig(inc2, "doc_id", "text", 3, 64, 16, 42)
    orphan = _write_minhash_segment(sig, banded, idx)

    before = {
        (r.id_a, r.id_b) for r in incremental_minhash_pairs(inc2, idx).collect()
    }
    out = compact_minhash_index(spark, idx, retain_seconds=0.0)
    m = json.load(open(os.path.join(idx, "manifest.json")))
    assert len(m["segments"]) == 1 and m["segments"] == out["segments"]
    assert orphan in out["removed"]
    assert not os.path.isdir(os.path.join(idx, orphan))
    after = {
        (r.id_a, r.id_b) for r in incremental_minhash_pairs(inc2, idx).collect()
    }
    assert after == before and before


def test_compact_minhash_index_mutated_reingest_raises(spark, tmp_path):
    """first-per-_id collapse is only safe for IDENTICAL re-appends
    (crash replay). An appender that re-ingests an _id with CHANGED
    text leaves bucket rows whose verify-side signature mismatches —
    compaction must fail loudly instead of keeping an arbitrary sig."""
    import pytest as _pytest
    from pyspark.sql import functions as F

    from factstore_spark.operators.dedup import (
        append_minhash_index,
        compact_minhash_index,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    idx = str(tmp_path / "mh")
    write_minhash_index(docs, idx)
    mutated = docs.withColumn("text", F.concat(F.col("text"), F.lit(" MUTATED tail")))
    append_minhash_index(mutated, idx)
    with _pytest.raises(ValueError, match="conflicting signatures"):
        compact_minhash_index(spark, idx, retain_seconds=0.0)


def test_compact_minhash_index_crash_replay_still_collapses(spark, tmp_path):
    """Identical re-appends (the crash-replay case the collapse exists
    for) still compact fine under the new conflict assertion."""
    import json
    import os

    from factstore_spark.operators.dedup import (
        append_minhash_index,
        compact_minhash_index,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(40)
    idx = str(tmp_path / "mh")
    write_minhash_index(docs, idx)
    append_minhash_index(docs, idx)  # byte-identical replay
    out = compact_minhash_index(spark, idx, retain_seconds=0.0)
    m = json.load(open(os.path.join(idx, "manifest.json")))
    assert len(m["segments"]) == 1 and m["segments"] == out["segments"]


def test_editdist_verified_pairs_exact_distances(spark):
    # block = first 8 chars of lower(text); docs 0-2 share a block,
    # doc 3 diverges in the prefix, doc 4 is a different block entirely.
    rows = [
        (0, "Prefix: the quick brown fox"),
        (1, "Prefix: the quick brown cat"),      # dist 3 to doc 0
        (2, "Prefix: the quick brown foxes"),    # dist 2 to doc 0
        (3, "Other prefix entirely, far away"),
        (4, "prefix: but lowercased start"),     # lower() folds into the block
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r.id_a, r.id_b): r.dist
        for r in D.editdist_verified_pairs(
            df, block_prefix=8, verify_prefix=200, max_dist=10, max_block=10
        ).collect()
    }
    import itertools

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    blocked = {i: t[:8].lower() for i, t in rows}
    want = {}
    for (i, ta), (j, tb) in itertools.combinations(rows, 2):
        if blocked[i] == blocked[j]:
            d = lev(ta[:200], tb[:200])
            if d <= 10:
                want[(i, j)] = d
    assert out == want and (0, 1) in out and out[(0, 2)] == 2
    # doc 4's lowercased prefix joins the block: verify is on RAW text
    assert (0, 4) in out or lev(rows[0][1], rows[4][1]) > 10


def test_editdist_pairs_block_cap_and_threshold(spark):
    # 12 docs share one block -> over max_block=10, dropped entirely
    rows = [(i, f"same same same doc {i}") for i in range(12)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert (
        D.editdist_verified_pairs(df, block_prefix=9, max_block=10).count() == 0
    )
    # under the cap the pairs return; distances above max_dist drop
    df2 = spark.createDataFrame(rows[:5], "doc_id long, text string")
    out = D.editdist_verified_pairs(
        df2, block_prefix=9, verify_prefix=200, max_dist=0, max_block=10
    )
    assert out.count() == 0  # all pairs differ by the doc number
    out2 = D.editdist_verified_pairs(
        df2, block_prefix=9, verify_prefix=200, max_dist=2, max_block=10
    )
    assert out2.count() == 10  # C(5,2): single-char (or 2-digit) edits


def test_start_dedup_stream_matches_batch_pairs(spark, tmp_path):
    """Streaming near-dup detection against the growing archive index
    (start_dedup_stream): micro-batches of documents are deduped
    against history + themselves, pairs land in the pairs dir, and
    each batch's signatures join the index for LATER batches — the
    union of streamed pairs must equal the one-shot LSH over the whole
    corpus restricted to pairs touching the streamed docs."""
    import os

    from pyspark.sql import functions as F

    from factstore_spark.operators.dedup import (
        minhash_lsh_pairs,
        start_dedup_stream,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    ids = sorted(r.doc_id for r in docs.select("doc_id").collect())
    c1 = ids[len(ids) // 2]
    hist = docs.filter(F.col("doc_id") <= c1)
    inc = docs.filter(F.col("doc_id") > c1)
    idx = str(tmp_path / "mh-index")
    write_minhash_index(hist, idx)

    # two files -> maxFilesPerTrigger=1 gives two micro-batches, so the
    # second batch must see the first's docs as archive
    src = str(tmp_path / "src")
    inc.filter(F.col("doc_id") % 2 == 0).coalesce(1).write.mode(
        "append").parquet(src)
    inc.filter(F.col("doc_id") % 2 == 1).coalesce(1).write.mode(
        "append").parquet(src)
    stream = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    pairs_dir = str(tmp_path / "pairs")
    q = start_dedup_stream(
        stream, idx, pairs_dir,
        str(tmp_path / "chk"), available_now=True,
    )
    q.awaitTermination(180)

    got = {
        (r.id_a, r.id_b, round(r.est_jaccard, 9))
        for r in spark.read.parquet(pairs_dir).collect()
    }
    members = {r.doc_id for r in inc.select("doc_id").collect()}
    want = {
        (r.id_a, r.id_b, round(r.est_jaccard, 9))
        for r in minhash_lsh_pairs(docs, verify_jaccard=0.5).collect()
        if r.id_a in members or r.id_b in members
    }
    assert got == want and want  # non-vacuous: corpus has near-dups
    # the index grew: initial segment + one per micro-batch
    import json
    m = json.load(open(os.path.join(idx, "manifest.json")))
    assert len(m["segments"]) == 3


def test_redelivered_segment_is_harmless_and_compacted_away(spark, tmp_path):
    """A streaming crash replay appends the SAME increment twice: the
    duplicate bucket/signature rows must not change the pair set (the
    candidate join is distinct, verify takes first-per-id), and
    compaction collapses them so the index doesn't grow with replays."""
    from pyspark.sql import functions as F

    from factstore_spark.operators.dedup import (
        append_minhash_index,
        compact_minhash_index,
        incremental_minhash_pairs,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    inc = docs.filter(F.col("doc_id") % 2 == 1)
    probe = docs.filter(F.col("doc_id") % 10 == 4)  # even slice, re-probed
    idx = str(tmp_path / "mh")
    write_minhash_index(hist, idx)
    append_minhash_index(inc, idx)
    before = {
        (r.id_a, r.id_b) for r in incremental_minhash_pairs(probe, idx).collect()
    }
    append_minhash_index(inc, idx)  # the replayed duplicate
    dup = {
        (r.id_a, r.id_b) for r in incremental_minhash_pairs(probe, idx).collect()
    }
    assert dup == before and before
    out = compact_minhash_index(spark, idx, retain_seconds=0.0)
    assert out["compacted_into"] is not None
    after = {
        (r.id_a, r.id_b) for r in incremental_minhash_pairs(probe, idx).collect()
    }
    assert after == before
    # collapsed: one signature row per doc, no duplicated bucket rows
    import json
    import os
    m = json.load(open(os.path.join(idx, "manifest.json")))
    seg = m["segments"][0]
    sigs = spark.read.parquet(os.path.join(idx, seg, "sigs"))
    assert sigs.count() == sigs.select("_id").distinct().count()


def test_append_minhash_index_concurrent_swap_raises(spark, tmp_path):
    """An append whose base version was superseded between its read and
    its swap must raise ConcurrentIndexSwapError (single-winner CAS),
    never last-win overwrite the other writer's manifest."""
    import pytest as _pytest

    from factstore_spark.operators.dedup import (
        ConcurrentIndexSwapError,
        _cas_swap_minhash_manifest,
        _read_minhash_manifest_versioned,
        append_minhash_index,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet").limit(30)
    idx = str(tmp_path / "mh")
    write_minhash_index(docs, idx)
    m, base = _read_minhash_manifest_versioned(idx)
    # simulate the racing writer landing first: claim base+1 out from
    # under the append below
    _cas_swap_minhash_manifest(idx, dict(m, segments=m["segments"]), base)
    import factstore_spark.operators.dedup as D

    real = D._read_minhash_manifest_versioned

    def stale_read(index_dir):
        mm, _v = real(index_dir)
        return mm, base  # stale base: the other writer already took base+1

    D._read_minhash_manifest_versioned, orig = stale_read, D._read_minhash_manifest_versioned
    try:
        with _pytest.raises(ConcurrentIndexSwapError):
            append_minhash_index(docs, idx)
    finally:
        D._read_minhash_manifest_versioned = orig
    # the winning manifest is intact
    head, v = real(idx)
    assert v == base + 1 and head["segments"] == m["segments"]


def test_minhash_index_legacy_pointer_upgrades_to_cas(spark, tmp_path):
    """A pre-CAS index (manifest.json only, no _manifests log) reads as
    version 0 and the first append claims snap-1 while keeping the
    pointer cache in sync."""
    import json
    import os
    import shutil

    from factstore_spark.operators.dedup import (
        _read_minhash_manifest_versioned,
        append_minhash_index,
        incremental_minhash_pairs,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    hist = docs.filter(F.col("doc_id") % 2 == 0)
    inc = docs.filter(F.col("doc_id") % 2 == 1)
    idx = str(tmp_path / "mh")
    write_minhash_index(hist, idx)
    shutil.rmtree(os.path.join(idx, "_manifests"))  # back-date to legacy
    m, v = _read_minhash_manifest_versioned(idx)
    assert v == 0 and m["kind"] == "minhash"
    append_minhash_index(inc, idx)
    head, v2 = _read_minhash_manifest_versioned(idx)
    assert v2 == 1 and len(head["segments"]) == 2
    with open(os.path.join(idx, "manifest.json")) as fh:
        assert json.load(fh) == head
    assert incremental_minhash_pairs(inc, idx).count() >= 0


def test_dedup_stream_sink_report_per_batch_rows(spark):
    """The streaming-sink probe must process exactly three non-empty
    micro-batches (one per staged file), each committing one index
    segment, and the contract entry must come back all-green on the
    same run's invariants."""
    from factstore_spark.queries import (
        dedup_stream_sink,
        dedup_stream_sink_report,
    )

    rows = dedup_stream_sink_report(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 3
    assert all(r.input_rows > 0 and r.batch_ms > 0 for r in rows)
    assert all(r.n_segments_after == 4 for r in rows)
    c = dedup_stream_sink(spark, "/root/testdata/sf0.001").collect()[0]
    assert (c.n_only_stream, c.n_only_oneshot, c.match_bp) == (0, 0, 10000)
    assert c.n_batches == 3 and c.n_segments_after == 4
    assert c.n_archive_docs > 0 and c.n_stream_docs > 0


def test_maintain_minhash_index_one_call(spark, tmp_path):
    """describe -> compact-if-needed -> reap, one call: an index grown
    by several appends (plus an orphan from a crashed one) folds to a
    single segment with identical incremental pairs, and a healthy
    index is left untouched."""
    import os

    from factstore_spark.operators.dedup import (
        _minhash_banded_sig,
        _write_minhash_segment,
        append_minhash_index,
        describe_minhash_index,
        incremental_minhash_pairs,
        maintain_minhash_index,
        write_minhash_index,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    slices = [docs.filter(F.col("doc_id") % 4 == i) for i in range(4)]
    idx = str(tmp_path / "mh")
    write_minhash_index(slices[0], idx)
    for s in slices[1:3]:
        append_minhash_index(s, idx)
    # a crashed append: fully-written segment, never in the manifest
    sig, banded = _minhash_banded_sig(slices[3], "doc_id", "text", 3, 64, 16, 42)
    orphan = _write_minhash_segment(sig, banded, idx)

    d = describe_minhash_index(spark, idx)
    assert d["n_segments"] == 3 and d["n_orphan_segments"] == 1
    assert d["n_docs"] == slices[0].count() + slices[1].count() + slices[2].count()
    assert d["params"]["bands"] == 16

    before_pairs = {
        (r.id_a, r.id_b) for r in incremental_minhash_pairs(slices[3], idx).collect()
    }
    rep = maintain_minhash_index(spark, idx, max_segments=2, retain_seconds=0.0)
    assert rep["after"]["n_segments"] == 1
    assert rep["after"]["n_orphan_segments"] == 0
    assert orphan in rep["removed_orphans"]
    assert not os.path.isdir(os.path.join(idx, orphan))
    after_pairs = {
        (r.id_a, r.id_b) for r in incremental_minhash_pairs(slices[3], idx).collect()
    }
    assert after_pairs == before_pairs and before_pairs

    # healthy index: a second maintenance is a no-op describe
    rep2 = maintain_minhash_index(spark, idx, max_segments=2)
    assert rep2["compacted_into"] is None
    assert rep2["after"]["n_segments"] == 1

    # orphan with segments within bounds: the O(1) reap runs WITHOUT a
    # compaction rewrite (review r10: a full rewrite for one orphan is
    # pure waste, and an in-flight append's dir must never trigger one)
    sig2, banded2 = _minhash_banded_sig(slices[3], "doc_id", "text", 3, 64, 16, 42)
    orphan2 = _write_minhash_segment(sig2, banded2, idx)
    rep3 = maintain_minhash_index(spark, idx, max_segments=8, retain_seconds=0.0)
    assert rep3["compacted_into"] is None
    assert orphan2 in rep3["removed_orphans"]
    assert rep3["after"]["n_segments"] == 1
    assert rep3["after"]["n_orphan_segments"] == 0


def test_minhash_lsh_md5_mode_matches_default_semantics(corpus):
    """hash_fn='md5' (the oracle-replayable registry mode) changes only
    the hash family and band-key encoding — the planted exact/near dups
    must surface identically, and a bogus hash_fn must raise."""
    got = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in D.minhash_lsh_pairs(
            corpus, verify_jaccard=0.5, hash_fn="md5"
        ).collect()
    }
    assert got[(0, 1)] == 1.0
    assert (0, 2) in got and got[(0, 2)] >= 0.5
    assert (0, 3) not in got
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hash_fn"):
        D.minhash_lsh_pairs(corpus, hash_fn="sha1")


def test_simhash_md5_mode_matches_default_semantics(corpus):
    """md5 token hashing (60-bit, top bits constant-zero) preserves the
    SimHash contract: identical docs at distance 0, fingerprints
    confined to 60 bits, bogus hash_fn raises."""
    pairs = {
        (r.id_a, r.id_b): r.hamming
        for r in D.simhash_near_dup_pairs(
            corpus, max_hamming=16, hash_fn="md5"
        ).collect()
    }
    assert pairs[(0, 1)] == 0
    sims = [
        r.sim
        for r in corpus.select(
            D.simhash_col("text", hash_fn="md5").alias("sim")
        ).collect()
    ]
    assert all(0 <= s < (1 << 60) for s in sims)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="hash_fn"):
        D.simhash_col("text", hash_fn="sha1")
