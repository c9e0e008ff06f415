"""Round-5 operator invariants: Gopher rules, tf-df keywords, weighted
priority sampling, semantic dedup, and the events OHLC/sliding/zscore
query shapes — hand-computed expectations on tiny in-line data."""

import math

import pytest
from pyspark.sql import functions as F

from factstore_spark.operators import dedup as D
from factstore_spark.operators import text as T
from factstore_spark.operators.sampling import weighted_priority_sample


# ---------------------------------------------------------------------------
# Gopher rules
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def gopher_docs(spark):
    long_good = " ".join(
        ["the", "and", "that", "with"] * 3 + ["quality", "prose", "here"] * 4
    )  # 24 words, all alpha, 4+ stopword hits
    rows = [
        (0, long_good),
        (1, "too short to pass"),  # < 20 words
        (2, " ".join(["####"] * 25)),  # symbols, no alpha, no stopwords
        (3, "- bullet\n- bullet\n- bullet"),  # all lines bulleted + short
        (4, " ".join(["the", "of"] * 12)),  # 24 words, mean len < 3
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_gopher_rule_flags(gopher_docs):
    out = {r.doc_id: r for r in T.with_gopher_rules(gopher_docs).collect()}
    assert out[0].keep is True
    assert out[1].keep is False and out[1].r_word_count is False
    # doc2: word count ok (25) but symbols/alpha/stopwords all fail
    assert out[2].r_word_count is True
    assert out[2].r_symbol_ratio is False
    assert out[2].r_alpha_words is False
    assert out[2].r_stopwords is False
    # doc3: 3/3 lines bulleted > 0.9 cap
    assert out[3].r_bullet_lines is False
    # doc4: mean word length (24*2+... ) below 3
    assert out[4].r_mean_word_len is False and out[4].r_word_count is True


def test_gopher_rules_empty_text_is_rejected_not_crash(spark):
    df = spark.createDataFrame([(0, "")], "doc_id long, text string")
    row = T.with_gopher_rules(df).collect()[0]
    assert row.keep is False  # word-count rule rejects; no div-by-zero


# ---------------------------------------------------------------------------
# tf-df keywords
# ---------------------------------------------------------------------------


def test_tfdf_keywords_prefers_rare_terms(spark):
    rows = [
        (0, "common common rare0"),
        (1, "common rare1 rare1"),
        (2, "common rare2 zebra"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = T.tfdf_keywords(df, k=2)
    by_doc = {}
    for r in out.collect():
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc0: 'common' tf=2 df=3 -> score 2, 'rare0' tf=1 df=1 -> score 3
    d0 = {r.token: r for r in by_doc[0]}
    assert d0["rare0"].rank == 1 and d0["rare0"].score == pytest.approx(3.0)
    assert d0["common"].rank == 2 and d0["common"].score == pytest.approx(2.0)
    # doc1: 'rare1' tf=2 df=1 -> score 6 beats 'common' (score 1)
    d1 = {r.token: r for r in by_doc[1]}
    assert d1["rare1"].rank == 1 and d1["rare1"].score == pytest.approx(6.0)
    # every doc returns exactly k=2 rows (enough distinct tokens)
    assert all(len(v) == 2 for v in by_doc.values())


def test_tfdf_keywords_tie_breaks_by_token(spark):
    df = spark.createDataFrame([(0, "bb aa")], "doc_id long, text string")
    out = T.tfdf_keywords(df, k=2).collect()
    ranked = sorted(out, key=lambda r: r.rank)
    assert [r.token for r in ranked] == ["aa", "bb"]  # equal scores


# ---------------------------------------------------------------------------
# weighted priority sample
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_weight_biased(spark):
    # two strata: ids 0..199 weight 1, ids 200..399 weight 50 — the
    # heavy stratum must dominate the sample.
    rows = [(i, 1) for i in range(200)] + [(i, 50) for i in range(200, 400)]
    df = spark.createDataFrame(rows, "id long, w long")
    s1 = weighted_priority_sample(df, "w", 40, "id")
    picked1 = sorted(r.id for r in s1.collect())
    picked2 = sorted(
        r.id for r in weighted_priority_sample(df, "w", 40, "id").collect()
    )
    assert picked1 == picked2  # same sample every run
    heavy = sum(1 for i in picked1 if i >= 200)
    assert heavy >= 30  # E[heavy] ≈ 40 * 50/51 under weighting
    assert len(picked1) == 40


def test_weighted_sample_priority_formula(spark):
    import hashlib

    df = spark.createDataFrame([(7, 3)], "id long, w long")
    row = weighted_priority_sample(df, "w", 1, "id").collect()[0]
    u = int(hashlib.md5(b"wsample7").hexdigest()[:15], 16)
    assert row.priority == pytest.approx(float(u) / 3.0, rel=0, abs=0)


# ---------------------------------------------------------------------------
# semantic dedup
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def emb_df(spark):
    # cluster 0: two near-identical vectors + one orthogonal;
    # cluster 1: a vector nearly identical to id 0 — but cross-cluster,
    # so it must NOT pair (the SemDeDup blocking contract).
    rows = [
        (0, [1.0, 0.0, 0.0], 0),
        (1, [0.999, 0.01, 0.0], 0),
        (2, [0.0, 1.0, 0.0], 0),
        (3, [1.0, 0.001, 0.0], 1),
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_semantic_dedup_pairs_within_cluster_only(emb_df):
    pairs = D.semantic_dedup_pairs(emb_df, tau_num=95, tau_den=100).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(0, 1)]


def test_semantic_dedup_keeps_lowest_id(emb_df):
    out = {r.id: r for r in D.semantic_dedup(emb_df, tau_num=95, tau_den=100).collect()}
    assert out[0].is_dup is False
    assert out[1].is_dup is True and out[1].dup_of == 0
    assert out[2].is_dup is False
    assert out[3].is_dup is False  # near-dup of 0 but in another cluster


def test_semantic_dedup_threshold_matches_float_cosine(spark):
    # decision boundary sanity: quantized-integer decision agrees with
    # float cosine away from the quantization noise floor.
    import random

    rng = random.Random(5)
    rows = []
    for i in range(30):
        base = [rng.uniform(-1, 1) for _ in range(8)]
        rows.append((2 * i, base, 0))
        noisy = [x + rng.uniform(-0.01, 0.01) for x in base]
        rows.append((2 * i + 1, noisy, 0))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    got = {
        (p.id_a, p.id_b)
        for p in D.semantic_dedup_pairs(df, tau_num=90, tau_den=100).collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        return dot / math.sqrt(sum(x * x for x in a) * sum(x * x for x in b))

    expect = set()
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            c = cos(rows[i][1], rows[j][1])
            if abs(c - 0.9) > 0.005:  # outside the quantization band
                if c >= 0.9:
                    expect.add((rows[i][0], rows[j][0]))
    assert expect <= got  # every clear near-dup found
    for (a, b) in got - expect:
        # anything extra must sit inside the boundary band
        ra = next(r for r in rows if r[0] == a)[1]
        rb = next(r for r in rows if r[0] == b)[1]
        assert abs(cos(ra, rb) - 0.9) <= 0.005


# ---------------------------------------------------------------------------
# events query shapes (registry entries on crafted frames)
# ---------------------------------------------------------------------------


def test_ohlc_bars_open_close_order(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # one user, one minute: values 5.0 -> 1.0 -> 9.0 (open 500, close 900)
    ts = [1_700_000_000_000_000 + i * 1_000_000 for i in range(3)]
    tbl = pa.table(
        {
            "event_id": pa.array([1, 2, 3], pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([42, 42, 42], pa.int64()),
            "event_type": pa.array(["a"] * 3),
            "value": pa.array([5.0, 1.0, 9.0], pa.float64()),
            "props": pa.array(["{}"] * 3),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    from factstore_spark.queries import events_ohlc_bars

    bars = events_ohlc_bars(spark, str(tmp_path)).collect()
    assert len(bars) == 1
    b = bars[0]
    assert (b.open_cents, b.high_cents, b.low_cents, b.close_cents) == (
        500, 900, 100, 900,
    )
    assert b.n_trades == 3 and b.volume_cents == 1500


def test_user_zscore_flags_planted_outlier(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    n = 40
    values = [10.0] * (n - 1) + [500.0]  # one wild outlier
    ts = [1_700_000_000_000_000 + i * 1_000_000 for i in range(n)]
    tbl = pa.table(
        {
            "event_id": pa.array(list(range(n)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["a"] * n),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    from factstore_spark.queries import events_user_zscore

    rows = events_user_zscore(spark, str(tmp_path)).collect()
    assert [r.event_id for r in rows] == [n - 1]
    assert rows[0].user_n == n


def test_weighted_sample_excludes_nonpositive_weights(spark):
    rows = [(0, 0), (1, -5), (2, 10), (3, 1)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = sorted(r.id for r in weighted_priority_sample(df, "w", 10, "id").collect())
    assert got == [2, 3]  # w<=0 rows never sampled, job never fails


def test_semantic_dedup_survives_large_magnitude_vectors(spark):
    # components at the docstring's old "safe" bound used to overflow
    # int64 in the cross-multiplied threshold test (ANSI crash)
    rows = [
        (0, [2.9] * 64, 0),
        (1, [2.9] * 64, 0),
        (2, [-2.9] * 64, 0),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = D.semantic_dedup_pairs(df, tau_num=95, tau_den=100).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(0, 1)}  # antipode excluded


def test_user_zscore_survives_large_cent_values(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    # values ~1e7 dollars -> 1e9 cents; cents^2 = 1e18, three of them
    # overflow an int64 sum — the aggregate must run in decimal
    n = 12
    values = [1.0e7] * (n - 1) + [9.0e7]
    ts = [1_700_000_000_000_000 + i * 1_000_000 for i in range(n)]
    tbl = pa.table(
        {
            "event_id": pa.array(list(range(n)), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([3] * n, pa.int64()),
            "event_type": pa.array(["a"] * n),
            "value": pa.array(values, pa.float64()),
            "props": pa.array(["{}"] * n),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    from factstore_spark.queries import events_user_zscore

    rows = events_user_zscore(spark, str(tmp_path)).collect()
    assert [r.event_id for r in rows] == [n - 1]


def test_semantic_dedup_zero_vector_never_pairs(spark):
    """A zero-quantized vector has sq=0; without the sq>0 guards the
    threshold test degenerates to 0>=0 and the zero vector would pair
    with (and absorb) its ENTIRE cluster."""
    rows = [
        (0, [0.0001] * 8, 0),  # quantizes to all zeros at scale=1000? no — 0.1; use tiny
        (1, [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0),
        (2, [0.9, 0.1, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0], 0),
    ]
    rows[0] = (0, [0.0] * 8, 0)
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")
    pairs = D.semantic_dedup_pairs(df, tau_num=80, tau_den=100).collect()
    assert {(p.id_a, p.id_b) for p in pairs} == {(1, 2)}
    out = {r.id: r for r in D.semantic_dedup(df, tau_num=80, tau_den=100).collect()}
    assert out[1].is_dup is False and out[2].dup_of == 1
    assert out[0].is_dup is False  # the zero vector neither dups nor absorbs


def test_dup_clusters_distributed_path_string_ids(spark):
    """The distributed propagation must converge correctly for STRING
    ids (the old sum(label) detector NULLed/raised on them)."""
    # chain a-b-c-d plus isolated pair x-y; force the distributed path
    pairs = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("d", "c"), ("y", "x")],
        "id_a string, id_b string",
    )
    out = {
        r.doc_id: r.cluster_id
        for r in D.dup_clusters(pairs, driver_threshold=0).collect()
    }
    assert out == {"a": "a", "b": "a", "c": "a", "d": "a", "x": "x", "y": "x"}


def test_banding_parameter_validation(spark):
    import pytest as _pytest

    df = spark.createDataFrame([(0, "a b c"), (1, "a b c")], "doc_id long, text string")
    with _pytest.raises(ValueError, match="multiple of"):
        D.minhash_lsh_pairs(df, num_hashes=16, bands=32)
    with _pytest.raises(ValueError, match="max_hamming"):
        D.simhash_near_dup_pairs(df, max_hamming=64)
    # max_hamming >= chunks auto-raises the chunk count (recall kept,
    # no silent pigeonhole hole); identical docs must still be found
    got = {
        (r.id_a, r.id_b)
        for r in D.simhash_near_dup_pairs(df, max_hamming=7, chunks=4).collect()
    }
    assert (0, 1) in got


def test_redact_pii_counts_reconcile_with_masks(spark):
    """Counts are taken on the progressively-redacted text, so a span
    an earlier pattern consumed is not reported as a phantom hit."""
    from factstore_spark.operators.text import redact_pii

    df = spark.createDataFrame(
        [(0, "write 555-123-4567@mail.example.com today")],
        "doc_id long, text string",
    )
    r = redact_pii(df).collect()[0]
    assert r.n_emails == 1
    assert r.n_phones == 0  # consumed by the email mask — no phantom count
    assert "[EMAIL]" in r.redacted_text and "[PHONE]" not in r.redacted_text


def test_semantic_dedup_oversized_cluster_guard(spark):
    """max_cluster_size enforces the operator's own candidate-volume
    contract. A 300-member all-identical-vector mega-cluster (the case
    no similarity split can separate) must be hash-sharded: candidate
    volume drops from C(300,2) to ~n_shards * C(n/n_shards, 2), and
    every emitted pair is still a true near-dup. Compliant clusters
    return EXACTLY the unguarded result."""
    import random

    rnd = random.Random(11)
    rows = []
    # mega-cluster 0: 300 identical vectors
    for i in range(300):
        rows.append((i, [1.0, 0.0, 0.0, 0.0], 0))
    # compliant cluster 1: near-dup pair + an orthogonal member
    rows += [
        (1000, [0.0, 1.0, 0.0, 0.0], 1),
        (1001, [0.0, 0.999, 0.01, 0.0], 1),
        (1002, [0.0, 0.0, 0.0, 1.0], 1),
    ]
    # compliant cluster 2: random spread, no dups expected at tau=.95
    for i in range(20):
        v = [rnd.uniform(-1, 1) for _ in range(4)]
        rows.append((2000 + i, v, 2))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")

    unguarded = D.semantic_dedup_pairs(df, tau_num=95, tau_den=100)
    guarded = D.semantic_dedup_pairs(df, tau_num=95, tau_den=100, max_cluster_size=50)
    un = {(p.id_a, p.id_b) for p in unguarded.collect()}
    gu = {(p.id_a, p.id_b) for p in guarded.collect()}

    # sharding only ever removes pairs, never invents them
    assert gu <= un
    # compliant clusters: bit-identical pair sets
    assert {p for p in gu if p[0] >= 1000} == {p for p in un if p[0] >= 1000}
    assert (1000, 1001) in gu
    # mega-cluster: full C(300,2)=44850 without the guard; with cap 50
    # -> 6 shards, expected ~6 * C(50,2) = 7350. Assert well below the
    # quadratic and nonzero (within-shard dups still found).
    mega_un = {p for p in un if p[1] < 1000}
    mega_gu = {p for p in gu if p[1] < 1000}
    assert len(mega_un) == 44850
    assert 0 < len(mega_gu) < len(mega_un) // 3
    # the keep/drop decision still marks almost every mega member a dup
    decided = D.semantic_dedup(df, tau_num=95, tau_den=100, max_cluster_size=50)
    mega_kept = decided.filter((F.col("cluster") == 0) & (~F.col("is_dup"))).count()
    assert mega_kept <= 6  # one representative per shard at most


def test_semantic_dedup_guard_string_clusters_no_key_collision(spark):
    """String cluster ids containing '#' must not alias a sharded key:
    a compliant cluster literally named 'a#0#0' and an oversized
    cluster 'a' (whose shards emit ...#sub#shard composites) stay in
    disjoint join namespaces ('p:' vs 's:'). Cross-cluster pairs must
    never appear."""
    rows = []
    for i in range(80):  # oversized cluster "a", identical vectors
        rows.append((i, [1.0, 0.0], "a"))
    # compliant cluster whose NAME matches a possible composite key
    rows += [(500, [1.0, 0.0], "a#0#0"), (501, [0.999, 0.01], "a#0#0")]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    pairs = D.semantic_dedup_pairs(
        df, tau_num=95, tau_den=100, max_cluster_size=20
    ).collect()
    for p in pairs:
        same_side = (p.id_a < 500) == (p.id_b < 500)
        assert same_side, f"cross-cluster pair {p.id_a},{p.id_b}"
    # the compliant pair is intact
    assert {(p.id_a, p.id_b) for p in pairs if p.id_a >= 500} == {(500, 501)}


def test_user_mad_outliers_hand_computed(spark, tmp_path):
    """Planted per-user shapes: a wild outlier among stable values
    (flagged), a constant-valued user (MAD 0 — nothing deviates, nothing
    flagged), a single-event user (its own median, 0 outliers), and the
    robustness contract itself: the SAME outlier that hides from a
    z-score-style stddev cannot hide from the MAD rule."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from factstore_spark.queries import events_user_mad_outliers

    rows = []
    # user 1: values 10.0 x9 + one 500.0 -> med 1000c, ad 49000c, MAD 0
    rows += [(1, float(10 if i < 9 else 500)) for i in range(10)]
    # user 2: constant 7.0 x5 -> MAD 0, ad 0 everywhere, no outliers
    rows += [(2, 7.0)] * 5
    # user 3: single event
    rows += [(3, 42.5)]
    # user 4: spread 1..7 (odd n): med 4.0; ads (cents) sorted are
    # 0,100,100,200,200,300,300 -> MAD = 200c (the 4th of 7)
    rows += [(4, float(v)) for v in range(1, 8)]
    ts = [1_700_000_000_000_000 + i * 1_000_000 for i in range(len(rows))]
    tbl = pa.table(
        {
            "event_id": pa.array(list(range(len(rows))), pa.int64()),
            "ts": pa.array(ts, pa.timestamp("us")),
            "user_id": pa.array([u for u, _ in rows], pa.int64()),
            "event_type": pa.array(["a"] * len(rows)),
            "value": pa.array([v for _, v in rows], pa.float64()),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(tbl, str(tmp_path / "events.parquet"))
    got = {
        r.user_id: (r.n_events, r.median_cents, r.mad_cents, r.n_outliers)
        for r in events_user_mad_outliers(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (10, 1000, 0, 1),   # the 500.0 event: ad 49000 > 5*0
        2: (5, 700, 0, 0),
        3: (1, 4250, 0, 0),
        4: (7, 400, 200, 0),   # max ad 300 <= 5*200
    }
