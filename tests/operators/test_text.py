"""Text-analysis operator invariants (checked against hand-computed
values on tiny in-line corpora)."""

import pytest

from factstore_spark.operators import text as T


@pytest.fixture(scope="module")
def tiny(spark):
    rows = [
        (0, "the cat sat on the mat"),
        (1, "el gato de la casa y el perro"),
        (2, "xyzzy qwerty 12345 !!!"),
        (3, "word"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def collect_map(df, key="doc_id", val=None):
    return {r[key]: r[val] for r in df.collect()}


def test_token_counts(tiny):
    out = T.with_token_count(tiny)
    ws = collect_map(out, val="ws_tokens")
    assert ws == {0: 6, 1: 8, 2: 4, 3: 1}
    bpe = collect_map(out, val="bpe_tokens")
    # doc2: xyzzy, qwerty, 12345, '!!!'-> 3 single chars = 6
    assert bpe[2] == 6
    assert bpe[3] == 1


def test_quality_score_components(tiny):
    out = T.with_quality_score(tiny)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[0].n_tokens == 6
    assert rows[0].stopword_ratio == pytest.approx(2 / 6)  # 'the' twice
    assert rows[3].mean_word_len == pytest.approx(4.0)
    assert 0.0 <= rows[2].quality_score <= 1.0
    # Garbage doc scores below natural-language doc.
    assert rows[2].quality_score < rows[0].quality_score


def test_lang_id(tiny):
    langs = collect_map(T.with_lang_id(tiny), val="pred_lang")
    assert langs[0] == "en"
    assert langs[1] == "es"
    assert langs[2] == "und"  # no markers at all


def test_fingerprint_deterministic_and_case_insensitive(spark):
    df = spark.createDataFrame(
        [(0, "Hello World"), (1, "hello world"), (2, "hello worlds")],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.md5_fp, r.roll_fp) for r in T.with_fingerprint(df).collect()}
    assert out[0] == out[1]  # lower-cased before hashing
    assert out[0] != out[2]
    assert 0 <= out[0][1] < 1_000_000_007


def test_top_ngrams_doc_frequency_and_ties(spark):
    from factstore_spark.operators.text import top_ngrams

    docs = spark.createDataFrame(
        [
            (1, "a b c"),
            (2, "a b d"),
            (3, "a b"),   # "a b" in all three docs
            (4, "x"),     # shorter than n -> whole text as one gram
        ],
        "doc_id long, text string",
    )
    out = top_ngrams(docs, n=2, k=3).collect()
    assert (out[0].ngram, out[0].doc_freq, out[0].rank) == ("a b", 3, 1)
    # doc_freq counts DOCS (distinct per doc), not occurrences
    assert all(r.doc_freq <= 3 for r in out)
    # ties broken by ngram ascending
    freqs = [(r.doc_freq, r.ngram) for r in out]
    assert freqs == sorted(freqs, key=lambda t: (-t[0], t[1]))


def test_chunk_documents_boundaries(spark):
    """10 tokens, window 4, overlap 1 (step 3): starts 0,3,6 — a start
    of 9 would yield chunk [t9], fully CONTAINED in chunk 2 (t6..t9),
    so starts stop at n_tokens - overlap; every chunk contributes at
    least one new token."""
    import pytest
    from factstore_spark.operators.text import chunk_documents

    text = " ".join(f"t{i}" for i in range(10))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    rows = sorted(
        chunk_documents(df, chunk_tokens=4, overlap=1).collect(),
        key=lambda r: r.chunk_idx,
    )
    assert [(r.chunk_idx, r.start_token, r.n_chunk_tokens) for r in rows] == [
        (0, 0, 4), (1, 3, 4), (2, 6, 4)
    ]
    assert rows[0].chunk_text == "t0 t1 t2 t3"
    assert rows[1].chunk_text == "t3 t4 t5 t6"  # 1-token overlap
    assert rows[2].chunk_text == "t6 t7 t8 t9"  # reaches the end
    # no chunk is contained in its predecessor (each adds new tokens)
    spans = [(r.start_token, r.start_token + r.n_chunk_tokens) for r in rows]
    assert all(b[1] > a[1] for a, b in zip(spans, spans[1:]))

    # a doc shorter than one window yields exactly one chunk
    short = spark.createDataFrame([(2, "a b")], "doc_id long, text string")
    out = chunk_documents(short, chunk_tokens=4, overlap=1).collect()
    assert len(out) == 1 and out[0].n_chunk_tokens == 2

    with pytest.raises(ValueError):
        chunk_documents(df, chunk_tokens=4, overlap=4)


def test_chunk_documents_map_only(spark):
    """Chunking must stay a pure projection: no Exchange in the plan."""
    import io
    from contextlib import redirect_stdout
    from factstore_spark.operators.text import chunk_documents

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buf = io.StringIO()
    with redirect_stdout(buf):
        chunk_documents(docs).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_repetition_signals_hand_computed(spark):
    df = spark.createDataFrame(
        [(0, "a a a b"), (1, "x y z"), (2, "w")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in T.with_repetition_signals(df).collect()}
    # doc0: 4 tokens, top run 'a'x3 -> 7500bp; 2 distinct -> 5000bp;
    # bigrams [a a, a a, a b]: 1 of 3 duplicated -> 3333bp
    assert (rows[0].n_tokens, rows[0].top_token_bp) == (4, 7500)
    assert rows[0].distinct_ratio_bp == 5000
    assert rows[0].dup_bigram_bp == 3333
    # doc1: all distinct
    assert (rows[1].top_token_bp, rows[1].distinct_ratio_bp, rows[1].dup_bigram_bp) == (
        3333, 10000, 0
    )
    # doc2: single token -> no bigrams
    assert (rows[2].n_tokens, rows[2].top_token_bp, rows[2].dup_bigram_bp) == (1, 10000, 0)


def test_repetition_signals_map_only(spark):
    import io
    from contextlib import redirect_stdout

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    buf = io.StringIO()
    with redirect_stdout(buf):
        T.with_repetition_signals(docs).explain("formatted")
    assert "Exchange" not in buf.getvalue()


def test_redact_pii_counts_and_masks(spark):
    df = spark.createDataFrame(
        [
            (0, "write a.b@c.io or 555-123-4567 at 10.0.0.1"),
            (1, "no pii here at all"),
            (2, "two mails x@y.org z@w.net and ips 1.2.3.4 5.6.7.8"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in T.redact_pii(df).collect()}
    assert (rows[0].n_emails, rows[0].n_phones, rows[0].n_ips) == (1, 1, 1)
    assert rows[0].redacted_text == "write [EMAIL] or [PHONE] at [IP]"
    assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ips) == (0, 0, 0)
    assert rows[1].redacted_text == rows[1].text
    assert (rows[2].n_emails, rows[2].n_ips) == (2, 2)
    assert "[EMAIL]" in rows[2].redacted_text and "@" not in rows[2].redacted_text


def test_redact_pii_word_boundaries(spark):
    # digits glued to a candidate phone/ip must NOT match (\b guards)
    df = spark.createDataFrame(
        [(0, "serial 1555-123-45678 build 10.0.0.17x but 10.0.0.18, ok")],
        "doc_id long, text string",
    )
    r = T.redact_pii(df).collect()[0]
    # 1555-... has a digit before the 555 (no \b); 10.0.0.17x has a word
    # char after the last quad (no \b); 10.0.0.18 is comma-bounded.
    assert (r.n_phones, r.n_ips) == (0, 1)


def test_build_vocab_rank_deterministic_ids(spark):
    df = spark.createDataFrame(
        [(0, "b b b a a c"), (1, "a b d")], "doc_id long, text string"
    )
    vocab = {r.token: (r.token_id, r.freq) for r in T.build_vocab(df, max_size=3).collect()}
    # b:4, a:3, then c/d tie at 1 -> 'c' wins by token asc
    assert vocab == {"b": (0, 4), "a": (1, 3), "c": (2, 1)}


def test_map_to_vocab_counts_and_checksum(spark):
    df = spark.createDataFrame(
        [(0, "b b b a a c"), (1, "a b d")], "doc_id long, text string"
    )
    vocab = T.build_vocab(df, max_size=3)
    rows = {r.doc_id: r for r in T.map_to_vocab(df, vocab).collect()}
    # doc0: b(0)x3 a(1)x2 c(2)x1 -> checksum 0+0+0+1+1+2 = 4, no OOV
    assert (rows[0].n_tokens, rows[0].n_oov, rows[0].id_checksum) == (6, 0, 4)
    # doc1: a(1) b(0) d(OOV) -> checksum 1
    assert (rows[1].n_tokens, rows[1].n_oov, rows[1].id_checksum) == (3, 1, 1)


def test_map_to_vocab_broadcasts_vocab(spark):
    import io
    from contextlib import redirect_stdout

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    vocab = T.build_vocab(docs, max_size=20)
    buf = io.StringIO()
    with redirect_stdout(buf):
        T.map_to_vocab(docs, vocab).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_boilerplate_lines_flags_high_df_lines(spark):
    from factstore_spark.operators.text import boilerplate_lines

    footer = "copyright acme corp all rights reserved"
    rows = [(i, f"unique body {i}\n{footer}\n  \n") for i in range(8)]
    rows.append((100, "no footer here\njust content"))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in boilerplate_lines(docs, max_line_df=5).collect()}
    for i in range(8):
        # 2 non-empty lines; the footer (df=8 > 5) is removed
        assert (out[i].n_lines, out[i].n_kept, out[i].n_removed) == (2, 1, 1)
    assert (out[100].n_lines, out[100].n_removed) == (2, 0)


def test_token_bigrams_counts_and_ties(spark):
    from factstore_spark.operators.text import token_bigrams

    docs = spark.createDataFrame(
        [(1, "a b a b c"), (2, "a b x"), (3, "single")],
        "doc_id long, text string",
    )
    got = [(r.bigram, r.n) for r in token_bigrams(docs, k=3).collect()]
    # "a b": doc1 twice + doc2 once = 3; then ties at 1 break lexically
    assert got[0] == ("a b", 3)
    assert got[1:] == [("b a", 1), ("b c", 1)]


def test_unigram_surprise_hand_computed(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(0, "a a b"), (2, "a c"), (1, "a b z"), (3, "   ")],
        "doc_id long, text string",
    )
    train = F.col("doc_id") % 2 == 0
    out = {
        r.doc_id: (r.n_tokens, r.total_bits, r.surprise_bp)
        for r in T.unigram_surprise(docs, train).collect()
    }
    # train counts a:3 b:1 c:1 -> N=5 V=3, N+V=8
    # doc1: a q=8//4=2 (1 bit), b q=8//2=4 (2), z OOV q=8 (3) -> 6 bits
    assert out == {1: (3, 6, 20000)}
    # doc3 is whitespace-only: zero tokens, must NOT appear (no 0-div row)

    # max_vocab cap binds: top-1 vocab keeps only 'a'; V=1, N+V=6
    # doc1: a q=6//4=1 (0 bits), b OOV q=6 (2), z OOV q=6 (2) -> 4 bits
    capped = {
        r.doc_id: (r.n_tokens, r.total_bits, r.surprise_bp)
        for r in T.unigram_surprise(docs, train, max_vocab=1).collect()
    }
    assert capped == {1: (3, 4, 13333)}


def test_unigram_surprise_empty_train_slice(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame([(1, "x y")], "doc_id long, text string")
    out = T.unigram_surprise(docs, F.col("doc_id") % 2 == 0).collect()
    # N=0 V=0 -> q=0, bin(0)='0', bits=0: defined, not a NULL cascade
    assert [(r.n_tokens, r.total_bits, r.surprise_bp) for r in out] == [(2, 0, 0)]


def test_int_log2_exact_over_boundary_values(spark):
    from pyspark.sql import functions as F

    from factstore_spark.functions import int_log2

    vals = [0, 1, 2, 3, 4, 7, 8, 1023, 1024, 1025, (1 << 40) - 1, 1 << 40]
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r.x: r.b for r in df.select("x", int_log2("x").alias("b")).collect()}
    want = {v: (v.bit_length() - 1 if v >= 1 else 0) for v in vals}
    assert got == want
