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
