"""Distributed BPE training (operators/bpe.py): exact agreement with
the pure-Python reference learner, classic-corpus hand checks, and the
segmentation compression stats."""

from factstore_spark.operators.bpe import (
    END,
    bpe_segment_stats,
    learn_bpe,
    learn_bpe_reference,
)


def test_learn_bpe_matches_reference_on_classic_corpus(spark):
    """Sennrich's canonical example family: suffix merges ('est</w>')
    must form before stem merges when frequency says so, and the
    distributed learner must equal the reference EXACTLY — order,
    pairs, and counts."""
    texts = [
        "low low low low low lower lower newest newest newest "
        "newest newest newest widest widest widest",
    ]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    got = learn_bpe(docs, n_merges=10)
    want = learn_bpe_reference(texts, n_merges=10)
    assert got == want and len(got) == 10
    # the famous merges appear: 'es' then 'est' then 'est</w>'
    pairs = [(a, b) for a, b, _ in got]
    assert ("e", "s") in pairs
    assert ("es", "t") in pairs or ("es", "t</w>") in pairs


def test_learn_bpe_matches_reference_on_fuzzed_corpus(spark):
    """Random multi-doc corpus with ties and unicode: byte-for-byte
    agreement including the deterministic tie-breaks."""
    import random

    rnd = random.Random(42)
    vocab = ["aa", "ab", "abc", "the", "über", "x", "zzz", "caté"]
    texts = [
        " ".join(rnd.choice(vocab) for _ in range(rnd.randint(3, 40)))
        for _ in range(25)
    ]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    got = learn_bpe(docs, n_merges=15, min_pair_count=2)
    want = learn_bpe_reference(texts, n_merges=15, min_pair_count=2)
    assert got == want and got  # non-vacuous


def test_learn_bpe_early_stop_and_empty(spark):
    # all-distinct single chars: every pair is (c, </w>) with count 1
    docs = spark.createDataFrame(
        [(0, "a b c d")], "doc_id long, text string"
    )
    assert learn_bpe(docs, n_merges=5, min_pair_count=2) == []
    # and the same corpus with min_pair_count=1 merges something
    assert learn_bpe(docs, n_merges=2, min_pair_count=1) == \
        learn_bpe_reference(["a b c d"], n_merges=2, min_pair_count=1)
    empty = docs.filter("doc_id < 0")
    assert learn_bpe(empty, n_merges=3) == []


def test_left_to_right_nonoverlapping_merge(spark):
    """'aaaa' under merge (a,a): left-to-right gives aa|aa, never the
    overlapping a|aa|a — in BOTH learners (the fold's last element
    becomes the merged symbol, so it cannot chain)."""
    texts = ["aaaa aaaa aaaa"]
    docs = spark.createDataFrame([(0, texts[0])], "doc_id long, text string")
    got = learn_bpe(docs, n_merges=3)
    want = learn_bpe_reference(texts, n_merges=3)
    assert got == want
    # pair COUNTING is overlapping (3 per 'aaaa', x3 words = 9); only
    # the merge APPLICATION is non-overlapping: round 2 sees aa|aa,
    # i.e. (aa,aa) and (aa,</w>) tied at 3 — '<' sorts before 'a', so
    # the deterministic tie-break merges (aa,</w>) first
    assert got[0] == ("a", "a", 9)
    assert got[1] == ("aa", END, 3)
    assert got[2] == ("aa", "aa" + END, 3)


def test_bpe_segment_stats_hand_computed(spark):
    """After learning on 'banana'-heavy text, per-doc BPE token counts
    match a hand segmentation; an unseen word falls back to chars."""
    texts = ["banana banana banana na na"]
    docs = spark.createDataFrame(
        [(0, texts[0]), (1, "xy")], "doc_id long, text string"
    )
    merges = learn_bpe(docs, n_merges=3, min_pair_count=2)
    assert merges == learn_bpe_reference(["banana banana banana na na", "xy"], 3)
    rows = {r.doc_id: r for r in bpe_segment_stats(docs, merges).collect()}
    # reference segmentation in python
    def seg_len(w):
        sym = list(w) + [END]
        for left, right, _ in merges:
            acc = []
            for x in sym:
                if acc and acc[-1] == left and x == right:
                    acc[-1] = left + right
                else:
                    acc.append(x)
            sym = acc
        return len(sym)

    assert rows[0].n_words == 5
    assert rows[0].n_bpe_tokens == 3 * seg_len("banana") + 2 * seg_len("na")
    assert rows[1].n_bpe_tokens == seg_len("xy")
    # compression: learned words segment shorter than raw chars+marker
    assert rows[0].n_bpe_tokens < rows[0].n_chars + rows[0].n_words


def test_bpe_segment_broadcasts_word_table(spark):
    """broadcast_words=True pins the small-vocab broadcast plan; the
    default leaves the strategy to Catalyst/AQE (billions of distinct
    words at open-web scale are NOT broadcastable)."""
    import io
    from contextlib import redirect_stdout

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    merges = [("e", "s", 10), ("t", "h", 8)]
    buf = io.StringIO()
    with redirect_stdout(buf):
        bpe_segment_stats(docs, merges, broadcast_words=True).explain("formatted")
    assert "BroadcastHashJoin" in buf.getvalue()
    # default: no forced hint anywhere in the plan (scale-safe)
    plan = bpe_segment_stats(docs, merges)
    rows = {r.doc_id: r.n_bpe_tokens for r in plan.limit(0).collect()}
    assert rows == {}  # analyzes and runs without the hint


def test_bpe_tokenize_sequences_and_consistency(spark):
    """bpe_tokenize returns the actual per-word token arrays in
    document order; flattened lengths agree with bpe_segment_stats,
    and joining the arrays back reconstructs each word exactly."""
    texts = ["banana banana na", "xy banana"]
    docs = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    merges = learn_bpe(docs, n_merges=3, min_pair_count=2)
    from factstore_spark.operators.bpe import bpe_tokenize

    rows = bpe_tokenize(docs, merges).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.word_pos] = (r.word, list(r.bpe_tokens))
    # word order round-trips
    for i, t in enumerate(texts):
        words = t.split()
        assert [by_doc[i][p][0] for p in sorted(by_doc[i])] == words
        for p, w in enumerate(words):
            toks = by_doc[i][p][1]
            assert "".join(toks) == w + END  # concatenation reconstructs
            assert toks[-1].endswith(END)
    # flattened token counts equal the stats form
    stats = {r.doc_id: r.n_bpe_tokens for r in bpe_segment_stats(docs, merges).collect()}
    for i in by_doc:
        assert stats[i] == sum(len(v[1]) for v in by_doc[i].values())
