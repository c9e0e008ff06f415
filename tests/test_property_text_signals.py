"""Property-based check: the JVM-expression text signals (repetition,
PII) must agree with straightforward pure-Python references on
arbitrary generated corpora. Examples are generated up front (seeded)
and evaluated in ONE DataFrame pass — same batching pattern as the tag
algebra property suite."""

import math
import random
import re
from collections import Counter

from factstore_spark.operators.text import PII_PATTERNS, redact_pii, with_repetition_signals

WORDS = ["the", "data", "row", "a", "of", "table", "x1", "zz"]
PII_SNIPPETS = [
    "u5@ex.com", "a.b-c@mail.example.org", "555-123-4567", "10.0.0.5",
    "192.168.300.1",  # still matches the naive quad pattern
    # near-misses that must NOT match:
    "1555-123-45678", "a@b", "@x.com", "1.2.3", "555-12-4567",
]


def _gen_text(rnd):
    toks = [rnd.choice(WORDS) for _ in range(rnd.randint(1, 30))]
    for _ in range(rnd.randint(0, 3)):
        toks.insert(rnd.randrange(len(toks) + 1), rnd.choice(PII_SNIPPETS))
    return " ".join(toks)


def _bp(num, den):
    return math.floor(10000.0 * num / den) if den else 0


def _ref_repetition(text):
    toks = re.split(r"\s+", text.lower())
    n = len(toks)
    top = Counter(toks).most_common(1)[0][1]
    bigrams = [" ".join(toks[i : i + 2]) for i in range(n - 1)]
    return (
        n,
        _bp(top, n),
        _bp(len(set(toks)), n),
        _bp(len(bigrams) - len(set(bigrams)), len(bigrams)),
    )


def _ref_pii(text):
    counts = []
    red = text
    for _, (pattern, mask) in PII_PATTERNS.items():
        counts.append(len(re.findall(pattern, text)))
        red = re.sub(pattern, mask.replace("\\", "\\\\"), red)
    return (*counts, red)


def test_text_signals_agree_with_python_reference(spark):
    rnd = random.Random(7)
    rows = [(i, _gen_text(rnd)) for i in range(250)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: r
        for r in redact_pii(with_repetition_signals(df)).collect()
    }
    for i, text in rows:
        r = got[i]
        assert (
            r.n_tokens, r.top_token_bp, r.distinct_ratio_bp, r.dup_bigram_bp
        ) == _ref_repetition(text), f"repetition mismatch on {text!r}"
        assert (
            r.n_emails, r.n_phones, r.n_ips, r.redacted_text
        ) == _ref_pii(text), f"pii mismatch on {text!r}"


def _ref_unigram_surprise(rows, max_vocab):
    """Pure-Python reference for operators/text.py:unigram_surprise."""
    train_toks, held = [], {}
    for doc_id, text in rows:
        toks = [t for t in re.split(r"\s+", text.lower()) if t]
        if doc_id % 2 == 0:
            train_toks.extend(toks)
        elif toks:
            held[doc_id] = toks
    cnt = Counter(train_toks)
    vocab = dict(
        sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:max_vocab]
    )
    n_total, v = sum(cnt.values()), len(vocab)
    out = {}
    for doc_id, toks in held.items():
        bits = 0
        for t in toks:
            q = (n_total + v) // (vocab.get(t, 0) + 1)
            bits += q.bit_length() - 1 if q >= 1 else 0
        out[doc_id] = (len(toks), bits, (10000 * bits) // len(toks))
    return out


def test_unigram_surprise_agrees_with_python_reference(spark):
    from pyspark.sql import functions as F

    from factstore_spark.operators.text import unigram_surprise

    rnd = random.Random(13)
    rows = [(i, _gen_text(rnd)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    for max_vocab in (50000, 5):  # uncapped AND a binding cap with ties
        got = {
            r.doc_id: (r.n_tokens, r.total_bits, r.surprise_bp)
            for r in unigram_surprise(
                df, F.col("doc_id") % 2 == 0, max_vocab=max_vocab
            ).collect()
        }
        assert got == _ref_unigram_surprise(rows, max_vocab), max_vocab
