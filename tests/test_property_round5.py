"""Property-based checks for the round-5 operators: Gopher rules,
tf-df keywords, and weighted priority sampling must agree with
straightforward pure-Python references on arbitrary generated corpora.
Examples are generated up front (seeded) and evaluated in ONE
DataFrame pass per property — the same batching pattern as the text
signal and tag algebra property suites."""

import hashlib
import random
import re
from collections import Counter

from factstore_spark.operators.sampling import weighted_priority_sample
from factstore_spark.operators.text import (
    GOPHER_STOPWORDS,
    tfdf_keywords,
    with_gopher_rules,
)

WORDS = [
    "the", "be", "to", "of", "and", "that", "have", "with",  # gopher stops
    "data", "row", "table", "x1", "zz", "####", "a...b", "...",
    "verylongwordthatpushesmeanlength", "-", "*",
]


def _gen_text(rnd):
    lines = []
    for _ in range(rnd.randint(1, 4)):
        toks = [rnd.choice(WORDS) for _ in range(rnd.randint(1, 40))]
        lines.append(" ".join(toks))
    return "\n".join(lines)


def _ref_gopher(text):
    toks = re.split(r"\s+", text.lower())
    n = len(toks)
    n_chars = len(text)
    mwl = (n_chars - (n - 1)) / n if n else 0.0
    n_sym = len(re.findall(r"#|\.\.\.", text))
    n_alpha = sum(1 for t in toks if re.search(r"[a-z]", t))
    n_stop = sum(1 for t in toks if t in GOPHER_STOPWORDS)
    lines = text.split("\n")
    nl = len(lines)
    n_bullet = sum(1 for l in lines if re.match(r"^\s*[-*•]", l))
    n_ell = sum(1 for l in lines if re.search(r"\.\.\.\s*$", l))
    return (
        20 <= n <= 100_000,
        3.0 <= mwl <= 10.0,
        (n_sym / n if n else 0.0) <= 0.1,
        (n_alpha / n if n else 0.0) >= 0.8,
        n_stop >= 2,
        (n_bullet / nl if nl else 0.0) <= 0.9,
        (n_ell / nl if nl else 0.0) <= 0.3,
    )


def test_gopher_rules_match_python_reference(spark):
    rnd = random.Random(71)
    rows = [(i, _gen_text(rnd)) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in with_gopher_rules(df).collect()}
    for i, text in rows:
        exp = _ref_gopher(text)
        g = got[i]
        flags = (
            g.r_word_count, g.r_mean_word_len, g.r_symbol_ratio,
            g.r_alpha_words, g.r_stopwords, g.r_bullet_lines,
            g.r_ellipsis_lines,
        )
        assert flags == exp, (i, text[:60], flags, exp)
        assert g.keep == all(exp)


def _ref_tfdf(rows, k):
    tf = Counter()
    docs_for_token = {}
    for doc_id, text in rows:
        toks = re.split(r"\s+", text.lower())
        for t in toks:
            tf[(doc_id, t)] += 1
            docs_for_token.setdefault(t, set()).add(doc_id)
    n_docs = len({d for d, _ in rows})
    out = {}
    per_doc = {}
    for (doc_id, t), c in tf.items():
        score = c * float(n_docs) / len(docs_for_token[t])
        per_doc.setdefault(doc_id, []).append((-score, t, c))
    for doc_id, entries in per_doc.items():
        entries.sort()
        out[doc_id] = [
            (t, c, len(docs_for_token[t]), -negscore, rank + 1)
            for rank, (negscore, t, c) in enumerate(entries[:k])
        ]
    return out


def test_tfdf_keywords_match_python_reference(spark):
    rnd = random.Random(72)
    rows = [(i, _gen_text(rnd)) for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for r in tfdf_keywords(df, k=3).collect():
        got.setdefault(r.doc_id, []).append((r.token, r.tf, r.df, r.score, r.rank))
    exp = _ref_tfdf(rows, 3)
    for doc_id in exp:
        got_sorted = sorted(got[doc_id], key=lambda x: x[4])
        assert got_sorted == exp[doc_id], (doc_id, got_sorted, exp[doc_id])


def _ref_weighted_sample(rows, k, salt="wsample"):
    pri = []
    for key, w in rows:
        u = int(hashlib.md5(f"{salt}{key}".encode()).hexdigest()[:15], 16)
        pri.append((float(u) / float(w), key))
    pri.sort()
    return [key for _, key in pri[:k]]


def test_weighted_sample_matches_python_reference(spark):
    rnd = random.Random(73)
    rows = [(i, rnd.randint(1, 10_000)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w long")
    got = sorted(r.id for r in weighted_priority_sample(df, "w", 60, "id").collect())
    exp = sorted(_ref_weighted_sample(rows, 60))
    assert got == exp


def test_weighted_sample_prefix_property(spark):
    """A k1-sample is a prefix of the k2-sample (k1 < k2) — priorities
    are per-row, so growing k only extends the selection."""
    rnd = random.Random(74)
    rows = [(i, rnd.randint(1, 100)) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, w long")
    small = {r.id for r in weighted_priority_sample(df, "w", 20, "id").collect()}
    large = {r.id for r in weighted_priority_sample(df, "w", 80, "id").collect()}
    # Exact sizes first: set() <= anything is vacuously true, so the
    # prefix property only bites over full-size samples.
    assert len(small) == 20 and len(large) == 80, (len(small), len(large))
    assert small <= large
