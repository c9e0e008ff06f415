"""Distributed BPE (byte-pair-encoding) merge learning — tokenizer
TRAINING as a Spark job, the step build_vocab (frequency top-k) cannot
do. Classic Sennrich-style formulation: words are symbol sequences
(characters + an end-of-word marker), and each round merges the
globally most frequent adjacent symbol pair, left-to-right
non-overlapping.

Scale shape: the corpus is shuffled ONCE into a (word, count) frame —
every later round touches only the DISTINCT-WORDS table, which stays
distributed (billions of distinct words at 100 TB never visit the
driver). Per round: one map-side-combined pair-count aggregation whose
shuffle rows are capped by min(distinct pairs, words x avg_len), a
TakeOrdered(1) for the winning pair (a single row to the driver — the
only driver traffic per round), and a map-only JVM fold that rewrites
each word's symbol array (no Python round trip in the loop). The words
frame is localCheckpointed each round: the fold otherwise nests one
higher-order expression PER ROUND into a single unanalyzable tree, and
the pinned frame is exactly what the next round's two consumers read
(rule #10's pin case).

Tie-breaks are fully deterministic (count desc, then (left, right)
asc), so the same corpus yields the same merge table on any cluster —
and equals the pure-Python reference implementation symbol-for-symbol
(tested; the battery entry re-learns on a bounded sample in plain
Python and requires an exact match).

Reference parity note: the reference engine has no tokenizer-training
operator; this module belongs to the LLM-pipeline surplus family
(SURVEY.md §6 text-analysis group).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import release_local_checkpoint
from .text import tokens_col

END = "</w>"


def word_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, n) over the corpus — the single corpus-wide shuffle of
    BPE training (map-side combined)."""
    return (
        docs.select(F.explode(tokens_col(text_col)).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _symbolize(word: Column) -> Column:
    """word -> [c1, c2, ..., ck, '</w>'] (the marker keeps suffix
    merges distinct from mid-word merges, per the classic algorithm)."""
    return F.concat(F.split(word, ""), F.array(F.lit(END)))


def _sql_str(s: str) -> str:
    """Escape an arbitrary corpus token as a Spark SQL string literal
    (the parser unescapes \\\\ and \\' — tokens can contain quotes and
    backslashes, so both must be escaped)."""
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_pair(sym: str, left: str, right: str) -> Column:
    """Left-to-right non-overlapping merge of the adjacent pair
    (left, right) -> left||right inside one symbol array, as a JVM
    fold: append each symbol, and when the accumulator's last element
    is `left` and the incoming one is `right`, replace the last element
    with the merged symbol instead. Left-to-right is exactly what the
    fold gives: once a merge lands, the new last element is the MERGED
    symbol, so it cannot chain into an overlapping second merge.

    Built as ONE parsed SQL expression: the Column-DSL fold cost >100
    py4j round trips PER MERGE ROUND — at ~5 ms a round trip on the
    bench hosts that was most of the loop's per-round driver cost
    (guide §7.3). Same expression, same results; ``sym`` is the NAME
    of the symbol-array column."""
    lit_l, lit_r, merged = _sql_str(left), _sql_str(right), _sql_str(left + right)
    return F.expr(
        f"aggregate(`{sym}`, CAST(array() AS array<string>), "
        "(acc, x) -> CASE WHEN size(acc) > 0 "
        f"AND element_at(acc, -1) = {lit_l} AND x = {lit_r} "
        f"THEN concat(slice(acc, 1, size(acc) - 1), array({merged})) "
        "ELSE concat(acc, array(x)) END)"
    )


def learn_bpe(
    docs: DataFrame,
    n_merges: int = 50,
    text_col: str = "text",
    min_pair_count: int = 2,
    checkpoint_every: int = 4,
) -> list[tuple[str, str, int]]:
    """Learn up to ``n_merges`` BPE merges; returns
    ``[(left, right, pair_count), ...]`` in merge order. Stops early
    when the best remaining pair drops below ``min_pair_count``
    (merging singletons memorizes the corpus).

    ``checkpoint_every``: the per-round merge fold nests one
    higher-order expression into the words frame's plan — checkpointing
    every round doubled the per-round job count for nothing (a 4-deep
    fold analyzes fine), so the pin lands every K rounds: the pair
    count between pins recomputes at most K cheap folds over the pinned
    base, and the argmax job is the only other per-round cost."""
    words = word_counts(docs, text_col).select(
        _symbolize(F.col("word")).alias("sym"), "n"
    )
    words = pinned = words.localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    since_pin = 0
    # Loop-invariant Columns built ONCE (round 15, guide §7.3): Column
    # objects are immutable unresolved expressions, so the adjacent-pair
    # explode and the argmax sort keys are reusable every round — the
    # old per-round zip_with lambda + struct construction alone was
    # >15 py4j round trips a round before any work ran.
    pair_col = F.expr(
        "explode(zip_with(slice(sym, 1, size(sym) - 1), "
        "slice(sym, 2, size(sym) - 1), "
        "(a, b) -> struct(a AS left, b AS right)))"
    ).alias("pair")
    order_cols = (
        F.col("cnt").desc(),
        F.col("pair.left").asc(),
        F.col("pair.right").asc(),
    )
    cnt_agg = F.sum("n").alias("cnt")
    try:
        for _ in range(n_merges):
            pairs = (
                words.select(pair_col, "n")
                .groupBy("pair")
                .agg(cnt_agg)
                .orderBy(*order_cols)
                .limit(1)
                .collect()
            )
            if not pairs or pairs[0].cnt < min_pair_count:
                break
            left, right = pairs[0].pair.left, pairs[0].pair.right
            merges.append((left, right, pairs[0].cnt))
            words = words.select(
                _merge_pair("sym", left, right).alias("sym"), "n"
            )
            since_pin += 1
            if since_pin >= checkpoint_every:
                nxt = words.localCheckpoint(eager=True)
                # df.unpersist() is a NO-OP for checkpoint blocks —
                # release the superseded pin's storage explicitly
                release_local_checkpoint(pinned)
                words = pinned = nxt
                since_pin = 0
    finally:
        release_local_checkpoint(pinned)
    return merges


def learn_bpe_reference(texts: list[str], n_merges: int = 50, min_pair_count: int = 2):
    """Pure-Python reference learner (same tokenization, symbolization,
    tie-breaks and left-to-right merge) — the oracle the distributed
    form is tested and battery-checked against, and a readable spec of
    the algorithm."""
    import re
    from collections import Counter

    # Java's \s is ASCII-only; Python's is unicode-aware — split on the
    # exact Java class so both learners share one token definition
    ws = re.compile(r"[ \t\n\x0b\f\r]+")
    wc = Counter()
    for t in texts:
        for w in ws.split(t.lower()):
            if w:
                wc[w] += 1
    words = {tuple(list(w) + [END]): n for w, n in wc.items()}
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for sym, n in words.items():
            for a, b in zip(sym[:-1], sym[1:]):
                pc[(a, b)] += n
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        (left, right), cnt = best
        if cnt < min_pair_count:
            break
        merges.append((left, right, cnt))
        out = {}
        for sym, n in words.items():
            acc = []
            for x in sym:
                if acc and acc[-1] == left and x == right:
                    acc[-1] = left + right
                else:
                    acc.append(x)
            out[tuple(acc)] = out.get(tuple(acc), 0) + n
        words = out
    return merges


def _bpe_word_udf(merges: list, out: str):
    """Arrow-batched per-word segmenter over the merge rules with a
    per-batch memo (corpora repeat words heavily); ``out`` picks the
    column shape — 'len' (long) or 'tokens' (array<string>)."""
    from pyspark.sql.functions import pandas_udf

    rules = [(left, right) for left, right, _ in merges]

    def seg(w: str, cache: dict) -> list:
        got = cache.get(w)
        if got is not None:
            return got
        sym = list(w) + [END]
        for left, right in rules:
            acc: list[str] = []
            for x in sym:
                if acc and acc[-1] == left and x == right:
                    acc[-1] = left + right
                else:
                    acc.append(x)
            sym = acc
        cache[w] = sym
        return sym

    if out == "len":

        @pandas_udf("long")
        def f(words: pd.Series) -> pd.Series:
            cache: dict = {}
            return words.map(lambda w: len(seg(w, cache)))

    else:

        @pandas_udf("array<string>")
        def f(words: pd.Series) -> pd.Series:
            cache: dict = {}
            return words.map(lambda w: seg(w, cache))

    return f


def bpe_tokenize(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_words: bool = False,
) -> DataFrame:
    """Apply a learned merge table and return the actual token
    sequences: one row per (id, word_pos, word) with its BPE token
    array — the consumable tokenizer output (join a vocab for ids, or
    flatten for sequence packing). Same scale shape as the stats form:
    segmentation runs ONCE per distinct word (Arrow UDF + per-batch
    memo), then a join maps arrays back onto the corpus; in-document
    word order is preserved by ``word_pos`` (posexplode).

    ``broadcast_words=True`` force-broadcasts the segmented word table
    — right for bounded vocabularies, WRONG at open-web scale where
    distinct words run to billions (driver OOM / the 8 GB broadcast
    cap). The default lets Catalyst/AQE pick: a small built side still
    becomes a runtime broadcast, a huge one stays a shuffle hash join
    on ``word``."""
    distinct_words = word_counts(docs, text_col).select(
        "word", _bpe_word_udf(merges, "tokens")(F.col("word")).alias("bpe_tokens")
    )
    if broadcast_words:
        distinct_words = F.broadcast(distinct_words)
    exploded = docs.select(
        F.col(id_col), F.posexplode(tokens_col(text_col)).alias("word_pos", "word")
    )
    return exploded.join(distinct_words, "word").select(
        id_col, "word_pos", "word", "bpe_tokens"
    )


def bpe_segment_stats(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_words: bool = False,
) -> DataFrame:
    """Apply a learned merge table and count BPE tokens per document —
    the compression measurement that tells you whether the tokenizer
    fits the corpus. Application runs over the DISTINCT words (an
    Arrow-batched pandas UDF applying all merges per word in one pass —
    N sequential JVM folds would cost N interpreted passes), then a
    join maps per-word BPE lengths back onto the corpus:
    (id, n_words, n_chars, n_bpe_tokens). ``broadcast_words`` as in
    :func:`bpe_tokenize` — opt-in only; distinct words at open-web
    scale are NOT broadcastable."""
    distinct_words = word_counts(docs, text_col).select(
        "word", _bpe_word_udf(merges, "len")(F.col("word")).alias("bpe_len")
    )
    if broadcast_words:
        distinct_words = F.broadcast(distinct_words)
    exploded = docs.select(
        F.col(id_col), F.explode(tokens_col(text_col)).alias("word")
    )
    return (
        exploded.join(distinct_words, "word")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
            F.sum("bpe_len").cast("long").alias("n_bpe_tokens"),
        )
    )
