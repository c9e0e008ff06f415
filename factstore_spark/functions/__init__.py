"""Column-level function library — the engine's reusable scalar/array
expressions, importable independently of the operators that compose
them. Everything here returns a pyspark Column and stays JVM-side.

    from factstore_spark import functions as FF
    df.select(FF.token_count("text"), FF.money_cents("price"))
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from ..operators.dedup import (
    minhash_sig_from_hashes,
    shingle_hashes_col,
    shingles_col,
    simhash_col,
)
from ..operators.layout import zorder_value
from ..operators.sampling import split_bucket
from ..operators.similarity import cosine_batch, cosine_similarity, pq_encode_col
from ..operators.text import (
    TOKEN_REGEX,
    bpe_token_count_col,
    token_count_col,
    tokens_col,
)
from ..plans.predicates import (
    tag_query_predicate,
    tags_all_match,
    time_range_predicate,
)

__all__ = [
    "tokens_col",
    "token_count",
    "bpe_token_count",
    "shingles_col",
    "shingle_hashes_col",
    "minhash_sig_from_hashes",
    "simhash_col",
    "cosine_similarity",
    "cosine_batch",
    "pq_encode_col",
    "split_bucket",
    "zorder_value",
    "money_cents",
    "epoch_us",
    "int_log2",
    "tags_all_match",
    "tag_query_predicate",
    "time_range_predicate",
]


# Aliases of the text-operator definitions — ONE token definition
# shared by operators and facade (divergence here silently skews every
# token-count consumer).
token_count = token_count_col
bpe_token_count = bpe_token_count_col


def money_cents(col: Column | str) -> Column:
    """Cross-engine-deterministic integer cents: FLOOR(x*100) as BIGINT
    (see queries.py determinism rules)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.floor(c * F.lit(100)).cast("long")


def epoch_us(ts_col: Column | str) -> Column:
    """Timestamp -> epoch microseconds BIGINT."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.unix_micros(c)


def int_log2(col: Column | str) -> Column:
    """floor(log2(x)) for non-negative integer x, EXACTLY:
    length(bin(x)) - 1 — pure integer/string ops, so (unlike a float
    log2 whose last-ulp rounding can cross an integer boundary) the
    result is bit-identical in any engine with a binary-string
    function. x=0 maps to 0 (bin(0)='0'), negative x is undefined.
    The whole-bit surprise unit of the LM quality scorer."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.length(F.bin(c)) - F.lit(1)).cast("long")
