"""Text-analysis operators for training-data pipelines.

All hot-path logic is JVM-side built-in expressions (whole-stage
codegen) — no Python UDFs. Each operator is DataFrame -> DataFrame and
embarrassingly parallel: no shuffle, no skew sensitivity, scales
linearly with input splits at 100 TB.

Determinism notes (these operators are oracle-checked against DuckDB):
- token split regex ``\\s+`` and the BPE-ish pattern
  ``[a-z]+|[0-9]+|[^a-z0-9\\s]`` behave identically in Java regex and RE2
- ratios are single FP divisions of small integers -> bit-identical
  across engines
- the rolling fingerprint uses only integer ops mod 1e9+7 (no overflow)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons for the n-gram/keyword heuristic.
# (Real pipelines use fastText/CLD3; the operator contract — score per
# language, argmax with deterministic tie-break — is what matters here.)
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "is"),
    "es": ("el", "la", "de", "que", "y"),
    "fr": ("le", "la", "de", "et", "un"),
    "de": ("der", "die", "das", "und", "ist"),
}

STOPWORDS = ("the", "a", "of", "and", "is", "in", "to", "it")

TOKEN_REGEX = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def tokens_sql(text_col: str = "text") -> str:
    """SQL form of :func:`tokens_col` — the builders below assemble
    their signals as ONE parsed SQL expression instead of hundreds of
    nested py4j Column constructions. Round 15, guide §7.3: expression
    CONSTRUCTION is driver-side, single-threaded py4j traffic, and on
    the bench hosts a py4j round trip measures in milliseconds — the
    Column-DSL form of with_quality_score alone cost ~450 round trips
    (~0.9 s) before a single task ran. The parsed expression tree is
    identical (same functions, same lambda), so every result and plan
    is unchanged."""
    return f"filter(split(lower(`{text_col}`), '\\\\s+'), t -> t != '')"


def tokens_col(text_col: str = "text") -> Column:
    """Lower-cased whitespace tokens, EMPTY TOKENS REMOVED: split on
    \\s+ keeps leading/trailing empty strings, so "hello world\\n"
    would count a phantom third token — inflating every downstream
    count, ratio and bigram, and making empty text count 1 token. The
    DuckDB oracles apply the identical list_filter so both engines
    share one token definition."""
    return F.expr(tokens_sql(text_col))


def token_count_col(text_col: str = "text") -> Column:
    """Whitespace token count (single source of truth — the functions
    facade re-exports this; keeping one definition means the empty-token
    filter in tokens_col can never diverge between the two)."""
    return F.size(tokens_col(text_col))


def bpe_token_count_col(text_col: str = "text") -> Column:
    """BPE-ish regex token count (runs of letters, runs of digits,
    single other non-space chars)."""
    return F.size(F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(TOKEN_REGEX), 0))


def with_token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return df.withColumn("ws_tokens", token_count_col(text_col)).withColumn(
        "bpe_tokens", bpe_token_count_col(text_col)
    )


def with_quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: length, mean word length, stopword
    ratio, alpha ratio, and a composite score. One projection, no
    shuffle. Built as parsed SQL expressions (see tokens_sql) — the
    Column-DSL form of this one function cost ~450 py4j round trips
    per call; the expressions and results are identical.

    try_divide: ANSI mode (Spark 4 default) raises on /0 — empty text
    must yield 0-ish signals, not a job failure."""
    toks = tokens_sql(text_col)
    stop_arr = "array(" + ", ".join(f"'{s}'" for s in STOPWORDS) + ")"
    n_tok = f"size({toks})"
    n_stop = f"size(filter({toks}, t -> array_contains({stop_arr}, t)))"
    n_chars = f"length(`{text_col}`)"
    alpha_chars = f"length(regexp_replace(lower(`{text_col}`), '[^a-z]', ''))"
    stop_ratio = f"coalesce(try_divide({n_stop}, {n_tok}), 0.0D)"
    alpha_ratio = f"coalesce(try_divide({alpha_chars}, {n_chars}), 0.0D)"
    return df.withColumns(
        {
            "n_tokens": F.expr(n_tok),
            "mean_word_len": F.expr(
                f"coalesce(try_divide({n_chars} - ({n_tok} - 1), {n_tok}), 0.0D)"
            ),
            "stopword_ratio": F.expr(stop_ratio),
            "alpha_ratio": F.expr(alpha_ratio),
            "quality_score": F.expr(
                f"0.4D * least({n_tok} / 100.0D, 1.0D)"
                f" + 0.3D * {stop_ratio} + 0.3D * {alpha_ratio}"
            ),
        }
    )


def with_lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-lexicon language ID: per-language marker-token count,
    argmax with 'und' fallback when no marker hits; ties broken by
    language code order (deterministic — greatest score, first lang in
    sorted order wins via the aggregate fold). One parsed SQL
    expression (see tokens_sql); same expression tree and results as
    the previous Column-DSL form."""
    toks = tokens_sql(text_col)

    def marker_count(lang: str) -> str:
        markers = "array(" + ", ".join(f"'{m}'" for m in LANG_MARKERS[lang]) + ")"
        return f"size(filter({toks}, t -> array_contains({markers}, t)))"

    scores = ", ".join(
        f"struct({marker_count(lang)} AS score, '{lang}' AS lang)"
        for lang in sorted(LANG_MARKERS)
    )
    best = (
        f"aggregate(array({scores}), struct(-1 AS score, 'und' AS lang), "
        f"(acc, s) -> CASE WHEN s.score > acc.score THEN s ELSE acc END)"
    )
    return df.withColumn(
        "pred_lang",
        F.expr(
            f"CASE WHEN ({best}).score <= 0 THEN 'und' "
            f"ELSE ({best}).lang END"
        ),
    )


def exact_fp_col(text_col: str = "text") -> Column:
    """THE exact-duplicate fingerprint: md5 of the lower-cased text.
    Single definition shared by with_fingerprint, the curation
    pipeline's dedup stage and the contamination probes — if the
    normalization ever changes (e.g. trimming), every consumer and its
    oracle moves together."""
    return F.md5(F.lower(F.col(text_col)))


def with_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprints:

    - ``md5_fp``: md5 of the lower-cased text (exact-dup key)
    - ``roll_fp``: polynomial rolling hash over tokens,
      ``acc = (acc*131 + ascii(first_char)*31 + len(token)) mod 1e9+7``
      — integer-only, overflow-free, reproducible in any engine
    """
    toks = tokens_col(text_col)
    roll = F.aggregate(
        toks,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(131) + F.ascii(F.substring(t, 1, 1)) * F.lit(31) + F.length(t)
        )
        % F.lit(1_000_000_007),
    )
    return df.withColumn("md5_fp", exact_fp_col(text_col)).withColumn(
        "roll_fp", roll
    )


def build_vocab(df: DataFrame, max_size: int = 1000, text_col: str = "text") -> DataFrame:
    """Corpus term-frequency vocabulary: the top ``max_size`` tokens by
    total count, ids assigned by rank (count desc, token asc — fully
    deterministic, engine-reproducible). One explode + one partial-
    aggregated groupBy(token); the top-k and the ids both come from the
    DISTRIBUTED global rank (ranking.py — an orderBy().limit()
    TakeOrdered would merge partitions x k rows on the driver, and the
    naive row_number() id window is a single-task sort). Output:
    (token, token_id, freq)."""
    from .ranking import with_global_rank

    counts = (
        df.select(F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    ranked = with_global_rank(
        counts, [F.col("freq").desc(), F.col("token").asc()], rank_col="_vr"
    )
    return ranked.filter(F.col("_vr") <= max_size).select(
        "token",
        (F.col("_vr") - 1).cast("long").alias("token_id"),
        F.col("freq").cast("long").alias("freq"),
    )


def map_to_vocab(
    df: DataFrame,
    vocab: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Tokenize against a fixed vocabulary — the id-mapping stage of
    training ingestion: every token instance looks up its id in the
    (broadcast) vocab; unknown tokens count as OOV. Per-doc totals plus
    an order-insensitive id checksum make the mapping auditable without
    shipping the id arrays. Scale shape: explode + broadcast-hash-join
    (vocabularies are tiny next to a corpus; the corpus is never
    shuffled for the lookup) + one groupBy(doc). Output:
    (id, n_tokens, n_oov, id_checksum)."""
    exploded = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("token"))
    joined = exploded.join(F.broadcast(vocab.select("token", "token_id")), "token", "left")
    return joined.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("token_id").isNull().cast("long")).alias("n_oov"),
        F.sum(F.coalesce(F.col("token_id"), F.lit(0))).cast("long").alias("id_checksum"),
    )


def with_repetition_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1), the
    quality gate that catches boilerplate/looping text generators:

    - ``top_token_bp``: longest same-token run in the SORTED token list
      (= count of the most frequent token) over total tokens, in basis
      points. Computed as a single fold over ``array_sort`` — no
      explode, no shuffle.
    - ``distinct_ratio_bp``: distinct tokens / total tokens.
    - ``dup_bigram_bp``: duplicated bigram instances / total bigrams
      (``n - n_distinct``).

    All map-only built-in expressions; ratios are FLOOR(10000*x/y) on
    exact integers so an independent engine reproduces every value."""
    toks = tokens_col(text_col)
    n_tok = F.size(toks)

    def _bp(num: Column, den: Column) -> Column:
        return F.floor(
            F.coalesce(F.try_divide(F.lit(10000.0) * num, den), F.lit(0.0))
        ).cast("long")

    zero = F.lit(0).cast("long")
    run_state = F.aggregate(
        F.array_sort(toks),
        F.struct(
            F.lit("").alias("prev"), zero.alias("run"), zero.alias("best")
        ),
        lambda acc, t: F.struct(
            t.alias("prev"),
            F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")).alias("run"),
            F.greatest(
                acc["best"],
                F.when(t == acc["prev"], acc["run"] + 1).otherwise(F.lit(1).cast("long")),
            ).alias("best"),
        ),
    )
    bigrams = F.when(n_tok < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_tok - 2),
            lambda i: F.concat_ws(" ", F.slice(toks, i + 1, 2)),
        )
    )
    n_big = F.size(bigrams)
    return (
        df.withColumn("n_tokens", n_tok.cast("long"))
        .withColumn("top_token_bp", _bp(run_state["best"], n_tok))
        .withColumn("distinct_ratio_bp", _bp(F.size(F.array_distinct(toks)), n_tok))
        .withColumn("dup_bigram_bp", _bp(n_big - F.size(F.array_distinct(bigrams)), n_big))
    )


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB): character classes, bounded repetition, \b word
# boundaries — no lookaround, no backreferences.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "phone": (r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]"),
    "ip": (r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "[IP]"),
}


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """PII scrubbing — the compliance pass every training-data pipeline
    runs before text leaves curation: count and mask emails, US-style
    phone numbers, and IPv4 addresses. Map-only regex expressions
    (whole-stage codegen), no shuffle, linear at 100 TB. Patterns are
    applied in a fixed order (email -> phone -> ip; phone before ip so
    a phone number is never half-eaten as a dotted quad). Each count is
    taken on the text state BEFORE its own pattern applies (i.e. after
    the earlier masks), so the n_* columns reconcile exactly with the
    masks present in ``redacted_text`` — counting everything on the
    raw text would report phantom hits for spans an earlier pattern
    already consumed (an email swallowing a phone-shaped substring).
    Adds ``n_emails / n_phones / n_ips`` (long) and ``redacted_text``."""
    out = df
    current = F.col(text_col)
    for name, (pattern, mask) in PII_PATTERNS.items():
        out = out.withColumn(
            f"n_{name}s",
            F.size(F.regexp_extract_all(current, F.lit(pattern), 0)).cast("long"),
        )
        current = F.regexp_replace(current, pattern, mask.replace("$", r"\$"))
    return out.withColumn("redacted_text", current)


def chunk_documents(
    df: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sliding-window document chunking — the RAG-indexing / context-
    window preprocessing stage: split each doc into ``chunk_tokens``-
    token windows advancing by ``chunk_tokens - overlap``. Map-only
    (sequence + transform + explode inside one projection, no shuffle,
    linear in corpus size); deterministic ordinals and integer spans so
    an independent engine reproduces every chunk boundary. Output:
    (id, chunk_idx, start_token, n_chunk_tokens, chunk_text).

    The last start is bounded by n_tokens - overlap (not n_tokens):
    a start within the final ``overlap`` tokens yields a chunk fully
    CONTAINED in its predecessor — for defaults that is ~1 in 3
    document lengths shipping a 100%-duplicate chunk into the RAG
    index."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("require 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    toks = tokens_col(text_col)
    starts = F.sequence(
        F.lit(0),
        F.greatest(F.size(toks) - F.lit(overlap) - 1, F.lit(0)),
        F.lit(step),
    )
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / F.lit(step)).cast("long").alias("chunk_idx"),
            s.cast("long").alias("start_token"),
            F.slice(toks, s + 1, chunk_tokens).alias("window"),
        ),
    )
    return df.select(
        F.col(id_col).alias("id"), F.explode(chunks).alias("c")
    ).select(
        "id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.start_token").alias("start_token"),
        F.size("c.window").cast("long").alias("n_chunk_tokens"),
        F.concat_ws(" ", F.col("c.window")).alias("chunk_text"),
    )


def top_ngrams(
    df: DataFrame, n: int = 2, k: int = 20, text_col: str = "text"
) -> DataFrame:
    """Corpus-level top-k word n-grams by document frequency — the
    vocabulary/boilerplate profile of a corpus (finding template junk
    and hot boilerplate before dedup). Shape at 100 TB: explode ->
    partial-aggregated groupBy(ngram) (map-side combine absorbs the
    explosion) -> TakeOrderedAndProject for the global top-k (never a
    full sort). Ties broken by ngram text ascending for full
    determinism. Output: (ngram, doc_freq, rank)."""
    from .dedup import _spread, shingles_col

    # THE word n-gram definition lives in dedup.shingles_col — reusing
    # it keeps the corpus profile consistent with the dedup and
    # contamination operators that share it (same discipline as
    # exact_fp_col)
    grams = shingles_col(text_col, n)
    counts = (
        _spread(df).select(F.explode(F.array_distinct(grams)).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    # orderBy+limit fuses into TakeOrderedAndProject (no global sort);
    # the rank window then runs over only the k survivors.
    from pyspark.sql.window import Window

    topk = counts.orderBy(F.col("doc_freq").desc(), F.col("ngram").asc()).limit(k)
    w = Window.orderBy(F.col("doc_freq").desc(), F.col("ngram").asc())
    return topk.withColumn("rank", F.row_number().over(w)).select(
        "ngram", "doc_freq", F.col("rank").cast("long").alias("rank")
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def with_gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 20,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models", Appendix A1.1 — public filter recipe; thresholds
    are the paper's defaults except ``min_words``, lowered for short
    synthetic docs). Adds one boolean per rule plus ``keep`` (AND of
    all) so a pipeline can both filter and audit per-rule rejection
    rates in a single pass.

    Rules:
    - ``r_word_count``: word count in [min_words, max_words]
    - ``r_mean_word_len``: mean word length in [3, 10]
    - ``r_symbol_ratio``: (# + ellipsis) per word <= 0.1
    - ``r_alpha_words``: >= 80% of words contain a letter
    - ``r_stopwords``: >= 2 hits from the 8-word Gopher stop list
    - ``r_bullet_lines`` / ``r_ellipsis_lines``: <= 90% of lines start
      with a bullet, <= 30% end with an ellipsis

    Shape at 100 TB: pure map-only built-in expressions over one
    projection — whole-stage codegen, no shuffle, no Python. All
    ratios are single FP divisions of exact integer counts, so the
    flags are bit-reproducible in any engine (oracle-checked)."""
    # Parsed SQL expressions in one withColumns (round 15, guide §7.3 —
    # the Column-DSL form was ~300 py4j round trips per call); same
    # expression trees, same FP division order, oracle-identical.
    toks = tokens_sql(text_col)
    n_words = f"size({toks})"
    n_chars = f"length(`{text_col}`)"
    # mean word length over whitespace tokens: chars excluding the
    # (n_words - 1) separators, divided by word count.
    mean_wl = f"coalesce(try_divide({n_chars} - ({n_words} - 1), {n_words}), 0.0D)"
    n_symbols = f"size(regexp_extract_all(`{text_col}`, '#|\\\\.\\\\.\\\\.', 0))"
    n_alpha_words = f"size(filter({toks}, t -> t rlike '[a-z]'))"
    stop_arr = "array(" + ", ".join(f"'{s}'" for s in GOPHER_STOPWORDS) + ")"
    n_stop_hits = f"size(filter({toks}, t -> array_contains({stop_arr}, t)))"
    lines = f"split(`{text_col}`, '\\\\n')"
    n_lines = f"size({lines})"
    n_bullet = f"size(filter({lines}, l -> l rlike '^\\\\s*([-*•])'))"
    n_ell = f"size(filter({lines}, l -> l rlike '\\\\.\\\\.\\\\.\\\\s*$'))"

    out = df.withColumns(
        {
            "n_words": F.expr(f"CAST({n_words} AS BIGINT)"),
            "r_word_count": F.expr(
                f"({n_words} >= {min_words}) AND ({n_words} <= {max_words})"
            ),
            "r_mean_word_len": F.expr(
                f"({mean_wl} >= {min_mean_word_len!r}D) "
                f"AND ({mean_wl} <= {max_mean_word_len!r}D)"
            ),
            "r_symbol_ratio": F.expr(
                f"coalesce(try_divide({n_symbols}, {n_words}), 0.0D) "
                f"<= {max_symbol_ratio!r}D"
            ),
            "r_alpha_words": F.expr(
                f"coalesce(try_divide({n_alpha_words}, {n_words}), 0.0D) "
                f">= {min_alpha_word_ratio!r}D"
            ),
            "r_stopwords": F.expr(f"{n_stop_hits} >= {min_stopword_hits}"),
            "r_bullet_lines": F.expr(
                f"coalesce(try_divide({n_bullet}, {n_lines}), 0.0D) <= 0.9D"
            ),
            "r_ellipsis_lines": F.expr(
                f"coalesce(try_divide({n_ell}, {n_lines}), 0.0D) <= 0.3D"
            ),
        }
    )
    return out.withColumn(
        "keep",
        F.expr(
            "r_word_count AND r_mean_word_len AND r_symbol_ratio "
            "AND r_alpha_words AND r_stopwords AND r_bullet_lines "
            "AND r_ellipsis_lines"
        ),
    )


def tfdf_keywords(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document top-k keywords by tf x (N/df) — TF-IDF with a
    LINEAR inverse-document-frequency term instead of log(N/df).

    Why linear: the score must be bit-reproducible in an independent
    engine (the oracle), and ``log`` is the one place Spark (JVM
    Math.log intrinsic) and a C++ engine (libm) may disagree in the
    last ulp. tf*N and df are exact integers and IEEE division is
    correctly rounded everywhere, so tf*N/df is bit-identical by
    construction. The ranking it induces is the standard rare-term
    preference; swap in log1p for the classic weighting when
    cross-engine auditability is not required.

    Shape at 100 TB: explode -> map-side-combined groupBy(doc,token)
    for tf, groupBy(token) for df (the posting-list shuffle — same key
    cardinality as a vocabulary build), one join tf><df on token (AQE
    broadcasts the df side when the vocabulary is small), then a
    per-document window for the top-k — partitioned by doc id, never a
    global sort. N rides along as a one-row broadcast (the optimal
    attach-a-global-scalar plan, same as retrieval_bm25's corpus
    stats) instead of an eager count() job per invocation."""
    from pyspark.sql.window import Window

    # tf = within-doc term count (not presence): explode the full token
    # list and count per (doc, token).
    tf = (
        df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("token"))
        .groupBy(id_col, "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    n_row = df.agg(
        F.count_distinct(F.col(id_col)).cast("double").alias("_n_docs")
    )
    dfreq = (
        tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    )
    scored = (
        tf.join(dfreq, "token")
        .join(F.broadcast(n_row))
        .withColumn("score", F.col("tf") * F.col("_n_docs") / F.col("df"))
        .drop("_n_docs")
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("token").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            id_col,
            "token",
            F.col("tf").cast("long").alias("tf"),
            F.col("df").cast("long").alias("df"),
            "score",
            F.col("rank").cast("long").alias("rank"),
        )
    )


def boilerplate_lines(
    df: DataFrame,
    max_line_df: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style boilerplate-line stats: a (trimmed, non-empty) line
    appearing in MORE than ``max_line_df`` distinct documents is
    boilerplate (nav bars, cookie banners, licence footers — the
    template noise paragraph-level dedup removes before training).

    Output per doc: ``n_lines`` (non-empty line instances), ``n_kept``,
    ``n_removed`` (instances of boilerplate lines), so the caller can
    both filter and audit removal rates per source.

    Shape at 100 TB: explode lines -> one groupBy(line-hash) for
    document frequency (map-side combined; the line hash — not the
    line text — is the shuffle payload) -> one broadcast-free join
    back on the hash -> per-doc re-aggregation. Hot boilerplate lines
    are exactly the high-df keys, but the df aggregation reduces them
    to one row each before the join, so there is no skewed fan-out."""
    lines = df.select(
        F.col(id_col),
        F.explode(F.split(F.col(text_col), "\n")).alias("raw"),
    ).select(F.col(id_col), F.trim(F.col("raw")).alias("line")).filter(
        F.col("line") != ""
    ).withColumn("lh", F.xxhash64("line"))
    linedf = (
        lines.select(F.col(id_col), "lh")
        .distinct()
        .groupBy("lh")
        .agg(F.count(F.lit(1)).alias("line_df"))
    )
    flagged = lines.join(linedf, "lh").withColumn(
        "is_boiler", F.col("line_df") > max_line_df
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(F.when(~F.col("is_boiler"), 1).otherwise(0)).cast("long").alias("n_kept"),
        F.sum(F.when(F.col("is_boiler"), 1).otherwise(0)).cast("long").alias("n_removed"),
    )


def rare_bigram_stats(
    df: DataFrame,
    rare_df: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc corpus-rare bigram stats — an integer-exact LM-surprise
    proxy (a document whose adjacent-token pairs mostly appear nowhere
    else in the corpus is gibberish, boilerplate-mangled, or OCR noise;
    the heavy-tailed twin of the boilerplate-line filter above).

    Output per doc (docs with >= 2 tokens): ``n_bigrams`` (instances),
    ``n_rare`` (instances whose bigram occurs in <= ``rare_df``
    distinct docs), ``rare_bp`` (basis points, integer division — no
    float ever crosses an aggregation boundary).

    Shape at 100 TB: bigrams built JVM-side (zip_with, as
    token_bigrams), instances pre-aggregated per (doc, bigram-hash) —
    map-side combine collapses within-doc repeats BEFORE any shuffle —
    then one count per hash for document frequency (partial-combined:
    hot bigrams reduce to one row per map task) and a hash-keyed join
    back. Hot keys concentrate only on the join's probe side, where
    AQE's skew-join split applies; the df side is one row per bigram."""
    t = tokens_col(text_col)
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    per = (
        df.select(F.col(id_col), F.explode(bigrams).alias("bigram"))
        .withColumn("bh", F.xxhash64("bigram"))
        .groupBy(id_col, "bh")
        .agg(F.count(F.lit(1)).alias("k"))
    )
    bdf = per.groupBy("bh").agg(F.count(F.lit(1)).alias("bdf"))
    return (
        per.join(bdf, "bh")
        .groupBy(id_col)
        .agg(
            F.sum("k").cast("long").alias("n_bigrams"),
            F.sum(F.when(F.col("bdf") <= rare_df, F.col("k")).otherwise(0))
            .cast("long")
            .alias("n_rare"),
        )
        .withColumn(
            "rare_bp",
            F.expr("(10000 * n_rare) div n_bigrams").cast("long"),
        )
    )


def token_bigrams(
    df: DataFrame,
    k: int = 20,
    text_col: str = "text",
) -> DataFrame:
    """Global top-k adjacent token pairs (collocation/BPE-merge
    candidates — the first statistic a tokenizer-training pass
    computes). Bigrams are built JVM-side by zipping the token array
    with its own tail (no posexplode + window), exploded, counted with
    map-side combine, and the top-k taken by (count desc, bigram asc)
    — TakeOrderedAndProject, a k-row driver merge, never a global
    sort."""
    t = tokens_col(text_col)
    bigrams = F.zip_with(
        F.slice(t, 1, F.greatest(F.size(t) - 1, F.lit(0))),
        F.slice(t, 2, F.greatest(F.size(t) - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    return (
        df.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy(F.col("n").desc(), F.col("bigram").asc())
        .limit(k)
    )


def unigram_surprise(
    df: DataFrame,
    train: Column,
    max_vocab: int = 50000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """CCNet-style LM quality score, integer-exact: train an add-one-
    smoothed unigram LM on the ``train`` slice of the corpus, score
    every held-out document by its total/mean token surprise. Instead
    of float log-probabilities (whose summation order would make the
    result non-deterministic across partitionings), surprise is
    measured in WHOLE BITS via pure integer arithmetic:

        q(w)    = (N + V) div (c(w) + 1)      -- inverse smoothed prob
        bits(w) = length(bin(q)) - 1          -- floor(log2 q), exact

    where ``c(w)`` is the train-corpus count (0 for OOV / beyond the
    ``max_vocab`` cap), ``N`` the total train token count and ``V``
    the retained vocab size. Output per held-out doc: ``n_tokens``,
    ``total_bits``, and ``surprise_bp`` = 10000*total_bits div
    n_tokens (mean bits-per-token in basis points — the discretized
    cross-entropy a perplexity filter thresholds on). No float ever
    exists in the plan, so the result is bit-identical to the DuckDB
    oracle.

    Shape at 100 TB: one map-combined groupBy builds the token counts;
    the ``max_vocab`` cap is a DISTRIBUTED rank over the count frame
    (ranking.py:with_global_rank — range shuffle + O(partitions)
    offsets; an orderBy().limit() TakeOrdered here would merge
    partitions x k rows on the driver, 50M rows at 1000 executors),
    so only the <= max_vocab retained rows are ever collected, into
    the scoring side's BROADCAST hash join. Scoring is a map-only pass
    (explode -> broadcast-join -> per-doc partial agg); N and V come
    from ONE aggregate over the already-pinned rank frame and ride
    along as a broadcast single-row cross join. No shuffle ever
    carries the held-out token stream."""
    from .ranking import with_global_rank

    tok = df.select(
        F.col(id_col),
        train.alias("_train"),
        F.explode(tokens_col(text_col)).alias("tok"),
    )
    cnt = tok.filter(F.col("_train")).groupBy("tok").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    ranked = with_global_rank(
        cnt, [F.col("c").desc(), F.col("tok").asc()], rank_col="_vr"
    )
    vocab = ranked.filter(F.col("_vr") <= max_vocab).select("tok", "c")
    # coalesce: SUM over an empty train slice is NULL; an empty corpus
    # must yield bits=length(bin(0))-1=0, not a NULL cascade. One agg
    # over the pinned rank frame — the token explode is never re-run.
    totals = ranked.agg(
        F.coalesce(F.sum("c"), F.lit(0)).cast("long").alias("N"),
        F.coalesce(
            F.sum((F.col("_vr") <= max_vocab).cast("long")), F.lit(0)
        ).cast("long").alias("V"),
    )
    from ..functions import int_log2

    q = F.expr("(N + V) div (coalesce(c, cast(0 as bigint)) + 1)")
    return (
        tok.filter(~F.col("_train"))
        .join(F.broadcast(vocab), "tok", "left")
        .crossJoin(F.broadcast(totals))
        .withColumn("bits", int_log2(q))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("bits").cast("long").alias("total_bits"),
        )
        .withColumn(
            "surprise_bp",
            F.expr("(10000 * total_bits) div n_tokens").cast("long"),
        )
    )
