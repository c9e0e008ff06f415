"""Deduplication operators: exact, n-gram Jaccard, MinHash-LSH, SimHash.

Scale design (the point of each strategy at 100 TB):

- **Exact**: hash-groupBy on a fingerprint column. One shuffle on the
  fingerprint; map-side partial aggregation; no skew beyond true dups.
- **N-gram Jaccard**: explode shingles -> self-join on shingle ->
  per-pair intersection counts. The join key is the shingle, so hot
  shingles are the skew risk — ``max_shingle_df`` drops
  stop-shingles (document-frequency cap), which bounds the join
  fan-out exactly like dropping stopwords in an inverted index.
- **MinHash-LSH**: constant-size signature per doc (k hashes), banded
  into b buckets -> candidate pairs only within buckets. Shuffle volume
  is O(docs * b), independent of document length; the classic
  sub-quadratic near-dup path.
- **SimHash**: 64-bit signature via sign-aggregated token hashes;
  near-dups = signatures at small Hamming distance, found by banding
  the 64 bits into chunks (exact-match join per chunk).

All shingling/hashing uses built-in expressions (xxhash64, transform,
aggregate) — JVM-side, no Python.
"""

from __future__ import annotations

import os

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..session import release_local_checkpoint
from .text import tokens_col

# Mersenne-ish prime for the universal-hash family (fits in long math).
MINHASH_PRIME = 2_147_483_647  # 2^31 - 1

# Active signature_cache_scope tokens (innermost last), PER DRIVER
# THREAD. Module-level on purpose: the scope is a driver-side lifecycle
# construct, and operators must see it without threading a parameter
# through every call chain. Thread-local since r14: entries overlap
# independent Spark actions from a small thread pool (guide §2.6), and
# a shared stack would let one thread's scope exit pop — and unpersist —
# another thread's token mid-action. Each thread's scopes nest among
# themselves exactly as before; a worker thread re-deriving an already-
# cached signature plan reuses it via the storageLevel check in
# _scoped_cache (the CacheManager matches by canonicalized plan), so
# cross-thread sharing of the cache itself still works.
import threading as _threading  # noqa: E402

_CACHE_SCOPES_TLS = _threading.local()


def _cache_scopes() -> list[list[DataFrame]]:
    stack = getattr(_CACHE_SCOPES_TLS, "stack", None)
    if stack is None:
        stack = _CACHE_SCOPES_TLS.stack = []
    return stack


from contextlib import contextmanager  # noqa: E402


@contextmanager
def signature_cache_scope():
    """Deterministic lifecycle for the MinHash/SimHash signature caches.

    The LSH operators ``cache()`` their signature frame (reused by every
    band join side within one returned plan). Outside a scope that cache
    lives until LRU eviction or ``spark.catalog.clearCache()`` — fine
    for one corpus, but a long session deduping MANY corpora accumulates
    evict-only storage. Running the operator (and materializing its
    result) inside this scope unpersists every signature frame the
    operators registered on exit::

        with signature_cache_scope():
            pairs = minhash_lsh_pairs(docs).collect()
        # executor storage for the signature cache is released here

    Materialize INSIDE the scope: exiting unpersists, so a DataFrame
    collected afterwards still computes correctly but re-derives
    signatures per use instead of reading the cache. Scopes nest;
    each frame is released by the innermost scope open at its creation."""
    token: list[DataFrame] = []
    stack = _cache_scopes()
    stack.append(token)
    try:
        yield
    finally:
        stack.pop()
        for df in token:
            df.unpersist()


def _scoped_cache(df: DataFrame) -> DataFrame:
    """cache() + registration with the innermost signature_cache_scope
    (no-op registration when no scope is active — the documented
    clearCache fallback applies then). An already-cached plan is
    returned as-is: re-caching is a no-op that only emits the JVM's
    'Asked to cache already cached data' warning (two operators over
    the same corpus within one scope share a signature frame)."""
    if df.storageLevel.useMemory or df.storageLevel.useDisk:
        return df
    out = df.cache()
    stack = _cache_scopes()
    if stack:
        stack[-1].append(out)
    return out


def _spread(df: DataFrame) -> DataFrame:
    """Widen pathologically narrow inputs before CPU-heavy map work
    (shingling/hashing). A local bench reading one small parquet file
    gets a 1-partition scan, serializing the whole map side on one
    core; at cluster scale the scan already has hundreds of splits and
    this is a no-op (the condition is false — no extra shuffle of the
    text payload ever happens on the real path)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    try:
        # JVM-side RDD: reads the plan's partition count without
        # building the Python-RDD deserializer pipeline that df.rdd
        # constructs just to answer getNumPartitions().
        n_parts = df._jdf.rdd().getNumPartitions()
    except Exception:  # pragma: no cover - non-classic sessions
        n_parts = df.rdd.getNumPartitions()
    if n_parts < max(2, target // 2):
        return df.repartition(target)
    return df


def exact_dedup(
    df: DataFrame, key_cols: list[str], id_col: str = "doc_id"
) -> DataFrame:
    """Keep the lowest-id row per duplicate group; adds ``dup_count``.

    groupBy(hash keys) -> min(id): one shuffle, map-side combine."""
    return df.groupBy(*key_cols).agg(
        F.min(id_col).alias(id_col),
        F.count(F.lit(1)).alias("dup_count"),
    )


def dup_clusters(
    pairs: DataFrame,
    max_iterations: int = 20,
    id_a: str = "id_a",
    id_b: str = "id_b",
    driver_threshold: int = 200_000,
) -> DataFrame:
    """Resolve near-dup PAIRS into connected components: every doc maps
    to the minimum id reachable through the pair graph (the canonical
    representative a pipeline keeps).

    Min-label propagation with pointer jumping: each round a node takes
    the min of (its label, neighbor labels), then labels jump through
    themselves (label := label(label)) — halving chain depth, so
    convergence is O(log diameter) rounds, each a bounded number of
    shuffle joins. ``localCheckpoint`` truncates lineage every round
    (iterative DataFrame plans otherwise grow without bound and OOM the
    driver's analyzer). Convergence detector: zero changed labels this
    round — exact for ANY id dtype (a sum(label) shortcut would break
    on string ids and can overflow on huge ints).
    Output: (doc_id, cluster_id).
    """
    # Null ids cannot participate in a component (and would behave
    # differently per path) — drop them up front in both paths.
    pairs = pairs.dropna(subset=[id_a, id_b])
    id_type = pairs.schema[id_a].dataType.simpleString()
    # Hybrid: near-dup pair sets are usually FAR smaller than the corpus
    # (they're the output of an LSH/Jaccard filter). Below the threshold
    # a driver-side union-find beats ~5 Spark rounds of joins by 10x+;
    # above it, the distributed propagation takes over. Same results.
    # ONE job decides and fetches: if limit+1 returned <= threshold rows,
    # the fetch was already complete (no second pass over the expensive
    # upstream pair pipeline).
    probe = (
        pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
        .limit(driver_threshold + 1)
        .collect()
    )
    if len(probe) <= driver_threshold:
        parent: dict = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]  # path halving
                x = parent[x]
            return x

        for r in probe:
            ra, rb = find(r.a), find(r.b)
            if ra != rb:
                # union by min id so cluster_id == component minimum
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        out = [(node, find(node)) for node in parent]
        if not out:  # keep the id dtype of the input on empty results
            return pairs.select(
                F.col(id_a).alias("doc_id"), F.col(id_a).alias("cluster_id")
            ).limit(0)
        # cast back to the input id dtype — inference would widen ints
        # to bigint and make the result schema depend on pair count
        return pairs.sparkSession.createDataFrame(
            out, ["doc_id", "cluster_id"]
        ).select(
            F.col("doc_id").cast(id_type).alias("doc_id"),
            F.col("cluster_id").cast(id_type).alias("cluster_id"),
        )

    edges = (
        pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
        .union(pairs.select(F.col(id_b).alias("src"), F.col(id_a).alias("dst")))
        .distinct()
        .localCheckpoint()
    )
    labels = prev_pinned = (
        edges.select(F.col("src").alias("node"))
        .distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iterations):
        neighbor_min = (
            edges.join(labels.withColumnsRenamed({"node": "dst", "label": "nl"}), "dst")
            .groupBy("src")
            .agg(F.min("nl").alias("nmin"))
            .withColumnsRenamed({"src": "node"})
        )
        # `prev` carries the round's starting label through the jump so
        # the convergence flag below needs NO join back to the old
        # label table (round 15, guide §1.2: the per-round
        # changed-count used to be a second action — a node-keyed join
        # + count over the label table EVERY round, doubling the
        # actions per round; the flag now rides the round's own
        # checkpoint materialization and the test is a limit-1 probe
        # of the pinned blocks).
        direct = labels.join(neighbor_min, "node", "left").select(
            "node",
            F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias(
                "label"
            ),
            F.col("label").alias("prev"),
        )
        # pointer jump: label := label(label)
        jump = direct.alias("a").join(
            direct.select(
                F.col("node").alias("label"), F.col("label").alias("ll")
            ).alias("b"),
            "label",
            "left",
        )
        new_pinned = jump.select(
            "node",
            F.least(
                F.col("label"), F.coalesce(F.col("ll"), F.col("label"))
            ).alias("label"),
            F.col("prev"),
        ).localCheckpoint()
        # Convergence = zero labels CHANGED this round — an exact,
        # dtype-agnostic test (a sum(label) shortcut would break on
        # string ids and can overflow on huge ints). The changed flag
        # is label != prev on the ALREADY-PINNED frame, so this probe
        # scans local blocks and stops at the first hit.
        changed = (
            new_pinned.filter(F.col("label") != F.col("prev")).limit(1).count()
            > 0
        )
        if prev_pinned is not None:
            release_local_checkpoint(prev_pinned)
        prev_pinned = new_pinned
        labels = new_pinned.select("node", "label")
        if not changed:
            break
    release_local_checkpoint(edges)
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def shingles_col(text_col: str = "text", n: int = 3) -> Column:
    """Word n-gram shingles as strings (space-joined). One parsed SQL
    expression (round 15, guide §7.3 — the Column-DSL form cost dozens
    of py4j round trips per call site; the expression tree and results
    are identical, see text.tokens_sql)."""
    from .text import tokens_sql

    toks = tokens_sql(text_col)
    return F.expr(
        f"CASE WHEN size({toks}) < {n} THEN array(concat_ws(' ', {toks})) "
        f"ELSE transform(sequence(0, greatest(size({toks}) - {n}, 0)), "
        f"i -> concat_ws(' ', slice({toks}, i + 1, {n}))) END"
    )


def substring_dup_spans(
    df: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_docs: int = 2,
) -> DataFrame:
    """Exact substring-window dedup accounting (the Lee et al. 2022
    "Deduplicating Training Data" ExactSubstr shape, at window
    granularity): every ``n``-token window of every doc is a
    fingerprint; a window whose text occurs in >= ``min_docs`` distinct
    docs is a duplicated span. Reports, per doc, how much of it is
    covered by cross-document duplicated windows.

    Scale shape — the inverted-index/posting-list pattern, not a
    suffix array: window explode -> groupBy(window) with map-side
    combine (the shuffle key is the window text; at 100 TB you'd
    shuffle xxhash64(window) instead — kept as text here so an
    independent engine can replay the exact equality) -> semi-join
    windows against the shared set -> one aggregation by doc. Window
    count per doc is linear in tokens, so total shuffle volume is
    O(corpus tokens), and the ``min_docs`` filter collapses the long
    unique tail before the join-back. Output:
    (doc_id, n_windows, n_dup_windows, dup_bp)."""
    grams = shingles_col(text_col, n)
    windows = _spread(df).select(
        F.col(id_col), F.explode(grams).alias("gram")
    )
    shared = (
        windows.distinct()
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gram")
    )
    dup_counts = (
        windows.join(shared, "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_dup_windows"))
    )
    totals = df.select(F.col(id_col), F.size(grams).cast("long").alias("n_windows"))
    return (
        totals.join(dup_counts, id_col, "left")
        .select(
            id_col,
            "n_windows",
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long").alias("n_dup_windows"),
            F.floor(
                F.coalesce(
                    F.try_divide(
                        F.lit(10000.0) * F.coalesce(F.col("n_dup_windows"), F.lit(0)),
                        F.col("n_windows"),
                    ),
                    F.lit(0.0),
                )
            ).cast("long")
            .alias("dup_bp"),
        )
    )


def _shingle_pair_counts(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    max_shingle_df: int | None,
):
    """Shared inverted-index machinery for exact set-overlap dedup:
    returns ``(inter, sizes)`` where ``inter`` is (id_a, id_b,
    intersect_cnt) with id_a < id_b over distinct n-gram shingles and
    ``sizes`` is (_id, sz) per-doc distinct-shingle counts — both
    computed from the SAME (optionally df-capped) shingle sets, so any
    similarity derived from them is internally consistent."""
    # Shingles join-key as a 64-bit hash (not the string): smaller
    # shuffle payload; collision odds are negligible for the counts.
    df = _spread(df)
    sh = df.select(
        F.col(id_col).alias("_id"),
        F.explode(
            F.array_distinct(
                F.transform(shingles_col(text_col, n), lambda s: F.xxhash64(s))
            )
        ).alias("sh"),
    )
    # Inverted index via groupBy-shingle + in-memory pair expansion:
    # 2 shuffles (by shingle, then by pair) instead of the 3 a
    # self-join needs, and no join hash tables. Pair fan-out per
    # shingle is df^2/2 — the max_shingle_df cap is the skew guard.
    posting = sh.groupBy("sh").agg(F.sort_array(F.collect_set("_id")).alias("ids"))
    if max_shingle_df is not None:
        # Hot-shingle cap applied ON the posting lists (size == the
        # shingle's document frequency): one filter instead of a
        # separate count pass + anti-join over the raw postings. Doc
        # sizes are then derived from the SAME capped postings, so
        # similarity denominators see exactly the capped shingle sets.
        posting = posting.filter(F.size("ids") <= max_shingle_df)
        sizes = (
            posting.select(F.explode("ids").alias("_id"))
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("sz"))
        )
    else:
        sizes = sh.groupBy("_id").agg(F.count(F.lit(1)).alias("sz"))
    pair_structs = F.flatten(
        F.transform(
            F.col("ids"),
            lambda x, i: F.transform(
                F.slice(F.col("ids"), i + 2, F.size(F.col("ids"))),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    inter = (
        posting.filter(F.size("ids") > 1)
        .select(F.explode(pair_structs).alias("p"))
        .groupBy(F.col("p.id_a").alias("id_a"), F.col("p.id_b").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("intersect_cnt"))
    )
    return inter, sizes


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_jaccard: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram-Jaccard near-dup pairs via inverted-index self-join.

    Output: (id_a, id_b, intersect_cnt, union_cnt, jaccard), id_a < id_b.
    ``max_shingle_df`` caps shingle document frequency to bound join
    fan-out (skew guard for hot shingles at scale)."""
    inter, sizes = _shingle_pair_counts(df, id_col, text_col, n, max_shingle_df)
    out = (
        inter.join(sizes.withColumnsRenamed({"_id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"_id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn("union_cnt", F.col("sz_a") + F.col("sz_b") - F.col("intersect_cnt"))
        .withColumn("jaccard", F.col("intersect_cnt") / F.col("union_cnt"))
        .filter(F.col("jaccard") >= min_jaccard)
        .select("id_a", "id_b", "intersect_cnt", "union_cnt", "jaccard")
    )
    return out


def ngram_containment_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    min_containment: float = 0.8,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """Exact n-gram CONTAINMENT near-dup pairs: containment =
    |A intersect B| / min(|A|, |B|) — the asymmetric-overlap measure
    that catches SUBSET duplication Jaccard misses (a short doc wholly
    embedded in a long one has tiny Jaccard but containment ~1; the
    classic quote/excerpt/boilerplate-wrapper case in training-data
    dedup, cf. Broder's containment measure in the resemblance paper).

    Output: (id_a, id_b, intersect_cnt, sz_a, sz_b, containment),
    id_a < id_b, containment of the SMALLER side (symmetric form).
    Same inverted-index shape and hot-shingle cap as
    ngram_jaccard_pairs — one posting shuffle, one pair shuffle,
    fan-out bounded by max_shingle_df."""
    inter, sizes = _shingle_pair_counts(df, id_col, text_col, n, max_shingle_df)
    return (
        inter.join(sizes.withColumnsRenamed({"_id": "id_a", "sz": "sz_a"}), "id_a")
        .join(sizes.withColumnsRenamed({"_id": "id_b", "sz": "sz_b"}), "id_b")
        .withColumn(
            "containment", F.col("intersect_cnt") / F.least("sz_a", "sz_b")
        )
        .filter(F.col("containment") >= min_containment)
        .select("id_a", "id_b", "intersect_cnt", "sz_a", "sz_b", "containment")
    )


def editdist_verified_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_prefix: int = 24,
    verify_prefix: int = 200,
    max_dist: int = 30,
    max_block: int = 50,
) -> DataFrame:
    """Near-dup pairs = prefix-blocked candidates VERIFIED by edit
    distance — the two-stage shape every production entity-resolution /
    dedup pipeline uses (cheap blocking to bound candidates, an exact
    but expensive verifier only on candidates). The verifier here is
    classic Levenshtein on a capped prefix: a per-pair cost that is a
    CONSTANT (``verify_prefix**2`` cell ops), not a function of
    document length, and runs entirely JVM-side (``F.levenshtein``).

    Blocking key: the first ``block_prefix`` chars of the lowercased
    text. Near-identical documents (the perturbed-copy case) share it;
    anything that diverges in the first line is out of scope for THIS
    verifier (the shingle/LSH operators above catch reordered or
    embedded duplication — the families are complementary).

    Scale shape: ONE shuffle on the block key; pair fan-out per block
    is ``max_block**2 / 2`` — ``max_block`` is the same skew-guard
    discipline as ``max_shingle_df`` on the inverted-index operators
    (a boilerplate-prefix block with 10k members would otherwise cost
    50M verifications; the cap drops it, loudly by contract, and the
    hot prefix is boilerplate, not duplication signal). No join hash
    tables: pairs expand in-memory from the sorted posting list,
    exactly like ``_shingle_pair_counts``.

    Output: (id_a, id_b, dist), id_a < id_b, ``dist <= max_dist``,
    all-integer (driver-hash-safe).
    """
    df = _spread(df.filter(F.col(text_col).isNotNull()))
    blocked = df.select(
        F.substring(F.lower(F.col(text_col)), 1, block_prefix).alias("blk"),
        F.struct(
            F.col(id_col).alias("_id"),
            F.substring(F.col(text_col), 1, verify_prefix).alias("vtxt"),
        ).alias("rec"),
    )
    posting = (
        blocked.groupBy("blk")
        .agg(F.sort_array(F.collect_list("rec")).alias("recs"))
        .filter((F.size("recs") > 1) & (F.size("recs") <= max_block))
    )
    pair_structs = F.flatten(
        F.transform(
            F.col("recs"),
            lambda x, i: F.transform(
                F.slice(F.col("recs"), i + 2, F.size(F.col("recs"))),
                # Thresholded levenshtein: band-pruned O(max_dist * n)
                # per pair instead of O(n^2), returns -1 above the
                # threshold (filtered below — NOT <= max_dist, which
                # -1 would satisfy).
                lambda y: F.struct(
                    x["_id"].alias("id_a"),
                    y["_id"].alias("id_b"),
                    F.levenshtein(x["vtxt"], y["vtxt"], max_dist).alias("dist"),
                ),
            ),
        )
    )
    return (
        posting.select(F.explode(pair_structs).alias("p"))
        .select(
            F.col("p.id_a").alias("id_a"),
            F.col("p.id_b").alias("id_b"),
            F.col("p.dist").cast("long").alias("dist"),
        )
        .filter(F.col("dist") >= 0)
    )


def shingle_hashes_col(text_col: str = "text", n: int = 3) -> Column:
    """Distinct shingle hashes per doc: ``pmod(xxhash64(shingle), p)``."""
    sh = F.array_distinct(shingles_col(text_col, n))
    return F.transform(sh, lambda s: F.pmod(F.xxhash64(s), F.lit(MINHASH_PRIME)))


def md5_shingle_hashes_col(text_col: str = "text", n: int = 3) -> Column:
    """Distinct shingle hashes per doc from an md5 prefix instead of
    xxhash64 — same distribution properties, but ENGINE-NEUTRAL: any
    SQL engine with md5() replays the exact values, which is what lets
    the registry's LSH entries be hash-verified against DuckDB
    (xxhash64 exists only in Spark). 60-bit hex prefix reduced mod the
    MinHash prime so the (a*h + b) % p signature math stays inside
    int64 in both engines."""
    sh = F.array_distinct(shingles_col(text_col, n))
    return F.transform(
        sh,
        lambda s: F.pmod(
            F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
            F.lit(MINHASH_PRIME),
        ),
    )


def _minhash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    """The seeded (a, b) universal-hash family — SHARED by the JVM and
    numpy signature paths; signature parity depends on this being the
    single source."""
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, MINHASH_PRIME), rnd.randrange(0, MINHASH_PRIME))
        for _ in range(num_hashes)
    ]


def minhash_sig_from_hashes(
    hashes: Column, num_hashes: int = 64, seed: int = 42
) -> Column:
    """MinHash signature from a (pre-materialized!) hash-array column:
    per permutation k, min over ``(a_k*h + b_k) mod p``.

    IMPORTANT perf note: ``hashes`` must be a plain column reference, not
    the shingling expression itself — Catalyst does NOT common-subexpression
    -eliminate across lambda boundaries, so an inline expression would be
    recomputed once per permutation (measured 20x slowdown)."""
    params = _minhash_params(num_hashes, seed)
    # parsed array literals: 2 py4j calls instead of 2*num_hashes
    a_arr = F.expr("array(" + ", ".join(str(a) for a, _ in params) + ")")
    b_arr = F.expr("array(" + ", ".join(str(b) for _, b in params) + ")")
    # Single left-to-right fold over the hash array: per element compute
    # all permutations and element-wise min into the accumulator. The
    # hash/shingle expression is the aggregate's INPUT (evaluated once
    # per row); putting it inside the per-permutation lambda instead
    # re-shingled every row 64 times (measured 20x slowdown). One
    # expression for the whole signature also keeps codegen compact vs
    # 64 separate columns.
    perms = F.sequence(F.lit(0), F.lit(num_hashes - 1))
    return F.aggregate(
        hashes,
        F.array_repeat(F.lit(MINHASH_PRIME).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(
            acc,
            F.transform(
                perms,
                lambda k: F.pmod(
                    h * F.element_at(a_arr, k + 1) + F.element_at(b_arr, k + 1),
                    F.lit(MINHASH_PRIME),
                ),
            ),
            lambda x, y: F.least(x, y),
        ),
    )


def minhash_sig_np(
    hashes_col: str,
    num_hashes: int = 64,
    seed: int = 42,
):
    """Numpy MinHash signature from a shingle-hash array column, as a
    Pandas UDF. Spark's higher-order-function expressions are
    INTERPRETED (no whole-stage codegen) and allocate a fresh
    accumulator array per fold step — measured ~2.8 ms/doc at 64 perms.
    The Arrow->numpy path does the same math as one (shingles x perms)
    broadcast modmul: ~50x faster, and the shingle hashing itself stays
    JVM-side (xxhash64). Same (a*h + b) mod p family and seed as
    minhash_sig_from_hashes, so both paths yield identical signatures."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    params = _minhash_params(num_hashes, seed)
    a = np.array([p[0] for p in params], dtype=np.int64)
    b = np.array([p[1] for p in params], dtype=np.int64)
    prime = MINHASH_PRIME  # captured by value: workers need no package import
    n_perms = num_hashes

    @pandas_udf("array<long>")
    def sig(hashes_series: pd.Series) -> pd.Series:
        out = []
        empty = np.full(n_perms, prime, dtype=np.int64)
        for hs in hashes_series:
            h = np.asarray(hs, dtype=np.int64)
            if h.size == 0:
                out.append(empty.copy())
                continue
            # (n_shingles, num_hashes) broadcast; h < 2^31 and a < 2^31
            # so the product stays inside int64.
            out.append(((h[:, None] * a[None, :] + b[None, :]) % prime).min(axis=0))
        return pd.Series(out)

    from pyspark.sql import functions as _F

    return sig(_F.col(hashes_col))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
    verify_jaccard: float | None = 0.5,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Banded MinHash-LSH candidate pairs, optionally verified with the
    estimated Jaccard (signature agreement rate).

    shingle -> minhash (map-only) -> explode b bands -> groupBy
    (band, band_hash) self-join -> distinct pairs. Shuffle is
    O(docs*bands), never O(docs^2).

    ``hash_fn="md5"`` swaps the shingle hash for the engine-neutral md5
    prefix and the band bucket key for the literal signature slice
    (instead of a murmur3 of it) — every value then replays in any SQL
    engine, which is how the registry's ``dedup_minhash_lsh`` entry is
    hash-verified against DuckDB. Identical banding semantics and
    shuffle shape; xxhash64 stays the library default (faster JVM-side
    hashing, no replay requirement)."""
    if hash_fn not in ("xxhash64", "md5"):
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be a positive multiple of "
            f"bands ({bands}): rows_per_band=0 makes every band hash "
            "identical (full O(n^2) cross-product) and a non-divisible "
            "split silently drops tail hashes from the banding"
        )
    rows_per_band = num_hashes // bands
    df = _spread(df)
    hashes = (
        md5_shingle_hashes_col(text_col, n)
        if hash_fn == "md5"
        else shingle_hashes_col(text_col, n)
    )
    sig = _scoped_cache(
        df.select(F.col(id_col).alias("_id"), hashes.alias("_h"))
        .select("_id", minhash_sig_np("_h", num_hashes, seed).alias("sig"))
    )  # reused across all bands within THIS plan; Spark evicts LRU
    # under memory pressure. Lifecycle: run inside signature_cache_scope
    # to release the cache deterministically (many-corpora sessions);
    # otherwise spark.catalog.clearCache() remains the fallback.

    # one parsed banded-explode expression instead of per-band
    # struct/lit/slice py4j construction (round 15, guide §7.3);
    # md5 variant keeps the literal slice as the bucket key —
    # replayable in any engine (murmur3 hash() is Spark-only)
    rpb = rows_per_band
    bh = (
        f"concat_ws(',', transform(slice(sig, i * {rpb} + 1, {rpb}), "
        "x -> CAST(x AS STRING)))"
        if hash_fn == "md5"
        else f"hash(slice(sig, i * {rpb} + 1, {rpb}))"
    )
    banded = sig.select(
        "_id",
        F.expr(
            f"explode(transform(sequence(0, {bands - 1}), "
            f"i -> struct(i AS band, {bh} AS bh)))"
        ).alias("b"),
    ).select("_id", "b.band", "b.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .distinct()
    )
    if verify_jaccard is None:
        return cand
    sa = sig.withColumnsRenamed({"_id": "id_a", "sig": "sig_a"})
    sb = sig.withColumnsRenamed({"_id": "id_b", "sig": "sig_b"})
    est = (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                    lambda m: m,
                )
            )
            / F.lit(num_hashes),
        )
        .filter(F.col("est_jaccard") >= verify_jaccard)
        .select("id_a", "id_b", "est_jaccard")
    )
    return est


def _minhash_banded_sig(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    num_hashes: int,
    bands: int,
    seed: int,
):
    """(sig frame, banded frame) for a corpus — the shared head of the
    one-shot LSH pass and the persisted-index paths."""
    rows_per_band = num_hashes // bands
    sig = _scoped_cache(
        _spread(df)
        .select(F.col(id_col).alias("_id"), shingle_hashes_col(text_col, n).alias("_h"))
        .select("_id", minhash_sig_np("_h", num_hashes, seed).alias("sig"))
    )
    banded = sig.select(
        "_id",
        "sig",
        F.expr(
            f"explode(transform(sequence(0, {bands - 1}), i -> struct("
            f"i AS band, hash(slice(sig, i * {rows_per_band} + 1, "
            f"{rows_per_band})) AS bh)))"
        ).alias("b"),
    ).select("_id", "sig", "b.band", "b.bh")
    return sig, banded


def write_minhash_index(
    df: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    seed: int = 42,
) -> None:
    """Persist the corpus's banded MinHash signatures as a band-
    partitioned parquet index: history is shingled ONCE; afterwards a
    daily increment dedups against the whole archive by joining its
    own (band, bucket) rows to the index — signature rows only, the
    historical TEXT is never re-read. The manifest pins the signature
    parameters so an increment computed with different shingling can
    never silently join incompatible sketches, and the swap is a
    single-winner CAS commit (_cas_swap_minhash_manifest) — a racing
    writer raises ConcurrentIndexSwapError instead of last-win
    overwriting this build."""
    if bands <= 0 or num_hashes % bands != 0:
        raise ValueError("num_hashes must be a positive multiple of bands")
    _m, base = _read_minhash_manifest_versioned(index_dir)
    sig, banded = _minhash_banded_sig(df, id_col, text_col, n, num_hashes, bands, seed)
    seg = _write_minhash_segment(sig, banded, index_dir)
    _cas_swap_minhash_manifest(
        index_dir,
        {
            "kind": "minhash",
            "n": n,
            "num_hashes": num_hashes,
            "bands": bands,
            "seed": seed,
            "id_col": id_col,
            "segments": [seg],
        },
        base,
    )


def _write_minhash_segment(sig, banded, index_dir: str) -> str:
    """One increment = one SEGMENT directory holding both stores:
    bucket rows (12B-ish each, banded join side) and one signature row
    per doc (verify side) — NOT the signature repeated per band, which
    would 16x the index footprint. The segment is invisible until its
    name lands in the manifest (atomic swap), so a crash between the
    two store writes — or mid-write — can never publish bucket rows
    whose verify-side signatures are missing (the old in-place parquet
    append could, silently dropping those pairs at verify). Cluster
    bucket rows by band before the partitioned write: without it every
    shuffle partition writes a sliver into every band dir (bands x
    partitions small files — measured 512 at local defaults); at
    archive scale raise parallelism with a (band, bh-range)
    repartition — layout and manifest are unchanged."""
    import uuid as _uuid

    seg = f"seg-{_uuid.uuid4().hex[:12]}"
    banded.select("_id", "band", "bh").repartition(F.col("band")).write.mode(
        "overwrite"
    ).partitionBy("band").parquet(os.path.join(index_dir, seg, "buckets"))
    sig.write.mode("overwrite").parquet(os.path.join(index_dir, seg, "sigs"))
    return seg


def _minhash_store_paths(index_dir: str, m: dict, store: str) -> list[str]:
    segs = m.get("segments")
    if segs is None:
        # pre-segment layout: stores at the index root
        return [os.path.join(index_dir, store)]
    return [os.path.join(index_dir, seg, store) for seg in segs]


def append_minhash_index(df: DataFrame, index_dir: str, text_col: str = "text") -> None:
    """Add an increment's signatures to the index (after its pairs have
    been harvested) so the NEXT increment dedups against it too. The
    increment lands as a fresh SEGMENT committed by the manifest swap:
    both stores are fully written before anything becomes visible, so
    a crash leaves an invisible orphan dir, never a half-applied
    increment. History is never rewritten. The swap is a single-winner
    CAS commit: a misconfigured second appender (or a compaction racing
    the stream) raises ConcurrentIndexSwapError and leaves its segment
    an orphan for GC, instead of last-win overwriting the other
    writer's manifest — same hardlink-O_EXCL substrate as the merge
    table's snapshot log (storage/cas.py)."""
    m, base = _read_minhash_manifest_versioned(index_dir)
    if m.get("kind") != "minhash":
        raise ValueError(f"{index_dir} is not a minhash signature index")
    sig, banded = _minhash_banded_sig(
        df, m["id_col"], text_col, m["n"], m["num_hashes"], m["bands"], m["seed"]
    )
    seg = _write_minhash_segment(sig, banded, index_dir)
    segs = m.get("segments")
    if segs is None:
        # pre-segment index: keep serving the root stores alongside
        segs = ["."]
        m["segments"] = segs
    _cas_swap_minhash_manifest(index_dir, dict(m, segments=segs + [seg]), base)


def start_dedup_stream(
    stream: DataFrame,
    index_dir: str,
    pairs_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    verify_jaccard: float | None = 0.5,
    available_now: bool = False,
):
    """Continuous near-dup detection for a document ingest stream —
    the online face of the incremental index: each micro-batch is
    deduped against the ENTIRE indexed archive plus itself
    (:func:`incremental_minhash_pairs` — archive text never re-read,
    cost O(batch × bands + matched buckets) per batch), its pairs
    appended to ``pairs_dir`` as parquet, and its own signatures
    committed to the index (:func:`append_minhash_index`) so every
    LATER batch dedups against it too; the two writes run concurrently
    (the pairs plan pins its manifest snapshot before the append's CAS
    swap, so batch wall-clock is their max, not their sum).

    Effectively-once: a batch re-delivered after a sink crash re-emits
    the same pair rows (downstream consumers dedupe on (id_a, id_b) if
    exact-once matters) and re-appends a segment with identical
    signature rows — harmless to correctness (the candidate join is
    distinct, the verify side takes first-per-id) and collapsed by the
    next :func:`compact_minhash_index`. Prefer running the stream as
    the index's only writer with compaction in the same scheduler
    slot; since round 10 a misconfigured concurrent writer is no
    longer SILENT — the CAS manifest swap makes one side's batch fail
    loudly with ConcurrentIndexSwapError instead of last-win dropping
    a segment. Requires the index to exist (bootstrap the archive with
    :func:`write_minhash_index`)."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        # pin FIRST, then probe emptiness on the pinned frame: the
        # take(1)-before-checkpoint order scanned the micro-batch
        # source twice per batch (measured 2x numInputRows in the
        # round-10 per-batch report) — the checkpoint is the single
        # source read, consumed by the guard, the pair harvest and
        # the signature append alike
        batch_df = batch_df.localCheckpoint()
        try:
            if not batch_df.take(1):
                return
            # scope the per-batch signature caches: a continuous stream
            # would otherwise register one evict-only cached frame per
            # batch forever (the long-session failure
            # signature_cache_scope exists for)
            with signature_cache_scope():
                # Build the pairs plan FIRST (pins the current manifest's
                # segment paths and caches the batch signatures), then run
                # the two writes CONCURRENTLY (guide §2.6): they touch
                # disjoint locations (pairs dir vs a fresh invisible
                # segment dir), the append's CAS swap cannot redirect the
                # pinned pairs plan, and the append reuses the cached
                # signature frame. Per-batch wall-clock is max(pair
                # harvest, segment append) instead of their sum. Crash
                # states are the same set re-delivery already tolerates:
                # duplicate pair rows and/or a duplicate segment, both
                # documented harmless above.
                pairs_df = incremental_minhash_pairs(
                    batch_df, index_dir, text_col, verify_jaccard
                )
                from concurrent.futures import ThreadPoolExecutor

                with ThreadPoolExecutor(max_workers=2) as pool:
                    fa = pool.submit(
                        lambda: pairs_df.write.mode("append").parquet(pairs_dir)
                    )
                    fb = pool.submit(
                        append_minhash_index, batch_df, index_dir, text_col
                    )
                    fa.result()
                    fb.result()
        finally:
            # free the batch pin NOW: on a continuous stream the async
            # ContextCleaner lags batches behind, accumulating one dead
            # checkpoint per micro-batch in executor storage
            release_local_checkpoint(batch_df)

    writer = (
        stream.writeStream.outputMode("append")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def compact_minhash_index(
    spark,
    index_dir: str,
    retain_seconds: float = 3600.0,
) -> dict:
    """Rewrite all committed segments into ONE fresh segment and swap
    the manifest — the maintenance pass for an index grown by many
    increments (readers union one frame per segment, so hundreds of
    daily segments mean hundreds of scan roots and small files; after
    compaction they read one). Same crash discipline as every other
    writer here: the new segment is invisible until the swap, and a
    crash leaves the old manifest serving the old segments.

    Also reclaims segment dirs referenced by NO manifest (crashed
    appends, superseded compactions) once idle longer than
    ``retain_seconds`` — the grace window keeps in-flight readers that
    resolved paths from the previous manifest alive."""
    import uuid as _uuid

    m, base = _read_minhash_manifest_versioned(index_dir)
    if m.get("kind") != "minhash":
        raise ValueError(f"{index_dir} is not a minhash signature index")
    old_segs = m.get("segments")
    compacted = None
    if old_segs is not None and len(old_segs) > 1:
        from functools import reduce as _reduce

        # distinct/first-per-id: a re-delivered streaming batch
        # (start_dedup_stream crash replay) appends a duplicate
        # segment — harmless to reads, collapsed here for good
        buckets = _reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(p)
                for p in _minhash_store_paths(index_dir, m, "buckets")
            ],
        ).distinct()
        # first-per-id is only safe when duplicate _ids carry IDENTICAL
        # signatures (the crash-replay case). A mutated re-ingest would
        # leave bucket rows whose verify-side signature mismatches —
        # silently wrong pairs — so conflicting sigs fail LOUDLY here.
        sigs_all = _reduce(
            DataFrame.unionByName,
            [
                spark.read.parquet(p)
                for p in _minhash_store_paths(index_dir, m, "sigs")
            ],
        )
        agg = sigs_all.groupBy("_id").agg(
            F.first("sig").alias("sig"),
            F.count_distinct(F.to_json(F.struct("sig"))).alias("_nsig"),
        ).persist()
        conflicts = agg.filter(F.col("_nsig") > 1).select("_id").limit(5).collect()
        if conflicts:
            agg.unpersist()
            raise ValueError(
                "compact_minhash_index: conflicting signatures for _ids "
                f"{[r['_id'] for r in conflicts]} — re-ingesting mutated "
                "documents violates the appender contract (same _id must "
                "keep the same text); rebuild the index instead"
            )
        sigs = agg.drop("_nsig")
        seg = f"seg-{_uuid.uuid4().hex[:12]}"
        buckets.repartition(F.col("band")).write.mode("overwrite").partitionBy(
            "band"
        ).parquet(os.path.join(index_dir, seg, "buckets"))
        sigs.write.mode("overwrite").parquet(os.path.join(index_dir, seg, "sigs"))
        agg.unpersist()
        # single-winner swap: an append that committed between our read
        # and this claim wins, and the compaction raises rather than
        # silently dropping that increment's segment from the list
        _cas_swap_minhash_manifest(index_dir, dict(m, segments=[seg]), base)
        m = _read_minhash_manifest(index_dir)
        compacted = seg
    live = set(m.get("segments") or [])
    removed = _reap_orphan_segments(index_dir, live, retain_seconds)
    return {
        "segments": sorted(live),
        "compacted_into": compacted,
        "removed": sorted(removed),
    }


def _reap_orphan_segments(
    index_dir: str, live: set, retain_seconds: float
) -> list:
    """Remove segment dirs referenced by NO manifest (crashed or
    CAS-losing appends, superseded compactions) once idle longer than
    ``retain_seconds`` — the grace window keeps both in-flight readers
    that resolved paths from a previous manifest and an in-flight
    append that has not committed yet alive. O(orphans), no data read
    — callable standalone (maintenance) or from compaction."""
    import shutil
    import time

    now = time.time()
    removed = []
    for name in os.listdir(index_dir):
        path = os.path.join(index_dir, name)
        if not (name.startswith("seg-") and os.path.isdir(path)) or name in live:
            continue
        newest = os.path.getmtime(path)
        for root, _dirs, files in os.walk(path):
            for f in files:
                try:
                    newest = max(newest, os.path.getmtime(os.path.join(root, f)))
                except OSError:
                    pass
        if now - newest > retain_seconds:
            shutil.rmtree(path, ignore_errors=True)
            removed.append(name)
    return removed


# Alias kept for the tests/callers that adopted it in round 10; the
# versioned-swap machinery itself is shared engine substrate now
# (storage/cas.py — the IVF index uses the same core).
from ..storage.cas import ConcurrentManifestSwapError as ConcurrentIndexSwapError  # noqa: E402


def _read_minhash_manifest_versioned(index_dir: str) -> tuple[dict, int]:
    """(manifest, version): the shared versioned read
    (storage/cas.py:read_versioned_manifest) with ``manifest.json`` as
    the legacy pointer. Version 0 = pre-CAS index or empty dir."""
    from ..storage.cas import read_versioned_manifest

    from .similarity import _read_ivf_manifest

    return read_versioned_manifest(index_dir, _read_ivf_manifest)


def _cas_swap_minhash_manifest(
    index_dir: str, manifest: dict, base_version: int
) -> int:
    """Single-winner signature-index manifest commit — the shared CAS
    swap (storage/cas.py:cas_swap_manifest); a racing appender or
    compactor raises instead of last-win overwriting the other side's
    segment list."""
    from ..storage.cas import cas_swap_manifest

    from .similarity import _write_ivf_manifest

    return cas_swap_manifest(
        index_dir, manifest, base_version, _write_ivf_manifest,
        what="signature-index",
    )


def _read_minhash_manifest(index_dir: str) -> dict:
    m, _v = _read_minhash_manifest_versioned(index_dir)
    if m.get("kind") != "minhash":
        raise ValueError(f"{index_dir} is not a minhash signature index")
    return m


def incremental_minhash_pairs(
    new_docs: DataFrame,
    index_dir: str,
    text_col: str = "text",
    verify_jaccard: float | None = 0.5,
) -> DataFrame:
    """Near-dup candidates of an INCREMENT against the indexed archive
    plus within the increment itself, with the same signature-agreement
    verify as minhash_lsh_pairs. Cost: shingle the increment only, one
    (band, bucket) join against stored signature rows — O(increment x
    bands + matched buckets), independent of archive text size. Pair
    ids are normalized id_a < id_b across both sides. History-history
    pairs are NOT re-emitted (they were harvested when their batches
    arrived — the standard incremental-dedup contract)."""
    m = _read_minhash_manifest(index_dir)
    num_hashes = m["num_hashes"]
    sig_new, banded_new = _minhash_banded_sig(
        new_docs, m["id_col"], text_col, m["n"], num_hashes, m["bands"], m["seed"]
    )
    spark = new_docs.sparkSession
    # One read per segment root, unioned: the band=N partition dirs sit
    # under differing seg-* prefixes, which multi-path partition
    # discovery rejects as conflicting structures. Segment counts stay
    # small (one per increment); a grown index gets compacted by
    # rewriting into one segment, not by widening this union.
    from functools import reduce as _reduce

    hist_buckets = _reduce(
        DataFrame.unionByName,
        [
            spark.read.parquet(p)
            for p in _minhash_store_paths(index_dir, m, "buckets")
        ],
    )
    # ONE candidate join, increment side BROADCAST: the other side is
    # (increment ∪ archive) bucket rows scanned in place, so the
    # archive is never shuffled OR broadcast — per-batch cost stays
    # O(batch × bands + matched buckets) at any archive size (the old
    # two-join form let the planner broadcast the ARCHIVE buckets,
    # which is the unbounded side). new-new pairs surface from both
    # sides of the join and collapse in the same distinct the old
    # cross ∪ within union needed anyway; new-hist pairs appear once
    # per shared bucket exactly as before; hist-hist pairs cannot
    # appear (the build side is increment-only) — identical pair set.
    nb = banded_new.select("_id", "band", "bh")
    other = nb.unionByName(hist_buckets.select("_id", "band", "bh")).alias("ob")
    cand = (
        F.broadcast(nb.alias("nb"))
        .join(
            other,
            (F.col("nb.band") == F.col("ob.band"))
            & (F.col("nb.bh") == F.col("ob.bh"))
            & (F.col("nb._id") != F.col("ob._id")),
        )
        .select(
            F.least(F.col("nb._id"), F.col("ob._id")).alias("id_a"),
            F.greatest(F.col("nb._id"), F.col("ob._id")).alias("id_b"),
        )
        .distinct()
    )
    if verify_jaccard is None:
        return cand
    # Verify side restricted to CANDIDATE ids via a broadcast semi-join
    # before the dedupe aggregate: the old form pushed the ENTIRE
    # archive's signatures through union + groupBy-first + broadcast —
    # twice (once per join side) — every batch, i.e. O(archive) shuffle
    # work per increment. Candidate ids are O(matched buckets), so both
    # the dedupe and the two verify joins now touch O(candidates) rows;
    # the archive signature store is scanned once, never shuffled.
    # first-per-id semantics unchanged (duplicate _ids carry identical
    # sigs by the appender contract).
    cand = _scoped_cache(cand)
    cand_ids = cand.select(F.col("id_a").alias("_id")).unionByName(
        cand.select(F.col("id_b").alias("_id"))
    )
    hist_sigs = spark.read.parquet(*_minhash_store_paths(index_dir, m, "sigs"))
    all_sigs = (
        sig_new.union(hist_sigs.select("_id", "sig"))
        .join(F.broadcast(cand_ids), "_id", "leftsemi")
        .groupBy("_id")
        .agg(F.first("sig").alias("sig"))
    )
    all_sigs = _scoped_cache(all_sigs)
    sa = all_sigs.withColumnsRenamed({"_id": "id_a", "sig": "sig_a"})
    sb = all_sigs.withColumnsRenamed({"_id": "id_b", "sig": "sig_b"})
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "est_jaccard",
            F.size(
                F.filter(
                    F.zip_with(F.col("sig_a"), F.col("sig_b"), lambda x, y: x == y),
                    lambda mch: mch,
                )
            )
            / F.lit(num_hashes),
        )
        .filter(F.col("est_jaccard") >= verify_jaccard)
        .select("id_a", "id_b", "est_jaccard")
    )


def simhash_col(
    text_col: str = "text", bits: int = 64, hash_fn: str = "xxhash64"
) -> Column:
    """64-bit SimHash: per-token xxhash64, sum of +1/-1 per bit, sign ->
    bit. Built as one SQL higher-order expression (the SQL surface
    allows column-valued shift amounts, the Python ``shiftleft`` API
    does not). Single fold over the token hashes accumulating the
    64-bit vote vector, then one pass assembling the sign bits — the
    hash array is the fold INPUT, evaluated once per row (inlining it
    in the per-bit lambda re-hashed every token 64x).

    ``hash_fn="md5"``: engine-neutral token hash (60-bit md5 hex
    prefix — bits 60-63 of the fingerprint are then constant-zero,
    harmless to Hamming distances and banding) so any SQL engine
    replays the fingerprints exactly; used by the hash-verified
    registry entry. xxhash64 stays the library default."""
    if hash_fn == "md5":
        token_hash = "cast(conv(substring(md5(t), 1, 15), 16, 10) as bigint)"
    elif hash_fn == "xxhash64":
        token_hash = "xxhash64(t)"
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    hashes = f"transform(array_distinct(split(lower({text_col}), '\\\\s+')), t -> {token_hash})"
    return F.expr(
        f"""
        aggregate(
          zip_with(
            aggregate({hashes},
              array_repeat(0, {bits}),
              (acc, h) -> zip_with(acc,
                transform(sequence(0, {bits - 1}),
                          i -> if((shiftrightunsigned(h, i) & 1) = 1, 1, -1)),
                (x, y) -> x + y)),
            sequence(0, {bits - 1}),
            (c, i) -> if(c > 0, shiftleft(cast(1 as bigint), i), cast(0 as bigint))),
          cast(0 as bigint), (acc, v) -> acc | v)
        """
    )


def exact_hamming_pairs_bounded(
    sig_df: DataFrame,
    max_hamming: int,
    id_col: str = "_id",
    sig_col: str = "sim",
    max_rows: int = 10_000,
) -> DataFrame:
    """Exact all-pairs Hamming <= ``max_hamming`` over a SIZE-BOUNDED
    signature frame (recall-probe ground truth): one bounded collect of
    (id, 64-bit sig) rows, a numpy pairwise XOR-popcount, and only the
    qualifying (id_a, id_b) pairs re-enter Spark. Signature COMPUTATION
    stays distributed — only the O(probe) id/sig rows ride the driver,
    same bounded-data rationale as similarity.exact_cosine_pairs_bounded.
    ``max_rows`` turns unbounded misuse into a loud error."""
    import numpy as np

    rows = (
        sig_df.select(F.col(id_col), F.col(sig_col))
        # null sigs/ids never pair in the join form (bit_count(null) is
        # null); drop them here too instead of crashing the int64 view
        .filter(F.col(sig_col).isNotNull() & F.col(id_col).isNotNull())
        .limit(max_rows + 1)
        .collect()
    )
    if len(rows) > max_rows:
        raise ValueError(
            f"exact_hamming_pairs_bounded: corpus exceeds max_rows={max_rows}; "
            "use the banded join for unbounded inputs"
        )
    spark = sig_df.sparkSession
    schema = f"id_a {dict(sig_df.dtypes)[id_col]}, id_b {dict(sig_df.dtypes)[id_col]}"
    if len(rows) < 2:
        return spark.createDataFrame([], schema)
    ids = [r[0] for r in rows]
    sig = np.asarray([r[1] for r in rows], dtype=np.int64).view(np.uint64)
    lut = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)
    # Blocked pairwise popcount: the full n x n x 8 byte tensor is
    # O(n^2) (800 MB at the 10k cap); 1024-row blocks keep peak memory
    # at O(block x n) with identical results.
    pairs = []
    block = 1024
    n = len(ids)
    for lo in range(0, n, block):
        x = (sig[lo : lo + block, None] ^ sig[None, :]).view(np.uint8)
        ham = lut[x.reshape(x.shape[0], n, 8)].sum(axis=2)
        ia, ib = np.where(ham <= max_hamming)
        for a, b in zip((ia + lo).tolist(), ib.tolist()):
            if a < b:
                pairs.append(
                    (ids[a], ids[b]) if ids[a] < ids[b] else (ids[b], ids[a])
                )
    return spark.createDataFrame(pairs, schema)


def simhash_near_dup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    chunks: int = 4,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Near-dup pairs at Hamming distance <= ``max_hamming`` via the
    pigeonhole banding trick: split 64 bits into ``chunks`` 16-bit
    chunks; any pair within distance < chunks must agree on >= 1 chunk,
    so exact-match joins per chunk find all candidates sub-quadratically.
    ``hash_fn="md5"`` makes the fingerprints engine-neutral (see
    ``simhash_col``) for oracle replay; xxhash64 is the default."""
    if not 0 <= max_hamming < 64:
        raise ValueError(f"max_hamming must be in [0, 64), got {max_hamming}")
    if max_hamming >= chunks:
        # The pigeonhole guarantee (any pair within distance < chunks
        # shares a chunk) breaks when max_hamming >= chunks: a pair
        # differing once per chunk would be silently missed. Auto-raise
        # to the smallest divisor of 64 that restores the guarantee —
        # more candidate volume, never lost recall.
        chunks = next(c for c in (1, 2, 4, 8, 16, 32, 64) if c > max_hamming)
    sim = _scoped_cache(
        _spread(df).select(
            F.col(id_col).alias("_id"),
            simhash_col(text_col, hash_fn=hash_fn).alias("sim"),
        )
    )  # reused per chunk-join; same lifecycle note as the MinHash
    # signature cache above (signature_cache_scope / clearCache)
    width = 64 // chunks
    banded = sim.select(
        "_id",
        "sim",
        F.expr(
            f"explode(transform(sequence(0, {chunks - 1}), i -> struct("
            f"i AS chunk, shiftrightunsigned(sim, i * {width}) "
            f"& {(1 << width) - 1}L AS ch)))"
        ).alias("c"),
    ).select("_id", "sim", "c.chunk", "c.ch")
    a = banded.alias("a")
    b = banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.ch") == F.col("b.ch"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a.sim").alias("sim_a"),
            F.col("b.sim").alias("sim_b"),
        )
        .distinct()
    )
    return (
        cand.withColumn("hamming", F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def _shard_oversized_clusters(
    base: DataFrame, max_cluster_size: int, seed: int = 7
) -> DataFrame:
    """Replace the join key of oversized clusters with a sharded key so
    candidate volume stays bounded no matter what the upstream
    clusterer produced. ``base`` is semantic_dedup_pairs' internal
    (id, cluster, q, sq) frame; adds ``_jkey`` (string).

    Two levels, both map-only after one size aggregation each:

    1. **Similarity-aware subcells** — rows of oversized clusters are
       assigned to the nearest of ``ceil(max_oversized /
       max_cluster_size)`` fine centroids (deterministic seeded sample
       over the oversized rows, vectorized argmax). Near-duplicates
       have cosine >= tau, so they overwhelmingly share a fine cell:
       most true pairs survive the split.
    2. **Hash shards** — a (cluster, subcell) cell STILL above the cap
       (the degenerate all-identical-vector cluster, which no
       similarity split can separate) is xxhash-sharded into
       ``ceil(n/max)`` shards. Within such a cell a true pair survives
       with probability ~1/n_shards — the recall price of the volume
       contract, the same trade SemDeDup (Abbas et al. 2023) accepts
       when sharding its largest cluster; for the template/boilerplate
       mega-groups this targets, within-shard pairs still mark the
       bulk of members as dups."""
    from .similarity import _centroid_cells_col, _sample_centroids

    sizes = base.groupBy("cluster").agg(F.count(F.lit(1)).alias("_n"))
    over = sizes.filter(F.col("_n") > max_cluster_size)
    stats = over.agg(F.max("_n").alias("m")).collect()[0]
    plain_key = F.col("cluster").cast("string")
    if stats.m is None:
        return base.withColumn("_jkey", plain_key)
    n_fine = -(-int(stats.m) // max_cluster_size)
    marked = base.join(
        F.broadcast(over.select("cluster", F.lit(True).alias("_over"))),
        "cluster",
        "left",
    )
    # SPLIT-UNION, not a F.when() mask over the whole corpus: a masked
    # pandas UDF still Arrow-ships and scores EVERY row (when() does
    # not prune vectorized UDF evaluation), turning a one-mega-cluster
    # guard into a full-corpus matmul. Filtering first runs the
    # assignment on oversized rows only; compliant rows never leave
    # the JVM. unionByName keeps it shuffle-free.
    compliant = marked.filter(F.col("_over").isNull()).withColumn(
        "_jkey", F.concat(F.lit("p:"), plain_key)
    )
    over_rows = marked.filter("_over")
    cents = _sample_centroids(
        over_rows.filter(F.col("q").isNotNull()).select("id", F.col("q").alias("v")),
        n_fine, "id", "v", seed,
    )
    subbed = over_rows.withColumn(
        "_sub", F.element_at(_centroid_cells_col(F.col("q"), cents, 1), 1)
    )
    cell_sizes = subbed.groupBy("cluster", "_sub").agg(F.count(F.lit(1)).alias("_cn"))
    big = cell_sizes.filter(F.col("_cn") > max_cluster_size).select(
        "cluster", "_sub", F.ceil(F.col("_cn") / max_cluster_size).cast("long").alias("_nsh")
    )
    subbed = subbed.join(F.broadcast(big), ["cluster", "_sub"], "left")
    shard = F.coalesce(
        F.pmod(F.xxhash64(F.col("id").cast("string"), F.lit(seed)), F.col("_nsh")),
        F.lit(0),
    )
    # Key namespaces: "p:" for plain clusters, "s:" for sharded ones —
    # without the prefix a compliant cluster literally named "a#0#0"
    # would collide with shard (cluster="a", sub=0, shard=0) and the
    # self-join would pair rows ACROSS distinct clusters. Within the
    # "s:" namespace composite keys are injective: sub and shard are
    # single integers, so right-splitting the two trailing "#" fields
    # recovers (cluster, sub, shard) uniquely.
    sharded = subbed.withColumn(
        "_jkey",
        F.concat(
            F.lit("s:"), plain_key, F.lit("#"),
            F.col("_sub").cast("string"), F.lit("#"), shard.cast("string"),
        ),
    ).drop("_sub", "_nsh")
    return compliant.unionByName(sharded).drop("_over")


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    tau_num: int = 95,
    tau_den: int = 100,
    scale: int = 1000,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023,
    arXiv:2303.09540): restrict the pairwise cosine search to rows in
    the same cluster (the clusterer's assignment arrives in
    ``cluster_col`` — a k-means cell id from ``assign_cells`` or any
    upstream label), then emit (id_a, id_b) pairs with
    cos(a, b) >= tau_num/tau_den and id_a < id_b.

    Quantized-integer decision: embeddings are quantized to
    round(x * scale) longs (the int8/PQ production trick), so dot and
    norms are exact integer sums and the threshold test
    ``dot^2 * tau_den^2 >= tau_num^2 * |a|^2 |b|^2`` (with dot >= 0)
    uses only exact integer multiplies — bit-reproducible in any
    engine, no FP summation-order hazard. The cross-multiplied squares
    overflow int64 long before the int64 dot itself does (dot ~5e8
    already breaks dot^2*tau_den^2), so the comparison runs in
    decimal(38,0) (HUGEINT in the DuckDB oracle): exact for any |dot|
    up to ~1e17, i.e. any vector whose quantized components fit int32.

    Shape at 100 TB: the self-join shuffles on the cluster id only —
    candidate volume is sum over clusters of C(n_c, 2), the SemDeDup
    contract (clusters are sized ~corpus/k). Vectors travel once into
    the join; the all-pairs explosion never happens across clusters.
    With ``max_cluster_size`` set, the operator ENFORCES that contract
    against a skewed upstream clusterer: oversized clusters are split
    by _shard_oversized_clusters (similarity-aware subcells, then hash
    shards for cells no similarity split can separate) before the
    self-join, bounding per-key candidate volume at the documented
    recall cost (see its docstring). Default None preserves exact
    within-cluster semantics for compliant clusterers."""
    q = F.transform(
        F.col(vec_col), lambda x: F.round(x.cast("double") * scale).cast("long")
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(cluster_col).alias("cluster"),
        q.alias("q"),
    )
    sq_norm = F.aggregate(
        F.transform(F.col("q"), lambda v: v * v), F.lit(0).cast("long"), lambda a, b: a + b
    )
    base = base.withColumn("sq", sq_norm)
    if max_cluster_size is not None:
        base = _shard_oversized_clusters(base, max_cluster_size)
    else:
        base = base.withColumn("_jkey", F.col("cluster").cast("string"))
    a = base.select(
        F.col("id").alias("id_a"), F.col("cluster"), F.col("_jkey"),
        F.col("q").alias("qa"), F.col("sq").alias("sqa"),
    )
    b = base.select(
        F.col("id").alias("id_b"), F.col("_jkey"),
        F.col("q").alias("qb"), F.col("sq").alias("sqb"),
    )
    pairs = a.join(b, "_jkey").filter(F.col("id_a") < F.col("id_b"))
    dot = F.aggregate(
        F.zip_with(F.col("qa"), F.col("qb"), lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )
    pairs = pairs.withColumn("dot", dot)
    dec = "decimal(38,0)"
    d = F.col("dot").cast(dec)
    # sq > 0 guards: a zero-quantized vector has sq=0, degenerating the
    # cross-multiplied test to 0 >= 0 — it would pair with EVERY
    # cluster neighbor and semantic_dedup would drop the whole cluster
    # as its dups. Zero-norm cosine is 0 (< tau) by the module's own
    # cosine_similarity convention.
    cond = (
        (F.col("sqa") > 0)
        & (F.col("sqb") > 0)
        & (F.col("dot") >= 0)
        & (
            d * d * F.lit(tau_den * tau_den).cast(dec)
            >= F.lit(tau_num * tau_num).cast(dec)
            * F.col("sqa").cast(dec)
            * F.col("sqb").cast(dec)
        )
    )
    return pairs.filter(cond).select("cluster", "id_a", "id_b", "dot")


def semantic_dedup(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    tau_num: int = 95,
    tau_den: int = 100,
    scale: int = 1000,
    max_cluster_size: int | None = None,
) -> DataFrame:
    """SemDeDup keep/drop decision: a row is dropped when a LOWER-id
    row in its cluster sits within the cosine threshold (the paper
    keeps one representative per semantic duplicate set; lowest id is
    the deterministic choice). Returns (id, cluster, is_dup, dup_of) —
    ``dup_of`` is the smallest lower-id neighbor for audit.

    One aggregation over the pair stream (min per id_b) + one left
    join back to the corpus: ids-only traffic after the pair stage."""
    pairs = semantic_dedup_pairs(
        df, id_col, vec_col, cluster_col, tau_num, tau_den, scale,
        max_cluster_size=max_cluster_size,
    )
    dup_of = pairs.groupBy(F.col("id_b").alias("id")).agg(
        F.min("id_a").alias("dup_of")
    )
    base = df.select(F.col(id_col).alias("id"), F.col(cluster_col).alias("cluster"))
    return (
        base.join(dup_of, "id", "left")
        .withColumn("is_dup", F.col("dup_of").isNotNull())
        .select("id", "cluster", "is_dup", "dup_of")
    )


def describe_minhash_index(
    spark, index_dir: str, count_docs: bool = True
) -> dict:
    """Health card for a persisted signature index — what a maintenance
    scheduler reads to decide WHEN to run compaction (the
    describe_store / describe_ivf_index analog): committed segment
    count (each is one more scan root a reader unions), indexed doc
    count, manifest version, and how many orphan segment dirs (crashed
    or CAS-losing appends) await the grace reaper.

    ``count_docs=False`` skips the doc count (a distinct over every
    sigs store — the only part of the card that reads data); the
    manifest/filesystem fields alone decide compaction, so the
    maintenance path uses the cheap form."""
    m, version = _read_minhash_manifest_versioned(index_dir)
    if m.get("kind") != "minhash":
        raise ValueError(f"{index_dir} is not a minhash signature index")
    segs = m.get("segments") or []
    from functools import reduce as _reduce

    n_docs = None
    if count_docs:
        n_docs = 0
        paths = _minhash_store_paths(index_dir, m, "sigs")
        if paths:
            n_docs = _reduce(
                DataFrame.unionByName,
                [spark.read.parquet(p) for p in paths],
            ).select("_id").distinct().count()
    orphans = [
        name
        for name in os.listdir(index_dir)
        if name.startswith("seg-")
        and os.path.isdir(os.path.join(index_dir, name))
        and name not in set(segs)
    ]
    return {
        "index_dir": index_dir,
        "n_segments": len(segs),
        "n_docs": n_docs,
        "manifest_version": version,
        "n_orphan_segments": len(orphans),
        "params": {
            k: m.get(k) for k in ("n", "num_hashes", "bands", "seed", "id_col")
        },
    }


def maintain_minhash_index(
    spark,
    index_dir: str,
    max_segments: int = 8,
    retain_seconds: float = 3600.0,
) -> dict:
    """One-call signature-index maintenance — the scheduler-slot
    composition an incrementally-grown index runs nightly (the
    maintain_table analog for the dedup substrate): describe, compact
    when the committed segment count exceeds ``max_segments`` (readers
    union one frame per segment — hundreds of daily appends mean
    hundreds of scan roots and small files), and reap orphan segment
    dirs past the grace window either way. Compaction carries its own
    safety contracts: identical pairs before/after (pytest-pinned),
    loud failure on conflicting signatures for one _id (a mutated
    re-ingest), and the single-winner CAS manifest swap — a racing
    appender surfaces as ConcurrentIndexSwapError and the index is
    untouched; rerun in the next slot. The compaction REWRITE is gated
    on the segment count alone — orphans only need the O(1) reap, and
    an in-flight append's not-yet-committed segment dir must never
    trigger (or be touched by) a rewrite, only aged ones are removed.
    Doc counting is skipped here (describe_minhash_index(count_docs=
    False)) — it is the only part of the card that reads index data,
    and the compaction decision never needs it."""
    before = describe_minhash_index(spark, index_dir, count_docs=False)
    compacted = None
    removed: list[str] = []
    if before["n_segments"] > max_segments:
        rep = compact_minhash_index(spark, index_dir, retain_seconds=retain_seconds)
        compacted = rep["compacted_into"]
        removed = rep["removed"]
    elif before["n_orphan_segments"]:
        m, _v = _read_minhash_manifest_versioned(index_dir)
        removed = sorted(
            _reap_orphan_segments(
                index_dir, set(m.get("segments") or []), retain_seconds
            )
        )
    after = describe_minhash_index(spark, index_dir, count_docs=False)
    return {
        "before": before,
        "after": after,
        "compacted_into": compacted,
        "removed_orphans": removed,
    }
