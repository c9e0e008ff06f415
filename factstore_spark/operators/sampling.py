"""Dataset curation operators: deterministic splits and group-wise
quality sampling — the selection stage of a training-data pipeline.

Both are pure built-in expressions, map-only or single-window, and
reproducible across engines (bucketing is md5-based, not engine-hash-
based, precisely so an independent oracle can recompute membership).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def split_bucket(key_col: str, n_buckets: int = 100, salt: str = "split") -> Column:
    """Deterministic bucket in [0, n_buckets) from md5(salt || key).

    md5 (not xxhash64/hash): identical in every engine, so membership is
    auditable outside Spark. First 8 hex chars -> int -> mod. Map-only,
    no shuffle; stable under repartitioning and re-runs."""
    hex8 = F.substring(F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 8)
    return F.conv(hex8, 16, 10).cast("long") % n_buckets


def train_test_split(
    df: DataFrame,
    key_col: str,
    test_fraction: float = 0.1,
    n_buckets: int = 100,
    salt: str = "split",
) -> DataFrame:
    """Adds a ``split`` column ('train' | 'test'): rows whose bucket
    falls below ``test_fraction * n_buckets`` are test. Keyed on a
    stable id so the same record NEVER migrates between splits across
    runs or data refreshes (the leakage guard)."""
    # round, not int(): int(0.29*100) == 28 under binary float.
    cutoff = round(test_fraction * n_buckets)
    return df.withColumn(
        "split",
        F.when(split_bucket(key_col, n_buckets, salt) < cutoff, F.lit("test")).otherwise(
            F.lit("train")
        ),
    )


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    key_col: str,
    default_fraction: float = 0.0,
    n_buckets: int = 100,
    salt: str = "strata",
) -> DataFrame:
    """Deterministic stratified sampling: per-stratum keep-fraction via
    md5 bucketing on a stable key. Unlike ``DataFrame.sampleBy`` (RNG
    per partition — irreproducible across engines and re-runs), the
    SAME row set is selected on every run and is auditable by an
    independent engine, which is what dataset curation at 100 TB needs:
    map-only, no shuffle, no RNG state."""
    bucket = split_bucket(key_col, n_buckets, salt)
    cutoff = F.lit(round(default_fraction * n_buckets))
    for value, frac in sorted(fractions.items()):
        cutoff = F.when(
            F.col(strata_col) == value, F.lit(round(frac * n_buckets))
        ).otherwise(cutoff)
    return df.filter(bucket < cutoff)


def upsample_by_weights(
    df: DataFrame,
    strata_col: str,
    weights: dict[str, float],
    key_col: str,
    default_weight: float = 1.0,
    n_buckets: int = 100,
    salt: str = "mix",
) -> DataFrame:
    """Pretraining corpus MIXING with epoch weights > 1: a source with
    weight 2.5 contributes every document twice plus a deterministic
    half of them a third time (floor(w) copies + the md5-bucketed
    fraction for the remainder — same auditable no-RNG contract as
    ``stratified_sample``; weight 0.3 degenerates to plain
    downsampling). Map-only explode: each row becomes ``n_copies``
    rows with a 1-based ``copy`` index (0 copies drops the row), no
    shuffle, reproducible across engines and re-runs. Weights must be
    >= 0: Python's modulo maps a negative fraction to a POSITIVE
    remainder (-0.5 % 1.0 == 0.5), so an unchecked negative weight
    would duplicate half the stratum instead of dropping it."""
    bad = {v: w for v, w in {**weights, "<default>": default_weight}.items() if w < 0}
    if bad:
        raise ValueError(f"upsample_by_weights: negative weights {bad}")
    whole = F.lit(int(default_weight))
    rem_cut = F.lit(round((default_weight % 1.0) * n_buckets))
    for value, w in sorted(weights.items()):
        whole = F.when(F.col(strata_col) == value, F.lit(int(w))).otherwise(whole)
        rem_cut = F.when(
            F.col(strata_col) == value, F.lit(round((w % 1.0) * n_buckets))
        ).otherwise(rem_cut)
    bucket = split_bucket(key_col, n_buckets, salt)
    n_copies = whole + (bucket < rem_cut).cast("int")
    return (
        df.withColumn("_n_copies", n_copies)
        .filter(F.col("_n_copies") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(1), F.col("_n_copies"))))
        .drop("_n_copies")
    )


def contamination_check(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark-contamination detection: flag corpus docs whose
    normalized text fingerprint appears in a benchmark/eval set — the
    decontamination stage every training pipeline runs before the
    benchmark police do. Exact (md5 of lower-cased text); at 100 TB the
    benchmark side is tiny and BROADCAST, so this is a map-only probe
    of the corpus scan, one flag column, no shuffle of the corpus.
    Output: (id, contaminated)."""
    from .text import exact_fp_col

    fp = exact_fp_col(text_col)
    bench_fps = benchmark.select(fp.alias("fp")).distinct()
    return (
        corpus.select(F.col(id_col), fp.alias("fp"))
        .join(F.broadcast(bench_fps).withColumn("contaminated", F.lit(True)), "fp", "left")
        .select(
            id_col,
            F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated"),
        )
    )


def shuffle_shards(
    df: DataFrame,
    n_shards: int = 8,
    seed: str = "epoch0",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic global training-order shuffle WITHOUT a global
    sort: every row gets an order key md5(seed:id); the first 8 hex
    chars assign a shard, and position is a row_number within the shard
    ordered by the full key. Epoch reshuffles are a seed change, not a
    data move.

    Scale shape: one shuffle on the shard key and per-shard parallel
    windows — never a single-partition global ORDER BY. Reading shards
    in (shard, pos) order IS a uniform random permutation of the
    corpus, which is all training ingestion needs. Deterministic and
    engine-reproducible (md5, not an RNG or engine hash). Output:
    (id, shard, pos)."""
    okey = F.md5(F.concat(F.lit(seed), F.lit(":"), F.col(id_col).cast("string")))
    shard = F.conv(F.substring(okey, 1, 8), 16, 10).cast("long") % n_shards
    w = Window.partitionBy("shard").orderBy(F.col("_okey").asc(), F.col(id_col).asc())
    return (
        df.select(F.col(id_col), shard.alias("shard"), okey.alias("_okey"))
        .withColumn("pos", (F.row_number().over(w) - 1).cast("long"))
        .select(id_col, "shard", "pos")
    )


def ngram_contamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_shared: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """N-gram-overlap decontamination (the GPT-3/PaLM-style 13-gram
    check, parameterized): a corpus doc is contaminated when it shares
    >= ``min_shared`` distinct ``n``-token windows with any benchmark
    doc — catching partial/embedded benchmark leakage that the exact
    fingerprint check (``contamination_check``) misses.

    Scale shape: benchmark/eval sets are tiny next to a 100 TB corpus,
    so the benchmark's distinct gram set is BROADCAST and the corpus
    side is a map-only explode + broadcast-hash-semi-probe of the scan
    — the corpus text is never shuffled; only the (rare) hits are, for
    the final per-doc count. Output: (doc_id, n_shared_grams) for
    contaminated docs only."""
    from .dedup import _spread, shingles_col

    grams = shingles_col(text_col, n)
    bench_grams = benchmark.select(F.explode(grams).alias("gram")).distinct()
    hits = (
        _spread(corpus)
        .select(F.col(id_col), F.explode(F.array_distinct(grams)).alias("gram"))
        .join(F.broadcast(bench_grams), "gram")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_shared_grams"))
        .filter(F.col("n_shared_grams") >= min_shared)
    )
    return hits.select(id_col, F.col("n_shared_grams").cast("long").alias("n_shared_grams"))


def pack_sequences(
    df: DataFrame,
    capacity: int = 512,
    n_shards: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab: DataFrame | None = None,
) -> DataFrame:
    """Concat-and-chunk sequence-packing accounting: assign every doc
    to a training-sequence bin of ``capacity`` tokens and report per-bin
    document/token totals — the packing stage that turns a curated
    corpus into fixed-length training sequences.

    Sharded on ``id % n_shards`` BEFORE the running sum: packing needs
    an order, but never a GLOBAL one (sequences are shuffled at
    training time anyway), so the cumulative token count runs inside
    each shard — one shuffle on the shard key, every shard's window in
    parallel, no single-partition global sort at 100 TB. A doc whose
    tokens straddle a boundary opens the next bin (GPT-style
    concat-then-chunk accounting).

    Token accounting: with ``vocab=None``, whitespace token counts (a
    fast proxy). With a ``vocab`` DataFrame (token, token_id — e.g.
    ``text.build_vocab``), TOKEN-EXACT accounting: each in-vocab token
    costs one id, each OOV token falls back to character-level ids
    (len(token) ids — the byte/char-fallback convention of BPE-style
    tokenizers), so bin capacities reflect what a trainer would
    actually pack. The vocab is broadcast and the corpus is never
    shuffled for the lookup (explode + broadcast-hash-join + one
    per-doc partial agg).

    Deterministic and engine-reproducible either way: modulo sharding,
    integer division, rank-deterministic vocab. An independent SQL
    engine recomputes identical bins. Output: (shard, bin, n_docs,
    n_tokens). Token definition is text.tokens_col — ONE definition
    shared with with_token_count/build_vocab, so bin capacities always
    match the token counts every other operator reports."""
    from .text import tokens_col

    toks = tokens_col(text_col)
    if vocab is None:
        per_doc = df.select(
            F.col(id_col).alias("_id"), F.size(toks).alias("n_tok")
        )
    else:
        exploded = df.select(
            F.col(id_col).alias("_id"), F.explode(toks).alias("token")
        )
        mapped = exploded.join(
            F.broadcast(vocab.select("token", "token_id")), "token", "left"
        )
        per_doc = mapped.groupBy("_id").agg(
            F.sum(
                F.when(F.col("token_id").isNotNull(), F.lit(1)).otherwise(
                    F.length("token")
                )
            ).alias("n_tok")
        )
    staged = per_doc.select(
        "_id",
        # md5 bucket, not arithmetic pmod: doc ids may be strings (an
        # implicit cast NULLs the shard non-ANSI — collapsing every row
        # into ONE window partition — or raises under ANSI), and the
        # md5 bucket is the module-wide engine-neutral contract
        split_bucket("_id", n_shards, "pack").alias("shard"),
        "n_tok",
    )
    w = (
        Window.partitionBy("shard")
        .orderBy(F.col("_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    binned = staged.withColumn(
        "bin",
        F.floor(F.coalesce(F.sum("n_tok").over(w), F.lit(0)) / F.lit(capacity)),
    )
    return (
        binned.groupBy("shard", "bin")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("long").alias("n_tokens"),
        )
        .select("shard", "bin", "n_docs", "n_tokens")
    )


FUNNEL_STAGES = ("all", "lang", "quality", "dedup", "length")


def curation_funnel(
    df: DataFrame,
    lang: str = "en",
    quality_threshold: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 5000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The standard curation funnel — language ID, quality floor,
    exact-dedup keep-first, token-length bounds — applied sequentially
    with per-stage survivor counts: the yield report every
    training-data pipeline publishes next to its corpus.

    Single-pass shape: the language/quality/token signals are ONE
    projection over the scan (no per-stage re-reads); the only shuffle
    is the dedup window over the stage-2 survivors (keep-first =
    row_number per content fingerprint, doc-id order). Output:
    (stage, stage_name, n) — one row per stage, monotonically
    non-increasing n."""
    from .text import exact_fp_col, with_lang_id, with_quality_score

    flagged = with_quality_score(with_lang_id(df, text_col), text_col).select(
        F.col(id_col).alias("_id"),
        (F.col("pred_lang") == lang).alias("lang_ok"),
        (F.col("quality_score") >= quality_threshold).alias("q_ok"),
        F.col("n_tokens"),
        exact_fp_col(text_col).alias("_fp"),
    )
    base = flagged.agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum(F.col("lang_ok").cast("long")).alias("n_lang"),
        F.sum((F.col("lang_ok") & F.col("q_ok")).cast("long")).alias("n_quality"),
    )
    survivors = flagged.filter(F.col("lang_ok") & F.col("q_ok"))
    w = Window.partitionBy("_fp").orderBy(F.col("_id").asc())
    deduped = survivors.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") == 1
    )
    tail = deduped.agg(
        F.count(F.lit(1)).alias("n_dedup"),
        F.sum(
            (
                (F.col("n_tokens") >= min_tokens)
                & (F.col("n_tokens") <= max_tokens)
            ).cast("long")
        ).alias("n_length"),
    )
    wide = base.crossJoin(tail)
    stages = [
        wide.select(
            F.lit(i).cast("long").alias("stage"),
            F.lit(name).alias("stage_name"),
            F.coalesce(F.col(f"n_{name}"), F.lit(0)).cast("long").alias("n"),
        )
        for i, name in enumerate(FUNNEL_STAGES)
    ]
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out


def top_k_per_group(
    df: DataFrame,
    group_col: str,
    order_col: str,
    k: int,
    id_col: str,
    descending: bool = True,
) -> DataFrame:
    """Keep the k best rows per group (quality sampling / per-source
    caps). One shuffle on the group key; rank ties broken by id for
    full determinism."""
    order = F.col(order_col).desc() if descending else F.col(order_col).asc()
    w = Window.partitionBy(group_col).orderBy(order, F.col(id_col).asc())
    return (
        df.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") <= k)
        .drop("_rk")
    )


def weighted_priority_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sample of k rows without replacement:
    each row draws a reproducible uniform u from md5(salt || key) and
    gets priority u / weight; the k smallest priorities win (heavier
    rows draw proportionally smaller priorities — the uniform/weight
    priority scheme, the integer-friendly cousin of Efraimidis-
    Spirakis A-ES exponential clocks).

    Determinism across engines: u is the first 60 bits of md5 (exact
    integer in both engines), the only FP op is one correctly-rounded
    IEEE division — no log/exp, whose last-ulp behavior differs
    between libm implementations. Same input -> same sample, in Spark
    or in the DuckDB oracle, on every run.

    Shape at 100 TB: map-only priority assignment, then orderBy+limit
    fuses into TakeOrderedAndProject — a per-partition top-k plus a
    k-row driver merge, never a global sort. Ties (u collisions) break
    by key ascending.

    Weights must be positive to mean anything; rows with weight <= 0
    are EXCLUDED up front (selection probability proportional to a
    non-positive weight is zero). Without the guard a single w=0 row
    either fails the job (ANSI division) or — worse — sorts NULL/inf
    first and wins unconditionally. NULL keys are excluded for the
    same reason: a NULL key makes the md5 (hence the priority) NULL,
    and Spark's ASC default of NULLS FIRST would hand those rows
    sample slots unconditionally (DuckDB's NULLS LAST default would
    instead drop them — so the filter is also what keeps the two
    engines in agreement)."""
    hex15 = F.substring(
        F.md5(F.concat(F.lit(salt), F.col(key_col).cast("string"))), 1, 15
    )
    u = F.conv(hex15, 16, 10).cast("double")
    pri = u / F.col(weight_col).cast("double")
    return (
        df.filter(F.col(weight_col) > 0)
        .filter(F.col(key_col).isNotNull())
        .withColumn("priority", pri)
        .orderBy(F.col("priority").asc(), F.col(key_col).asc())
        .limit(k)
    )


def cap_per_group(
    df: DataFrame,
    group_col: str,
    n: int,
    order_cols,
    num_partitions: int = 32,
) -> DataFrame:
    """Source balancing: keep at most ``n`` rows per group, chosen by
    ``order_cols`` (e.g. longest documents first) — the per-domain cap
    every web-corpus curation applies so one crawl host cannot dominate
    the mixture.

    Ranks come from operators/ranking.py:with_grouped_rank, NOT a
    Window.partitionBy(group): source/domain cardinality is routinely
    tiny next to the corpus (a handful of crawls over billions of
    docs), and the plain window would sort each entire group in one
    task. The grouped rank range-partitions on (group, order), so
    parallelism is partitions x groups regardless of group size.
    ``order_cols`` must total-order within a group (append a unique id
    as tie-break)."""
    from .ranking import with_grouped_rank

    ranked = with_grouped_rank(
        df, [group_col], list(order_cols), rank_col="_r", num_partitions=num_partitions
    )
    return ranked.filter(F.col("_r") <= n).drop("_r")


def _shard_stats_agg(df, id_col: str):
    """The ONE stats aggregation both the writer's manifest and the
    validator compute — they must stay bit-identical or validation
    spuriously reports corruption on intact files."""
    return df.groupBy("shard").agg(
        F.count(F.lit(1)).cast("long").alias("rows"),
        F.sum(
            F.xxhash64(
                F.col(id_col).cast("string"), F.col("pos").cast("string")
            ).cast("decimal(38,0)")
        ).alias("content_hash"),
    )


def write_training_shards(
    df: DataFrame,
    path: str,
    n_shards: int = 8,
    seed: str = "epoch0",
    id_col: str = "doc_id",
) -> dict:
    """Materialize the :func:`shuffle_shards` permutation as ONE sorted
    parquet file per shard plus an integrity manifest — the physical
    artifact a training loader streams ((shard, pos) order IS the
    epoch's uniform permutation; an epoch reshuffle is a new seed and a
    rewrite, never a comparison of row orders between engines).

    Layout: ``path/v=<token>/shard=<k>/part-*.parquet`` (exactly one
    file per non-empty shard: every row of a shard hashes to the same
    task, so the partitioned write emits a single sorted file per shard
    dir) and ``path/manifest.json`` naming the live version plus
    per-shard row counts and an order-independent content hash (sum of
    per-row xxhash64 over (id, pos) in decimal(38,0) — no overflow, no
    float). CRASH SAFETY, same discipline as the rollup/tag-index
    manifests: each write lands in a FRESH version dir and the atomic
    manifest rename is the only publish step — a crash mid-write leaves
    the previous epoch fully readable (an in-place overwrite would have
    destroyed it at job start). Returns the manifest dict.

    Scale shape: one shuffle keyed by shard + per-shard window (the
    shuffle_shards plan), one partitioned write, one small aggregate
    for the manifest; no driver data path beyond n_shards manifest rows."""
    import os
    import uuid

    from .similarity import _write_ivf_manifest

    # id discipline up front: a duplicate id fans the join out into
    # duplicate (shard, pos) rows whose manifest can NEVER validate
    # (the writer would publish data its own validator flags), and a
    # null id silently vanishes through the equi-join.
    bad = (
        df.select(F.col(id_col).alias("_id"))
        .groupBy("_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("_id").isNull() | (F.col("n") > 1))
        .limit(1)
        .collect()
    )
    if bad:
        raise ValueError(
            f"write_training_shards: {id_col} must be unique and non-null "
            f"(offender: {bad[0]._id!r}) — dedupe/assign ids upstream"
        )
    assign = shuffle_shards(df, n_shards=n_shards, seed=seed, id_col=id_col)
    data = df.join(assign, id_col)
    version = f"v={uuid.uuid4().hex[:12]}"
    (
        data.repartition(n_shards, F.col("shard"))
        .sortWithinPartitions("shard", "pos")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(path, version))
    )
    # Stats come from the WRITTEN files, not a recompute of the plan:
    # re-executing the join+shuffle doubles the epoch cost, and worse,
    # hashes data that was never witnessed on disk — a non-deterministic
    # upstream would publish a manifest that later "detects corruption"
    # on perfectly intact files. Reading back hashes ground truth.
    # Explicit schema: a zero-row write leaves only _SUCCESS, and
    # schema INFERENCE on that dir would fail — an empty corpus must
    # publish an empty manifest, not crash.
    written = df.sparkSession.read.schema(data.schema).parquet(
        os.path.join(path, version)
    )
    stats = _shard_stats_agg(written, id_col).collect()
    manifest = {
        "kind": "training_shards",
        "version": version,
        "n_shards": n_shards,
        "seed": seed,
        "id_col": id_col,
        "shards": {
            str(r.shard): {"rows": r.rows, "content_hash": str(r.content_hash)}
            for r in stats
        },
    }
    _write_ivf_manifest(path, manifest)
    return manifest


def validate_training_shards(spark, path: str) -> dict:
    """Re-derive every shard's row count, order-independent content
    hash, and position contiguity from the WRITTEN files and compare
    against the manifest — the loader-side integrity check that catches
    a lost, truncated, or re-written shard before an epoch trains on
    it. Returns {"ok": bool, "problems": [...]}."""
    import os

    from .similarity import _read_ivf_manifest

    m = _read_ivf_manifest(path)
    if m.get("kind") != "training_shards":
        raise ValueError(f"{path} is not a training-shard set")
    id_col = m["id_col"]
    from pyspark.errors import AnalysisException

    try:
        data_df = spark.read.parquet(os.path.join(path, m["version"]))
        base = _shard_stats_agg(data_df, id_col)
        extra = data_df.groupBy("shard").agg(
            F.min("pos").alias("min_pos"),
            F.max("pos").alias("max_pos"),
            F.count_distinct("pos").alias("n_pos"),
        )
        got = {str(r.shard): r for r in base.join(extra, "shard").collect()}
    except AnalysisException:
        # A zero-row shard set has no data files to infer from; that is
        # only consistent with an empty manifest — the comparison loop
        # below flags every manifest shard as missing otherwise.
        got = {}
    problems = []
    for shard, want in m["shards"].items():
        r = got.get(shard)
        if r is None:
            problems.append(f"shard {shard}: missing from data")
            continue
        if r.rows != want["rows"]:
            problems.append(f"shard {shard}: rows {r.rows} != manifest {want['rows']}")
        if str(r.content_hash) != want["content_hash"]:
            problems.append(f"shard {shard}: content hash mismatch")
        if not (r.min_pos == 0 and r.max_pos == r.rows - 1 and r.n_pos == r.rows):
            problems.append(f"shard {shard}: positions not contiguous 0..rows-1")
    for shard in got:
        if shard not in m["shards"]:
            problems.append(f"shard {shard}: not in manifest")
    return {"ok": not problems, "problems": problems}
