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
    fp = F.md5(F.lower(F.col(text_col)))
    bench_fps = benchmark.select(fp.alias("fp")).distinct()
    return (
        corpus.select(F.col(id_col), fp.alias("fp"))
        .join(F.broadcast(bench_fps).withColumn("contaminated", F.lit(True)), "fp", "left")
        .select(
            id_col,
            F.coalesce(F.col("contaminated"), F.lit(False)).alias("contaminated"),
        )
    )


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
