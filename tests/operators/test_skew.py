"""Skew guards (operators/skew.py): salted two-phase aggregation and
salted joins must be EXACTLY equivalent to their plain counterparts,
while provably spreading a hot key across salt sub-groups."""

import pytest
from pyspark.sql import functions as F

from factstore_spark.operators.skew import salted_groupby, salted_join


def _skewed_df(spark):
    # one key holds ~90% of rows, including exact-duplicate floods
    rows = [("hot", i % 7, 1.5) for i in range(900)]
    rows += [(f"k{i % 5}", i, 0.5) for i in range(100)]
    return spark.createDataFrame(rows, "k string, v long, w double")


def test_salted_groupby_equals_plain(spark):
    df = _skewed_df(spark)
    got = {
        r.k: (r.n, r.total, r.vmin, r.vmax)
        for r in salted_groupby(
            df, ["k"],
            [("count", "*", "n"), ("sum", "v", "total"),
             ("min", "v", "vmin"), ("max", "v", "vmax")],
            salt=8,
        ).collect()
    }
    want = {
        r.k: (r.n, r.total, r.vmin, r.vmax)
        for r in df.groupBy("k")
        .agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("total"),
            F.min("v").alias("vmin"), F.max("v").alias("vmax"),
        )
        .collect()
    }
    assert got == want


def test_salted_groupby_spreads_exact_duplicate_hot_rows(spark):
    """The hot key's 900 rows (many exact duplicates) must occupy
    multiple salt sub-groups — the phase-1 group count for the hot key
    equals the salt fan-out, not 1."""
    df = _skewed_df(spark)
    from factstore_spark.operators.skew import _salt_col

    phase1_groups = (
        df.withColumn("_salt", _salt_col(8))
        .filter(F.col("k") == "hot")
        .select("_salt")
        .distinct()
        .count()
    )
    assert phase1_groups == 8


def test_salted_groupby_rejects_non_algebraic(spark):
    with pytest.raises(ValueError, match="non-algebraic"):
        salted_groupby(_skewed_df(spark), ["k"], [("avg", "v", "a")])


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain(spark, how):
    fact = _skewed_df(spark)
    dim = spark.createDataFrame(
        [("hot", "H"), ("k0", "A"), ("k1", "B"), ("nomatch", "X")],
        "k string, label string",
    )
    got = sorted(
        (r.k, r.v, r.label)
        for r in salted_join(fact, dim, ["k"], salt=8, how=how).collect()
    )
    want = sorted(
        (r.k, r.v, r.label) for r in fact.join(dim, ["k"], how).collect()
    )
    assert got == want


def test_salted_join_rejects_right_joins(spark):
    df = _skewed_df(spark)
    with pytest.raises(ValueError, match="inner/left"):
        salted_join(df, df, ["k"], how="right")


def test_salted_join_preserves_caller_salt_column_and_row_id(spark):
    """A caller-owned `_salt` column must pass through untouched, and
    row_id_col gives a deterministic fact-side salt."""
    from pyspark.sql import functions as F

    from factstore_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(1, 10, "keep-a"), (2, 20, "keep-b"), (1, 30, "keep-c")],
        "k long, rid long, _salt string",
    )
    dim = spark.createDataFrame([(1, "x"), (2, "y")], "k long, attr string")
    out = salted_join(fact, dim, ["k"], salt=4, row_id_col="rid")
    rows = {(r.rid): (r._salt, r.attr) for r in out.collect()}
    assert rows == {10: ("keep-a", "x"), 20: ("keep-b", "y"), 30: ("keep-c", "x")}
