"""Distributed global rank / NTILE (operators/ranking.py): exact
agreement with the single-partition window forms they replace."""

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from factstore_spark.operators.ranking import ntile_of_rank, with_global_rank


def _df(spark, n=5000, seed=3):
    rnd = random.Random(seed)
    rows = [(i, rnd.randint(0, 500)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long").repartition(16)


def test_global_rank_equals_window_row_number(spark):
    df = _df(spark)
    order = [F.col("v").asc(), F.col("id").asc()]
    got = {
        r.id: r.rank for r in with_global_rank(df, order, num_partitions=8).collect()
    }
    want = {
        r.id: r.rank
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want


def test_ntile_of_rank_equals_window_ntile(spark):
    for n, tiles in ((5000, 10), (23, 10), (7, 10), (10, 10)):
        df = _df(spark, n=n)
        order = [F.col("v").asc(), F.col("id").asc()]
        ranked = with_global_rank(df, order, num_partitions=8)
        got = {
            r.id: r.t
            for r in ranked.withColumn(
                "t", ntile_of_rank(F.col("rank"), F.lit(n), tiles)
            ).collect()
        }
        want = {
            r.id: r.t
            for r in df.withColumn(
                "t", F.ntile(tiles).over(Window.orderBy(*order)).cast("long")
            ).collect()
        }
        assert got == want, (n, tiles)


def test_global_rank_plan_has_no_unpartitioned_window(spark):
    """The point of the operator: the plan range-partitions and windows
    per partition — never a single-partition global sort window."""
    import io
    from contextlib import redirect_stdout

    df = _df(spark)
    ranked = with_global_rank(df, [F.col("v").asc(), F.col("id").asc()])
    buf = io.StringIO()
    with redirect_stdout(buf):
        ranked.explain("formatted")
    plan = buf.getvalue()
    # The range exchange is hidden behind the pinned checkpoint
    # (ExistingRDD scan); what must be visible: every Window operator
    # carries a non-empty partition spec including _pid — i.e. no
    # unpartitioned single-task window anywhere in the plan.
    assert "ExistingRDD" in plan
    window_args = [
        line
        for line in plan.splitlines()
        if "row_number()" in line and "windowspecdefinition" in line
    ]
    assert window_args, "no window operator found in plan"
    for line in window_args:
        assert "_pid" in line, f"window not partitioned by _pid: {line}"
