"""Distributed global rank / NTILE (operators/ranking.py): exact
agreement with the single-partition window forms they replace."""

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from factstore_spark.operators.ranking import (
    ntile_of_rank,
    with_global_rank,
    with_grouped_rank,
)


def _df(spark, n=5000, seed=3):
    rnd = random.Random(seed)
    rows = [(i, rnd.randint(0, 500)) for i in range(n)]
    return spark.createDataFrame(rows, "id long, v long").repartition(16)


def _gdf(spark, n=5000, seed=7, groups=("a", "b", "c", "lone")):
    rnd = random.Random(seed)
    # 'lone' gets exactly one row; the rest spread over every partition
    rows = [(i, groups[rnd.randint(0, len(groups) - 2)], rnd.randint(0, 500)) for i in range(n - 1)]
    rows.append((n - 1, "lone", 42))
    return spark.createDataFrame(rows, "id long, g string, v long").repartition(16)


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


def test_grouped_rank_equals_window_row_number(spark):
    df = _gdf(spark)
    order = [F.col("v").asc(), F.col("id").asc()]
    ranked = with_grouped_rank(df, ["g"], order, rank_col="rank", count_col="n", num_partitions=8)
    got = {(r.g, r.id): (r.rank, r.n) for r in ranked.collect()}
    w = Window.partitionBy("g").orderBy(*order)
    want = {
        (r.g, r.id): (r.rank, r.n)
        for r in df.withColumn("rank", F.row_number().over(w).cast("long"))
        .withColumn("n", F.count(F.lit(1)).over(Window.partitionBy("g")).cast("long"))
        .collect()
    }
    assert got == want


def test_grouped_rank_empty_and_single_group(spark):
    empty = spark.createDataFrame([], "id long, g string, v long")
    assert (
        with_grouped_rank(empty, ["g"], [F.col("v"), F.col("id")], num_partitions=4).count() == 0
    )
    one = spark.createDataFrame([(1, "x", 9)], "id long, g string, v long")
    row = with_grouped_rank(
        one, ["g"], [F.col("v"), F.col("id")], rank_col="rank", count_col="n", num_partitions=4
    ).collect()[0]
    assert (row.rank, row.n) == (1, 1)


def test_grouped_rank_plan_windows_within_pid_cells(spark):
    """The whole point: windows partition by (_pid, group) so each task
    sorts one range slice of one group — never a whole group."""
    import io
    from contextlib import redirect_stdout

    ranked = with_grouped_rank(
        _gdf(spark), ["g"], [F.col("v").asc(), F.col("id").asc()], num_partitions=8
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        ranked.explain("formatted")
    plan = buf.getvalue()
    window_args = [
        line
        for line in plan.splitlines()
        if "row_number()" in line and "windowspecdefinition" in line
    ]
    assert window_args, "no window operator found in plan"
    for line in window_args:
        assert "_pid" in line, f"window sorts whole groups: {line}"


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


def test_grouped_rank_keeps_null_group(spark):
    """NULL group values must rank within their own group (as the
    window form does), not vanish through a null-unsafe offsets join."""
    rows = [(1, None, 5), (2, None, 3), (3, "g", 7), (4, "g", 1)]
    df = spark.createDataFrame(rows, "id long, g string, v long")
    out = {
        (r.g, r.id): (r.rank, r.n)
        for r in with_grouped_rank(
            df, ["g"], [F.col("v").asc(), F.col("id").asc()],
            rank_col="rank", count_col="n", num_partitions=4,
        ).collect()
    }
    assert out == {
        (None, 2): (1, 2), (None, 1): (2, 2),
        ("g", 4): (1, 2), ("g", 3): (2, 2),
    }


def test_grouped_rank_target_pruning_keeps_target_rows_exact(spark):
    """target_ranks prunes to cells that can contain a target rank; the
    surviving rows' ranks and counts must be IDENTICAL to the unpruned
    form at those ranks (median path: the two middle ranks), including
    a null group and a single-row group."""
    rows = [(1, None, 5), (2, None, 3), (3, None, 9)]  # null group, odd n
    rnd = random.Random(11)
    rows += [(10 + i, "big", rnd.randint(0, 500)) for i in range(500)]  # even n
    rows.append((900, "lone", 42))
    df = spark.createDataFrame(rows, "id long, g string, v long").repartition(16)
    order = [F.col("v").asc(), F.col("id").asc()]
    targets = lambda n: [F.floor((n + 1) / 2), F.floor((n + 2) / 2)]

    full = with_grouped_rank(
        df, ["g"], order, rank_col="rank", count_col="n", num_partitions=8
    )
    want = {
        (r.g, r.id): (r.rank, r.n)
        for r in full.collect()
        if r.rank in ((r.n + 1) // 2, (r.n + 2) // 2)
    }
    pruned = with_grouped_rank(
        df, ["g"], order, rank_col="rank", count_col="n", num_partitions=8,
        target_ranks=targets,
    )
    got = {
        (r.g, r.id): (r.rank, r.n)
        for r in pruned.collect()
        if r.rank in ((r.n + 1) // 2, (r.n + 2) // 2)
    }
    assert got == want
    # and the pruned frame really is smaller than the corpus when the
    # group spans many cells
    assert pruned.count() < df.count()


def test_global_rank_empty_input(spark):
    """Empty input must rank to an empty frame, not fail analysis on
    the empty offsets map (map<void,void>)."""
    from pyspark.sql import functions as F

    from factstore_spark.operators.ranking import with_global_rank

    df = spark.createDataFrame([], "v long, id long").filter(F.lit(False))
    out, total = with_global_rank(
        df, [F.col("v"), F.col("id")], with_total=True
    )
    assert out.count() == 0 and total == 0


def test_global_rank_desc_order_with_heavy_ties(spark):
    """The vocab-cap consumers rank by (count DESC, token ASC) where
    most counts are ties (Zipf tail of 1s): the range shuffle must
    respect the DESC direction and the tie-breaker must yield the
    window-exact ranking across partition boundaries."""
    rows = [(i, i % 3) for i in range(200)]  # 3 huge tie groups
    df = spark.createDataFrame(rows, "id long, v long")
    order = [F.col("v").desc(), F.col("id").asc()]
    got = {
        r.id: r.rank
        for r in with_global_rank(df, order, num_partitions=8).collect()
    }
    want = {
        r.id: r.rank
        for r in df.withColumn(
            "rank", F.row_number().over(Window.orderBy(*order))
        ).collect()
    }
    assert got == want and len(got) == 200
