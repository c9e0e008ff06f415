"""As-of and range join semantics on hand-computed corpora, plus the
plan shapes that make them scale (no nested-loop / cartesian)."""

import io
from contextlib import redirect_stdout

from factstore_spark.operators.temporal import asof_join, range_join_binned


def test_asof_join_backward_with_equal_time_match(spark):
    trades = spark.createDataFrame(
        [("A", 10, 100), ("A", 25, 101), ("B", 5, 102), ("A", 40, 103)],
        "sym string, t long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 5, 1.0), ("A", 20, 2.0), ("A", 25, 3.0), ("B", 7, 9.0)],
        "sym string, t long, px double",
    )
    out = {
        r.trade_id: (r.t_right, r.px)
        for r in asof_join(trades, quotes, on="sym", left_time="t", right_time="t").collect()
    }
    assert out[100] == (5, 1.0)     # latest at-or-before 10 is 5
    assert out[101] == (25, 3.0)    # equal-time quote matches (>= contract)
    assert out[102] == (None, None) # B's only quote is AFTER the trade
    assert out[103] == (25, 3.0)


def test_asof_join_tolerance_nulls_stale_matches(spark):
    trades = spark.createDataFrame([("A", 40, 1)], "sym string, t long, id long")
    quotes = spark.createDataFrame([("A", 25, 3.0)], "sym string, t long, px double")
    out = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="t", tolerance=10
    ).collect()[0]
    assert (out.t_right, out.px) == (None, None)  # age 15 > tolerance 10
    fresh = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="t", tolerance=20
    ).collect()[0]
    assert (fresh.t_right, fresh.px) == (25, 3.0)


def test_asof_join_plan_has_no_join_at_all(spark):
    """The union-ffill as-of is a window over one shuffle — there must
    be NO join operator (and certainly no nested loop) in the plan."""
    trades = spark.createDataFrame([("A", 10, 1)], "sym string, t long, id long")
    quotes = spark.createDataFrame([("A", 5, 1.0)], "sym string, t long, px double")
    buf = io.StringIO()
    with redirect_stdout(buf):
        asof_join(trades, quotes, on="sym", left_time="t", right_time="t").explain("formatted")
    plan = buf.getvalue()
    assert "Join" not in plan
    assert "Window" in plan


def test_range_join_binned_closed_bounds_and_overlaps(spark):
    pts = spark.createDataFrame(
        [(0, 3), (1, 5), (2, 10), (3, 17), (4, 21)], "pid long, t long"
    )
    iv = spark.createDataFrame(
        [(10, 0, 5), (20, 5, 20)], "iv_id long, s long, e long"
    )
    out = sorted(
        (r.pid, r.iv_id)
        for r in range_join_binned(pts, iv, "t", "s", "e", bin_width=4).collect()
    )
    # t=5 is in BOTH [0,5] and [5,20] (closed bounds); 21 matches none
    assert out == [(0, 10), (1, 10), (1, 20), (2, 20), (3, 20)]


def test_range_join_binned_is_an_equi_join(spark):
    pts = spark.createDataFrame([(0, 3)], "pid long, t long")
    iv = spark.createDataFrame([(10, 0, 5)], "iv_id long, s long, e long")
    buf = io.StringIO()
    with redirect_stdout(buf):
        range_join_binned(pts, iv, "t", "s", "e", bin_width=4).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_asof_join_bucketed_equals_default(spark):
    """The bucket= escape hatch must reproduce the default path exactly,
    including cross-bucket carry-in, equal-time matches, no-match NULLs
    and tolerance — on a corpus engineered so many left buckets have no
    in-bucket right row."""
    import random

    rng = random.Random(7)
    trades = [(f"s{i % 3}", rng.randrange(0, 1000), i) for i in range(200)]
    quotes = [
        (f"s{i % 3}", rng.randrange(0, 1000), float(i)) for i in range(40)
    ]  # sparse: most 10-wide buckets have no quote
    tdf = spark.createDataFrame(trades, "sym string, t long, trade_id long")
    qdf = spark.createDataFrame(quotes, "sym string, t long, px double")

    def run(**kw):
        return sorted(
            (r.trade_id, r.t_right, r.px)
            for r in asof_join(
                tdf, qdf, on="sym", left_time="t", right_time="t",
                value_cols=["px"], **kw
            ).collect()
        )

    assert run(bucket=10) == run()
    assert run(bucket=1000) == run()      # one bucket == default shape
    assert run(bucket=7, tolerance=50) == run(tolerance=50)


def test_asof_join_bucketed_splits_hot_key(spark):
    """Skew: one key holds >50% of all rows. The bucketed path's fill
    window must partition by (key, bucket) — visible in the plan — and
    still agree with the default path row-for-row."""
    hot = [("hot", t, t) for t in range(0, 600)]          # 600 rows, one key
    cold = [(f"c{i}", i * 3, 10_000 + i) for i in range(100)]
    trades = spark.createDataFrame(hot + cold, "sym string, t long, trade_id long")
    quotes = spark.createDataFrame(
        [("hot", t, float(t)) for t in range(0, 600, 50)]
        + [(f"c{i}", i, float(i)) for i in range(0, 100, 10)],
        "sym string, t long, px double",
    )
    bucketed = asof_join(
        trades, quotes, on="sym", left_time="t", right_time="t",
        value_cols=["px"], bucket=100,
    )
    buf = io.StringIO()
    with redirect_stdout(buf):
        bucketed.explain("formatted")
    plan = buf.getvalue()
    # the in-bucket fill window is partitioned by (_k, _b), not _k alone
    assert "_b" in plan and "Window" in plan
    got = sorted((r.trade_id, r.t_right, r.px) for r in bucketed.collect())
    want = sorted(
        (r.trade_id, r.t_right, r.px)
        for r in asof_join(
            trades, quotes, on="sym", left_time="t", right_time="t",
            value_cols=["px"],
        ).collect()
    )
    assert got == want
    # the hot key's 600 rows spread across 6 disjoint (key, bucket)
    # window partitions => its fill is multi-task, not one sort
    n_hot_buckets = (
        bucketed.sparkSession.createDataFrame(
            [(t,) for t, in ((t,) for _, t, _ in hot)], "t long"
        ).selectExpr("count(distinct floor(t / 100)) n").collect()[0].n
    )
    assert n_hot_buckets == 6


def test_range_join_binned_left_keeps_unmatched_points(spark):
    """how='left' must RETAIN points no interval contains (containment
    lives in the join condition, not a post-filter that would
    null-eliminate the outer rows back to inner semantics)."""
    pts = spark.createDataFrame(
        [(0, 3), (1, 21), (2, 100)], "pid long, t long"
    )
    iv = spark.createDataFrame([(10, 0, 5)], "iv_id long, s long, e long")
    rows = {
        r.pid: r.iv_id
        for r in range_join_binned(pts, iv, "t", "s", "e", bin_width=4, how="left").collect()
    }
    assert rows == {0: 10, 1: None, 2: None}
    # and inner still drops them
    inner = range_join_binned(pts, iv, "t", "s", "e", bin_width=4).collect()
    assert [(r.pid, r.iv_id) for r in inner] == [(0, 10)]


def test_asof_join_null_keys_never_match(spark):
    """SQL ASOF equality semantics: NULL keys match nothing — a
    null-keyed left row surfaces with null value cols; a null-keyed
    right row fills nobody (Window.partitionBy would otherwise group
    all nulls together and fill them into each other)."""
    left = spark.createDataFrame(
        [(1, None, 10), (2, "u", 10)], "lid long, k string, t long"
    )
    right = spark.createDataFrame(
        [(None, 5, 77), ("u", 5, 88)], "k string, rt long, val long"
    )
    for bucket in (None, 100):
        out = {
            r.lid: r.val
            for r in asof_join(
                left, right, on="k", left_time="t", right_time="rt",
                value_cols=["val"], bucket=bucket,
            ).collect()
        }
        assert out == {1: None, 2: 88}, f"bucket={bucket}"
