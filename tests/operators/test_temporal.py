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
