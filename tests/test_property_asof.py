"""Property-based check: asof_join (BOTH the default union-ffill plan
and the bucketed skew-escape plan) must agree with a straightforward
pure-Python reference on arbitrary generated corpora — including
equal-time matches, empty-right keys, cross-bucket carry-ins, and
tolerance. Cases are generated up front (seeded) and evaluated in ONE
DataFrame pass by folding the case id into the join key (same batching
pattern as the other property suites)."""

import random

from factstore_spark.operators.temporal import asof_join

N_CASES = 40


def _gen_cases(seed):
    rnd = random.Random(seed)
    trades, quotes = [], []
    for c in range(N_CASES):
        for s in range(rnd.randint(1, 3)):
            key = f"c{c}|s{s}"
            for i in range(rnd.randint(1, 12)):
                trades.append((key, rnd.randint(0, 50), len(trades)))
            # unique (key, t) pairs so the reference is unambiguous
            seen = set()
            for i in range(rnd.randint(0, 8)):
                t = rnd.randint(0, 50)
                if t not in seen:
                    seen.add(t)
                    quotes.append((key, t, float(len(quotes))))
    return trades, quotes


def _reference(trades, quotes, tolerance=None):
    by_key = {}
    for k, t, px in quotes:
        by_key.setdefault(k, []).append((t, px))
    for v in by_key.values():
        v.sort()
    out = {}
    for k, t, tid in trades:
        best = None
        for qt, px in by_key.get(k, []):
            if qt <= t:
                best = (qt, px)
            else:
                break
        if best is not None and tolerance is not None and best[0] < t - tolerance:
            best = None
        out[tid] = best or (None, None)
    return out


def _run(spark, trades, quotes, **kw):
    tdf = spark.createDataFrame(trades, "sym string, t long, trade_id long")
    qdf = spark.createDataFrame(quotes, "sym string, t long, px double")
    return {
        r.trade_id: (r.t_right, r.px)
        for r in asof_join(
            tdf, qdf, on="sym", left_time="t", right_time="t",
            value_cols=["px"], **kw
        ).collect()
    }


def test_asof_both_paths_match_python_reference(spark):
    trades, quotes = _gen_cases(1234)
    want = _reference(trades, quotes)
    assert _run(spark, trades, quotes) == want
    assert _run(spark, trades, quotes, bucket=7) == want
    assert _run(spark, trades, quotes, bucket=100) == want


def test_asof_both_paths_match_reference_with_tolerance(spark):
    trades, quotes = _gen_cases(987)
    want = _reference(trades, quotes, tolerance=5)
    assert _run(spark, trades, quotes, tolerance=5) == want
    assert _run(spark, trades, quotes, tolerance=5, bucket=7) == want
