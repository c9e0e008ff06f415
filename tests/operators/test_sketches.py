"""HLL sketch cells: merge losslessness and error bounds."""

from pyspark.sql import functions as F

from factstore_spark.operators.sketches import hll_cells, hll_rollup


def test_merged_cells_equal_direct_sketch(spark):
    """Unioning per-cell sketches must give EXACTLY the estimate of
    sketching the whole column directly (HLL merge is lossless at the
    same lg_k) — the property that makes pre-aggregated cubes sound."""
    df = spark.createDataFrame(
        [(i % 7, f"u{i % 97}") for i in range(2000)], "day long, user string"
    )
    cells = hll_cells(df, ["day"], "user", lg_k=12)
    merged = hll_rollup(cells, []).collect()[0]
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user", F.lit(12))).alias("est")
    ).collect()[0]
    assert merged.est_distinct == direct.est
    assert merged.n_rows == 2000


def test_estimate_error_within_bound(spark):
    df = spark.createDataFrame(
        [(0, f"user{i}") for i in range(5000)], "day long, user string"
    )
    est = hll_rollup(hll_cells(df, ["day"], "user"), []).collect()[0].est_distinct
    assert abs(est - 5000) / 5000 < 0.05  # ~1% standard error at lg_k=12


def test_events_distinct_sketch_err_bp_ceiling(spark, sf_dir):
    """Accuracy ceiling on the driver-oracled entry: every per-type
    err_ok flag (estimate within 500 bp of the exact distinct count,
    ~3x the lg_k=12 standard error of 162 bp) must hold, and the
    witnesses must be populated — the sketch entry FAILS if its
    accuracy ever balloons, instead of just reporting it."""
    from factstore_spark.queries import events_distinct_sketch

    rows = events_distinct_sketch(spark, sf_dir).collect()
    assert rows, "sketch cube produced no cells"
    offenders = [(r.event_type,) for r in rows if r.err_ok != 1]
    assert not offenders, f"HLL error exceeded 500 bp: {offenders}"
    assert all(r.exact_distinct > 0 and r.n_days > 0 for r in rows)


def test_heavy_hitters_exact_when_k_exceeds_cardinality(spark):
    """With k above the distinct count, MG never decrements: estimates
    ARE the exact counts and the error bound is 0."""
    from factstore_spark.operators.sketches import heavy_hitters

    df = spark.createDataFrame(
        [(f"w{i % 5}",) for i in range(1000)], "tok string"
    ).repartition(8)
    got = {r.item: (r.est_cnt, r.err_bound) for r in heavy_hitters(df, "tok", k=64).collect()}
    assert got == {f"w{i}": (200, 0) for i in range(5)}


def test_heavy_hitters_bounds_and_recall_under_pressure(spark):
    """k far below cardinality: every estimate must satisfy
    est <= true <= est + bound, and every item with true > bound must
    be present (the MG recall guarantee)."""
    from pyspark.sql import functions as F

    from factstore_spark.operators.sketches import heavy_hitters

    rows = [("heavy",)] * 5000 + [("mid",)] * 800 + [
        (f"tail{i}",) for i in range(4000)
    ]
    df = spark.createDataFrame(rows, "tok string").repartition(8)
    hh = heavy_hitters(df, "tok", k=32)
    got = {r.item: r.est_cnt for r in hh.collect()}
    bound = hh.collect()[0].err_bound
    true = {
        r.tok: r.n
        for r in df.groupBy("tok").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for item, est in got.items():
        assert est <= true[item] <= est + bound, (item, est, true[item], bound)
    for item, n in true.items():
        if n > bound:
            assert item in got, (item, n, bound)
    assert "heavy" in got and "mid" in got


def test_quantile_cube_merges_within_error_ceiling(spark):
    """Quantile cells built per (day) merged to a global rollup: each
    estimated quantile must sit within the histogram's resolution of
    the EXACT quantile — |rank(est) - q| <= 2/n_bins + GK slack."""
    import random

    from factstore_spark.operators.sketches import quantile_cells, quantile_rollup

    rnd = random.Random(5)
    rows = [(i % 7, float(rnd.lognormvariate(0, 1))) for i in range(20_000)]
    df = spark.createDataFrame(rows, "day long, v double")
    cells = quantile_cells(df, ["day"], "v", n_bins=64)
    assert cells.count() == 7
    merged = quantile_rollup(cells, [], [0.5, 0.9, 0.99]).collect()[0]
    assert merged.n_rows == 20_000

    values = sorted(v for _, v in rows)
    import bisect

    for q, est in ((0.5, merged.q_0_5), (0.9, merged.q_0_9), (0.99, merged.q_0_99)):
        # rank of the estimate in the TRUE distribution
        r = bisect.bisect_right(values, est) / len(values)
        assert abs(r - q) <= 2 / 64 + 0.01, (q, est, r)


def test_quantile_cube_exact_on_single_cell_uniform(spark):
    """One cell, distinct integers: merged quantiles are the familiar
    order statistics (resolution-exact)."""
    from factstore_spark.operators.sketches import quantile_cells, quantile_rollup

    df = spark.createDataFrame([(0, float(i)) for i in range(1, 1001)], "g long, v double")
    cells = quantile_cells(df, ["g"], "v", n_bins=100)
    got = quantile_rollup(cells, ["g"], [0.5, 0.9]).collect()[0]
    assert abs(got.q_0_5 - 500) <= 20 and abs(got.q_0_9 - 900) <= 20


def test_quantile_cells_ignore_null_values(spark):
    """n_rows counts NON-NULL values only — percentile_approx ignores
    nulls, so counting null rows would overweight high-null cells in
    the rollup and push its cum-mass threshold past reachable mass
    (NULL q_0_99 on groups containing an all-null cell)."""
    from factstore_spark.operators.sketches import quantile_cells, quantile_rollup

    rows = [("a", float(v)) for v in range(1, 101)] + [("b", None)] * 100
    df = spark.createDataFrame(rows, "cell string, v double")
    cells = quantile_cells(df, ["cell"], "v", n_bins=4)
    by_cell = {r.cell: r for r in cells.collect()}
    assert by_cell["a"].n_rows == 100
    assert by_cell["b"].n_rows == 0  # null mass contributes nothing
    out = quantile_rollup(cells, [], [0.5, 0.99]).collect()[0]
    assert out.q_0_99 is not None and out.q_0_99 >= 95.0


def test_quantile_sketch_entry_honors_gk_bound(spark):
    """events_quantile_sketch_bounds must emit within_gk_bound=1 (the
    in-band exact-rank check against the sketch's own guarantee —
    accuracy=100 => ceil(n/100) ranks, emitted as the q4 slack
    witness) at both test SFs."""
    from factstore_spark.queries import events_quantile_sketch_bounds

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        rows = events_quantile_sketch_bounds(spark, sf).collect()
        assert rows
        for r in rows:
            assert r.within_gk_bound == 1, (sf, tuple(r))
            assert r.allowed_rank_slack_q4 == 4 * ((r.n_events + 99) // 100)


def test_quantile_rollup_q1_never_null(spark):
    """q=1.0 must return the max breakpoint even when float
    accumulation of n_bins x (n/n_bins) lands a few ulps below n
    (e.g. 6 x 1/6 < 1.0)."""
    from factstore_spark.operators.sketches import quantile_cells, quantile_rollup

    df = spark.createDataFrame([(1, 5.0)], "k long, v double")
    cells = quantile_cells(df, ["k"], "v", n_bins=6)
    out = quantile_rollup(cells, [], [0.5, 1.0]).collect()[0]
    assert out.q_1_0 is not None and out.q_0_5 is not None


def test_quantile_sketch_entry_ignores_null_values(spark, tmp_path):
    """NULL event values are invisible to percentile_approx and to the
    exact rank counts — n must count the same non-null population or
    the bound check trips on clean data (review finding, round 9)."""
    import os

    from factstore_spark.queries import events_quantile_sketch_bounds

    rows = [(i, f"u{i % 3}", "click", float(i) if i % 10 else None, "{}")
            for i in range(1, 301)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, event_type string, "
              "value double, props string",
    ).withColumn("ts", F.timestamp_micros(F.col("event_id") * 1000000))
    sf = tmp_path / "sf"
    os.makedirs(sf)
    df.coalesce(1).write.parquet(str(sf / "events.parquet"))
    out = events_quantile_sketch_bounds(spark, str(sf)).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_events == 270  # 30 of 300 values are NULL
    assert r.within_gk_bound == 1


def test_hll_set_ops_near_exact_at_small_cardinality(spark):
    """Small cardinalities (600 vs 600, 200 shared): every estimate
    lands within ~1% of truth — tight enough that a broken union merge
    or a sign slip in the inclusion-exclusion arithmetic (off by
    hundreds) cannot hide. (Not bit-exact: DataSketches HLL carries
    sub-1% estimator noise even at low counts.)"""
    from factstore_spark.operators.sketches import hll_cells, hll_set_ops

    a = spark.createDataFrame(
        [(i % 5, f"u{i}") for i in range(600)], "day long, user string"
    )
    b = spark.createDataFrame(
        [(i % 3, f"u{i}") for i in range(400, 1000)], "day long, user string"
    )
    got = hll_set_ops(
        hll_cells(a, ["day"], "user"), hll_cells(b, ["day"], "user"), []
    ).collect()[0]
    assert abs(got.est_a - 600) <= 10 and abs(got.est_b - 600) <= 10
    assert abs(got.est_union - 1000) <= 15
    assert abs(got.est_intersect - 200) <= 30
    assert abs(got.est_only_a - 400) <= 25
    assert abs(got.est_only_b - 400) <= 25


def test_hll_set_ops_grouped_with_one_sided_groups(spark):
    """Grouped algebra: a group present on only one side reads as an
    empty other side (union = the present side, intersection 0) —
    never a dropped group."""
    from factstore_spark.operators.sketches import hll_cells, hll_set_ops

    a = spark.createDataFrame(
        [("g1", 0, f"u{i}") for i in range(100)]
        + [("g2", 0, f"u{i}") for i in range(50)],
        "g string, day long, user string",
    )
    b = spark.createDataFrame(
        [("g1", 0, f"u{i}") for i in range(50, 150)]
        + [("g3", 0, f"v{i}") for i in range(30)],
        "g string, day long, user string",
    )
    rows = {
        r.g: r
        for r in hll_set_ops(
            hll_cells(a, ["g", "day"], "user"),
            hll_cells(b, ["g", "day"], "user"),
            ["g"],
        ).collect()
    }
    assert set(rows) == {"g1", "g2", "g3"}
    assert abs(rows["g1"].est_union - 150) <= 5
    assert abs(rows["g1"].est_intersect - 50) <= 10
    assert abs(rows["g2"].est_a - 50) <= 3 and rows["g2"].est_b == 0.0
    assert abs(rows["g2"].est_union - 50) <= 3
    assert rows["g2"].est_intersect == 0.0
    assert abs(rows["g3"].est_b - 30) <= 2
    assert abs(rows["g3"].est_only_b - 30) <= 2


def test_hll_set_ops_error_bounded_at_scale(spark):
    """Dense-mode bound: 20k vs 20k users with 10k shared — union
    within 5% and intersection within 10% of the union magnitude
    (inclusion-exclusion compounds ~3 estimate errors)."""
    from factstore_spark.operators.sketches import hll_cells, hll_set_ops

    a = spark.createDataFrame(
        [(i % 7, f"u{i}") for i in range(20_000)], "day long, user string"
    )
    b = spark.createDataFrame(
        [(i % 7, f"u{i}") for i in range(10_000, 30_000)],
        "day long, user string",
    )
    got = hll_set_ops(
        hll_cells(a, ["day"], "user"), hll_cells(b, ["day"], "user"), []
    ).collect()[0]
    assert abs(got.est_union - 30_000) / 30_000 < 0.05
    assert abs(got.est_intersect - 10_000) <= 0.10 * 30_000


def test_hll_set_ops_property_random_partitions(spark):
    """Property sweep: random A/B partitions of a universe — for every
    draw the identities must hold within sketch error: est_union <=
    est_a + est_b (+noise), est_intersect ~ |A∩B|, est_only_a ~
    |A∖B|, and all estimates non-negative. Seeded RNG, one Spark job
    per draw."""
    import random

    from factstore_spark.operators.sketches import hll_cells, hll_set_ops

    rng = random.Random(20260816)
    for trial in range(3):
        n_universe = rng.choice([300, 2_000, 8_000])
        cut_a = rng.randrange(1, n_universe)
        cut_b = rng.randrange(0, cut_a)  # overlap [cut_b, cut_a)
        a_ids = range(0, cut_a)
        b_ids = range(cut_b, n_universe)
        inter = cut_a - cut_b
        a = spark.createDataFrame(
            [(i % 3, f"u{i}") for i in a_ids], "day long, user string"
        )
        b = spark.createDataFrame(
            [(i % 5, f"u{i}") for i in b_ids], "day long, user string"
        )
        got = hll_set_ops(
            hll_cells(a, ["day"], "user"), hll_cells(b, ["day"], "user"), []
        ).collect()[0]
        tol = max(10.0, 0.05 * n_universe)
        assert abs(got.est_union - n_universe) <= tol, (trial, got)
        assert abs(got.est_intersect - inter) <= 3 * tol, (trial, got)
        assert abs(got.est_only_a - cut_b) <= 3 * tol, (trial, got)
        for v in (got.est_a, got.est_b, got.est_union, got.est_intersect,
                  got.est_only_a, got.est_only_b):
            assert v >= 0.0


def test_cm_sketch_never_undercounts_and_is_tight_when_sparse(spark):
    """CM guarantee: est >= true ALWAYS; with distinct keys far below
    width the collision mass is ~0 and estimates are exact."""
    from factstore_spark.operators.sketches import cm_cells, cm_merge, cm_query

    rows = [(i % 3, f"u{i % 50}") for i in range(5000)]
    df = spark.createDataFrame(rows, "day long, user string")
    merged = cm_merge(cm_cells(df, ["day"], "user"), [])
    keys = spark.createDataFrame(
        [(f"u{i}",) for i in range(50)] + [("ghost",)], "user string"
    )
    est = {r.user: r.est for r in cm_query(merged, keys, "user").collect()}
    true = {f"u{i}": 100 for i in range(50)}
    for u, t in true.items():
        assert est[u] >= t
        assert est[u] == t  # 50 keys vs width 2048: collisions absent
    assert est["ghost"] == 0


def test_cm_merge_equals_direct_build(spark):
    """Linearity: merging per-day cells must equal sketching the whole
    frame directly — the property that makes the cube sound."""
    from factstore_spark.operators.sketches import cm_cells, cm_merge, cm_query

    rows = [(i % 7, f"k{i % 400}") for i in range(20_000)]
    df = spark.createDataFrame(rows, "day long, k string")
    via_cells = cm_merge(cm_cells(df, ["day"], "k"), [])
    direct = cm_merge(cm_cells(df.withColumn("g", F.lit(0)), ["g"], "k"), [])
    keys = spark.createDataFrame([(f"k{i}",) for i in range(0, 400, 7)], "k string")
    a = {r.k: r.est for r in cm_query(via_cells, keys, "k").collect()}
    b = {r.k: r.est for r in cm_query(direct, keys, "k").collect()}
    assert a == b


def test_cm_overcount_bounded_under_pressure(spark):
    """Distinct keys >> width: estimates still never undercount and
    the min-over-depth overcount stays within the classical
    2N/width-ish band (generous 4N/width assertion)."""
    from pyspark.sql import functions as SF

    from factstore_spark.operators.sketches import cm_cells, cm_merge, cm_query

    n = 60_000
    df = spark.range(n).select(
        F.lit(0).alias("g"), F.concat(F.lit("k"), (F.col("id") % 9000)).alias("k")
    )
    merged = cm_merge(cm_cells(df, ["g"], "k", depth=4, width=512), [])
    keys = spark.createDataFrame([(f"k{i}",) for i in range(0, 9000, 613)], "k string")
    true = {
        r.k: r.n
        for r in df.groupBy("k").agg(SF.count(SF.lit(1)).alias("n")).collect()
    }
    for r in cm_query(merged, keys, "k", depth=4, width=512).collect():
        assert r.est >= true[r.k], (r.k, r.est, true[r.k])
        assert r.est <= true[r.k] + 4 * n // 512, (r.k, r.est, true[r.k])
