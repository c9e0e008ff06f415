"""Market-basket rules: the Spark entry must equal a pure-Python
computation of directed support/confidence/lift (two-floor integer
form) on hand-built baskets — including the in-basket dedup (a brand
appearing on two lines of one order counts once)."""

import itertools

import pytest

from factstore_spark.queries import orders_basket_rules


@pytest.fixture()
def sf_dir(spark, tmp_path):
    # order 1: brands A,B (B twice -> dedup), order 2: A,B,C,
    # order 3: A only, order 4: B,C, order 5: A,B
    lines = [
        (1, 101), (1, 102), (1, 103),
        (2, 101), (2, 102), (2, 104),
        (3, 105),
        (4, 102), (4, 104),
        (5, 105), (5, 103),
    ]
    parts = [
        (101, "A"), (102, "B"), (103, "B"), (104, "C"), (105, "A"),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        lines, "l_orderkey long, l_partkey long"
    ).write.parquet(f"{d}/lineitem.parquet")
    spark.createDataFrame(
        parts, "p_partkey long, p_brand string"
    ).write.parquet(f"{d}/part.parquet")
    return d


def test_basket_rules_match_brute_force(spark, sf_dir):
    got = {
        (r.brand_a, r.brand_b): r
        for r in orders_basket_rules(spark, sf_dir).collect()
    }
    baskets = {
        1: {"A", "B"}, 2: {"A", "B", "C"}, 3: {"A"}, 4: {"B", "C"},
        5: {"A", "B"},
    }
    n_orders = len(baskets)
    marg = {}
    for bs in baskets.values():
        for b in bs:
            marg[b] = marg.get(b, 0) + 1
    want = {}
    for a, b in itertools.permutations(sorted(marg), 2):
        n_ab = sum(1 for bs in baskets.values() if a in bs and b in bs)
        if n_ab * 2000 < n_orders:
            continue
        conf = (10000 * n_ab) // marg[a]
        want[(a, b)] = (
            n_ab, marg[a], marg[b], n_orders,
            (10000 * n_ab) // n_orders, conf,
            (conf * n_orders) // marg[b],
        )
    assert set(got) == set(want)
    for key, (n_ab, n_a, n_b, n, sup, conf, lift) in want.items():
        r = got[key]
        assert (
            r.n_ab, r.n_a, r.n_b, r.n_orders,
            r.support_bp, r.confidence_bp, r.lift_bp,
        ) == (n_ab, n_a, n_b, n, sup, conf, lift)
    # spot-check the asymmetry: conf(C->B)=10000 (every C-basket has B),
    # conf(B->C)=5000 (2 of 4 B-baskets)
    assert got[("C", "B")].confidence_bp == 10000
    assert got[("B", "C")].confidence_bp == 5000
