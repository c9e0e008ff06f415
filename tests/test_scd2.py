"""SCD2 dimension history (storage/scd2.py): interval semantics on a
hand-computed dimension, bitemporal reads, guard rails, and the
inherited merge-table publish discipline."""

import os

import pytest
from pyspark.sql import functions as F

from factstore_spark.storage.merge import read_table
from factstore_spark.storage.scd2 import (
    create_scd2_table,
    read_scd2,
    scd2_upsert,
    validate_scd2,
)


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "cust_id long, segment string, region string, effective_ts long"
    )


def _state(spark, d, **kw):
    return {
        r.cust_id: (r.segment, r.region)
        for r in read_scd2(spark, d, **kw).collect()
    }


def _history(spark, d):
    return sorted(
        (r.cust_id, r.valid_from, r.valid_to, r.segment)
        for r in read_scd2(spark, d, history=True).collect()
    )


@pytest.fixture()
def dim_dir(spark, tmp_path):
    d = str(tmp_path / "dim")
    create_scd2_table(
        _dim(spark, [(1, "gold", "eu", 10), (2, "silver", "us", 10)]),
        d, ["cust_id"], "region",
    )
    return d


def test_scd2_change_newkey_unchanged_and_rechange(spark, dim_dir):
    """The canonical matrix in one flow: change closes+reopens, a new
    key opens, an unchanged key is untouched, a second change yields a
    three-interval history with exact boundaries."""
    d = dim_dir
    scd2_upsert(
        _dim(spark, [
            (1, "platinum", "eu", 20),   # changed
            (2, "silver", "us", 20),     # unchanged -> no-op
            (3, "bronze", "eu", 20),     # new key
        ]), d,
    )
    scd2_upsert(_dim(spark, [(1, "gold", "eu", 30)]), d)  # change back

    assert _history(spark, d) == [
        (1, 10, 20, "gold"),
        (1, 20, 30, "platinum"),
        (1, 30, None, "gold"),
        (2, 10, None, "silver"),
        (3, 20, None, "bronze"),
    ]
    # bitemporal business axis: valid_from inclusive, valid_to exclusive
    assert _state(spark, d, as_of=10) == {1: ("gold", "eu"), 2: ("silver", "us")}
    assert _state(spark, d, as_of=19) == {1: ("gold", "eu"), 2: ("silver", "us")}
    assert _state(spark, d, as_of=20) == {
        1: ("platinum", "eu"), 2: ("silver", "us"), 3: ("bronze", "eu"),
    }
    assert _state(spark, d, as_of=9) == {}
    assert _state(spark, d)[1] == ("gold", "eu")  # current
    assert validate_scd2(spark, d)["ok"]


def test_scd2_unchanged_batch_publishes_nothing(spark, dim_dir):
    d = dim_dir
    before = read_table(spark, d).sparkSession  # session handle only
    m0 = scd2_upsert(_dim(spark, [(1, "gold", "eu", 20)]), d)  # same attrs
    m1 = scd2_upsert(_dim(spark, [(1, "gold", "eu", 25)]), d)
    # replaying the ORIGINAL batch (effective at/below valid_from,
    # attrs unchanged) is retry idempotency, not an ordering error
    m2 = scd2_upsert(_dim(spark, [(1, "gold", "eu", 10)]), d)
    assert m0["snapshot"] == m1["snapshot"] == m2["snapshot"] == 1
    assert len(_history(before, d)) == 2  # untouched rows, no new intervals


def test_scd2_out_of_order_and_zero_width_rejected(spark, dim_dir):
    d = dim_dir
    scd2_upsert(_dim(spark, [(1, "platinum", "eu", 20)]), d)
    with pytest.raises(ValueError, match="out-of-order"):
        scd2_upsert(_dim(spark, [(1, "bronze", "eu", 15)]), d)
    with pytest.raises(ValueError, match="out-of-order"):
        scd2_upsert(_dim(spark, [(1, "bronze", "eu", 20)]), d)  # zero width
    # history unchanged by the rejected batches
    assert len(_history(spark, d)) == 3
    assert validate_scd2(spark, d)["ok"]


def test_scd2_soft_delete_and_reinsert(spark, dim_dir):
    d = dim_dir
    df = spark.createDataFrame(
        [(2, None, None, 20, True)],
        "cust_id long, segment string, region string, effective_ts long, is_deleted boolean",
    )
    scd2_upsert(df, d, delete_col="is_deleted")
    assert 2 not in _state(spark, d)                 # no open row
    assert _state(spark, d, as_of=15)[2] == ("silver", "us")  # history kept
    assert validate_scd2(spark, d)["ok"]

    # delete of unknown / already-closed keys raises
    with pytest.raises(ValueError, match="unknown/closed"):
        scd2_upsert(df.withColumn("effective_ts", F.lit(30)), d,
                    delete_col="is_deleted")
    with pytest.raises(ValueError, match="unknown/closed"):
        scd2_upsert(
            spark.createDataFrame(
                [(99, None, None, 30, True)],
                "cust_id long, segment string, region string, "
                "effective_ts long, is_deleted boolean",
            ), d, delete_col="is_deleted",
        )

    # re-insert before the retired interval would overlap -> rejected
    with pytest.raises(ValueError, match="retired"):
        scd2_upsert(_dim(spark, [(2, "new", "us", 15)]), d)
    # at/after the boundary it re-opens (gap = the deleted period)
    scd2_upsert(_dim(spark, [(2, "new", "us", 40)]), d)
    assert _state(spark, d)[2] == ("new", "us")
    assert _state(spark, d, as_of=30) .get(2) is None  # the gap
    assert validate_scd2(spark, d)["ok"]


def test_scd2_system_time_snapshots_compose_with_as_of(spark, dim_dir):
    """Bitemporal: snapshot answers 'what did the table SAY', as_of
    answers 'which interval covered T' — and they compose."""
    d = dim_dir
    scd2_upsert(_dim(spark, [(1, "platinum", "eu", 20)]), d)
    # system time: snapshot 1 (pre-change) never heard of platinum
    assert _state(spark, d, snapshot=1)[1] == ("gold", "eu")
    assert _state(spark, d, snapshot=1, as_of=25)[1] == ("gold", "eu")
    # head: business axis sees the change at 20
    assert _state(spark, d, as_of=25)[1] == ("platinum", "eu")


def test_scd2_partition_attribute_change_is_safe(spark, dim_dir):
    """Changing the PARTITION attribute: the closed row keeps its old
    value (and stays in its old partition directory), the new interval
    lands in the new one — no key ever migrates directories."""
    d = dim_dir
    scd2_upsert(_dim(spark, [(1, "gold", "apac", 20)]), d)
    hist = {
        (r.valid_from, r.valid_to): r.region
        for r in read_scd2(spark, d, history=True).filter("cust_id = 1").collect()
    }
    assert hist == {(10, 20): "eu", (20, None): "apac"}
    # physical layout: both region partitions exist in the manifest
    from factstore_spark.storage.merge import _head_manifest

    parts = _head_manifest(d)["partitions"]
    assert {"eu", "us", "apac"} <= set(parts)
    assert os.path.isdir(os.path.join(d, parts["apac"]))
    assert validate_scd2(spark, d)["ok"]


def test_scd2_batch_hygiene(spark, dim_dir):
    d = dim_dir
    with pytest.raises(ValueError, match="duplicate"):
        scd2_upsert(
            _dim(spark, [(1, "a", "eu", 20), (1, "b", "eu", 20)]), d
        )
    with pytest.raises(ValueError, match="attributes"):
        scd2_upsert(
            spark.createDataFrame(
                [(1, "gold", 20)], "cust_id long, segment string, effective_ts long"
            ), d,
        )
    with pytest.raises(ValueError, match="non-null"):
        scd2_upsert(
            spark.createDataFrame(
                [(1, "gold", "eu", None)],
                "cust_id long, segment string, region string, effective_ts long",
            ), d,
        )
    with pytest.raises(ValueError, match="not an SCD2 table"):
        from factstore_spark.storage.merge import create_table

        plain = str(os.path.dirname(d)) + "/plain"
        create_table(
            spark.createDataFrame([(1, "x", "eu")], "k long, v string, p string"),
            plain, ["k"], "p",
        )
        scd2_upsert(_dim(spark, [(1, "a", "eu", 20)]), plain)


def test_validate_scd2_catches_planted_overlap(spark, dim_dir):
    """The validator must be falsifiable: bypass scd2_upsert and plant
    an overlapping interval through the raw merge layer."""
    from factstore_spark.storage.merge import merge_upsert

    d = dim_dir
    scd2_upsert(_dim(spark, [(1, "platinum", "eu", 20)]), d)
    assert validate_scd2(spark, d)["ok"]
    rogue = spark.createDataFrame(
        [(1, "rogue", "eu", 15, 25)],
        "cust_id long, segment string, region string, valid_from long, valid_to long",
    )
    merge_upsert(rogue, d)  # overlaps both [10,20) and [20,None)
    v = validate_scd2(spark, d)
    assert not v["ok"]
    assert any("overlap" in p for p in v["problems"])


def test_scd2_concurrent_writers_single_winner(spark, dim_dir):
    """Inherited merge discipline: two upserts from the same base — the
    loser raises ConcurrentMergeError instead of silently dropping the
    winner's intervals (no barrier needed: scd2_upsert reads its base
    manifest at call time, so issuing the second call after the first
    committed exercises the stale-base path via a monkey-hold)."""
    from factstore_spark.storage import merge as merge_mod
    from factstore_spark.storage.merge import ConcurrentMergeError, _head_manifest

    d = dim_dir
    base = _head_manifest(d)
    # freeze the base: first writer commits normally…
    scd2_upsert(_dim(spark, [(1, "platinum", "eu", 20)]), d)
    # …second writer replays from the FROZEN base manifest
    orig = merge_mod._head_manifest
    merge_mod._head_manifest = lambda td: dict(base) if td == d else orig(td)
    try:
        with pytest.raises(ConcurrentMergeError):
            scd2_upsert(_dim(spark, [(1, "bronze", "eu", 30)]), d)
    finally:
        merge_mod._head_manifest = orig
    # the winner's history is intact
    assert _state(spark, d)[1] == ("platinum", "eu")
    assert validate_scd2(spark, d)["ok"]
