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

    # EXACT replay of the applied delete (same effective as the closed
    # boundary): the requested state already holds -> idempotent no-op
    m_replay = scd2_upsert(df, d, delete_col="is_deleted")
    assert 2 not in _state(spark, d)
    assert m_replay["snapshot"] == scd2_upsert(df, d, delete_col="is_deleted")["snapshot"]

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
    with pytest.raises(ValueError, match="never caller-supplied"):
        scd2_upsert(
            spark.createDataFrame(
                [(1, "gold", "eu", 20, 99)],
                "cust_id long, segment string, region string, "
                "effective_ts long, valid_to long",
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
    # every entry point shares the loud manifest errors — never a bare
    # TypeError on a dir create_scd2_table never touched
    with pytest.raises(ValueError, match="no published manifest"):
        validate_scd2(spark, str(os.path.dirname(d)) + "/nowhere")
    with pytest.raises(ValueError, match="not an SCD2 table"):
        validate_scd2(spark, plain)


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
    """Read-modify-write race: writer B reads its base, writer A
    commits, then B tries to publish interval rows DERIVED from the
    stale open rows. B must get ConcurrentMergeError — the base
    manifest is pinned from B's read through to the snapshot CAS. (A
    head-re-read at publish time would pass the CAS and leave key 1
    with TWO open intervals: B's close targets the pre-A open row, so
    A's new open row would survive the anti-join untouched.)"""
    from factstore_spark.storage import scd2 as scd2_mod
    from factstore_spark.storage.merge import ConcurrentMergeError, _head_manifest

    d = dim_dir
    base = _head_manifest(d)  # writer B's base read happens "now"
    # writer A commits in between…
    scd2_upsert(_dim(spark, [(1, "platinum", "eu", 20)]), d)
    # …writer B proceeds from its FROZEN base
    orig = scd2_mod._head_manifest
    scd2_mod._head_manifest = lambda td: dict(base) if td == d else orig(td)
    try:
        with pytest.raises(ConcurrentMergeError):
            scd2_upsert(_dim(spark, [(1, "bronze", "eu", 30)]), d)
    finally:
        scd2_mod._head_manifest = orig
    # the winner's history is intact — and crucially, exactly ONE open
    # row for the contested key
    assert _state(spark, d)[1] == ("platinum", "eu")
    hist = read_scd2(spark, d, history=True).filter("cust_id = 1")
    assert hist.filter("valid_to is null").count() == 1
    assert validate_scd2(spark, d)["ok"]


def test_scd2_enrich_point_in_time(spark, dim_dir):
    """The consumption pattern: per-fact attributes from the covering
    interval — boundary-exact (valid_from inclusive, valid_to
    exclusive), NULL before first existence and inside deleted gaps,
    correct across a re-change and a re-insert; both asof plans
    (default and bucketed) agree with a pure-Python interval walk."""
    from factstore_spark.storage.scd2 import scd2_enrich

    d = dim_dir
    scd2_upsert(_dim(spark, [(1, "platinum", "eu", 20)]), d)
    scd2_upsert(_dim(spark, [(1, "gold", "eu", 30)]), d)
    deleting = spark.createDataFrame(
        [(2, None, None, 25, True)],
        "cust_id long, segment string, region string, effective_ts long, is_deleted boolean",
    )
    scd2_upsert(deleting, d, delete_col="is_deleted")
    scd2_upsert(_dim(spark, [(2, "back", "us", 40)]), d)  # re-insert after gap

    hist = read_scd2(spark, d, history=True)
    intervals = [
        (r.cust_id, r.valid_from, r.valid_to, r.segment)
        for r in hist.collect()
    ]

    def ref(key, t):
        best = None
        for k, lo, hi, seg in intervals:
            if k == key and lo <= t and (hi is None or t < hi):
                best = seg
        return best

    facts = spark.createDataFrame(
        [(i, k, t) for i, (k, t) in enumerate(
            [(1, 5), (1, 10), (1, 19), (1, 20), (1, 29), (1, 30), (1, 99),
             (2, 10), (2, 24), (2, 25), (2, 39), (2, 40), (2, 50),
             (3, 10)]  # key never in the dimension
        )],
        "fact_id long, cust_id long, ts long",
    )
    want = {
        r.fact_id: ref(r.cust_id, r.ts) for r in facts.collect()
    }
    for bucket in (None, 10):
        out = scd2_enrich(facts, hist, on="cust_id", left_time="ts", bucket=bucket)
        # public schema only: fact columns + attributes, no internal
        # change-stream columns leaking through
        assert sorted(out.columns) == ["cust_id", "fact_id", "region", "segment", "ts"]
        got = {r.fact_id: r.segment for r in out.collect()}
        assert got == want, f"bucket={bucket}"
    # spot checks pin the reference itself (falsifiability)
    assert want[0] is None            # before key 1 existed
    assert want[3] == "platinum"      # valid_from inclusive
    assert want[4] == "platinum"      # last instant before re-change
    assert want[5] == "gold"          # re-change boundary
    assert want[9] is None            # delete boundary: gone AT 25
    assert want[8] == "silver"        # last instant before delete
    assert want[11] == "back"         # re-insert boundary
    assert want[13] is None           # key never existed


def _stream_src(spark, src, rows):
    spark.createDataFrame(
        rows,
        "cust_id long, segment string, region string, effective_ts long, "
        "is_deleted boolean",
    ).coalesce(1).write.mode("append").parquet(src)


def _run_stream(spark, src, d, ckpt, **kw):
    from factstore_spark.storage.scd2 import start_scd2_stream

    stream = spark.readStream.schema(
        "cust_id long, segment string, region string, effective_ts long, "
        "is_deleted boolean"
    ).parquet(src)
    q = start_scd2_stream(
        stream, d, ckpt, delete_col="is_deleted", available_now=True, **kw
    )
    q.awaitTermination(120)
    return q


def test_scd2_stream_maintains_dimension(spark, dim_dir, tmp_path):
    """Streaming maintainer: per-batch latest-change collapse, resume
    from checkpoint applies only new files, and a full REDELIVERY (same
    source, fresh checkpoint) is a no-op — scd2_upsert's idempotent
    paths absorb already-applied changes, re-inserts and deletes."""
    d = dim_dir
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    # batch 1: key1 changes twice in-batch (18 then 20 -> collapses to
    # the 20 version; 18 is below batch resolution), key2 soft-deleted
    _stream_src(spark, src, [
        (1, "mid", "eu", 18, False),
        (1, "platinum", "eu", 20, False),
        (2, None, None, 25, True),
    ])
    _run_stream(spark, src, d, ckpt)
    assert _state(spark, d) == {1: ("platinum", "eu")}
    assert _history(spark, d) == [
        (1, 10, 20, "gold"), (1, 20, None, "platinum"),
        (2, 10, 25, "silver"),
    ]

    # batch 2 through the SAME checkpoint: re-insert + new key
    _stream_src(spark, src, [
        (2, "back", "us", 40, False),
        (3, "bronze", "eu", 40, False),
    ])
    _run_stream(spark, src, d, ckpt)
    assert _state(spark, d) == {
        1: ("platinum", "eu"), 2: ("back", "us"), 3: ("bronze", "eu"),
    }
    assert validate_scd2(spark, d)["ok"]
    hist_after = _history(spark, d)

    # redelivery: FRESH checkpoint over the same source — every row
    # re-applies as a no-op (latest-per-key collapse + idempotent
    # upsert), the history is byte-identical and the stream survives
    _run_stream(spark, src, d, str(tmp_path / "ckpt2"))
    assert _history(spark, d) == hist_after
    assert validate_scd2(spark, d)["ok"]


def test_scd2_stream_late_rows_policy(spark, dim_dir, tmp_path):
    """A cross-batch LATE change kills the stream by default (loud
    upstream-disorder signal); on_late='drop' filters it — including a
    late change to a soft-deleted key — and the dimension is untouched."""
    from pyspark.errors.exceptions.captured import StreamingQueryException

    d = dim_dir
    scd2_upsert(_dim(spark, [(1, "platinum", "eu", 20)]), d)
    deleting = spark.createDataFrame(
        [(2, None, None, 20, True)],
        "cust_id long, segment string, region string, effective_ts long, is_deleted boolean",
    )
    scd2_upsert(deleting, d, delete_col="is_deleted")
    hist_before = _history(spark, d)

    src = str(tmp_path / "late-src")
    _stream_src(spark, src, [
        (1, "stale", "eu", 15, False),   # late change: 15 <= open from 20
        (2, "ghost", "us", 12, False),   # late re-insert into retired history
    ])
    with pytest.raises(StreamingQueryException):
        _run_stream(spark, src, d, str(tmp_path / "ckpt-err"))
    assert _history(spark, d) == hist_before  # nothing leaked through

    _run_stream(spark, src, d, str(tmp_path / "ckpt-drop"), on_late="drop")
    assert _history(spark, d) == hist_before  # dropped, stream survived
    assert validate_scd2(spark, d)["ok"]


def test_scd2_model_based_random_histories(spark, tmp_path):
    """Model-based: random operation sequences (change / unchanged /
    delete / re-insert / new key / late row, random effectives) applied
    through scd2_upsert, mirrored in a pure-Python interval model.
    Outcomes must agree on every step (applied vs rejected AND the
    rejection kind), the final histories must be identical, and the
    trace must have exercised every outcome class (no vacuous run)."""
    import random

    rnd = random.Random(20260814)
    d = str(tmp_path / "model-dim")
    keys = list(range(6))
    create_scd2_table(
        _dim(spark, [(k, f"s{k}", "eu", 10) for k in keys[:4]]),
        d, ["cust_id"], "region",
    )
    # python model: key -> list of [from, to_or_None, segment, region]
    model = {k: [[10, None, f"s{k}", "eu"]] for k in keys[:4]}
    outcomes = {"applied": 0, "noop": 0, "stale": 0, "early": 0, "ghost": 0}

    def model_apply(k, seg, reg, eff, dele):
        """Returns the outcome the engine must produce, applying to the
        model when legal."""
        hist = model.get(k, [])
        open_iv = next((iv for iv in hist if iv[1] is None), None)
        if dele:
            if open_iv is None:
                last_to = max((iv[1] for iv in hist if iv[1] is not None), default=None)
                return "noop" if (last_to is not None and last_to == eff) else "ghost"
            if eff <= open_iv[0]:
                return "stale"
            open_iv[1] = eff
            return "applied"
        if open_iv is None:
            last_to = max((iv[1] for iv in hist if iv[1] is not None), default=None)
            if last_to is not None and eff < last_to:
                return "early"
            model.setdefault(k, []).append([eff, None, seg, reg])
            return "applied"
        if (open_iv[2], open_iv[3]) == (seg, reg):
            return "noop"
        if eff <= open_iv[0]:
            return "stale"
        open_iv[1] = eff
        model[k].append([eff, None, seg, reg])
        return "applied"

    for step in range(40):
        k = rnd.choice(keys)
        dele = rnd.random() < 0.2
        seg = rnd.choice(["a", "b", f"s{k}"])
        reg = rnd.choice(["eu", "us"])
        eff = rnd.randint(5, 60)
        want = model_apply(k, seg, reg, eff, dele)
        outcomes[want] += 1
        batch = spark.createDataFrame(
            [(k, None if dele else seg, None if dele else reg, eff, dele)],
            "cust_id long, segment string, region string, "
            "effective_ts long, is_deleted boolean",
        )
        try:
            scd2_upsert(batch, d, delete_col="is_deleted")
            got = "applied-or-noop"
        except ValueError as e:
            msg = str(e)
            got = ("stale" if "out-of-order" in msg
                   else "early" if "retired" in msg
                   else "ghost" if "unknown/closed" in msg
                   else f"unexpected: {msg}")
        if want in ("applied", "noop"):
            assert got == "applied-or-noop", (step, k, seg, reg, eff, dele, got)
        else:
            assert got == want, (step, k, seg, reg, eff, dele, got, want)

    # the random trace must have exercised EVERY outcome class
    assert all(n > 0 for n in outcomes.values()), outcomes

    want_hist = sorted(
        (k, iv[0], iv[1], iv[2])
        for k, ivs in model.items()
        for iv in ivs
    )
    assert _history(spark, d) == want_hist
    assert validate_scd2(spark, d)["ok"]
