"""Subject-cardinality scale probe (VERDICT r12 task #1 "done"
criterion): append p90 must stay flat from 10^3 to 10^6 planted
subjects.

The round-12 design rewrote a {subject: head} map of EVERY subject ever
seen inside each append's critical section — per-append latency grew
linearly with lifetime subject cardinality (a ~100 MB json rewrite per
append at 10^6 subjects). The log-derived index (storage/heads.py)
writes no per-subject state on append, so the probe asserts two things:

1. **Structural**: the bytes an append writes outside its own data file
   are O(1) — the commit-log line stays a few hundred bytes regardless
   of how many subjects exist.
2. **Latency**: p90 of CONDITIONAL appends (ExpectedLastFact — the path
   that actually consults per-subject state, reference
   FdbFactAppender.kt:91-113) at 10^6 planted subjects stays within
   noise of 10^3 (generous 3x + floor bound; the old design was >100x).

Planting uses one Spark bulk ingest per decade + a snapshot fold, so
the probe runs in ~1-2 min, not the hours 10^6 row-wise appends would
take.
"""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from factstore_spark.model import ExpectedLastFact, FactInput, FactPayload
from factstore_spark.results import Appended
from factstore_spark.store import FactStore


def _fact(subject, n):
    return FactInput(
        type="Probe",
        subject=subject,
        payload=FactPayload(json.dumps({"n": n}).encode(), format="json"),
        tags={},
    )


def _plant(spark, fs, store, lo, hi):
    """Bulk-ingest subjects subj-<lo>..subj-<hi-1>, one fact each."""
    df = (
        spark.range(lo, hi)
        .select(
            F.lit("Planted").alias("type"),
            F.concat(F.lit("subj-"), F.col("id")).alias("subject"),
            F.struct(
                F.encode(F.lit("{}"), "utf-8").alias("data"),
                F.lit("json").alias("format"),
            ).alias("payload"),
            F.create_map().cast("map<string,string>").alias("tags"),
        )
    )
    res = fs.append_dataframe(store, df)
    assert isinstance(res, Appended), res


def _append_p90(fs, store, subjects):
    """p90 latency of conditional appends against hot subjects."""
    lay = fs._layout(fs.catalog.find_by_name(store).id)
    times = []
    for i, subj in enumerate(subjects):
        head = lay.last_fact_of_subject(subj)
        cond = ExpectedLastFact(subj, head[0] if head else None)
        t0 = time.perf_counter()
        r = fs.append(store, [_fact(subj, i)], condition=cond)
        times.append(time.perf_counter() - t0)
        assert isinstance(r, Appended), r
    times.sort()
    return times[int(len(times) * 0.9)]


def _log_bytes(fs, store):
    lay = fs._layout(fs.catalog.find_by_name(store).id)
    return os.path.getsize(os.path.join(lay.store_dir, "commits.jsonl"))


@pytest.mark.slow
def test_append_p90_flat_from_1k_to_1m_subjects(spark, store_root):
    fs = FactStore(spark, store_root)
    store = "cardinality-probe"
    fs.create(store)

    # decade 1: 10^3 subjects
    _plant(spark, fs, store, 0, 1_000)
    assert fs.refresh_heads_snapshot(store)["built"]
    probe_small = [f"subj-{i}" for i in range(0, 1_000, 50)]  # 20 appends
    size0 = _log_bytes(fs, store)
    p90_small = _append_p90(fs, store, probe_small)
    bytes_per_append_small = (_log_bytes(fs, store) - size0) / len(probe_small)

    # decade 2: grow to 10^6 subjects
    _plant(spark, fs, store, 1_000, 1_000_000)
    out = fs.refresh_heads_snapshot(store)
    assert out["built"], out
    probe_big = [f"subj-{i}" for i in range(0, 1_000_000, 50_000)]  # 20
    size1 = _log_bytes(fs, store)
    p90_big = _append_p90(fs, store, probe_big)
    bytes_per_append_big = (_log_bytes(fs, store) - size1) / len(probe_big)

    # structural: per-append metadata stays O(1) in subject cardinality
    assert bytes_per_append_big < 1024, bytes_per_append_big
    assert bytes_per_append_big < 2 * bytes_per_append_small + 256

    # latency: flat within noise (old design: >100x here)
    ceiling = max(3.0 * p90_small, p90_small + 0.25)
    assert p90_big <= ceiling, (
        f"append p90 grew with subject cardinality: "
        f"{p90_small * 1e3:.1f} ms @1k -> {p90_big * 1e3:.1f} ms @1M "
        f"(ceiling {ceiling * 1e3:.1f} ms)"
    )

    # and the 1M-subject store still resolves cold + absent subjects
    lay = fs._layout(fs.catalog.find_by_name(store).id)
    assert lay.last_fact_of_subject("subj-999999") is not None
    assert lay.last_fact_of_subject("subj-absent") is None


def _plant_dated(spark, fs, store, lo, hi, day_mod=30, base="2026-01-01"):
    """Bulk-ingest subjects with appended_at spread over ``day_mod``
    PAST dates (or one fixed date when day_mod == 0 and base names the
    day) — so incremental compaction's date-partition math is
    exercised the way a steady server-time store exercises it."""
    date_col = (
        F.to_timestamp(F.lit(base))
        if day_mod == 0
        else F.to_timestamp(
            F.date_add(F.lit(base).cast("date"), (F.col("id") % day_mod).cast("int"))
        )
    )
    df = spark.range(lo, hi).select(
        F.lit("Planted").alias("type"),
        F.concat(F.lit("subj-"), F.col("id")).alias("subject"),
        F.struct(
            F.encode(F.lit("{}"), "utf-8").alias("data"),
            F.lit("json").alias("format"),
        ).alias("payload"),
        F.create_map().cast("map<string,string>").alias("tags"),
        date_col.alias("appended_at"),
    )
    res = fs.append_dataframe(store, df)
    assert isinstance(res, Appended), res


@pytest.mark.slow
def test_maintain_cost_flat_in_history(spark, store_root):
    """VERDICT r13 tasks #1/#5 'done' criterion: maintenance cost must
    be O(new data + touched partitions), never O(store history). Plant
    300k rows over 30 date partitions and pay the full first maintain
    once; then two small-delta cycles (2k rows each, one fresh date
    partition apiece) must (a) fold the heads snapshot INCREMENTALLY —
    refresh() never reports a rebuild mode on a snapshot-bearing store
    across compacting cycles, the r13 scale defect — and (b) cost a
    small fraction of the full maintain's wall time, cycle over cycle."""
    fs = FactStore(spark, store_root)
    store = "maint-flat-probe"
    fs.create(store)
    _plant_dated(spark, fs, store, 0, 300_000, day_mod=30)
    t0 = time.perf_counter()
    st0 = fs.maintain(store)
    wall_full = time.perf_counter() - t0
    assert st0["compact"].get("compacted"), st0["compact"]

    walls = []
    for cycle in range(2):
        lo = 300_000 + cycle * 2_000
        _plant_dated(
            spark, fs, store, lo, lo + 2_000,
            day_mod=0, base=f"2026-03-{10 + cycle:02d}",
        )
        t1 = time.perf_counter()
        st = fs.maintain(store)
        walls.append(time.perf_counter() - t1)
        pre = st["heads_snapshot_pre"]
        assert pre["built"] and pre["mode"] == "incremental", (cycle, pre)
        assert pre.get("gap_rows") == 2_000, pre
        post = st["heads_snapshot_post"]
        assert not str(post.get("mode", "")).startswith("rebuild"), (cycle, post)
        assert st["compact"].get("compacted"), (cycle, st["compact"])

    # O(new data): each small-delta cycle costs a fraction of the full
    # maintain (which compacted + folded 300k rows); generous 60% bound
    # — the r13 behavior (full heads rebuild per cycle) sat near 100%.
    for w in walls:
        assert w < 0.6 * wall_full, (walls, wall_full)
    # and cycle-over-cycle flat (same delta size -> same cost, 3x noise)
    assert max(walls) < 3.0 * min(walls) + 1.0, walls

    # exactness after all folds: hot, planted and absent subjects
    lay = fs._layout(fs.catalog.find_by_name(store).id)
    assert lay.last_fact_of_subject("subj-301999") is not None
    assert lay.last_fact_of_subject("subj-5") is not None
    assert lay.last_fact_of_subject("subj-absent") is None
