"""Optimistic (lock-free claim-retry) backend: full engine lifecycle —
appends, conditions, idempotency, bulk reserve/publish, finders,
replay, compaction — must behave identically to the flock backend.
The cross-process races live in test_multiprocess_race.py."""

import pytest
from pyspark.sql import functions as F

from factstore_spark import ExpectedLastFact, FactInput, TagOnlyQueryItem, TagQuery
from factstore_spark.results import AlreadyApplied, Appended, AppendConditionViolated
from factstore_spark.store import FactStore

STORE = "opt-store"


@pytest.fixture()
def fso(spark, store_root):
    return FactStore(spark, store_root, commit_backend="optimistic")


def test_append_and_finders_roundtrip(fso):
    fso.create(STORE)
    r1 = fso.append(STORE, FactInput(type="A", subject="S1", tags={"k": "v"}))
    r2 = fso.append(STORE, FactInput(type="B", subject="S1"))
    assert isinstance(r1, Appended) and isinstance(r2, Appended)
    assert r2.positions[0] > r1.positions[0]

    hist = fso.find_by_subject(STORE, "S1")
    assert [f.type for f in hist.facts] == ["A", "B"]
    tagged = fso.find_by_tags(STORE, {"k": "v"})
    assert len(tagged.facts) == 1
    assert fso.find_by_id(STORE, r1.fact_ids[0]).fact.type == "A"


def test_conditions_and_idempotency(fso):
    fso.create(STORE)
    r1 = fso.append(STORE, FactInput(type="A", subject="S"),
                    condition=ExpectedLastFact("S", None))
    assert isinstance(r1, Appended)
    stale = fso.append(STORE, FactInput(type="B", subject="S"),
                       condition=ExpectedLastFact("S", None))
    assert isinstance(stale, AppendConditionViolated)

    key = "11111111-2222-3333-4444-555555555555"
    a = fso.append(STORE, FactInput(type="C", subject="S"), idempotency_key=key)
    b = fso.append(STORE, FactInput(type="C", subject="S"), idempotency_key=key)
    assert isinstance(a, Appended) and isinstance(b, AlreadyApplied)


def test_bulk_reserve_publish_roundtrip(fso, spark):
    fso.create(STORE)
    fso.append(STORE, FactInput(type="ROW", subject="pre"))
    df = spark.range(50).repartition(4).select(
        F.lit("BULK").alias("type"),
        F.concat(F.lit("S"), F.col("id")).alias("subject"),
        F.struct(
            F.lit(b"").alias("data"),
            F.lit(None).cast("string").alias("format"),
            F.lit(None).cast("string").alias("schema_ref"),
        ).alias("payload"),
        F.create_map().cast("map<string,string>").alias("metadata"),
        F.create_map().cast("map<string,string>").alias("tags"),
    )
    res = fso.append_dataframe(STORE, df)
    assert isinstance(res, Appended)
    lo, hi = res.positions
    assert hi - lo == 49
    # row append after bulk lands above the published range
    after = fso.append(STORE, FactInput(type="ROW", subject="post"))
    assert after.positions[0] > hi
    assert fso.facts_df(STORE).count() == 52
    # bulk idempotency through reserve/publish
    key = "99999999-8888-7777-6666-555555555555"
    fso.append_dataframe(STORE, df, idempotency_key=key)
    again = fso.append_dataframe(STORE, df, idempotency_key=key)
    assert isinstance(again, AlreadyApplied)
    # caller-position validation still enforced
    bad = df.withColumn("position", F.lit(-1))
    assert isinstance(fso.append_dataframe(STORE, bad), AppendConditionViolated)


def test_replay_and_compaction(fso):
    fso.create(STORE)
    for i in range(30):
        fso.append(STORE, FactInput(type=f"T{i % 3}", subject=f"S{i % 5}",
                                    tags={"p": str(i % 2)}))
    batches = list(fso.replay(STORE))
    all_rows = [f for b in batches for f in b]
    assert len(all_rows) == 30
    positions = [f.position for f in all_rows]
    assert positions == sorted(positions)

    stats = fso.compact(STORE)
    assert stats["compacted"]
    q = TagQuery([TagOnlyQueryItem({"p": "1"})])
    assert len(fso.find_by_tag_query(STORE, q).facts) == 15
    # appends keep working after compaction (claim log + compaction record coexist)
    r = fso.append(STORE, FactInput(type="NEW", subject="S-new"))
    assert isinstance(r, Appended)
    assert fso.facts_df(STORE).count() == 31
