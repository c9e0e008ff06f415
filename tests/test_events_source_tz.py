"""load_events must be timezone-independent: the (ts instant, ts_ns)
contract may not shift when the caller's session timezone is not UTC —
for every parquet ts encoding branch (NANOS-as-bigint, NTZ naive
micros). Guards the documented "works with ANY SparkSession" claim."""

import datetime
import os

import pytest
from pyspark.sql import functions as F

from factstore_spark.sources.events import load_events


def _collect_contract(spark, sf_dir):
    df = load_events(spark, sf_dir).select(
        "event_id", "ts_ns", F.unix_micros("ts").alias("instant_us")
    )
    return sorted(tuple(r) for r in df.limit(50).collect())


@pytest.fixture()
def tokyo_tz(spark):
    prev = spark.conf.get("spark.sql.session.timeZone")
    try:
        yield "Asia/Tokyo"
    finally:
        spark.conf.set("spark.sql.session.timeZone", prev)


def test_nanos_branch_is_tz_independent(spark, sf_dir, tokyo_tz):
    utc = _collect_contract(spark, sf_dir)
    spark.conf.set("spark.sql.session.timeZone", tokyo_tz)
    tokyo = _collect_contract(spark, sf_dir)
    assert utc == tokyo
    # sanity: ts_ns and the ts instant agree at micro precision
    assert all(ns // 1000 == us for _, ns, us in utc)


def test_ntz_branch_is_tz_independent(spark, tmp_path, tokyo_tz):
    # Synthesize an events.parquet whose ts column is TIMESTAMP_NTZ
    # (naive micros representing UTC wall-clock).
    ntz_dir = str(tmp_path / "sfntz")
    os.makedirs(ntz_dir)
    base = datetime.datetime(2024, 1, 15, 12, 30, 0)
    rows = [
        (i, base + datetime.timedelta(minutes=i), i % 3, "click", 1.0, "{}")
        for i in range(10)
    ]
    spark.createDataFrame(
        rows,
        schema="event_id long, ts timestamp_ntz, user_id long, "
        "event_type string, value double, props string",
    ).write.parquet(os.path.join(ntz_dir, "events.parquet"))

    utc = _collect_contract(spark, ntz_dir)
    # The NTZ wall-clock IS the UTC instant: 2024-01-15T12:30Z epoch.
    want_first_us = int(
        base.replace(tzinfo=datetime.timezone.utc).timestamp() * 1_000_000
    )
    assert utc[0] == (0, want_first_us * 1000, want_first_us)

    spark.conf.set("spark.sql.session.timeZone", tokyo_tz)
    tokyo = _collect_contract(spark, ntz_dir)
    assert utc == tokyo
