"""Driver-testdata ``events`` table -> fact envelope (FIXTURES.md §6).

Mapping: ``user:<user_id>`` -> subject, ``event_type`` -> type, event
attributes -> tags + JSON payload bytes, ``ts``/``event_id`` -> ingestion
order. All column work is JVM-side built-ins (to_json / create_map /
encode) — no Python UDFs.

The raw parquet ``ts`` encoding has varied across driver testdata
generations — TIMESTAMP(NANOS) (surfaces as BIGINT nanos under
``spark.sql.legacy.parquet.nanosAsLong``), TIMESTAMP(MICROS)
adjusted-to-UTC (Spark TIMESTAMP), or TIMESTAMP(MICROS) naive (Spark
TIMESTAMP_NTZ). ``load_events`` normalizes all three to the same
contract: ``ts`` = session-TZ (UTC) TIMESTAMP, ``ts_ns`` = BIGINT
epoch nanoseconds, so every downstream query and every DuckDB oracle
(``epoch_us(ts) == ts_ns div 1000``) is encoding-independent.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import ensure_nanos_readable


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw events with ``ts`` normalized to a microsecond timestamp and
    the original nanos kept as ``ts_ns``."""
    ensure_nanos_readable(spark)
    df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        df = df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    else:
        if ts_type == "timestamp_ntz":
            # Naive micros that REPRESENT UTC instants. A bare
            # NTZ->TIMESTAMP cast interprets the wall-clock in the
            # SESSION timezone — instant-shifting on any non-UTC
            # caller-supplied session. Route through convert_timezone
            # instead: render the UTC wall-clock in the session zone,
            # then let the cast re-interpret it there — net instant ==
            # wall-clock-as-UTC for ANY session timezone.
            df = df.withColumn(
                "ts",
                F.convert_timezone(
                    F.lit("UTC"), F.expr("current_timezone()"), F.col("ts")
                ).cast("timestamp"),
            )
        # unix_micros is instant-based, so ts_ns is TZ-independent in
        # both remaining branches.
        df = df.withColumn("ts_ns", F.unix_micros("ts") * F.lit(1000))
    return df


def events_as_facts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-envelope view of the events table. ``position`` = event_id
    (the source log offset is the ingestion order contract)."""
    ev = load_events(spark, sf_dir)
    return ev.select(
        F.concat(F.lit("event:"), F.col("event_id").cast("string")).alias("id"),
        F.col("event_type").alias("type"),
        F.concat(F.lit("user:"), F.col("user_id").cast("string")).alias("subject"),
        F.col("ts").alias("appended_at"),
        F.col("event_id").alias("position"),
        F.struct(
            F.encode(
                F.to_json(F.struct(F.col("value"), F.col("props"))), "UTF-8"
            ).alias("data"),
            F.lit("json").alias("format"),
            F.lit(None).cast("string").alias("schema_ref"),
        ).alias("payload"),
        F.create_map().cast("map<string,string>").alias("metadata"),
        F.map_from_arrays(
            F.array(F.lit("event_type"), F.lit("user")),
            F.array(
                F.col("event_type"),
                F.col("user_id").cast("string"),
            ),
        ).alias("tags"),
    )
