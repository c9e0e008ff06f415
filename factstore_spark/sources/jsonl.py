"""JSONL fact source/sink — the batch analog of the reference's REST
append body (factstore-server/.../http/api.kt: type/subject/payload/
tags/metadata), for bulk-loading external fact dumps into a store and
exporting a store back out.

Input line shape:
  {"type": "...", "subject": "...", "payload": "<base64>" | null,
   "payload_format": "json" | null, "tags": {...}, "metadata": {...}}

All decoding is JVM-side (``unbase64``), no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    MapType,
    StringType,
    StructField,
    StructType,
)

JSONL_INPUT_SCHEMA = StructType(
    [
        StructField("type", StringType(), False),
        StructField("subject", StringType(), False),
        StructField("payload", StringType(), True),  # base64
        StructField("payload_format", StringType(), True),
        StructField("schema_ref", StringType(), True),
        StructField("tags", MapType(StringType(), StringType()), True),
        StructField("metadata", MapType(StringType(), StringType()), True),
    ]
)


def read_fact_inputs_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """JSONL file(s) -> FactInput-shaped DataFrame ready for
    ``FactStore.append_dataframe``.

    Ingest-time validation, not query-time corruption: malformed JSON
    lines fail the read (FAILFAST — the default PERMISSIVE mode turns
    a truncated line into an all-null row), and a well-formed line
    missing type/subject raises through the kept column itself (not a
    droppable side column, so Catalyst cannot prune the check away).
    Without this, one bad line would plant a null-typed fact that only
    explodes much later, at read time, far from its cause."""
    raw = spark.read.schema(JSONL_INPUT_SCHEMA).option("mode", "FAILFAST").json(path)

    def _required(col: str):
        return F.when(
            F.col(col).isNull() | (F.trim(F.col(col)) == ""),
            F.raise_error(
                F.concat(
                    F.lit(f"jsonl fact input missing required '{col}' (subject="),
                    F.coalesce(F.col("subject"), F.lit("null")),
                    F.lit(")"),
                )
            ),
        ).otherwise(F.col(col))

    return raw.select(
        # trim BOTH validated columns — trimming subject but not type
        # would let ' order ' pass validation and land verbatim,
        # silently missed by every type == 'order' filter downstream
        F.trim(_required("type")).alias("type"),
        F.trim(_required("subject")).alias("subject"),
        F.struct(
            # absent payload materializes as b'' — the model invariant
            # (FactPayload.data is non-null bytes, mirroring the
            # reference's ByteArray; "no payload" is not a fact state),
            # so the export/import cycle is faithful: b'' out, b'' back
            F.unbase64(F.coalesce(F.col("payload"), F.lit(""))).alias("data"),
            F.col("payload_format").alias("format"),
            F.col("schema_ref"),
        ).alias("payload"),
        F.coalesce(F.col("metadata"), F.create_map().cast("map<string,string>")).alias(
            "metadata"
        ),
        F.coalesce(F.col("tags"), F.create_map().cast("map<string,string>")).alias(
            "tags"
        ),
    )


def write_facts_jsonl(facts: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Export a fact DataFrame as JSONL (payload re-encoded base64)."""
    out = facts.select(
        "id",
        "type",
        "subject",
        F.date_format("appended_at", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX").alias(
            "appended_at"
        ),
        "position",
        F.base64(F.col("payload.data")).alias("payload"),
        F.col("payload.format").alias("payload_format"),
        F.col("payload.schema_ref").alias("schema_ref"),
        "metadata",
        "tags",
    )
    out.write.mode(mode).json(path)
