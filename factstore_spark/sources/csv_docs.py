"""CSV/TSV document source with a quarantine lane.

Corpus drops arrive as delimited text more often than anything else,
and at 100 TB one truncated line must not kill the job (the JSONL fact
source FAILFASTs because facts are transactional inputs; corpus
ingestion instead quarantines and counts — a bad-row RATE is a signal,
a bad row is not an error). PERMISSIVE parse + corrupt-record capture,
then a single pass splits clean rows from quarantined ones with a
reason column, all JVM-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

DOCS_CSV_SCHEMA = StructType(
    [
        StructField("doc_id", LongType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("source", StringType(), True),
        StructField("_corrupt", StringType(), True),
    ]
)

REQUIRED = ("doc_id", "text")


def read_documents_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
) -> tuple[DataFrame, DataFrame, "object"]:
    """Read delimited documents; returns ``(clean, quarantine,
    release)``.

    ``clean`` has the document columns with both required fields
    present; ``quarantine`` carries the raw line (for corrupt rows) or
    the parsed fragment plus a ``reason`` column — route it to a review
    sink and alert on its RATE. The parsed frame is persisted for the
    two derivations because Spark refuses to filter on the internal
    corrupt-record column of a lazy CSV scan (SPARK-38523 guidance);
    call ``release()`` once both frames are consumed — it unpersists
    the shared parent (the frames themselves cannot: unpersisting a
    derived frame is a no-op on its cached ancestor, and
    ``clearCache()`` would nuke unrelated caches like the dedup
    signature scopes)."""
    raw = (
        spark.read.schema(DOCS_CSV_SCHEMA)
        .option("header", "true")
        .option("sep", sep)
        .option("multiLine", "true")
        .option("escape", '"')
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(path)
        .persist()
    )
    corrupt = F.col("_corrupt").isNotNull()
    missing = F.lit(False)
    for c in REQUIRED:
        missing = missing | F.col(c).isNull()
    clean = raw.filter(~corrupt & ~missing).drop("_corrupt")
    reason = (
        F.when(corrupt, F.lit("unparseable line"))
        .when(F.col("doc_id").isNull(), F.lit("missing doc_id"))
        .otherwise(F.lit("missing text"))
    )
    quarantine = raw.filter(corrupt | missing).select(
        "doc_id",
        "lang",
        "source",
        F.coalesce(F.col("_corrupt"), F.col("text")).alias("raw"),
        reason.alias("reason"),
    )

    def release() -> None:
        raw.unpersist()

    return clean, quarantine, release
