"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``factstore_spark.queries.REGISTRY`` — every
implemented operator from SURVEY.md §2 (finder semantics on the events
fact log) plus the beyond-reference pipeline operators (dedup,
similarity search, text analysis, multimodal) has a ``queries()`` entry;
all deterministic ones also carry a DuckDB ``oracle_sql()``.
``scripts/selfcheck.py`` replays the same comparison locally.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from factstore_spark import queries as q  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the fact-store tag-query (OR-of-AND algebra, the
    reference's richest read operator) over the sf0.001 events log."""
    return q.fs_find_by_tag_query(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return q.queries()


def oracle_sql() -> dict[str, str]:
    return q.oracle_sql()
