"""Bucketed table layout — the shuffle-elimination lever for repeated
big-x-big joins at 100 TB.

A join between two tables bucketed by the join key into the same
bucket count is co-located: every bucket pair meets on one task and
the exchange disappears from the plan entirely (the shuffle was paid
ONCE at write time instead of on every query). This is the Spark
analog of the reference keeping facts pre-sharded in its KV subspaces
(FdbFactStoreContext.kt:25-57): layout chosen at write time so reads
never redistribute.

When to bucket: a fact table joined on the same key by many recurring
queries (orderkey, user_id, doc_id), too big to broadcast either side.
When NOT to: one-off joins (the write-side shuffle costs the same as
the query-side one) or keys with pathological skew (one giant bucket —
salt first). ``sort_col`` additionally makes each bucket file sorted,
so the merge join needs no per-task sort either.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    bucket_col: str,
    n_buckets: int = 64,
    sort_col: Optional[str] = None,
) -> None:
    """Persist ``df`` as an external parquet table bucketed (and
    optionally per-bucket sorted) by the join key. Bucket metadata
    lives in the session catalog — reads via ``spark.table`` see the
    bucketing and plan co-located joins."""
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, bucket_col)
    )
    if sort_col is not None:
        writer = writer.sortBy(sort_col)
    writer.saveAsTable(table_name)
