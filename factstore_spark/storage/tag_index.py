"""Derived tag-index table — the 100 TB answer to the reference's
tags / tags+type secondary indexes (FdbFactStoreContext.kt:25-57).

At moderate scale, tag queries are a single scan with a map-column
predicate (plans/predicates.py) and need no index. At 100 TB the scan
reads every fact's tags map; a derived index table

    (tag_key, tag_value, type, position)    one row per fact-tag pair

partitioned by ``tag_key`` lets a tag query touch only the keys it
mentions, resolve matching positions there (tiny fraction of the data),
then semi-join the fact table on position — mirroring how the FDB
backend resolves positions from its tag subspaces and point-loads facts
(FdbFactFinder.kt:169-203), but set-at-a-time.

The index is DERIVED state: rebuilt from committed data (idempotent,
crash-safe — if it is missing or stale, readers fall back to the scan
path). ``built_through`` records the covered commit seq.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from ..schema import FACT_SCHEMA
from .layout import StoreLayout

try:  # pyspark>=4 moved it; keep both spellings importable
    from pyspark.errors import AnalysisException  # noqa: F811
except ImportError:  # pragma: no cover
    pass

INDEX_DIR = "tag_index"
META_FILE = "tag_index_meta.json"


class TagIndex:
    def __init__(self, layout: StoreLayout):
        self.layout = layout
        self.index_dir = os.path.join(layout.store_dir, INDEX_DIR)
        self.meta_path = os.path.join(layout.store_dir, META_FILE)

    def built_through(self) -> int:
        try:
            with open(self.meta_path) as f:
                return json.load(f)["built_through"]
        except (OSError, json.JSONDecodeError, KeyError):
            return -1

    def is_fresh(self) -> bool:
        last = self.layout.last_commit()
        return last is not None and self.built_through() >= last.seq

    def refresh(self, spark: SparkSession) -> dict:
        """Incremental index maintenance: append ONLY the commits with
        ``built_through < seq <= head`` into the index layout — the
        append-only analog of the reference's per-append index writes
        (FdbFactAppender index subspaces), amortized to commit
        granularity. Cost is proportional to the NEW data, not the
        store size.

        Falls back to a full ``build`` when (a) no index exists yet, or
        (b) a compaction superseded commits newer than ``built_through``
        (their per-commit files may be gone). A crash between the
        parquet append and the meta write can leave duplicate index
        rows on retry — harmless by construction (``positions_for_query``
        is set-semantics: intersect/union/distinct); a periodic full
        ``build`` compacts them away."""
        last = self.layout.last_commit()
        if last is None:
            return {"built": False, "rows": 0}
        bt = self.built_through()
        if bt >= last.seq:
            return {"built": False, "reason": "fresh", "through_seq": bt}
        compacted_through = max(
            (
                c.compacted_through
                for c in self.layout.read_commits()
                if c.compacted_through is not None
            ),
            default=-1,
        )
        if bt < 0 or not os.path.isdir(self.index_dir) or compacted_through > bt:
            return self.build(spark)
        new_files = self.layout.data_files_between(bt, last.seq)
        if new_files:
            df = spark.read.schema(FACT_SCHEMA).parquet(*new_files)
            idx = df.select(
                F.explode_outer("tags").alias("tag_key", "tag_value"),
                F.col("type"),
                F.col("position"),
            ).filter(F.col("tag_key").isNotNull())
            idx.repartition("tag_key").sortWithinPartitions(
                "tag_value", "position"
            ).write.partitionBy("tag_key").mode("append").parquet(self.index_dir)
        with open(self.meta_path, "w") as f:
            json.dump({"built_through": last.seq}, f)
        return {
            "built": True,
            "mode": "incremental",
            "through_seq": last.seq,
            "new_files": len(new_files),
        }

    def build(self, spark: SparkSession) -> dict:
        """Full (re)build: explode fact tags into the index layout.
        ``refresh`` appends only commits > built_through; the full
        rebuild remains the compaction path for the index itself."""
        # Snapshot the covered commit FIRST: a commit landing between
        # these two reads must leave the index stale (fallback to scan),
        # never fresh-but-incomplete.
        last = self.layout.last_commit()
        files = self.layout.data_files(max_seq=last.seq if last else None)
        if not files or last is None:
            return {"built": False, "rows": 0}
        df = spark.read.schema(FACT_SCHEMA).parquet(*files)
        idx = df.select(
            F.explode_outer("tags").alias("tag_key", "tag_value"),
            F.col("type"),
            F.col("position"),
        ).filter(F.col("tag_key").isNotNull())
        tmp = self.index_dir + ".tmp"
        idx.repartition("tag_key").sortWithinPartitions(
            "tag_value", "position"
        ).write.partitionBy("tag_key").mode("overwrite").parquet(tmp)
        # Swap via rename-aside, not rmtree-then-rename: the old tree's
        # teardown can take long on a big index, and a concurrent
        # indexed reader that resolved the path pre-swap would find it
        # half-gone. Two renames shrink the no-index window to
        # microseconds; the old generation is torn down AFTER the new
        # one is live. (POSIX has no atomic dir exchange; the freshness
        # gate re-checks per query, so post-swap readers always see a
        # complete tree.)
        old = self.index_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(self.index_dir):
            os.rename(self.index_dir, old)
        os.rename(tmp, self.index_dir)
        shutil.rmtree(old, ignore_errors=True)
        with open(self.meta_path, "w") as f:
            json.dump({"built_through": last.seq}, f)
        return {"built": True, "through_seq": last.seq}

    def read(self, spark: SparkSession) -> Optional[DataFrame]:
        """None when the index tree is absent — including the
        microseconds-wide two-rename swap window in build(): a reader
        landing exactly there must FALL BACK to the scan path (the
        documented contract), not surface an AnalysisException."""
        if not os.path.isdir(self.index_dir):
            return None
        try:
            return spark.read.parquet(self.index_dir)
        except AnalysisException:
            return None

    def positions_for_tags(self, spark: SparkSession, tags: dict[str, str]) -> DataFrame:
        """Position set for an AND-of-tags lookup (find_by_tags) —
        a single TagOnly item of the query algebra."""
        from ..model import TagOnlyQueryItem, TagQuery

        return self.positions_for_query(spark, TagQuery([TagOnlyQueryItem(dict(tags))]))

    def exists_after(self, query, after_pos: int) -> Optional[bool]:
        """Spark-free EXISTS check for the DCB append condition: does
        any fact with ``position > after_pos`` match the tag query?
        pyarrow-only because the append path may run without a Spark
        session; the hive layout (partitioned by ``tag_key``) means
        only the queried keys' directories are opened — the
        set-at-a-time analog of the reference walking its tag
        subspaces per condition (FdbFactAppender.kt:124-274).

        Returns None when the index layout is absent (caller falls
        back to the scan path). Freshness is the CALLER's check."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.dataset as pa_ds

        from ..model import TagOnlyQueryItem

        if not os.path.isdir(self.index_dir):
            return None
        try:
            dataset = pa_ds.dataset(self.index_dir, partitioning="hive")
        except (OSError, pa.ArrowInvalid):
            return None
        for item in query.items:
            sets = []
            short_circuit = False
            for k, v in item.tags.items():
                flt = (
                    (pa_ds.field("tag_key") == k)
                    & (pa_ds.field("tag_value") == v)
                    & (pa_ds.field("position") > after_pos)
                )
                if not isinstance(item, TagOnlyQueryItem):
                    flt = flt & pa_ds.field("type").isin(sorted(item.types))
                tbl = dataset.to_table(columns=["position"], filter=flt)
                arr = tbl["position"].combine_chunks().to_numpy(zero_copy_only=False)
                if arr.size == 0:
                    short_circuit = True  # this AND-item cannot match
                    break
                sets.append(np.unique(arr))
            if short_circuit or not sets:
                continue
            acc = sets[0]
            for s in sets[1:]:
                acc = np.intersect1d(acc, s, assume_unique=True)
                if acc.size == 0:
                    break
            if acc.size:
                return True
        return False

    def positions_for_query(self, spark: SparkSession, query) -> DataFrame:
        """Resolve the tag-query algebra to a position set using ONLY the
        index: per item, intersect per-tag position sets (AND) restricted
        to the item's types; union across items. Returns a 1-column
        ``position`` DataFrame."""
        from ..model import TagOnlyQueryItem

        idx = self.read(spark)
        if idx is None:
            return None  # swap window / missing tree: caller falls back
        item_dfs = []
        for item in query.items:
            tag_sets = []
            for k, v in item.tags.items():
                s = idx.filter(
                    (F.col("tag_key") == k) & (F.col("tag_value") == v)
                )
                if not isinstance(item, TagOnlyQueryItem):
                    s = s.filter(F.col("type").isin(*sorted(item.types)))
                tag_sets.append(s.select("position"))
            acc = tag_sets[0]
            for s in tag_sets[1:]:
                acc = acc.intersect(s)  # AND across the item's tags
            item_dfs.append(acc)
        out = item_dfs[0]
        for d in item_dfs[1:]:
            out = out.union(d)  # OR across items
        return out.distinct()
