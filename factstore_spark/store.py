"""FactStore — the PySpark-native engine facade.

Implements the union of the reference's 7 component interfaces
(FactStore.kt:18-25): StoreFactory, StoreFinder, StoreRemover,
FactAppender, FactFinder, FactReplayer, FactSubscriber.

Design (SURVEY.md §7):

- Every read operator is a declarative DataFrame plan over the store's
  parquet data — Catalyst does pushdown/pruning where the reference
  hand-wires secondary-index scans (FdbFactFinder.kt). Each finder has a
  ``*_df`` variant returning the lazy DataFrame (the 100 TB path) and a
  materializing variant returning the reference's sealed result types.
- The append path is a commit protocol, not a DataFrame op: a per-store
  critical section runs check-idempotency -> evaluate-condition ->
  assign ids/instant/positions -> write parquet + commit line, mirroring
  the single FDB transaction in FdbFactAppender.kt:33-65. On a cluster
  the same protocol maps onto a Delta optimistic commit; the lock is the
  local stand-in for transaction conflict ranges.
- Positions (commit_seq * 2^20 + row_idx) replace FDB versionstamps as
  the store-wide total order; all cursors and replay bounds are positions.
"""

from __future__ import annotations

import os
import time
import uuid
from datetime import datetime, timezone
from typing import Iterable, Iterator, Optional, Sequence, Union

import pyarrow.dataset as pa_ds
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .model import (
    AllConditions,
    AppendCondition,
    ExpectedLastFact,
    Fact,
    FactInput,
    NoCondition,
    ReadDirection,
    ReplayStart,
    StartPosition,
    StoreMetadata,
    TagQuery,
    TagQueryBased,
    TimeRange,
    batch_matches_tag_query,
    fact_matches_tag_query,
    new_fact_id,
    validate_limit,
    validate_store_name,
)
from .plans.predicates import (
    compacted_date_bounds,
    ordered_limited,
    tag_query_predicate,
    tags_all_match,
    time_range_predicate,
)
from .results import (
    AlreadyApplied,
    Appended,
    AppendConditionViolated,
    AppendResult,
    CreateStoreResult,
    DoesNotExist,
    Exists,
    ExistsByIdResult,
    FactFound,
    FactIdNotFound,
    FactNotFound,
    FactsFound,
    FindByIdResult,
    FindResult,
    RemoveStoreResult,
    StoreCreated,
    StoreNameAlreadyExists,
    StoreNotFound,
    StoreRemoved,
)
from .schema import FACT_SCHEMA, row_to_fact
from .storage.catalog import Catalog
from .storage.layout import StoreLayout, utcnow_us

DEFAULT_BATCH_SIZE = 10_000  # FdbFactStreamer.kt:22


def _fresh_or_valid_key(idempotency_key: Optional[str]) -> str:
    """None -> fresh key (a convenience append is NOT retry-idempotent,
    FactAppender.kt:16-42). A caller-supplied key must be non-blank:
    the falsy-or idiom would silently replace "" with a fresh UUID,
    downgrading the call to non-idempotent with no error."""
    if idempotency_key is None:
        return str(uuid.uuid4())
    if not idempotency_key.strip():
        raise ValueError("idempotency_key must be non-blank")
    return idempotency_key


def assign_contiguous_positions(df: DataFrame, base: int, with_count: bool = False):
    """Assign contiguous positions ``base..base+n-1`` across an
    arbitrarily-partitioned frame with NO shuffle and NO global sort
    (the naive ``row_number() over (order by ...)`` collapses the whole
    ingest batch onto one partition — the exact anti-pattern at 100 TB).

    zipWithIndex-style: ``monotonically_increasing_id()`` encodes
    ``(partition_id << 33) + intra-partition row counter``, so one
    column-pruned count job per partition plus a map-only projection
    yields global contiguous positions. Requires the input partitioning
    to be stable across the two jobs — true for any deterministic
    source plan (file scans, shuffle outputs); the same contract as
    ``RDD.zipWithIndex``."""
    pid = F.spark_partition_id()
    pcounts = sorted(
        df.groupBy(F.spark_partition_id().alias("_pid")).count().collect(),
        key=lambda r: r["_pid"],
    )
    offsets: dict[int, int] = {}
    acc = 0
    for r in pcounts:
        offsets[r["_pid"]] = acc
        acc += r["count"]
    if not offsets:
        out = df.withColumn("position", F.lit(base).cast("long"))
        return (out, 0) if with_count else out
    off_map = F.create_map(*[F.lit(x) for kv in offsets.items() for x in kv])
    intra = F.monotonically_increasing_id() - F.shiftleft(pid.cast("long"), 33)
    out = df.withColumn(
        "position", (F.lit(base) + off_map[pid] + intra).cast("long")
    )
    # acc == total rows: callers get the count of the SAME evaluation
    # the offsets came from instead of paying a separate df.count()
    return (out, acc) if with_count else out


def _written_positions_agg(spark, files):
    """One-pass (count, min, max, countDistinct) over a written bulk
    commit's position column — the shared kernel of the post-write
    total-order/unique-position validation in BOTH bulk append paths
    (the invariant is checked on the WRITTEN data, never the plan that
    produced it)."""
    return (
        spark.read.schema(FACT_SCHEMA)
        .parquet(*files)
        .agg(
            F.count("*").alias("n"),
            F.min("position").alias("lo"),
            F.max("position").alias("hi"),
            F.countDistinct("position").alias("nd"),
            # Subject-cardinality estimate riding the same job (HLL —
            # no distinct-agg Expand, no extra scan): gates whether the
            # subj_fps skipping summary is worth computing at all.
            F.approx_count_distinct("subject").alias("ns"),
        )
        .collect()[0]
    )


def _written_subject_fps(spark, files, ns_approx: int, n_rows: int):
    """Distinct subject fingerprints of a written bulk commit (the
    heads-lookup skipping summary, capped at MAX_SUBJ_FPS). Three-way
    split, sized by facts the validation aggregate already computed:

    - estimate over the cap -> None, zero extra work (the summary
      would cap out anyway);
    - small commit -> the driver-side pyarrow column stream (reading a
      few hundred thousand subject values in-process beats a Spark
      job's ~200 ms scheduling floor — the common case for streaming
      micro-batches and upsert benches);
    - large commit -> one column-pruned Spark job with an early LIMIT.
      The r13 version streamed EVERY bulk commit on the driver —
      O(commit) single-threaded work per ingest, the write-path bench
      regression (VERDICT r13 task #3 / ADVICE)."""
    from .storage.layout import MAX_SUBJ_FPS, files_subject_fps

    # HLL rsd is 5% by default; 4x headroom makes a false 'over cap'
    # (losing only an optional skipping summary, never correctness)
    # essentially impossible near the 64-subject boundary.
    if ns_approx > MAX_SUBJ_FPS * 4:
        return None
    if n_rows <= 2_000_000:
        return files_subject_fps(files)
    # Must equal layout.subject_fingerprint: md5 hex prefix (60 bits)
    # base-16 — the same expression the distributed snapshot rebuild
    # uses (storage/heads.py _rebuild_spark).
    fp = F.conv(F.substring(F.md5("subject"), 1, 15), 16, 10).cast("long")
    rows = (
        spark.read.schema(FACT_SCHEMA)
        .parquet(*files)
        .select(fp.alias("fp"))
        .distinct()
        .limit(MAX_SUBJ_FPS + 1)
        .collect()
    )
    if len(rows) > MAX_SUBJ_FPS:
        return None
    return sorted(int(r["fp"]) for r in rows)


class _CommitGroup:
    """Per-store group-commit queue for the flock append path (round
    15, guide §2.6/§5 applied to the commit protocol).

    Racing appends enqueue; whichever waiter finds the leader slot free
    drains the queue and executes every queued append's check-and-append
    sequentially under ONE flock acquisition — the per-append logic and
    the state each evaluation sees are exactly those of the old
    per-append locking (each ``work`` reads the commit log, which
    already contains the batch's earlier lines) — then ONE fsync
    (layout.sync_commit_log) makes the whole batch durable before any
    caller is acked. Amortizes both the flock round trip and the fsync
    (the durability floor, ~70% of an uncontended append) across the
    queue depth; an uncontended append is a batch of one and costs what
    it always did.

    Exception containment: a ``work`` that raises (including the fault
    suite's BaseException kill) fails only ITS caller; later batch
    members proceed, exactly like a writer dying and the next lock
    holder continuing (the orphan sweep covers its debris). If the
    group fsync itself fails, every batch member that wrote a line gets
    the failure — none of their commits is known durable."""

    def __init__(self) -> None:
        import threading

        self._mu = threading.Lock()
        self._cv = threading.Condition(self._mu)
        self._pending: list[list] = []
        self._leader_busy = False

    def run(self, layout, work):
        """Execute ``work`` (no args; returns (result, sync_ticket))
        under the store's commit lock as part of a batch; returns
        work's result after the batch's group fsync covers it."""
        item = [work, None, None, False, 0]  # fn, result, exc, done, ticket
        with self._mu:
            self._pending.append(item)
            while not item[3] and self._leader_busy:
                self._cv.wait()
            if item[3]:
                if item[2] is not None:
                    raise item[2]
                return item[1]
            self._leader_busy = True
            batch = self._pending
            self._pending = []
        try:
            max_ticket = 0
            with layout.commit_lock(upkeep="cadence"):
                for it in batch:
                    try:
                        it[1], it[4] = it[0]()
                        max_ticket = max(max_ticket, it[4])
                    except BaseException as exc:  # noqa: BLE001 — kill-fault analog
                        it[2] = exc
            if max_ticket > 0:
                try:
                    layout.sync_commit_log(max_ticket)
                except BaseException as exc:  # noqa: BLE001
                    for it in batch:
                        if it[2] is None and it[4] > 0:
                            it[2] = exc
        finally:
            with self._mu:
                self._leader_busy = False
                for it in batch:
                    it[3] = True
                self._cv.notify_all()
        if item[2] is not None:
            raise item[2]
        return item[1]


class FactStore:
    """Engine entry point. ``root`` is the storage directory; ``spark``
    is any SparkSession (the engine sets no global configs).

    The append path is Spark-free (pyarrow + the commit protocol), so a
    writer process may pass ``spark=None`` — only readers/maintenance
    need a session. This mirrors the reference's split between the
    transactional write path and the scan machinery."""

    def __init__(self, spark: SparkSession, root: str, commit_backend: str = "flock"):
        """``commit_backend``: "flock" (default — per-store fcntl lock,
        single-node) or "optimistic" (lock-free claim-retry commit log,
        the Delta/Iceberg-shaped protocol; see storage/optimistic.py).
        The optimistic CAS substrate is selectable (storage/cas.py):
        "optimistic+hardlink" (default), "optimistic+excl"
        (create-no-overwrite, the HDFS shape), or
        "optimistic+objstore://host:port/key" (conditional PUT against
        an ObjectStoreServer). All writers of a store must use the same
        backend."""
        if commit_backend != "flock" and not commit_backend.startswith("optimistic"):
            raise ValueError(f"unknown commit backend: {commit_backend!r}")
        if commit_backend.startswith("optimistic"):
            slot_spec = commit_backend[len("optimistic"):].lstrip("+")
            if slot_spec not in ("", "hardlink", "excl") and not slot_spec.startswith(
                "objstore://"
            ):
                raise ValueError(f"unknown commit backend: {commit_backend!r}")
            self._slot_spec = slot_spec
        else:
            self._slot_spec = None
        self.spark = spark
        self.root = root
        self.commit_backend = commit_backend
        self.catalog = Catalog(root)
        self._layouts: dict[str, StoreLayout] = {}
        # Per-store group-commit queues (flock append path; see
        # _CommitGroup). dict.setdefault is atomic under the GIL, so
        # racing first appends share one queue.
        self._commit_groups: dict[str, _CommitGroup] = {}
        # Optimistic-claim conflicts retried by this handle (soak
        # observability: retries/commit = this / commits appended).
        self.append_conflict_retries = 0

    # ------------------------------------------------------------------
    # Store management (StoreFactory / StoreFinder / StoreRemover)
    # ------------------------------------------------------------------

    def create(self, name: str) -> CreateStoreResult:
        """StoreFactory.kt:3-7; name rules StoreName.kt:7-9."""
        if not validate_store_name(name):
            raise ValueError(f"invalid store name: {name!r}")
        meta = self.catalog.create(name)
        if meta is None:
            return StoreNameAlreadyExists(name)
        self._layout(meta.id).initialize()
        return StoreCreated(meta)

    def list_all(self) -> list[StoreMetadata]:
        return self.catalog.list_all()

    def exists_by_name(self, name: str) -> bool:
        return self.catalog.find_by_name(name) is not None

    def find_by_name(self, name: str) -> Optional[StoreMetadata]:
        return self.catalog.find_by_name(name)

    def remove(self, name: str) -> RemoveStoreResult:
        """StoreRemover.kt:3-7 — drops facts, commit log, idempotency keys
        (the 12-subspace clear of FdbStoreRemover.kt:209-235 collapses to
        one directory tree)."""
        meta = self.catalog.remove(name)
        if meta is None:
            return StoreNotFound(name)
        import shutil

        store_dir = self._store_dir(meta.id)
        if os.path.isdir(store_dir):
            from .storage.bloomindex import release_sidecar_cache

            # unpin a cached id-index sidecar before its dir vanishes
            release_sidecar_cache(os.path.join(store_dir, "ididx"))
            shutil.rmtree(store_dir)
        return StoreRemoved(name)

    def stores_df(self) -> DataFrame:
        """Catalog as a DataFrame (SURVEY.md §1.3 `stores` table)."""
        rows = [(m.id, m.name, m.created_at) for m in self.list_all()]
        return self.spark.createDataFrame(rows, "id string, name string, created_at timestamp")

    # ------------------------------------------------------------------
    # Append path (FactAppender)
    # ------------------------------------------------------------------

    def append(
        self,
        store_name: str,
        facts: Union[FactInput, Sequence[FactInput]],
        *,
        condition: AppendCondition = NoCondition(),
        idempotency_key: Optional[str] = None,
    ) -> AppendResult:
        """Atomic (all-or-nothing) append of one or more facts with
        optional idempotency + condition (AppendRequest.kt:37-106).

        Convenience overloads without an explicit key get a fresh key per
        call, hence are NOT retry-idempotent (FactAppender.kt:16-42).
        """
        if isinstance(facts, FactInput):
            facts = [facts]
        facts = list(facts)
        if not facts:
            raise ValueError("append requires at least one fact")
        key = _fresh_or_valid_key(idempotency_key)

        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        layout = self._layout(meta.id)

        def build_rows(fact_ids, appended_at):
            return [
                {
                    "id": fid,
                    "type": f.type,
                    "subject": f.subject,
                    "appended_at": appended_at,
                    "position": 0,  # assigned by the layout at commit
                    "payload": {
                        "data": bytes(f.payload.data),
                        "format": f.payload.format,
                        "schema_ref": f.payload.schema_ref,
                    },
                    "metadata": dict(f.metadata),
                    "tags": dict(f.tags),
                }
                for fid, f in zip(fact_ids, facts)
            ]

        from .storage.optimistic import OptimisticStoreLayout

        if isinstance(layout, OptimisticStoreLayout):
            # Optimistic protocol (the FDB-transaction shape itself):
            # evaluate conditions against a snapshot, attempt to claim
            # the next seq; a conflict means another commit serialized
            # ahead of us — re-read, RE-EVALUATE the condition against
            # the new state, retry (FdbFactAppender.kt:33-65). Under
            # SUSTAINED contention (the r12 soak: 8 writers hammering
            # one store) a bare loop keeps every loser re-colliding
            # with the same rivals each round — measured 5.7-6.0
            # conflicts/commit at 8 writers. Jittered exponential
            # backoff desynchronizes the losers (1.1-2.8 measured,
            # sub-linear in writers) while adding nothing to the
            # uncontended path (first retry is sub-millisecond).
            # Numbers: docs/SCALE.md round-13 soak.
            import random as _random
            import time as _time

            for attempt in range(256):
                commits = layout.read_commits()
                if layout.idempotency_key_seen(key, commits):
                    return AlreadyApplied(key)
                violation = self._evaluate_condition(layout, condition)
                if violation is not None:
                    return AppendConditionViolated(violation)
                appended_at = utcnow_us()
                fact_ids = [new_fact_id() for _ in facts]
                res = layout.try_append_commit(
                    build_rows(fact_ids, appended_at), appended_at, key, commits
                )
                if res is not None:
                    _, positions = res
                    return Appended(tuple(fact_ids), appended_at, tuple(positions))
                self.append_conflict_retries += 1
                _time.sleep(
                    _random.uniform(0.0, min(0.05, 0.0005 * (1 << min(attempt, 7))))
                )
            raise RuntimeError("append contention: 256 optimistic retries exhausted")

        # The critical section = the FDB transaction (FdbFactAppender.kt:33-65).
        # Hot path: reconciliation upkeep runs on a cadence, not per append.
        # GROUP COMMIT (round 15, guide §2.6/§5 applied to the commit
        # protocol): the commit-log fsync was ~70% of an uncontended
        # append (11.6 of 16.9 ms), and every queued writer used to
        # pay its own fsync INSIDE the flock — the k6 probe's p50 was
        # pure fsync queueing at 10 VUs. Racing appends now drain in
        # batches: whichever thread becomes leader executes every
        # queued append's check-and-append sequentially under ONE
        # flock acquisition (identical per-append logic and state —
        # each evaluation sees all earlier queued commits through
        # read_commits, exactly as the old per-append locking did),
        # then ONE fsync makes the whole batch durable before anyone
        # is acked. Durability contract unchanged (no ack before
        # fsync); an uncontended append is a batch of one and costs
        # exactly what it used to.

        def work() -> tuple[object, int]:
            # one incremental parse refreshes the derived log view;
            # key/seq/head checks below are then O(1) lookups instead
            # of per-append scans of every commit record (round 15)
            layout.read_commits()
            if layout.idempotency_key_seen(key):
                return AlreadyApplied(key), 0

            violation = self._evaluate_condition(layout, condition)
            if violation is not None:
                return AppendConditionViolated(violation), 0

            appended_at = utcnow_us()  # one shared instant per batch (AppendResult.kt:23-29)
            fact_ids = [new_fact_id() for _ in facts]  # server-assigned (FactInput.kt:37-45)
            _, positions, ticket = layout.append_commit(
                build_rows(fact_ids, appended_at), appended_at, key,
                defer_sync=True,
            )
            return Appended(tuple(fact_ids), appended_at, tuple(positions)), ticket

        group = self._commit_groups.setdefault(meta.id, _CommitGroup())
        return group.run(layout, work)

    def _evaluate_condition(
        self, layout: StoreLayout, condition: AppendCondition
    ) -> Optional[str]:
        """Evaluate under the commit lock; returns violation reason or None.

        ExpectedLastFact uses the O(1) subject-head state (the analog of
        the reverse limit-1 subject-index scan, FdbFactAppender.kt:91-113).
        TagQueryBased scans only (type, tags, position) columns with the
        position bound pushed to the parquet reader — the EXISTS-after-
        cursor check of FdbFactAppender.kt:124-274.
        """
        if isinstance(condition, NoCondition):
            return None
        if isinstance(condition, AllConditions):
            for sub in condition.conditions:
                v = self._evaluate_condition(layout, sub)
                if v is not None:
                    return v
            return None
        if isinstance(condition, ExpectedLastFact):
            head = layout.last_fact_of_subject(condition.subject)
            actual = head[0] if head else None
            if actual != condition.expected_last_fact_id:
                return (
                    f"expected last fact of {condition.subject!r} to be "
                    f"{condition.expected_last_fact_id}, was {actual}"
                )
            return None
        if isinstance(condition, TagQueryBased):
            after_pos = -1
            if condition.after is not None:
                pos = layout.position_of_fact(condition.after)
                if pos is None:
                    return f"after-cursor fact {condition.after} not found"
                after_pos = pos
            # Derived tag index first: when it covers the current head,
            # the EXISTS check touches only the queried keys' index
            # partitions and opens ZERO fact files — the direct analog
            # of the reference's per-condition tag-subspace walk
            # (FdbFactAppender.kt:124-274). pyarrow-only (the append
            # path may have no Spark session); staleness falls through
            # to the scan path below, so the index is never a
            # correctness dependency.
            from .storage.tag_index import TagIndex

            tidx = TagIndex(layout)
            last = layout.last_commit()
            bt = tidx.built_through()
            scan_after_seq = -1
            if last is not None and bt >= 0:
                hit = tidx.exists_after(condition.fail_if_facts_match, after_pos)
                if hit:
                    # an index HIT is trustworthy at any staleness:
                    # facts are immutable and never deleted, so a
                    # matching indexed position stays a violation
                    return "facts matching the fail-if query exist after the cursor"
                if hit is not None:
                    if bt >= last.seq:
                        return None  # fully fresh index answered NO
                    # STALE index (the steady-ingest case — at high
                    # append rates the cron-refreshed index is stale
                    # for almost every DCB append): its NO covers
                    # commits <= built_through, so only the unindexed
                    # TAIL needs the scan below — O(commits since the
                    # last maintain), not O(store). r12 task #6: this
                    # is what keeps DCB append p90 flat on a 10^6-fact
                    # store whose index lags the head.
                    scan_after_seq = bt
            # Commit-level data skipping next: prune to the files whose
            # commit tag-fingerprint summary could satisfy some query
            # item (O(commits) record check, no file opens — the write-
            # path analog of the reference's tag-subspace walk). Then a
            # streamed batch scan with early exit over the survivors,
            # evaluating the tag algebra SET-AT-A-TIME (pyarrow.compute
            # + numpy) rather than a per-row interpreter loop.
            from .storage.layout import tag_fingerprint

            item_fps = [
                [tag_fingerprint(k, v) for k, v in item.tags.items()]
                for item in condition.fail_if_facts_match.items
            ]
            files = layout.dcb_candidate_files(
                item_fps, after_pos, after_seq=scan_after_seq
            )
            if not files:
                return None
            flt = pa_ds.field("position") > after_pos
            for batch in layout.scan_batches(
                columns=["type", "tags"], filter=flt, batch_size=8192, files=files
            ):
                if batch_matches_tag_query(batch, condition.fail_if_facts_match):
                    return "facts matching the fail-if query exist after the cursor"
            return None
        raise TypeError(f"unknown condition: {condition!r}")

    def append_dataframe(
        self, store_name: str, df: DataFrame, *, idempotency_key: Optional[str] = None
    ) -> AppendResult:
        """Bulk-ingest path: one logical commit whose rows are written by
        Spark executors in parallel (the 100 TB ingest route; the row-wise
        ``append`` is the transactional OLTP route).

        ``df`` must carry the FactInput columns (type, subject, payload
        struct, metadata, tags), plus optionally ``appended_at`` (event
        ingestion time) and ``position`` (pre-assigned order, e.g. from a
        source log offset); missing ones are assigned here."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        layout = self._layout(meta.id)
        key = _fresh_or_valid_key(idempotency_key)

        from .storage.optimistic import OptimisticStoreLayout

        if isinstance(layout, OptimisticStoreLayout):
            return self._append_dataframe_optimistic(layout, df, key)

        with layout.commit_lock(upkeep="cadence"):
            commits = layout.read_commits()
            if layout.idempotency_key_seen(key, commits):
                return AlreadyApplied(key)
            seq = layout.next_seq(commits)
            appended_at = utcnow_us()

            from .schema import POSITION_STRIDE

            base = seq * POSITION_STRIDE
            cols = set(df.columns)
            staged = df
            if "id" not in cols:
                staged = staged.withColumn("id", F.expr("uuid()"))
            if "appended_at" not in cols:
                staged = staged.withColumn("appended_at", F.lit(appended_at))
            if "position" in cols:
                # Caller pre-assigned intra-commit order (e.g. source log
                # offset); rebase onto this commit's position range.
                # Validity (non-negative, duplicate-free) is enforced
                # after the write from the same one-pass aggregate.
                staged = staged.withColumn("position", F.lit(base) + F.col("position"))
            else:
                staged = assign_contiguous_positions(staged, base)
            if "metadata" not in cols:
                staged = staged.withColumn(
                    "metadata", F.create_map().cast("map<string,string>")
                )
            staged = staged.select(
                "id", "type", "subject", "appended_at", "position",
                "payload", "metadata", "tags",
            )
            out_dir = os.path.join(layout.data_dir, f"commit-{seq:010d}-bulk")
            staged.write.mode("overwrite").parquet(out_dir)
            bulk_files = [
                os.path.join(out_dir, f)
                for f in os.listdir(out_dir)
                if f.endswith(".parquet")
            ]
            agg = None
            if bulk_files:
                agg = _written_positions_agg(self.spark, bulk_files)
            if agg is not None and agg["n"] > 0:
                # The strict total-order/unique-position invariant that
                # cursors, replay bounds and heads depend on is checked
                # on the WRITTEN data in every branch: caller-supplied
                # positions may be negative or duplicated, and even the
                # auto-assigned path re-evaluates the source plan between
                # the count job and the write — a nondeterministic source
                # (sample/limit/rand) can shift rows across partitions
                # and silently duplicate positions. One cheap check off
                # the same one-pass aggregate; the commit is rejected,
                # not silently corrupted.
                import shutil

                preassigned = "position" in cols
                if int(agg["lo"]) < base:
                    shutil.rmtree(out_dir, ignore_errors=True)
                    msg = (
                        "pre-assigned positions must be >= 0 "
                        f"(min was {int(agg['lo']) - base})"
                        if preassigned
                        else "position assignment produced out-of-range values "
                        "(source plan repartitioned between jobs; "
                        f"min was {int(agg['lo']) - base} below base)"
                    )
                    return AppendConditionViolated(msg)
                if int(agg["nd"]) != int(agg["n"]):
                    shutil.rmtree(out_dir, ignore_errors=True)
                    msg = (
                        "pre-assigned positions must be unique within the commit "
                        f"({int(agg['n']) - int(agg['nd'])} duplicates)"
                        if preassigned
                        else "position assignment produced duplicates "
                        "(nondeterministic source partitioning between jobs; "
                        f"{int(agg['n']) - int(agg['nd'])} duplicates) — "
                        "materialize the input or pre-assign positions"
                    )
                    return AppendConditionViolated(msg)
            if agg is None or agg["n"] == 0:
                # Empty input: record a zero-row commit so the
                # idempotency key is still honored; nothing to read back.
                import shutil

                shutil.rmtree(out_dir, ignore_errors=True)
                layout.append_bulk_commit_record(
                    seq, 0, appended_at, key, layout.head_position()
                )
                return Appended((), appended_at, ())
            layout.append_bulk_commit_record(
                seq,
                int(agg["n"]),
                appended_at,
                key,
                int(agg["hi"]),
                # Subject skipping summary for head lookups: a Spark
                # job over the subject column, gated by the cardinality
                # estimate the validation aggregate already computed —
                # caps out to None (= "must scan until the snapshot
                # folds this commit") on diverse commits.
                subj_fps=_written_subject_fps(
                    self.spark, bulk_files, int(agg["ns"]), int(agg["n"])
                ),
            )
        return Appended((), appended_at, (int(agg["lo"]), int(agg["hi"])))

    def _append_dataframe_optimistic(self, layout, df: DataFrame, key: str) -> AppendResult:
        """Bulk ingest on the optimistic backend: RESERVE the position
        range with a zero-row claim (positions are baked into the
        parquet, so the range must be unstealable before the write),
        write the data at leisure, then PUBLISH the directory with a
        second claim (storage/optimistic.py module docstring). A crash
        mid-way leaves a harmless hole in the sparse position space."""
        commits = layout.read_commits()
        if layout.idempotency_key_seen(key, commits):
            return AlreadyApplied(key)
        appended_at = utcnow_us()
        cols = set(df.columns)
        staged = df
        if "id" not in cols:
            staged = staged.withColumn("id", F.expr("uuid()"))
        if "appended_at" not in cols:
            staged = staged.withColumn("appended_at", F.lit(appended_at))
        if "metadata" not in cols:
            staged = staged.withColumn(
                "metadata", F.create_map().cast("map<string,string>")
            )
        if "position" in cols:
            # Measure + validate the RELATIVE positions before reserving.
            agg = df.agg(
                F.count("*").alias("n"),
                F.min("position").alias("lo"),
                F.max("position").alias("hi"),
                F.countDistinct("position").alias("nd"),
            ).collect()[0]
            n = int(agg["n"] or 0)
            if n > 0 and int(agg["lo"]) < 0:
                return AppendConditionViolated(
                    f"pre-assigned positions must be >= 0 (min was {int(agg['lo'])})"
                )
            if n > 0 and int(agg["nd"]) != n:
                return AppendConditionViolated(
                    "pre-assigned positions must be unique within the commit "
                    f"({n - int(agg['nd'])} duplicates)"
                )
            rel_hi = int(agg["hi"]) if n else 0
            rel = staged
        else:
            # reuse the per-partition count job the position assignment
            # runs anyway — a separate df.count() is a whole extra
            # evaluation of the source plan per bulk append
            rel, n = assign_contiguous_positions(staged, base=0, with_count=True)
            rel_hi = max(n - 1, 0)
        if n == 0:
            pseq = layout.publish_bulk(None, 0, layout.head_position(), appended_at, key)
            if pseq is None:
                return AlreadyApplied(key)
            return Appended((), appended_at, ())

        seq, base = layout.reserve_position_range(rel_hi, appended_at)
        out = rel.withColumn(
            "position", (F.lit(base) + F.col("position")).cast("long")
        ).select(
            "id", "type", "subject", "appended_at", "position",
            "payload", "metadata", "tags",
        )
        dir_name = f"commit-{seq:010d}-bulk"
        out_dir = os.path.join(layout.data_dir, dir_name)
        out.write.mode("overwrite").parquet(out_dir)
        files = [
            os.path.join(out_dir, f)
            for f in os.listdir(out_dir)
            if f.endswith(".parquet")
        ]
        agg2 = _written_positions_agg(self.spark, files)
        # Validate the invariant on the WRITTEN data, not the pre-write
        # evaluation of ``df`` (the write re-evaluates the plan; a
        # nondeterministic source can shift rows between partitions and
        # duplicate positions even when the pre-write check above
        # passed). Abort (leaving the reservation as a harmless hole —
        # same shape as a crash mid-ingest) rather than publish a
        # commit that breaks the strict total order.
        n2 = int(agg2["n"] or 0)
        if n2 == 0:
            # The re-evaluation produced ZERO rows (nondeterministic
            # source shrank between the pre-reserve count and the
            # write): publish an empty commit so the idempotency key is
            # still honored — mirror of the flock path's empty branch
            # (agg2.hi is null here; int(None) would crash).
            import shutil

            shutil.rmtree(out_dir, ignore_errors=True)
            pseq = layout.publish_bulk(
                None, 0, layout.head_position(), appended_at, key
            )
            if pseq is None:
                return AlreadyApplied(key)
            return Appended((), appended_at, ())
        if (
            int(agg2["lo"]) < base
            or int(agg2["nd"]) != n2
            or int(agg2["hi"]) > base + rel_hi
        ):
            import shutil

            shutil.rmtree(out_dir, ignore_errors=True)
            if int(agg2["lo"]) < base:
                return AppendConditionViolated(
                    "written positions fell below the reserved base "
                    f"(min was {int(agg2['lo']) - base}) — "
                    "nondeterministic source plan; materialize the input"
                )
            if int(agg2["hi"]) > base + rel_hi:
                # Past the ceiling the positions may collide with a
                # CONCURRENTLY reserved commit's range — publishing
                # would put two commits on overlapping positions.
                return AppendConditionViolated(
                    "written positions overran the reserved range "
                    f"(max was {int(agg2['hi']) - base}, reserved {rel_hi}) — "
                    "nondeterministic source plan; materialize the input"
                )
            return AppendConditionViolated(
                "written positions are not unique within the commit "
                f"({n2 - int(agg2['nd'])} duplicates) — "
                "nondeterministic source plan; materialize the input"
            )
        pseq = layout.publish_bulk(
            dir_name,
            int(agg2["n"]),
            int(agg2["hi"]),
            appended_at,
            key,
            # Subject skipping summary for head lookups (heads are
            # log-derived; the publish record is the only per-subject
            # state this path ever writes, and it is capped) — Spark
            # job gated by the validation aggregate's estimate, not a
            # driver-side column stream.
            subj_fps=_written_subject_fps(
                self.spark, files, int(agg2["ns"]), int(agg2["n"])
            ),
        )
        if pseq is None:
            import shutil

            shutil.rmtree(out_dir, ignore_errors=True)
            return AlreadyApplied(key)
        for f in files:
            layout._link_into_stream(f)
        return Appended((), appended_at, (int(agg2["lo"]), int(agg2["hi"])))

    # ------------------------------------------------------------------
    # Read path (FactFinder) — DataFrame plans + materializing wrappers
    # ------------------------------------------------------------------

    def facts_df(
        self,
        store_name: str,
        *,
        max_position: Optional[int] = None,
        time_range: Optional[TimeRange] = None,
    ) -> Optional[DataFrame]:
        """The store's fact table as a DataFrame; None if the store does
        not exist. ``max_position`` pins a snapshot (replay head).

        ``time_range`` is a PRUNING hint, not a filter: the compacted
        snapshot is a hive layout partitioned by ``fact_date`` =
        date(appended_at) (storage/compact.py), so reading it as a
        partitioned directory and applying the derived date bounds lets
        Spark skip whole date partitions before any file I/O — the
        created-at-index analog (FdbFactFinder.kt:49-79). The bounds
        are widened by a day on each side (timezone robustness); the
        caller still applies the exact ``appended_at`` predicate."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return None
        layout = self._layout(meta.id)
        comp_dir, tail_files = layout.data_layout()
        df = self._assemble_fact_frames(
            comp_dir, tail_files, time_range=time_range
        )
        if max_position is not None:
            df = df.filter(F.col("position") <= max_position)
        return df

    def _assemble_fact_frames(
        self,
        comp_dir: Optional[str],
        tail_files: list[str],
        *,
        comp_paths: Optional[list[str]] = None,
        time_range: Optional[TimeRange] = None,
    ) -> DataFrame:
        """The ONE recipe that turns a (compacted snapshot, tail files)
        layout into the fact DataFrame — shared by the full scan
        (facts_df) and the id-index fast path (find_by_id_df), so the
        two can never drift semantically. ``comp_paths`` substitutes a
        pruned file subset for the snapshot directory (basePath keeps
        the hive partition column derivable either way)."""
        from .schema import FACT_COLUMNS, FACT_SCHEMA_PARTITIONED

        frames = []
        if comp_dir is not None and (comp_paths is None or comp_paths):
            comp = (
                self.spark.read.schema(FACT_SCHEMA_PARTITIONED)
                .option("basePath", comp_dir)
                .parquet(*(comp_paths if comp_paths is not None else [comp_dir]))
            )
            if time_range is not None:
                comp = comp.filter(compacted_date_bounds(time_range))
            frames.append(comp.select(*FACT_COLUMNS))
        if tail_files:
            frames.append(
                self.spark.read.schema(FACT_SCHEMA).parquet(*tail_files)
            )
        if not frames:
            return self.spark.createDataFrame([], FACT_SCHEMA)
        return (
            frames[0]
            if len(frames) == 1
            else frames[0].unionByName(frames[1])
        )

    def register_views(self, store_name: str, prefix: Optional[str] = None) -> Optional[list[str]]:
        """Expose the store to plain ``spark.sql`` as temp views:
        ``<prefix>_facts`` (the full fact envelope) and
        ``<prefix>_tags`` (exploded ``(position, id, tag_key,
        tag_value)`` — the relational shape of the reference's tag
        subspaces, FdbFactStoreContext.kt:25-57, ready for
        OR-of-AND tag algebra as ordinary SQL joins). Prefix defaults
        to the store name.

        Views are lazy Catalyst plans pinned to the file set visible
        at registration (snapshot isolation, same contract as
        ``facts_df``); re-register to pick up later commits. Returns
        the view names, or None if the store doesn't exist."""
        df = self.facts_df(store_name)
        if df is None:
            return None
        # Store names legally contain '-' (StoreName.kt regex), which
        # is not a valid SQL identifier character — sanitize the
        # DEFAULT prefix so register_views('my-store') registers
        # my_store_facts instead of raising ParseException. An explicit
        # prefix is the caller's responsibility, verbatim.
        p = (
            prefix
            if prefix is not None
            else "".join(c if c.isalnum() or c == "_" else "_" for c in store_name)
        )
        facts_view, tags_view = f"{p}_facts", f"{p}_tags"
        df.createOrReplaceTempView(facts_view)
        df.select(
            "position", "id", F.explode_outer("tags").alias("tag_key", "tag_value")
        ).createOrReplaceTempView(tags_view)
        return [facts_view, tags_view]

    # -- find_by_id (FdbFactFinder.kt:19-32) ----------------------------

    def find_by_id_df(self, store_name: str, fact_id: str) -> Optional[DataFrame]:
        """Point lookup by fact id. With a fresh id index (see
        build_id_index) the compacted snapshot is pruned to the Bloom
        sidecar's candidate files — the id->position point-index analog
        (FdbFactFinder.kt:19-32, FdbFactStore.kt:108-133) — and only
        the post-compaction tail commits are scanned in full. A stale
        or absent index falls back to the whole-store scan: derived
        state, never a correctness dependency (the tag-index rule)."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return None
        layout = self._layout(meta.id)
        idx_dir = self._id_index_dir(layout)
        comp_dir, tail_files = layout.data_layout()
        if comp_dir is not None and os.path.isdir(idx_dir):
            from .storage.bloomindex import bloom_candidate_files

            probe = bloom_candidate_files(
                self.spark, idx_dir, comp_dir, "id", [fact_id]
            )
            if not probe.stale:
                df = self._assemble_fact_frames(
                    comp_dir,
                    tail_files,
                    comp_paths=[
                        os.path.join(comp_dir, f)
                        for f in probe.candidate_files
                    ],
                )
                return df.filter(F.col("id") == fact_id)
        df = self.facts_df(store_name)
        return None if df is None else df.filter(F.col("id") == fact_id)

    def find_by_id(self, store_name: str, fact_id: str) -> FindByIdResult:
        df = self.find_by_id_df(store_name, fact_id)
        if df is None:
            return StoreNotFound(store_name)
        rows = df.limit(1).collect()
        return FactFound(row_to_fact(rows[0])) if rows else FactNotFound(fact_id)

    def exists_by_id(self, store_name: str, fact_id: str) -> ExistsByIdResult:
        """FdbFactFinder.kt:34-47."""
        df = self.find_by_id_df(store_name, fact_id)
        if df is None:
            return StoreNotFound(store_name)
        return Exists() if df.limit(1).count() > 0 else DoesNotExist()

    # -- find_in_time_range (FdbFactFinder.kt:49-79) --------------------

    def find_in_time_range_df(
        self,
        store_name: str,
        time_range: TimeRange,
        limit: Optional[int] = None,
        direction: ReadDirection = ReadDirection.FORWARD,
    ) -> Optional[DataFrame]:
        validate_limit(limit)
        # time_range doubles as the partition-pruning hint: on a
        # compacted store the derived fact_date bounds skip whole date
        # partitions (PartitionFilters) before the exact half-open
        # appended_at predicate runs.
        df = self.facts_df(store_name, time_range=time_range)
        if df is None:
            return None
        return ordered_limited(df.filter(time_range_predicate(time_range)), limit, direction)

    def find_in_time_range(self, store_name, time_range, limit=None, direction=ReadDirection.FORWARD) -> FindResult:
        return self._materialize(self.find_in_time_range_df(store_name, time_range, limit, direction), store_name)

    # -- find_by_subject (FdbFactFinder.kt:81-106) ----------------------

    def find_by_subject_df(
        self,
        store_name: str,
        subject: str,
        limit: Optional[int] = None,
        direction: ReadDirection = ReadDirection.FORWARD,
    ) -> Optional[DataFrame]:
        validate_limit(limit)
        df = self.facts_df(store_name)
        if df is None:
            return None
        return ordered_limited(df.filter(F.col("subject") == subject), limit, direction)

    def find_by_subject(self, store_name, subject, limit=None, direction=ReadDirection.FORWARD) -> FindResult:
        return self._materialize(self.find_by_subject_df(store_name, subject, limit, direction), store_name)

    # -- find_by_tags: AND semantics (FdbFactFinder.kt:108-167) ---------

    # Above this many resolved positions the indexed find_by_tags
    # switches from a collected pushdown (point-load analog) to a
    # distributed semi join — the same bounded-driver-probe rule the
    # dedup operators use.
    TAG_INDEX_PUSHDOWN_CAP = 10_000
    # Literal-list bound for the compiled ``isin`` predicate. Between
    # this and PUSHDOWN_CAP the scan still gets a position min/max
    # RANGE filter (pushed to parquet row-group stats — the part of
    # isin pruning that actually skips IO) while exactness comes from
    # a semi join, so no 10k-literal expression is ever compiled.
    TAG_INDEX_ISIN_CAP = 1_000

    def find_by_tags_df(
        self,
        store_name: str,
        tags: dict[str, str],
        limit: Optional[int] = None,
        direction: ReadDirection = ReadDirection.FORWARD,
    ) -> Optional[DataFrame]:
        """AND-of-tags finder. When the derived tag index covers the
        current head it resolves positions from the per-key index
        partitions (touching only the queried keys) and point-loads
        the facts — positions are pushed into the fact scan as an
        ``isin`` filter when few (parquet row-group min/max skips the
        rest of the table), else semi-joined. Stale/absent index falls
        back to the full scan: the index is derived state, never a
        correctness dependency (reference tag subspaces:
        FdbFactStoreContext.kt:25-57, FdbFactFinder.kt:108-167)."""
        if not tags:
            raise ValueError("find_by_tags requires at least one tag")
        validate_limit(limit)
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return None
        from .storage.tag_index import TagIndex

        layout = self._layout(meta.id)
        tidx = TagIndex(layout)
        # One commit snapshot decides freshness AND caps the fact side
        # (same pattern as find_by_tag_query_indexed_df).
        commits = layout.read_commits()
        # logically-latest, not commits[-1]: the flock log is
        # file-ordered and a compaction record appended last carries
        # the OLD snapshot seq/max_position — commits[-1] would pass a
        # stale index as fresh and cap the scan below the true head
        last_seq = max((c.seq for c in commits), default=-1)
        positions = (
            tidx.positions_for_tags(self.spark, tags)
            if last_seq >= 0 and tidx.built_through() >= last_seq
            else None  # stale index: scan path below
        )
        if positions is not None:  # None also covers the rebuild-swap window
            head_pos = max(c.max_position for c in commits)
            facts = self.facts_df(store_name, max_position=head_pos)
            probe = positions.limit(self.TAG_INDEX_PUSHDOWN_CAP + 1).collect()
            if len(probe) <= self.TAG_INDEX_PUSHDOWN_CAP:
                if not probe:
                    matched = facts.filter(F.lit(False))
                else:
                    pos = [r.position for r in probe]
                    rng = (F.col("position") >= min(pos)) & (
                        F.col("position") <= max(pos)
                    )
                    if len(pos) <= self.TAG_INDEX_ISIN_CAP:
                        matched = facts.filter(rng & F.col("position").isin(pos))
                    else:
                        # range prunes row groups at the scan; the semi
                        # join supplies exactness without compiling a
                        # thousands-literal predicate (Spark's runtime
                        # bloom/DPP can further prune inside the join).
                        matched = facts.filter(rng).join(
                            positions, "position", "left_semi"
                        )
            else:
                matched = facts.join(positions, "position", "left_semi")
            return ordered_limited(matched, limit, direction)
        # No (fresh) tag index: before the full scan, consult any
        # tag-value Bloom sidecar built for one of the queried keys —
        # it prunes the COMPACTED snapshot to candidate files for that
        # key's probed VALUE (the exact AND-of-tags filter still runs
        # on top, and the post-compaction tail is always scanned), so
        # a single-tag point probe on an unindexed store stops paying
        # a whole-snapshot read. Stale/absent sidecars skip silently:
        # derived state, never a correctness dependency.
        df = None
        comp_dir, tail_files = layout.data_layout()
        if comp_dir is not None:
            from .storage.bloomindex import bloom_candidate_files

            for k, v in tags.items():
                idx_dir = self._tag_bloom_dir(layout, k)
                if not os.path.isdir(idx_dir):
                    continue
                probe = bloom_candidate_files(
                    self.spark, idx_dir, comp_dir, self._tag_key_spec(k), [v]
                )
                if probe.stale:
                    continue
                df = self._assemble_fact_frames(
                    comp_dir,
                    tail_files,
                    comp_paths=[
                        os.path.join(comp_dir, f)
                        for f in probe.candidate_files
                    ],
                )
                break
        if df is None:
            df = self.facts_df(store_name)
        if df is None:
            return None
        return ordered_limited(df.filter(tags_all_match(tags)), limit, direction)

    def find_by_tags(self, store_name, tags, limit=None, direction=ReadDirection.FORWARD) -> FindResult:
        return self._materialize(self.find_by_tags_df(store_name, tags, limit, direction), store_name)

    # -- find_by_tag_query (FdbFactFinder.kt:169-255) -------------------

    def find_by_tag_query_df(self, store_name: str, query: TagQuery) -> Optional[DataFrame]:
        """OR-of-AND algebra in one scan; global position order; no
        limit/direction by spec (FindByTagQueryRequest.kt:3-6)."""
        df = self.facts_df(store_name)
        if df is None:
            return None
        return df.filter(tag_query_predicate(query)).orderBy(F.col("position").asc())

    def find_by_tag_query(self, store_name: str, query: TagQuery) -> FindResult:
        return self._materialize(self.find_by_tag_query_df(store_name, query), store_name)

    def build_tag_index(self, store_name: str):
        """(Re)build the derived tag-index table (storage/tag_index.py)
        — the 100 TB secondary-index analog. Returns stats or StoreNotFound."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        from .storage.tag_index import TagIndex

        return TagIndex(self._layout(meta.id)).build(self.spark)

    # -- id index (FdbFactFinder.kt:19-32 point-index analog) -----------

    @staticmethod
    def _id_index_dir(layout) -> str:
        return os.path.join(layout.store_dir, "ididx")

    def build_id_index(self, store_name: str):
        """Build (or rebuild) the Bloom-sidecar id index over the
        store's COMPACTED snapshot (storage/bloomindex.py) — the
        100 TB findById/existsById fast path: a point probe opens only
        the candidate files the per-file bitsets admit, instead of
        scanning every file of the snapshot. The post-compaction tail
        is always scanned (small by definition; the index goes stale
        only when compaction rewrites the snapshot directory). Returns
        stats, ``{"built": False, ...}`` before the first compaction,
        or StoreNotFound."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        from .storage.bloomindex import build_bloom_index

        layout = self._layout(meta.id)
        comp_dir, _tail = layout.data_layout()
        if comp_dir is None:
            return {"built": False, "reason": "no compacted snapshot"}
        stats = build_bloom_index(
            self.spark, comp_dir, "id", self._id_index_dir(layout)
        )
        stats["built"] = True
        return stats

    @staticmethod
    def _tag_bloom_dir(layout, tag_key: str) -> str:
        # hex-encoded key: any tag key becomes a safe dir name
        return os.path.join(
            layout.store_dir, f"tagbloom-{tag_key.encode('utf-8').hex()}"
        )

    @staticmethod
    def _tag_key_spec(tag_key: str) -> str:
        if "'" in tag_key or "\\" in tag_key:
            raise ValueError(
                f"tag key {tag_key!r} cannot carry quotes/backslashes "
                "into an index expression"
            )
        return f"tags['{tag_key}']"

    def build_tag_bloom_index(self, store_name: str, tag_key: str):
        """Build (or rebuild) a Bloom sidecar over the DERIVED column
        ``tags['<tag_key>']`` of the compacted snapshot — the point-
        probe fast path for a single high-cardinality tag VALUE on a
        store with NO tag index (or one whose rebuild lags): a
        find_by_tags probe on that key then opens only the candidate
        files, like findById does through the id sidecar. Unlike the
        tag index (every key, positions, refresh protocol) this is one
        cheap per-file bitset for one chosen key — the
        "index the one key the workload probes" knob. Returns stats,
        ``{"built": False, ...}`` before the first compaction, or
        StoreNotFound."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        from .storage.bloomindex import build_bloom_index

        layout = self._layout(meta.id)
        comp_dir, _tail = layout.data_layout()
        if comp_dir is None:
            return {"built": False, "reason": "no compacted snapshot"}
        stats = build_bloom_index(
            self.spark,
            comp_dir,
            self._tag_key_spec(tag_key),
            self._tag_bloom_dir(layout, tag_key),
        )
        stats["built"] = True
        return stats

    def refresh_tag_index(self, store_name: str):
        """Incrementally extend the tag index to the current head
        (appends only commits > built_through; see TagIndex.refresh).
        Returns stats or StoreNotFound."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        from .storage.tag_index import TagIndex

        return TagIndex(self._layout(meta.id)).refresh(self.spark)

    def find_by_tag_query_indexed_df(
        self, store_name: str, query: TagQuery
    ) -> Optional[DataFrame]:
        """Tag query resolved through the derived index: positions from
        the per-key index partitions, semi-joined back to the fact
        table. Falls back to the scan path when the index is stale or
        absent — the index is derived state, never a correctness
        dependency."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return None
        from .storage.tag_index import TagIndex

        layout = self._layout(meta.id)
        tidx = TagIndex(layout)
        # Resolve freshness against ONE commit snapshot (not a separate
        # is_fresh() probe — a commit landing between the probe and the
        # join would return fresh-but-incomplete results). The fact side
        # is then capped at that snapshot's head position so index and
        # fact table agree even if more commits land mid-query.
        commits = layout.read_commits()
        # logically-latest, not commits[-1] (see find_by_tags_df)
        last_seq = max((c.seq for c in commits), default=-1)
        if last_seq < 0 or tidx.built_through() < last_seq:
            return self.find_by_tag_query_df(store_name, query)
        head_pos = max(c.max_position for c in commits)
        positions = tidx.positions_for_query(self.spark, query)
        if positions is None:  # rebuild-swap window: scan-path fallback
            return self.find_by_tag_query_df(store_name, query)
        facts = self.facts_df(store_name, max_position=head_pos)
        return facts.join(positions, "position", "left_semi").orderBy(
            F.col("position").asc()
        )

    def find_by_tag_query_indexed(self, store_name: str, query: TagQuery) -> FindResult:
        return self._materialize(
            self.find_by_tag_query_indexed_df(store_name, query), store_name
        )

    def _materialize(self, df: Optional[DataFrame], store_name: str) -> FindResult:
        if df is None:
            return StoreNotFound(store_name)
        return FactsFound(tuple(row_to_fact(r) for r in df.collect()))

    # ------------------------------------------------------------------
    # Replay (FactReplayer) — bounded, pinned-head batch read
    # ------------------------------------------------------------------

    def replay(
        self,
        store_name: str,
        start=None,
        batch_size: int = DEFAULT_BATCH_SIZE,
    ):
        """Bounded replay: drain from ``start`` up to the head pinned at
        open time, then complete (FactReplayer.kt:21-62). Facts appended
        while draining are excluded (AbstractFactStoreTest.kt:900-915):
        cursor + head resolve against ONE snapshot before iteration, the
        analog of the single FDB read transaction (FdbFactStreamer.kt:60-84).

        Returns StoreNotFound / FactIdNotFound, or an iterator of
        position-ordered Fact batches (Flow<List<Fact>> analog).
        """
        start = start if start is not None else ReplayStart.Beginning()
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        layout = self._layout(meta.id)

        # One consistent resolution of cursor + head.
        head = layout.head_position()
        after_pos = -1
        if isinstance(start, ReplayStart.After):
            pos = layout.position_of_fact(start.fact_id)
            if pos is None:
                return FactIdNotFound(start.fact_id)
            after_pos = pos

        def batches() -> Iterator[list[Fact]]:
            if head < 0 or after_pos >= head:
                return  # empty store / empty delta -> complete immediately
            df = (
                self.facts_df(store_name, max_position=head)
                .filter(F.col("position") > after_pos)
                .orderBy(F.col("position").asc())
            )
            buf: list[Fact] = []
            for row in df.toLocalIterator():
                buf.append(row_to_fact(row))
                if len(buf) >= batch_size:
                    yield buf
                    buf = []
            if buf:
                yield buf

        return batches()

    # ------------------------------------------------------------------
    # Subscribe (FactSubscriber) — catch-up + live tail
    # ------------------------------------------------------------------

    def subscribe_stream(self, store_name: str, start=None):
        """Structured-Streaming subscription: a streaming DataFrame over
        the store's data directory (micro-batch polling replaces the FDB
        watch, FdbFactStreamer.kt:186-190). Start semantics
        (FactSubscriber.kt:18-59):

        - Beginning -> everything, then live tail
        - End       -> only facts appended after subscribe time; the
                       offset is captured HERE, not at first trigger
                       (SURVEY.md §7.4 hard-part 2)
        - After(id) -> position > pos(id)

        Returns StoreNotFound / FactIdNotFound or the streaming DataFrame.
        """
        start = start if start is not None else StartPosition.Beginning()
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        layout = self._layout(meta.id)

        after_pos = -1
        if isinstance(start, StartPosition.End):
            after_pos = layout.head_position()
        elif isinstance(start, StartPosition.After):
            pos = layout.position_of_fact(start.fact_id)
            if pos is None:
                return FactIdNotFound(start.fact_id)
            after_pos = pos

        # The stream reads the `stream/` hardlink mirror, not data/:
        # only committed per-commit files ever appear there (no
        # crash-orphans), and compaction — which rewrites data/ under
        # new paths — never changes it, so subscriptions neither lose
        # facts nor receive duplicates across a compaction.
        layout.sync_stream_links()
        stream = (
            self.spark.readStream.schema(FACT_SCHEMA)
            .option("maxFilesPerTrigger", 64)
            .parquet(layout.stream_dir)
        )
        if after_pos >= 0:
            stream = stream.filter(F.col("position") > after_pos)
        return stream

    def subscribe(
        self,
        store_name: str,
        start=None,
        batch_size: int = DEFAULT_BATCH_SIZE,
        poll_interval: float = 0.1,
        keepalive_every: Optional[float] = None,
        watch: bool = False,
        watch_interval: float = 0.004,
    ):
        """Generator-based live subscription for embedded use: drain
        existing facts from ``start`` then follow the tail forever,
        yielding position-ordered batches. Poll-based like the memory
        backend (MemoryFactStore.kt:212-234, 100 ms); the Structured
        Streaming variant above is the scale path.

        ``watch=True`` (opt-in): between polls, stat the commit log's
        change token every ``watch_interval`` seconds and recompute the
        head as soon as it moves — the lake analog of the reference's
        FDB watch on the head key (FdbFactStreamer.kt:186-190). Idle-
        tail latency drops from ~poll_interval/2 to single-digit ms
        for the cost of one stat(2) per tick (no busy loop); the poll
        interval stays as the fallback cadence, which also covers
        substrates whose appends the token cannot see (advisory
        contract, StoreLayout.change_token).

        ``keepalive_every`` (seconds): yield an EMPTY batch when the
        store has been quiet that long — transport adapters turn it
        into a heartbeat write so a disconnected client is detected
        (the write raises BrokenPipeError) instead of leaking a
        thread + a poll loop forever on a quiet store. Embedded
        consumers that skip the option never see empty batches."""
        start = start if start is not None else StartPosition.Beginning()
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        layout = self._layout(meta.id)

        after_pos = -1
        if isinstance(start, StartPosition.End):
            # published head: an IN-FLIGHT bulk (range reserved, data
            # unpublished) commits after subscribe time, so its facts
            # are post-open — pinning at the raw head would exclude
            # them forever
            after_pos = layout.published_head_position()
        elif isinstance(start, StartPosition.After):
            pos = layout.position_of_fact(start.fact_id)
            if pos is None:
                return FactIdNotFound(start.fact_id)
            after_pos = pos

        def gen() -> Iterator[list[Fact]]:
            cursor = after_pos
            last_emit = time.monotonic()
            while True:
                # token snapshot BEFORE the head recompute: an append
                # landing between the two moves the token relative to
                # this snapshot, so the watch loop below wakes on the
                # next tick. Snapshotting after the head check would
                # bake that append into the token and silently degrade
                # its delivery to the full poll interval.
                token = layout.change_token() if watch else None
                # published head, never the raw head: advancing the
                # cursor past a pending bulk reservation would exclude
                # its facts FOREVER once they publish (and emit later
                # positions first, breaking ordered delivery)
                head = layout.published_head_position()
                if head > cursor:
                    # commit-log prune: a tail poll opens only the
                    # files of commits past the cursor — without it
                    # every poll re-opened EVERY store file's footer
                    # (O(store lifetime) per poll; under write load,
                    # where each append adds a file, this was the
                    # dominant term of delivery lag)
                    table = layout.read_arrow(
                        filter=(pa_ds.field("position") > cursor)
                        & (pa_ds.field("position") <= head),
                        files=layout.data_files_after_position(cursor),
                    ).sort_by("position")
                    rows = table.to_pylist()
                    for i in range(0, len(rows), batch_size):
                        batch = [row_to_fact(r) for r in rows[i : i + batch_size]]
                        cursor = batch[-1].position
                        last_emit = time.monotonic()
                        yield batch
                else:
                    if (
                        keepalive_every is not None
                        and time.monotonic() - last_emit >= keepalive_every
                    ):
                        last_emit = time.monotonic()
                        yield []
                    if watch:
                        # wait against the pre-head-check token; a
                        # move the token cannot see (object-store
                        # commit slots) is bounded by the
                        # poll-interval deadline either way
                        deadline = time.monotonic() + poll_interval
                        while time.monotonic() < deadline:
                            time.sleep(watch_interval)
                            if layout.change_token() != token:
                                break
                    else:
                        time.sleep(poll_interval)

        return gen()

    # ------------------------------------------------------------------
    # Maintenance
    # ------------------------------------------------------------------

    def compact(self, store_name: str, target_partitions: Optional[int] = None):
        """Rewrite the store into a date-partitioned, subject-sorted
        layout with positions preserved (storage/compact.py) — the scan
        path for long-lived stores. Returns stats or StoreNotFound."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        from .storage.compact import compact_store

        return compact_store(self.spark, self._layout(meta.id), target_partitions)

    def refresh_heads_snapshot(self, store_name: str):
        """Fold the commit tail into the sharded subject-head snapshot
        (storage/heads.py) — restores O(shard) cold-subject lookups for
        ExpectedLastFact conditions. Incremental (gap commits, touched
        shards) between compactions; a distributed Spark rebuild when a
        compaction superseded the gap. Never required for correctness:
        lookups resolve exactly through the log at any staleness."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        from .storage.heads import HeadsIndex

        return HeadsIndex(self._layout(meta.id)).refresh(self.spark)

    def checkpoint(self, store_name: str):
        """Fold the compaction-superseded prefix of the commit log into
        one summary record (storage/layout.py checkpoint_log) — the
        Delta-checkpoint analog that keeps fresh-process log-open cost
        O(recent) over a store's lifetime. Run ``compact`` first; only
        compaction-superseded records can be folded. Returns stats or
        StoreNotFound."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        return self._layout(meta.id).checkpoint_log()

    def describe_store(self, store_name: str):
        """Operational stats for one store — the health card a
        maintenance scheduler reads to decide WHEN to run
        ``maintain()``: commit/file counts and bytes (small-file
        pressure -> compact), commits since the last checkpoint
        (log-parse cost -> checkpoint), head position and tag-index
        freshness. Metadata-only: reads the commit log + file stats,
        never scans fact data. Returns a dict or StoreNotFound."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        layout = self._layout(meta.id)
        commits = layout.read_commits()
        files = layout.data_files()
        n_bytes = 0
        for f in files:
            try:
                n_bytes += os.path.getsize(f)
            except OSError:
                pass
        ckpt_seq = max(
            (c.seq for c in commits if c.checkpoint), default=None
        )
        compacted_through = max(
            (c.compacted_through for c in commits if c.compacted_through is not None),
            default=None,
        )
        # Row count: between a compact and its checkpoint the log holds
        # BOTH the superseded append records and the compaction record
        # whose ``rows`` already equals their total, so a plain
        # sum(c.rows) double-counts. Count the latest compaction
        # record's total plus only the appends past its fold horizon.
        if compacted_through is None:
            n_rows = sum(c.rows for c in commits)
        else:
            comp_rows = max(
                c.rows for c in commits if c.compacted_through == compacted_through
            )
            n_rows = comp_rows + sum(
                c.rows
                for c in commits
                if c.compacted_through is None and c.seq > compacted_through
            )
        from .storage.heads import HeadsIndex
        from .storage.tag_index import TagIndex

        return {
            "store": store_name,
            "store_id": meta.id,
            "n_commits": len(commits),
            "head_position": layout.head_position(),
            "n_rows": n_rows,
            "n_data_files": len(files),
            "data_bytes": n_bytes,
            "compacted_through": compacted_through,
            "commits_since_checkpoint": (
                len([c for c in commits if c.seq > ckpt_seq])
                if ckpt_seq is not None
                else len(commits)
            ),
            "tag_index_fresh": TagIndex(layout).is_fresh(),
            "heads_snapshot_through": HeadsIndex(layout).snap_meta()["through_seq"],
        }

    def maintain(self, store_name: str, target_partitions: Optional[int] = None):
        """One-call periodic maintenance for a long-lived store, in
        dependency order: compact (rewrite data into the date-
        partitioned, subject-sorted scan layout), checkpoint (fold the
        now-superseded commit-log prefix), refresh the derived tag
        index (restores the indexed finder/DCB fast paths, which go
        stale on every append). The cron-job entry point a 100 TB
        deployment schedules per store. Returns per-step stats or
        StoreNotFound."""
        meta = self.catalog.find_by_name(store_name)
        if meta is None:
            return StoreNotFound(store_name)
        # Fold the heads snapshot BEFORE compacting: the incremental
        # fold reads the live tail commits' own small files; compacting
        # first supersedes them mid-cycle and (r13 defect) forced an
        # O(store) rebuild every compacting tick. The post-compact
        # refresh is then a pointer-only re-align in the common case
        # (through_seq catches up to compacted_through so lookups stay
        # on the shard path) and an incremental fold over any commit
        # that raced in between the two steps — never a rebuild, since
        # the raced commits' files survive compaction on disk. Both run
        # BEFORE checkpoint, which drops the per-commit records the
        # fold enumerates.
        heads_pre = self.refresh_heads_snapshot(store_name)
        steps = {
            "compact": self.compact(store_name, target_partitions),
        }
        heads_post = self.refresh_heads_snapshot(store_name)
        steps["heads_snapshot_pre"] = heads_pre
        steps["heads_snapshot_post"] = heads_post
        pre_built = isinstance(heads_pre, dict) and heads_pre.get("built")
        post_built = isinstance(heads_post, dict) and heads_post.get("built")
        steps["heads_snapshot"] = heads_post if (post_built or not pre_built) else heads_pre
        steps["checkpoint"] = self.checkpoint(store_name)
        steps["tag_index"] = self.refresh_tag_index(store_name)
        # The id index is opt-in (built once via build_id_index); when
        # present and invalidated by this pass's compaction, rebuild it
        # so point lookups stay on the fast path between crons. A
        # no-op compact with a still-fresh index skips the rebuild —
        # idle maintenance must not pay two snapshot scans per tick.
        layout = self._layout(meta.id)
        idx_dir = self._id_index_dir(layout)
        if os.path.isdir(idx_dir):
            from .storage.bloomindex import describe_bloom_index

            comp_dir, _tail = layout.data_layout()
            fresh = comp_dir is not None and not describe_bloom_index(
                idx_dir, comp_dir
            ).get("stale", True)
            if fresh:
                steps["id_index"] = {"built": False, "reason": "fresh"}
            else:
                steps["id_index"] = self.build_id_index(store_name)
        return steps

    def maintain_all(self, target_partitions: Optional[int] = None) -> dict:
        """Run ``maintain`` over every store — the single cron entry
        point for a deployment. Returns {store_name: per-step stats}."""
        return {
            meta.name: self.maintain(meta.name, target_partitions)
            for meta in self.list_all()
        }

    # ------------------------------------------------------------------

    def _store_dir(self, store_id: str) -> str:
        return os.path.join(self.root, "stores", store_id)

    def _layout(self, store_id: str) -> StoreLayout:
        # One layout instance per store: its commit-log memo (keyed on
        # the log file's mtime+size) then amortizes the 3 log reads a
        # locked append performs to a single parse.
        layout = self._layouts.get(store_id)
        if layout is None:
            if self.commit_backend.startswith("optimistic"):
                from .storage.optimistic import OptimisticStoreLayout

                layout = OptimisticStoreLayout(
                    self._store_dir(store_id), slot_spec=self._slot_spec
                )
            else:
                layout = StoreLayout(self._store_dir(store_id))
            self._layouts[store_id] = layout
        return layout
