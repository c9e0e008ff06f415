"""SCD2 (slowly-changing-dimension, type 2) history over merge tables —
the warehouse ``MERGE ... WHEN MATCHED AND attrs changed`` pattern that
keeps every attribute version as a validity interval instead of
overwriting in place.

Why this exists at 100 TB: training-data lineage and point-in-time
correctness both need "what did this dimension say WHEN" — joining
facts against a mutable dimension silently rewrites history every time
an attribute changes (the classic leakage bug: a model trained last
month suddenly 'trained' on this month's customer segment). SCD2 rows
carry ``(valid_from, valid_to]``-style intervals: the current row is
open (``valid_to IS NULL``); an attribute change CLOSES the old row at
the update's effective time and opens a new one.

Layering: each SCD2 row is a merge-table row keyed by
``(business key, valid_from)`` — closing an interval is an upsert of
its existing key, opening one is an insert of a fresh key — so ALL the
storage discipline is inherited from :mod:`.merge`: manifest-pruned
copy-on-write, single-winner snapshot CAS (concurrent SCD2 writers get
:class:`.merge.ConcurrentMergeError`), add-only schema rules, vacuum,
and numbered snapshots. That makes reads BITEMPORAL for free:
``read_scd2(as_of=T)`` answers along business time (which interval
covered T), ``read_scd2(snapshot=N)`` along system time (what the
table said when snapshot N was published), and the two compose.

Partition-attribute changes are naturally safe: the closed row rewrites
its EXISTING merge key with its OLD attribute values (same partition
directory), while the re-opened row is a brand-new merge key carrying
the new value — no key ever migrates between partitions.

Reference parity note: the reference engine has no dimension-history
feature; this module is part of the relational/lakehouse surplus, same
family as merge.py (cited there) and the continuous rollup.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..session import release_local_checkpoint
from .merge import (
    ConcurrentMergeError,
    _head_manifest,
    create_table,
    merge_upsert,
    read_table,
    validate_keyed_batch,
)

_SYS_COLS = {"valid_from", "valid_to"}


def _attr_cols(columns, key_cols) -> list[str]:
    return [c for c in columns if c not in set(key_cols) | _SYS_COLS]


def _validate_updates(df: DataFrame, key_cols, effective_col: str, what: str) -> None:
    """SCD2 batch validation: the shared keyed core (uniqueness +
    null-key rejection, merge.validate_keyed_batch) plus the non-null
    effective time, all in the same single aggregate job."""
    row = validate_keyed_batch(
        df, key_cols, what,
        extra_aggs={
            "null_eff": F.max(
                F.when(F.col(effective_col).isNull(), 1).otherwise(0)
            )
        },
    )
    if row.null_eff:
        raise ValueError(f"{effective_col} must be non-null")


def _scd2_meta(table_dir: str) -> tuple[dict, list[str]]:
    """Head manifest + business key columns, with the same loud errors
    at EVERY entry point: unpublished dir and not-an-SCD2-table both
    fail with actionable messages instead of a bare TypeError or a
    silent mis-slice of a plain merge table's key columns."""
    m = _head_manifest(table_dir)
    if m is None:
        raise ValueError(
            f"{table_dir} has no published manifest; create_scd2_table first"
        )
    merge_keys = m["meta"]["key_cols"]
    if not merge_keys or merge_keys[-1] != "valid_from":
        raise ValueError(f"{table_dir} is not an SCD2 table (merge key {merge_keys})")
    return m, merge_keys[:-1]


def create_scd2_table(
    df: DataFrame,
    table_dir: str,
    key_cols: list[str],
    partition_col: str,
    effective_col: str = "effective_ts",
) -> dict:
    """Initial dimension snapshot: every row becomes an OPEN interval
    starting at its ``effective_col`` value. One row per business key
    (checked). ``effective_col`` may be any orderable type (epoch day
    longs keep cross-engine comparisons exact); its type becomes the
    interval columns' type."""
    clash = _SYS_COLS & set(df.columns)
    if clash:
        raise ValueError(f"input columns {sorted(clash)} collide with the interval columns")
    _validate_updates(df, key_cols, effective_col, "create_scd2_table input")
    eff_type = df.schema[effective_col].dataType
    rows = df.withColumnRenamed(effective_col, "valid_from").withColumn(
        "valid_to", F.lit(None).cast(eff_type)
    )
    return create_table(rows, table_dir, list(key_cols) + ["valid_from"], partition_col)


def _changed(attr_cols: list[str]) -> Column:
    """Null-safe any-attribute-differs predicate vs the ``_cur_`` twin
    columns."""
    return reduce(
        lambda a, b: a | b,
        [~F.col(c).eqNullSafe(F.col(f"_cur_{c}")) for c in attr_cols],
    )


def scd2_upsert(
    updates: DataFrame,
    table_dir: str,
    effective_col: str = "effective_ts",
    delete_col: str | None = None,
) -> dict:
    """Apply one batch of "state as of ``effective_col``" rows:

    - new business key       -> open an interval at effective
    - attrs unchanged        -> no-op (no row is touched or rewritten)
    - any attribute changed  -> close the open interval AT effective
                                and open a new one FROM effective
    - ``delete_col`` true    -> close the open interval, open nothing
                                (soft delete; the key keeps its history)

    One row per business key per batch (checked). Effective times must
    move strictly forward per key: a batch whose effective is at or
    before a key's current ``valid_from`` raises — accepting it would
    publish a zero-width or overlapping interval, corrupting every
    as-of read over that key (late-arriving history is a rewrite job,
    not an upsert). Deleting an unknown or already-closed key raises
    (a delete that matches nothing is a caller bug, not a no-op) —
    EXCEPT a delete of a key already closed at exactly the effective
    time, which is the replayed-batch signature and no-ops (retry
    idempotency, so streaming redelivery never double-fails).
    Returns the published manifest (unchanged if the batch was fully
    a no-op)."""
    m, key_cols = _scd2_meta(table_dir)
    spark = updates.sparkSession

    flags = None
    if delete_col is not None:
        flags = updates.select(
            *key_cols, F.coalesce(F.col(delete_col), F.lit(False)).alias("_del")
        )
        updates = updates.drop(delete_col)
    clash = _SYS_COLS & set(updates.columns)
    if clash:
        raise ValueError(
            f"update batch carries {sorted(clash)} — interval columns are "
            "derived from the effective time, never caller-supplied"
        )
    _validate_updates(updates, key_cols, effective_col, "scd2_upsert updates")

    # read-modify-write: the batch below is DERIVED from this read, so
    # both the read and the final commit pin the SAME snapshot — a
    # writer landing in between must surface as ConcurrentMergeError,
    # never publish interval rows computed against stale open rows
    # (which could leave a key with two open intervals)
    table = read_table(spark, table_dir, snapshot=m["snapshot"])
    table_cols = list(table.columns)
    attr_cols = _attr_cols(table_cols, key_cols)
    batch_attrs = _attr_cols(
        [c if c != effective_col else "valid_from" for c in updates.columns], key_cols
    )
    if sorted(batch_attrs) != sorted(attr_cols):
        raise ValueError(
            f"scd2 batch attributes {sorted(batch_attrs)} != table attributes "
            f"{sorted(attr_cols)}; carry every attribute (nulls are fine) — "
            "schema evolution goes through a full-history rewrite, not an upsert"
        )

    u = updates.withColumnRenamed(effective_col, "_eff")
    if flags is not None:
        u = u.join(flags, key_cols)
    else:
        u = u.withColumn("_del", F.lit(False))
    current = table.filter(F.col("valid_to").isNull()).select(
        *key_cols,
        *[F.col(c).alias(f"_cur_{c}") for c in attr_cols],
        F.col("valid_from").alias("_cur_from"),
    )
    # soft-deleted keys have no open row, so the forward-motion guard
    # needs the key's last CLOSED boundary too — a re-insert opening
    # before it would overlap retired history
    closed_latest = (
        table.filter(F.col("valid_to").isNotNull())
        .groupBy(*key_cols)
        .agg(F.max("valid_to").alias("_max_to"))
    )
    j = (
        u.join(current, key_cols, "left")
        .join(closed_latest, key_cols, "left")
        .localCheckpoint(eager=True)
    )
    # ^ consumed by 4 guard probes + 2 branch selects below; the
    #   recomputed subtree is a shuffle join against the table scan,
    #   exactly rule #10's "pin" case.
    try:
        # Guard predicates. Only rows that would WRITE are held to
        # forward motion — a replayed old batch whose attrs still match
        # is a no-op, not an error (retry idempotency, same spirit as
        # AlreadyApplied). A re-insert of a deleted key at-or-after its
        # last closed boundary is contiguous-or-gapped history (fine);
        # before it would overlap a retired interval.
        stale_c = (
            F.col("_cur_from").isNotNull()
            & (F.col("_eff") <= F.col("_cur_from"))
            & (_changed(attr_cols) | F.col("_del"))
        )
        # re-inserts only: a DELETE aimed at a closed key is a ghost
        # delete whatever its effective says — the precise caller
        # signal, not a re-insert-ordering complaint
        early_c = (
            ~F.col("_del")
            & F.col("_cur_from").isNull()
            & F.col("_max_to").isNotNull()
            & (F.col("_eff") < F.col("_max_to"))
        )
        # a delete whose key is already closed at EXACTLY the effective
        # time is a replayed batch (retry idempotency: the requested
        # state — absent as of eff — already holds); any other delete
        # of an unknown/closed key is a caller bug
        ghost_c = (
            F.col("_del")
            & F.col("_cur_from").isNull()
            & (F.col("_max_to").isNull() | (F.col("_max_to") != F.col("_eff")))
        )
        # one aggregate job covers every guard on the happy path — and
        # the would-write row counts, so the no-op/empty-batch decision
        # below needs no separate take(1) job (r14: one fewer pass over
        # the joined batch per upsert)
        close_c = F.col("_cur_from").isNotNull() & (
            F.col("_del") | _changed(attr_cols)
        )
        open_c = ~F.col("_del") & (
            F.col("_cur_from").isNull() | _changed(attr_cols)
        )
        flags_row = j.agg(
            *[
                F.max(F.when(c, F.lit(1)).otherwise(F.lit(0))).alias(n)
                for n, c in (("stale", stale_c), ("early", early_c), ("ghost", ghost_c))
            ],
            F.sum(F.when(close_c | open_c, F.lit(1)).otherwise(F.lit(0))).alias(
                "n_write"
            ),
        ).collect()[0]
        if flags_row.stale:
            r = j.filter(stale_c).select(*key_cols, "_eff", "_cur_from").limit(3).collect()
            raise ValueError(f"out-of-order effective time for keys {r}")
        if flags_row.early:
            r = j.filter(early_c).select(*key_cols, "_eff", "_max_to").limit(3).collect()
            raise ValueError(f"re-insert before retired history for keys {r}")
        if flags_row.ghost:
            r = j.filter(ghost_c).select(*key_cols).limit(3).collect()
            raise ValueError(f"delete for unknown/closed keys {r}")

        if not flags_row.n_write:
            return m  # fully unchanged batch: publish nothing
        eff_type = table.schema["valid_from"].dataType
        matched = j.filter(F.col("_cur_from").isNotNull())
        to_close = matched.filter(F.col("_del") | _changed(attr_cols))
        closed = to_close.select(
            *key_cols,
            *[F.col(f"_cur_{c}").alias(c) for c in attr_cols],
            F.col("_cur_from").alias("valid_from"),
            F.col("_eff").cast(eff_type).alias("valid_to"),
        )
        opened = (
            j.filter(
                ~F.col("_del")
                & (F.col("_cur_from").isNull() | _changed(attr_cols))
            )
            .select(
                *key_cols,
                *attr_cols,
                F.col("_eff").cast(eff_type).alias("valid_from"),
                F.lit(None).cast(eff_type).alias("valid_to"),
            )
        )
        batch = closed.unionByName(opened).select(*table_cols)
        return merge_upsert(batch, table_dir, base_manifest=m)
    finally:
        # unpersist() is a NO-OP for checkpoint blocks; free them now
        release_local_checkpoint(j)


def read_scd2(
    spark: SparkSession,
    table_dir: str,
    as_of=None,
    snapshot: int | None = None,
    history: bool = False,
) -> DataFrame | None:
    """Bitemporal read. ``history=True`` returns every interval row;
    otherwise ``as_of=None`` returns the current (open) rows and
    ``as_of=T`` the rows whose interval covered T — ``valid_from <= T
    AND (valid_to IS NULL OR valid_to > T)`` (valid_from inclusive,
    valid_to exclusive: at the instant of a change the NEW row is the
    truth). ``snapshot`` composes on either axis (read_table time
    travel along system time)."""
    t = read_table(spark, table_dir, snapshot=snapshot)
    if t is None or history:
        return t
    if as_of is None:
        return t.filter(F.col("valid_to").isNull())
    return t.filter(
        (F.col("valid_from") <= F.lit(as_of))
        & (F.col("valid_to").isNull() | (F.col("valid_to") > F.lit(as_of)))
    )


def scd2_enrich(
    facts: DataFrame,
    history: DataFrame,
    on: str,
    left_time: str,
    bucket: int | None = None,
) -> DataFrame:
    """Point-in-time enrichment — THE consumption pattern SCD2 exists
    for: attach to every fact the dimension attributes whose interval
    covered the fact's own timestamp. Facts before the key's first
    interval and facts inside a deleted gap get NULL attributes, never
    a later (leaked) or stale (resurrected) version.

    Plan shape: the interval table is flattened to a CHANGE STREAM —
    one row per interval open, plus a null-attribute TOMBSTONE at every
    close that no interval reopens (the soft-delete boundaries) — and
    attached with :func:`..operators.temporal.asof_join`: union + ONE
    shuffle + an ordered-window forward fill, no join operator at all,
    and the stream is O(changes), not O(facts). ``bucket=`` passes
    through for hot-key splitting (a celebrity key's 10^8 facts fill in
    ~span/bucket parallel tasks). Composite business keys: concat them
    into one column on both sides first (``on`` is a single column).

    ``history`` is an interval frame as returned by
    ``read_scd2(..., history=True)`` — pass a ``snapshot=`` read to
    enrich against what the dimension said at publish time N (the
    bitemporal axes compose here too)."""
    from ..operators.temporal import asof_join

    attr_cols = _attr_cols(history.columns, [on])
    opens = history.select(on, F.col("valid_from").alias("_dim_from"), *attr_cols)
    closed = history.filter(F.col("valid_to").isNotNull())
    reopened = history.select(
        F.col(on).alias("_re_key"), F.col("valid_from").alias("_reopen_at")
    )
    tombstones = (
        closed.join(
            reopened,
            (closed[on] == reopened["_re_key"])
            & (closed["valid_to"] == reopened["_reopen_at"]),
            "left_anti",
        )
        .select(
            on,
            F.col("valid_to").alias("_dim_from"),
            *[F.lit(None).cast(history.schema[c].dataType).alias(c) for c in attr_cols],
        )
    )
    stream = opens.unionByName(tombstones)
    out = asof_join(
        facts, stream, on=on, left_time=left_time, right_time="_dim_from",
        value_cols=attr_cols, bucket=bucket,
    )
    # asof_join emits the right-time column under its own name and only
    # suffixes on collision with a fact column — drop BOTH spellings so
    # the private column never escapes into the public output
    return out.drop("_dim_from", "_dim_from_right")


def start_scd2_stream(
    stream: DataFrame,
    table_dir: str,
    checkpoint_dir: str,
    effective_col: str = "effective_ts",
    delete_col: str | None = None,
    on_late: str = "error",
    available_now: bool = False,
    max_retries: int = 10,
):
    """Continuously maintain an SCD2 dimension from a change stream
    (the streaming twin of :func:`.merge.start_merge_stream`). Each
    micro-batch collapses to the LATEST change per key (effective desc,
    attr-struct desc tie-break — deterministic; intra-batch
    intermediate versions are below the micro-batch's time resolution
    by definition) and applies through scd2_upsert, retrying on
    ConcurrentMergeError so batch writers and the stream share the
    table.

    Effectively-once for free: a micro-batch re-delivered after a sink
    failure re-applies rows whose attributes now MATCH the open
    interval — scd2_upsert's no-op path — so nothing double-closes.

    ``on_late``: a cross-batch late change (effective at/before the
    key's current ``valid_from``) is a stream-killing ValueError by
    default — late business history needs a rewrite job, and silent
    drops hide upstream disorder. ``on_late="drop"`` filters those rows
    per batch instead (re-read inside the retry loop, so the filter
    never races the state it guards) for sources with known stragglers."""
    if on_late not in ("error", "drop"):
        raise ValueError(f"on_late must be 'error' or 'drop', got {on_late!r}")

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        from pyspark.sql.window import Window

        if not batch_df.take(1):
            return
        _, key_cols = _scd2_meta(table_dir)
        tie_cols = [c for c in batch_df.columns if c not in set(key_cols) | {effective_col}]
        w = Window.partitionBy(*key_cols).orderBy(
            F.col(effective_col).desc(), F.struct(*tie_cols).desc()
        )
        latest = (
            batch_df.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        for _attempt in range(max_retries):
            todo = latest
            if on_late == "drop":
                # per-key forward-motion boundary from the FULL history:
                # open keys bound at their open valid_from (strict >),
                # deleted keys at their last valid_to (>= re-insert ok)
                bound = (
                    read_scd2(batch_df.sparkSession, table_dir, history=True)
                    .groupBy(*key_cols)
                    .agg(
                        F.max(
                            F.when(F.col("valid_to").isNull(), F.col("valid_from"))
                        ).alias("_open_from"),
                        F.max("valid_to").alias("_max_to"),
                    )
                )
                todo = (
                    latest.join(bound, key_cols, "left")
                    .filter(
                        (F.col("_open_from").isNull() & F.col("_max_to").isNull())
                        | (F.col(effective_col) > F.col("_open_from"))
                        | (
                            F.col("_open_from").isNull()
                            & (F.col(effective_col) >= F.col("_max_to"))
                        )
                    )
                    .drop("_open_from", "_max_to")
                )
            try:
                scd2_upsert(
                    todo, table_dir,
                    effective_col=effective_col, delete_col=delete_col,
                )
                return
            except ConcurrentMergeError:
                continue
            except ValueError as e:
                # drop-mode race: the bound above is read from the head,
                # but a concurrent writer can advance a key BETWEEN that
                # read and the upsert's pinned-snapshot validation — the
                # row passes the filter yet arrives late. The lateness
                # classes are exactly what the drop policy exists to
                # absorb: retry, and the recomputed bound drops them.
                # Every other ValueError (schema, ghosts, nulls) still
                # kills the stream loudly.
                late = str(e).startswith(
                    ("out-of-order effective", "re-insert before retired")
                )
                if on_late == "drop" and late:
                    continue
                raise
        raise ConcurrentMergeError(
            f"micro-batch {epoch_id} starved after {max_retries} scd2 attempts"
        )

    writer = (
        stream.writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def validate_scd2(spark: SparkSession, table_dir: str) -> dict:
    """Interval invariants over the full history in ONE distributed
    pass (no driver data path):

    - at most one OPEN row per key (zero after a soft delete);
    - every closed interval is non-empty (``valid_to > valid_from``);
    - no OVERLAPS: ordered by valid_from, every closed row ends at or
      before the next row starts (a strict gap is legal history — a
      soft-deleted key re-inserted later), and an open row is always
      the key's last (an open row with a successor covers it).

    The lead-window and the per-key rollup share the same key
    partitioning, so the whole audit is one exchange + one small final
    aggregate (r14: was two separate jobs — a groupBy count plus a
    window pass — i.e. two full history scans). The returned dict also
    carries the history counts the same pass yields for free:
    ``n_keys``, ``n_intervals``, ``n_open``.
    """
    from pyspark.sql.window import Window

    _, key_cols = _scd2_meta(table_dir)
    t = read_table(spark, table_dir)
    problems: list[str] = []
    if t is None:
        return {
            "ok": True, "problems": problems,
            "n_keys": 0, "n_intervals": 0, "n_open": 0,
        }

    w = Window.partitionBy(*key_cols).orderBy("valid_from")
    per_key = (
        t.select(
            *key_cols,
            "valid_from",
            "valid_to",
            F.lead("valid_from").over(w).alias("_next_from"),
        )
        .groupBy(*key_cols)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(F.when(F.col("valid_to").isNull(), 1).otherwise(0)).alias(
                "_n_open"
            ),
            F.sum(
                F.when(
                    F.col("valid_to").isNotNull()
                    & (F.col("valid_to") <= F.col("valid_from")),
                    1,
                ).otherwise(0)
            ).alias("_empty"),
            F.sum(
                F.when(
                    (
                        F.col("valid_to").isNotNull()
                        & F.col("_next_from").isNotNull()
                        & (F.col("valid_to") > F.col("_next_from"))
                    )
                    | (F.col("valid_to").isNull() & F.col("_next_from").isNotNull()),
                    1,
                ).otherwise(0)
            ).alias("_overlaps"),
        )
    )
    row = per_key.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("_n").alias("n_intervals"),
        F.sum("_n_open").alias("n_open"),
        F.sum(F.when(F.col("_n_open") > 1, 1).otherwise(0)).alias("multi_open"),
        F.sum("_empty").alias("empty"),
        F.sum("_overlaps").alias("overlaps"),
    ).collect()[0]
    if row.multi_open:
        problems.append(f"{row.multi_open} keys with more than one open interval")
    if row.empty:
        problems.append(f"{row.empty} empty/inverted closed intervals")
    if row.overlaps:
        problems.append(f"{row.overlaps} overlapping intervals")
    return {
        "ok": not problems,
        "problems": problems,
        "n_keys": int(row.n_keys),
        "n_intervals": int(row.n_intervals),
        "n_open": int(row.n_open),
    }
