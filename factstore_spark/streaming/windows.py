"""Structured-Streaming operators over the fact/event stream.

The reference's streaming surface is subscribe/replay (ingestion-order
batches, FdbFactStreamer.kt); Spark's native streaming model adds
event-time semantics the reference lacks (SURVEY.md §2.5) — watermarks,
tumbling/session windows, stateful per-key processing. These operators
make that surplus capability first-class for the 100 TB pipeline:

- ``windowed_counts``: tumbling event-time window + watermark for late
  data; partial aggregation happens map-side per micro-batch, state
  store holds only open windows.
- ``session_counts``: gap-based session windows (the streaming form of
  the batch sessionize query in queries.py).
- ``running_totals_stateful``: applyInPandasWithState — the escape
  hatch for operators Spark's built-ins can't express; keeps one small
  state row per key, scales by key partitioning.

All take a STREAMING DataFrame (e.g. ``FactStore.subscribe_stream`` or
any readStream source) and return a streaming DataFrame.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)


def windowed_counts(
    stream: DataFrame,
    time_col: str = "appended_at",
    key_col: str = "type",
    window: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Tumbling-window counts per key with late-data handling."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window).alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            F.col(key_col),
            "n",
        )
    )


def session_counts(
    stream: DataFrame,
    time_col: str = "appended_at",
    key_col: str = "subject",
    gap: str = "30 minutes",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gap-based session windows per key (session closes after ``gap``
    of inactivity; watermark bounds state retention)."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.session_window(F.col(time_col), gap).alias("s"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("s.start").alias("session_start"),
            F.col("s.end").alias("session_end"),
            F.col(key_col),
            "n_events",
        )
    )


def dedup_stream(
    stream: DataFrame,
    key_cols: list[str],
    time_col: str = "appended_at",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Streaming exact deduplication on arbitrary key columns — the
    ingest-time dedup stage of a continuous training-data pipeline
    (drop retransmits/replays before they ever land in the corpus).

    Uses ``dropDuplicatesWithinWatermark`` so the dedup state store
    holds only keys within the watermark horizon — O(recent keys), not
    O(all keys ever): the difference between a bounded and an
    unboundedly-growing state store on an infinite stream. Duplicates
    separated by more than the watermark are the batch dedup pass's
    job (operators/dedup.py) — the standard lambda split."""
    return stream.withWatermark(time_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def dedup_stream_by_content(
    stream: DataFrame,
    text_col: str = "payload",
    time_col: str = "appended_at",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Content-fingerprint streaming dedup: normalize + md5 the content
    column (binary payloads hashed as-is, strings lower-cased) and drop
    repeats within the watermark horizon. Map-only before the stateful
    dedup; the fingerprint (16 bytes) is all the state ever holds per
    key."""
    import uuid as _uuid

    from pyspark.sql.types import BinaryType

    col = F.col(text_col)
    # Analysis-only dtype probe (handles nested paths like payload.data).
    dtype = stream.select(col.alias("_t")).schema[0].dataType
    if isinstance(dtype, BinaryType):
        # Hash the raw bytes — a string round-trip would lower-case
        # ASCII and mangle non-UTF-8, fingerprinting DISTINCT payloads
        # identically and silently dropping the non-duplicate row.
        fp = F.md5(col)
    elif isinstance(dtype, StringType):
        fp = F.md5(F.lower(col).cast("binary"))
    else:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dtype, (StructType, MapType, ArrayType)):
            # Structured payloads: canonical JSON text, case-preserving.
            fp = F.md5(F.to_json(col).cast("binary"))
        else:
            fp = F.md5(col.cast("string").cast("binary"))
    # NULL content fingerprints as the literal "null" marker — distinct
    # from md5(empty), so a payload-less row never dedups against an
    # empty-payload row (they are different states, not duplicates).
    fp = F.coalesce(fp, F.lit("null"))
    # Unique helper name: a caller-owned "_content_fp" column (e.g. a
    # prior dedup stage's audit output) must survive untouched.
    fp_col = f"_content_fp_{_uuid.uuid4().hex[:8]}"
    with_fp = stream.withColumn(fp_col, fp)
    return dedup_stream(with_fp, [fp_col], time_col, watermark).drop(fp_col)


def curate_stream(
    stream: DataFrame,
    text_col: str = "text",
    time_col: str = "appended_at",
    lang: str = "en",
    quality_threshold: float = 0.5,
    min_tokens: int = 10,
    max_tokens: int = 5000,
    watermark: str = "10 minutes",
) -> DataFrame:
    """The curation funnel's STREAMING leg: the batch pipeline's
    language/quality/length signal stages are pure Column expressions,
    so the very same operators (operators/text.py) run unchanged per
    micro-batch — one map-only projection — followed by exact content
    dedup within the watermark horizon (bounded state). The lambda
    split is deliberate: global/near-dup dedup, decontamination and
    shard assignment need corpus-wide state and stay in the batch
    ``curate_corpus`` pass; this stage stops junk and retransmits from
    ever landing in the raw corpus."""
    from ..operators.text import with_lang_id, with_quality_score

    cols = stream.columns
    flagged = with_quality_score(with_lang_id(stream, text_col), text_col)
    kept = flagged.filter(
        (F.col("pred_lang") == lang)
        & (F.col("quality_score") >= quality_threshold)
        & (F.col("n_tokens") >= min_tokens)
        & (F.col("n_tokens") <= max_tokens)
    ).select(*cols)
    return dedup_stream_by_content(kept, text_col, time_col, watermark)


def quality_gate_stream(
    stream: DataFrame,
    model,
    text_col: str = "text",
    keep_only: bool = False,
) -> DataFrame:
    """The LEARNED quality gate's streaming leg: a quality classifier
    fitted offline (operators/quality_model.py:train_quality_classifier
    — where the corpus-wide LBFGS iterations belong) transforms each
    micro-batch as a pure map — VectorAssembler and the linear scorer
    are stateless row expressions, so the same fitted model runs
    unchanged over batch and stream and the two MUST agree doc-for-doc
    (asserted in tests/test_streaming_windows.py). No state, no
    watermark, no shuffle: the lambda split mirrors curate_stream —
    train offline, gate inline. ``keep_only=True`` drops rejected docs
    instead of annotating them.

    Caller columns are packed into a struct before featurization so
    the gate can never silently overwrite caller-owned columns that
    happen to share a feature name (n_tokens, quality_score, ...) —
    the same caller-column contract dedup_stream_by_content keeps."""
    from ..operators.quality_model import score_features

    cols = list(stream.columns)
    packed = stream.select(
        F.struct(*cols).alias("_row"), F.col(text_col).alias("_gate_text")
    )
    scored = model.transform(score_features(packed, "_gate_text")).select(
        F.col("_row.*"), F.col("prediction").cast("long").alias("keep_pred")
    )
    if keep_only:
        return scored.filter(F.col("keep_pred") == 1).select(*cols)
    return scored


_RUNNING_STATE_SCHEMA = StructType([StructField("n", LongType(), False)])


def running_totals_stateful(stream: DataFrame, key_col: str = "subject") -> DataFrame:
    """Per-key running fact counts via applyInPandasWithState — the
    custom-stateful-operator template: O(1) state per key, emits the
    updated total on every micro-batch that touches the key. The key
    column keeps its own name in the output (a hardcoded "subject"
    label over, say, type values would silently mislabel downstream
    joins)."""
    out_schema = StructType(
        [
            StructField(key_col, StringType(), True),
            StructField("n_facts", LongType(), False),
        ]
    )

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        new = sum(len(pdf) for pdf in pdfs)
        (prev,) = state.get if state.exists else (0,)
        total = prev + new
        state.update((total,))
        yield pd.DataFrame({key_col: [key[0]], "n_facts": [total]})

    # Cast the grouping key to the declared StringType — a bigint key
    # would reach Arrow as int64 against the string output field and
    # kill the query on the first touched micro-batch (same discipline
    # as type_transitions_stream / heavy_hitters_stream).
    stream = stream.withColumn(key_col, F.col(key_col).cast("string"))
    return stream.groupBy(F.col(key_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_RUNNING_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_time: str,
    right_time: str,
    within: str = "10 minutes",
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream equi-join with an event-time band — the streaming
    form of "attach each left event to the right events of the same key
    within ``within``" (click-to-purchase attribution, order-to-ship
    matching). A capability the reference's ingestion-order streams
    cannot express at all (SURVEY.md §2.5).

    Both sides are watermarked; the time-band condition
    ``right_time in [left_time - within, left_time + within]`` is what
    lets Spark BOUND the join state: rows older than
    watermark + within are evicted instead of held forever — without
    the band, stream-stream state grows without limit at 100 TB. State
    is partitioned by the join key, scaling like any keyed state.

    ``how``: inner (default) or left_outer (unmatched left rows emit
    with NULL right columns once the watermark proves no match can
    arrive). Returns the streaming joined DataFrame; right columns
    keep their names (callers select/alias for collisions)."""
    if how not in ("inner", "left_outer"):
        raise ValueError(f"join_streams supports inner/left_outer, got {how!r}")
    if left_time == right_time:
        raise ValueError(
            "left_time and right_time must have distinct names so the band "
            "condition is unambiguous — alias one side first"
        )
    lw = left.withWatermark(left_time, watermark)
    rw = right.withWatermark(right_time, watermark).withColumnRenamed(key, "_rkey")
    # Bind the left time column through lw[...] — a bare name inside
    # F.expr resolves against the JOINED plan and turns ambiguous (or
    # unparseable for names needing backticks) the moment the right
    # stream carries a same-named column.
    band = F.expr(f"INTERVAL {within}")
    cond = (
        (lw[key] == rw["_rkey"])
        & (rw[right_time] >= lw[left_time] - band)
        & (rw[right_time] <= lw[left_time] + band)
    )
    return lw.join(rw, cond, how).drop("_rkey")


def ohlc_bars_stream(
    stream: DataFrame,
    time_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value_cents",
    order_col: str = "event_id",
    bar: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Streaming OHLC bar builder — the Structured-Streaming form of the
    batch ``events_ohlc_bars`` query (queries.py), asserted equal to it
    in tests/test_streaming_windows.py.

    Open/close are ``min_by``/``max_by`` on the (time, order) struct —
    declarative aggregates with partial merge, so the bar state per
    (key, window) is O(1) (six scalars), map-side-combined per
    micro-batch; the watermark closes bars and evicts their state. Same
    shape a 100 TB tick pipeline needs: state scales with OPEN bars
    (keys x bar span), never with events."""
    ord_struct = F.struct(F.col(time_col), F.col(order_col))
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), bar).alias("w"), F.col(key_col))
        .agg(
            F.min_by(F.col(value_col), ord_struct).alias("open"),
            F.max(value_col).alias("high"),
            F.min(value_col).alias("low"),
            F.max_by(F.col(value_col), ord_struct).alias("close"),
            F.count(F.lit(1)).alias("n_trades"),
            F.sum(value_col).alias("volume"),
        )
        .select(
            F.col("w.start").alias("bar_start"),
            F.col(key_col),
            "open", "high", "low", "close", "n_trades", "volume",
        )
    )


def hopping_counts(
    stream: DataFrame,
    time_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value_cents",
    window: str = "5 minutes",
    slide: str = "1 minute",
    watermark: str = "2 minutes",
) -> DataFrame:
    """Sliding/hopping window aggregation — the native Structured-
    Streaming form of the batch ``events_sliding_windows`` query's
    explicit explode-by-slide-ratio expansion; asserted equal to it in
    tests/test_streaming_windows.py. ``window(ts, window, slide)``
    performs exactly that expansion internally (window/slide copies per
    event), then map-side-combines into (window, key) state."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(F.window(F.col(time_col), window, slide).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            "n",
            "value_sum",
        )
    )


_TRANSITION_STATE_SCHEMA = StructType(
    [
        StructField("last_type", StringType(), True),
        StructField("last_ts_us", LongType(), True),
        StructField("last_order", LongType(), True),
    ]
)


def type_transitions_stream(
    stream: DataFrame,
    key_col: str = "user_id",
    type_col: str = "event_type",
    time_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Streaming form of the batch ``events_type_transitions`` lag
    (queries.py): per-key consecutive event-type pairs via
    applyInPandasWithState carrying ONE row of state per key — the
    last seen (type, ts, order). Each micro-batch sorts the key's rows
    by (ts, order), chains them onto the carried last event, and emits
    one (from_type, to_type) edge per consecutive pair; downstream
    counts are an ordinary groupBy over the emitted edges (kept
    separate so consumers can window them however they like).

    State is O(1) per key and keyed by ``key_col``, so it scales like
    any keyed state store (key cardinality = user population — the
    high-cardinality regime, never group-capped). Ordering caveat,
    stated honestly: pairs are exact when each key's events arrive
    time-ordered ACROSS micro-batches (within a batch any order is
    fine — the batch slice is sorted before chaining). An event older
    than the carried state is chained in batch-local order instead of
    globally re-sorted; a pipeline needing exact lag under arbitrary
    cross-batch disorder should buffer by watermark first or use the
    batch entry (the standard lambda split, as with dedup_stream)."""
    out_schema = StructType(
        [
            StructField(key_col, StringType(), True),
            StructField("from_type", StringType(), True),
            StructField("to_type", StringType(), True),
        ]
    )

    def chain(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        batch = batch.sort_values(["_ts_us", "_order"], kind="mergesort")
        types = batch["_type"].tolist()
        carried = state.get if state.exists else None
        if carried is not None:
            types = [carried[0]] + types
        if len(types) > 1:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * (len(types) - 1),
                    "from_type": types[:-1],
                    "to_type": types[1:],
                }
            )
        tail = batch.iloc[-1]
        tail_key = (int(tail["_ts_us"]), int(tail["_order"]))
        # Never REGRESS the carried state: a purely-late micro-batch
        # chains its edges off the carried event (documented
        # best-effort) but must not rewind last-seen, or every future
        # in-order pair would chain off the stale event.
        if carried is None or (carried[1], carried[2]) <= tail_key:
            state.update((tail["_type"], tail_key[0], tail_key[1]))

    prepped = stream.select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(type_col).alias("_type"),
        F.unix_micros(F.col(time_col)).alias("_ts_us"),
        F.col(order_col).cast("long").alias("_order"),
    ).filter(
        # A null event time/order cannot be placed in the per-key order
        # and would NaN-poison the stateful chain (killing the query on
        # every replay); dropping it mirrors the batch lag's behaviour
        # of never pairing an unordered row meaningfully.
        F.col("_ts_us").isNotNull() & F.col("_order").isNotNull()
    )
    return prepped.groupBy(F.col(key_col)).applyInPandasWithState(
        chain,
        outputStructType=out_schema,
        stateStructType=_TRANSITION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rolling_dau_stream(
    stream: DataFrame,
    time_col: str = "ts",
    user_col: str = "user_id",
    window: str = "7 days",
    slide: str = "1 day",
    watermark: str = "1 day",
) -> DataFrame:
    """Streaming trailing-window distinct active users — the
    Structured-Streaming form of the batch ``events_rolling_dau``
    hopping expansion (queries.py). Exact, not HLL: chained stateful
    operators (Spark 3.5+) — ``window(ts, 7d, 1d)`` fans each event
    into its 7 trailing windows, ``dropDuplicates`` on
    (window, user) keeps the FIRST sighting per window (state = one
    tombstone per active (window, user), evicted by the watermark),
    then an ordinary windowed count. ``day`` matches the batch
    entry's integer epoch-day arithmetic: the trailing day of a
    7-day window starting at w.start is epoch_days(w.start) + 6.

    State scales with (windows held open by the watermark) x (daily
    actives) — the same cardinality the batch expansion shuffles,
    held incrementally instead of recomputed per run."""
    w = F.window(F.col(time_col), window, slide)
    deduped = (
        stream.withWatermark(time_col, watermark)
        .select(w.alias("w"), F.col(user_col), F.col(time_col))
        .dropDuplicates(["w", user_col])
    )
    return (
        deduped.groupBy("w")
        .agg(F.count(F.lit(1)).cast("long").alias("dau"))
        .select(
            (F.floor(F.unix_micros(F.col("w.start")) / F.lit(86400000000)) + F.lit(6))
            .cast("long")
            .alias("day"),
            "dau",
        )
    )


_HH_STATE_SCHEMA = StructType(
    [
        StructField("counters", StringType(), True),  # JSON {value: count}
        StructField("n", LongType(), False),
        StructField("d", LongType(), False),
    ]
)


def heavy_hitters_stream(
    stream: DataFrame,
    key_col: str = "event_type",
    value_col: str = "user_id",
    m: int = 64,
) -> DataFrame:
    """Per-key streaming heavy hitters with BOUNDED state — the
    streaming form of the batch heavy-hitter sketch
    (operators/sketches.py): at most ``m`` Misra-Gries counters per
    key, merged per micro-batch with the summary-reduction rule
    (sort merged counts, subtract the (m+1)-th largest, drop zeros).

    Emits, on every batch touching a key, the key's current counters:
    (key, value, est, n_seen, max_undercount) where ``est`` never
    OVERcounts and undercounts by at most ``max_undercount`` (the
    accumulated subtraction total d) — so any value with true count
    > d is guaranteed present, the classic MG deck. State per key is
    O(m) regardless of stream length; keys partition across the
    cluster like any keyed state. Downstream can filter
    est >= threshold - d for a no-false-negative report.

    Counters ride the state row as one JSON string (keys are arbitrary
    user values, so no separator byte is safe) because the
    applyInPandasWithState state schema must be flat; m is small so
    the encode/decode is noise."""
    out_schema = StructType(
        [
            StructField(key_col, StringType(), True),
            StructField("value", StringType(), True),
            StructField("est", LongType(), False),
            StructField("n_seen", LongType(), False),
            StructField("max_undercount", LongType(), False),
        ]
    )

    def update(
        key: Tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        batch = pd.concat(list(pdfs), ignore_index=True)
        if len(batch) == 0:
            return
        import json

        counts: dict[str, int] = {}
        n, d = 0, 0
        if state.exists:
            counters_s, n, d = state.get
            if counters_s:
                # JSON, not a joined string: counter KEYS are arbitrary
                # user values and may contain any separator byte.
                counts = json.loads(counters_s)
        for v, c in batch["_v"].value_counts().items():
            counts[v] = counts.get(v, 0) + int(c)
        n += len(batch)
        if len(counts) > m:
            ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            delta = ordered[m][1]  # (m+1)-th largest count
            d += delta
            counts = {
                v: c - delta for v, c in ordered[:m] if c - delta > 0
            }
        state.update((json.dumps(counts, sort_keys=True), n, d))
        if counts:
            yield pd.DataFrame(
                {
                    key_col: [key[0]] * len(counts),
                    "value": list(counts),
                    "est": list(counts.values()),
                    "n_seen": [n] * len(counts),
                    "max_undercount": [d] * len(counts),
                }
            )

    # Null values are excluded up front (same discipline as
    # type_transitions_stream): pandas value_counts drops NaN from the
    # counters, so counting null rows into n_seen would overstate the
    # counted population and skew every est/n_seen coverage ratio.
    prepped = stream.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).cast("string").alias(key_col),
        F.col(value_col).cast("string").alias("_v"),
    )
    return prepped.groupBy(F.col(key_col)).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=_HH_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
