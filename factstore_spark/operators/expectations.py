"""Declarative data-quality expectations — the pre-training data gate.

A training-data pipeline at 100 TB cannot eyeball its inputs: every
ingest lands behind a declarative contract ("doc_id is never null and
unique", "lang is one of the corpus languages", "every lineitem's
orderkey exists in orders") whose violations are COUNTED, not sampled.
This module is that gate, the Great-Expectations / Deequ capability
re-expressed in plain Spark primitives:

- **Single-table expectations compile to ONE aggregate pass.** Each
  expectation becomes a ``SUM(CASE WHEN violated ...)`` column inside a
  single ``agg`` over one scan — map-side combined, whole-stage
  codegen, no per-expectation jobs. ``unique`` rides the same pass as
  ``COUNT(col) - COUNT(DISTINCT col)`` (Spark plans the multi-distinct
  agg with one Expand, so E expectations over a 100 TB table still cost
  one scan).
- **Cross-table (foreign-key) expectations are LEFT ANTI joins** on the
  parent's distinct key set. Small parents (dimensions) broadcast;
  big-big parents fall back to a shuffled anti join — the unavoidable
  shape, paid once per FK. Parent key frames are deduplicated before
  the join so the anti probe never fans out.
- The result is a tiny (one row per expectation) frame: ``check``,
  ``n_checked``, ``n_violations``, ``passed`` — the shape a CI gate or
  a freshness dashboard consumes directly.

Reference parity: the reference validates its write-path inputs
row-by-row in the appender (AppendRequest.kt:37-42 precondition checks,
StoreName.kt:7-9 name rules); this generalizes that contract-first
stance to whole-corpus read-side audits, which is where it must live
when inputs arrive as 100 TB of parquet rather than single RPCs.

Cross-engine determinism: every count is an exact BIGINT; expectations
are pure predicates (no floats, no RNG); regex patterns follow the
PII-module rule (text.py PII_PATTERNS) of staying inside the
Java-regex / RE2 common subset so a DuckDB oracle reproduces them.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Expectation:
    """One declarative check. ``kind`` picks the compiled shape:

    - ``not_null``: col IS NOT NULL for every row.
    - ``unique``: no two rows share a non-null value of ``col``
      (violations = n_nonnull - n_distinct, the number of surplus rows
      occupying an already-taken value).
    - ``between``: lo <= col <= hi over non-null values (params
      ``lo``/``hi``; either side may be None for a one-sided bound).
    - ``in_set``: col (non-null) is one of ``values``.
    - ``regex``: col (non-null) fully matches ``pattern``.
    - ``foreign_key``: col (non-null) exists in a parent frame's key
      column — resolved by ``validate_expectations(fk_parents=...)``.
    - ``sql``: a free-form SQL boolean predicate over the row
      (``pattern`` holds the SQL; ``name`` required); a row violates
      when the predicate is NOT TRUE — i.e. false OR null, because an
      expectation that cannot be evaluated has not been met (write
      ``col IS NULL OR …`` to exempt nulls explicitly).

    Null handling is deliberate: only ``not_null`` (and ``sql``, per
    the rule above) treats NULL as a violation. Every other kind skips
    NULLs, so "lang in {...}" and "lang not null" stay independent,
    composable checks instead of one check double-counting.
    """

    kind: str
    col: str
    name: str = ""
    lo: object = None
    hi: object = None
    values: tuple = ()
    pattern: str = ""
    parent: str = ""  # key into fk_parents for foreign_key checks
    parent_col: str = ""

    def check_name(self) -> str:
        if self.name:
            return self.name
        if self.kind == "foreign_key":
            return f"fk_{self.col}__{self.parent}_{self.parent_col}"
        return f"{self.kind}_{self.col}"


def expect_not_null(col: str, name: str = "") -> Expectation:
    return Expectation("not_null", col, name)


def expect_unique(col: str, name: str = "") -> Expectation:
    return Expectation("unique", col, name)


def expect_between(col: str, lo=None, hi=None, name: str = "") -> Expectation:
    if lo is None and hi is None:
        raise ValueError("expect_between: need at least one of lo/hi")
    return Expectation("between", col, name, lo=lo, hi=hi)


def expect_in_set(col: str, values, name: str = "") -> Expectation:
    vals = tuple(values)
    if not vals:
        raise ValueError("expect_in_set: empty value set")
    return Expectation("in_set", col, name, values=vals)


def expect_regex(col: str, pattern: str, name: str = "") -> Expectation:
    return Expectation("regex", col, name, pattern=pattern)


def expect_sql(name: str, predicate: str) -> Expectation:
    """Free-form row predicate, e.g. ``expect_sql("chars_vs_text",
    "n_chars = length(text)")`` — the escape hatch for cross-column
    invariants the typed kinds can't express."""
    if not name:
        raise ValueError("expect_sql: name is required")
    if not predicate.strip():
        raise ValueError("expect_sql: empty predicate")
    return Expectation("sql", "", name, pattern=predicate)


def expect_foreign_key(
    col: str, parent: str, parent_col: str, name: str = ""
) -> Expectation:
    return Expectation(
        "foreign_key", col, name, parent=parent, parent_col=parent_col
    )


def _violation_predicate(e: Expectation) -> Column:
    """Row-level violation predicate for the single-pass kinds (never
    called for unique/foreign_key, which have their own shapes)."""
    c = F.col(e.col)
    if e.kind == "not_null":
        return c.isNull()
    if e.kind == "between":
        bad = F.lit(False)
        if e.lo is not None:
            bad = bad | (c < F.lit(e.lo))
        if e.hi is not None:
            bad = bad | (c > F.lit(e.hi))
        return c.isNotNull() & bad
    if e.kind == "in_set":
        return c.isNotNull() & ~c.isin(list(e.values))
    if e.kind == "regex":
        return c.isNotNull() & ~c.rlike(e.pattern)
    if e.kind == "sql":
        # violated when the predicate is not TRUE (false or null)
        return ~F.coalesce(F.expr(e.pattern), F.lit(False))
    raise ValueError(f"unknown expectation kind: {e.kind}")


def split_by_expectations(
    df: DataFrame, suite: list[Expectation]
) -> tuple[DataFrame, DataFrame]:
    """Row-level enforcement: route each row to the clean lane or the
    quarantine lane (the CSV-source quarantine pattern generalized to
    declarative checks). Only ROW-LOCAL kinds are allowed — not_null /
    between / in_set / regex / sql; ``unique`` and ``foreign_key``
    need cross-row or cross-table state and belong to
    ``validate_expectations``, so their presence here raises.

    Returns ``(clean, quarantined)``; the quarantine frame carries a
    ``failed_checks array<string>`` column naming every violated
    expectation. Pure projection + filter (map-only, whole-stage
    codegen, no shuffle) — applies unchanged to a streaming DataFrame,
    where each micro-batch is routed independently.
    """
    if not suite:
        raise ValueError("split_by_expectations: empty suite")
    bad_kinds = [e.check_name() for e in suite if e.kind in ("unique", "foreign_key")]
    if bad_kinds:
        raise ValueError(
            "split_by_expectations: row-local kinds only; move these to "
            f"validate_expectations: {bad_kinds}"
        )
    names = [e.check_name() for e in suite]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names in suite: {names}")
    if any(c.lower() == "failed_checks" for c in df.columns):
        # reserved output column — overwriting user data in the
        # quarantine lane would silently destroy it (same reserved-name
        # discipline as ivm._check_cols). Case-INSENSITIVE: withColumn
        # replaces case-insensitively under the default
        # spark.sql.caseSensitive=false, so 'Failed_Checks' would be
        # clobbered just the same.
        raise ValueError(
            "split_by_expectations: input already has a 'failed_checks' "
            "column (any case); rename it before routing"
        )
    failed = F.array_compact(
        F.array(
            *[
                F.when(_violation_predicate(e), F.lit(e.check_name()))
                for e in suite
            ]
        )
    )
    tagged = df.withColumn("failed_checks", failed)
    clean = tagged.filter(F.size("failed_checks") == 0).drop("failed_checks")
    quarantined = tagged.filter(F.size("failed_checks") > 0)
    return clean, quarantined


def validate_expectations(
    df: DataFrame,
    suite: list[Expectation],
    fk_parents: dict[str, DataFrame] | None = None,
    broadcast_parents: bool = True,
) -> DataFrame:
    """Run a suite against ``df``; returns one row per expectation:
    ``(check string, n_checked long, n_violations long, passed
    boolean)`` ordered by check name.

    ``n_checked`` is the number of rows the expectation actually
    examined (all rows for ``not_null``; non-null rows for the
    value-predicate kinds; non-null child keys for ``foreign_key``).

    Single-table kinds share ONE aggregate over one scan; each
    ``foreign_key`` adds one LEFT ANTI join against
    ``fk_parents[e.parent]`` (deduplicated on ``parent_col``; hinted
    broadcast when ``broadcast_parents`` — turn off for big-big FKs
    where a shuffled anti join is the right plan).
    """
    if not suite:
        raise ValueError("validate_expectations: empty suite")
    names = [e.check_name() for e in suite]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate expectation names in suite: {names}")

    local = [e for e in suite if e.kind != "foreign_key"]
    fks = [e for e in suite if e.kind == "foreign_key"]

    result_parts: list[DataFrame] = []
    if local:
        aggs: list[Column] = []
        for e in local:
            n = e.check_name()
            if e.kind == "unique":
                aggs.append(F.count(F.col(e.col)).alias(f"__chk_{n}"))
                aggs.append(
                    (F.count(F.col(e.col)) - F.count_distinct(F.col(e.col)))
                    .cast("long")
                    .alias(f"__bad_{n}")
                )
            else:
                bad = _violation_predicate(e)
                checked = (
                    F.count(F.lit(1))
                    if e.kind in ("not_null", "sql")  # every row examined
                    else F.count(F.col(e.col))
                )
                aggs.append(checked.alias(f"__chk_{n}"))
                aggs.append(
                    F.coalesce(
                        F.sum(F.when(bad, F.lit(1)).otherwise(F.lit(0))),
                        F.lit(0),
                    )
                    .cast("long")
                    .alias(f"__bad_{n}")
                )
        one = df.agg(*aggs)
        # unpivot the single wide row into (check, n_checked, n_violations)
        stack_args: list[Column] = []
        for e in local:
            n = e.check_name()
            stack_args += [
                F.lit(n),
                F.col(f"__chk_{n}").cast("long"),
                F.col(f"__bad_{n}"),
            ]
        result_parts.append(
            one.select(
                F.stack(F.lit(len(local)), *stack_args).alias(
                    "check", "n_checked", "n_violations"
                )
            )
        )

    for e in fks:
        if not fk_parents or e.parent not in fk_parents:
            raise ValueError(
                f"foreign_key expectation {e.check_name()!r} needs "
                f"fk_parents[{e.parent!r}]"
            )
        parent_keys = (
            fk_parents[e.parent]
            .select(F.col(e.parent_col).alias("__pk"))
            .filter(F.col("__pk").isNotNull())
            .distinct()
        )
        if broadcast_parents:
            parent_keys = F.broadcast(parent_keys)
        child = df.select(F.col(e.col).alias("__ck")).filter(
            F.col("__ck").isNotNull()
        )
        # ONE pass: left join to the deduplicated parent key set, then
        # count misses — same answer as a separate anti-join count but
        # without a second child scan or a (1x1) nested-loop crossJoin
        result_parts.append(
            child.join(
                parent_keys, child["__ck"] == parent_keys["__pk"], "left"
            )
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_checked"),
                F.coalesce(
                    F.sum(
                        F.when(F.col("__pk").isNull(), F.lit(1)).otherwise(
                            F.lit(0)
                        )
                    ),
                    F.lit(0),
                )
                .cast("long")
                .alias("n_violations"),
            )
            .select(
                F.lit(e.check_name()).alias("check"),
                "n_checked",
                "n_violations",
            )
        )

    out = result_parts[0]
    for p in result_parts[1:]:
        out = out.unionByName(p)
    return out.withColumn(
        "passed", (F.col("n_violations") == 0).alias("passed")
    ).orderBy("check")
