"""Declarative expectations gate (operators/expectations.py)."""

import pytest
from pyspark.sql import functions as F

from factstore_spark.operators.expectations import (
    Expectation,
    expect_between,
    expect_foreign_key,
    expect_in_set,
    expect_not_null,
    expect_regex,
    expect_unique,
    validate_expectations,
)


def _result_map(df):
    return {
        r["check"]: (r["n_checked"], r["n_violations"], r["passed"])
        for r in df.collect()
    }


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "alpha", "en", 10),
            (2, "beta", "de", 3),
            (3, None, "xx", 40),
            (None, "gamma", None, 200),
            (3, "delta", "en", -1),
        ],
        "id long, text string, lang string, n long",
    )


def test_single_pass_kinds_count_exactly(spark, docs):
    out = validate_expectations(
        docs,
        [
            expect_not_null("id"),
            expect_unique("id"),
            expect_not_null("lang"),
            expect_in_set("lang", ["en", "de"]),
            expect_between("n", lo=0, hi=100),
            expect_regex("text", "^[a-z]+$"),
        ],
    )
    got = _result_map(out)
    # 5 rows; one null id; ids (1,2,3,3) -> 4 checked, 1 surplus dup
    assert got["not_null_id"] == (5, 1, False)
    assert got["unique_id"] == (4, 1, False)
    assert got["not_null_lang"] == (5, 1, False)
    # non-null langs: en,de,xx,en -> one violation (xx); nulls skipped
    assert got["in_set_lang"] == (4, 1, False)
    # non-null n: 10,3,40,200,-1 -> 200 above hi, -1 below lo
    assert got["between_n"] == (5, 2, False)
    # non-null texts all lowercase words -> pass (null skipped)
    assert got["regex_text"] == (4, 0, True)
    # ordered by check name
    names = [r["check"] for r in out.collect()]
    assert names == sorted(names)


def test_clean_table_passes_everything(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, tag string"
    )
    out = validate_expectations(
        df,
        [expect_not_null("id"), expect_unique("id"),
         expect_in_set("tag", ["a", "b"])],
    )
    assert all(r["passed"] for r in out.collect())


def test_foreign_key_orphans_counted_with_duplicates(spark):
    child = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (9,), (None,)], "fk long"
    )
    parent = spark.createDataFrame([(1,), (2,), (2,)], "pk long")
    out = validate_expectations(
        child,
        [expect_foreign_key("fk", "parent", "pk")],
        fk_parents={"parent": parent},
    )
    got = _result_map(out)
    # 5 non-null child keys checked; the two 9-rows are orphans
    assert got["fk_fk__parent_pk"] == (5, 2, False)


def test_foreign_key_without_parent_frame_raises(spark, docs):
    with pytest.raises(ValueError, match="fk_parents"):
        validate_expectations(
            docs, [expect_foreign_key("id", "missing", "pk")]
        )


def test_mixed_suite_unions_local_and_fk_rows(spark):
    child = spark.createDataFrame([(1, "x"), (3, "y")], "fk long, t string")
    parent = spark.createDataFrame([(1,)], "pk long")
    out = validate_expectations(
        child,
        [expect_not_null("t"), expect_foreign_key("fk", "p", "pk")],
        fk_parents={"p": parent},
    )
    got = _result_map(out)
    assert got["not_null_t"] == (2, 0, True)
    assert got["fk_fk__p_pk"] == (2, 1, False)
    assert out.columns == ["check", "n_checked", "n_violations", "passed"]


def test_empty_table_all_pass_zero_checked(spark):
    df = spark.createDataFrame([], "id long, lang string")
    out = validate_expectations(
        df,
        [expect_not_null("id"), expect_unique("id"),
         expect_in_set("lang", ["en"])],
    )
    for name, (n_chk, n_bad, passed) in _result_map(out).items():
        assert (n_chk, n_bad, passed) == (0, 0, True), name


def test_suite_validation_errors(spark, docs):
    with pytest.raises(ValueError, match="empty suite"):
        validate_expectations(docs, [])
    with pytest.raises(ValueError, match="duplicate"):
        validate_expectations(
            docs, [expect_not_null("id"), expect_not_null("id")]
        )
    with pytest.raises(ValueError, match="lo/hi"):
        expect_between("n")
    with pytest.raises(ValueError, match="empty value set"):
        expect_in_set("lang", [])
    with pytest.raises(ValueError, match="unknown expectation kind"):
        validate_expectations(docs, [Expectation("bogus", "id")])


def test_custom_names_and_one_sided_bounds(spark, docs):
    out = validate_expectations(
        docs,
        [
            expect_between("n", lo=0, name="n_floor"),
            expect_between("n", hi=50, name="n_ceil"),
        ],
    )
    got = _result_map(out)
    assert got["n_floor"] == (5, 1, False)  # -1
    assert got["n_ceil"] == (5, 1, False)  # 200


def test_single_table_suite_is_one_aggregate_job(spark, docs):
    """The local kinds must share one scan — the plan contains no join
    and exactly one Aggregate chain (plus the unpivot projection)."""
    out = validate_expectations(
        docs,
        [expect_not_null("id"), expect_unique("id"),
         expect_between("n", lo=0)],
    )
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    assert "Join" not in plan


def test_expect_sql_cross_column_invariant(spark):
    df = spark.createDataFrame(
        [(1, "abc", 3), (2, "hello", 5), (3, "x", 9), (4, None, 2)],
        "id long, text string, n long",
    )
    from factstore_spark.operators.expectations import expect_sql

    out = validate_expectations(
        df,
        [
            expect_sql("chars_match", "n = length(text)"),
            expect_sql("nullsafe_ok", "text IS NULL OR n = length(text)"),
        ],
    )
    got = _result_map(out)
    # row 3 (9 != 1) violates; row 4's null predicate is NOT TRUE
    assert got["chars_match"] == (4, 2, False)
    # the explicit null exemption passes row 4
    assert got["nullsafe_ok"] == (4, 1, False)


def test_expect_sql_validation():
    from factstore_spark.operators.expectations import expect_sql

    with pytest.raises(ValueError, match="name is required"):
        expect_sql("", "1 = 1")
    with pytest.raises(ValueError, match="empty predicate"):
        expect_sql("x", "   ")


def test_split_by_expectations_routes_rows(spark, docs):
    from factstore_spark.operators.expectations import split_by_expectations

    clean, quar = split_by_expectations(
        docs,
        [
            expect_not_null("id"),
            expect_in_set("lang", ["en", "de"]),
            expect_between("n", lo=0, hi=100),
        ],
    )
    assert clean.columns == docs.columns
    # rows: (1,en,10) ok; (2,de,3) ok; (3,xx,40) bad lang;
    # (None,...,200) bad id + bad n; (3,en,-1) bad n
    assert {r["id"] for r in clean.collect()} == {1, 2}
    got = {
        (r["id"], tuple(sorted(r["failed_checks"])))
        for r in quar.collect()
    }
    assert (3, ("in_set_lang",)) in got
    assert (None, ("between_n", "not_null_id")) in got
    assert (3, ("between_n",)) in got
    # counts reconcile with the aggregate gate
    assert clean.count() + quar.count() == docs.count()


def test_split_rejects_non_row_local_kinds(spark, docs):
    from factstore_spark.operators.expectations import split_by_expectations

    with pytest.raises(ValueError, match="row-local"):
        split_by_expectations(docs, [expect_unique("id")])
    with pytest.raises(ValueError, match="row-local"):
        split_by_expectations(
            docs, [expect_foreign_key("id", "p", "pk")]
        )


def test_split_is_map_only_plan(spark, docs):
    from factstore_spark.operators.expectations import split_by_expectations

    clean, quar = split_by_expectations(docs, [expect_not_null("id")])
    for side in (clean, quar):
        plan = side._jdf.queryExecution().executedPlan().toString()
        # non-vacuous: the plan string must show the actual scan +
        # filter pipeline, not an unexpanded AQE placeholder
        assert "Filter" in plan and "Scan" in plan, plan
        assert "Exchange" not in plan


def test_split_routes_streaming_micro_batches(spark, tmp_path):
    """The same projection applies to a stream: each micro-batch is
    routed independently, no state."""
    import os

    from factstore_spark.operators.expectations import split_by_expectations

    src = str(tmp_path / "src")
    rows = spark.createDataFrame(
        [(1, "en"), (2, "xx"), (3, "de"), (None, "en")],
        "id long, lang string",
    )
    rows.write.parquet(src)
    stream = spark.readStream.schema(rows.schema).parquet(src)
    clean, quar = split_by_expectations(
        stream, [expect_not_null("id"), expect_in_set("lang", ["en", "de"])]
    )
    q1 = (
        clean.writeStream.format("memory")
        .queryName("exp_clean")
        .trigger(availableNow=True)
        .start()
    )
    q2 = (
        quar.writeStream.format("memory")
        .queryName("exp_quar")
        .trigger(availableNow=True)
        .start()
    )
    q1.awaitTermination(120)
    q2.awaitTermination(120)
    assert {r["id"] for r in spark.sql("SELECT * FROM exp_clean").collect()} == {1, 3}
    quar_rows = spark.sql("SELECT * FROM exp_quar").collect()
    assert {
        (r["id"], tuple(r["failed_checks"])) for r in quar_rows
    } == {(2, ("in_set_lang",)), (None, ("not_null_id",))}


def test_random_frames_match_python_model(spark):
    """Seeded-random frames (dup ids, nulls, negative values) -> the
    aggregate gate's counts equal a pure-Python recomputation, and the
    router's lanes partition the frame consistently with the gate."""
    import random

    from factstore_spark.operators.expectations import (
        expect_sql,
        split_by_expectations,
    )

    rnd = random.Random(20260815)
    langs = ["en", "de", "xx", None]
    for trial in range(3):
        rows = [
            (
                rnd.choice([None, rnd.randrange(8)]),
                rnd.choice(langs),
                rnd.choice([None, rnd.randrange(-5, 30)]),
            )
            for _ in range(40)
        ]
        df = spark.createDataFrame(rows, "id long, lang string, n long")
        suite = [
            expect_not_null("id"),
            expect_unique("id"),
            expect_in_set("lang", ["en", "de"]),
            expect_between("n", lo=0, hi=20),
            expect_sql("n_even", "n IS NULL OR n % 2 = 0"),
        ]
        got = _result_map(validate_expectations(df, suite))

        ids = [r[0] for r in rows if r[0] is not None]
        want = {
            "not_null_id": (len(rows), sum(r[0] is None for r in rows)),
            "unique_id": (len(ids), len(ids) - len(set(ids))),
            "in_set_lang": (
                sum(r[1] is not None for r in rows),
                sum(r[1] is not None and r[1] not in ("en", "de") for r in rows),
            ),
            "between_n": (
                sum(r[2] is not None for r in rows),
                sum(r[2] is not None and not 0 <= r[2] <= 20 for r in rows),
            ),
            "n_even": (
                len(rows),
                sum(r[2] is not None and r[2] % 2 != 0 for r in rows),
            ),
        }
        for name, (chk, bad) in want.items():
            assert got[name] == (chk, bad, bad == 0), (trial, name)

        row_local = [s for s in suite if s.kind != "unique"]
        clean, quar = split_by_expectations(df, row_local)
        n_bad_rows = sum(
            1
            for r in rows
            if r[0] is None
            or (r[1] is not None and r[1] not in ("en", "de"))
            or (r[2] is not None and (not 0 <= r[2] <= 20 or r[2] % 2 != 0))
        )
        assert quar.count() == n_bad_rows
        assert clean.count() == len(rows) - n_bad_rows


def test_split_reserved_failed_checks_column_raises(spark, docs):
    """'failed_checks' is the router's output column; silently
    overwriting a user column of that name would destroy data in the
    quarantine lane (same reserved-name discipline as ivm)."""
    from factstore_spark.operators.expectations import split_by_expectations

    tagged = docs.withColumn("failed_checks", F.lit("user data"))
    with pytest.raises(ValueError, match="failed_checks"):
        split_by_expectations(tagged, [expect_not_null("id")])


def test_split_reserved_failed_checks_case_insensitive(spark, docs):
    """withColumn replaces case-insensitively under the default
    spark.sql.caseSensitive=false — the guard must catch 'Failed_Checks'
    too, or that user column is silently clobbered."""
    from factstore_spark.operators.expectations import split_by_expectations

    tagged = docs.withColumn("Failed_Checks", F.lit("user data"))
    with pytest.raises(ValueError, match="failed_checks"):
        split_by_expectations(tagged, [expect_not_null("id")])
