"""Bucketed-layout co-located joins: the write-once-shuffle-never
contract must be visible in the physical plan."""

import io
from contextlib import redirect_stdout

import pytest

from factstore_spark.storage.bucketing import write_bucketed


@pytest.fixture()
def bucketed_tables(spark, tmp_path):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    write_bucketed(li, "b_lineitem", str(tmp_path / "li"), "l_orderkey", 8,
                   sort_col="l_orderkey")
    write_bucketed(orders, "b_orders", str(tmp_path / "ord"), "o_orderkey", 8,
                   sort_col="o_orderkey")
    yield
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    spark.sql("DROP TABLE IF EXISTS b_orders")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li, ords = spark.table("b_lineitem"), spark.table("b_orders")
        joined = li.join(ords, li.l_orderkey == ords.o_orderkey)
        buf = io.StringIO()
        with redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        # co-located: the shuffle was paid at write time, never at read
        assert "Exchange" not in plan.split("\n\n", 1)[0]
        assert "SortMergeJoin" in plan
        # correctness unchanged vs the plain parquet join
        pli = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
        pord = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        n_plain = pli.join(pord, pli.l_orderkey == pord.o_orderkey).count()
        assert joined.count() == n_plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
