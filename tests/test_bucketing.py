"""Bucketed co-located join: the write-time partitioning story from
SCALE.md, exercised — joining two tables bucketed on the same key must
plan with NO shuffle exchange on either side."""

from __future__ import annotations

import io
import contextlib

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    # saveAsTable needs a warehouse; session default already points at
    # a local spark-warehouse dir — isolate table names instead.
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders = spark.createDataFrame(
        [(i, f"P{i % 3}", float(i)) for i in range(100)],
        "o_orderkey long, prio string, total double",
    )
    lineitem = spark.createDataFrame(
        [(i % 100, j, float(i + j)) for i in range(300) for j in range(2)],
        "l_orderkey long, line int, price double",
    )
    (orders.write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_orders"))
    (lineitem.write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, warehouse):
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
    try:
        o = spark.table("b_orders")
        li = spark.table("b_lineitem")
        joined = li.join(o, li.l_orderkey == o.o_orderkey)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            joined.explain("formatted")
        plan = buf.getvalue()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # the whole point: bucketing pre-co-locates both sides
        assert "Exchange" not in plan, f"unexpected shuffle in bucketed join:\n{plan}"
        assert joined.count() == 600
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_agg_has_no_shuffle(spark, warehouse):
    o = spark.table("b_orders")
    agg = o.groupBy("o_orderkey").agg(F.sum("total").alias("s"))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        agg.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan, f"unexpected shuffle in bucketed agg:\n{plan}"
    assert agg.count() == 100
