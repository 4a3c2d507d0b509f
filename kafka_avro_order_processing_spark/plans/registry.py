"""Named query registry: every operator exposed as (Spark plan, ANSI oracle).

This is the single source of truth behind ``__spark_entry__.py``:
each entry is one operator family from SURVEY.md §2 (or an M5
training-data-pipeline extension), implemented as a declarative Spark
plan plus the equivalent DuckDB-runnable ANSI SQL the driver uses as a
correctness oracle.

Cross-engine determinism rules used throughout (see functions/scalar.py):
- money sums go through DECIMAL(18,2) (order-independent) and cast to
  double only at the output edge;
- averages are computed as double division of identical operands;
- every ranking/limit carries a unique tiebreaker column;
- hashes are md5 (identical in Spark/DuckDB/Python).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from ..operators.aggregate import (
    error_stats,
    overall_stats,
    product_price_stats,
    stats_snapshot,
)
from ..operators.validate import dlq_envelope, split_valid_invalid
from ..operators.windows import running_average, sessionize, tumbling_window_stats
from ..operators.ranking import top_k_global, top_k_per_group
from ..functions.scalar import classify_error, dec_sum, RETRYABLE_PATTERN


@dataclass
class Query:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None -> driver runs weaker rows-only check
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


QUERIES: dict[str, Query] = {}


def _register(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn):
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, tags=tags, doc=doc)
        return fn

    return deco


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {q.name: q.fn for q in QUERIES.values()}


def get_oracles() -> dict[str, str]:
    return {q.name: q.oracle for q in QUERIES.values() if q.oracle is not None}


# SQL fragment: exact decimal sum cast to double (see dec_sum).
def _dsum(col: str) -> str:
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,2))) AS DOUBLE)"


# ---------------------------------------------------------------------------
# Reference parity — the analytics core (SURVEY.md §2.4 A1-A9) on `events`
# (event_type plays `product`, value plays `price`; FIXTURES.md §5).
# ---------------------------------------------------------------------------

@_register(
    "per_product_stats",
    f"""
    SELECT event_type,
           COUNT(*) AS order_count,
           {_dsum('value')} AS price_sum,
           {_dsum('value')} / COUNT(*) AS average_price,
           MIN(value) AS minimum_price,
           MAX(value) AS maximum_price
    FROM events
    GROUP BY event_type
    """,
    tags=("parity", "aggregate"),
    doc="A1: per-key running stats (price_aggregator.py:35-51), batch form.",
)
def q_per_product_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return product_price_stats(load_table(spark, sf_dir, "events"), key="event_type", value="value")


@_register(
    "product_stats_snapshot",
    f"""
    SELECT event_type,
           COUNT(*) AS order_count,
           ROUND({_dsum('value')}, 2) AS price_sum,
           ROUND({_dsum('value')} / COUNT(*), 2) AS average_price,
           ROUND(MIN(value), 2) AS minimum_price,
           ROUND(MAX(value), 2) AS maximum_price
    FROM events
    GROUP BY event_type
    """,
    tags=("parity", "aggregate"),
    doc="A3: presentation snapshot rounded 2dp (price_aggregator.py:60-82).",
)
def q_stats_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return stats_snapshot(load_table(spark, sf_dir, "events"), key="event_type", value="value")


@_register(
    "overall_stats",
    f"""
    SELECT COUNT(*) AS total_orders,
           ROUND({_dsum('value')}, 2) AS total_revenue,
           ROUND({_dsum('value')} / COUNT(*), 2) AS average_order_value,
           COUNT(DISTINCT event_type) AS unique_products
    FROM events
    """,
    tags=("parity", "aggregate"),
    doc="A5: global stats (price_aggregator.py:95-108).",
)
def q_overall_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return overall_stats(load_table(spark, sf_dir, "events"), key="event_type", value="value")


@_register(
    "running_avg",
    """
    SELECT event_id, event_type, value,
           COUNT(*) OVER w AS running_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_sum,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / (COUNT(*) OVER w) AS running_avg
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("parity", "window"),
    doc="§2.5: per-record running average — the verifiable batch twin of "
        "the reference's per-record emission (price_aggregator.py:44,51).",
)
def q_running_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return running_average(
        ev, key="event_type", value="value", order_by=("ts", "event_id")
    ).select(
        "event_id", "event_type", "value", "running_count", "running_sum", "running_avg"
    )


# ---------------------------------------------------------------------------
# Validation / DLQ split (SURVEY.md §2.2 P1-P6, §2.9 T7-T8)
# ---------------------------------------------------------------------------

_VALID_PRED = "event_id IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL AND value > 0"

@_register(
    "validated_orders",
    f"SELECT event_id, event_type, value FROM events WHERE {_VALID_PRED}",
    tags=("parity", "filter"),
    doc="P1+P2+P3 valid branch (avro_order_consumer.py:99-103).",
)
def q_validated(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    valid, _ = split_valid_invalid(ev, key="event_type", value="value", id_col="event_id")
    return valid.select("event_id", "event_type", "value")


@_register(
    "rejected_orders",
    f"""
    SELECT event_id, event_type, value,
           CASE WHEN event_id IS NULL OR event_type IS NULL OR value IS NULL
                THEN 'Missing required fields in order data'
                ELSE 'Invalid price: ' || CAST(value AS VARCHAR) END AS error_message
    FROM events
    WHERE NOT ({_VALID_PRED}) OR ({_VALID_PRED}) IS NULL
    """,
    tags=("parity", "filter"),
    doc="P3 invalid branch with the reference's error text "
        "(avro_order_consumer.py:100,103).",
)
def q_rejected(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    _, invalid = split_valid_invalid(ev, key="event_type", value="value", id_col="event_id")
    return invalid.select("event_id", "event_type", "value", "error_message")


@_register(
    "error_classification",
    f"""
    SELECT classification, COUNT(*) AS n
    FROM (
      SELECT CASE WHEN regexp_matches(lower(
                    CASE WHEN event_type = 'error'
                         THEN 'Connection timeout while processing event'
                         ELSE 'processed ok' END), '{RETRYABLE_PATTERN}')
                  THEN 'retryable' ELSE 'permanent' END AS classification
      FROM events)
    GROUP BY classification
    """,
    tags=("parity", "function"),
    doc="T8/F13: retryable-vs-permanent classification expression "
        "(retry_handler.py:169-186) applied over a derived message.",
)
def q_error_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    msg = F.when(
        F.col("event_type") == "error",
        F.lit("Connection timeout while processing event"),
    ).otherwise(F.lit("processed ok"))
    return (
        ev.select(classify_error(msg).alias("classification"))
        .groupBy("classification")
        .agg(F.count("*").alias("n"))
    )


@_register(
    "dlq_error_stats",
    f"""
    SELECT 'PermanentError' AS error_type,
           COALESCE(event_type, 'UNKNOWN') AS product,
           COUNT(*) AS error_count
    FROM events
    WHERE NOT ({_VALID_PRED}) OR ({_VALID_PRED}) IS NULL
    GROUP BY 1, 2
    """,
    tags=("parity", "aggregate"),
    doc="A7+A8: DLQ error stats by type and product "
        "(dead_letter_queue_consumer.py:73-76); rejects are routed through "
        "the envelope (T7) first.",
)
def q_dlq_error_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    _, invalid = split_valid_invalid(ev, key="event_type", value="value", id_col="event_id")
    env = dlq_envelope(invalid, source_topic="events")
    return error_stats(env, error_type="error_type", product=F.col("original_value.event_type"))


# ---------------------------------------------------------------------------
# OLAP analytics over the star schema (joins / sorts / top-k the reference
# lacks but the engine provides natively — SURVEY.md §2.3, §2.6)
# ---------------------------------------------------------------------------

@_register(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))
                * CAST(1 + l_tax AS DECIMAL(18,2)) AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("olap", "aggregate"),
    doc="TPC-H Q1-style pricing summary; filter pushes to the parquet scan, "
        "agg is partial+final hash over 6 groups.",
)
def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    dec2 = lambda c: c.cast("decimal(18,2)")  # noqa: E731
    disc_price = (dec2(F.col("l_extendedprice")) * dec2(1 - F.col("l_discount"))).cast("decimal(18,4)")
    charge = (disc_price * dec2(1 + F.col("l_tax"))).cast("decimal(18,6)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (dec_sum("l_quantity") / F.count("*")).alias("avg_qty"),
            (dec_sum("l_extendedprice") / F.count("*")).alias("avg_price"),
            (dec_sum("l_discount") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@_register(
    "top_customers",
    """
    SELECT c.c_custkey, c.c_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    GROUP BY c.c_custkey, c.c_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 10
    """,
    tags=("olap", "join", "topk"),
    doc="Broadcast-join enrichment + global top-k (TakeOrderedAndProject).",
)
def q_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    joined = o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
    agg = joined.groupBy("c_custkey", "c_name").agg(
        dec_sum("o_totalprice").alias("revenue"), F.count("*").alias("n_orders")
    )
    return top_k_global(agg, "revenue", 10, "c_custkey")


@_register(
    "revenue_by_region",
    """
    SELECT r.r_name,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o.o_custkey) AS n_customers
    FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
    tags=("olap", "join"),
    doc="Star-schema rollup: fact orders x 3 broadcast dims, one shuffle "
        "(the final group on r_name).",
)
def q_revenue_by_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
    )
    return joined.groupBy("r_name").agg(
        dec_sum("o_totalprice").alias("revenue"),
        F.count("*").alias("n_orders"),
        F.countDistinct("o_custkey").alias("n_customers"),
    )


@_register(
    "order_priority_counts",
    """
    SELECT o_orderpriority, COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
    tags=("olap", "aggregate"),
)
def q_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"), F.countDistinct("o_custkey").alias("n_customers"))
    )


@_register(
    "supplier_balance_by_nation",
    """
    SELECT n.n_name,
           COUNT(*) AS n_suppliers,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total_balance
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("olap", "join"),
)
def q_supplier_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").alias("n_suppliers"), dec_sum("s_acctbal").alias("total_balance"))
    )


@_register(
    "top3_events_per_type",
    """
    SELECT event_id, event_type, value, CAST(rank_in_group AS INTEGER) AS rank_in_group
    FROM (
      SELECT event_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY value DESC, event_id) AS rank_in_group
      FROM events)
    WHERE rank_in_group <= 3
    """,
    tags=("olap", "topk", "window"),
    doc="O1-analogue at scale: top-k per group via ranked window, "
        "no global sort.",
)
def q_top3_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return top_k_per_group(
        ev.select("event_id", "event_type", "value"),
        group="event_type", order_col="value", k=3, tiebreak="event_id",
    )


# ---------------------------------------------------------------------------
# Event-time windowing (T3/T4 — capabilities the reference lacks)
# ---------------------------------------------------------------------------

@_register(
    "events_hourly",
    f"""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           {_dsum('value')} AS sum_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events
    GROUP BY 1, 2
    """,
    tags=("window", "streaming-twin"),
    doc="T3: tumbling 1h event-time window (epoch-aligned, so "
        "window('1 hour').start == date_trunc('hour')).",
)
def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_window_stats(
        load_table(spark, sf_dir, "events"),
        ts="ts", key="event_type", value="value", width="1 hour",
    )


@_register(
    "user_sessions",
    """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
      FROM flagged)
    SELECT user_id, session_id,
           MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("window", "streaming-twin"),
    doc="Batch sessionization (30-min gap); streaming twin is "
        "session_window(ts, '30 minutes').",
)
def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize(
        load_table(spark, sf_dir, "events"),
        ts="ts", key="user_id", gap_minutes=30, order_tiebreak="event_id",
    )
