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
from ..operators.graph import MAX_COACTIVITY_BUCKET
from ..operators.similarity import PQ_N_QUERIES
from ..operators.fuzzy import MAX_FUZZY_BLOCK as MAX_FUZZY_BLOCK_SQL


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


def _hexval(expr: str, pos: int) -> str:
    """SQL: value of hex digit `pos` (1-based) of md5 expr."""
    return f"(strpos('0123456789abcdef', substr({expr}, {pos}, 1)) - 1)"


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


# The testdata is all-valid, so the DLQ-path queries seed deterministic
# invalids in-flight (negative price / missing key) before the split —
# the same corruption the FIXTURES.md §1 cases describe, mirrored in
# the oracle so the reject branch is hash-checked on real rows.
_SEEDED_SQL = """
      SELECT event_id,
             CASE WHEN event_id % 37 = 0 THEN NULL ELSE event_type END AS event_type,
             CASE WHEN event_id % 23 = 0 THEN -value
                  WHEN event_id % 41 = 0 THEN NULL
                  ELSE value END AS value
      FROM events
"""


def _seeded_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.when(F.col("event_id") % 37 == 0, F.lit(None)).otherwise(F.col("event_type")).alias("event_type"),
        F.when(F.col("event_id") % 23 == 0, -F.col("value"))
        .when(F.col("event_id") % 41 == 0, F.lit(None))
        .otherwise(F.col("value"))
        .alias("value"),
    )


@_register(
    "rejected_orders",
    f"""
    SELECT event_id, event_type, value,
           CASE WHEN event_id IS NULL OR event_type IS NULL OR value IS NULL
                THEN 'Missing required fields in order data'
                ELSE 'Invalid price: ' || CAST(value AS VARCHAR) END AS error_message
    FROM ({_SEEDED_SQL})
    WHERE NOT ({_VALID_PRED}) OR ({_VALID_PRED}) IS NULL
    """,
    tags=("parity", "filter"),
    doc="P3 invalid branch with the reference's error text "
        "(avro_order_consumer.py:100,103) over seeded-invalid input.",
)
def q_rejected(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _seeded_events(spark, sf_dir)
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
    FROM ({_SEEDED_SQL})
    WHERE NOT ({_VALID_PRED}) OR ({_VALID_PRED}) IS NULL
    GROUP BY 1, 2
    """,
    tags=("parity", "aggregate"),
    doc="A7+A8: DLQ error stats by type and product "
        "(dead_letter_queue_consumer.py:73-76) over seeded-invalid input; "
        "rejects are routed through the envelope (T7) first, absent "
        "product -> UNKNOWN (P5/F14).",
)
def q_dlq_error_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _seeded_events(spark, sf_dir)
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
    # r13 optimization (guide §2.3 "aggregate before you shuffle"): the
    # fact table collapses to one row per customer BEFORE the dim joins
    # and the region rollup.  The countDistinct form aggregated on
    # (r_name, o_custkey) AFTER the joins, so the broadcast joins and
    # the first exchange processed every raw order row; here they see
    # one row per customer (10x fewer at sf0.1, unboundedly fewer at
    # scale).  o_custkey is unique per per-cust row, so
    # COUNT(DISTINCT o_custkey) per region == COUNT(*), and the exact
    # decimal partial sums re-sum associatively — rows hash-identical
    # to the direct form the oracle keeps (driver-verified).
    per_cust = o.groupBy("o_custkey").agg(
        F.count("*").alias("cnt"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
    )
    joined = (
        per_cust.join(F.broadcast(c), per_cust.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
    )
    return joined.groupBy("r_name").agg(
        F.sum("rev").cast("double").alias("revenue"),
        F.sum("cnt").alias("n_orders"),
        F.count("*").alias("n_customers"),
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
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
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


# ---------------------------------------------------------------------------
# M5 — training-data-pipeline operators (text / dedup / similarity /
# multimodal), each with a deterministic ANSI oracle.
# ---------------------------------------------------------------------------

from ..operators.text import (  # noqa: E402
    LANG_PROFILES,
    STOPWORDS,
    doc_fingerprint,
    doc_token_stats,
    language_id,
    quality_score,
    token_counts,
)
from ..operators import dedup as _dedup  # noqa: E402
from ..operators import similarity as _sim  # noqa: E402
from ..operators.similarity import cosine_topk  # noqa: E402
from ..operators.multimodal import binarize_text, payload_metadata  # noqa: E402


@_register(
    "doc_token_stats",
    """
    SELECT doc_id,
           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
           CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE)
             / CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_token_len
    FROM documents
    """,
    tags=("m5", "text"),
    doc="Per-document token statistics (pure column exprs, no Python).",
)
def q_doc_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_token_stats(load_table(spark, sf_dir, "documents"))


@_register(
    "token_counts_top20",
    """
    SELECT token, COUNT(*) AS n
    FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
    GROUP BY token ORDER BY n DESC, token LIMIT 20
    """,
    tags=("m5", "text", "topk"),
    doc="Corpus word frequencies, global top-20.",
)
def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(load_table(spark, sf_dir, "documents"), k=20)


def _lang_score_sql(words) -> str:
    arr = ", ".join(f"'{w}'" for w in words)
    return f"len(list_intersect(list_distinct(string_split(text, ' ')), [{arr}]))"


_S_EN = _lang_score_sql(LANG_PROFILES["en"])
_S_ES = _lang_score_sql(LANG_PROFILES["es"])
_S_DE = _lang_score_sql(LANG_PROFILES["de"])


@_register(
    "language_id",
    f"""
    SELECT doc_id, lang,
           CASE WHEN {_S_EN} >= {_S_ES} AND {_S_EN} >= {_S_DE} THEN 'en'
                WHEN {_S_ES} >= {_S_DE} THEN 'es'
                ELSE 'de' END AS predicted_lang
    FROM documents
    """,
    tags=("m5", "text"),
    doc="Heuristic language ID: per-language profile-hit argmax with a "
        "deterministic tie order.",
)
def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(load_table(spark, sf_dir, "documents"))


_STOP_ARR = ", ".join(f"'{w}'" for w in STOPWORDS)


@_register(
    "quality_scores",
    f"""
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    SELECT doc_id,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE) AS lexical_diversity,
           CAST(len(list_filter(toks, x -> list_contains([{_STOP_ARR}], x))) AS DOUBLE)
             / CAST(len(toks) AS DOUBLE) AS stopword_ratio,
           0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
             + 0.5 * (1.0 - CAST(len(list_filter(toks, x -> list_contains([{_STOP_ARR}], x))) AS DOUBLE)
                            / CAST(len(toks) AS DOUBLE)) AS quality
    FROM t
    """,
    tags=("m5", "text"),
    doc="Quality heuristics: lexical diversity + stopword ratio -> [0,1] score.",
)
def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_score(load_table(spark, sf_dir, "documents"))


@_register(
    "doc_fingerprints",
    """
    SELECT doc_id, md5(lower(text)) AS fingerprint,
           substr(md5(lower(text)), 1, 16) AS fingerprint_prefix
    FROM documents
    """,
    tags=("m5", "text"),
)
def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_fingerprint(load_table(spark, sf_dir, "documents"))


@_register(
    "dedup_exact",
    """
    SELECT md5(text) AS content_hash, MIN(doc_id) AS canonical_doc_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY md5(text)
    """,
    tags=("m5", "dedup"),
    doc="Exact dedup: hash-groupBy on the content fingerprint.",
)
def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.exact_dedup(load_table(spark, sf_dir, "documents"))


#: char-8-gram shingle-set CTE body (vs the default word-3-gram one);
#: DuckDB range() is end-exclusive, so starts run 1 .. len-7.
_CHAR_SH_CTE = """
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(text) >= 8
               THEN list_transform(range(1, len(text) - 6),
                                   i -> substr(text, i, 8))
               ELSE [] END) AS s
      FROM documents)"""


def _minhash_oracle(
    sh_cte: str | None = None, k: int | None = None, br: int | None = None
) -> str:
    k = _dedup.N_MINHASH if k is None else k
    br = _dedup.BAND_ROWS if br is None else br
    n_bands = k // br
    mh = ",\n             ".join(
        f"min(substr(md5('{j // 4}:' || shingle), {(j % 4) * 8 + 1}, 8)) AS mh{j}"
        for j in range(k)
    )
    bands = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, {expr} AS bv FROM sigs".format(
            b=b, expr=" || ".join(f"mh{b * br + r}" for r in range(br))
        )
        for b in range(n_bands)
    )
    agree = " + ".join(f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END" for j in range(k))
    if sh_cte is None:
        sh_cte = """
    toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(1, len(t) - 1),
                                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
               ELSE [] END) AS s
      FROM toks)"""
    return f"""
    WITH {sh_cte},
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    sigs AS (SELECT doc_id,
             {mh}
             FROM ex GROUP BY doc_id),
    bands AS ({bands}),
    sized AS (
      SELECT doc_id, band_id, bv,
             COUNT(*) OVER (PARTITION BY band_id, bv) AS bucket_n,
             MIN(doc_id) OVER (PARTITION BY band_id, bv) AS min_id
      FROM bands),
    pairs AS (
      -- mirrors the engine's hot-bucket cap (dedup.MAX_BUCKET_SIZE):
      -- sane buckets emit all pairs, oversized buckets emit a linear
      -- star on the bucket-min id
      SELECT DISTINCT doc_a, doc_b FROM (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM sized a JOIN sized b
          ON a.band_id = b.band_id AND a.bv = b.bv
         AND a.doc_id < b.doc_id
        WHERE a.bucket_n <= {_dedup.MAX_BUCKET_SIZE}
        UNION ALL
        SELECT min_id, doc_id FROM sized
        WHERE bucket_n > {_dedup.MAX_BUCKET_SIZE} AND doc_id != min_id)),
    est AS (
      SELECT p.doc_a, p.doc_b,
             CAST({agree} AS DOUBLE) / {float(k)} AS est_jaccard
      FROM pairs p
        JOIN sigs sa ON sa.doc_id = p.doc_a
        JOIN sigs sb ON sb.doc_id = p.doc_b)
    SELECT e.doc_a, e.doc_b, e.est_jaccard,
           CAST(len(list_intersect(ha.s, hb.s)) AS DOUBLE)
             / (CAST(len(ha.s) + len(hb.s) AS DOUBLE)
                - CAST(len(list_intersect(ha.s, hb.s)) AS DOUBLE)) AS jaccard
    FROM est e
      JOIN sh ha ON ha.doc_id = e.doc_a
      JOIN sh hb ON hb.doc_id = e.doc_b
    """


@_register(
    "near_dup_pairs",
    _minhash_oracle(),
    tags=("m5", "dedup"),
    doc="MinHash-LSH near-dup detection: shingle -> 8 minhashes -> 4 "
        "banded buckets -> candidate self-join -> exact-Jaccard verify.",
)
def q_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.near_dup_pairs(load_table(spark, sf_dir, "documents"))


@_register(
    "near_dup_pairs_char",
    _minhash_oracle(sh_cte=_CHAR_SH_CTE, k=16, br=4),
    tags=("m5", "dedup"),
    doc="MinHash-LSH over character 8-grams: the tokenization-"
        "independent near-dup variant (robust to whitespace/punctuation "
        "divergence; the standard choice for multilingual corpora where "
        "word splitting is unreliable).  Same signature/banding/verify "
        "pipeline as near_dup_pairs, but the shingle domain demands "
        "different LSH tuning: char grams overlap far more than word "
        "3-grams, so 16 minhashes in 4-row bands sharpen the candidate "
        "S-curve (a 5-gram/8-hash sweep yielded 189-member buckets and "
        "22k candidate pairs on 500 docs; 8-gram/16-hash yields "
        "bucket max 3 and 28).",
)
def q_near_dup_pairs_char(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.near_dup_pairs(
        load_table(spark, sf_dir, "documents"),
        k=16,
        band_rows=4,
        shingler=_dedup.char_shingle_rows,
    )


def _simhash_oracle() -> str:
    bits = _dedup.SIMHASH_BITS
    sums = ",\n           ".join(
        f"SUM((ascii(substr(hh, {j + 1}, 1)) % 2) * 2 - 1) AS s{j}" for j in range(bits)
    )
    fp = " + ".join(f"CASE WHEN s{j} > 0 THEN {2 ** j} ELSE 0 END" for j in range(bits))
    return f"""
    WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    h AS (SELECT doc_id, md5(token) AS hh FROM tok),
    v AS (SELECT doc_id,
           {sums}
          FROM h GROUP BY doc_id)
    SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM v
    """


@_register(
    "simhash_fingerprints",
    _simhash_oracle(),
    tags=("m5", "dedup"),
    doc="SimHash: 32-bit sign-of-votes fingerprint per document; near-dup "
        "lookup is hamming distance over the fingerprint.",
)
def q_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _dedup.simhash(load_table(spark, sf_dir, "documents"))


@_register(
    "embedding_topk",
    """
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      FROM embeddings),
    q AS (SELECT vec_id AS qid, embedding AS qe, norm AS qn FROM n WHERE vec_id < 5),
    scored AS (
      SELECT q.qid AS query_id, c.vec_id AS neighbor_id,
             list_sum(list_transform(range(1, len(q.qe) + 1),
                    i -> CAST(q.qe[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)))
               / (q.qn * c.norm) AS cosine
      FROM q, n c WHERE c.vec_id != q.qid),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cosine DESC, neighbor_id) AS INTEGER) AS rank
      FROM scored)
    SELECT query_id, neighbor_id, cosine, rank FROM ranked WHERE rank <= 5
    """,
    tags=("m5", "similarity"),
    doc="Brute-force cosine top-5 for query vectors vec_id<5; broadcast "
        "queries, candidates stream, per-query window rank.",
)
def q_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.filter(F.col("vec_id") < 5), k=5)


@_register(
    "multimodal_meta",
    """
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_hash,
           'application/octet-stream' AS mime
    FROM documents
    """,
    tags=("m5", "multimodal"),
    doc="Binary-column metadata extraction (length/hash/magic-sniff) as "
        "pure column exprs — payloads never reach Python.",
)
def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return payload_metadata(binarize_text(docs))


# ---------------------------------------------------------------------------
# Streaming twin, hash-checked: the update-mode streaming aggregation
# drained with availableNow must equal the batch groupBy bit-for-bit,
# so it shares the batch oracle (SURVEY.md §5 equivalence strategy).
# ---------------------------------------------------------------------------

from ..streaming.pipeline import run_streaming_product_stats  # noqa: E402


@_register(
    "streaming_product_stats",
    QUERIES["per_product_stats"].oracle,
    tags=("parity", "streaming"),
    doc="T2: per-key stats as a Structured Streaming aggregation "
        "(file-source twin of the Kafka source), complete-mode "
        "parquet-snapshot drain, availableNow trigger.",
)
def q_streaming_product_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_streaming_product_stats(spark, sf_dir)


@_register(
    "streaming_product_stats_update",
    QUERIES["per_product_stats"].oracle,
    tags=("parity", "streaming"),
    doc="T2 in UPDATE output mode — the scale-preferred form (each "
        "epoch emits only changed keys; complete mode rewrites all "
        "state every epoch).  The drain captures the per-epoch deltas "
        "as an epoch-stamped changelog and folds latest-epoch-wins per "
        "key; final state must equal the batch aggregate exactly.",
)
def q_streaming_product_stats_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregate import product_price_stats
    from ..streaming.pipeline import drain_to_df, stream_table

    agg = product_price_stats(
        stream_table(spark, sf_dir, "events"), key="event_type", value="value"
    )
    return drain_to_df(agg, "update", key_cols=("event_type",))


# ---------------------------------------------------------------------------
# Advanced relational surface: as-of join, grouping sets (rollup/cube),
# pivot, sliding windows, set ops — plus similarity-search variants.
# ---------------------------------------------------------------------------

from ..operators.asof import asof_join, asof_join_same_source  # noqa: E402
from ..operators.similarity import ivf_assign, with_norm  # noqa: E402
from ..operators.windows import sliding_window_stats  # noqa: E402
from ..sources.generator import PRODUCT_PRICE_RANGES, PRODUCTS, gen_orders  # noqa: E402


def _gen_orders_oracle(n: int) -> str:
    """DuckDB twin of the generator's md5-derived draws
    (sources/generator.py:39-61): the first 13 hex digits of
    md5(salt||id) as an exact BIGINT (13 per-digit terms with literal
    powers of 16 — max 16^13-1 = 2^52-1, exactly representable), then
    the same floor/index/round arithmetic.  floor() is required because
    DuckDB CAST(double AS INT) rounds-to-nearest while Spark truncates."""
    def hex13(hexpr: str) -> str:
        return "(" + " + ".join(
            f"(strpos('0123456789abcdef', substr({hexpr}, {i + 1}, 1)) - 1) * {16 ** (12 - i)}"
            for i in range(13)
        ) + ")"

    def unit(salt: str) -> str:
        h = f"md5(concat('{salt}', CAST(id AS VARCHAR)))"
        return f"(CAST({hex13(h)} AS DOUBLE) / {float(16 ** 13)!r})"

    prods = ", ".join(f"'{p}'" for p in PRODUCTS)
    mins = ", ".join(repr(lo) for lo, _ in PRODUCT_PRICE_RANGES.values())
    maxs = ", ".join(repr(hi) for _, hi in PRODUCT_PRICE_RANGES.values())
    return f"""
    WITH g AS (
      SELECT id,
             CAST(floor({unit('kaop:product')} * {len(PRODUCTS)}) AS INT) + 1 AS prod_idx,
             {unit('kaop:price')} AS u_price
      FROM range(0, {n}) AS t(id)
    )
    SELECT printf('ORD-%04d', id) AS orderId,
           list_extract([{prods}], prod_idx) AS product,
           round(list_extract([{mins}], prod_idx)
                 + u_price * (list_extract([{maxs}], prod_idx)
                              - list_extract([{mins}], prod_idx)), 2) AS price
    FROM g
    """


@_register(
    "asof_purchase_click",
    """
    SELECT p.event_id, p.user_id, p.ts, p.value,
           c.ts AS ts_asof, c.value AS value_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN LATERAL (
      SELECT ts, value FROM events c
      WHERE c.event_type = 'click' AND c.user_id = p.user_id AND c.ts <= p.ts
      ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON TRUE
    """,
    tags=("olap", "join", "asof"),
    doc="As-of join (nearest prior click per purchase, per user) via the "
        "ordered-window merge-asof — no native Spark operator needed, "
        "one shuffle on the key.  r13: both sides come from the same "
        "table, so the single-scan form tags sides in one projection "
        "instead of unioning two filtered scans of the fact table "
        "(2 FileScans -> 1; rows identical, suite-pinned).",
)
def q_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = asof_join_same_source(
        ev,
        on="user_id",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "click",
        ts="ts",
        left_cols=("event_id", "user_id", "ts", "value"),
        right_value_cols=("value",),
        right_tiebreak="event_id",
    )
    return out.select("event_id", "user_id", "ts", "value", "ts_asof", "value_asof")


@_register(
    "region_nation_rollup",
    """
    SELECT r.r_name, n.n_name,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders o
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY ROLLUP (r.r_name, n.n_name)
    """,
    tags=("olap", "aggregate", "grouping-sets"),
    doc="ROLLUP grouping sets over the region/nation hierarchy.",
)
def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    joined = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count("*").alias("n_orders"), dec_sum("o_totalprice").alias("revenue")
    )


@_register(
    "priority_status_cube",
    """
    SELECT o_orderpriority, o_orderstatus, COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderpriority, o_orderstatus)
    """,
    tags=("olap", "aggregate", "grouping-sets"),
    doc="CUBE over order priority x status.",
)
def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .cube("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n_orders"), dec_sum("o_totalprice").alias("revenue"))
    )


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


@_register(
    "daily_event_type_pivot",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
    """
    + ",\n".join(
        # COUNT (not SUM) so DuckDB types the column BIGINT like Spark's
        # pivot count — uncast SUM(CASE ...) comes back HUGEINT->float64
        # and fails the driver's value hash despite identical values.
        f"       COUNT(CASE WHEN event_type = '{t}' THEN 1 END) AS {t}"
        for t in _EVENT_TYPES
    )
    + """
    FROM events GROUP BY 1
    """,
    tags=("olap", "pivot"),
    doc="Pivot: events per day by type, one column per event type.",
)
def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    piv = (
        ev.groupBy(F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day"))
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
    )
    # pivot leaves NULL for empty cells; the relational form yields 0
    return piv.select(
        "day", *[F.coalesce(F.col(t), F.lit(0)).alias(t) for t in _EVENT_TYPES]
    )


@_register(
    "events_sliding_30m",
    f"""
    WITH b AS (
      SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) * 1000000)
               AS window_start, event_type, value
      FROM events
      UNION ALL
      SELECT make_timestamp((CAST(floor(epoch(ts) / 1800) * 1800 AS BIGINT) - 1800) * 1000000),
             event_type, value
      FROM events)
    SELECT window_start, event_type, COUNT(*) AS n_events,
           {_dsum('value')} AS sum_value
    FROM b GROUP BY 1, 2
    """,
    tags=("window", "streaming-twin"),
    doc="T3: sliding event-time window (1h width / 30m slide) — every "
        "event lands in two epoch-aligned windows.",
)
def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sliding_window_stats(
        load_table(spark, sf_dir, "events"),
        ts="ts", key="event_type", value="value", width="1 hour", slide="30 minutes",
    )


@_register(
    "churned_users",
    """
    SELECT user_id FROM events WHERE ts < TIMESTAMP '2024-01-30 00:00:00'
    EXCEPT
    SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-30 00:00:00'
    """,
    tags=("olap", "setops"),
    doc="Set ops (§2.7): users active before the cutoff and silent after "
        "(EXCEPT = left_anti over distinct).",
)
def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-30 00:00:00").cast("timestamp_ntz")
    before = ev.filter(F.col("ts") < cutoff).select("user_id")
    after = ev.filter(F.col("ts") >= cutoff).select("user_id")
    # subtract == EXCEPT (distinct) — exceptAll would be bag semantics
    return before.subtract(after)


@_register(
    "embedding_near_dup",
    """
    WITH n AS (
      SELECT vec_id, label, embedding,
             sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      FROM embeddings)
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.label AS label,
           list_sum(list_transform(range(1, len(a.embedding) + 1),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (a.norm * b.norm) AS cosine
    FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
                  i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
             / (a.norm * b.norm) >= 0.35
    """,
    tags=("m5", "dedup", "similarity"),
    doc="Embedding-cosine near-dup: label-blocked pair generation (the "
        "blocking key stands in for an IVF cell at scale) + cosine "
        "threshold.",
)
def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = with_norm(load_table(spark, sf_dir, "embeddings"))
    n_par = spark.sparkContext.defaultParallelism
    a = emb.repartition(n_par, F.col("label")).select(
        F.col("vec_id").alias("vec_a"), F.col("label"),
        F.col("embedding").alias("ea"), F.col("norm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("vec_b"), F.col("label"),
        F.col("embedding").alias("eb"), F.col("norm").alias("nb"),
    )
    from ..operators.similarity import DOT
    cos = F.expr(DOT.format(a="ea", b="eb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, ["label"])
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "label", cos.alias("cosine"))
        .filter(F.col("cosine") >= 0.35)
    )


@_register(
    "ivf_cell_sizes",
    """
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, embedding AS ce, norm AS cn FROM n WHERE vec_id < 8),
    scored AS (
      SELECT v.vec_id, c.centroid_id,
             list_sum(list_transform(range(1, len(v.embedding) + 1),
                    i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))
               / (v.norm * c.cn) AS sim
      FROM n v, c),
    best AS (
      SELECT vec_id, centroid_id FROM (
        SELECT vec_id, centroid_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
        FROM scored) WHERE rn = 1)
    SELECT centroid_id, COUNT(*) AS n_vectors FROM best GROUP BY centroid_id
    """,
    tags=("m5", "similarity"),
    doc="IVF coarse quantization: assign every vector to its nearest of "
        "8 centroid vectors (write-time partitioning for ANN search); "
        "report cell sizes.",
)
def q_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ivf_assign(emb, cents)
    return assigned.groupBy("centroid_id").agg(F.count("*").alias("n_vectors"))


@_register(
    "diversity_sample",
    """
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, embedding AS ce, norm AS cn FROM n WHERE vec_id < 8),
    scored AS (
      SELECT v.vec_id, c.centroid_id,
             list_sum(list_transform(range(1, len(v.embedding) + 1),
                    i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))
               / (v.norm * c.cn) AS sim
      FROM n v, c),
    best AS (
      SELECT vec_id, centroid_id FROM (
        SELECT vec_id, centroid_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, centroid_id) AS rn
        FROM scored) WHERE rn = 1),
    sizes AS (SELECT centroid_id, COUNT(*) AS n_cell FROM best GROUP BY centroid_id)
    SELECT b.vec_id, b.centroid_id
    FROM best b JOIN sizes s USING (centroid_id)
    WHERE ((strpos('0123456789abcdef', substr(md5('divsamp:' || CAST(b.vec_id AS VARCHAR)), 1, 1)) - 1) * 16
         + (strpos('0123456789abcdef', substr(md5('divsamp:' || CAST(b.vec_id AS VARCHAR)), 2, 1)) - 1))
          * s.n_cell < 8192
    """,
    tags=("m5", "sampling", "similarity"),
    doc="Cluster-balanced (diversity) sampling: assign every vector to "
        "its IVF cell, then keep ~32 per cell regardless of cell size "
        "— the curation step that stops dense embedding regions from "
        "dominating a training mix.  The accept test is INTEGER-only "
        "(md5 bucket x cell size < 256 x target), so no float-rate "
        "rounding can diverge between engines, and the sample is a "
        "stable per-row property (incremental runs resample "
        "identically — the hash-bucket sampling contract).  Scale "
        "shape: broadcast-assign, one cell-size aggregation joined "
        "back broadcast, pure filter — no sort, no per-cell windows.",
)
def q_diversity_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ivf_assign(emb, cents)
    sizes = assigned.groupBy("centroid_id").agg(F.count("*").alias("n_cell"))
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("divsamp:"), F.col("vec_id").cast("string"))), 1, 2
        ),
        16,
        10,
    ).cast("int")
    return (
        assigned.join(F.broadcast(sizes), "centroid_id")
        .filter(bucket * F.col("n_cell") < 256 * 32)
        .select("vec_id", "centroid_id")
    )


@_register(
    "purchase_avg_lookup",
    f"""
    SELECT event_type, {_dsum('value')} / COUNT(*) AS average_price
    FROM events WHERE event_type = 'purchase' GROUP BY event_type
    """,
    tags=("parity", "aggregate"),
    doc="A2: point lookup of one key's running average "
        "(price_aggregator.py:53-58).",
)
def q_avg_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregate import product_average

    return product_average(
        load_table(spark, sf_dir, "events"), "purchase", key="event_type", value="value"
    )


@_register(
    "generated_orders",
    _gen_orders_oracle(1000),
    tags=("parity", "source"),
    doc="S1: deterministic synthetic order generator (distributed "
        "spark.range + hash-derived draws); hash-checked against a "
        "DuckDB replica of the md5-digit arithmetic, and fully "
        "asserted in tests/test_serde_generator.py.",
)
def q_generated_orders(spark: SparkSession, sf_dir: str) -> DataFrame:  # noqa: ARG001
    return gen_orders(spark, 1000).select("orderId", "product", "price")


@_register(
    "generated_orders_datasource",
    _gen_orders_oracle(1000),
    tags=("parity", "source", "datasource"),
    doc="S1 through the Spark 4 PYTHON DATASOURCE surface "
        "(sources/order_datasource.py): the same deterministic orders "
        "served by a registered pluggable source — executor-parallel "
        "id-range partitions, one Arrow RecordBatch per partition, "
        "Spark HALF_UP rounding replicated via decimal — and checked "
        "against the SAME oracle as the column-expression generator "
        "(bit-identity of the two paths is also unit-tested).  This is "
        "the engine's add-a-source extension story made concrete.",
)
def q_generated_orders_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:  # noqa: ARG001
    from ..sources.order_datasource import register as _reg_ds

    _reg_ds(spark)
    return (
        spark.read.format("kaop_orders")
        .option("n", 1000)
        .load()
        .select("orderId", "product", "price")
    )


@_register(
    "avro_ocf_roundtrip",
    f"""
    SELECT o_orderstatus,
           'web' AS channel,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("source", "avro", "datasource"),
    doc="Jar-less Avro OCF lake round-trip (sources/avro_ocf.py): "
        "orders written as spec-compliant .avro container parts via "
        "df.write.format('kaop_avro') in TWO append jobs (part names "
        "carry a per-job uuid, so appends never collide), read back "
        "under an EVOLVED reader schema — resolve_record fills a new "
        "defaulted column and promotes the nullable-union orderkey "
        "long -> double (the ['null', T] unwrap path) — then "
        "aggregated.  The oracle is plain SQL over the original "
        "parquet: every value must survive the Avro binary codec "
        "bit-exactly (doubles are IEEE 8-byte little-endian per "
        "spec, strings UTF-8).",
)
def q_avro_ocf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.avro_ocf import read_avro_ocf
    from ..sources.avro_ocf import register as _reg_avro

    _reg_avro(spark)
    out = tempfile.mkdtemp(prefix="kaop_ocf_rt_") + "/orders"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    # two appends = the collision-prone path the writer must survive
    for parity in (0, 1):
        (
            o.filter(F.col("o_orderkey") % 2 == parity)
            .write.format("kaop_avro")
            .option("path", out)
            .mode("append")
            .save()
        )
    reader_schema = {
        "type": "record",
        "name": "SparkRecord",
        "fields": [
            # writer wrote ["null","long"]: nullable-union promotion
            {"name": "o_orderkey", "type": ["null", "double"]},
            {"name": "o_orderstatus", "type": ["null", "string"]},
            {"name": "o_totalprice", "type": ["null", "double"]},
            # absent in writer: spec default fills
            {"name": "channel", "type": "string", "default": "web"},
        ],
    }
    back = read_avro_ocf(spark, out, reader_schema=reader_schema)
    return back.groupBy("o_orderstatus", "channel").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice").alias("total_price"),
    )


@_register(
    "avro_uri_manifest_write",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_orderstatus = 'O'
    GROUP BY o_orderpriority
    """,
    tags=("source", "avro", "datasource", "manifest"),
    doc="The object-store (URI) write path of the kaop_avro source "
        "(sources/avro_ocf.py): orders written to a file:// URI go "
        "through the MANIFEST COMMIT protocol — tasks write "
        "final-named uuid parts directly (no rename, as object "
        "stores require), the driver publishes each job with one "
        "versioned _manifest.json PUT, and a second append job "
        "folds its parts into the committed set.  Before reading "
        "back, a final-named part that NO commit published is "
        "planted in the directory carrying poison values: the "
        "manifest-resolved listing must hide it — the oracle over "
        "the source parquet fails if even one uncommitted row "
        "leaks, so this row pins the protocol's visibility "
        "invariant, not just the codec.",
)
def q_avro_uri_manifest_write(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.avro_ocf import register as _reg_avro
    from ..sources.avro_ocf import write_avro_ocf

    _reg_avro(spark)
    out = "file://" + tempfile.mkdtemp(prefix="kaop_ocf_uri_") + "/orders"
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_orderkey", "o_orderpriority", "o_totalprice")
    )
    # two append JOBS: the second one's publish must fold the first
    # job's committed parts into the manifest, not replace them
    for parity in (0, 1):
        (
            o.filter(F.col("o_orderkey") % 2 == parity)
            .write.format("kaop_avro")
            .option("path", out)
            .mode("append")
            .save()
        )
    # an aborted/foreign final-named part no commit ever published —
    # invisible to the manifest-resolved read, or the oracle fails
    write_avro_ocf(
        f"{out}/part-uncommitted-poison.avro",
        [{"o_orderkey": 0, "o_orderpriority": "1-URGENT",
          "o_totalprice": 9.9e9}],
        {"type": "record", "name": "SparkRecord", "fields": [
            {"name": "o_orderkey", "type": ["null", "long"]},
            {"name": "o_orderpriority", "type": ["null", "string"]},
            {"name": "o_totalprice", "type": ["null", "double"]},
        ]},
    )
    back = spark.read.format("kaop_avro").option("path", out).load()
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice").alias("total_price"),
    )


@_register(
    "avro_stats_pruned_read",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_totalprice < 50000.0
    GROUP BY o_orderpriority
    """,
    tags=("source", "avro", "datasource", "stats-pruning", "pushdown"),
    doc="Stats-based FILE SKIPPING for the Avro lake source "
        "(sources/avro_ocf.py): every part the kaop_avro writer emits "
        "carries per-column min/max/null-count stats in its container "
        "header (kaop.stats) and, on manifest commits, in "
        "_manifest.json; with statsPruning=true the batch reader "
        "receives Spark's pushed filters (Python DataSource "
        "pushFilters, spark.sql.python.filterPushdown.enabled) and "
        "plans only the parts whose stats admit a match — the "
        "parquet-style scan-pruning story at 100 TB, where a "
        "selective filter over a range-clustered lake must open a "
        "handful of files, not all of them.  Orders are written "
        "range-clustered on o_totalprice into 8 parts, so the "
        "< 50000 filter prunes most parts at planning time.  The "
        "read is BOOBY-TRAPPED: a planted part whose header stats "
        "claim a disjoint price range has a deliberately corrupt "
        "body — if pruning ever stops skipping it the scan raises "
        "and this row goes red, so the green row pins the pruning "
        "behavior itself, not just the aggregate.",
)
def q_avro_stats_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.avro_ocf import (
        _list_avro,
        _stats_meta,
        ocf_bytes,
        parse_ocf,
    )
    from ..sources.avro_ocf import register as _reg_avro

    _reg_avro(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    out = tempfile.mkdtemp(prefix="kaop_ocf_pruned_") + "/orders"
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    (
        load_table(spark, sf_dir, "orders")
        .select(*cols)
        .repartitionByRange(8, "o_totalprice")  # range-clustered parts
        .write.format("kaop_avro")
        .option("path", out)
        .mode("append")
        .save()
    )
    # the booby trap: header stats disjoint from the filter, corrupt
    # body, name sorted past every real part (schema discovery must
    # not open it either)
    first = _list_avro(out)[0]
    pschema, _ = parse_ocf(open(first, "rb").read())
    prec = [{"o_orderkey": -1, "o_orderpriority": "X-POISON",
             "o_totalprice": 9.9e9}]
    raw = ocf_bytes(prec, pschema, extra_meta=_stats_meta(prec, cols))
    with open(f"{out}/part-zz-poison.avro", "wb") as f:
        f.write(raw[:-16] + bytes(16))  # break the trailing sync marker
    back = (
        spark.read.format("kaop_avro")
        .option("path", out)
        .option("statsPruning", "true")
        .load()
        .filter(F.col("o_totalprice") < 50000.0)
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice").alias("total_price"),
    )


@_register(
    "avro_zorder_pruned_read",
    f"""
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice')} AS total_price
    FROM orders
    WHERE o_totalprice < 20000.0
    GROUP BY o_orderpriority
    """,
    tags=("source", "avro", "datasource", "stats-pruning", "zorder"),
    doc="Z-ORDER clustered layout (write_avro_zordered — the Delta "
        "OPTIMIZE…ZORDER BY story): lexicographic range clustering "
        "gives tight per-part min/max on the LEADING key only, so a "
        "filter on the second column overlaps every part; the Morton "
        "bit-interleave makes each part a small hyper-rectangle in "
        "the full column space, and this row filters on the SECOND "
        "zorder column (o_totalprice, after o_custkey) — exactly the "
        "predicate 1-D clustering cannot prune — through the "
        "statsPruning reader.  Booby-trapped like its siblings: a "
        "planted part with disjoint price stats has a corrupt body, "
        "so the green row pins that second-column pruning actually "
        "happens (head-to-head layout comparison in "
        "tests/test_zorder.py).",
)
def q_avro_zorder_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.avro_ocf import (
        _list_avro,
        _stats_meta,
        ocf_bytes,
        parse_ocf,
        write_avro_zordered,
    )
    from ..sources.avro_ocf import register as _reg_avro

    _reg_avro(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    out = tempfile.mkdtemp(prefix="kaop_ocf_zorder_") + "/orders"
    cols = ["o_orderkey", "o_orderpriority", "o_custkey", "o_totalprice"]
    write_avro_zordered(
        load_table(spark, sf_dir, "orders").select(*cols),
        out,
        zorder_by=["o_custkey", "o_totalprice"],
        num_parts=8,
    )
    first = _list_avro(out)[0]
    pschema, _ = parse_ocf(open(first, "rb").read())
    prec = [{"o_orderkey": -1, "o_orderpriority": "X-POISON",
             "o_custkey": -1, "o_totalprice": 9.9e9}]
    raw = ocf_bytes(prec, pschema, extra_meta=_stats_meta(prec, cols))
    with open(f"{out}/part-zz-poison.avro", "wb") as f:
        f.write(raw[:-16] + bytes(16))  # break the trailing sync marker
    back = (
        spark.read.format("kaop_avro")
        .option("path", out)
        .option("statsPruning", "true")
        .load()
        .filter(F.col("o_totalprice") < 20000.0)
    )
    return back.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice").alias("total_price"),
    )


@_register(
    "avro_compacted_roundtrip",
    f"""
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           {_dsum('o_totalprice')} AS total_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    tags=("source", "avro", "datasource", "maintenance", "manifest"),
    doc="Lake maintenance for kaop_avro directories "
        "(sources/avro_ocf.py compact_avro_dir / vacuum_avro_dir): "
        "orders land as three small append jobs on a manifest-managed "
        "URI directory, plus a planted final-named part no commit "
        "published carrying poison values; compaction rewrites the "
        "committed rows dense in ONE distributed job whose overwrite "
        "commit is a single manifest PUT (readers see wholly-old or "
        "wholly-new, never a mix — and never the poison), with the "
        "row count planned from the parts' own stats, no data pass; "
        "vacuum then deletes the invisible orphan the manifest was "
        "hiding.  The aggregate equals plain SQL over the source "
        "parquet only if every committed row survived the swap "
        "exactly once and the uncommitted part never leaked.",
)
def q_avro_compacted_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.avro_ocf import (
        compact_avro_dir,
        vacuum_avro_dir,
        write_avro_ocf,
    )
    from ..sources.avro_ocf import register as _reg_avro

    _reg_avro(spark)
    out = "file://" + tempfile.mkdtemp(prefix="kaop_ocf_compact_") + "/orders"
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    for residue in (0, 1, 2):  # three small append jobs -> small parts
        (
            o.filter(F.col("o_orderkey") % 3 == residue)
            .coalesce(1)
            .write.format("kaop_avro")
            .option("path", out)
            .mode("append")
            .save()
        )
    # a final-named part no commit published: poison values that would
    # corrupt the aggregate if compaction or the read ever saw it
    write_avro_ocf(
        f"{out}/part-zz-uncommitted.avro",
        [{"o_orderkey": -1, "o_orderstatus": "O", "o_totalprice": 8.8e9}],
        {"type": "record", "name": "SparkRecord", "fields": [
            {"name": "o_orderkey", "type": ["null", "long"]},
            {"name": "o_orderstatus", "type": ["null", "string"]},
            {"name": "o_totalprice", "type": ["null", "double"]},
        ]},
    )
    stats = compact_avro_dir(spark, out, target_records=8000)
    assert stats["parts_before"] == 3, stats
    vacuum_avro_dir(out, grace_seconds=0.0)  # retires the orphan
    back = spark.read.format("kaop_avro").option("path", out).load()
    return back.groupBy("o_orderstatus").agg(
        F.count("*").alias("n_orders"),
        dec_sum("o_totalprice").alias("total_price"),
    )


@_register(
    "avro_bloom_pruned_lookup",
    """
    SELECT o_orderkey, o_orderpriority,
           CAST(CAST(o_totalprice AS DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders
    WHERE o_orderkey IN (17, 4242, 9001)
    """,
    tags=("source", "avro", "datasource", "stats-pruning", "bloom"),
    doc="Bloom-filter point-lookup pruning for the Avro lake source: "
        "orders written HASH-distributed on o_orderkey (every part "
        "spans nearly the full key range, so min/max stats cannot "
        "prune an equality probe) with bloomColumns=o_orderkey — each "
        "part's stats then carry a bloom filter over its distinct "
        "keys, and the statsPruning reader answers an IN-lookup by "
        "opening only the parts whose bloom admits some key.  This is "
        "the Iceberg/parquet bloom story for a 100 TB lake keyed by "
        "id: a point read costs O(matching parts), not a scan.  "
        "Booby-trapped like avro_stats_pruned_read: a planted part "
        "whose bloom lacks every probed key has a corrupt body, so "
        "the row goes red if bloom pruning ever stops skipping it.",
)
def q_avro_bloom_pruned_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import json as _json
    import tempfile

    from ..sources.avro_ocf import (
        STATS_META_KEY,
        _list_avro,
        collect_stats,
        ocf_bytes,
        parse_ocf,
    )
    from ..sources.avro_ocf import register as _reg_avro

    _reg_avro(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    out = tempfile.mkdtemp(prefix="kaop_ocf_bloom_") + "/orders"
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    (
        load_table(spark, sf_dir, "orders")
        .select(*cols)
        .repartition(8, "o_orderkey")  # hash split: min/max can't prune
        .write.format("kaop_avro")
        .option("path", out)
        .option("bloomColumns", "o_orderkey")
        .mode("append")
        .save()
    )
    first = _list_avro(out)[0]
    pschema, _ = parse_ocf(open(first, "rb").read())
    prec = [{"o_orderkey": 10**9 + i, "o_orderpriority": "X-POISON",
             "o_totalprice": 1.0} for i in range(20)]
    st = collect_stats(prec, cols, bloom_cols={"o_orderkey"})
    raw = ocf_bytes(prec, pschema,
                    extra_meta={STATS_META_KEY: _json.dumps(st).encode()})
    with open(f"{out}/part-zz-poison.avro", "wb") as f:
        f.write(raw[:-16] + bytes(16))  # corrupt body; bloom lacks keys
    return (
        spark.read.format("kaop_avro")
        .option("path", out)
        .option("statsPruning", "true")
        .load()
        .filter(F.col("o_orderkey").isin(17, 4242, 9001))
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.col("o_totalprice")
            .cast("decimal(18,2)")
            .cast("double")
            .alias("total_price"),
        )
    )


# ---------------------------------------------------------------------------
# Statistical aggregates, analytic windows (lag/rank), fact-fact and
# semi/anti joins, SQL-API twin, exact per-record streaming emission.
# ---------------------------------------------------------------------------

from ..sources.tables import register_views  # noqa: E402
from ..streaming.pipeline import run_streaming_running_avg  # noqa: E402


@_register(
    "sql_api_events_hourly",
    QUERIES["events_hourly"].oracle,
    tags=("window", "sql-api"),
    doc="The SQL entry path: same tumbling-window aggregate expressed as "
        "spark.sql() text over registered views — Catalyst produces the "
        "same plan as the DataFrame form.",
)
def q_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_views(spark, sf_dir, tables=("events",))
    return spark.sql(f"""
        SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP_NTZ) AS window_start,
               event_type,
               COUNT(*) AS n_events,
               {_dsum('value')} AS sum_value,
               MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events
        GROUP BY 1, 2
    """)


@_register(
    "value_percentiles",
    """
    SELECT event_type,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.9), 6) AS p90,
           ROUND(quantile_cont(value, 0.99), 6) AS p99
    FROM events GROUP BY event_type
    """,
    tags=("olap", "aggregate", "stats"),
    doc="Exact interpolated percentiles per key (streaming twin would "
        "use approx percentile_approx).",
)
def q_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile("value", F.lit(0.5)), 6).alias("p50"),
        F.round(F.percentile("value", F.lit(0.9)), 6).alias("p90"),
        F.round(F.percentile("value", F.lit(0.99)), 6).alias("p99"),
    )


@_register(
    "value_dispersion",
    """
    WITH s AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_d,
             CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sumsq_d
      FROM events GROUP BY event_type)
    SELECT event_type, n,
           sum_d / n AS mean_value,
           sumsq_d / n - (sum_d / n) * (sum_d / n) AS var_value,
           sqrt(sumsq_d / n - (sum_d / n) * (sum_d / n)) AS std_value
    FROM s
    """,
    tags=("olap", "aggregate", "stats"),
    doc="Population variance/stddev via exact decimal sum and sum-of-"
        "squares (order-independent, unlike streaming Welford).",
)
def q_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    dec = F.col("value").cast("decimal(18,2)")
    agg = ev.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(dec).cast("double").alias("sum_d"),
        F.sum(dec * dec).cast("double").alias("sumsq_d"),
    )
    mean = F.col("sum_d") / F.col("n")
    var = F.col("sumsq_d") / F.col("n") - mean * mean
    return agg.select(
        "event_type", "n", mean.alias("mean_value"),
        var.alias("var_value"), F.sqrt(var).alias("std_value"),
    )


@_register(
    "daily_revenue_lag",
    f"""
    WITH d AS (
      SELECT event_type,
             make_timestamp(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT) * 1000000) AS day,
             {_dsum('value')} AS revenue
      FROM events GROUP BY 1, 2)
    SELECT event_type, day, revenue,
           lag(revenue) OVER w AS prev_revenue,
           revenue - lag(revenue) OVER w AS revenue_delta,
           CAST(RANK() OVER (PARTITION BY event_type ORDER BY revenue DESC, day) AS INTEGER)
             AS revenue_rank
    FROM d
    WINDOW w AS (PARTITION BY event_type ORDER BY day)
    """,
    tags=("olap", "window"),
    doc="Analytic windows the reference lacks: lag (day-over-day delta) "
        "and rank per key over a daily rollup.",
)
def q_daily_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.date_trunc("day", F.col("ts")).cast("timestamp_ntz").alias("day"),
    ).agg(dec_sum("value").alias("revenue"))
    w = Window.partitionBy("event_type").orderBy("day")
    wr = Window.partitionBy("event_type").orderBy(F.desc("revenue"), F.asc("day"))
    return daily.select(
        "event_type", "day", "revenue",
        F.lag("revenue").over(w).alias("prev_revenue"),
        (F.col("revenue") - F.lag("revenue").over(w)).alias("revenue_delta"),
        F.rank().over(wr).cast("int").alias("revenue_rank"),
    )


@_register(
    "user_retention_cohorts",
    """
    WITH w AS (
      SELECT user_id, CAST(floor(epoch(ts) / 604800) AS BIGINT) AS wk
      FROM events),
    f AS (SELECT user_id, MIN(wk) AS cohort_week FROM w GROUP BY user_id),
    a AS (SELECT DISTINCT user_id, wk FROM w)
    SELECT f.cohort_week, a.wk - f.cohort_week AS week_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM a JOIN f USING (user_id)
    GROUP BY 1, 2
    """,
    tags=("olap", "aggregate", "cohort"),
    doc="Retention cohort matrix: users bucketed by first-activity "
        "week, counted per (cohort, week-offset) — the standard "
        "engagement rollup over an event stream.  Weeks are integer "
        "epoch/604800 buckets (exact in both engines; date_trunc "
        "week-start conventions differ).  Scale shape: ONE shuffle on "
        "user_id computes min-week and the distinct-week set together "
        "(set cardinality is bounded by the stream's span in weeks, "
        "never by event volume); exploding the set yields unique "
        "(user, week) rows, so the final tiny cohort-grid aggregation "
        "is a plain count — no countDistinct expand, no join.  The "
        "naive form (min-agg + distinct + join) pays three shuffles.",
)
def q_user_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    wk = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(604800)
    ).cast("long")
    per_user = (
        ev.select("user_id", wk.alias("wk"))
        .groupBy("user_id")
        .agg(F.min("wk").alias("cohort_week"), F.collect_set("wk").alias("wks"))
    )
    return (
        per_user.select(
            "cohort_week", F.explode("wks").alias("wk")
        )
        .groupBy(
            "cohort_week",
            (F.col("wk") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count("*").alias("n_users"))
    )


@_register(
    "priority_line_revenue",
    """
    SELECT o.o_orderpriority,
           COUNT(*) AS n_items,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    tags=("olap", "join"),
    doc="Fact-fact join (lineitem x orders, both large): shuffle join on "
        "the order key — the sort-merge/shuffled-hash path AQE manages, "
        "vs the broadcast dims elsewhere.",
)
def q_priority_line_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("decimal(18,4)")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_items"), F.sum(disc).cast("double").alias("revenue"))
    )


@_register(
    "customers_with_pending_orders",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
    """,
    tags=("olap", "join", "semi"),
    doc="Semi join (EXISTS) — left_semi, no row multiplication.",
)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    pending = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select("o_custkey")
    )
    return (
        c.join(pending, c.c_custkey == pending.o_custkey, "left_semi")
        .select("c_custkey", "c_name")
    )


@_register(
    "streaming_running_avg_per_record",
    """
    SELECT event_type AS key, event_id AS seq, value,
           COUNT(*) OVER w AS running_count,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_sum,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
             / (COUNT(*) OVER w) AS running_avg
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    """,
    tags=("parity", "streaming", "stateful"),
    doc="T2 exact per-record emission: applyInPandasWithState carries "
        "(count, integer-cents sum) per key and emits one row per input "
        "record — the reference's per-record running average "
        "(price_aggregator.py:35-51), hash-checked against the batch "
        "window-function oracle.",
)
def q_streaming_per_record(spark: SparkSession, sf_dir: str) -> DataFrame:
    return run_streaming_running_avg(spark, sf_dir)


# ---------------------------------------------------------------------------
# Session-window streaming twin, tf-idf.
# ---------------------------------------------------------------------------

_SESSIONS_CTE = """
    WITH flagged AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_sess
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sess AS (
      SELECT user_id, ts,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      FROM flagged)
"""


@_register(
    "streaming_user_sessions",
    _SESSIONS_CTE + """
    SELECT user_id, MIN(ts) AS session_start, MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM sess GROUP BY user_id, session_id
    """,
    tags=("window", "streaming"),
    doc="T3 session windows as a *streaming* aggregation: native "
        "session_window(ts, '30 minutes') per user, complete-mode memory "
        "sink, availableNow — must equal the batch lag/cumsum "
        "sessionization oracle.",
)
def q_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import drain_to_df, stream_table

    ev = stream_table(spark, sf_dir, "events")
    agg = (
        ev.groupBy(F.session_window(F.col("ts"), "30 minutes").alias("sw"), F.col("user_id"))
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
    return drain_to_df(agg, "complete").select(
        "user_id", "session_start", "session_end", "n_events"
    )


@_register(
    "tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY doc_id, token),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY token),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.token,
             CAST(tf.tf AS DOUBLE) * n.n_docs / df.df AS tf_icf
      FROM tf JOIN df ON tf.token = df.token CROSS JOIN n),
    ranked AS (
      SELECT doc_id, token, tf_icf,
             CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                    ORDER BY tf_icf DESC, token) AS INTEGER) AS term_rank
      FROM scored)
    SELECT doc_id, token, tf_icf, term_rank FROM ranked WHERE term_rank <= 3
    """,
    tags=("m5", "text"),
    doc="tf-idf-style term weighting (rarity factor N/df kept linear so "
        "the score is an exact rational — cross-engine log() rounding "
        "would be the only nondeterminism): top-3 terms per doc.",
)
def q_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select(F.col("doc_id"), F.explode(F.split("text", " ")).alias("token"))
    # tf is PERSISTED (r14): it has three consumers (the scored join's
    # left side, dfreq, n_docs) and r13's one-pass intent silently did
    # NOT hold — the executed plan showed the tf subtree computed TWICE
    # and documents scanned a THIRD time for n_docs, because column
    # pruning rewrites each consumer's copy of the aggregation (dfreq's
    # drops the count) so the exchanges are no longer identical and
    # ReusedExchange never fires (verified: executedPlan had
    # ReusedExchange=0, 3 FileScans).  The explicit persist is the
    # guide §5 case — reused AND expensive to recompute (a full corpus
    # explode + aggregation per extra pass at 100 TB); after: ONE
    # corpus scan/token pass, jobs 10 -> 6, shuffle 3.0 MB -> 1.0 MB.
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf")).persist()
    # Document frequency FROM the tf table (r13 optimization): tf rows
    # are by construction the distinct (doc_id, token) pairs, so
    # COUNT(*) per token over tf == COUNT(DISTINCT doc_id) per token
    # over the raw token stream (assumes doc_id non-null — a NULL
    # doc_id would count as 1 here but be excluded by the oracle's
    # COUNT(DISTINCT doc_id); true of the generated datasets, r13
    # ADVICE note).
    dfreq = tf.groupBy("token").agg(F.count("*").alias("df"))
    # n_docs FROM the tf table too (r14): explode(split(text)) emits at
    # least one token row per document (split of an empty string is
    # [''], never an empty array), so the distinct doc_ids of tf ARE
    # the distinct doc_ids of documents — the third corpus scan the
    # oracle's COUNT(DISTINCT doc_id) FROM documents form paid is
    # dropped (assumes text non-null like every tokenizing query here;
    # NULL text would explode to zero rows).  Hash-verified against
    # the unchanged oracle at sf0.001/0.01/0.1.
    n = tf.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", "token",
            (F.col("tf").cast("double") * F.col("n_docs") / F.col("df")).alias("tf_icf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tf_icf"), F.asc("token"))
    return (
        scored.withColumn("term_rank", F.row_number().over(w).cast("int"))
        .filter(F.col("term_rank") <= 3)
    )


# ---------------------------------------------------------------------------
# Stream-union (multi-topic subscribe analogue) and display formatting.
# ---------------------------------------------------------------------------

@_register(
    "multi_stream_union",
    """
    SELECT stream, event_id, value FROM (
      SELECT 'clicks' AS stream, event_id, value FROM events WHERE event_type = 'click'
      UNION ALL
      SELECT 'views' AS stream, event_id, value FROM events WHERE event_type = 'view')
    """,
    tags=("parity", "setops"),
    doc="§2.7 source-level union — the engine form of the reference's "
        "multi-topic subscribe (avro_order_consumer.py:151-155): two "
        "tagged streams unioned by name.",
)
def q_multi_stream_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.lit("clicks").alias("stream"), "event_id", "value"
    )
    views = ev.filter(F.col("event_type") == "view").select(
        F.lit("views").alias("stream"), "event_id", "value"
    )
    return clicks.unionByName(views)


@_register(
    "order_display_lines",
    """
    SELECT event_id,
           printf('Event %d: %s @ $%.2f', event_id, event_type, value) AS display
    FROM events
    """,
    tags=("parity", "function"),
    doc="F6 display formatting (kafka_utils.py:69-83) as a codegen'd "
        "format_string over the stream.",
)
def q_display_lines(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.format_string("Event %d: %s @ $%.2f", F.col("event_id"), F.col("event_type"), F.col("value")).alias("display"),
    )


# ---------------------------------------------------------------------------
# Semi-structured JSON columns, regexp/date functions, correlated subquery.
# ---------------------------------------------------------------------------

@_register(
    "props_json_extraction",
    """
    SELECT bucket, COUNT(*) AS n, MIN(k) AS min_k, MAX(k) AS max_k
    FROM (SELECT CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
                 CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS bucket
          FROM events)
    GROUP BY bucket
    """,
    tags=("olap", "json"),
    doc="Semi-structured payload column: JSON path extraction "
        "(get_json_object) + typed aggregation, all JVM-side.",
)
def q_props_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.select(k.alias("k"), (k % 10).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.min("k").alias("min_k"), F.max("k").alias("max_k"))
    )


@_register(
    "priority_code_extract",
    """
    SELECT DISTINCT o_orderpriority,
           CAST(regexp_extract(o_orderpriority, '([0-9]+)', 1) AS INTEGER) AS priority_code
    FROM orders
    """,
    tags=("olap", "function", "regex"),
    doc="Regex extraction (the engine form of F13's pattern matching "
        "generalized to capture groups).",
)
def q_priority_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderpriority",
        F.regexp_extract("o_orderpriority", "([0-9]+)", 1).cast("int").alias("priority_code"),
    ).distinct()


@_register(
    "orders_by_month",
    """
    SELECT CAST(year(o_orderdate) AS INTEGER) AS order_year,
           CAST(month(o_orderdate) AS INTEGER) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
    FROM orders GROUP BY 1, 2
    """,
    tags=("olap", "aggregate", "datetime"),
    doc="Calendar rollup: year/month extraction + aggregate (date "
        "dimension handling the reference never needed).",
)
def q_orders_by_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            F.month("o_orderdate").cast("int").alias("order_month"),
        )
        .agg(F.count("*").alias("n_orders"), dec_sum("o_totalprice").alias("revenue"))
    )


_ABOVE_AVG_SQL = """
    SELECT o.o_orderkey, o.o_custkey, o.o_totalprice
    FROM orders o
    WHERE o.o_totalprice > (
      SELECT CAST(SUM(CAST(i.o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
      FROM orders i WHERE i.o_custkey = o.o_custkey)
"""


@_register(
    "above_customer_avg_orders",
    _ABOVE_AVG_SQL,
    tags=("olap", "subquery"),
    doc="Correlated scalar subquery (each order vs its customer's own "
        "average) — Catalyst decorrelates it into an aggregate + join; "
        "identical SQL text runs on both engines.",
)
def q_above_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views as _rv

    _rv(spark, sf_dir, tables=("orders",))
    return spark.sql(_ABOVE_AVG_SQL)


@_register(
    "approx_distinct_users",
    None,  # HLL++/KLL sketch values are engine-specific — rows-only check;
           # exact twins are oracle-checked in overall_stats / value_percentiles
    tags=("olap", "aggregate", "approx"),
    doc="Streaming-compatible approximate aggregates: HLL++ distinct "
        "users and KLL-sketch quantiles per event type (the forms usable "
        "inside update-mode streaming where exact countDistinct is "
        "disallowed — SURVEY.md §7 hard parts).",
)
def q_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id").alias("approx_users"),
        F.percentile_approx("value", 0.5).alias("approx_median"),
    )


def _cms_oracle(depth: int = 4) -> str:
    # Mirrors operators/sketch.py exactly: bucket = first two hex
    # digits of md5('cms<r>:'||key), cells are integer sums, estimate
    # is an integer MIN over the key's cells — nothing floats.
    def bucket(key: str) -> str:
        h = f"md5('cms' || CAST(r.depth AS VARCHAR) || ':' || CAST({key} AS VARCHAR))"
        return f"({_hexval(h, 1)} * 16 + {_hexval(h, 2)})"

    return f"""
    WITH depths AS (SELECT UNNEST(range({depth})) AS depth),
    cells AS (
      SELECT r.depth, {bucket('e.user_id')} AS bucket
      FROM events e CROSS JOIN depths r),
    sketch AS (
      SELECT depth, bucket, COUNT(*) AS cnt
      FROM cells GROUP BY depth, bucket),
    exact AS (
      SELECT user_id, COUNT(*) AS exact_count FROM events GROUP BY user_id),
    probes AS (
      SELECT x.user_id, r.depth, {bucket('x.user_id')} AS bucket
      FROM exact x CROSS JOIN depths r),
    est AS (
      SELECT p.user_id, MIN(COALESCE(s.cnt, 0)) AS est
      FROM probes p
      LEFT JOIN sketch s ON s.depth = p.depth AND s.bucket = p.bucket
      GROUP BY p.user_id)
    SELECT e.user_id, e.exact_count,
           CAST(t.est AS BIGINT) AS est_count,
           CAST(t.est - e.exact_count AS BIGINT) AS overestimate
    FROM exact e JOIN est t ON t.user_id = e.user_id
    """


@_register(
    "cms_user_frequencies",
    _cms_oracle(),
    tags=("m5", "aggregate", "approx", "sketch"),
    doc="Count-min sketch (Cormode & Muthukrishnan '05): per-user event "
        "frequencies estimated from a FIXED 4 x 256 integer grid "
        "instead of per-key state — the bounded-memory path when the "
        "key cardinality no longer fits exact counters.  Cells are "
        "plain sums (associative, map-side-combinable, mergeable "
        "across streams); estimates are integer MINs over md5-derived "
        "buckets, so unlike the HLL row (approx_distinct_users, "
        "engine-specific sketch — rows-only) the whole sketch "
        "hash-matches the oracle, and the output exposes the "
        "one-sided guarantee directly (overestimate >= 0, also "
        "suite-pinned).",
)
def q_cms_user_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cms_build, cms_estimate

    ev = load_table(spark, sf_dir, "events")
    sketch = cms_build(ev, "user_id")
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    est = cms_estimate(sketch, exact.select("user_id"), "user_id")
    return exact.join(est, "user_id").select(
        "user_id",
        "exact_count",
        F.col("est").alias("est_count"),
        (F.col("est") - F.col("exact_count")).cast("long").alias("overestimate"),
    )


def _hll_oracle() -> str:
    from ..operators.sketch import HLL_ALPHA_M2, HLL_BUCKETS

    h = "md5('hll:' || CAST(user_id AS VARCHAR))"
    v = " + ".join(
        f"{_hexval(h, i + 3)} * {16 ** (7 - i)}" for i in range(8)
    )
    return f"""
    WITH hashed AS (
      SELECT ({_hexval(h, 1)} * 16 + {_hexval(h, 2)}) AS bucket,
             CAST({v} AS BIGINT) AS v
      FROM events),
    regs AS (
      SELECT bucket,
             MAX(CASE WHEN v = 0 THEN 33
                      ELSE 33 - length(bin(v)) END) AS M
      FROM hashed GROUP BY bucket)
    SELECT CAST({HLL_BUCKETS} - COUNT(*) AS INTEGER) AS zero_registers,
           {HLL_ALPHA_M2!r} / (({HLL_BUCKETS} - COUNT(*))
             + SUM(1.0 / CAST(CAST(1 AS BIGINT) << M AS DOUBLE)))
             AS hll_raw_estimate,
           CAST(SUM(M) AS BIGINT) AS register_sum,
           CAST(MAX(M) AS INTEGER) AS max_register,
           (SELECT COUNT(DISTINCT user_id) FROM events) AS n_exact_users
    FROM regs
    """


@_register(
    "hll_distinct_users",
    _hll_oracle(),
    tags=("m5", "aggregate", "approx", "sketch"),
    doc="HyperLogLog from first principles (Flajolet et al. '07) — the "
        "TRANSPARENT twin of approx_distinct_users: Spark's HLL++ "
        "sketch bytes are engine-opaque (that row is rows-only by "
        "necessity), but the algorithm is integer/bit arithmetic on a "
        "deterministic hash, so this 256-register implementation "
        "hash-matches the oracle exactly — bucket and rank from md5 "
        "digits, leading-zero count via length(bin(v)) (no libm), "
        "registers merged with MAX (idempotent + associative: "
        "re-ingesting a key is a no-op, partitioning cannot matter), "
        "and a harmonic sum whose power-of-two terms make even the "
        "float SUM order-independent.  Raw estimate only — the "
        "small-range ln() correction is libm-specific; "
        "zero_registers is exposed for consumers to apply it "
        "(tests/test_sketch.py does, and pins accuracy vs exact).",
)
def q_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_estimate, hll_registers

    ev = load_table(spark, sf_dir, "events")
    est = hll_estimate(hll_registers(ev, "user_id"))
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact_users"))
    return est.crossJoin(exact)


@_register(
    "value_histogram_quantiles",
    """
    WITH cents AS (
      SELECT CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
      FROM events),
    hist AS (
      SELECT CAST((c - (c % 100)) / 100 AS BIGINT) AS bucket,
             COUNT(*) AS cnt
      FROM cents WHERE c >= 0 GROUP BY 1),
    cum AS (
      SELECT bucket, cnt,
             SUM(cnt) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER () AS n_total
      FROM hist),
    qs AS (SELECT UNNEST(CAST([0.5, 0.9, 0.99] AS DOUBLE[])) AS quantile),
    hit AS (
      SELECT q.quantile, c.bucket, c.cnt, c.cum, c.n_total,
             CAST(ceil(q.quantile * c.n_total) AS BIGINT) AS r
      FROM cum c CROSS JOIN qs q
      WHERE c.cum >= CAST(ceil(q.quantile * c.n_total) AS BIGINT)),
    first AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY quantile ORDER BY bucket) AS rn
      FROM hit)
    SELECT quantile,
           (CAST(bucket * 100 AS DOUBLE)
             + CAST((r - (cum - cnt)) * 100 AS DOUBLE) / CAST(cnt AS DOUBLE))
             / 100.0 AS est_value,
           CAST(n_total AS BIGINT) AS n_total
    FROM first WHERE rn = 1
    """,
    tags=("m5", "aggregate", "approx", "sketch"),
    doc="Fixed-width histogram quantiles — the transparent mergeable "
        "quantile sketch (percentile_approx's KLL bytes are "
        "engine-opaque; an integer-cents histogram is a plain keyed "
        "count: associative, map-side-combinable, mergeable across "
        "streams and days, streaming-state-compatible, O(range/width) "
        "state).  Estimates interpolate inside the answering bucket "
        "with deterministic double arithmetic, so unlike KLL the whole "
        "sketch AND its estimates hash-match the oracle; error is "
        "bounded by one bucket width by construction (pinned in tests "
        "against exact percentiles).",
)
def q_value_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import histogram_build, histogram_quantiles

    ev = load_table(spark, sf_dir, "events")
    return histogram_quantiles(histogram_build(ev, "value"))


@_register(
    "streaming_value_histogram_quantiles",
    QUERIES["value_histogram_quantiles"].oracle,
    tags=("m5", "streaming", "aggregate", "approx", "sketch"),
    doc="Streaming twin of value_histogram_quantiles, SAME oracle: the "
        "bucket counts accumulate as update-mode streaming aggregation "
        "state (integer sums — associative, so micro-batch boundaries "
        "cannot move a cell) and the interpolation folds the drained "
        "histogram in batch — completing the streaming-sketch trio "
        "(count-min / HLL / histogram), each a bounded-state summary "
        "an unbounded stream can maintain forever.",
)
def q_streaming_value_histogram_quantiles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.sketch import histogram_build, histogram_quantiles
    from ..streaming.pipeline import drain_to_df, stream_table

    hist = drain_to_df(
        histogram_build(stream_table(spark, sf_dir, "events"), "value"),
        "update",
        key_cols=("bucket",),
    )
    return histogram_quantiles(hist)


@_register(
    "streaming_cms_user_frequencies",
    _cms_oracle(),
    tags=("m5", "streaming", "aggregate", "approx", "sketch"),
    doc="Streaming twin of cms_user_frequencies, SAME oracle: the 4x256 "
        "sketch grid accumulates as update-mode streaming aggregation "
        "state — integer cells are associative, so micro-batch "
        "boundaries cannot change the drained grid — and point "
        "estimates run in batch against it.  THE bounded-state "
        "frequency summary for unbounded streams: O(d*w) state "
        "regardless of key cardinality, where exact per-key streaming "
        "counters grow without bound.",
)
def q_streaming_cms_user_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import cms_build, cms_estimate
    from ..streaming.pipeline import drain_to_df, stream_table

    sketch = drain_to_df(
        cms_build(stream_table(spark, sf_dir, "events"), "user_id"),
        "update",
        key_cols=("depth", "bucket"),
    )
    ev = load_table(spark, sf_dir, "events")
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact_count"))
    est = cms_estimate(sketch, exact.select("user_id"), "user_id")
    return exact.join(est, "user_id").select(
        "user_id",
        "exact_count",
        F.col("est").alias("est_count"),
        (F.col("est") - F.col("exact_count")).cast("long").alias("overestimate"),
    )


_IWS_H = "md5('iwsamp:' || CAST(doc_id AS VARCHAR))"


@_register(
    "importance_weighted_sample",
    f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE ({_hexval(_IWS_H, 1)} * 4096 + {_hexval(_IWS_H, 2)} * 256
         + {_hexval(_IWS_H, 3)} * 16 + {_hexval(_IWS_H, 4)}) < n_chars * 16
    """,
    tags=("m5", "sampling"),
    doc="Importance-weighted Bernoulli sampling: inclusion probability "
        "proportional to an integer weight (p = 16 * n_chars / 65536, "
        "longer docs oversampled — the curation move that reweights a "
        "mixture without materializing it), decided by a pure per-row "
        "integer test on md5 digits.  Like the other samplers: no "
        "rand(), no global sort, partition-layout-independent, and "
        "incrementally stable — the same doc is in or out forever, so "
        "re-runs over a grown corpus only add rows.  Weights >= 4096 "
        "chars saturate at p = 1 (documented cap).",
)
def q_importance_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("iwsamp:"), F.col("doc_id").cast("string"))), 1, 4
        ),
        16,
        10,
    ).cast("long")
    return docs.filter(bucket < F.col("n_chars") * 16).select(
        "doc_id", "source", "n_chars"
    )


@_register(
    "streaming_hll_distinct_users",
    _hll_oracle(),
    tags=("m5", "streaming", "aggregate", "approx", "sketch"),
    doc="Streaming twin of hll_distinct_users, SAME oracle: registers "
        "accumulate as update-mode MAX aggregation state — MAX is "
        "idempotent AND associative, so neither micro-batch boundaries "
        "nor at-least-once replays can move a register (the property "
        "that makes HLL the standard streaming-distinct sketch) — and "
        "the estimate folds the drained register table in batch.",
)
def q_streaming_hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sketch import hll_estimate, hll_registers
    from ..streaming.pipeline import drain_to_df, stream_table

    regs = drain_to_df(
        hll_registers(stream_table(spark, sf_dir, "events"), "user_id"),
        "update",
        key_cols=("bucket",),
    )
    ev = load_table(spark, sf_dir, "events")
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact_users"))
    return hll_estimate(regs).crossJoin(exact)


@_register(
    "salted_product_stats",
    QUERIES["per_product_stats"].oracle,
    tags=("parity", "aggregate", "skew"),
    doc="A1 under key skew: two-stage salted aggregation (hot key spread "
        "over 16 salt buckets, exact decimal merge) — must be "
        "bit-identical to the unsalted plan, hence shares its oracle.",
)
def q_salted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.aggregate import salted_product_price_stats

    return salted_product_price_stats(
        load_table(spark, sf_dir, "events"), key="event_type", value="value"
    )


# ---------------------------------------------------------------------------
# IVF probe search, range join, distribution ranks, explicit GROUPING SETS.
# ---------------------------------------------------------------------------

_IVF_PROBE_ORACLE = """
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, embedding AS ce, norm AS cn FROM n WHERE vec_id < 8),
    assign AS (
      SELECT vec_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                 list_sum(list_transform(range(1, len(v.embedding) + 1),
                        i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))
                   / (v.norm * c.cn) DESC, c.centroid_id) AS rn
        FROM n v, c) WHERE rn = 1),
    qprobe AS (
      SELECT vec_id AS query_id, centroid_id FROM (
        SELECT v.vec_id, c.centroid_id,
               ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
                 list_sum(list_transform(range(1, len(v.embedding) + 1),
                        i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))
                   / (v.norm * c.cn) DESC, c.centroid_id) AS rn
        FROM n v, c WHERE v.vec_id < 5) WHERE rn <= 2),
    cand AS (
      SELECT q.query_id, a.vec_id AS neighbor_id
      FROM qprobe q JOIN assign a ON a.centroid_id = q.centroid_id
      WHERE a.vec_id != q.query_id),
    scored AS (
      SELECT cand.query_id, cand.neighbor_id,
             list_sum(list_transform(range(1, len(qv.embedding) + 1),
                    i -> CAST(qv.embedding[i] AS DOUBLE) * CAST(nv.embedding[i] AS DOUBLE)))
               / (qv.norm * nv.norm) AS cosine
      FROM cand
        JOIN n qv ON qv.vec_id = cand.query_id
        JOIN n nv ON nv.vec_id = cand.neighbor_id)
    SELECT query_id, neighbor_id, cosine,
           CAST(rnk AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                 ORDER BY cosine DESC, neighbor_id) AS rnk FROM scored)
    WHERE rnk <= 5
"""


@_register(
    "ivf_probe_search",
    _IVF_PROBE_ORACLE,
    tags=("m5", "similarity"),
    doc="IVF ANN search, probe side: queries (vec_id<5) probe their 2 "
        "nearest of 8 centroid cells and rank only vectors assigned "
        "there — the partition-pruned scale path whose recall/latency "
        "tradeoff brute-force `embedding_topk` baselines.",
)
def q_ivf_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.similarity import DOT, ivf_assign, with_norm

    emb = load_table(spark, sf_dir, "embeddings")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assign = ivf_assign(emb, cents)

    cn = with_norm(cents, "embedding").select(
        "centroid_id", F.col("embedding").alias("ce"), F.col("norm").alias("cnorm")
    )
    qn = with_norm(emb.filter(F.col("vec_id") < 5), "embedding").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), F.col("norm").alias("qnorm")
    )
    qscore = qn.crossJoin(F.broadcast(cn)).select(
        "query_id", "centroid_id",
        (F.expr(DOT.format(a="qe", b="ce")) / (F.col("qnorm") * F.col("cnorm"))).alias("sim"),
    )
    wq = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("centroid_id"))
    qprobe = (
        qscore.withColumn("rn", F.row_number().over(wq))
        .filter(F.col("rn") <= 2)
        .select("query_id", "centroid_id")
    )
    cand = (
        qprobe.join(assign, "centroid_id")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    v = with_norm(emb, "embedding")
    qv = v.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe"), F.col("norm").alias("qn"))
    nv = v.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("ne"), F.col("norm").alias("nn"))
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(nv, "neighbor_id")
        .select(
            "query_id", "neighbor_id",
            (F.expr(DOT.format(a="qe", b="ne")) / (F.col("qn") * F.col("nn"))).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
    )


@_register(
    "ivf_recall_at_k",
    """
    WITH brute AS ({brute}),
         probe AS ({probe})
    SELECT b.query_id,
           CAST(COUNT(p.neighbor_id) AS DOUBLE) / 5.0 AS recall_at_5
    FROM brute b
    LEFT JOIN probe p
      ON p.query_id = b.query_id AND p.neighbor_id = b.neighbor_id
    GROUP BY b.query_id
    """,
    tags=("m5", "similarity", "metric"),
    doc="ANN quality metric: per-query recall@5 of the partition-pruned "
        "IVF probe (`ivf_probe_search`) against the brute-force "
        "baseline (`embedding_topk`) — quantifies the recall/latency "
        "tradeoff both queries exist to demonstrate.",
)
def q_ivf_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    brute = QUERIES["embedding_topk"].fn(spark, sf_dir).select("query_id", "neighbor_id")
    probe = QUERIES["ivf_probe_search"].fn(spark, sf_dir).select(
        F.col("query_id").alias("pq"), F.col("neighbor_id").alias("pn")
    )
    joined = brute.join(
        probe,
        (F.col("query_id") == F.col("pq")) & (F.col("neighbor_id") == F.col("pn")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        (F.count("pn").cast("double") / F.lit(5.0)).alias("recall_at_5")
    )


# Patch the composed oracle now that both constituent oracles exist as
# strings (brace-format deferral keeps the SQL readable above).
QUERIES["ivf_recall_at_k"].oracle = QUERIES["ivf_recall_at_k"].oracle.format(
    brute=QUERIES["embedding_topk"].oracle, probe=_IVF_PROBE_ORACLE
)


@_register(
    "streaming_watermarked_windows",
    """
    WITH mx AS (SELECT max(ts) AS m FROM events),
         late AS (SELECT event_id FROM events ORDER BY ts, event_id LIMIT 1)
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events, mx
    WHERE event_id != (SELECT event_id FROM late)
      AND date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 17 MINUTE
    GROUP BY 1
    """,
    tags=("parity", "streaming", "watermark"),
    doc="T4: append-mode watermarked tumbling windows over two "
        "controlled micro-batch rounds; the seeded late row (globally "
        "earliest event, delivered in round 2) lands behind the "
        "watermark and is dropped — the oracle is the batch form over "
        "all finalized windows excluding that row.",
)
def q_streaming_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import run_watermarked_window_stream

    return run_watermarked_window_stream(spark, sf_dir)


@_register(
    "clicks_before_purchase",
    """
    SELECT p.event_id, p.user_id, COUNT(c.event_id) AS n_clicks_prior_hour
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    GROUP BY p.event_id, p.user_id
    """,
    tags=("olap", "join", "range"),
    doc="Range (interval) join: clicks within the hour before each "
        "purchase — equi-join on the user key with the range as a "
        "residual predicate; the streaming twin is a watermarked "
        "interval join.",
)
def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id"), F.col("user_id"), F.col("ts").alias("p_ts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"),
        F.col("event_id").alias("c_event"),
    )
    joined = p.join(
        c,
        (F.col("c_user") == F.col("user_id"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("c_event").alias("n_clicks_prior_hour")
    )


@_register(
    "value_distribution_ranks",
    """
    SELECT event_id, event_type,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    """,
    tags=("olap", "window"),
    doc="Distribution window functions: percent_rank / cume_dist / "
        "ntile quartiles per key.",
)
def q_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.asc("value"), F.asc("event_id"))
    return ev.select(
        "event_id", "event_type",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
    )


_GROUPING_SETS_SQL = """
    SELECT o_orderpriority, o_orderstatus,
           CAST(GROUPING(o_orderpriority) AS INTEGER) AS g_priority,
           CAST(GROUPING(o_orderstatus) AS INTEGER) AS g_status,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus), (o_orderpriority), ())
"""


@_register(
    "explicit_grouping_sets",
    _GROUPING_SETS_SQL,
    tags=("olap", "aggregate", "grouping-sets"),
    doc="Explicit GROUPING SETS with GROUPING() indicators — identical "
        "SQL text on both engines.",
)
def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..sources.tables import register_views as _rv

    _rv(spark, sf_dir, tables=("orders",))
    return spark.sql(_GROUPING_SETS_SQL)


# ---------------------------------------------------------------------------
# Composite pipelines: corpus curation (quality -> dedup -> stats),
# user funnel, TPC-H Q3-style shipping priority.
# ---------------------------------------------------------------------------

@_register(
    "curated_corpus_stats",
    f"""
    WITH t AS (SELECT doc_id, lang, n_chars, string_split(text, ' ') AS toks,
                      md5(text) AS content_hash
               FROM documents),
    scored AS (
      SELECT doc_id, lang, n_chars, content_hash,
             0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
               + 0.5 * (1.0 - CAST(len(list_filter(toks, x -> list_contains([{_STOP_ARR}], x))) AS DOUBLE)
                              / CAST(len(toks) AS DOUBLE)) AS quality
      FROM t),
    kept AS (SELECT * FROM scored WHERE quality >= 0.7),
    dedup AS (
      SELECT * FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) AS rn
        FROM kept) WHERE rn = 1)
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars,
           ROUND(CAST(SUM(quality) AS DOUBLE) / COUNT(*), 6) AS avg_quality
    FROM dedup GROUP BY lang
    """,
    tags=("m5", "pipeline"),
    doc="The M5 operators composed as one curation plan: quality-score "
        "filter -> exact dedup (keep smallest id) -> per-language corpus "
        "stats.  One declarative plan; Catalyst pipelines the stages.",
)
def q_curated_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    scored = quality_score(docs).select("doc_id", "quality")
    enriched = docs.join(scored, "doc_id").withColumn("content_hash", F.md5("text"))
    kept = enriched.filter(F.col("quality") >= 0.7)
    w = Window.partitionBy("content_hash").orderBy("doc_id")
    dedup = kept.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") == 1)
    # quality sums are exact rationals but not 2dp — average via rounded
    # double-of-identical-operands (sum of identical doubles in any
    # order can differ; group sizes here are small, so sum order must be
    # pinned: aggregate quality*1e12 as decimal for exactness)
    qdec = (F.col("quality") * F.lit(1e12)).cast("decimal(38,0)")
    return dedup.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.round(
            (F.sum(qdec).cast("double") / F.lit(1e12)) / F.count("*"), 6
        ).alias("avg_quality"),
    )


@_register(
    "user_funnel",
    """
    WITH stages AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             MIN(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT COUNT(*) AS n_users,
           COUNT(t_signup) AS signed_up,
           COUNT(CASE WHEN t_click > t_signup THEN 1 END) AS clicked_after_signup,
           COUNT(CASE WHEN t_purchase > t_click AND t_click > t_signup THEN 1 END)
             AS purchased_after_click
    FROM stages
    """,
    tags=("olap", "pipeline"),
    doc="Funnel analytics: first-touch per stage via conditional MIN, "
        "ordered-stage conversion counts — one aggregation, no joins.",
)
def q_user_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    stage = lambda t: F.min(F.when(F.col("event_type") == t, F.col("ts")))  # noqa: E731
    stages = ev.groupBy("user_id").agg(
        stage("signup").alias("t_signup"),
        stage("click").alias("t_click"),
        stage("purchase").alias("t_purchase"),
    )
    return stages.agg(
        F.count("*").alias("n_users"),
        F.count("t_signup").alias("signed_up"),
        F.count(F.when(F.col("t_click") > F.col("t_signup"), 1)).alias("clicked_after_signup"),
        F.count(
            F.when((F.col("t_purchase") > F.col("t_click")) & (F.col("t_click") > F.col("t_signup")), 1)
        ).alias("purchased_after_click"),
    )


@_register(
    "shipping_priority",
    """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,2))
                * CAST(1 - l.l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE)
             AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
      JOIN orders o ON c.c_custkey = o.o_custkey
      JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l.l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    tags=("olap", "join", "topk"),
    doc="TPC-H Q3-style shipping priority: segment-filtered 3-way join, "
        "grouped decimal revenue, global top-10 "
        "(TakeOrderedAndProject).",
)
def q_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp_ntz")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1995-03-15 00:00:00").cast("timestamp_ntz")
    )
    disc = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * (1 - F.col("l_discount")).cast("decimal(18,2)")
    ).cast("decimal(18,4)")
    joined = li.join(o, li.l_orderkey == o.o_orderkey).join(
        F.broadcast(c), o.o_custkey == c.c_custkey
    )
    agg = joined.groupBy("l_orderkey", "o_orderdate", "o_orderpriority").agg(
        F.sum(disc).cast("double").alias("revenue")
    ).select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
    return agg.orderBy(F.desc("revenue"), F.asc("l_orderkey")).limit(10)


@_register(
    "multimodal_decoded_features",
    f"""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
           md5(text) AS content_hash,
           CAST({_hexval('md5(text)', 1)} * 16 + {_hexval('md5(text)', 2)} + 1 AS INTEGER) AS width,
           CAST({_hexval('md5(text)', 3)} * 16 + {_hexval('md5(text)', 4)} + 1 AS INTEGER) AS height,
           CAST({_hexval('md5(text)', 5)} % 3 + 1 AS INTEGER) AS n_channels
    FROM documents
    """,
    tags=("m5", "multimodal", "udf"),
    doc="The Arrow-batched decode path (mapInPandas over binary "
        "payloads) hash-checked end-to-end: the stub's md5-derived "
        "features are reproduced by the oracle via hex-digit lookup — "
        "proving the JVM->Python->JVM boundary is deterministic and "
        "schema-correct, not just runnable.",
)
def q_multimodal_decoded(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.multimodal import binarize_text, decode_features

    docs = load_table(spark, sf_dir, "documents")
    return decode_features(binarize_text(docs))


@_register(
    "corrupt_json_handling",
    """
    SELECT is_valid, COUNT(*) AS n
    FROM (SELECT json_valid(CASE WHEN event_id % 10 = 0
                                 THEN 'garbage{' || props
                                 ELSE props END) AS is_valid
          FROM events)
    GROUP BY is_valid
    """,
    tags=("parity", "filter", "json"),
    doc="P6 corrupt-payload filtering (dead_letter_queue_consumer.py:"
        "125-128): 10% of payloads mangled in-flight; permissive "
        "from_json yields NULL for them, counted against the oracle's "
        "json_valid.",
)
def q_corrupt_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import types as T

    ev = load_table(spark, sf_dir, "events")
    mangled = F.when(
        F.col("event_id") % 10 == 0, F.concat(F.lit("garbage{"), F.col("props"))
    ).otherwise(F.col("props"))
    schema = T.StructType(
        [T.StructField("k", T.LongType()), T.StructField("_corrupt", T.StringType())]
    )
    parsed = F.from_json(
        mangled, schema, {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"}
    )
    return (
        ev.select(parsed["_corrupt"].isNull().alias("is_valid"))
        .groupBy("is_valid")
        .agg(F.count("*").alias("n"))
    )


@_register(
    "value_bounds",
    """
    SELECT event_id,
           least(value, 100.0) AS capped_value,
           greatest(value, 1.0) AS floored_value
    FROM events
    """,
    tags=("parity", "function"),
    doc="F11 pairwise min/max (price_aggregator.py:45-46) as "
        "least/greatest column expressions.",
)
def q_value_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.least(F.col("value"), F.lit(100.0)).alias("capped_value"),
        F.greatest(F.col("value"), F.lit(1.0)).alias("floored_value"),
    )


_QPC_ORACLE = """
    WITH xy AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS y
      FROM lineitem),
    mo AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
      FROM xy GROUP BY l_returnflag),
    d AS (
      SELECT l_returnflag, n, sx, sy,
             CAST(n AS DECIMAL(10,0)) * CAST(sxy AS DECIMAL(28,0))
               - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS num,
             CAST(n AS DECIMAL(10,0)) * CAST(sxx AS DECIMAL(28,0))
               - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS vx,
             CAST(n AS DECIMAL(10,0)) * CAST(syy AS DECIMAL(28,0))
               - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS vy
      FROM mo)
    SELECT l_returnflag,
           n AS n_items,
           sx AS sum_qty,
           sy AS sum_price_cents,
           CASE WHEN vx = 0 OR vy = 0 THEN NULL
                ELSE CAST(num AS DOUBLE)
                     / sqrt(CAST(vx AS DOUBLE) * CAST(vy AS DOUBLE)) END
             AS corr_qty_price
    FROM d
    """


def _qpc_moments(li: DataFrame) -> DataFrame:
    """The five exact integer moments per return flag (see
    quantity_price_correlation's doc): associative sums only, so the
    same aggregation runs identically as a batch groupBy or as
    update-mode streaming aggregation state."""
    x = F.col("l_quantity").cast("long")
    y = (F.col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
    return (
        li.select("l_returnflag", x.alias("x"), y.alias("y"))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum((F.col("y") * F.col("y")).cast("decimal(38,0)")).alias("syy"),
        )
    )


def _qpc_assemble(mo: DataFrame) -> DataFrame:
    """Pearson r from the exact moments in one fixed expression
    (correctly-rounded casts / sqrt / division — bit-identical across
    engines).  Zero-variance groups yield NULL (the SQL corr()
    convention, and the only TOTAL cross-engine contract: Spark's
    double 0/0 is IEEE NaN while DuckDB's is NULL — found by the
    generative fuzz, tests/test_oracle_fuzz.py)."""
    dn = F.col("n").cast("decimal(10,0)")
    num = dn * F.col("sxy").cast("decimal(28,0)") - F.col("sx").cast(
        "decimal(19,0)"
    ) * F.col("sy").cast("decimal(19,0)")
    varx = dn * F.col("sxx").cast("decimal(28,0)") - F.col("sx").cast(
        "decimal(19,0)"
    ) * F.col("sx").cast("decimal(19,0)")
    vary = dn * F.col("syy").cast("decimal(28,0)") - F.col("sy").cast(
        "decimal(19,0)"
    ) * F.col("sy").cast("decimal(19,0)")
    return mo.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_items"),
        F.col("sx").alias("sum_qty"),
        F.col("sy").alias("sum_price_cents"),
        F.when(
            (varx != 0) & (vary != 0),
            num.cast("double")
            / F.sqrt(varx.cast("double") * vary.cast("double")),
        ).alias("corr_qty_price"),
    )


@_register(
    "quantity_price_correlation",
    _QPC_ORACLE,
    tags=("olap", "aggregate", "statistics"),
    doc="Exact-moment Pearson correlation (quantity vs price per "
        "return flag) — the engine's column-statistics shape: Spark's "
        "corr() is a float running aggregate whose result depends on "
        "partial-aggregation order, so instead the five moments are "
        "accumulated as EXACT integers (quantity, price-cents, their "
        "squares and cross product; the y^2 sum in DECIMAL(38,0) — "
        "cents^2 overflows a BIGINT at ~9e18) and r = (n*Sxy - Sx*Sy) "
        "/ sqrt((n*Sxx - Sx^2)(n*Syy - Sy^2)) is assembled from them "
        "in one fixed expression: integer->double casts and sqrt are "
        "IEEE correctly-rounded, so the double is bit-identical "
        "across engines — the same associativity argument as the "
        "fixed-point PageRank, applied to second-order statistics.  "
        "Shape: one map-side-combinable keyed aggregate over the "
        "scan, integer partials only, O(groups) state.",
)
def q_quantity_price_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _qpc_assemble(_qpc_moments(load_table(spark, sf_dir, "lineitem")))


@_register(
    "streaming_quantity_price_correlation",
    _QPC_ORACLE,
    tags=("m5", "streaming", "aggregate", "statistics"),
    doc="Streaming twin of quantity_price_correlation, SAME oracle: "
        "the five exact integer moments accumulate as update-mode "
        "streaming aggregation state (associative sums — micro-batch "
        "boundaries provably cannot move them, the same argument as "
        "the sketch twins), and Pearson r assembles in batch over the "
        "drained O(groups) moment table.  Second-order statistics an "
        "unbounded stream can maintain forever in bounded state — "
        "where a float running corr would both grow nothing and "
        "drift with batch boundaries.",
)
def q_streaming_quantity_price_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..streaming.pipeline import drain_to_df, stream_table

    mo = drain_to_df(
        _qpc_moments(stream_table(spark, sf_dir, "lineitem")),
        "update",
        key_cols=("l_returnflag",),
    )
    return _qpc_assemble(mo)


#: Shared daily-revenue rollup: the SQL CTE and the DataFrame helper
#: below MUST stay in lockstep — three time-series queries (trend,
#: gap-fill, anomaly) build on this exact (day, rev_cents) contract.
_DAILY_CTE = """daily AS (
      SELECT CAST(floor(epoch(o_orderdate) / 86400) AS BIGINT) AS day,
             CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS rev_cents
      FROM orders GROUP BY 1)"""


def _daily_cents(orders: DataFrame) -> DataFrame:
    """(day, rev_cents): epoch-day index and exact integer revenue
    cents per day — the DataFrame twin of ``_DAILY_CTE``."""
    return (
        orders.select(
            F.floor(
                F.unix_timestamp(F.col("o_orderdate").cast("timestamp"))
                / F.lit(86400)
            )
            .cast("long")
            .alias("day"),
            (F.col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")
            .alias("cents"),
        )
        .groupBy("day")
        .agg(F.sum("cents").cast("long").alias("rev_cents"))
    )


@_register(
    "daily_revenue_trend",
    f"""
    WITH {_DAILY_CTE},
    mo AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(day) AS BIGINT) AS sx,
             CAST(SUM(rev_cents) AS BIGINT) AS sy,
             SUM(CAST(day * day AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(day * rev_cents AS DECIMAL(38,0))) AS sxy
      FROM daily),
    fit AS (
      SELECT n, sx, sy,
             CAST(n AS DECIMAL(10,0)) * CAST(sxy AS DECIMAL(28,0))
               - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS num,
             CAST(n AS DECIMAL(10,0)) * CAST(sxx AS DECIMAL(28,0))
               - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS den
      FROM mo),
    sl AS (
      SELECT n, sx, sy,
             CASE WHEN den = 0 THEN NULL
                  ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS slope
      FROM fit)
    SELECT CAST(n AS BIGINT) AS n_days,
           slope AS slope_cents_per_day,
           CASE WHEN slope IS NULL THEN NULL
                ELSE (CAST(sy AS DOUBLE) - slope * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE) END AS intercept_cents
    FROM sl
    """,
    tags=("olap", "aggregate", "statistics"),
    doc="Ordinary-least-squares trend of daily revenue — the forecast "
        "primitive behind 'is revenue growing and how fast': slope = "
        "(n*Sxy - Sx*Sy) / (n*Sxx - Sx^2) over (epoch-day, daily "
        "revenue-cents) points, every moment an EXACT integer "
        "(day*cents sums in DECIMAL(38,0) — they clear a BIGINT at "
        "scale) so the fitted line is bit-identical across engines "
        "and partitionings, same contract as "
        "quantity_price_correlation.  Shape: daily rollup (one keyed "
        "integer aggregate) then a 1-row moment combine — two "
        "map-side-combinable aggregations, no window, no sort.",
)
def q_daily_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily_cents(load_table(spark, sf_dir, "orders"))
    mo = daily.agg(
        F.count("*").alias("n"),
        F.sum("day").cast("long").alias("sx"),
        F.sum("rev_cents").cast("long").alias("sy"),
        F.sum((F.col("day") * F.col("day")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("day") * F.col("rev_cents")).cast("decimal(38,0)")).alias(
            "sxy"
        ),
    )
    dn = F.col("n").cast("decimal(10,0)")
    num = dn * F.col("sxy").cast("decimal(28,0)") - F.col("sx").cast(
        "decimal(19,0)"
    ) * F.col("sy").cast("decimal(19,0)")
    den = dn * F.col("sxx").cast("decimal(28,0)") - F.col("sx").cast(
        "decimal(19,0)"
    ) * F.col("sx").cast("decimal(19,0)")
    # A single-day rollup has den = 0: the fit is undefined, so the
    # contract is NULL (Spark's double 0/0 is NaN, DuckDB's NULL —
    # the totalized CASE keeps the engines agreeing; see _qpc_assemble).
    fit = mo.select(
        "n",
        "sx",
        "sy",
        F.when(den != 0, num.cast("double") / den.cast("double")).alias("slope"),
    )
    return fit.select(
        F.col("n").cast("long").alias("n_days"),
        F.col("slope").alias("slope_cents_per_day"),
        F.when(
            F.col("slope").isNotNull(),
            (
                F.col("sy").cast("double")
                - F.col("slope") * F.col("sx").cast("double")
            )
            / F.col("n").cast("double"),
        ).alias("intercept_cents"),
    )


@_register(
    "daily_revenue_filled",
    f"""
    WITH {_DAILY_CTE},
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    spine AS (
      SELECT UNNEST(range(lo, hi + 1)) AS day FROM bounds),
    joined AS (
      SELECT s.day, d.rev_cents,
             COUNT(d.rev_cents) OVER (ORDER BY s.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
      FROM spine s LEFT JOIN daily d ON d.day = s.day)
    SELECT day,
           CAST(MAX(rev_cents) OVER (PARTITION BY grp) AS BIGINT)
             AS rev_cents_filled,
           rev_cents IS NULL AS was_missing
    FROM joined
    """,
    tags=("olap", "window", "timeseries"),
    doc="Date-spine gap filling with last-observation-carried-forward "
        "— the resample step every revenue/metric time series needs "
        "before trend or anomaly work (a day with no orders must "
        "appear as a row, not silently vanish): a dense day spine "
        "from sequence+explode, left join of the daily rollup, and "
        "LOCF via the portable count-over/max-partition idiom (a "
        "running COUNT of non-null observations names the fill group; "
        "MAX over that group is the carried value — no IGNORE NULLS "
        "dependence, identical semantics in both engines).  The "
        "ordered window runs over the DAILY ROLLUP — O(calendar "
        "days) rows bounded by the date span, never by fact volume — "
        "so the single-partition sort is a few thousand rows at ANY "
        "corpus scale; the fact-sized work is the one keyed rollup "
        "aggregate before it.",
)
def q_daily_revenue_filled(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    daily = _daily_cents(load_table(spark, sf_dir, "orders"))
    spine = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"))
    w_run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    joined = spine.join(daily, "day", "left").withColumn(
        "grp", F.count("rev_cents").over(w_run)
    )
    return joined.select(
        "day",
        F.max("rev_cents").over(Window.partitionBy("grp")).alias(
            "rev_cents_filled"
        ),
        F.col("rev_cents").isNull().alias("was_missing"),
    )


def _anomaly_assemble(daily: DataFrame) -> DataFrame:
    """The zero-float anomaly flags from a (day, rev_cents) table —
    shared by the batch and streaming registrations so the two forms
    cannot drift (see revenue_anomaly_days' doc for the algebra)."""
    mo = daily.agg(
        F.count("*").alias("n"),
        F.sum("rev_cents").cast("long").alias("sy"),
        F.sum(
            (F.col("rev_cents") * F.col("rev_cents")).cast("decimal(38,0)")
        ).alias("syy"),
    )
    dev = (
        F.col("n").cast("decimal(10,0)") * F.col("rev_cents").cast("decimal(19,0)")
        - F.col("sy").cast("decimal(28,0)")
    ).cast("decimal(19,0)")
    var4 = 4 * (
        F.col("n").cast("decimal(10,0)") * F.col("syy").cast("decimal(28,0)")
        - F.col("sy").cast("decimal(19,0)") * F.col("sy").cast("decimal(19,0)")
    )
    return daily.crossJoin(F.broadcast(mo)).select(
        "day",
        "rev_cents",
        ((dev * dev) > var4).alias("is_anomaly"),
    )


@_register(
    "revenue_anomaly_days",
    f"""
    WITH {_DAILY_CTE},
    mo AS (
      SELECT COUNT(*) AS n,
             CAST(SUM(rev_cents) AS BIGINT) AS sy,
             SUM(CAST(rev_cents * rev_cents AS DECIMAL(38,0))) AS syy
      FROM daily)
    SELECT d.day, d.rev_cents,
           (CAST(CAST(mo.n AS DECIMAL(10,0)) * CAST(d.rev_cents AS DECIMAL(19,0))
                 - CAST(mo.sy AS DECIMAL(28,0)) AS DECIMAL(19,0))
            * CAST(CAST(mo.n AS DECIMAL(10,0)) * CAST(d.rev_cents AS DECIMAL(19,0))
                 - CAST(mo.sy AS DECIMAL(28,0)) AS DECIMAL(19,0)))
           > 4 * (CAST(mo.n AS DECIMAL(10,0)) * CAST(mo.syy AS DECIMAL(28,0))
                  - CAST(mo.sy AS DECIMAL(19,0)) * CAST(mo.sy AS DECIMAL(19,0)))
             AS is_anomaly
    FROM daily d CROSS JOIN mo
    """,
    tags=("olap", "aggregate", "statistics", "timeseries"),
    doc="Z-score outlier days WITHOUT A SINGLE FLOAT: |x - mean| > "
        "2*sigma rearranged to the pure-integer inequality "
        "(n*x - Sy)^2 > 4*(n*Syy - Sy^2) — both sides exact "
        "DECIMAL(38,0) quantities from the daily-revenue moments, so "
        "the anomaly set is EXACT: no engine, partitioning, or "
        "rounding can flip a flag on the boundary (a float z-score "
        "pipeline can and does).  Shape: one keyed rollup, a 1-row "
        "moment aggregate broadcast back over the O(days) table — "
        "the same two map-side-combinable aggregations as the trend "
        "query, plus a constant-width decimal comparison per row.",
)
def q_revenue_anomaly_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _anomaly_assemble(_daily_cents(load_table(spark, sf_dir, "orders")))


@_register(
    "streaming_revenue_anomaly",
    QUERIES["revenue_anomaly_days"].oracle,
    tags=("m5", "streaming", "aggregate", "statistics", "timeseries"),
    doc="Streaming twin of revenue_anomaly_days, SAME oracle: the "
        "daily revenue rollup accumulates as update-mode streaming "
        "aggregation state (keyed integer sums — associative, so "
        "micro-batch boundaries cannot move a day's total), and the "
        "zero-float anomaly inequality folds the drained O(days) "
        "table in batch.  Bounded-state outlier detection an "
        "unbounded order stream maintains forever — and because the "
        "flags are exact integer comparisons, a replayed epoch "
        "provably cannot flip one.",
)
def q_streaming_revenue_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import drain_to_df, stream_table

    daily = drain_to_df(
        _daily_cents(stream_table(spark, sf_dir, "orders")),
        "update",
        key_cols=("day",),
    )
    return _anomaly_assemble(daily)


@_register(
    "event_type_daily_trend",
    """
    WITH daily AS (
      SELECT event_type,
             CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
             COUNT(*) AS cnt
      FROM events GROUP BY 1, 2),
    mo AS (
      SELECT event_type, COUNT(*) AS n,
             CAST(SUM(day) AS BIGINT) AS sx,
             CAST(SUM(cnt) AS BIGINT) AS sy,
             SUM(CAST(day * day AS DECIMAL(38,0))) AS sxx,
             SUM(CAST(day * cnt AS DECIMAL(38,0))) AS sxy
      FROM daily GROUP BY event_type),
    fit AS (
      SELECT event_type, n, sy,
             CAST(n AS DECIMAL(10,0)) * CAST(sxy AS DECIMAL(28,0))
               - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) AS num,
             CAST(n AS DECIMAL(10,0)) * CAST(sxx AS DECIMAL(28,0))
               - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) AS den
      FROM mo)
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           sy AS total_events,
           CASE WHEN den = 0 THEN NULL
                ELSE CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END
             AS slope_events_per_day
    FROM fit
    """,
    tags=("m5", "aggregate", "statistics", "timeseries"),
    doc="GROUPED least-squares trend — per-segment growth monitoring "
        "(is each event type's daily volume rising or falling, and "
        "how fast): the same exact-moment OLS as daily_revenue_trend "
        "but keyed by event_type, showing the per-key statistics "
        "shape at scale — ONE keyed rollup plus ONE keyed moment "
        "aggregate (both map-side-combinable, O(segments x days) and "
        "O(segments) state), no window, no per-segment scan.  "
        "Zero-variance segments (a single active day) yield NULL "
        "slope — the totalized cross-engine contract.",
)
def q_event_type_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.select(
            "event_type",
            F.floor(
                F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(86400)
            )
            .cast("long")
            .alias("day"),
        )
        .groupBy("event_type", "day")
        .agg(F.count("*").alias("cnt"))
    )
    mo = daily.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum("day").cast("long").alias("sx"),
        F.sum("cnt").cast("long").alias("sy"),
        F.sum((F.col("day") * F.col("day")).cast("decimal(38,0)")).alias("sxx"),
        F.sum((F.col("day") * F.col("cnt")).cast("decimal(38,0)")).alias("sxy"),
    )
    dn = F.col("n").cast("decimal(10,0)")
    num = dn * F.col("sxy").cast("decimal(28,0)") - F.col("sx").cast(
        "decimal(19,0)"
    ) * F.col("sy").cast("decimal(19,0)")
    den = dn * F.col("sxx").cast("decimal(28,0)") - F.col("sx").cast(
        "decimal(19,0)"
    ) * F.col("sx").cast("decimal(19,0)")
    return mo.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.col("sy").alias("total_events"),
        F.when(den != 0, num.cast("double") / den.cast("double")).alias(
            "slope_events_per_day"
        ),
    )


@_register(
    "forecast_revenue_change",
    """
    SELECT CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
             * CAST(l_discount AS DECIMAL(18,2)) AS DECIMAL(18,4))) AS DOUBLE) AS revenue_delta,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
    tags=("olap", "aggregate"),
    doc="TPC-H Q6 shape: pure filter + aggregate — every predicate "
        "reaches the parquet scan, zero shuffles beyond the final "
        "1-row combine.",
)
def q_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    delta = (
        F.col("l_extendedprice").cast("decimal(18,2)")
        * F.col("l_discount").cast("decimal(18,2)")
    ).cast("decimal(18,4)")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
            & (F.col("l_discount") >= 0.03) & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(F.sum(delta).cast("double").alias("revenue_delta"), F.count("*").alias("n_items"))
    )


@_register(
    "large_quantity_orders",
    """
    SELECT o.o_orderkey, o.o_orderdate,
           CAST(o.o_totalprice AS DOUBLE) AS o_totalprice,
           CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_orderdate, o.o_totalprice
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 150
    """,
    tags=("olap", "join", "having"),
    doc="TPC-H Q18 shape: fact-fact join + grouped HAVING filter on the "
        "aggregate.",
)
def q_large_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderkey", "o_orderdate", "o_totalprice")
        .agg(dec_sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 150)
        .select("o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
    )


@_register(
    "streaming_interval_join",
    """
    SELECT p.event_id AS purchase_id, p.user_id,
           c.event_id AS click_id, p.ts AS purchase_ts, c.ts AS click_ts
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts <= p.ts
    """,
    tags=("parity", "streaming", "join"),
    doc="Stream-stream interval join: two watermarked streams over the "
        "same source joined on key + time bound, drained with "
        "availableNow — inner matches emit as they arrive, so the "
        "bounded drain equals the batch range join (the oracle).",
)
def q_streaming_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import drain_to_df, stream_table

    def side(event_type: str, prefix: str):
        s = stream_table(spark, sf_dir, "events").filter(
            F.col("event_type") == event_type
        )
        return s.select(
            F.col("event_id").alias(f"{prefix}_event"),
            F.col("user_id").alias(f"{prefix}_user"),
            F.col("ts").cast("timestamp").alias(f"{prefix}_ts"),
        ).withWatermark(f"{prefix}_ts", "2 hours")

    p = side("purchase", "p")
    c = side("click", "c")
    joined = p.join(
        c,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("p_ts")),
    ).select(
        F.col("p_event").alias("purchase_id"),
        F.col("p_user").alias("user_id"),
        F.col("c_event").alias("click_id"),
        F.col("p_ts").cast("timestamp_ntz").alias("purchase_ts"),
        F.col("c_ts").cast("timestamp_ntz").alias("click_ts"),
    )
    return drain_to_df(joined, "append")


def _dedup_clusters_oracle() -> str:
    # canonical-cluster assignment over the near-dup pair graph: the
    # minhash pipeline's verified pairs (jaccard >= 0.5), closed
    # transitively with a recursive CTE, min node id per component.
    return f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_minhash_oracle()}) WHERE jaccard >= 0.5
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    )
    SELECT a AS doc_id,
           LEAST(a, MIN(b)) AS canonical_id
    FROM reach GROUP BY a
    """


@_register(
    "dedup_clusters",
    _dedup_clusters_oracle(),
    tags=("m5", "dedup", "iterative"),
    doc="Near-dup clustering: LSH candidate pairs verified at jaccard "
        ">= 0.5 become an undirected graph; iterative min-label "
        "propagation (Pregel-style connected components) assigns each "
        "doc its cluster's canonical (minimum) id.  Oracle closes the "
        "same graph with a recursive CTE.",
)
def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components

    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.near_dup_pairs(docs).filter(F.col("jaccard") >= 0.5)
    comps = connected_components(pairs, src="doc_a", dst="doc_b")
    return comps.select(F.col("node").alias("doc_id"), F.col("component").alias("canonical_id"))


@_register(
    "dedup_clusters_star",
    _dedup_clusters_oracle(),
    tags=("m5", "dedup", "iterative"),
    doc="Same cluster contract as dedup_clusters, computed with the "
        "web-scale algorithm: alternating large-star/small-star rounds "
        "(Kiveris et al.) converge in O(log n) rounds on ANY graph "
        "shape — a length-n chain needs n min-label rounds but ~log n "
        "star rounds — making it the production choice for skewed "
        "near-dup graphs.  Equivalence with min-label is also "
        "property-tested on adversarial topologies (tests/test_graph_star.py).",
)
def q_dedup_clusters_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import connected_components_star

    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.near_dup_pairs(docs).filter(F.col("jaccard") >= 0.5)
    comps = connected_components_star(pairs, src="doc_a", dst="doc_b")
    return comps.select(F.col("node").alias("doc_id"), F.col("component").alias("canonical_id"))


def _pagerank_oracle(iters: int = 3) -> str:
    # Fixed-point PageRank over the symmetrised customer<->supplier
    # trade graph; integer arithmetic only (see operators/graph.py
    # PAGERANK_SCALE), so each CTE round reproduces the Spark loop
    # bit-for-bit.  Portable floor division: a - a%b is an exact
    # multiple of b, and dividing two exact integers <= 2^53 is exact.
    from ..operators.graph import PAGERANK_SCALE

    base = (3 * PAGERANK_SCALE) // 20
    ctes = [
        """pairs AS (
      SELECT DISTINCT o.o_custkey * 2 AS c_node,
             l.l_suppkey * 2 + 1 AS s_node
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)""",
        """edges AS (
      SELECT c_node AS src, s_node AS dst FROM pairs
      UNION ALL SELECT s_node, c_node FROM pairs)""",
        """deg AS (
      SELECT src AS node, COUNT(*) AS degree FROM edges GROUP BY src)""",
        f"""r0 AS (
      SELECT node, CAST({PAGERANK_SCALE} AS BIGINT) AS rank_scaled
      FROM deg)""",
    ]
    for i in range(iters):
        ctes.append(f"""c{i} AS (
      SELECT e.dst AS node,
             CAST((r.rank_scaled - (r.rank_scaled % d.degree)) / d.degree
                  AS BIGINT) AS contrib
      FROM edges e
      JOIN r{i} r ON r.node = e.src
      JOIN deg d ON d.node = e.src)""")
        ctes.append(f"""s{i} AS (
      SELECT node, CAST(SUM(contrib) AS BIGINT) AS s
      FROM c{i} GROUP BY node)""")
        ctes.append(f"""r{i + 1} AS (
      SELECT d.node,
             CAST({base} + CAST((17 * COALESCE(s.s, 0)
                  - ((17 * COALESCE(s.s, 0)) % 20)) / 20 AS BIGINT)
                  AS BIGINT) AS rank_scaled
      FROM deg d LEFT JOIN s{i} s ON s.node = d.node)""")
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CASE WHEN r.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_kind,
           CAST((r.node - (r.node % 2)) / 2 AS BIGINT) AS entity_id,
           d.degree AS degree,
           r.rank_scaled AS rank_scaled
    FROM r{iters} r JOIN deg d ON d.node = r.node
    """
    )


@_register(
    "trade_graph_pagerank",
    _pagerank_oracle(),
    tags=("m5", "graph", "iterative"),
    doc="PageRank (damping 0.85, 3 power rounds) over the symmetrised "
        "customer<->supplier trade graph from orders x lineitem — the "
        "canonical iterative-graph workload beyond connected "
        "components.  Ranks are exact integers (2^-30 fixed point, "
        "operators/graph.py:PAGERANK_SCALE): integer sums are "
        "associative, so the result is independent of shuffle order "
        "AND bit-reproducible by the oracle's CTE rounds, where a "
        "double PageRank is neither.  Per round: one edge-list join "
        "on src (co-partitionable at scale) + one keyed sum with "
        "map-side partials; lineage cut per round.",
)
def q_trade_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst")
    ).unionByName(
        pairs.select(F.col("s_node").alias("src"), F.col("c_node").alias("dst"))
    )
    pr = pagerank(edges, iterations=3)
    return pr.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_kind"),
        F.expr("CAST((node - (node % 2)) / 2 AS BIGINT)").alias("entity_id"),
        F.col("degree"),
        F.col("rank_scaled"),
    )


def _pq_oracle(
    dim: int = 64, m: int = 4, k: int = 8, nq: int = PQ_N_QUERIES, topk: int = 10
) -> str:
    # Mirrors operators/similarity.pq_topk: every float op is either a
    # sequential per-dim fold (list_sum over list_transform — the same
    # order Spark's aggregate() folds in), an order-free 2^52-scaled
    # decimal mean, or a fixed-order pivoted add — so ADC distances are
    # bit-identical across engines.
    from ..operators import similarity as _sim

    sd = dim // m
    ms = _sim.MEAN_SCALE
    sq = (
        "list_sum(list_transform(range(1, {n}), "
        "j -> ({a}[j] - {b}[j]) * ({a}[j] - {b}[j])))"
    )

    def dist(a: str, b: str) -> str:
        return sq.format(n=sd + 1, a=a, b=b)

    piv = " + ".join(f"dd{s}" for s in range(m))
    case = ",\n             ".join(
        f"MAX(CASE WHEN sub = {s} THEN dist END) AS dd{s}" for s in range(m)
    )
    return f"""
    WITH subs AS (
      SELECT e.vec_id, s.sub,
             list_transform(
               list_slice(e.embedding, s.sub * {sd} + 1, s.sub * {sd} + {sd}),
               x -> CAST(x AS DOUBLE)) AS svec
      FROM embeddings e
      CROSS JOIN (SELECT UNNEST(range({m})) AS sub) s),
    seeds AS (
      SELECT sub, vec_id AS code, svec AS cent FROM subs WHERE vec_id < {k}),
    d0 AS (
      SELECT su.vec_id, su.sub, c.code, {dist("su.svec", "c.cent")} AS dist
      FROM subs su JOIN seeds c ON c.sub = su.sub),
    a0 AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, code) AS rn
        FROM d0) WHERE rn = 1),
    m0 AS (
      SELECT a.sub, a.code, j.dim,
             CAST(SUM(CAST(su.svec[j.dim] * {ms} AS DECIMAL(38,0))) AS DOUBLE)
               / (COUNT(*) * {ms}.0) AS mean
      FROM a0 a
      JOIN subs su ON su.vec_id = a.vec_id AND su.sub = a.sub
      CROSS JOIN (SELECT UNNEST(range(1, {sd + 1})) AS dim) j
      GROUP BY a.sub, a.code, j.dim),
    cb AS (
      SELECT sub, code, list(mean ORDER BY dim) AS cent
      FROM m0 GROUP BY sub, code),
    d1 AS (
      SELECT su.vec_id, su.sub, c.code, {dist("su.svec", "c.cent")} AS dist
      FROM subs su JOIN cb c ON c.sub = su.sub),
    codes AS (
      SELECT vec_id, sub, code FROM (
        SELECT vec_id, sub, code,
               ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                                  ORDER BY dist, code) AS rn
        FROM d1) WHERE rn = 1),
    q AS (
      SELECT vec_id AS query_id, sub, svec AS qvec
      FROM subs WHERE vec_id < {nq}),
    lut AS (
      SELECT q.query_id, q.sub, c.code, {dist("q.qvec", "c.cent")} AS dist
      FROM q JOIN cb c ON c.sub = q.sub),
    persub AS (
      SELECT co.vec_id AS neighbor_id, l.query_id, l.sub, l.dist
      FROM codes co JOIN lut l ON l.sub = co.sub AND l.code = co.code),
    piv AS (
      SELECT query_id, neighbor_id,
             {case}
      FROM persub GROUP BY query_id, neighbor_id),
    adc AS (
      SELECT query_id, neighbor_id, {piv} AS adc_dist
      FROM piv WHERE neighbor_id <> query_id)
    SELECT query_id, neighbor_id, adc_dist, CAST(rank AS INTEGER) AS rank
    FROM (
      SELECT query_id, neighbor_id, adc_dist,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY adc_dist, neighbor_id) AS rank
      FROM adc)
    WHERE rank <= {topk}
    """


@_register(
    "pq_adc_topk",
    _pq_oracle(),
    tags=("m5", "similarity", "quantization"),
    doc="Product-quantization ANN (Jégou et al. 2011): 4 sub-space "
        "codebooks of 8 codes (seeded vec_id<8, one exact Lloyd "
        "round), corpus encoded to 4 code ids per vector (64x "
        "compression), queries answered by Asymmetric Distance "
        "Computation — per-query m x k lookup tables joined against "
        "the code table, never the raw vectors.  Distances pivot to "
        "fixed sub-space order before adding, so every float is "
        "bit-reproducible by the oracle.  The memory-scale ANN "
        "complement to the IVF partition-pruning queries.",
)
def q_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import pq_topk

    return pq_topk(load_table(spark, sf_dir, "embeddings"), dim=64)


@_register(
    "pq_rerank_topk",
    """
    WITH adc AS ({adc50}),
    v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings),
    resc AS (
      SELECT a.query_id, a.neighbor_id,
             list_sum(list_transform(range(1, 65),
               j -> (q.ve[j] - n.ve[j]) * (q.ve[j] - n.ve[j]))) AS dist
      FROM adc a
      JOIN v q ON q.vec_id = a.query_id
      JOIN v n ON n.vec_id = a.neighbor_id)
    SELECT query_id, neighbor_id, dist, CAST(rnk AS INTEGER) AS rank
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                      ORDER BY dist, neighbor_id) AS rnk FROM resc)
    WHERE rnk <= 10
    """,
    tags=("m5", "similarity", "quantization"),
    doc="Two-stage ANN — the production retrieval pattern: the "
        "compressed ADC index shortlists 50 candidates per query "
        "(never touching raw vectors), then ONLY those 250 rows are "
        "exactly re-scored against the full corpus vectors and "
        "re-ranked to top-10.  Re-ranking converts shortlist "
        "membership into exact ordering, so quality becomes 'did the "
        "true neighbor make the shortlist' rather than 'did ADC "
        "rank it right' — measurably above plain ADC "
        "(suite-pinned vs pq_adc_topk's hits in tests/test_pq.py).  "
        "At 100 TB the exact stage reads O(queries x shortlist) "
        "vectors via a broadcast semi-join of the tiny candidate "
        "set — the corpus-wide scan stays compressed.",
)
def q_pq_rerank_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import _SQDIST, pq_topk
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    shortlist = pq_topk(emb, dim=64, topk=50).select("query_id", "neighbor_id")
    v = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("ve"),
    )
    cand = v.join(
        F.broadcast(shortlist), v.vec_id == F.col("neighbor_id")
    ).select("query_id", "neighbor_id", F.col("ve").alias("ne"))
    q = v.filter(F.col("vec_id") < PQ_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ve").alias("qe")
    )
    resc = cand.join(F.broadcast(q), "query_id").select(
        "query_id",
        "neighbor_id",
        F.expr(_SQDIST.format(a="qe", b="ne")).alias("dist"),
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    return (
        resc.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
    )


QUERIES["pq_rerank_topk"].oracle = QUERIES["pq_rerank_topk"].oracle.format(
    adc50=_pq_oracle(topk=50)
)


_PQ_BRUTE_L2_ORACLE = f"""
    WITH v AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS ve
      FROM embeddings)
    SELECT query_id, neighbor_id FROM (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             ROW_NUMBER() OVER (PARTITION BY q.vec_id ORDER BY
               list_sum(list_transform(range(1, 65),
                 j -> (q.ve[j] - n.ve[j]) * (q.ve[j] - n.ve[j]))),
               n.vec_id) AS rn
      FROM v q JOIN v n ON n.vec_id <> q.vec_id
      WHERE q.vec_id < {PQ_N_QUERIES}) WHERE rn <= 10
"""


@_register(
    "pq_recall_at_k",
    """
    WITH exact AS ({brute}),
         adc AS ({adc})
    SELECT e.query_id,
           CAST(COUNT(a.neighbor_id) AS DOUBLE) / 10.0 AS recall_at_10
    FROM exact e
    LEFT JOIN adc a
      ON a.query_id = e.query_id AND a.neighbor_id = e.neighbor_id
    GROUP BY e.query_id
    """,
    tags=("m5", "similarity", "quantization", "metric"),
    doc="ANN quality metric for the PQ path: per-query recall@10 of "
        "the 64x-compressed ADC search (`pq_adc_topk`) against the "
        "exact full-vector L2 top-10 — the number a PQ deployment is "
        "tuned by (m, k, and the Lloyd rounds all trade this recall "
        "against memory), completing the measured-recall story the "
        "IVF path already has (`ivf_recall_at_k`).  The exact "
        "baseline's distance fold is the same sequential per-dim "
        "fold as the PQ sub-distances, so both sides of the "
        "comparison are bit-reproducible by the oracle.",
)
def q_pq_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import _SQDIST
    from pyspark.sql import Window

    emb = load_table(spark, sf_dir, "embeddings")
    v = emb.select(
        "vec_id",
        F.expr("transform(embedding, x -> cast(x as double))").alias("ve"),
    )
    q = v.filter(F.col("vec_id") < PQ_N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("ve").alias("qe")
    )
    scored = (
        v.select(F.col("vec_id").alias("neighbor_id"), F.col("ve").alias("ne"))
        .crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.expr(_SQDIST.format(a="qe", b="ne")).alias("dist"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    exact = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 10)
        .select("query_id", "neighbor_id")
    )
    adc = QUERIES["pq_adc_topk"].fn(spark, sf_dir).select(
        F.col("query_id").alias("aq"), F.col("neighbor_id").alias("an")
    )
    joined = exact.join(
        adc,
        (F.col("query_id") == F.col("aq")) & (F.col("neighbor_id") == F.col("an")),
        "left",
    )
    return joined.groupBy("query_id").agg(
        (F.count("an").cast("double") / F.lit(10.0)).alias("recall_at_10")
    )


# Patch the composed oracle now that the ADC oracle exists as a string
# (brace-format deferral keeps the SQL readable above).
QUERIES["pq_recall_at_k"].oracle = QUERIES["pq_recall_at_k"].oracle.format(
    brute=_PQ_BRUTE_L2_ORACLE, adc=QUERIES["pq_adc_topk"].oracle
)


_TRIANGLE_ORACLE = f"""
    WITH os AS (
      SELECT DISTINCT CAST(floor(epoch(ts) / 600) AS BIGINT) AS bk,
             user_id
      FROM events),
    bs AS (
      SELECT bk, COUNT(*) AS bucket_n, MIN(user_id) AS min_id
      FROM os GROUP BY bk),
    und AS (
      SELECT DISTINCT lo, hi FROM (
        SELECT a.user_id AS lo, b.user_id AS hi
        FROM os a
        JOIN os b ON a.bk = b.bk AND a.user_id < b.user_id
        JOIN bs ON bs.bk = a.bk
               AND bs.bucket_n <= {MAX_COACTIVITY_BUCKET}
        UNION ALL
        SELECT s.min_id AS lo, o.user_id AS hi
        FROM os o JOIN bs s ON s.bk = o.bk
        WHERE s.bucket_n > {MAX_COACTIVITY_BUCKET}
          AND o.user_id <> s.min_id)),
    sym AS (SELECT lo AS n, hi AS m FROM und
            UNION ALL SELECT hi, lo FROM und),
    deg AS (SELECT n, COUNT(*) AS d FROM sym GROUP BY n),
    oriented AS (
      SELECT CASE WHEN (dl.d < dh.d) OR (dl.d = dh.d AND u.lo < u.hi)
                  THEN u.lo ELSE u.hi END AS a,
             CASE WHEN (dl.d < dh.d) OR (dl.d = dh.d AND u.lo < u.hi)
                  THEN u.hi ELSE u.lo END AS b
      FROM und u
      JOIN deg dl ON dl.n = u.lo
      JOIN deg dh ON dh.n = u.hi),
    wedges AS (
      SELECT e1.a AS u, e1.b AS v, e2.b AS w
      FROM oriented e1 JOIN oriented e2
        ON e1.a = e2.a AND e1.b < e2.b),
    closing AS (SELECT LEAST(a, b) AS v, GREATEST(a, b) AS w FROM oriented),
    tris AS (SELECT u, v, w FROM wedges JOIN closing USING (v, w)),
    per AS (
      SELECT node, COUNT(*) AS c FROM (
        SELECT u AS node FROM tris
        UNION ALL SELECT v FROM tris
        UNION ALL SELECT w FROM tris)
      GROUP BY node)
    SELECT s.n AS user_id, CAST(COALESCE(p.c, 0) AS BIGINT) AS n_triangles
    FROM (SELECT DISTINCT n FROM sym) s
    LEFT JOIN per p ON p.node = s.n
    """


def _lpa_ctes(iters: int = 3) -> list[str]:
    # The deterministic-LPA CTE chain over the 2-minute same-event-type
    # co-activity graph — shared by the user_communities oracle and the
    # community_modularity oracle (which scores the SAME partition, so
    # the label rounds must be literally identical SQL).
    ctes = [
        """os AS (
      SELECT DISTINCT CAST(floor(epoch(ts) / 120) AS BIGINT) AS bk,
             event_type, user_id
      FROM events)""",
        f"""bs AS (
      SELECT bk, event_type, COUNT(*) AS bucket_n,
             MIN(user_id) AS min_id
      FROM os GROUP BY bk, event_type)""",
        f"""und AS (
      SELECT DISTINCT lo, hi FROM (
        SELECT a.user_id AS lo, b.user_id AS hi
        FROM os a
        JOIN os b ON a.bk = b.bk AND a.event_type = b.event_type
                 AND a.user_id < b.user_id
        JOIN bs ON bs.bk = a.bk AND bs.event_type = a.event_type
               AND bs.bucket_n <= {MAX_COACTIVITY_BUCKET}
        UNION ALL
        SELECT s.min_id AS lo, o.user_id AS hi
        FROM os o
        JOIN bs s ON s.bk = o.bk AND s.event_type = o.event_type
        WHERE s.bucket_n > {MAX_COACTIVITY_BUCKET}
          AND o.user_id <> s.min_id))""",
        """sym AS (SELECT lo AS n, hi AS m FROM und
            UNION ALL SELECT hi, lo FROM und)""",
        """l0 AS (SELECT DISTINCT n AS node, n AS label FROM sym)""",
    ]
    for i in range(iters):
        ctes.append(f"""v{i} AS (
      SELECT s.n AS node, l.label, COUNT(*) AS cnt
      FROM sym s JOIN l{i} l ON l.node = s.m
      GROUP BY 1, 2)""")
        ctes.append(f"""l{i + 1} AS (
      SELECT node, label FROM (
        SELECT node, label,
               ROW_NUMBER() OVER (PARTITION BY node
                                  ORDER BY cnt DESC, label) AS rn
        FROM v{i}) WHERE rn = 1)""")
    return ctes


def _lpa_oracle(iters: int = 3) -> str:
    return (
        "\n    WITH "
        + ",\n    ".join(_lpa_ctes(iters))
        + f"""
    SELECT node AS user_id, label AS community FROM l{iters}
    """
    )


def _modularity_oracle(iters: int = 3) -> str:
    # Modularity of the LPA partition, all-integer (see
    # operators/graph.modularity): contrib_num = 4*m*L_c - d_c^2,
    # denom = 4*m^2, Q = sum(contrib_num)/denom exactly.
    ctes = _lpa_ctes(iters) + [
        """deg AS (
      SELECT n, COUNT(*) AS d FROM sym GROUP BY n)""",
        """mm AS (SELECT COUNT(*) AS m FROM und)""",
        f"""memb AS (SELECT node, label FROM l{iters})""",
        """intra AS (
      SELECT la.label AS community, COUNT(*) AS intra_edges
      FROM und u
      JOIN memb la ON la.node = u.lo
      JOIN memb lb ON lb.node = u.hi
      WHERE la.label = lb.label
      GROUP BY 1)""",
        """degsum AS (
      SELECT mb.label AS community, COUNT(*) AS n_members,
             CAST(SUM(COALESCE(d.d, 0)) AS BIGINT) AS degree_sum
      FROM memb mb LEFT JOIN deg d ON d.n = mb.node
      GROUP BY 1)""",
    ]
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + """
    SELECT ds.community, ds.n_members,
           CAST(COALESCE(i.intra_edges, 0) AS BIGINT) AS intra_edges,
           ds.degree_sum,
           CAST(4 * mm.m * COALESCE(i.intra_edges, 0)
                - ds.degree_sum * ds.degree_sum AS BIGINT) AS contrib_num,
           CAST(4 * mm.m * mm.m AS BIGINT) AS denom
    FROM degsum ds
    CROSS JOIN mm
    LEFT JOIN intra i ON i.community = ds.community
    """
    )


@_register(
    "user_communities",
    _lpa_oracle(),
    tags=("m5", "graph", "iterative"),
    doc="Community detection by synchronous label propagation "
        "(Raghavan et al. '07) over the user co-activity graph, made "
        "DETERMINISTIC: ties in the neighbor-label vote break on the "
        "smallest label (a total order — classic random-tie LPA is "
        "irreproducible) and the contract is the label state after 3 "
        "fixed rounds, which the oracle's CTE chain reproduces "
        "exactly.  The graph connects users active in the same "
        "2-minute bucket on the SAME event type (the plain 10-min "
        "co-activity graph is dense enough that LPA collapses to one "
        "community — measured; edge semantics matter).  Edge "
        "construction is hot-bucket capped (star fallback past 128 "
        "users, oracle-mirrored).  Per round: "
        "one edge⋈label join + keyed count + bounded per-node vote "
        "window; lineage cut per round — the third Pregel-style "
        "iterative shape alongside connected components and PageRank.",
)
def q_user_communities(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import co_activity_edges, label_propagation

    ev = load_table(spark, sf_dir, "events")
    bk = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(120)
    ).cast("long")
    os_ = ev.select(bk.alias("bk"), "event_type", "user_id").distinct()
    pairs = co_activity_edges(os_, ("bk", "event_type"))
    return label_propagation(pairs, iterations=3).select(
        F.col("node").alias("user_id"), "community"
    )


@_register(
    "co_activity_triangles",
    _TRIANGLE_ORACLE,
    tags=("m5", "graph", "join"),
    doc="Per-user triangle counts over the co-activity graph (two "
        "users connected when both are active in the same 10-minute "
        "epoch bucket) via degree-ordered orientation (Suri & "
        "Vassilvitskii WWW'11): orientation bounds every out-degree "
        "by O(sqrt(m)), so the wedge self-join is O(m^1.5) worst case "
        "instead of exploding on hub nodes, and the close is a plain "
        "equi-join — the pattern that makes clustering-coefficient / "
        "cohesion metrics runnable on a 100 TB edge list.  Edge "
        "construction itself is hot-bucket capped (co_activity_edges: "
        "buckets past 128 users emit a min-id star, not all pairs — "
        "mirrored in the oracle), so no single dense window can go "
        "quadratic.  Integer counts, exact oracle.",
)
def q_co_activity_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import co_activity_edges, triangle_counts

    ev = load_table(spark, sf_dir, "events")
    bk = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(600)
    ).cast("long")
    os_ = ev.select(bk.alias("bk"), "user_id").distinct()
    pairs = co_activity_edges(os_, ("bk",))
    return triangle_counts(pairs).select(
        F.col("node").alias("user_id"), "n_triangles"
    )


def _kcore_oracle(k: int = 3, rounds: int = 5) -> str:
    # Fixed-round synchronous peeling over the 10-minute co-activity
    # graph (same und CTE as the triangle oracle); each CTE round
    # recomputes degrees on the induced subgraph and keeps deg >= k.
    # The per-round edge sets are MATERIALIZED: each e_{i+1} references
    # e_i three times, so letting the optimizer inline the chain
    # re-expands the base self-join 3^rounds times (measured: 70 s at
    # sf0.001 inlined, milliseconds materialized).
    ctes = [
        """os AS MATERIALIZED (
      SELECT DISTINCT CAST(floor(epoch(ts) / 600) AS BIGINT) AS bk,
             user_id
      FROM events)""",
        f"""bs AS MATERIALIZED (
      SELECT bk, COUNT(*) AS bucket_n, MIN(user_id) AS min_id
      FROM os GROUP BY bk)""",
        f"""und AS MATERIALIZED (
      SELECT DISTINCT lo, hi FROM (
        SELECT a.user_id AS lo, b.user_id AS hi
        FROM os a
        JOIN os b ON a.bk = b.bk AND a.user_id < b.user_id
        JOIN bs ON bs.bk = a.bk
               AND bs.bucket_n <= {MAX_COACTIVITY_BUCKET}
        UNION ALL
        SELECT s.min_id AS lo, o.user_id AS hi
        FROM os o JOIN bs s ON s.bk = o.bk
        WHERE s.bucket_n > {MAX_COACTIVITY_BUCKET}
          AND o.user_id <> s.min_id))""",
        """e0 AS MATERIALIZED (SELECT lo, hi FROM und)""",
    ]
    for i in range(rounds):
        ctes.append(f"""d{i} AS MATERIALIZED (
      SELECT n, COUNT(*) AS d FROM (
        SELECT lo AS n FROM e{i} UNION ALL SELECT hi FROM e{i})
      GROUP BY n)""")
        ctes.append(f"""k{i} AS MATERIALIZED (SELECT n FROM d{i} WHERE d >= {k})""")
        ctes.append(f"""e{i + 1} AS MATERIALIZED (
      SELECT e.lo, e.hi FROM e{i} e
      JOIN k{i} a ON a.n = e.lo
      JOIN k{i} b ON b.n = e.hi)""")
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT s.n AS user_id, kk.n IS NOT NULL AS in_core
    FROM (SELECT lo AS n FROM und UNION SELECT hi FROM und) s
    LEFT JOIN k{rounds - 1} kk ON kk.n = s.n
    """
    )


@_register(
    "user_kcore",
    _kcore_oracle(),
    tags=("m5", "graph", "iterative"),
    doc="3-core membership over the user co-activity graph by "
        "synchronous peeling (Seidman '83) — the graph-cohesion "
        "filter between raw degree thresholds and full community "
        "detection: surviving the 3-core means having 3 neighbors "
        "that are themselves well-connected, the standard spam/bot "
        "pruning and dense-region extraction primitive.  Contract is "
        "the state after 5 FIXED peel rounds (deterministic, "
        "oracle-reproducible — the same fixed-round convention as "
        "LPA; suite pins actual convergence on test topologies).  "
        "Per round: one degree aggregate + two semi-joins inducing "
        "the surviving edge set, lineage cut per round.",
)
def q_user_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import co_activity_edges, k_core

    ev = load_table(spark, sf_dir, "events")
    bk = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(600)
    ).cast("long")
    os_ = ev.select(bk.alias("bk"), "user_id").distinct()
    pairs = co_activity_edges(os_, ("bk",))
    return k_core(pairs, k=3, rounds=5).select(
        F.col("node").alias("user_id"), "in_core"
    )


@_register(
    "community_modularity",
    _modularity_oracle(),
    tags=("m5", "graph", "iterative"),
    doc="Newman modularity decomposition of the user_communities LPA "
        "partition (Newman & Girvan 2004) — the quality gate that "
        "tells you whether the detected communities beat a random cut. "
        "All-integer contract (operators/graph.modularity): per "
        "community contrib_num = 4*m*L_c - d_c^2 with denom = 4*m^2, "
        "so Q = sum(contrib_num)/denom is exact, shuffle-order "
        "independent and bit-reproducible by the oracle's CTE chain "
        "(which re-runs the IDENTICAL label rounds).  Shape: the LPA "
        "rounds plus two shuffle joins of the canonical edge list "
        "against the (node, community) table and keyed integer "
        "aggregates; the only driver scalar is m (one count — the "
        "sanctioned literal-for-exact-algebra pattern).",
)
def q_community_modularity(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import co_activity_edges, label_propagation, modularity

    ev = load_table(spark, sf_dir, "events")
    bk = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(120)
    ).cast("long")
    os_ = ev.select(bk.alias("bk"), "event_type", "user_id").distinct()
    pairs = co_activity_edges(os_, ("bk", "event_type"))
    labels = label_propagation(pairs, iterations=3)
    return modularity(pairs, labels)


def _pagerank_weighted_oracle(iters: int = 3) -> str:
    # Weighted fixed-point PageRank over the customer<->supplier trade
    # graph, edge weight = distinct orders linking the pair; integer
    # arithmetic only (operators/graph.py PAGERANK_W_SCALE), so each
    # CTE round reproduces the Spark loop bit-for-bit.  The portable
    # floor division now divides rank*w (the reason for the coarser
    # 2^20 scale: the product must stay < 2^53 for the double division
    # to be exact).
    from ..operators.graph import PAGERANK_W_SCALE

    base = (3 * PAGERANK_W_SCALE) // 20
    ctes = [
        """pairs AS (
      SELECT o.o_custkey * 2 AS c_node,
             l.l_suppkey * 2 + 1 AS s_node,
             CAST(COUNT(DISTINCT l.l_orderkey) AS BIGINT) AS w
      FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      GROUP BY 1, 2)""",
        """edges AS (
      SELECT c_node AS src, s_node AS dst, w FROM pairs
      UNION ALL SELECT s_node, c_node, w FROM pairs)""",
        """wsum AS (
      SELECT src AS node, CAST(SUM(w) AS BIGINT) AS total_weight
      FROM edges GROUP BY src)""",
        f"""r0 AS (
      SELECT node, CAST({PAGERANK_W_SCALE} AS BIGINT) AS rank_scaled
      FROM wsum)""",
    ]
    for i in range(iters):
        ctes.append(f"""c{i} AS (
      SELECT e.dst AS node,
             CAST((r.rank_scaled * e.w
                   - ((r.rank_scaled * e.w) % d.total_weight))
                  / d.total_weight AS BIGINT) AS contrib
      FROM edges e
      JOIN r{i} r ON r.node = e.src
      JOIN wsum d ON d.node = e.src)""")
        ctes.append(f"""s{i} AS (
      SELECT node, CAST(SUM(contrib) AS BIGINT) AS s
      FROM c{i} GROUP BY node)""")
        ctes.append(f"""r{i + 1} AS (
      SELECT d.node,
             CAST({base} + CAST((17 * COALESCE(s.s, 0)
                  - ((17 * COALESCE(s.s, 0)) % 20)) / 20 AS BIGINT)
                  AS BIGINT) AS rank_scaled
      FROM wsum d LEFT JOIN s{i} s ON s.node = d.node)""")
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT CASE WHEN r.node % 2 = 0 THEN 'customer' ELSE 'supplier' END
             AS node_kind,
           CAST((r.node - (r.node % 2)) / 2 AS BIGINT) AS entity_id,
           d.total_weight AS total_weight,
           r.rank_scaled AS rank_scaled
    FROM r{iters} r JOIN wsum d ON d.node = r.node
    """
    )


@_register(
    "weighted_trade_pagerank",
    _pagerank_weighted_oracle(),
    tags=("m5", "graph", "iterative"),
    doc="Weighted fixed-point PageRank over the customer<->supplier "
        "trade graph, mass flowing in proportion to relationship "
        "strength (distinct orders linking the pair) — the importance "
        "ranking a real trade/interaction graph wants, where the "
        "unweighted variant treats a 1-order and a 50-order "
        "relationship identically.  Exact-integer contract at the "
        "coarser 2^20 fixed point (rank*weight must stay < 2^53 for "
        "portable floor division — operators/graph.PAGERANK_W_SCALE "
        "documents the envelope); same per-round shape as "
        "trade_graph_pagerank: one co-partitionable edge join + one "
        "keyed integer sum, lineage cut per round.",
)
def q_weighted_trade_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.graph import pagerank_weighted

    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    pairs = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(
            (F.col("o_custkey") * 2).alias("c_node"),
            (F.col("l_suppkey") * 2 + 1).alias("s_node"),
        )
        .agg(F.countDistinct("l_orderkey").cast("long").alias("w"))
    )
    edges = pairs.select(
        F.col("c_node").alias("src"), F.col("s_node").alias("dst"), "w"
    ).unionByName(
        pairs.select(
            F.col("s_node").alias("src"), F.col("c_node").alias("dst"), "w"
        )
    )
    pr = pagerank_weighted(edges, iterations=3, weight="w")
    return pr.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("supplier"))
        .alias("node_kind"),
        F.expr("CAST((node - (node % 2)) / 2 AS BIGINT)").alias("entity_id"),
        F.col("total_weight"),
        F.col("rank_scaled"),
    )


@_register(
    "embedding_quantization_error",
    """
    WITH scaled AS (
      SELECT vec_id, label, embedding,
             list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) / 127.0 AS s
      FROM embeddings),
    err AS (
      SELECT vec_id, label,
             list_max(list_transform(embedding,
                x -> abs(CAST(x AS DOUBLE) - floor(CAST(x AS DOUBLE) / s + 0.5) * s)))
               AS max_abs_err,
             s
      FROM scaled)
    SELECT label, COUNT(*) AS n_vectors,
           MAX(max_abs_err) AS worst_abs_err,
           MAX(s) AS max_scale
    FROM err GROUP BY label
    """,
    tags=("m5", "similarity", "quantization"),
    doc="Int8 scalar quantization for vector storage (4x compression at "
        "100 TB): per-vector symmetric scale, round-half-up encode "
        "(floor(x/s + 0.5) — portable across engines, unlike round()), "
        "worst-case reconstruction error per label.  Only "
        "order-independent aggregates (count/max) cross rows, so the "
        "result is exact.",
)
def q_embedding_quantization(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    scaled = emb.withColumn(
        "s",
        F.expr(
            "aggregate(embedding, 0D, (a, x) -> greatest(a, abs(cast(x as double)))) / 127.0"
        ),
    )
    err = scaled.withColumn(
        "max_abs_err",
        F.expr(
            "array_max(transform(embedding,"
            " x -> abs(cast(x as double) - floor(cast(x as double) / s + 0.5) * s)))"
        ),
    )
    return err.groupBy("label").agg(
        F.count("*").alias("n_vectors"),
        F.max("max_abs_err").alias("worst_abs_err"),
        F.max("s").alias("max_scale"),
    )


# ---------------------------------------------------------------------------
# Reproducible sampling / dataset splitting — hash-based, not rand():
# the same row lands in the same bucket on any cluster, any partition
# layout, any engine (the only reproducible way to sample at 100 TB).
# ---------------------------------------------------------------------------

_HASH_BUCKET = "(strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16 + (strpos('0123456789abcdef', substr(md5('split:' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1)"


@_register(
    "dataset_split_counts",
    f"""
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM (
      SELECT CASE WHEN {_HASH_BUCKET} < 204 THEN 'train'
                  WHEN {_HASH_BUCKET} < 230 THEN 'val'
                  ELSE 'test' END AS split,
             n_chars
      FROM documents)
    GROUP BY split
    """,
    tags=("m5", "sampling"),
    doc="Reproducible ~80/10/10 train/val/test split: the first md5 byte "
        "of the salted id picks the bucket — stable under any "
        "partitioning/engine, unlike rand(seed).  (204/256 = 79.7%, "
        "230/256 = 89.8%.)",
)
def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))), 1, 2),
        16, 10,
    ).cast("int")
    split = (
        F.when(bucket < 204, F.lit("train"))
        .when(bucket < 230, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "n_chars")
        .groupBy("split")
        .agg(F.count("*").alias("n_docs"), F.sum("n_chars").alias("total_chars"))
    )


@_register(
    "daily_events_unpivot",
    """
    SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           event_type, COUNT(*) AS n
    FROM events
    WHERE event_type IN ('click', 'error', 'purchase', 'signup', 'view')
    GROUP BY 1, 2
    """,
    tags=("olap", "pivot"),
    doc="Unpivot/stack: the daily-by-type pivot melted back to long form "
        "(stack() over the wide columns, zero-count cells dropped) — "
        "round-trips to the plain groupBy, which is the oracle.",
)
def q_daily_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = QUERIES["daily_event_type_pivot"].fn(spark, sf_dir)
    n = len(_EVENT_TYPES)
    stack_expr = ", ".join(f"'{t}', {t}" for t in _EVENT_TYPES)
    return (
        wide.selectExpr("day", f"stack({n}, {stack_expr}) AS (event_type, n)")
        .filter(F.col("n") > 0)  # pivot materialized absent combos as 0
    )


# ---------------------------------------------------------------------------
# Training-corpus curation, continued: intra-document repetition
# (quality), benchmark-contamination screening, and PII detection —
# the filters a 100 TB pretraining pipeline runs between dedup and
# packing.  All pure column expressions / one aggregation pass.
# ---------------------------------------------------------------------------

# Shared DuckDB fragment: word 3-grams per document (bag semantics),
# mirroring operators/dedup.shingle_rows(distinct=False).
_GRAMS_CTE = """
    t AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
    g AS (SELECT doc_id,
                 unnest(list_transform(generate_series(1, len(l) - 2),
                        i -> concat_ws(' ', l[i], l[i+1], l[i+2]))) AS shingle
          FROM t WHERE len(l) >= 3)
"""


@_register(
    "doc_repetition_scores",
    f"""
    WITH {_GRAMS_CTE}
    SELECT doc_id, COUNT(*) AS n_grams,
           COUNT(DISTINCT shingle) AS n_distinct_grams,
           1.0 - CAST(COUNT(DISTINCT shingle) AS DOUBLE) / COUNT(*)
             AS repetition_ratio
    FROM g GROUP BY doc_id
    """,
    tags=("m5", "text", "quality"),
    doc="Gopher-style repetition filter: fraction of word 3-grams that "
        "repeat within the document (looping/boilerplate text scores "
        "high).  Bag-semantics shingles, one partial+final agg per doc.",
)
def q_doc_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import repetition_stats

    return repetition_stats(load_table(spark, sf_dir, "documents"))


@_register(
    "benchmark_contamination",
    f"""
    WITH {_GRAMS_CTE},
    dg AS (SELECT DISTINCT doc_id, shingle FROM g),
    hold AS (SELECT DISTINCT shingle FROM dg WHERE doc_id % 97 = 0)
    SELECT dg.doc_id,
           COUNT(*) AS n_contaminated_shingles
    FROM dg JOIN hold USING (shingle)
    WHERE dg.doc_id % 97 != 0
    GROUP BY dg.doc_id
    """,
    tags=("m5", "text", "contamination"),
    doc="Eval-set decontamination screen: for every training doc, the "
        "number of distinct word 3-grams it shares with the held-out "
        "'benchmark' slice (doc_id %% 97 == 0 stands in for the eval "
        "set).  Shingle once, broadcast the (small) holdout shingle "
        "set, count hits per doc — the n-gram-overlap screen run "
        "before a corpus ships to pretraining.",
)
def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    grams = shingle_rows(docs, "doc_id", "text")  # distinct per doc
    hold = grams.filter(F.col("doc_id") % 97 == 0).select("shingle").distinct()
    return (
        grams.filter(F.col("doc_id") % 97 != 0)
        .join(F.broadcast(hold), "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_contaminated_shingles"))
    )


@_register(
    "pii_detection",
    """
    WITH d AS (
      SELECT doc_id,
             concat(text, CASE WHEN doc_id % 50 = 0
                    THEN ' contact user@example.com or 555-1234 now'
                    ELSE '' END) AS t
      FROM documents)
    SELECT doc_id,
           CAST(len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9.]+[a-z]')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}')) AS BIGINT)
             AS n_phones,
           (len(regexp_extract_all(t, '[a-z0-9.]+@[a-z0-9.]+[a-z]'))
            + len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4}'))) > 0 AS has_pii
    FROM d
    """,
    tags=("m5", "text", "pii"),
    doc="PII scrubbing pass, detection side: regex hit counts for "
        "emails/phones per document (redaction is the same expression "
        "with regexp_replace).  The synthetic corpus contains no PII, "
        "so the query seeds a deterministic marker into every 50th doc "
        "— same derivation in the oracle — to prove the counts on "
        "non-zero rows.",
)
def q_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    email_re = "[a-z0-9.]+@[a-z0-9.]+[a-z]"
    phone_re = "[0-9]{3}-[0-9]{4}"
    seeded = F.concat(
        F.col("text"),
        F.when(F.col("doc_id") % 50 == 0, F.lit(" contact user@example.com or 555-1234 now"))
        .otherwise(F.lit("")),
    )
    n_emails = F.regexp_count(seeded, F.lit(email_re)).cast("long")
    n_phones = F.regexp_count(seeded, F.lit(phone_re)).cast("long")
    return docs.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        ((n_emails + n_phones) > 0).alias("has_pii"),
    )


# Shared DuckDB fragment: the packing assignment (also the CTE base of
# packing_efficiency below), parameterized exactly like
# operators.packing.pack_sequences.
def _packing_sql(n_shards: int, bin_tokens: int = 256) -> str:
    from ..operators.packing import SHARD_STRIDE

    return f"""
    WITH t AS (
      SELECT doc_id, doc_id % {n_shards} AS shard,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    c AS (
      SELECT doc_id, shard, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM t)
    SELECT doc_id, shard, n_tokens,
           CAST(shard * {SHARD_STRIDE} + floor((cum - n_tokens) / {float(bin_tokens)}) AS BIGINT)
             AS bin_id
    FROM c
    """


# The registered query pins n_shards=16 ONLY so the oracle SQL (a
# static string) and the CORRECTNESS rows stay stable across rounds;
# the operator itself defaults to the session's parallelism and is
# hash-verified at multiple shard counts in tests/test_oracle_parity.
_PACKING_SQL = _packing_sql(16)


@_register(
    "sequence_packing",
    _PACKING_SQL,
    tags=("m5", "text", "packing"),
    doc="Context-window packing, the last step before a corpus ships to "
        "pretraining: documents are packed contiguously into 256-token "
        "bins WITHIN hash shards — a per-shard running token count, not "
        "a global cumsum, because a global ordered window is a "
        "one-partition bottleneck at 100 TB while per-shard windows "
        "shuffle once on the shard key.  The shard count is a parameter "
        "of operators.packing.pack_sequences (default: session "
        "parallelism — parallelism and per-task sort volume both scale "
        "with it); this registry entry pins 16 so the static oracle "
        "matches.  bin_id is stable under any input partitioning.",
)
def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import pack_sequences

    return pack_sequences(load_table(spark, sf_dir, "documents"), n_shards=16)


@_register(
    "doc_chunks",
    """
    WITH t AS (
      SELECT doc_id, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n
      FROM documents),
    w AS (
      SELECT doc_id, toks,
             UNNEST(range(0, CAST(ceil(greatest(n - 64, 0) / 48.0) AS BIGINT) + 1))
               AS chunk_id
      FROM t)
    SELECT doc_id, CAST(chunk_id AS INT) AS chunk_id,
           CAST(len(list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64))
                AS BIGINT) AS n_chunk_tokens,
           md5(array_to_string(
                 list_slice(toks, chunk_id * 48 + 1, chunk_id * 48 + 64), ' '))
             AS chunk_hash
    FROM w
    """,
    tags=("m5", "text", "packing"),
    doc="Writer-side document chunking: every doc split into 64-token "
        "windows at stride 48 (overlapping context windows, the "
        "standard sliding-window training-sequence prep; "
        "sequence_packing bins whole docs — this SPLITS long ones).  "
        "Pure map-side expression work (split -> window starts -> "
        "explode -> slice), NO shuffle anywhere: a full-corpus chunk "
        "pass at 100 TB is scan-bound, which is the point.  Chunks "
        "carry content hashes so chunk-level dedup/provenance joins "
        "never touch the text again.",
)
def q_doc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.packing import chunk_documents

    return chunk_documents(
        load_table(spark, sf_dir, "documents"), chunk_tokens=64, stride=48
    )


# ---------------------------------------------------------------------------
# Corpus-curation dashboards: per-source health, target-mixture
# resampling, inter-document boilerplate, the filter funnel, packing
# efficiency, and the cross-source overlap map.  Everything an operator
# of a 100 TB pretraining pipeline watches between ingest and shipping.
# Determinism notes: every ratio is a double division of exact integer
# aggregates (never an AVG over per-row doubles — cross-row double sums
# are order-dependent and would break the hash oracle).
# ---------------------------------------------------------------------------

_STOPWORD_SQL = "x IN ('the', 'a', 'of', 'and')"  # mirrors text.STOPWORDS

# Per-document integer token stats shared by the per-source rollup and
# the filter funnel (DuckDB side).
_DOCSTATS_CTE = f"""
    s AS (SELECT doc_id, source, lang, n_chars,
                 len(string_split(text, ' ')) AS n,
                 len(list_distinct(string_split(text, ' '))) AS nd,
                 len(list_filter(string_split(text, ' '),
                                 x -> {_STOPWORD_SQL})) AS ns
          FROM documents)
"""


def _doc_int_stats(docs: DataFrame) -> DataFrame:
    """Per-doc integer token stats (Spark twin of _DOCSTATS_CTE)."""
    from ..operators.text import STOPWORDS, tokens

    toks = tokens("text")
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    return docs.select(
        "doc_id",
        "source",
        "lang",
        "n_chars",
        F.size(toks).cast("long").alias("n"),
        F.size(F.array_distinct(toks)).cast("long").alias("nd"),
        F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("long").alias("ns"),
    )


@_register(
    "per_source_quality",
    f"""
    WITH {_DOCSTATS_CTE}
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(n) AS BIGINT) AS total_tokens,
           CAST(SUM(nd) AS DOUBLE) / SUM(n) AS pooled_diversity,
           CAST(SUM(ns) AS DOUBLE) / SUM(n) AS pooled_stopword_ratio,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM s GROUP BY source
    """,
    tags=("m5", "curation", "quality"),
    doc="Per-source corpus health rollup: doc counts, token volume, and "
        "POOLED diversity/stopword ratios (sum-of-ints divided once — "
        "averaging per-doc doubles would be order-dependent and "
        "unverifiable).  The table every curation run reviews before "
        "adjusting source weights.",
)
def q_per_source_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = _doc_int_stats(load_table(spark, sf_dir, "documents"))
    return stats.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n").alias("total_tokens"),
        (F.sum("nd").cast("double") / F.sum("n")).alias("pooled_diversity"),
        (F.sum("ns").cast("double") / F.sum("n")).alias("pooled_stopword_ratio"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
    )


def _mix_bucket_sql(salt: str) -> str:
    m = f"md5('{salt}' || CAST(doc_id AS VARCHAR))"
    return (
        f"(strpos('0123456789abcdef', substr({m}, 1, 1)) - 1) * 16"
        f" + (strpos('0123456789abcdef', substr({m}, 2, 1)) - 1)"
    )


@_register(
    "domain_mixture_sample",
    f"""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_s,
             CAST(substr(source, 4) AS BIGINT) + 1 AS wt
      FROM documents GROUP BY source),
    tot AS (SELECT CAST(SUM(wt) AS BIGINT) AS w_sum FROM counts),
    feas AS (
      SELECT MIN(CAST(n_s * w_sum AS DOUBLE) / wt) AS t_max
      FROM counts, tot),
    rates AS (
      SELECT source, n_s,
             CAST(floor(LEAST(1.0,
                 (t_max * wt) / CAST(w_sum * n_s AS DOUBLE)) * 256) AS BIGINT)
               AS threshold
      FROM counts, tot, feas),
    kept AS (
      SELECT d.source,
             CASE WHEN {_mix_bucket_sql('mix:')} < r.threshold
                  THEN 1 ELSE 0 END AS keep
      FROM documents d JOIN rates r ON d.source = r.source)
    SELECT r.source, r.n_s AS n_docs,
           CAST(SUM(k.keep) AS BIGINT) AS n_sampled,
           r.threshold
    FROM kept k JOIN rates r ON k.source = r.source
    GROUP BY r.source, r.n_s, r.threshold
    """,
    tags=("m5", "curation", "sampling"),
    doc="Target-mixture resampling: given per-source target weights "
        "(w_s proportional to source index + 1), find the largest total "
        "corpus T the weights allow (T = min n_s/w_s), derive each "
        "source's acceptance rate w_s*T/n_s, and accept docs by salted "
        "md5 bucket < floor(rate*256) — the same retrieval-stable "
        "hash-sampling used for splits, so reruns and incremental "
        "ingests sample identically.  The per-source rate table is "
        "rows-of-sources small: computed in two tiny aggregates and "
        "broadcast back onto the corpus (no big-side shuffle).",
)
def q_domain_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("source").agg(F.count("*").alias("n_s")).withColumn(
        "wt", F.substring("source", 4, 10).cast("bigint") + 1
    )
    tot = counts.agg(F.sum("wt").alias("w_sum"))
    with_tot = counts.crossJoin(F.broadcast(tot))
    feas = with_tot.agg(
        F.min((F.col("n_s") * F.col("w_sum")).cast("double") / F.col("wt")).alias("t_max")
    )
    rates = with_tot.crossJoin(F.broadcast(feas)).select(
        "source",
        "n_s",
        F.floor(
            F.least(
                F.lit(1.0),
                (F.col("t_max") * F.col("wt")) / (F.col("w_sum") * F.col("n_s")).cast("double"),
            ) * 256
        ).cast("bigint").alias("threshold"),
    # Materialize the rate table once: it is rows-of-sources tiny, but
    # it is REFERENCED twice (doc filter + final join) and each
    # reference would otherwise re-expand the counts->total->feasible
    # chain and re-aggregate the full corpus — 3 extra big-side scans
    # at 100 TB for a 20-row table.  Checkpoint cost here is one tiny
    # job.
    ).localCheckpoint(eager=True)
    bucket = F.conv(
        F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 2),
        16, 10,
    ).cast("long")
    kept = docs.select("source", "doc_id").join(F.broadcast(rates), "source").select(
        "source", F.when(bucket < F.col("threshold"), 1).otherwise(0).alias("keep")
    )
    return (
        kept.groupBy("source")
        .agg(F.sum("keep").alias("n_sampled"))
        .join(F.broadcast(rates), "source")
        .select("source", F.col("n_s").alias("n_docs"), "n_sampled", "threshold")
    )


@_register(
    "boilerplate_grams",
    f"""
    WITH {_GRAMS_CTE},
    dg AS (SELECT DISTINCT doc_id, shingle FROM g),
    df AS (SELECT shingle, COUNT(*) AS doc_freq FROM dg GROUP BY shingle),
    j AS (SELECT dg.doc_id,
                 CASE WHEN df.doc_freq >= 3 THEN 1 ELSE 0 END AS boiler
          FROM dg JOIN df USING (shingle))
    SELECT doc_id,
           COUNT(*) AS n_distinct_grams,
           CAST(SUM(boiler) AS BIGINT) AS n_boiler_grams,
           CAST(SUM(boiler) AS DOUBLE) / COUNT(*) AS boiler_frac
    FROM j GROUP BY doc_id
    """,
    tags=("m5", "curation", "boilerplate"),
    doc="Inter-document boilerplate signal (the C4/CCNet-style template "
        "filter): a word 3-gram occurring in >= 3 distinct documents is "
        "'boilerplate'; each doc reports what fraction of its distinct "
        "3-grams are boilerplate.  Shape = the tf-idf join: shingle "
        "once, doc-frequency aggregate on the gram key, join back on "
        "the same key — two shuffles on (shingle), both partial-agg "
        "bounded.  Ultra-hot grams at web scale get the same skew "
        "treatment as LSH buckets (AQE skew join; cap + log).",
)
def q_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    grams = shingle_rows(docs, "doc_id", "text")  # distinct per doc
    dfreq = grams.groupBy("shingle").agg(F.count("*").alias("doc_freq"))
    joined = grams.join(dfreq, "shingle").select(
        "doc_id", F.when(F.col("doc_freq") >= 3, 1).otherwise(0).alias("boiler")
    )
    return joined.groupBy("doc_id").agg(
        F.count("*").alias("n_distinct_grams"),
        F.sum("boiler").alias("n_boiler_grams"),
        (F.sum("boiler").cast("double") / F.count("*")).alias("boiler_frac"),
    )


@_register(
    "quality_filter_funnel",
    f"""
    WITH {_DOCSTATS_CTE},
    agg AS (
      SELECT COUNT(*) AS n0,
             SUM(CASE WHEN n >= 25 THEN 1 ELSE 0 END) AS n1,
             SUM(CASE WHEN n >= 25
                       AND CAST(nd AS DOUBLE) / n >= 0.35
                      THEN 1 ELSE 0 END) AS n2,
             SUM(CASE WHEN n >= 25
                       AND CAST(nd AS DOUBLE) / n >= 0.35
                       AND ns >= 1 THEN 1 ELSE 0 END) AS n3,
             SUM(CASE WHEN n >= 25
                       AND CAST(nd AS DOUBLE) / n >= 0.35
                       AND ns >= 1 AND lang = 'en' THEN 1 ELSE 0 END) AS n4
      FROM s)
    SELECT stage_id, stage, CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_docs AS DOUBLE) / CAST(n0 AS DOUBLE) AS retention
    FROM (
      SELECT 0 AS stage_id, 'all' AS stage, n0 AS n_docs, n0 FROM agg
      UNION ALL SELECT 1, 'min_length', n1, n0 FROM agg
      UNION ALL SELECT 2, 'lexical_diversity', n2, n0 FROM agg
      UNION ALL SELECT 3, 'has_stopwords', n3, n0 FROM agg
      UNION ALL SELECT 4, 'english', n4, n0 FROM agg)
    """,
    tags=("m5", "curation", "quality"),
    doc="The curation funnel: docs surviving each successive filter "
        "(length >= 25 tokens -> lexical diversity >= 0.35 -> contains "
        "stopwords -> lang == en), with retention vs the raw corpus.  "
        "ONE aggregation pass computes every stage (cumulative "
        "conjunction flags summed map-side) — not one scan per stage; "
        "at 100 TB the funnel costs the same as a single count.",
)
def q_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    stats = _doc_int_stats(load_table(spark, sf_dir, "documents"))
    f1 = (F.col("n") >= 25).cast("long")
    f2 = f1 * ((F.col("nd").cast("double") / F.col("n")) >= 0.35).cast("long")
    f3 = f2 * (F.col("ns") >= 1).cast("long")
    f4 = f3 * (F.col("lang") == "en").cast("long")
    agg = stats.agg(
        F.count("*").alias("n0"),
        F.sum(f1).alias("n1"),
        F.sum(f2).alias("n2"),
        F.sum(f3).alias("n3"),
        F.sum(f4).alias("n4"),
    )
    stack = (
        "stack(5, 0, 'all', n0, 1, 'min_length', n1, 2, 'lexical_diversity', n2,"
        " 3, 'has_stopwords', n3, 4, 'english', n4) AS (stage_id, stage, n_docs)"
    )
    return agg.selectExpr(stack, "n0").select(
        F.col("stage_id").cast("int").alias("stage_id"),
        "stage",
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("n_docs").cast("double") / F.col("n0").cast("double")).alias("retention"),
    )


@_register(
    "packing_efficiency",
    f"""
    WITH packed AS ({_PACKING_SQL})
    SELECT shard, COUNT(*) AS n_docs,
           COUNT(DISTINCT bin_id) AS n_bins,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS DOUBLE) / COUNT(DISTINCT bin_id) AS avg_docs_per_bin,
           CAST(SUM(n_tokens) AS DOUBLE) / COUNT(DISTINCT bin_id) AS avg_bin_tokens
    FROM packed GROUP BY shard
    """,
    tags=("m5", "text", "packing"),
    doc="Packing QA over sequence_packing: per shard, how full the "
        "256-token bins actually are (docs per bin, tokens per bin).  "
        "The metric a pipeline watches to tune bin capacity vs padding "
        "waste before shipping shards to the trainer.",
)
def q_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    packed = QUERIES["sequence_packing"].fn(spark, sf_dir)
    return packed.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("bin_id").alias("n_bins"),
        F.sum("n_tokens").alias("total_tokens"),
        (F.count("*").cast("double") / F.countDistinct("bin_id")).alias("avg_docs_per_bin"),
        (F.sum("n_tokens").cast("double") / F.countDistinct("bin_id")).alias("avg_bin_tokens"),
    )


@_register(
    "source_overlap_grams",
    f"""
    WITH {_GRAMS_CTE},
    sg AS (SELECT DISTINCT d.source, g.shingle
           FROM g JOIN documents d USING (doc_id))
    SELECT a.source AS source_a, b.source AS source_b,
           COUNT(*) AS n_shared_grams
    FROM sg a JOIN sg b
      ON a.shingle = b.shingle AND a.source < b.source
    GROUP BY a.source, b.source
    """,
    tags=("m5", "curation", "overlap"),
    doc="Cross-source content-overlap map: for every source pair, the "
        "number of distinct word 3-grams both contain — the corpus-level "
        "view of mirror/syndication overlap (the corpus has no exact "
        "cross-source duplicates, so gram overlap is the right "
        "granularity).  Distinct (source, gram) first — ONE row per "
        "source per gram regardless of doc count — then a self-join on "
        "the gram key; gram doc-frequency is bounded (p99.9 = 6 here), "
        "and at web scale ultra-common grams get the LSH hot-bucket "
        "treatment (cap + log) before the pair explosion, not after.",
)
def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingle_rows

    docs = load_table(spark, sf_dir, "documents")
    grams = shingle_rows(docs, "doc_id", "text")
    sg = (
        grams.join(docs.select("doc_id", "source"), "doc_id")
        .select("source", "shingle")
        .distinct()
    )
    a = sg.select(F.col("source").alias("source_a"), "shingle")
    b = sg.select(F.col("source").alias("source_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").alias("n_shared_grams"))
    )


@_register(
    "streaming_dedup_exact",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("parity", "streaming", "dedup"),
    doc="Streaming exact dedup: dropDuplicates on the key columns over "
        "an unbounded stream (state-store-backed first-wins; the "
        "streaming form of the exact-dedup operator).  Only the KEYS "
        "are emitted, so the drained result is order-independent and "
        "equals batch DISTINCT (the oracle) no matter how micro-batches "
        "split.  Production note: unbounded key state wants "
        "dropDuplicatesWithinWatermark + RocksDB when keys don't fit "
        "heap.",
)
def q_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import drain_to_df, stream_table

    s = stream_table(spark, sf_dir, "events").select("user_id", "event_type")
    return drain_to_df(s.dropDuplicates(["user_id", "event_type"]), "append")


@_register(
    "streaming_dedup_watermarked",
    """
    SELECT DISTINCT user_id, event_type FROM events
    """,
    tags=("parity", "streaming", "dedup", "watermark"),
    doc="Streaming exact dedup with BOUNDED state — the production form "
        "streaming_dedup_exact's note prescribes: "
        "dropDuplicatesWithinWatermark keeps a key's state only until "
        "the watermark passes its event time + delay, so state is "
        "O(keys-per-delay-window) instead of O(all keys ever).  The "
        "delay here exceeds the fixture's whole time span, so no key "
        "evicts mid-drain and the result equals batch DISTINCT (the "
        "oracle); the eviction semantics themselves — a duplicate "
        "arriving after its key's state expired IS re-emitted — are "
        "pinned by a 2-round checkpointed drain in "
        "tests/test_streaming_cdc.py.",
)
def q_streaming_dedup_watermarked(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import drain_to_df, stream_table

    ev = stream_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.col("ts").cast("timestamp").alias("ts")
    )
    dd = ev.withWatermark("ts", "3650 days").dropDuplicatesWithinWatermark(
        ["user_id", "event_type"]
    )
    return drain_to_df(dd, "append").select("user_id", "event_type")


def _incremental_dedup_oracle(threshold: float = 0.5) -> str:
    """Batch form of the incremental dedup rule: a doc is dropped iff
    some candidate pair (shared LSH band) links it to a LOWER id with
    signature agreement >= threshold.  No hot-bucket cap: the
    incremental index must stay complete (see
    streaming/incremental_dedup.py), so its oracle is the uncapped
    self-join (bucket sizes at test SFs are <= 12)."""
    k, br = _dedup.N_MINHASH, _dedup.BAND_ROWS
    mh = ",\n             ".join(
        f"min(substr(md5('{j // 4}:' || shingle), {(j % 4) * 8 + 1}, 8)) AS mh{j}"
        for j in range(k)
    )
    bands = "\n      UNION ALL ".join(
        "SELECT doc_id, {b} AS band_id, {expr} AS bv FROM sigs".format(
            b=b, expr=" || ".join(f"mh{b * br + r}" for r in range(br))
        )
        for b in range(k // br)
    )
    agree = " + ".join(
        f"CASE WHEN sa.mh{j} = sb.mh{j} THEN 1 ELSE 0 END" for j in range(k)
    )
    return f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(CASE WHEN len(t) >= 3
               THEN list_transform(range(1, len(t) - 1),
                                   i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
               ELSE [] END) AS s
      FROM toks),
    ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
    sigs AS (SELECT doc_id,
             {mh}
             FROM ex GROUP BY doc_id),
    bands AS ({bands}),
    pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM bands a JOIN bands b
        ON a.band_id = b.band_id AND a.bv = b.bv AND a.doc_id < b.doc_id),
    dropped AS (
      SELECT DISTINCT p.doc_b
      FROM pairs p
        JOIN sigs sa ON sa.doc_id = p.doc_a
        JOIN sigs sb ON sb.doc_id = p.doc_b
      WHERE CAST({agree} AS DOUBLE) / {float(k)} >= {threshold})
    SELECT d.doc_id FROM documents d
    WHERE NOT EXISTS (SELECT 1 FROM dropped x WHERE x.doc_b = d.doc_id)
    """


@_register(
    "streaming_incremental_dedup",
    _incremental_dedup_oracle(),
    tags=("m5", "streaming", "dedup"),
    doc="Incremental corpus dedup (streaming/incremental_dedup.py): "
        "documents arrive as a multi-epoch stream and are deduped "
        "against a GROWING MinHash-LSH index — the index IS the "
        "persisted band table (partitioned by band bucket): per "
        "epoch, new docs' band rows join only the band-store "
        "partitions they hit (disk partition pruning, plan-asserted "
        "in tests/test_streaming_cdc.py), and the signature-estimate "
        "lookup reads candidate-pair ids only (broadcast semi-join); "
        "the higher id of any pair with signature agreement >= 0.5 "
        "joins a monotone dropped set.  The survivor set is a pure "
        "function of the pair set, so it is independent of how the "
        "stream slices into epochs and equals the batch uncapped LSH "
        "self-join rule (the oracle).  This is the production ingest "
        "shape at 100 TB: nothing re-bands or re-shingles the "
        "existing corpus, and the index stores band rows + "
        "fixed-width signatures, never text.",
)
def q_streaming_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..streaming.incremental_dedup import (
        read_survivors,
        start_incremental_dedup,
    )

    base = tempfile.mkdtemp(prefix="kaop_incdedup_")
    src, idx, chk = f"{base}/src", f"{base}/index", f"{base}/chk"
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # several files -> several genuine ingest epochs (maxFilesPerTrigger=1)
    docs.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    start_incremental_dedup(stream, idx, chk).awaitTermination()
    return read_survivors(spark, idx)


@_register(
    "streaming_static_enrich",
    f"""
    SELECT c.c_mktsegment AS mktsegment,
           COUNT(*) AS n_events,
           {_dsum('e.value')} AS total_value
    FROM events e JOIN customer c ON e.user_id = c.c_custkey
    GROUP BY c.c_mktsegment
    """,
    tags=("parity", "streaming", "join"),
    doc="Stream-static enrichment: the event stream joined to a static "
        "dimension (customer, broadcast — re-read per micro-batch, no "
        "stream state) and aggregated per market segment in update "
        "mode.  The canonical Kafka-enrichment topology: stream joins "
        "dim, dim side never shuffles the stream.  Decimal value sums "
        "keep the drained result bit-equal to the batch oracle.",
)
def q_streaming_static_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.pipeline import drain_to_df, stream_table

    events = stream_table(spark, sf_dir, "events").select("user_id", "value")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    enriched = events.join(
        F.broadcast(cust), events.user_id == cust.c_custkey
    )
    agg = enriched.groupBy(F.col("c_mktsegment").alias("mktsegment")).agg(
        F.count("*").alias("n_events"),
        dec_sum("value").alias("total_value"),
    )
    return drain_to_df(agg, "complete")


@_register(
    "upsert_orders",
    """
    WITH upd AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             o_totalprice * 0.9 AS o_totalprice
      FROM orders WHERE o_orderkey % 7 = 0
      UNION ALL
      SELECT -(o_orderkey + 1), 'N', 100.0
      FROM orders WHERE o_orderkey % 500 = 0)
    SELECT o_orderkey, o_orderstatus, o_totalprice
    FROM orders t
    WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = t.o_orderkey)
    UNION ALL
    SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd
    """,
    tags=("olap", "upsert"),
    doc="MERGE emulation (operators/upsert.py): a deterministic delta "
        "(10%% price-adjusted existing keys + synthetic new negative "
        "keys) upserted into orders via the anti-join + union rewrite "
        "a lakehouse MERGE compiles to; full post-merge table checked "
        "row-for-row against the NOT EXISTS / UNION ALL oracle.",
)
def q_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.upsert import upsert

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = orders.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 0.9).alias("o_totalprice"),
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 500 == 0).select(
            (-(F.col("o_orderkey") + 1)).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    )
    return upsert(orders, updates, "o_orderkey")


@_register(
    "upsert_orders_partitioned",
    """
    WITH upd AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             o_totalprice * 0.9 AS o_totalprice
      FROM orders WHERE o_orderkey % 500 = 0
      UNION ALL
      SELECT -(o_orderkey + 1), 'N', 100.0
      FROM orders WHERE o_orderkey % 1000 = 0),
    merged AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders t
      WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = t.o_orderkey)
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd)
    SELECT CAST(((o_orderkey % 16) + 16) % 16 AS INT) AS bucket,
           o_orderkey, o_orderstatus, o_totalprice
    FROM merged
    """,
    tags=("olap", "upsert", "partitioned"),
    doc="Partition-pruned MERGE (operators/upsert.py "
        "write_partitioned/merge_partitioned): the target lives as a "
        "key-bucket-partitioned parquet table; a selective delta "
        "(keys %% 500, touching 4 of 16 buckets) is merged by scanning "
        "ONLY touched buckets (partition pruning at file listing) and "
        "writing back with dynamic partition overwrite, so untouched "
        "partitions' files are never read or rewritten — the IO "
        "profile a lakehouse MERGE has at 100 TB, demonstrated "
        "without table-format jars.  tests/test_upsert.py asserts the "
        "untouched files stay byte-identical.",
)
def q_upsert_orders_partitioned(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.upsert import merge_partitioned, write_partitioned

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = orders.filter(F.col("o_orderkey") % 500 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 0.9).alias("o_totalprice"),
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 1000 == 0).select(
            (-(F.col("o_orderkey") + 1)).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    )
    path = tempfile.mkdtemp(prefix="kaop_upsert_part_") + "/orders"
    write_partitioned(orders, "o_orderkey", path)
    return merge_partitioned(spark, updates, "o_orderkey", path)


@_register(
    "streaming_upsert_orders",
    """
    WITH upd AS (
      SELECT o_orderkey, 'U' AS o_orderstatus,
             o_totalprice * 0.9 AS o_totalprice
      FROM orders WHERE o_orderkey % 500 = 0
      UNION ALL
      SELECT -(o_orderkey + 1), 'N', 100.0
      FROM orders WHERE o_orderkey % 1000 = 0),
    merged AS (
      SELECT o_orderkey, o_orderstatus, o_totalprice
      FROM orders t
      WHERE NOT EXISTS (SELECT 1 FROM upd u WHERE u.o_orderkey = t.o_orderkey)
      UNION ALL
      SELECT o_orderkey, o_orderstatus, o_totalprice FROM upd)
    SELECT CAST(((o_orderkey % 16) + 16) % 16 AS INT) AS bucket,
           o_orderkey, o_orderstatus, o_totalprice
    FROM merged
    """,
    tags=("parity", "streaming", "upsert", "partitioned"),
    doc="Streaming CDC apply (streaming/cdc.py): the same delta as "
        "upsert_orders_partitioned delivered as a keyed change-STREAM "
        "(multiple micro-batches — maxFilesPerTrigger=1 over a "
        "several-file source) whose foreachBatch epoch body is the "
        "partition-pruned MERGE.  Each epoch scans and rewrites only "
        "the buckets its delta touches (tests/test_streaming_cdc.py "
        "asserts untouched partitions stay byte-identical per epoch); "
        "the final maintained table must equal the single batch MERGE "
        "— hence the shared oracle.  This is the reference's "
        "keyed-orders-topic semantics (latest record per key wins) "
        "landed as a maintained lake table.",
)
def q_streaming_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.upsert import write_partitioned
    from ..streaming.cdc import start_upsert_sink

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    updates = orders.filter(F.col("o_orderkey") % 500 == 0).select(
        "o_orderkey",
        F.lit("U").alias("o_orderstatus"),
        (F.col("o_totalprice") * 0.9).alias("o_totalprice"),
    ).unionByName(
        orders.filter(F.col("o_orderkey") % 1000 == 0).select(
            (-(F.col("o_orderkey") + 1)).alias("o_orderkey"),
            F.lit("N").alias("o_orderstatus"),
            F.lit(100.0).alias("o_totalprice"),
        )
    )
    base = tempfile.mkdtemp(prefix="kaop_cdc_")
    path, src, chk = f"{base}/orders", f"{base}/changes", f"{base}/chk"
    write_partitioned(orders, "o_orderkey", path)
    # Stage the delta as several files; maxFilesPerTrigger=1 turns each
    # into its own micro-batch so the sink genuinely merges epoch by
    # epoch.  Keys are unique across the delta, so the epoch split
    # cannot change the final table.
    updates.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    start_upsert_sink(stream, "o_orderkey", path, checkpoint=chk).awaitTermination()
    return spark.read.parquet(path)


@_register(
    "scd2_customer_dim",
    """
    WITH chg AS (
      SELECT c_custkey, c_mktsegment, c_acctbal + 100 AS c_acctbal,
             TIMESTAMP '1995-06-01' AS valid_from
      FROM customer WHERE c_custkey % 10 = 0)
    SELECT d.c_custkey, d.c_mktsegment, d.c_acctbal,
           TIMESTAMP '1990-01-01' AS valid_from,
           CASE WHEN c.c_custkey IS NOT NULL
                THEN TIMESTAMP '1995-06-01' END AS valid_to,
           c.c_custkey IS NULL AS is_current
    FROM customer d LEFT JOIN chg c USING (c_custkey)
    UNION ALL
    SELECT c_custkey, c_mktsegment, c_acctbal, valid_from,
           CAST(NULL AS TIMESTAMP) AS valid_to, TRUE AS is_current
    FROM chg
    """,
    tags=("olap", "scd2"),
    doc="Slowly-changing-dimension type 2 (operators/upsert.py "
        "scd2_apply): a change batch (10%% of customers, adjusted "
        "balance) closes each key's current row at the change "
        "timestamp and appends the new current version; the full "
        "versioned dimension is checked against a join+union oracle.",
)
def q_scd2_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.upsert import scd2_apply

    cust = load_table(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("1990-01-01 00:00:00").cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        F.lit("1995-06-01 00:00:00").cast("timestamp_ntz").alias("valid_from"),
    )
    return scd2_apply(dim, changes, key="c_custkey")


@_register(
    "streaming_scd2_customer_dim",
    QUERIES["scd2_customer_dim"].oracle,
    tags=("parity", "streaming", "scd2", "partitioned"),
    doc="Streaming SCD2 apply (streaming/cdc.py start_scd2_sink): the "
        "same change batch as scd2_customer_dim delivered as a "
        "multi-epoch keyed stream; each foreachBatch epoch closes its "
        "keys' current rows and appends the new versions via the "
        "partition-pruned scd2_apply_partitioned — only the changed "
        "keys' buckets rewrite (tests/test_streaming_cdc.py).  One "
        "change per key, so the final versioned dimension equals the "
        "single batch apply — hence the shared oracle.",
)
def q_streaming_scd2_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..operators.upsert import write_partitioned
    from ..streaming.cdc import start_scd2_sink

    cust = load_table(spark, sf_dir, "customer")
    dim = cust.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.lit("1990-01-01 00:00:00").cast("timestamp_ntz").alias("valid_from"),
        F.lit(None).cast("timestamp_ntz").alias("valid_to"),
        F.lit(True).alias("is_current"),
    )
    changes = cust.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal") + 100).alias("c_acctbal"),
        F.lit("1995-06-01 00:00:00").cast("timestamp_ntz").alias("valid_from"),
    )
    base = tempfile.mkdtemp(prefix="kaop_scd2_")
    path, src, chk = f"{base}/dim", f"{base}/changes", f"{base}/chk"
    write_partitioned(dim, "c_custkey", path)
    changes.repartition(4).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    start_scd2_sink(stream, "c_custkey", path, checkpoint=chk).awaitTermination()
    return spark.read.parquet(path).drop("bucket")


@_register(
    "runtime_filtered_join",
    """
    SELECT o.o_orderpriority AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE c.c_mktsegment = 'BUILDING' AND c.c_acctbal > 9000
    GROUP BY o.o_orderpriority
    """,
    tags=("olap", "join", "runtime-filter"),
    doc="Selective-dim fact join, the classic runtime-pruning shape: "
        "~2%% of customers survive the dim filter, so at 100 TB the "
        "orders scan should be pruned by a runtime filter built from "
        "the dim side (Spark's runtime bloom filter / DPP) instead of "
        "shuffling the whole fact table.  tests/test_runtime_filter.py "
        "asserts the bloom filter actually injects "
        "(BloomFilterMightContain in EXPLAIN) under shuffle-join "
        "conditions; under session defaults AQE broadcasts the tiny "
        "dim, which is the right plan at this SF.",
)
def q_runtime_filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .filter((F.col("c_mktsegment") == "BUILDING") & (F.col("c_acctbal") > 9000))
        .select("c_custkey")
    )
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count("*").alias("n_orders"),
            dec_sum("o_totalprice").alias("total_price"),
        )
    )


@_register(
    "doc_length_histogram",
    """
    SELECT CAST(floor(len(string_split(text, ' ')) / 10) * 10 AS BIGINT)
             AS token_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
    FROM documents GROUP BY 1
    """,
    tags=("m5", "curation", "histogram"),
    doc="Document-length histogram (10-token buckets) — the first plot "
        "of any corpus audit.  Pure map-side bucketing + one partial+ "
        "final count agg; output is bucket-count rows, never the docs.",
)
def q_doc_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    n = F.size(tokens("text")).cast("long")
    return (
        docs.select(
            (F.floor(n / 10) * 10).cast("bigint").alias("token_bucket"),
            n.alias("n_tokens"),
        )
        .groupBy("token_bucket")
        .agg(F.count("*").alias("n_docs"), F.sum("n_tokens").alias("total_tokens"))
    )


# ---------------------------------------------------------------------------
# BM25 retrieval scoring + hyperplane-LSH embedding near-dup (curation
# scale path; both deterministic by construction — rational idf / fixed
# sign matrix — so they carry full hash oracles).
# ---------------------------------------------------------------------------

_BM25_TERMS = ("join", "vector", "stream")


def _bm25_oracle(terms: tuple = _BM25_TERMS, topk: int = 20) -> str:
    in_list = ", ".join(f"'{t}'" for t in terms)
    w_cols = ",\n         ".join(
        f"SUM(CASE WHEN token = '{t}' THEN w END) AS w{i}"
        for i, t in enumerate(terms)
    )
    score = " + ".join(f"COALESCE(w{i}, 0.0)" for i in range(len(terms)))
    return f"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
    hits AS (SELECT doc_id, token FROM tok WHERE token IN ({in_list})),
    tf AS (SELECT doc_id, token, CAST(COUNT(*) AS DOUBLE) AS tf
           FROM hits GROUP BY doc_id, token),
    dfq AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
            FROM hits GROUP BY token),
    stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                     SUM(CAST(len(string_split(text, ' ')) AS DOUBLE)) / COUNT(*) AS avgdl
              FROM documents),
    dl AS (SELECT doc_id, CAST(len(string_split(text, ' ')) AS DOUBLE) AS dl
           FROM documents),
    w AS (
      SELECT tf.doc_id, tf.token,
             (stats.n_docs - dfq.df + 0.5) / (dfq.df + 0.5) * tf.tf * 2.2
               / (tf.tf + 1.2 * (0.25 + 0.75 * dl.dl / stats.avgdl)) AS w
      FROM tf JOIN dfq ON tf.token = dfq.token
              JOIN dl ON tf.doc_id = dl.doc_id
              CROSS JOIN stats),
    per AS (SELECT doc_id, {w_cols} FROM w GROUP BY doc_id),
    scored AS (SELECT doc_id, {score} AS bm25 FROM per),
    ranked AS (
      SELECT doc_id, bm25,
             CAST(ROW_NUMBER() OVER (ORDER BY bm25 DESC, doc_id) AS INTEGER) AS rank
      FROM scored)
    SELECT doc_id, bm25, rank FROM ranked WHERE rank <= {topk}
    """


@_register(
    "bm25_top20",
    _bm25_oracle(),
    tags=("m5", "text", "retrieval"),
    doc="BM25 relevance ranking for a fixed query-term set (k1=1.2, "
        "b=0.75) — the retrieval scorer a curation pipeline uses to "
        "mine topic-relevant docs.  idf keeps the rational core "
        "without the (monotone) log wrap and the per-doc score sums "
        "per-term contributions in fixed query order, so the result "
        "hash-matches cross-engine.",
)
def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.text import bm25_topk

    return bm25_topk(load_table(spark, sf_dir, "documents"), _BM25_TERMS)


def _hyperplane_oracle(
    bits: int = 32, band_rows: int = 8, dim: int = 64, threshold: float = 0.35
) -> str:
    from ..operators.similarity import hyperplane_matrix

    R = hyperplane_matrix(bits, dim)
    bit_exprs = ",\n             ".join(
        "CASE WHEN list_sum(list_transform(range(1, len(embedding) + 1), "
        f"i -> CAST(embedding[i] AS DOUBLE) * list_extract([{', '.join(str(v) for v in R[j])}], i))) >= 0 "
        f"THEN '1' ELSE '0' END AS b{j}"
        for j in range(bits)
    )
    band_selects = " UNION ALL ".join(
        f"SELECT vec_id, {bnum} AS band_id, "
        f"{'||'.join(f'b{bnum * band_rows + r}' for r in range(band_rows))} AS bv FROM s"
        for bnum in range(bits // band_rows)
    )
    return f"""
    WITH s AS (
      SELECT vec_id, embedding, norm, {bit_exprs}
      FROM (
        SELECT vec_id, embedding,
               sqrt(list_sum(list_transform(embedding,
                      x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
        FROM embeddings)
      WHERE norm > 0),
    bands AS ({band_selects}),
    sized AS (
      SELECT vec_id, band_id, bv,
             COUNT(*) OVER (PARTITION BY band_id, bv) AS bucket_n,
             MIN(vec_id) OVER (PARTITION BY band_id, bv) AS min_id
      FROM bands),
    pairs AS (
      SELECT DISTINCT doc_a, doc_b FROM (
        SELECT a.vec_id AS doc_a, b.vec_id AS doc_b
        FROM sized a JOIN sized b
          ON a.band_id = b.band_id AND a.bv = b.bv
         AND a.vec_id < b.vec_id
        WHERE a.bucket_n <= {_dedup.MAX_BUCKET_SIZE}
        UNION ALL
        SELECT min_id, vec_id FROM sized
        WHERE bucket_n > {_dedup.MAX_BUCKET_SIZE} AND vec_id != min_id)),
    scored AS (
      SELECT p.doc_a AS vec_a, p.doc_b AS vec_b,
             list_sum(list_transform(range(1, len(a.embedding) + 1),
                    i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
               / (a.norm * b.norm) AS cosine
      FROM pairs p JOIN s a ON a.vec_id = p.doc_a JOIN s b ON b.vec_id = p.doc_b)
    SELECT vec_a, vec_b, cosine FROM scored WHERE cosine >= {threshold}
    """


@_register(
    "embedding_lsh_near_dup",
    _hyperplane_oracle(),
    tags=("m5", "dedup", "similarity"),
    doc="Tokenless embedding near-dup via random-hyperplane LSH "
        "(Charikar '02): 32 sign bits from fixed +-1 hyperplanes, 4x8 "
        "banding, hot-bucket star cap shared with minhash, exact cosine "
        "verify on candidates only.  The no-metadata scale path "
        "complementing embedding_near_dup's label blocking.",
)
def q_embedding_lsh_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import embedding_lsh_near_dup

    return embedding_lsh_near_dup(load_table(spark, sf_dir, "embeddings"))


def _kmeans_oracle(k: int = 8, iters: int = 2) -> str:
    """Unrolled Lloyd rounds as one CTE chain — every float op mirrors
    kmeans_refine exactly (see its determinism contract).  Per-(cell,
    dim) means use the same order-free 2^52-scaled DECIMAL(38,0) sum
    as the operator: exact and associative in both engines, unlike a
    double SUM (order-dependent) or a DECIMAL(38,18) cast (DuckDB's
    double->decimal conversion is float-rounded and mismatches
    Spark's)."""
    ctes = [
        """n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      FROM embeddings)""",
        """e AS (
      SELECT vec_id, t.i AS dim, CAST(embedding[t.i] AS DOUBLE) AS x
      FROM embeddings, UNNEST(range(1, len(embedding) + 1)) AS t(i))""",
        f"""c0 AS (
      SELECT vec_id AS cell_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cent,
             norm AS cn
      FROM n WHERE vec_id < {k})""",
    ]
    for i in range(iters):
        ctes.append(f"""s{i} AS (
      SELECT n.vec_id, c.cell_id,
             list_sum(list_transform(range(1, len(n.embedding) + 1),
                    j -> CAST(n.embedding[j] AS DOUBLE) * c.cent[j]))
               / (n.norm * c.cn) AS sim
      FROM n CROSS JOIN c{i} c)""")
        ctes.append(f"""a{i} AS (
      SELECT vec_id, cell_id FROM (
        SELECT vec_id, cell_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                      ORDER BY sim DESC, cell_id) AS rn
        FROM s{i}) WHERE rn = 1)""")
        ctes.append(f"""m{i} AS (
      SELECT a.cell_id, e.dim,
             CAST(SUM(CAST(e.x * {_sim.MEAN_SCALE} AS DECIMAL(38,0))) AS DOUBLE)
               / (COUNT(*) * {_sim.MEAN_SCALE}.0) AS mean,
             COUNT(*) AS n
      FROM a{i} a JOIN e ON a.vec_id = e.vec_id
      GROUP BY a.cell_id, e.dim)""")
        ctes.append(f"""c{i + 1} AS (
      SELECT cell_id,
             list(mean ORDER BY dim) AS cent,
             sqrt(list_sum(list_transform(list(mean ORDER BY dim),
                    x -> x * x))) AS cn,
             MAX(n) AS n_members
      FROM m{i} GROUP BY cell_id)""")
    return (
        "\n    WITH "
        + ",\n    ".join(ctes)
        + f"""
    SELECT cell_id, n_members, cn AS centroid_norm,
           list_sum(cent) AS centroid_sum
    FROM c{iters}
    """
    )


@_register(
    "ivf_kmeans_refine",
    _kmeans_oracle(),
    tags=("m5", "similarity", "iterative"),
    doc="IVF centroid TRAINING: 2 spherical-k-means Lloyd rounds "
        "(cosine argmax assign -> per-cell mean) from the vec_id<8 "
        "seeds the static IVF queries use.  Per-(cell,dim) means fold "
        "members in vec_id order so the oracle reproduces every bit; "
        "output digests (norm/sum per refined centroid) cover all "
        "components.  The iterative-DataFrame pattern: broadcast "
        "assign + keyed agg per round, lineage cut per round.",
)
def q_ivf_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import kmeans_refine

    return kmeans_refine(load_table(spark, sf_dir, "embeddings"))


@_register(
    "streaming_kmeans_refine",
    _kmeans_oracle(),
    tags=("m5", "similarity", "streaming", "iterative"),
    doc="Streaming twin of ivf_kmeans_refine, SAME oracle: each Lloyd "
        "round is a bounded streaming drain — vectors arrive as a "
        "stream, assignment is an argmax over k centroid literals "
        "baked into the plan (no window, no join — streaming-safe), "
        "and per-(cell,dim) means accumulate as 2^52-scaled "
        "DECIMAL(38,0) streaming aggregation state.  Decimal "
        "associativity makes the result independent of micro-batch "
        "boundaries (tests/test_streaming_kmeans.py re-drains under a "
        "different file split), so the streaming path provably "
        "computes the batch answer bit-for-bit.",
)
def q_streaming_kmeans_refine(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..streaming.kmeans import streaming_kmeans_refine

    return streaming_kmeans_refine(spark, sf_dir)


@_register(
    "semantic_dedup",
    """
    WITH n AS (
      SELECT vec_id, embedding,
             sqrt(list_sum(list_transform(embedding,
                    x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) AS norm
      FROM embeddings),
    c AS (SELECT vec_id AS centroid_id, embedding AS ce, norm AS cn
          FROM n WHERE vec_id < 8),
    scored AS (
      SELECT v.vec_id, c.centroid_id,
             list_sum(list_transform(range(1, len(v.embedding) + 1),
                    i -> CAST(v.embedding[i] AS DOUBLE) * CAST(c.ce[i] AS DOUBLE)))
               / (v.norm * c.cn) AS sim
      FROM n v, c),
    assigned AS (
      SELECT vec_id, centroid_id AS cell_id FROM (
        SELECT vec_id, centroid_id,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                                  ORDER BY sim DESC, centroid_id) AS rn
        FROM scored) WHERE rn = 1),
    dropped AS (
      SELECT DISTINCT aa.cell_id, bb.vec_id AS ib
      FROM assigned aa
      JOIN assigned bb ON aa.cell_id = bb.cell_id AND aa.vec_id < bb.vec_id
      JOIN n a ON a.vec_id = aa.vec_id
      JOIN n b ON b.vec_id = bb.vec_id
      WHERE list_sum(list_transform(range(1, len(a.embedding) + 1),
              i -> CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)))
              / (a.norm * b.norm) >= 0.35)
    SELECT m.cell_id,
           COUNT(*) AS n_members,
           COALESCE(MAX(d.n_dropped), 0) AS n_dropped,
           CAST(COALESCE(MAX(d.dropped_id_sum), 0) AS BIGINT) AS dropped_id_sum
    FROM assigned m
    LEFT JOIN (SELECT cell_id, COUNT(*) AS n_dropped,
                      SUM(ib) AS dropped_id_sum
               FROM dropped GROUP BY cell_id) d
      ON m.cell_id = d.cell_id
    GROUP BY m.cell_id
    """,
    tags=("m5", "dedup", "similarity"),
    doc="Cluster-then-prune semantic dedup (the SemDeDup shape, Abbas "
        "et al. '23): embeddings assign to their nearest of 8 IVF "
        "seed centroids (same deterministic cosine-argmax assignment "
        "as ivf_cell_sizes), and near-dup pruning runs pairwise ONLY "
        "within each cell — the clustering turns brute-force semantic "
        "dedup's corpus-quadratic comparison into cell-quadratic, "
        "which is the published algorithm's entire scale argument.  A "
        "vector drops when a lower-id cell peer is within cosine "
        "0.35 (the monotone higher-id-drops rule all dedup operators "
        "here share).  Output per cell: member count, dropped count, "
        "dropped-id sum — an all-integer digest pinning exact "
        "dropped-set membership.",
)
def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.similarity import semantic_dedup

    return semantic_dedup(load_table(spark, sf_dir, "embeddings"))


@_register(
    "training_order_shuffle",
    """
    WITH h AS (
      SELECT doc_id,
             md5(CONCAT('epoch7:', CAST(doc_id AS VARCHAR))) AS shuffle_key
      FROM documents)
    SELECT substring(shuffle_key, 1, 2) AS bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS doc_id_sum,
           MIN_BY(doc_id, shuffle_key) AS first_doc_id,
           MIN(shuffle_key) AS first_key
    FROM h
    GROUP BY 1
    """,
    tags=("m5", "text", "ordering"),
    doc="Deterministic epoch shuffling — the data-ORDERING step of a "
        "training pipeline (every epoch must visit the corpus in a "
        "different but REPRODUCIBLE pseudo-random order, identical "
        "across engines, reruns, and partitionings): shuffle key = "
        "md5(seed:doc_id), global order = ORDER BY key, realized at "
        "scale as a write-time repartitionByRange on the key (range "
        "boundaries = the shuffle buckets) with an in-partition sort "
        "— one shuffle, no global single-partition sort.  The query "
        "pins the key function and the induced order cross-engine: "
        "per key-prefix bucket, the doc count, id sum, and the FIRST "
        "doc in shuffle order (min_by) must match the oracle exactly "
        "— a different md5, collation, or tie-break anywhere shows "
        "up as a hash mismatch.",
)
def q_training_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("epoch7:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
    )
    return (
        h.groupBy(F.substring("shuffle_key", 1, 2).alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("doc_id").alias("doc_id_sum"),
            F.min_by("doc_id", "shuffle_key").alias("first_doc_id"),
            F.min("shuffle_key").alias("first_key"),
        )
    )


@_register(
    "avro_stream_stats_filter",
    f"""
    SELECT event_type,
           COUNT(*) AS n_events,
           {_dsum('value')} AS total_value
    FROM events
    WHERE value < 10.0
    GROUP BY event_type
    """,
    tags=("source", "avro", "datasource", "streaming", "stats-pruning"),
    doc="Static predicate FILE SKIPPING on the kaop_avro STREAM "
        "reader (sources/avro_ocf.py statsFilter): Python stream "
        "sources have no pushFilters hook, so a long-lived ingestion "
        "query that only wants a slice of the landing data declares "
        "it as a statsFilter option — each micro-batch drops newly "
        "landed parts whose per-part stats prove no row matches, "
        "before any byte of them is read (manifest stats on URI "
        "dirs, ranged header probes locally; pruned names still "
        "enter the offset so retention retires them).  The landing "
        "data is laid down with write_avro_clustered — range-"
        "clustered parts with in-part sort, the layout that makes "
        "min/max pruning effective at 100 TB — and the drain is "
        "BOOBY-TRAPPED like its batch twin: a planted part whose "
        "stats claim a disjoint value range has a corrupt body, so "
        "if the stream ever opens it the drain raises and this row "
        "goes red.  The query re-applies the predicate row-level "
        "(statsFilter is IO reduction, not row filtering — same "
        "contract as Spark re-checking pushed filters above a scan).",
)
def q_avro_stream_stats_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    import tempfile

    from ..sources.avro_ocf import (
        _list_avro,
        _stats_meta,
        ocf_bytes,
        parse_ocf,
        write_avro_clustered,
    )
    from ..sources.avro_ocf import register as _reg_avro

    _reg_avro(spark)
    base = tempfile.mkdtemp(prefix="kaop_ocf_sfilter_")
    land, chk, out = f"{base}/land", f"{base}/chk", f"{base}/out"
    cols = ["event_id", "event_type", "value"]
    write_avro_clustered(
        load_table(spark, sf_dir, "events").select(*cols),
        land, ["value"], num_parts=8,
    )
    # booby trap: stats disjoint from the statsFilter, corrupt body,
    # name sorted past every real part
    first = _list_avro(land)[0]
    with open(first, "rb") as fh:
        pschema, _ = parse_ocf(fh.read())
    prec = [{"event_id": -1, "event_type": "poison", "value": 9.9e9}]
    raw = ocf_bytes(prec, pschema, extra_meta=_stats_meta(prec, cols))
    with open(f"{land}/part-zz-poison.avro", "wb") as f:
        f.write(raw[:-16] + bytes(16))  # break the trailing sync marker
    q = (
        spark.readStream.format("kaop_avro")
        .option("path", land)
        .option("statsFilter", '[["value","<",10.0]]')
        .load()
        .filter(F.col("value") < 10.0)  # row-level re-check is ours
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return (
        spark.read.parquet(out)
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n_events"),
            dec_sum("value").alias("total_value"),
        )
    )


@_register(
    "stratified_sample",
    """
    WITH ranked AS (
      SELECT source, lang, doc_id,
             md5(CONCAT('strat7:', CAST(doc_id AS VARCHAR))) AS h,
             ROW_NUMBER() OVER (
               PARTITION BY source, lang
               ORDER BY md5(CONCAT('strat7:', CAST(doc_id AS VARCHAR)))
             ) AS rn,
             COUNT(*) OVER (PARTITION BY source, lang) AS n_stratum
      FROM documents)
    SELECT source, lang,
           MAX(n_stratum) AS n_docs,
           COUNT(*) AS n_sampled,
           CAST(SUM(doc_id) AS BIGINT) AS sampled_id_sum,
           MIN_BY(doc_id, h) AS first_doc_id
    FROM ranked
    WHERE rn <= CAST(ceil(0.1 * n_stratum) AS BIGINT)
    GROUP BY source, lang
    """,
    tags=("m5", "curation", "sampling"),
    doc="EXACT-quota stratified sampling — the complement of the "
        "rate-based domain_mixture_sample: every (source, lang) "
        "stratum contributes EXACTLY ceil(10% of its size) documents "
        "(rate sampling only hits the target in expectation; eval "
        "splits and ablation subsets need exact counts), chosen "
        "deterministically as the stratum's first documents in "
        "md5(salt:doc_id) order — reproducible across engines, "
        "reruns, and partitionings, no RNG state.  Scale shape: one "
        "hash projection, one window over the stratum key (single "
        "shuffle, skew bounded by the largest stratum — strata are "
        "(source, lang) buckets, naturally bounded), no collect.  "
        "The digest pins the exact membership: per stratum the "
        "sampled count, sampled id-sum, and the hash-first document "
        "must all match the oracle.",
)
def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    h = docs.select(
        "source", "lang", "doc_id",
        F.md5(F.concat(F.lit("strat7:"), F.col("doc_id").cast("string"))).alias("h"),
    )
    w = Window.partitionBy("source", "lang")
    ranked = h.select(
        "*",
        F.row_number().over(w.orderBy("h")).alias("rn"),
        F.count("*").over(w).alias("n_stratum"),
    )
    return (
        ranked.filter(F.col("rn") <= F.ceil(0.1 * F.col("n_stratum")))
        .groupBy("source", "lang")
        .agg(
            F.max("n_stratum").alias("n_docs"),
            F.count("*").alias("n_sampled"),
            F.sum("doc_id").alias("sampled_id_sum"),
            F.min_by("doc_id", "h").alias("first_doc_id"),
        )
    )


def _quality_sql(alias: str = "q") -> str:
    """The quality_scores score expression as a reusable CTE body."""
    return f"""
    {alias} AS (
      SELECT doc_id,
             0.5 * (CAST(len(list_distinct(toks)) AS DOUBLE) / CAST(len(toks) AS DOUBLE))
               + 0.5 * (1.0 - CAST(len(list_filter(toks, x -> list_contains([{_STOP_ARR}], x))) AS DOUBLE)
                              / CAST(len(toks) AS DOUBLE)) AS quality
      FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
    )"""


@_register(
    "dedup_keep_best",
    f"""
    WITH RECURSIVE pairs AS (
      SELECT doc_a, doc_b FROM ({_minhash_oracle()}) WHERE jaccard >= 0.5
    ), edges AS (
      SELECT doc_a AS a, doc_b AS b FROM pairs
      UNION SELECT doc_b, doc_a FROM pairs
    ), reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
    ), canon AS (
      SELECT a AS doc_id, LEAST(a, MIN(b)) AS canonical_id
      FROM reach GROUP BY a
    ), {_quality_sql()}
    , membership AS (
      SELECT d.doc_id,
             COALESCE(c.canonical_id, d.doc_id) AS cluster_id,
             q.quality
      FROM documents d
      LEFT JOIN canon c ON d.doc_id = c.doc_id
      JOIN q ON d.doc_id = q.doc_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY cluster_id ORDER BY quality DESC, doc_id
      ) AS rn
      FROM membership
    )
    SELECT cluster_id,
           COUNT(*) AS n_members,
           MAX(CASE WHEN rn = 1 THEN doc_id END) AS kept_doc_id,
           MAX(CASE WHEN rn = 1 THEN quality END) AS kept_quality,
           CAST(COALESCE(SUM(CASE WHEN rn > 1 THEN doc_id END), 0) AS BIGINT)
             AS dropped_id_sum
    FROM ranked GROUP BY cluster_id
    """,
    tags=("m5", "dedup", "curation"),
    doc="Canonical-document selection — the step AFTER near-dup "
        "clustering in a real curation pipeline: within each near-dup "
        "cluster keep the HIGHEST-QUALITY member (not the arbitrary "
        "min-id one), drop the rest.  Composes three registered "
        "operators end-to-end: MinHash-LSH verified pairs -> "
        "connected components -> quality_scores ranking, with "
        "singleton docs forming their own clusters.  Scale shape: the "
        "pair graph is orders of magnitude smaller than the corpus, "
        "so components run on pairs only and the doc->cluster label "
        "map broadcasts back onto the corpus (no corpus-sized "
        "shuffle for the join); canonical selection is one window "
        "shuffle on cluster_id (skew bounded by the largest cluster) "
        "— deterministic tie-break (quality DESC, doc_id ASC) keeps "
        "the kept-set reproducible across engines and reruns.  The "
        "digest pins exact membership AND the keep choice: per "
        "cluster the member count, kept doc, its quality, and the "
        "dropped-id sum must all match.",
)
def q_dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from ..operators.graph import connected_components
    from ..operators.text import quality_score

    docs = load_table(spark, sf_dir, "documents")
    pairs = _dedup.near_dup_pairs(docs).filter(F.col("jaccard") >= 0.5)
    comps = connected_components(pairs, src="doc_a", dst="doc_b")
    labels = comps.select(
        F.col("node").alias("doc_id"), F.col("component").alias("cluster_id")
    )
    membership = (
        quality_score(docs)
        .select("doc_id", "quality")
        .join(F.broadcast(labels), "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("cluster_id", "doc_id").alias("cluster_id"),
            "quality",
        )
    )
    ranked = membership.select(
        "*",
        F.row_number()
        .over(
            Window.partitionBy("cluster_id").orderBy(
                F.col("quality").desc(), F.col("doc_id")
            )
        )
        .alias("rn"),
    )
    return ranked.groupBy("cluster_id").agg(
        F.count("*").alias("n_members"),
        F.max(F.when(F.col("rn") == 1, F.col("doc_id"))).alias("kept_doc_id"),
        F.max(F.when(F.col("rn") == 1, F.col("quality"))).alias("kept_quality"),
        F.coalesce(
            F.sum(F.when(F.col("rn") > 1, F.col("doc_id"))), F.lit(0)
        ).cast("long").alias("dropped_id_sum"),
    )


@_register(
    "fuzzy_part_links",
    f"""
    WITH b AS (
      SELECT p_partkey AS rid, p_name AS rtext,
             split_part(p_name, ' ', 2) || '|' || p_brand AS blk
      FROM part),
    sizes AS (SELECT blk, COUNT(*) AS n FROM b GROUP BY blk),
    ok AS (SELECT b.* FROM b JOIN sizes s
           ON s.blk = b.blk AND s.n <= {MAX_FUZZY_BLOCK_SQL}),
    scored AS (
      SELECT a.rid, c.rid AS cid, c.rtext AS ctext,
             levenshtein(a.rtext, c.rtext) AS distance
      FROM ok a JOIN ok c ON a.blk = c.blk AND a.rid <> c.rid
      WHERE levenshtein(a.rtext, c.rtext) <= 4)
    SELECT rid AS p_partkey, cid AS match_id, ctext AS match_text,
           CAST(distance AS INTEGER) AS distance
    FROM (SELECT rid, cid, ctext, distance,
                 ROW_NUMBER() OVER (PARTITION BY rid
                                    ORDER BY distance, cid) AS rn
          FROM scored)
    WHERE rn = 1
    """,
    tags=("m5", "linkage", "fuzzy"),
    doc="Record linkage by blocked edit-distance matching "
        "(operators/fuzzy.py): every part's nearest other part by "
        "Levenshtein distance within its (category-token, brand) "
        "block, threshold 4, ties on the smallest candidate id — the "
        "catalog-dedup / entity-resolution primitive the LLM-corpus "
        "dedup family lacks (MinHash and SimHash find token-overlap "
        "duplicates; edit distance finds TYPO-class near-identity).  "
        "Blocking keeps the comparison count sum-of-block-squares "
        "instead of corpus-squared, oversized blocks (> "
        "1000 members) are skipped deterministically on both engines, "
        "and the levenshtein filter runs JVM-side.  The blocking-key "
        "granularity is the 100 TB scale knob.",
)
def q_fuzzy_part_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.fuzzy import fuzzy_best_match

    part = load_table(spark, sf_dir, "part")
    blk = F.concat(
        F.split(F.col("p_name"), " ").getItem(1), F.lit("|"), F.col("p_brand")
    )
    return fuzzy_best_match(
        part, blk, id_col="p_partkey", text_col="p_name", max_distance=4
    )


@_register(
    "qty_price_rank_corr",
    """
    WITH xy AS (
      SELECT l_returnflag,
             CAST(l_quantity AS BIGINT) AS x,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                  AS BIGINT) AS y
      FROM lineitem),
    ranked AS (
      SELECT l_returnflag,
             2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY x)
               + COUNT(*) OVER (PARTITION BY l_returnflag, x) - 1 AS rx,
             2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY y)
               + COUNT(*) OVER (PARTITION BY l_returnflag, y) - 1 AS ry
      FROM xy),
    mo AS (
      -- squared-rank sums accumulate in DECIMAL (4n^3 passes a BIGINT
      -- only to ~1.3e6-row groups; the widen-then-narrow pattern of
      -- _qpc_moments holds to ~1.3e9 rows per group)
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(rx) AS BIGINT) AS sx,
             CAST(SUM(ry) AS BIGINT) AS sy,
             CAST(SUM(CAST(rx AS DECIMAL(19,0)) * CAST(rx AS DECIMAL(19,0)))
                  AS DECIMAL(28,0)) AS sxx,
             CAST(SUM(CAST(rx AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0)))
                  AS DECIMAL(28,0)) AS sxy,
             CAST(SUM(CAST(ry AS DECIMAL(19,0)) * CAST(ry AS DECIMAL(19,0)))
                  AS DECIMAL(28,0)) AS syy
      FROM ranked GROUP BY l_returnflag)
    SELECT l_returnflag,
           CAST(n AS BIGINT) AS n_items,
           CASE WHEN CAST(n AS DECIMAL(10,0)) * CAST(sxx AS DECIMAL(28,0))
                     - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0)) <> 0
                 AND CAST(n AS DECIMAL(10,0)) * CAST(syy AS DECIMAL(28,0))
                     - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0)) <> 0
                THEN CAST(CAST(n AS DECIMAL(10,0)) * CAST(sxy AS DECIMAL(28,0))
                          - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                          AS DOUBLE)
                     / sqrt(
                         CAST(CAST(n AS DECIMAL(10,0)) * CAST(sxx AS DECIMAL(28,0))
                              - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
                              AS DOUBLE)
                         * CAST(CAST(n AS DECIMAL(10,0)) * CAST(syy AS DECIMAL(28,0))
                              - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                              AS DOUBLE))
                ELSE NULL
           END AS spearman_rho
    FROM mo
    """,
    tags=("m5", "statistics", "window"),
    doc="Grouped Spearman rank correlation — the NONPARAMETRIC twin of "
        "quantity_price_correlation (Pearson measures linear "
        "association; Spearman measures monotone association and is "
        "robust to the heavy-tailed price outliers a real revenue "
        "column has).  Ties carry AVERAGE ranks (the statistically "
        "standard treatment), DOUBLED so every rank stays an exact "
        "integer: R = 2*RANK() + tie_count - 1 depends only on the "
        "value multiset — deterministic in both engines with NO "
        "unique-key assumption (the synthetic lineitem has duplicate "
        "(orderkey, linenumber) pairs, so a row-number tiebreak would "
        "NOT be a total order; found by the three-SF parity drive).  "
        "rho is then Pearson over the integer rank pairs via the same "
        "exact-moment decimal algebra as _qpc_assemble (scaling both "
        "ranks by 2 cancels), NULL on zero-variance groups.  Shape: "
        "two sort windows partitioned by the group key + one keyed "
        "integer aggregate; no global sort anywhere.",
)
def q_qty_price_rank_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    xy = li.select(
        "l_returnflag",
        F.col("l_quantity").cast("long").alias("x"),
        (F.col("l_extendedprice").cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("y"),
    )
    rx = (
        F.lit(2) * F.rank().over(Window.partitionBy("l_returnflag").orderBy("x"))
        + F.count("*").over(Window.partitionBy("l_returnflag", "x"))
        - F.lit(1)
    ).cast("long")
    ry = (
        F.lit(2) * F.rank().over(Window.partitionBy("l_returnflag").orderBy("y"))
        + F.count("*").over(Window.partitionBy("l_returnflag", "y"))
        - F.lit(1)
    ).cast("long")
    ranked = xy.select("l_returnflag", rx.alias("rx"), ry.alias("ry"))
    rxd = F.col("rx").cast("decimal(19,0)")
    ryd = F.col("ry").cast("decimal(19,0)")
    # squared-rank sums in DECIMAL: a BIGINT holds 4n^3 only to
    # ~1.3e6-row groups; decimal accumulation (the _qpc_moments
    # widen-then-narrow pattern) extends the envelope to ~1.3e9.
    mo = ranked.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.sum("rx").cast("long").alias("sx"),
        F.sum("ry").cast("long").alias("sy"),
        F.sum(rxd * rxd).cast("decimal(28,0)").alias("sxx"),
        F.sum(rxd * ryd).cast("decimal(28,0)").alias("sxy"),
        F.sum(ryd * ryd).cast("decimal(28,0)").alias("syy"),
    )
    dn = F.col("n").cast("decimal(10,0)")
    num = dn * F.col("sxy").cast("decimal(28,0)") - F.col("sx").cast(
        "decimal(19,0)"
    ) * F.col("sy").cast("decimal(19,0)")
    varx = dn * F.col("sxx").cast("decimal(28,0)") - F.col("sx").cast(
        "decimal(19,0)"
    ) * F.col("sx").cast("decimal(19,0)")
    vary = dn * F.col("syy").cast("decimal(28,0)") - F.col("sy").cast(
        "decimal(19,0)"
    ) * F.col("sy").cast("decimal(19,0)")
    return mo.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n_items"),
        F.when(
            (varx != 0) & (vary != 0),
            num.cast("double")
            / F.sqrt(varx.cast("double") * vary.cast("double")),
        ).alias("spearman_rho"),
    )


@_register(
    "setsim_doc_pairs",
    """
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    sh AS (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(t) >= 3
        THEN list_transform(range(1, len(t) - 1),
            i -> concat_ws(' ', t[i], t[i+1], t[i+2]))
        ELSE [] END)) AS shingle
      FROM toks),
    freq AS (SELECT shingle, COUNT(*) AS f FROM sh GROUP BY shingle),
    sized AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    ordered AS (
      SELECT s.doc_id, s.shingle, z.sz,
             ROW_NUMBER() OVER (PARTITION BY s.doc_id
                                ORDER BY q.f, s.shingle) AS pos
      FROM sh s JOIN freq q ON q.shingle = s.shingle
      JOIN sized z ON z.doc_id = s.doc_id),
    prefix AS (
      -- L = sz - ceil(sz/2) + 1 via the portable exact floor-division
      -- idiom on (sz + 1)
      SELECT doc_id, shingle FROM ordered
      WHERE pos <= sz
                   - CAST(((sz + 1) - (sz + 1) % 2) / 2 AS BIGINT)
                   + 1),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM prefix a JOIN prefix b
        ON a.shingle = b.shingle AND a.doc_id < b.doc_id),
    inter AS (
      SELECT c.doc_a, c.doc_b, COUNT(*) AS n_common
      FROM cand c
      JOIN sh ta ON ta.doc_id = c.doc_a
      JOIN sh tb ON tb.doc_id = c.doc_b AND tb.shingle = ta.shingle
      GROUP BY c.doc_a, c.doc_b)
    SELECT i.doc_a, i.doc_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST(sa.sz AS BIGINT) AS size_a,
           CAST(sb.sz AS BIGINT) AS size_b
    FROM inter i
    JOIN sized sa ON sa.doc_id = i.doc_a
    JOIN sized sb ON sb.doc_id = i.doc_b
    WHERE 3 * i.n_common >= sa.sz + sb.sz
    """,
    tags=("m5", "dedup", "similarity"),
    doc="EXACT Jaccard >= 1/2 shingle-set self-join via prefix "
        "filtering (operators/dedup.set_similarity_join — the "
        "AllPairs/SSJoin family, Bayardo et al. WWW'07): docs order "
        "their 3-gram shingles rarest-global-df-first, and a "
        "qualifying pair must share a token inside each other's "
        "(sz - ceil(t*sz) + 1)-length prefix, so candidates join only "
        "on rare tokens instead of all pairs — the exact complement "
        "to the MinHash-LSH path, which buys speed with false "
        "negatives.  Verification is the all-integer inequality "
        "3*|intersection| >= |a| + |b| (Jaccard >= 1/2, zero "
        "floats).  Same shingle semantics as near_dup_pairs, so the "
        "two paths are directly comparable on recall.",
)
def q_setsim_doc_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import set_similarity_join

    return set_similarity_join(load_table(spark, sf_dir, "documents"))


@_register(
    "ccnet_buckets",
    """
    WITH r AS (
      SELECT doc_id,
             RANK() OVER (PARTITION BY lang
                          ORDER BY CAST(n_chars AS DOUBLE)) AS rk,
             COUNT(*) OVER (PARTITION BY lang, n_chars) AS c,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM documents
    ),
    p AS (
      SELECT doc_id,
             CAST(2*rk + c - 1 AS DOUBLE) / CAST(2*n AS DOUBLE) AS pct
      FROM r
    )
    SELECT doc_id, pct,
           CASE WHEN pct <= CAST(1.0 AS DOUBLE) / 3.0 THEN 'head'
                WHEN pct <= 2.0 * CAST(1.0 AS DOUBLE) / 3.0 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM p
    """,
    tags=("m5", "lm", "quality"),
    doc="CCNet head/middle/tail bucketing (Wenzek et al. LREC 2020, "
        "operators/lm.ccnet_buckets): per-language midrank percentile "
        "of the quality score — here n_chars as the stand-in ppl "
        "column — split at the published third edges.  pct is the "
        "exact rational (2*rk + c - 1) / (2n) in both engines (the "
        "eval-engine midrank algebra — tie groups share one midrank, "
        "so a tie never straddles an edge); the streaming twin "
        "(streaming/lm.streaming_ccnet_buckets) freezes the split as "
        "per-group cutoffs for ingest.  One shuffle on the group key; "
        "no SinglePartition anywhere.",
)
def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.lm import ccnet_buckets

    docs = load_table(spark, sf_dir, "documents")
    return ccnet_buckets(
        docs.selectExpr("doc_id", "lang", "CAST(n_chars AS DOUBLE) AS ppl"),
        "ppl",
        group_col="lang",
    ).select("doc_id", "pct", "bucket")


#: Names removed from the registry with a window audit (r9 verdict
#: task 2 — the 3x50 rotation saturation fix).  Each had driver-green
#: CORRECTNESS rows; the ledger keeps tests/test_rotation_window.py's
#: rule 1 honest (a checked name may only disappear through HERE).
#: name -> audit note (round retired, what subsumes it, last green)
RETIRED: dict[str, str] = {
    "deterministic_sample": (
        "r10: subsumed by dataset_split_counts — the identical salted-"
        "md5 hash-bucket mechanism (same _HASH_BUCKET expression, same "
        "'split:' salt); the split query demonstrates bucket<204/230 "
        "CASE routing, the sample was the degenerate bucket<26 filter "
        "of the same expression.  Last driver-green r7; operator "
        "surface kept via operators/splits.py + dataset_split_counts."
    ),
    "ngram_jaccard_adjacent": (
        "r10: subsumed by setsim_doc_pairs — exact word-3-gram Jaccard "
        "over ALL qualifying pairs via AllPairs prefix filtering "
        "(Bayardo et al.), strictly stronger than the adjacent-id pair "
        "restriction this query used to keep the demo join tiny; the "
        "shared shingle semantics live in operators/dedup.shingle_sets "
        "(still exercised by near_dup_pairs and the LSH family).  "
        "Last driver-green r9."
    ),
    "customers_no_pending_orders": (
        "r11: subsumed by customers_with_pending_orders — the IDENTICAL "
        "two-table plan (customer x status-filtered orders, same key, "
        "same pushed build-side filter) with only the join type flipped "
        "semi -> anti, so the pair demonstrated one mechanism twice; "
        "the LEFT ANTI physical operator itself stays driver-checked "
        "through churned_users (EXCEPT == left_anti over distinct, "
        "checked every r8-window round).  Freed slot staged for "
        "window_funnel (plans/promotions_r12.py).  Last driver-green r9."
    ),
}


# ---------------------------------------------------------------------------
# Registry ordering.  The driver's correctness harness checks queries in
# registration order and caps the run at 50 (measured in rounds 1-2).
# Round-3 rotation policy: (1) queries that have NEVER been
# driver-checked, (2) queries whose plan changed this round (highest
# regression risk), (3) the stalest names — those whose only green
# CORRECTNESS row is from round 1 — oldest-coverage-first.  Seven
# low-risk round-1-green names (simple single-table plans, code
# untouched since round 1) sit just past the cap and lead the round-4
# rotation; every round-2-green name keeps a row at most 2 rounds old.
# ---------------------------------------------------------------------------

_LEAD_ORDER = [
    # -- ROUND-14 window (exactly 50 names precede the boundary).
    # Built per the r13 verdict's task 3 / HANDOFF "READ THIS FIRST":
    # after the r13 check the oldest rows anywhere are the 50
    # r11-window names (latest CORRECTNESS row = r11, recomputed from
    # the CORRECTNESS_r01..r13 union at round-14 start: exactly 50 —
    # the only older "latest" rows are the 3 audited RETIRED names),
    # age 2 during round 14 — their age-3 deadline is THIS round.
    # The registry sits at 150 = 3x50 saturation, so the window is
    # EXACTLY those 50 in registration order: zero fills, zero
    # promotions (any NEW name must first displace an existing one
    # via the audited RETIRED ledger).
    "product_stats_snapshot", "running_avg", "validated_orders",
    "rejected_orders", "error_classification", "dlq_error_stats",
    "pricing_summary", "top_customers", "revenue_by_region",
    "order_priority_counts", "top3_events_per_type", "events_hourly",
    "user_sessions", "doc_token_stats", "token_counts_top20",
    "language_id", "quality_scores", "doc_fingerprints", "dedup_exact",
    "embedding_topk", "multimodal_meta", "streaming_product_stats",
    "streaming_product_stats_update", "asof_purchase_click",
    "region_nation_rollup", "priority_status_cube",
    "daily_event_type_pivot", "events_sliding_30m", "churned_users",
    "ivf_cell_sizes", "avro_ocf_roundtrip", "priority_line_revenue",
    "streaming_running_avg_per_record", "streaming_user_sessions",
    "tfidf_top_terms", "priority_code_extract", "orders_by_month",
    "salted_product_stats", "streaming_watermarked_windows",
    "value_distribution_ranks", "user_funnel", "value_bounds",
    "dedup_clusters", "daily_events_unpivot", "sequence_packing",
    "streaming_incremental_dedup", "streaming_static_enrich",
    "upsert_orders", "runtime_filtered_join", "ivf_kmeans_refine",
    # --- position 50 boundary ---------------------------------------
    # ROUND-15 MATH: after the r14 check the oldest rows anywhere are
    # the 50 r12-window names (latest CORRECTNESS row = r12), age 2
    # during round 15 — they are r15's deadline set, ZERO free slots
    # while the registry stays at 150 = 3x50 saturation.
    # The r12/r13-window names and the rest follow via the fallback
    # append in _apply_order.
]



def _apply_order() -> None:
    assert not (set(_LEAD_ORDER) - set(QUERIES)), "unknown name in _LEAD_ORDER"
    assert len(set(_LEAD_ORDER)) == len(_LEAD_ORDER), "duplicate in _LEAD_ORDER"
    ordered = {n: QUERIES[n] for n in _LEAD_ORDER}
    ordered.update({n: q for n, q in QUERIES.items() if n not in ordered})
    QUERIES.clear()
    QUERIES.update(ordered)


# Round-10 promotion swap (HANDOFF "READ THIS FIRST", r9 verdict task
# 1): insert the five staged queue blocks before ordering so the
# _LEAD_ORDER fills above resolve.  Import is deferred to the module
# bottom on purpose — promotions_r10 imports Query/QUERIES from here.
from .promotions_r10 import promote as _promote_r10  # noqa: E402

_promote_r10()

# Round-12 promotion swap (r11 verdict task 1): rrf_fuse +
# window_funnel fill the two slots freed by the audited r10/r11
# retirements.  Same deferred-import pattern as r10.
from .promotions_r12 import promote as _promote_r12  # noqa: E402

_promote_r12()
_apply_order()
