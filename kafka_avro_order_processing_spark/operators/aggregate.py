"""Keyed and global aggregations — the reference's analytics core.

Re-expresses PriceAggregator
(/root/reference/src/aggregator/price_aggregator.py:16-108, operators
A1-A5 in SURVEY.md §2.4) and the DLQ statistics
(/root/reference/src/consumer/dead_letter_queue_consumer.py:63-76,
A6-A8) as declarative groupBy plans.

Scale notes (100 TB posture):
- `groupBy(key).agg(...)` compiles to partial (map-side) + final hash
  aggregation — the shuffle carries one row per key per map partition,
  not the raw data.  With ~10 products (or ~1e5 event types) the
  shuffled state is trivially small at any input scale.
- The same expressions run unchanged under Structured Streaming in
  update mode (streaming/pipeline.py); state lives in the state store
  (RocksDB-able), not a Python dict.
- No collect(); snapshots stay DataFrames.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.scalar import dec_sum, safe_div


def product_price_stats(
    df: DataFrame, key: str = "product", value: str = "price"
) -> DataFrame:
    """A1: per-key count / sum / avg / min / max of the value column.

    Mirrors ProductPriceStatistics
    (/root/reference/src/aggregator/price_aggregator.py:16-51) with
    exact decimal sums; `average_price` = sum/count in double (identical
    operands -> identical result on every engine).
    """
    sum_c = dec_sum(value)
    return df.groupBy(F.col(key)).agg(
        F.count("*").alias("order_count"),
        sum_c.alias("price_sum"),
        (dec_sum(value) / F.count("*")).alias("average_price"),
        F.min(value).alias("minimum_price"),
        F.max(value).alias("maximum_price"),
    )


def stats_snapshot(
    df: DataFrame, key: str = "product", value: str = "price"
) -> DataFrame:
    """A3: presentation snapshot — stats rounded to 2dp
    (/root/reference/src/aggregator/price_aggregator.py:60-82 rounds at
    the edge only; internal state stays full precision)."""
    stats = product_price_stats(df, key, value)
    return stats.select(
        key,
        "order_count",
        F.round("price_sum", 2).alias("price_sum"),
        F.round("average_price", 2).alias("average_price"),
        F.round("minimum_price", 2).alias("minimum_price"),
        F.round("maximum_price", 2).alias("maximum_price"),
    )


def overall_stats(df: DataFrame, key: str = "product", value: str = "price") -> DataFrame:
    """A5: global totals
    (/root/reference/src/aggregator/price_aggregator.py:95-108):
    total_orders, total_revenue, average_order_value, unique_products.

    Batch keeps the exact countDistinct; the streaming twin substitutes
    approx_count_distinct (SURVEY.md §7 hard parts).
    """
    return df.agg(
        F.count("*").alias("total_orders"),
        F.round(dec_sum(value), 2).alias("total_revenue"),
        F.round(
            safe_div(dec_sum(value), F.count("*")), 2
        ).alias("average_order_value"),
        F.countDistinct(key).alias("unique_products"),
    )


def error_stats(
    dlq: DataFrame,
    error_type: str = "error_type",
    product: Column | str = "product",
) -> DataFrame:
    """A7+A8: DLQ error counts by type and by product
    (/root/reference/src/consumer/dead_letter_queue_consumer.py:73-76);
    absent product -> 'UNKNOWN'
    (dead_letter_queue_consumer.py:66-70, operator P5/F14)."""
    prod = F.col(product) if isinstance(product, str) else product
    return (
        dlq.groupBy(
            F.col(error_type).alias("error_type"),
            F.coalesce(prod, F.lit("UNKNOWN")).alias("product"),
        )
        .agg(F.count("*").alias("error_count"))
    )


def salted_product_price_stats(
    df: DataFrame, key: str = "product", value: str = "price", salt_buckets: int = 16
) -> DataFrame:
    """A1 under key skew: two-stage aggregation with a salt.

    Stage 1 aggregates on (key, salt) — a hot key's rows spread over
    `salt_buckets` reducers instead of one — stage 2 merges the partial
    states on the bare key.  Decimal sums make the merge exact, so the
    result is bit-identical to the unsalted plan (tested + oracle-
    checked).  The salt is spark_partition_id: it spreads a hot key
    even when every hot row carries the SAME value (a value-derived
    hash would collapse them into one bucket), is deterministic per
    task attempt, and cannot change the merged result.  Never rand()
    (nondeterministic under retries).
    """
    salt = (F.spark_partition_id() % salt_buckets).alias("__salt")
    partial = (
        df.groupBy(F.col(key), salt)
        .agg(
            F.count("*").alias("c"),
            F.sum(F.col(value).cast("decimal(18,2)")).alias("s"),
            F.min(value).alias("mn"),
            F.max(value).alias("mx"),
        )
    )
    return (
        partial.groupBy(key)
        .agg(
            F.sum("c").alias("order_count"),
            F.sum("s").cast("double").alias("price_sum"),
            (F.sum("s").cast("double") / F.sum("c")).alias("average_price"),
            F.min("mn").alias("minimum_price"),
            F.max("mx").alias("maximum_price"),
        )
    )


def stats_with_defaults(
    df: DataFrame, products: DataFrame, key: str = "product", value: str = "price"
) -> DataFrame:
    """A3 absent-key contract: stats for every key in `products`,
    zeros (never ±inf/null) for keys with no rows
    (/root/reference/src/aggregator/price_aggregator.py:66-73)."""
    stats = product_price_stats(df, key, value)
    zero = F.lit(0.0)
    return products.join(stats, on=key, how="left").select(
        key,
        F.coalesce("order_count", F.lit(0)).alias("order_count"),
        F.coalesce("price_sum", zero).alias("price_sum"),
        F.coalesce("average_price", zero).alias("average_price"),
        F.coalesce("minimum_price", zero).alias("minimum_price"),
        F.coalesce("maximum_price", zero).alias("maximum_price"),
    )


def product_average(df: DataFrame, product: str, key: str = "product", value: str = "price") -> DataFrame:
    """A2: point lookup of one key's running average; absent -> no row
    (caller coalesces to 0.0 per the absent->zeros contract,
    /root/reference/src/aggregator/price_aggregator.py:53-58)."""
    return (
        product_price_stats(df, key, value)
        .filter(F.col(key) == F.lit(product))
        .select(key, "average_price")
    )
