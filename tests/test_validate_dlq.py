"""Validation-split and DLQ-envelope tests with seeded invalid rows
(FIXTURES.md §1 invalid-row cases: missing fields, price <= 0)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.functions.scalar import classify_error
from kafka_avro_order_processing_spark.operators.aggregate import error_stats
from kafka_avro_order_processing_spark.operators.validate import (
    dlq_envelope,
    split_valid_invalid,
)

ROWS = [
    ("ORD-0001", "Laptop", 999.99),
    ("ORD-0002", "Mouse", 0.0),        # price <= 0 -> reject
    ("ORD-0003", None, 25.0),          # missing product -> reject
    (None, "Keyboard", 75.0),          # missing id -> reject
    ("ORD-0005", "Monitor", -5.0),     # negative -> reject
    ("ORD-0006", "Webcam", None),      # missing price -> reject
    ("ORD-0007", "Laptop", 899.99),
]


def _orders(spark):
    return spark.createDataFrame(ROWS, "orderId string, product string, price double")


def test_split_counts(spark):
    valid, invalid = split_valid_invalid(_orders(spark))
    assert valid.count() == 2
    assert invalid.count() == 5
    assert {r["orderId"] for r in valid.collect()} == {"ORD-0001", "ORD-0007"}


def test_error_messages(spark):
    _, invalid = split_valid_invalid(_orders(spark))
    msgs = {r["orderId"]: r["error_message"] for r in invalid.collect()}
    assert msgs["ORD-0002"] == "Invalid price: 0.0"
    assert msgs["ORD-0003"] == "Missing required fields in order data"
    assert msgs["ORD-0005"] == "Invalid price: -5.0"


def test_dlq_envelope_shape(spark):
    _, invalid = split_valid_invalid(_orders(spark))
    env = dlq_envelope(invalid, source_topic="orders")
    rows = env.collect()
    assert len(rows) == 5
    r = {x["original_value"]["orderId"]: x for x in rows}["ORD-0002"]
    assert r["original_topic"] == "orders"
    assert r["error_type"] == "PermanentError"
    assert r["retry_count"] == 0
    assert r["consumer_group"] == "order-processor-group"
    assert r["original_value"]["product"] == "Mouse"
    assert r["failed_at"] is not None


def test_error_stats_unknown_product(spark):
    _, invalid = split_valid_invalid(_orders(spark))
    env = dlq_envelope(invalid)
    stats = error_stats(env, product=F.col("original_value.product"))
    rows = {r["product"]: r["error_count"] for r in stats.collect()}
    assert rows["UNKNOWN"] == 1  # the missing-product row
    assert sum(rows.values()) == 5


def test_classification_patterns(spark):
    msgs = [
        ("Connection refused",), ("Request timeout",), ("HTTP 503",),
        ("schema mismatch",), ("null pointer",), ("socket closed",),
        ("error 429 too many requests",), ("bad record",),
    ]
    df = spark.createDataFrame(msgs, "msg string")
    got = {
        r["msg"]: r["c"]
        for r in df.select("msg", classify_error("msg").alias("c")).collect()
    }
    assert got["Connection refused"] == "retryable"
    assert got["Request timeout"] == "retryable"
    assert got["HTTP 503"] == "retryable"
    assert got["socket closed"] == "retryable"
    assert got["error 429 too many requests"] == "retryable"
    assert got["schema mismatch"] == "permanent"
    assert got["null pointer"] == "permanent"
    assert got["bad record"] == "permanent"
