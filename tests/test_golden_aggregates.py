"""Golden-row tests replicating the reference's own smoke fixture
(/root/reference/src/aggregator/price_aggregator.py:150-170; values in
FIXTURES.md §3)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.aggregate import (
    overall_stats,
    product_average,
    product_price_stats,
    stats_snapshot,
    stats_with_defaults,
)
from kafka_avro_order_processing_spark.operators.windows import running_average

GOLDEN = [
    (1, "Laptop", 999.99),
    (2, "Mouse", 25.50),
    (3, "Laptop", 1099.99),
    (4, "Keyboard", 75.00),
    (5, "Laptop", 899.99),
    (6, "Mouse", 29.99),
    (7, "Monitor", 349.99),
    (8, "Keyboard", 89.99),
    (9, "Monitor", 299.99),
    (10, "Mouse", 19.99),
]

EXPECTED_STATS = {
    # product: (count, sum, avg, min, max)
    "Laptop": (3, 2999.97, 999.99, 899.99, 1099.99),
    "Mouse": (3, 75.48, 25.16, 19.99, 29.99),
    "Keyboard": (2, 164.99, 82.495, 75.00, 89.99),
    "Monitor": (2, 649.98, 324.99, 299.99, 349.99),
}

EXPECTED_RUNNING_AVGS = [
    999.99, 25.50, 1049.99, 75.00, 999.99, 27.745, 349.99, 82.495, 324.99, 25.16,
]


@pytest.fixture(scope="module")
def golden_df(spark):
    return spark.createDataFrame(GOLDEN, "seq long, product string, price double")


def test_per_product_stats(spark, golden_df):
    rows = {r["product"]: r for r in product_price_stats(golden_df).collect()}
    assert set(rows) == set(EXPECTED_STATS)
    for product, (cnt, total, avg, mn, mx) in EXPECTED_STATS.items():
        r = rows[product]
        assert r["order_count"] == cnt
        assert r["price_sum"] == pytest.approx(total, abs=1e-9)
        assert r["average_price"] == pytest.approx(avg, abs=1e-2)
        assert r["minimum_price"] == mn
        assert r["maximum_price"] == mx


def test_snapshot_rounds_to_2dp(spark, golden_df):
    rows = {r["product"]: r for r in stats_snapshot(golden_df).collect()}
    assert rows["Mouse"]["average_price"] == 25.16
    assert rows["Keyboard"]["price_sum"] == 164.99


def test_overall_stats(spark, golden_df):
    r = overall_stats(golden_df).collect()[0]
    assert r["total_orders"] == 10
    assert r["total_revenue"] == 3890.42
    assert r["average_order_value"] == 389.04
    assert r["unique_products"] == 4


def test_running_average_sequence(spark, golden_df):
    out = (
        running_average(golden_df, order_by=("seq",))
        .orderBy("seq")
        .select("running_avg")
        .collect()
    )
    got = [r["running_avg"] for r in out]
    assert got == pytest.approx(EXPECTED_RUNNING_AVGS, abs=1e-9)


def test_absent_product_returns_zeros(spark, golden_df):
    products = spark.createDataFrame([("Laptop",), ("Webcam",)], "product string")
    rows = {r["product"]: r for r in stats_with_defaults(golden_df, products).collect()}
    webcam = rows["Webcam"]
    assert webcam["order_count"] == 0
    assert webcam["price_sum"] == 0.0
    assert webcam["average_price"] == 0.0
    assert webcam["minimum_price"] == 0.0  # never ±inf
    assert rows["Laptop"]["order_count"] == 3


def test_point_lookup(spark, golden_df):
    got = product_average(golden_df, "Monitor").collect()
    assert len(got) == 1 and got[0]["average_price"] == pytest.approx(324.99)
    assert product_average(golden_df, "Webcam").count() == 0


def test_approx_distinct_users_within_configured_error(spark):
    """The HLL++ sketch behind approx_distinct_users is rows-only at
    the driver (sketch values are engine-specific), so pin its
    accuracy here: every per-group estimate must fall within the
    sketch's configured relative error of the exact countDistinct.
    approx_count_distinct's default rsd is 0.05 (one standard
    deviation); 4 sigma makes the bound deterministic-in-practice
    while still catching any mis-wiring (a wrong column or a
    collapsed group is off by far more than 20%)."""
    import os

    from kafka_avro_order_processing_spark.plans.registry import QUERIES
    from kafka_avro_order_processing_spark.sources.tables import load_table

    sf_dir = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")
    approx = {
        r["event_type"]: r["approx_users"]
        for r in QUERIES["approx_distinct_users"].fn(spark, sf_dir).collect()
    }
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for et, n in exact.items():
        assert abs(approx[et] - n) <= max(1, 4 * 0.05 * n), (
            f"{et}: approx={approx[et]} exact={n} outside 4-sigma rsd bound"
        )
