"""Source-edge coverage: the rate-source streaming generator (S3) and
schema-evolution reads (a training-data lake reality)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.sources.generator import (
    PRODUCT_PRICE_RANGES,
    gen_orders_stream,
)


def test_rate_source_generator_stream(spark, tmp_path):
    """S3: the rate-source twin emits well-formed orders at the offered
    load (the reference's ~2 msg/s demo, kafka_order_producer.py:171-174)."""
    stream = gen_orders_stream(spark, rows_per_second=50)
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_orders")
        .option("checkpointLocation", str(tmp_path / "chk"))
        .start()
    )
    try:
        deadline = time.time() + 15
        while time.time() < deadline:
            q.processAllAvailable()
            if spark.table("rate_orders").count() >= 5:
                break
            time.sleep(0.3)
        rows = spark.table("rate_orders").collect()
        assert len(rows) >= 5
        for r in rows:
            assert r["orderId"].startswith("ORD-")
            lo, hi = PRODUCT_PRICE_RANGES[r["product"]]
            assert lo - 0.005 <= r["price"] <= hi + 0.005
    finally:
        q.stop()


def test_schema_evolution_merge(spark, tmp_path):
    """mergeSchema read over a dataset whose later files added a column:
    old rows surface NULL for the new column — the additive-evolution
    contract a long-lived 100 TB corpus depends on."""
    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [("ORD-1", "Laptop", 10.0)], "orderId string, product string, price double"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [("ORD-2", "Mouse", 20.0, "EU")],
        "orderId string, product string, price double, region string",
    ).write.mode("append").parquet(p)

    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"orderId", "product", "price", "region"}
    rows = {r["orderId"]: r for r in merged.collect()}
    assert rows["ORD-1"]["region"] is None
    assert rows["ORD-2"]["region"] == "EU"
    # aggregation over the union still works with null-safe handling
    n = merged.filter(F.col("region").isNull()).count()
    assert n == 1
