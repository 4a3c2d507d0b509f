"""End-to-end demo — the engine's analogue of the reference's
scripts/run_demo.sh (producer -> consumer -> DLQ monitor).

Where the reference runs three OS processes wired through Kafka topics,
the engine runs one streaming plan wired through sinks:

  EP1 producer  -> synthetic order generator (seeded invalids, like the
                   reference's validation failures)
  EP2 consumer  -> JSON wire round-trip, validity split, per-product
                   aggregation (printed as the reference's summary
                   table), valid+DLQ dual sink with retry envelope
  EP3 monitor   -> error stats over the DLQ sink

Run: python examples/order_pipeline_demo.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark import get_spark
from kafka_avro_order_processing_spark.operators.aggregate import (
    error_stats,
    overall_stats,
    stats_snapshot,
)
from kafka_avro_order_processing_spark.operators.ranking import order_by_count_desc
from kafka_avro_order_processing_spark.sources.generator import gen_orders
from kafka_avro_order_processing_spark.sources.serde import orders_from_json, orders_to_json
from kafka_avro_order_processing_spark.streaming.pipeline import start_order_pipeline
from kafka_avro_order_processing_spark.streaming.retry import RetryHandler


def main(n_orders: int = 30, spark=None) -> dict:
    """Run the demo; returns the headline counters so tests can assert
    on them.  Creates (and stops) its own session only when none is
    passed in."""
    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="order-pipeline-demo", master="local[4]", shuffle_partitions=4)
    tmp = Path(tempfile.mkdtemp(prefix="order_demo_"))

    # EP1: produce n orders (+ seeded invalids) onto the JSON wire.
    orders = gen_orders(spark, n_orders)
    bad = spark.createDataFrame(
        [("ORD-9998", "Mouse", -1.0, 0), ("ORD-9999", None, 9.99, 0)],
        "orderId string, product string, price double, timestamp long",
    )
    wire = orders_to_json(orders.unionByName(bad))
    wire.write.parquet(str(tmp / "topic_orders"))

    # EP2: consume the wire as a stream -> decode -> split -> dual sink.
    stream = spark.readStream.schema("key string, value string").parquet(
        str(tmp / "topic_orders")
    )
    decoded = orders_from_json(stream).drop("corrupt_record")
    q = start_order_pipeline(
        decoded,
        valid_sink=str(tmp / "valid"),
        dlq_sink=str(tmp / "topic_orders_dlq"),
        checkpoint=str(tmp / "chk"),
        retry_handler=RetryHandler(),
    )
    q.awaitTermination()

    valid = spark.read.parquet(str(tmp / "valid"))
    dlq = spark.read.parquet(str(tmp / "topic_orders_dlq"))

    # The reference's per-product summary (price_aggregator.print_summary).
    print("\n=== Per-product price statistics ===")
    order_by_count_desc(stats_snapshot(valid), "order_count", "product").show(truncate=False)
    print("=== Overall ===")
    overall_stats(valid).show(truncate=False)

    # EP3: DLQ monitor stats (dead_letter_queue_consumer.print_statistics).
    print("=== DLQ errors by type/product ===")
    error_stats(dlq, product=F.col("original_value.product")).show(truncate=False)
    counters = {
        "processed": valid.count(),
        "sent_to_dlq": dlq.count(),
        "offered": n_orders + 2,
    }
    print(f"processed={counters['processed']} sent_to_dlq={counters['sent_to_dlq']} (of {counters['offered']})")
    if own_session:
        spark.stop()
    return counters


if __name__ == "__main__":
    main()
