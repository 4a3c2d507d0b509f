"""Kafka source/sink edges (SURVEY.md §2.1 S2/S4/S5/S6) — pluggable.

This container has no spark-sql-kafka jar, so every Kafka entry point
is gated: ``kafka_available`` detects the connector, and the
reader/writer builders either return the configured plan (jar present)
or raise ``KafkaUnavailableError`` with the exact spark-submit package
coordinate.  Everything downstream of the source is format-agnostic —
the parquet/rate twins exercise identical plans in tests.  The Avro
FILE path needs no jar at all: ``sources/avro_ocf.py`` reads/writes
Object Container Files with a stdlib codec (the lake-side cousin of
the Schema-Registry wire frame handled in ``serde.py``).

Option mapping from the reference:
- producer reliability (acks=all, idempotence, snappy, batching —
  /root/reference/src/producer/kafka_order_producer.py:32-49) ->
  ``kafka.*`` pass-through options on the sink.
- consumer group/offsets (group.id, earliest, manual commit —
  /root/reference/src/consumer/avro_order_consumer.py:48-61) ->
  ``startingOffsets`` + checkpointLocation (Spark manages its own
  group/commit semantics, §2.9 T9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KAFKA_PACKAGE = "org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>"

#: Reference producer reliability/batching options
#: (kafka_order_producer.py:32-49) in Spark sink form.
PRODUCER_OPTIONS = {
    "kafka.acks": "all",
    "kafka.enable.idempotence": "true",
    "kafka.max.in.flight.requests.per.connection": "5",
    "kafka.compression.type": "snappy",
    "kafka.batch.size": "16384",
    "kafka.linger.ms": "10",
    "kafka.request.timeout.ms": "30000",
    "kafka.delivery.timeout.ms": "120000",
}


class KafkaUnavailableError(RuntimeError):
    def __init__(self) -> None:
        super().__init__(
            "The spark-sql-kafka connector is not on the classpath; "
            f"submit with --packages {KAFKA_PACKAGE} to enable Kafka "
            "sources/sinks. All operators also run against parquet/rate "
            "twins without it."
        )


def kafka_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.Class.forName(  # type: ignore[union-attr]
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
        return True
    except Exception:
        return False


def read_kafka_stream(
    spark: SparkSession,
    topics: str = "orders",
    bootstrap_servers: str = "localhost:9092",
    starting_offsets: str = "earliest",
) -> DataFrame:
    """S4/S6: Kafka streaming source with the reference's subscription
    semantics (multi-topic subscribe = comma list, §2.7)."""
    if not kafka_available(spark):
        raise KafkaUnavailableError()
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def write_kafka_stream(
    df: DataFrame,
    topic: str,
    bootstrap_servers: str,
    checkpoint: str,
    reliability: bool = True,
):
    """S2/S5: keyed Kafka sink (expects `key`/`value` columns, as
    produced by serde.orders_to_json / orders_to_avro)."""
    spark = df.sparkSession
    if not kafka_available(spark):
        raise KafkaUnavailableError()
    writer = (
        df.select(F.col("key").cast("binary"), F.col("value").cast("binary"))
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
    if reliability:
        for k, v in PRODUCER_OPTIONS.items():
            writer = writer.option(k, v)
    return writer.start()
