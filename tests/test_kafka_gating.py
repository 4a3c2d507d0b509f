"""Kafka edges must degrade gracefully when the connector jar is absent
(this container has none)."""

from __future__ import annotations

import pytest

from kafka_avro_order_processing_spark.sources.kafka_io import (
    KafkaUnavailableError,
    kafka_available,
    read_kafka_stream,
)


def test_kafka_detection_and_error(spark):
    if kafka_available(spark):
        df = read_kafka_stream(spark)
        assert "value" in df.columns  # connector present: real source
    else:
        with pytest.raises(KafkaUnavailableError, match="spark-sql-kafka"):
            read_kafka_stream(spark)
