"""Streaming-twin tests: batch ≡ stream equivalence, dual-sink DLQ
routing with retry envelope, per-record stateful emission, metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.aggregate import product_price_stats
from kafka_avro_order_processing_spark.operators.windows import running_average
from kafka_avro_order_processing_spark.sources.tables import load_table
from kafka_avro_order_processing_spark.streaming.pipeline import (
    run_streaming_product_stats,
    start_order_pipeline,
    stream_table,
)
from kafka_avro_order_processing_spark.streaming.retry import RetryHandler

SF = "/root/testdata/sf0.001"


def test_batch_stream_equivalence(spark):
    """The streaming update-mode aggregate must equal the batch groupBy
    (SURVEY.md §5 equivalence strategy)."""
    batch = product_price_stats(
        load_table(spark, SF, "events"), key="event_type", value="value"
    )
    stream = run_streaming_product_stats(spark, SF)
    b = sorted(tuple(r) for r in batch.collect())
    s = sorted(tuple(r) for r in stream.collect())
    assert b == s


def test_streaming_dual_sink_pipeline(spark, tmp_path):
    """foreachBatch dual-sink epoch: valid rows to one sink, enveloped
    rejects to the DLQ sink, single bounded run (T5/T7)."""
    rows = [
        ("ORD-0001", "Laptop", 999.99),
        ("ORD-0002", "Mouse", -1.0),
        (None, "Monitor", 10.0),
        ("ORD-0004", "Webcam", 49.99),
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "orderId string, product string, price double") \
        .write.parquet(src)
    stream = spark.readStream.schema("orderId string, product string, price double").parquet(src)
    q = start_order_pipeline(
        stream,
        valid_sink=str(tmp_path / "valid"),
        dlq_sink=str(tmp_path / "dlq"),
        checkpoint=str(tmp_path / "chk"),
        retry_handler=RetryHandler(jitter=False, sleep=lambda _s: None),
    )
    q.awaitTermination()
    valid = spark.read.parquet(str(tmp_path / "valid"))
    dlq = spark.read.parquet(str(tmp_path / "dlq"))
    assert valid.count() == 2
    assert dlq.count() == 2
    assert {r["error_type"] for r in dlq.collect()} == {"PermanentError"}


def test_stateful_per_record_emission(spark):
    """applyInPandasWithState twin emits the running average after every
    record — must match the batch window form on ordered input."""
    from kafka_avro_order_processing_spark.streaming.stateful import (
        running_stats_per_record,
    )

    rows = [("Laptop", i, float(100 + i)) for i in range(1, 6)] + [
        ("Mouse", i, float(10 + i)) for i in range(1, 4)
    ]
    import tempfile
    src = tempfile.mkdtemp()
    df = spark.createDataFrame(rows, "key string, seq long, value double")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("key string, seq long, value double").parquet(src)
    out = running_stats_per_record(stream)
    q = (
        out.writeStream.outputMode("append").format("memory")
        .queryName("per_record_out")
        .option("checkpointLocation", tempfile.mkdtemp())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["key"], r["seq"]): r["running_avg"]
        for r in spark.table("per_record_out").collect()
    }
    batch = running_average(df, key="key", value="value", order_by=("seq",))
    expected = {(r["key"], r["seq"]): r["running_avg"] for r in batch.collect()}
    assert len(got) == len(rows)
    for k, v in expected.items():
        assert got[k] == pytest.approx(v, abs=1e-9)


def test_observe_metrics(spark):
    from kafka_avro_order_processing_spark.streaming.metrics import (
        observe_order_metrics,
    )

    rows = [
        ("ORD-1", "Laptop", 10.0),
        ("ORD-2", "Mouse", -2.0),
        (None, "Monitor", 5.0),
    ]
    df = spark.createDataFrame(rows, "orderId string, product string, price double")
    observed = observe_order_metrics(df)
    observed.collect()
    # batch observe: metrics surface via the DataFrame observation API
    # (streaming path uses the listener; covered implicitly by schema)
    assert observed.count() == 3


def test_aggregated_output_stream(spark, tmp_path):
    """The reference created an `orders-aggregated` topic but never
    wrote it (scripts/setup_topics.sh:31-37, SURVEY.md §1); the engine
    implements it: per-epoch aggregate snapshots on a third sink."""
    rows = [
        ("ORD-0001", "Laptop", 100.0),
        ("ORD-0002", "Laptop", 200.0),
        ("ORD-0003", "Mouse", -1.0),   # -> DLQ, excluded from aggregates
    ]
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, "orderId string, product string, price double") \
        .write.parquet(src)
    stream = spark.readStream.schema("orderId string, product string, price double").parquet(src)
    q = start_order_pipeline(
        stream,
        valid_sink=str(tmp_path / "valid"),
        dlq_sink=str(tmp_path / "dlq"),
        checkpoint=str(tmp_path / "chk"),
        aggregated_sink=str(tmp_path / "aggregated"),
    )
    q.awaitTermination()
    from kafka_avro_order_processing_spark.streaming.pipeline import (
        read_aggregated_snapshot,
    )

    snap = read_aggregated_snapshot(spark, str(tmp_path / "aggregated"))
    by_product = {r["product"]: r for r in snap.collect()}
    assert by_product["Laptop"]["order_count"] == 2
    assert by_product["Laptop"]["price_sum"] == 300.0
    assert by_product["Laptop"]["average_price"] == 150.0
    assert "Mouse" not in by_product

    # Replay idempotence: a fresh checkpoint re-processes the same
    # source (at-least-once), re-emitting epoch 0 — the epoch-partitioned
    # changelog must overwrite, not double-append, so the snapshot does
    # not double-count even though the row sinks do re-append.
    q2 = start_order_pipeline(
        spark.readStream.schema("orderId string, product string, price double").parquet(src),
        valid_sink=str(tmp_path / "valid"),
        dlq_sink=str(tmp_path / "dlq"),
        checkpoint=str(tmp_path / "chk_replay"),
        aggregated_sink=str(tmp_path / "aggregated"),
    )
    q2.awaitTermination()
    snap2 = read_aggregated_snapshot(spark, str(tmp_path / "aggregated"))
    by_product2 = {r["product"]: r for r in snap2.collect()}
    assert by_product2["Laptop"]["order_count"] == 2
    assert by_product2["Laptop"]["price_sum"] == 300.0
    # per-epoch work is O(epoch): the changelog holds partials per
    # epoch, one partition per epoch id
    agg = spark.read.parquet(str(tmp_path / "aggregated"))
    assert set(agg.columns) >= {"product", "order_count", "price_sum_dec",
                                "minimum_price", "maximum_price", "epoch_id"}


def test_update_mode_drain_folds_changelog(spark, tmp_path):
    """Update-mode drain across MULTIPLE epochs: each epoch appends
    only its changed keys; the fold must keep the latest epoch's row
    per key and equal the batch aggregate over all data."""
    from kafka_avro_order_processing_spark.operators.aggregate import (
        product_price_stats,
    )
    from kafka_avro_order_processing_spark.streaming.pipeline import drain_to_df

    src = str(tmp_path / "src")
    rows = [(i, ["a", "b", "c"][i % 3], float(i)) for i in range(300)]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    # 4 separate files -> maxFilesPerTrigger=1 forces 4 update epochs
    df.repartition(4).write.parquet(src)

    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = drain_to_df(
        product_price_stats(stream, key="event_type", value="value"),
        "update",
        key_cols=("event_type",),
    )
    want = product_price_stats(df, key="event_type", value="value")
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, want.collect()))


def test_update_mode_drain_requires_keys(spark):
    import pytest as _pytest

    from kafka_avro_order_processing_spark.streaming.pipeline import drain_to_df

    df = spark.readStream.format("rate").load()
    with _pytest.raises(ValueError, match="key_cols"):
        drain_to_df(df, "update")
