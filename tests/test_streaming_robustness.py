"""Streaming robustness: watermarks/late data (T4), RocksDB state store
(the 100 TB state claim), checkpoint-based offset tracking (T5/T9), and
retry-wrapped foreachBatch bodies (T6)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.streaming.retry import (
    PermanentError,
    RetryableError,
    RetryHandler,
)

SCHEMA = "key string, ts timestamp_ntz, value double"


def _write_batch(spark, path, rows):
    import datetime as dt

    parsed = [
        (k, dt.datetime.fromisoformat(ts), v) for (k, ts, v) in rows
    ]
    spark.createDataFrame(parsed, SCHEMA).coalesce(1).write.mode("append").parquet(path)


def test_watermark_drops_late_data(spark, tmp_path):
    """Append-mode windowed agg with a 10-minute watermark: an event
    arriving (in a later run, same checkpoint) after its window's
    watermark passed is dropped (T4 — the late-data semantics the
    reference lacks entirely).  The watermark survives restarts via the
    checkpoint, like every other piece of stream state."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        # watermarks require TIMESTAMP (with tz); session tz is UTC so
        # the wall-clock values are unchanged by the cast
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"), "key")
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
            )
        )
        q = (
            agg.select(F.col("w.start").alias("w_start"), "key", "n", "s")
            .writeStream.outputMode("append").format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    # run 1: 10:00-hour events + a 13:00 event -> watermark 12:50;
    # the 10:00-11:00 window closes and is emitted with (2, 3.0)
    _write_batch(spark, src, [
        ("a", "2024-01-01 10:01:00", 1.0),
        ("a", "2024-01-01 10:02:00", 2.0),
        ("a", "2024-01-01 13:00:00", 3.0),
    ])
    run_once()
    # run 2: a late row for the closed 10:00 window must be dropped
    _write_batch(spark, src, [
        ("a", "2024-01-01 10:03:00", 100.0),   # LATE -> dropped
        ("a", "2024-01-01 14:00:00", 4.0),
    ])
    run_once()
    out = {
        r["w_start"].isoformat(): (r["n"], r["s"])
        for r in spark.read.parquet(sink).collect()
    }
    assert out.get("2024-01-01T10:00:00") == (2, 3.0)
    assert "2024-01-01T10:00:00" in out and len(out) >= 1


def test_rocksdb_state_store(spark, tmp_path):
    """The streaming aggregate runs unchanged on the RocksDB state store
    provider — state scales to disk, not heap (SCALE.md posture)."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [
        ("a", "2024-01-01 10:00:00", 1.0),
        ("b", "2024-01-01 10:01:00", 2.0),
        ("a", "2024-01-01 10:02:00", 3.0),
    ])
    prev = spark.conf.get("spark.sql.streaming.stateStore.providerClass", None)
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        agg = stream.groupBy("key").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("s"),
        )
        q = (
            agg.writeStream.outputMode("complete").format("memory").queryName("rocks_test")
            .option("checkpointLocation", str(tmp_path / "chk_rocks"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        got = {r["key"]: (r["n"], r["s"]) for r in spark.table("rocks_test").collect()}
        assert got == {"a": (2, 4.0), "b": (1, 2.0)}
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_checkpoint_resumes_from_offsets(spark, tmp_path):
    """Re-running with the same checkpoint processes ONLY new input —
    the reference's manual commit-after-process (T9) mapped to offset
    tracking; no record is double-counted."""
    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            stream.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_batch(spark, src, [("a", "2024-01-01 10:00:00", 1.0)])
    run_once()
    assert spark.read.parquet(sink).count() == 1
    _write_batch(spark, src, [("b", "2024-01-01 11:00:00", 2.0)])
    run_once()
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 2  # old file not reprocessed
    assert {r["key"] for r in rows} == {"a", "b"}


def test_foreach_batch_retry_on_transient_failure(spark, tmp_path):
    """A foreachBatch body that fails transiently succeeds via the retry
    envelope (T6) — and a permanently-failing body surfaces as
    PermanentError, not an infinite loop."""
    src = str(tmp_path / "src")
    _write_batch(spark, src, [("a", "2024-01-01 10:00:00", 1.0)])
    attempts = {"n": 0}
    done = {"rows": 0}

    def flaky_body(df, epoch_id):
        attempts["n"] += 1
        if attempts["n"] < 3:
            raise RetryableError("transient sink hiccup")
        done["rows"] += df.count()

    handler = RetryHandler(jitter=False, sleep=lambda _s: None)
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = (
        stream.writeStream.foreachBatch(handler.wrap_foreach_batch(flaky_body))
        .option("checkpointLocation", str(tmp_path / "chk_retry"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert attempts["n"] == 3 and done["rows"] == 1

    def always_bad(df, epoch_id):
        raise PermanentError("bad schema")

    q2 = (
        stream.writeStream.foreachBatch(handler.wrap_foreach_batch(always_bad))
        .option("checkpointLocation", str(tmp_path / "chk_perm"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(Exception, match="bad schema|PermanentError|STREAM_FAILED"):
        q2.awaitTermination()


def test_streaming_dedup_across_batches(spark, tmp_path):
    """Streaming exact dedup: dropDuplicates state persists in the
    checkpoint, so a duplicate arriving in a LATER run is dropped —
    the streaming face of the dedup operator family."""
    src = str(tmp_path / "dd_src")
    sink = str(tmp_path / "dd_sink")
    chk = str(tmp_path / "dd_chk")

    def run_once():
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        q = (
            stream.dropDuplicates(["key"])
            .writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    _write_batch(spark, src, [("a", "2024-01-01 10:00:00", 1.0),
                              ("b", "2024-01-01 10:01:00", 2.0)])
    run_once()
    _write_batch(spark, src, [("a", "2024-01-01 12:00:00", 99.0),   # dup key -> dropped
                              ("c", "2024-01-01 12:01:00", 3.0)])
    run_once()
    rows = spark.read.parquet(sink).collect()
    assert {r["key"] for r in rows} == {"a", "b", "c"}
    assert len(rows) == 3
    a_val = next(r["value"] for r in rows if r["key"] == "a")
    assert a_val == 1.0  # the first occurrence won


def test_streaming_observe_listener(spark, tmp_path):
    """T10: observed metrics reach the listener on every micro-batch."""
    import time

    from kafka_avro_order_processing_spark.streaming.metrics import (
        OrderMetricsListener,
        observe_order_metrics,
    )

    src = str(tmp_path / "obs_src")
    _write_batch(spark, src, [("a", "2024-01-01 10:00:00", 1.0),
                              ("b", "2024-01-01 10:01:00", -2.0),
                              (None, "2024-01-01 10:02:00", 3.0)])
    listener = OrderMetricsListener()
    spark.streams.addListener(listener)
    try:
        stream = spark.readStream.schema(SCHEMA).parquet(src)
        observed = observe_order_metrics(stream, key="key", value="value", id_col=None)
        q = (
            observed.writeStream.format("noop")
            .option("checkpointLocation", str(tmp_path / "obs_chk"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # listener delivery is async; poll briefly
        for _ in range(40):
            if listener.totals["records_processed"] >= 3:
                break
            time.sleep(0.25)
        assert listener.totals["records_processed"] == 3
        assert listener.totals["records_valid"] == 1      # only ("a", 1.0)
        assert listener.totals["records_invalid"] == 2    # negative + null key
    finally:
        spark.streams.removeListener(listener)


def test_stream_static_broadcast_join(spark, tmp_path):
    """Stream-static join: a streaming fact enriched by a static dim —
    the dim broadcasts per micro-batch, no stream-side state."""
    src = str(tmp_path / "ss_src")
    _write_batch(spark, src, [("a", "2024-01-01 10:00:00", 1.0),
                              ("b", "2024-01-01 10:01:00", 2.0),
                              ("zz", "2024-01-01 10:02:00", 3.0)])
    dim = spark.createDataFrame(
        [("a", "alpha"), ("b", "beta")], "key string, key_name string"
    )
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    joined = stream.join(F.broadcast(dim), "key", "left")
    q = (
        joined.writeStream.format("memory").queryName("ss_join")
        .option("checkpointLocation", str(tmp_path / "ss_chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r["key"]: r["key_name"] for r in spark.table("ss_join").collect()}
    assert got == {"a": "alpha", "b": "beta", "zz": None}
