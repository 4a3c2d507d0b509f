"""Structured Streaming twins of the batch operators.

The reference's EP2 consumer loop (/root/reference/src/consumer/
avro_order_consumer.py:151-208: poll -> decode -> validate -> aggregate
-> commit, DLQ on failure) becomes one streaming plan:

    readStream -> parse -> split(valid, invalid)
      -> [valid:   groupBy(key).agg(...), update/complete mode]
      -> [invalid: DLQ envelope -> DLQ sink]

with both sinks written in the same ``foreachBatch`` epoch — the
exactly-once analogue of the reference's commit-after-DLQ-routing
(T5: offsets tracked per micro-batch via checkpointLocation, so a
poison record never blocks the stream and never double-routes).

State scale: per-key aggregate state lives in the Spark state store;
for 100 TB/unbounded-key workloads configure RocksDB
(spark.sql.streaming.stateStore.providerClass) instead of the
default heap store — nothing else changes.
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.aggregate import product_price_stats
from ..operators.validate import dlq_envelope, split_valid_invalid
from ..sources.tables import load_table


class _scoped_shuffle_partitions:
    """Temporarily size shuffle partitions to the session's parallelism
    for a bounded streaming drain, restoring the caller's setting after.

    A vanilla session carries the 200-partition default; a drained
    memory-sink aggregation over test-scale data pays ~200 empty state
    store tasks per batch for nothing.  State lives in a fresh
    checkpoint per call, so the partition count is free to differ
    between calls.
    """

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def __enter__(self):
        self.prev = self.spark.conf.get("spark.sql.shuffle.partitions")
        self.spark.conf.set(
            "spark.sql.shuffle.partitions",
            str(self.spark.sparkContext.defaultParallelism),
        )

    def __exit__(self, *exc):
        self.spark.conf.set("spark.sql.shuffle.partitions", self.prev)
        return False


def drain_to_df(stream_df: DataFrame, output_mode: str) -> DataFrame:
    """Run a bounded streaming plan to completion (availableNow, memory
    sink, cluster-sized shuffle partitions, throwaway checkpoint) and
    return the materialized result as a batch DataFrame.

    The shared core of every streaming-twin query: the driver's oracle
    compares the drained result against the batch SQL form.
    """
    spark = stream_df.sparkSession
    tag = uuid.uuid4().hex[:12]
    name = f"drain_{tag}"
    with _scoped_shuffle_partitions(spark):
        q = (
            stream_df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .option("checkpointLocation", f"{tempfile.mkdtemp()}/chk_{tag}")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    out = spark.table(name)
    return spark.createDataFrame(out.collect(), schema=out.schema)


def stream_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """File-source streaming twin of sources.tables.load_table: same
    schema and ts normalization, rows arrive as a bounded stream
    (trigger availableNow drains it — the test/CI harness for what is a
    Kafka source in production)."""
    batch = load_table(spark, sf_dir, name)
    raw_schema = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet").schema
    # The file stream source requires a directory; select the one table
    # file out of the sf dir with a glob filter.
    stream = (
        spark.readStream.schema(raw_schema)
        .option("pathGlobFilter", f"{name}.parquet")
        .parquet(sf_dir.rstrip("/"))
    )
    if name == "events" and dict(stream.dtypes)["ts"] == "bigint":
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    # keep column order identical to the batch twin
    return stream.select(*batch.columns)


def run_streaming_product_stats(
    spark: SparkSession,
    sf_dir: str,
    key: str = "event_type",
    value: str = "value",
) -> DataFrame:
    """T2 streaming twin: the same aggregate expressions as the batch
    A1 operator, run as an update-mode streaming aggregation and
    drained to completion with an availableNow trigger.

    Returns the final aggregate state — which must equal the batch
    groupBy exactly (the equivalence the driver's oracle checks).
    """
    agg = product_price_stats(stream_table(spark, sf_dir, "events"), key=key, value=value)
    return drain_to_df(agg, "complete")


def run_streaming_running_avg(
    spark: SparkSession,
    sf_dir: str,
    key: str = "event_type",
    seq: str = "event_id",
    value: str = "value",
) -> DataFrame:
    """T2 exact per-record emission: the applyInPandasWithState twin of
    the reference's per-record running average, drained with
    availableNow and returned as a batch DataFrame.

    Must equal the batch window form (AVG OVER ... ROWS UNBOUNDED
    PRECEDING ordered by seq) — the driver's oracle checks exactly that.
    """
    from .stateful import running_stats_per_record

    keyed = stream_table(spark, sf_dir, "events").select(
        F.col(key).alias("key"), F.col(seq).alias("seq"), F.col(value).alias("value")
    )
    return drain_to_df(running_stats_per_record(keyed), "append")


def order_pipeline_batch(
    orders: DataFrame,
    valid_sink: str,
    dlq_sink: str,
    key: str = "product",
    value: str = "price",
    id_col: str | None = "orderId",
    source_topic: str = "orders",
) -> tuple[int, int]:
    """The dual-sink epoch body (T5/T7) in batch form: split one parsed
    DataFrame and write both branches — valid rows to the valid sink,
    enveloped rejects to the DLQ sink.  (The streaming counterpart is
    ``start_order_pipeline``, whose foreachBatch body performs the same
    split per epoch.)

    Returns (n_valid, n_rejected) for THIS call's input — the
    reference's processing counters (A9, avro_order_consumer.py:79-84)
    — counted from the split itself, not by rescanning the sinks
    (sinks are append-mode and may hold earlier batches).
    """
    # One scan for both writes and both counts: without the persist,
    # each write/count would re-scan the source and re-split.
    orders = orders.persist()
    try:
        valid, invalid = split_valid_invalid(orders, key=key, value=value, id_col=id_col)
        valid.write.mode("append").parquet(valid_sink)
        env = dlq_envelope(invalid, source_topic=source_topic)
        env.write.mode("append").parquet(dlq_sink)
        return valid.count(), invalid.count()
    finally:
        orders.unpersist()


def start_order_pipeline(
    orders_stream: DataFrame,
    valid_sink: str,
    dlq_sink: str,
    checkpoint: str,
    key: str = "product",
    value: str = "price",
    id_col: str | None = "orderId",
    retry_handler=None,
    aggregated_sink: str | None = None,
):
    """Streaming entry: one foreachBatch query writing the sinks per
    epoch (at-least-once to non-transactional sinks; exactly-once with
    transactional ones), optional retry envelope around the body.

    ``aggregated_sink`` implements the reference's `orders-aggregated`
    topic — created in scripts/setup_topics.sh:31-37 but never written
    by any reference code (SURVEY.md §1): each epoch appends a snapshot
    of the per-key stats over ALL valid data so far, stamped with the
    epoch id (downstream consumers read the latest epoch, or the
    history as a changelog).
    """

    def body(df: DataFrame, epoch_id: int) -> None:
        valid, invalid = split_valid_invalid(df, key=key, value=value, id_col=id_col)
        valid.write.mode("append").parquet(valid_sink)
        dlq_envelope(invalid).write.mode("append").parquet(dlq_sink)
        if aggregated_sink is not None:
            spark = df.sparkSession
            all_valid = spark.read.parquet(valid_sink)
            snapshot = product_price_stats(all_valid, key=key, value=value)
            snapshot.withColumn("epoch_id", F.lit(epoch_id)).write.mode(
                "append"
            ).parquet(aggregated_sink)

    fn = retry_handler.wrap_foreach_batch(body) if retry_handler else body
    return (
        orders_stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
