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


def drain_to_df(
    stream_df: DataFrame,
    output_mode: str,
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Run a bounded streaming plan to completion (availableNow,
    cluster-sized shuffle partitions, throwaway checkpoint) and return
    the result as a batch DataFrame.

    The result stays DISTRIBUTED end-to-end — no memory sink:

    - **append**: straight into a parquet file sink (executor-side
      writes; a per-record twin's output is O(input) and must never
      funnel through the driver).
    - **complete**: foreachBatch overwrites a parquet snapshot each
      epoch; the final epoch leaves the final state.  O(keys) per
      epoch — fine for drains, but prefer update at scale.
    - **update** (requires `key_cols`): each epoch APPENDS only its
      changed keys, stamped with the epoch id — an O(changed-keys)
      changelog, the scale-preferred mode (complete rewrites ALL state
      every epoch).  The drain folds the changelog with
      latest-epoch-wins per key (an update epoch emits a key at most
      once, so the fold is unambiguous).

    The returned DataFrame is a lazy scan of that sink, so downstream
    consumers keep whatever parallelism they want.  Scratch (sink +
    checkpoint) lives in a per-call temp dir that is left for the
    OS/tmp reaper — the returned plan reads from it lazily, so it
    cannot be deleted here.
    """
    spark = stream_df.sparkSession
    tag = uuid.uuid4().hex[:12]
    base = tempfile.mkdtemp(prefix=f"drain_{tag}_")
    sink, chk = f"{base}/sink", f"{base}/chk"
    with _scoped_shuffle_partitions(spark):
        if output_mode == "append":
            writer = (
                stream_df.writeStream.outputMode("append")
                .format("parquet")
                .option("path", sink)
            )
        elif output_mode == "complete":

            def _snapshot(df: DataFrame, epoch_id: int) -> None:
                df.write.mode("overwrite").parquet(sink)

            writer = stream_df.writeStream.outputMode("complete").foreachBatch(
                _snapshot
            )
        elif output_mode == "update":
            if not key_cols:
                raise ValueError("drain_to_df: update mode needs key_cols")

            def _delta(df: DataFrame, epoch_id: int) -> None:
                df.withColumn("__epoch", F.lit(epoch_id)).write.mode(
                    "append"
                ).parquet(sink)

            writer = stream_df.writeStream.outputMode("update").foreachBatch(
                _delta
            )
        else:
            raise ValueError(f"drain_to_df: unsupported mode {output_mode!r}")
        q = (
            writer.option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    try:
        out = spark.read.parquet(sink)
    except Exception:
        # empty stream: no epoch ever wrote the sink
        return spark.createDataFrame([], schema=stream_df.schema)
    if output_mode == "update":
        from pyspark.sql import Window

        w = Window.partitionBy(*key_cols).orderBy(F.desc("__epoch"))
        out = (
            out.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn", "__epoch")
        )
    return out


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
    by any reference code (SURVEY.md §1) — as an INCREMENTAL changelog:
    each epoch writes only that epoch's mergeable per-key partials
    (count / decimal sum / min / max), so per-epoch work is O(epoch),
    not O(all data so far).  The partials land in an epoch_id-partitioned
    directory with dynamic partition overwrite, so a replayed epoch
    (at-least-once foreachBatch) overwrites its own partition instead of
    double-appending — the changelog is exactly-once even though the
    row sinks are at-least-once.  ``read_aggregated_snapshot`` folds the
    changelog into the current per-key stats, bit-identical to the batch
    ``product_price_stats`` over all valid rows.
    """

    def body(df: DataFrame, epoch_id: int) -> None:
        # Persist the epoch once: three consumers (valid write, DLQ
        # write, partials write) would otherwise each re-scan the
        # micro-batch source and re-run the validation split — the same
        # reason order_pipeline_batch persists its input.
        df = df.persist()
        try:
            valid, invalid = split_valid_invalid(df, key=key, value=value, id_col=id_col)
            valid.write.mode("append").parquet(valid_sink)
            dlq_envelope(invalid).write.mode("append").parquet(dlq_sink)
            if aggregated_sink is not None:
                partials = valid.groupBy(F.col(key)).agg(
                    F.count("*").alias("order_count"),
                    # keep the exact decimal representation in the log;
                    # merge stays associative, cast to double only at read
                    F.sum(F.col(value).cast("decimal(18,2)")).alias("price_sum_dec"),
                    F.min(value).alias("minimum_price"),
                    F.max(value).alias("maximum_price"),
                ).withColumn("epoch_id", F.lit(epoch_id))
                (
                    partials.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("epoch_id")
                    .parquet(aggregated_sink)
                )
        finally:
            df.unpersist()

    fn = retry_handler.wrap_foreach_batch(body) if retry_handler else body
    return (
        orders_stream.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def run_watermarked_window_stream(
    spark: SparkSession,
    sf_dir: str,
    delay: str = "17 minutes",
) -> DataFrame:
    """T4 driver-visible: append-mode tumbling-window aggregation with a
    watermark, run as TWO controlled micro-batch rounds sharing one
    checkpoint (the only deterministic way to order file-source batches
    — availableNow with maxFilesPerTrigger does not guarantee order for
    same-mtime files):

    - round 1 streams every event EXCEPT one seeded late row (the
      globally earliest event); at round end the watermark stands at
      max(ts) - delay and append mode finalizes every window whose end
      the watermark has passed;
    - round 2 delivers the seeded row, which is now far behind the
      watermark — state for its window was already evicted, so the row
      is DROPPED and the sink is unchanged.

    The result is therefore the hourly windows with end <= max(ts) -
    delay, counting all events except the seeded late one — exactly the
    oracle's batch-SQL form.  The watermark delay is deliberately an odd
    17 minutes so window ends (hour boundaries) never tie with the
    watermark.
    """
    import shutil

    ev = load_table(spark, sf_dir, "events")
    late_id = ev.orderBy("ts", "event_id").limit(1).collect()[0]["event_id"]
    base = tempfile.mkdtemp(prefix=f"wm_{uuid.uuid4().hex[:8]}_")
    src, sink, chk = f"{base}/src", f"{base}/sink", f"{base}/chk"

    # Watermarks need TIMESTAMP (session UTC), not TIMESTAMP_NTZ.
    staged = ev.withColumn("ts", F.col("ts").cast("timestamp"))

    def run_round(schema) -> None:
        stream = spark.readStream.schema(schema).parquet(src)
        agg = (
            stream.withWatermark("ts", delay)
            .groupBy(F.window("ts", "1 hour"))
            .agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("sum_value"),
            )
            .select(
                F.col("window.start").cast("timestamp_ntz").alias("window_start"),
                "n_events",
                "sum_value",
            )
        )
        with _scoped_shuffle_partitions(spark):
            q = (
                agg.writeStream.outputMode("append")
                .format("parquet")
                .option("path", sink)
                .option("checkpointLocation", chk)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()

    try:
        staged.filter(F.col("event_id") != late_id).write.mode("append").parquet(src)
        schema = spark.read.parquet(src).schema
        run_round(schema)
        # seed the late arrival and resume from the same checkpoint
        staged.filter(F.col("event_id") == late_id).write.mode("append").parquet(src)
        run_round(schema)
        out = spark.read.parquet(sink)
        # Driver round-trip ONLY because the scratch sink is deleted in
        # the finally below; cardinality is O(distinct hour windows) —
        # bounded by the stream's time span (720 rows/month of hourly
        # data), never by event volume.  If windows ever got fine
        # enough to matter, copy the sink to a stable temp table and
        # return a lazy scan instead.
        return spark.createDataFrame(out.collect(), schema=out.schema)
    finally:
        # per-call scratch (staged events copy, sink, checkpoint) —
        # repeated driver/bench runs must not accumulate /tmp disk
        shutil.rmtree(base, ignore_errors=True)


def read_aggregated_snapshot(
    spark: SparkSession, aggregated_sink: str, key: str = "product"
) -> DataFrame:
    """Fold the aggregated changelog into current per-key stats.

    O(changelog) = O(keys x epochs) — never O(raw rows).  Decimal
    partial sums merge associatively, so the result is bit-identical to
    ``product_price_stats`` over the union of all valid rows; downstream
    consumers wanting history instead read the changelog directly.
    """
    log = spark.read.parquet(aggregated_sink)
    total_dec = F.sum("price_sum_dec")
    return log.groupBy(F.col(key)).agg(
        F.sum("order_count").alias("order_count"),
        total_dec.cast("double").alias("price_sum"),
        (total_dec.cast("double") / F.sum("order_count")).alias("average_price"),
        F.min("minimum_price").alias("minimum_price"),
        F.max("maximum_price").alias("maximum_price"),
    )
