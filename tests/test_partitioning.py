"""Partitioned writes + partition pruning, and stream-stream joins —
the remaining physical-layout and streaming-join scale stories."""

from __future__ import annotations

import io
import contextlib

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes_scans(spark, tmp_path):
    """Writing partitionBy(event_type) and filtering on it must prune at
    the source: the plan carries a PartitionFilters entry and no
    post-scan filter on the partition column."""
    out = str(tmp_path / "events_parted")
    ev = load_table(spark, SF, "events")
    ev.write.partitionBy("event_type").parquet(out)

    back = spark.read.parquet(out).filter(F.col("event_type") == "purchase")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        back.explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan and "purchase" in plan
    # correctness: pruned read equals filtered full read
    expected = ev.filter(F.col("event_type") == "purchase").count()
    assert back.count() == expected


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream interval join: purchases join clicks of
    the same user within the preceding hour — the streaming twin of the
    batch range join (clicks_before_purchase)."""
    import datetime as dt

    def write(path, rows, schema):
        parsed = [(k, dt.datetime.fromisoformat(ts), float(v)) for k, ts, v in rows]
        spark.createDataFrame(parsed, schema).coalesce(1).write.mode("append").parquet(path)

    clicks_src = str(tmp_path / "clicks")
    buys_src = str(tmp_path / "buys")
    write(clicks_src, [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:30:00", 2.0),
        (2, "2024-01-01 09:00:00", 3.0),   # > 1h before the purchase
    ], "user_id long, ts timestamp_ntz, value double")
    write(buys_src, [
        (1, "2024-01-01 10:45:00", 50.0),
        (2, "2024-01-01 10:30:00", 70.0),
    ], "user_id long, ts timestamp_ntz, value double")

    clicks = (
        spark.readStream.schema("user_id long, ts timestamp_ntz, value double")
        .parquet(clicks_src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .select(F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
    )
    buys = (
        spark.readStream.schema("user_id long, ts timestamp_ntz, value double")
        .parquet(buys_src)
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", "2 hours")
        .select(F.col("user_id").alias("b_user"), F.col("ts").alias("b_ts"))
    )
    joined = buys.join(
        clicks,
        (F.col("c_user") == F.col("b_user"))
        & (F.col("c_ts") >= F.col("b_ts") - F.expr("INTERVAL 1 HOUR"))
        & (F.col("c_ts") <= F.col("b_ts")),
    )
    q = (
        joined.writeStream.format("parquet")
        .option("path", str(tmp_path / "out"))
        .option("checkpointLocation", str(tmp_path / "chk"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.read.parquet(str(tmp_path / "out")).collect()
    # user 1: both clicks within the hour; user 2: none (too early)
    got = sorted((r["b_user"], r["c_ts"].isoformat()) for r in rows)
    assert got == [(1, "2024-01-01T10:00:00"), (1, "2024-01-01T10:30:00")]


def test_retention_cohorts_is_two_shuffles(spark):
    """user_retention_cohorts must stay the fused one-pass form: one
    exchange for the user-keyed (min, week-set) aggregation and one for
    the tiny cohort grid — a refactor back to min-agg + distinct + join
    (three shuffles) would show up here."""
    import io
    import contextlib

    from kafka_avro_order_processing_spark.plans.registry import QUERIES

    df = QUERIES["user_retention_cohorts"].fn(spark, "/root/testdata/sf0.001")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    # the details section lists every node once as "(N) NodeName"
    n_exchanges = sum(
        1 for line in plan.splitlines()
        if line.strip().startswith("(") and "Exchange" in line and "Reused" not in line
    )
    assert n_exchanges == 2, f"expected 2 exchanges, plan:\n{plan}"
