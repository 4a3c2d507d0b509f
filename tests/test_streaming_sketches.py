"""Streaming sketch twins (streaming/sketches.py): the drained
sharded KMV changelog folds to the EXACT batch sketch (bit-for-bit,
any shard count); the drained MG candidate set + exact_recount equals
the batch heavy_hitters frame; state persists across multiple update
epochs (maxFilesPerTrigger=1)."""

from __future__ import annotations

from pyspark.sql import Row
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.heavy import (
    exact_recount,
    heavy_hitters,
)
from kafka_avro_order_processing_spark.operators.kmv import kmv_sketch
from kafka_avro_order_processing_spark.sources.tables import load_table
from kafka_avro_order_processing_spark.streaming.pipeline import drain_to_df
from kafka_avro_order_processing_spark.streaming.sketches import (
    merge_shard_sketches,
    streaming_kmv_sketch,
    streaming_mg_candidates,
)

SF = "/root/testdata/sf0.001"


def _epoch_stream(spark, df, src: str, n_files: int = 4):
    """Write df as n_files parquet files and read it back as a
    maxFilesPerTrigger=1 stream -> n_files update epochs."""
    df.repartition(n_files).write.mode("overwrite").parquet(src)
    return (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )


def test_streaming_kmv_equals_batch(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("user_id")
    stream = _epoch_stream(spark, ev, str(tmp_path / "src"))
    shard_rows = drain_to_df(
        streaming_kmv_sketch(stream, "user_id", k=32, n_shards=4),
        "update",
        key_cols=("shard",),
    )
    got = merge_shard_sketches(shard_rows, 32).collect()[0]
    want = kmv_sketch(ev, "user_id", k=32).collect()[0]
    assert got["hashes"] == want["hashes"]
    assert got["n_kept"] == want["n_kept"]


def test_streaming_kmv_shard_count_invariant(spark, tmp_path):
    ev = load_table(spark, SF, "events").select("user_id")
    merged = []
    for i, shards in enumerate((1, 8)):
        stream = _epoch_stream(spark, ev, str(tmp_path / f"s{i}"))
        rows = drain_to_df(
            streaming_kmv_sketch(stream, "user_id", k=16, n_shards=shards),
            "update",
            key_cols=("shard",),
        )
        merged.append(merge_shard_sketches(rows, 16).collect()[0]["hashes"])
    assert merged[0] == merged[1]


def _skew(spark):
    rows = (
        [Row(k="hot")] * 2000 + [Row(k="warm")] * 700
        + [Row(k=f"cold{i}") for i in range(1500)]
    )
    return spark.createDataFrame(rows)


def test_streaming_mg_plus_recount_equals_batch(spark, tmp_path):
    df = _skew(spark)
    stream = _epoch_stream(spark, df, str(tmp_path / "src"), n_files=4)
    drained = drain_to_df(
        streaming_mg_candidates(stream, "k", k=9, n_shards=4),
        "update",
        key_cols=("shard", "key"),
    )
    cand = drained.select(F.col("key").alias("k")).distinct()
    got = exact_recount(df, cand, "k", k=9).collect()
    want = heavy_hitters(df, "k", k=9).collect()
    canon = lambda rows: sorted((r["k"], r["freq"], r["n_total"]) for r in rows)
    assert canon(got) == canon(want)
    assert canon(got) == [("hot", 2000, 4200), ("warm", 700, 4200)]


def test_streaming_mg_heaviness_across_epochs(spark, tmp_path):
    """A key no single micro-batch would flag (interleaved with the
    tail in every file) must still surface: per-shard MG state is
    carried across epochs."""
    rows = [Row(k="steady")] * 800 + [Row(k=f"c{i}") for i in range(2400)]
    df = spark.createDataFrame(rows)
    stream = _epoch_stream(spark, df, str(tmp_path / "src"), n_files=8)
    drained = drain_to_df(
        streaming_mg_candidates(stream, "k", k=7, n_shards=2),
        "update",
        key_cols=("shard", "key"),
    )
    keys = {r["key"] for r in drained.collect()}
    assert "steady" in keys  # freq 800 > 3200/8 = 400
    cand = drained.select(F.col("key").alias("k")).distinct()
    got = {(r["k"], r["freq"]) for r in exact_recount(df, cand, "k", k=7).collect()}
    assert got == {("steady", 800)}


def test_streaming_kll_weight_and_error(spark, tmp_path):
    """Drained sharded-KLL snapshots fold to a global sketch with
    EXACT weight conservation and merged-budget rank error."""
    import math

    from kafka_avro_order_processing_spark.operators.kll import (
        kll_quantiles,
    )
    from kafka_avro_order_processing_spark.streaming.sketches import (
        merge_shard_kll,
        streaming_kll_sketch,
    )

    ev = load_table(spark, SF, "events").select("value")
    stream = _epoch_stream(spark, ev, str(tmp_path / "src"))
    drained = drain_to_df(
        streaming_kll_sketch(stream, "value", k=128, n_shards=4),
        "update",
        key_cols=("shard",),
    )
    merged = merge_shard_kll(drained, 128)
    rows = merged.collect()
    n = ev.count()
    assert sum(2 ** r["level"] for r in rows) == n
    vals = sorted(r["value"] for r in ev.collect())
    import bisect

    ests = {r["q"]: r["est"] for r in
            kll_quantiles(merged, (0.25, 0.5, 0.9)).collect()}
    budget = 2 * n * math.log2(max(n / 128, 2)) / 128 + 4 * 128
    for q, est in ests.items():
        err = abs(bisect.bisect_right(vals, est) - q * n)
        assert err <= budget, (q, est, err, budget)


def test_streaming_priority_sample_equals_batch(spark, tmp_path):
    """Drained sharded snapshots fold to EXACTLY the batch sample:
    same keys, weights, priorities, tau, est_weight."""
    from kafka_avro_order_processing_spark.operators.sampling import (
        priority_sample,
    )
    from kafka_avro_order_processing_spark.streaming.sketches import (
        merge_shard_samples,
        streaming_priority_sample,
    )

    ev = (
        load_table(spark, SF, "events")
        .filter(F.col("value") > 0)
        .select("event_id", "value")
    )
    stream = _epoch_stream(spark, ev, str(tmp_path / "src"))
    drained = drain_to_df(
        streaming_priority_sample(stream, "event_id", "value", k=20,
                                  n_shards=4),
        "update",
        key_cols=("shard",),
    )
    got = sorted(
        (r["key"], r["weight"], r["priority"], r["tau"], r["est_weight"])
        for r in merge_shard_samples(drained, 20).collect()
    )
    want = sorted(
        (str(r["event_id"]), float(r["value"]), r["priority"], r["tau"],
         r["est_weight"])
        for r in priority_sample(ev, "event_id", "value", k=20).collect()
    )
    assert got == want


def test_streaming_bloom_equals_batch(spark, tmp_path):
    """Drained streaming filter == batch filter, word for word."""
    from kafka_avro_order_processing_spark.operators.bloom import (
        bloom_build,
    )
    from kafka_avro_order_processing_spark.streaming.sketches import (
        streaming_bloom_build,
    )

    ev = load_table(spark, SF, "events").select("user_id")
    stream = _epoch_stream(spark, ev, str(tmp_path / "src"))
    drained = drain_to_df(
        streaming_bloom_build(stream, "user_id", 4096, 5),
        "update",
        key_cols=("word",),
    )
    got = {r["word"]: r["bits"] for r in drained.collect()}
    want = {r["word"]: r["bits"] for r in
            bloom_build(ev, "user_id", 4096, 5).collect()}
    assert got == want


def test_streaming_weighted_mg_plus_recount_equals_batch(spark, tmp_path):
    """Weighted candidates from the stream + the batch recount EQUAL
    the batch weighted_heavy_hitters frame."""
    from kafka_avro_order_processing_spark.operators.heavy import (
        weighted_heavy_hitters,
    )
    from kafka_avro_order_processing_spark.streaming.sketches import (
        streaming_weighted_mg_candidates,
    )

    rows = (
        [Row(k="whale", w=50.0)] * 60          # 3000
        + [Row(k="mid", w=2.0)] * 400          # 800
        + [Row(k=f"c{i}", w=1.0) for i in range(2200)]
    )
    df = spark.createDataFrame(rows)
    stream = _epoch_stream(spark, df, str(tmp_path / "src"), n_files=4)
    drained = drain_to_df(
        streaming_weighted_mg_candidates(stream, "k", "w", k=7, n_shards=3),
        "update",
        key_cols=("shard", "key"),
    )
    keys = {r["key"] for r in drained.collect()}
    assert "whale" in keys  # weight 3000 > 6000/8
    # exact weighted recount over candidates only, compared to batch
    want = {(r["k"], r["weight_sum"]) for r in
            weighted_heavy_hitters(df, "k", "w", k=7).collect()}
    cand = drained.select(F.col("key").alias("k")).distinct()
    from pyspark.sql import functions as _F

    sums = (
        df.join(_F.broadcast(cand.withColumn("_c", _F.lit(True))),
                on="k", how="left")
        .select(_F.when(_F.col("_c"), _F.col("k")).alias("_k"),
                _F.col("w").cast("decimal(18,2)").alias("_w"))
        .groupBy("_k").agg(_F.sum("_w").alias("ws"))
    )
    tot = sums.agg(_F.sum("ws").alias("wt"))
    got = {
        (r["_k"], float(r["ws"]))
        for r in sums.filter(_F.col("_k").isNotNull())
        .crossJoin(_F.broadcast(tot))
        .filter(_F.col("ws") * 8 > _F.col("wt"))
        .collect()
    }
    # W = 6000, threshold W/8 = 750: whale (3000) AND mid (800) qualify
    assert got == want == {("whale", 3000.0), ("mid", 800.0)}
