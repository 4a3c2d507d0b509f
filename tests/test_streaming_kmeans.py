"""Streaming k-means: the streaming Lloyd rounds must compute the
batch answer bit-for-bit, and the per-round sums must not depend on
how the stream is micro-batched (decimal associativity — the property
that makes a streaming Lloyd round well-defined)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.similarity import (
    MEAN_SCALE,
    ivf_assign,
)
from kafka_avro_order_processing_spark.streaming.kmeans import _assign_expr
from kafka_avro_order_processing_spark.streaming.pipeline import drain_to_df

SF_DIR = "/root/testdata/sf0.001"


def test_streaming_matches_batch_kmeans_bit_for_bit(spark):
    from kafka_avro_order_processing_spark.plans.registry import QUERIES

    batch = sorted(
        tuple(map(repr, r))
        for r in QUERIES["ivf_kmeans_refine"].fn(spark, SF_DIR).collect()
    )
    stream = sorted(
        tuple(map(repr, r))
        for r in QUERIES["streaming_kmeans_refine"].fn(spark, SF_DIR).collect()
    )
    assert batch == stream


def test_round_sums_independent_of_microbatching(spark, tmp_path):
    """Split the vectors over 3 files and feed them one file per
    trigger (3 micro-batches): the drained per-(cell,dim) sums must
    equal the batch single-pass aggregation exactly."""
    src = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    path = str(tmp_path / "vecs")
    src.repartition(3).write.parquet(path)

    seeds = sorted(
        (int(r["vec_id"]), [float(x) for x in r["embedding"]])
        for r in src.filter("vec_id < 8").collect()
    )
    stream = (
        spark.readStream.schema(src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    with_n = stream.select(
        F.col("embedding"),
        F.expr(
            "sqrt(aggregate(zip_with(embedding, embedding, "
            "(x, y) -> cast(x as double) * cast(y as double)), 0D, (acc, v) -> acc + v))"
        ).alias("_norm"),
    )
    assigned = with_n.select(
        _assign_expr(seeds, "_norm", "embedding"), F.col("embedding")
    )
    elems = assigned.select(
        "centroid_id", F.posexplode(F.col("embedding")).alias("dim", "val")
    )
    agg = elems.groupBy("centroid_id", "dim").agg(
        F.sum(
            F.expr(f"CAST(CAST(val AS DOUBLE) * {MEAN_SCALE}D AS DECIMAL(38,0))")
        ).alias("ssum"),
        F.count("*").alias("n"),
    )
    got = sorted(
        (r["centroid_id"], r["dim"], str(r["ssum"]), r["n"])
        for r in drain_to_df(agg, "complete").collect()
    )

    cents = src.filter("vec_id < 8").select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    batch_assigned = ivf_assign(src, cents)
    batch_elems = src.select(
        "vec_id", F.posexplode(F.col("embedding")).alias("dim", "val")
    )
    want = sorted(
        (r["centroid_id"], r["dim"], str(r["ssum"]), r["n"])
        for r in batch_assigned.join(batch_elems, "vec_id")
        .groupBy("centroid_id", "dim")
        .agg(
            F.sum(
                F.expr(f"CAST(CAST(val AS DOUBLE) * {MEAN_SCALE}D AS DECIMAL(38,0))")
            ).alias("ssum"),
            F.count("*").alias("n"),
        )
        .collect()
    )
    assert got == want
