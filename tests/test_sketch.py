"""Count-min sketch: the one-sided guarantee (est >= exact, always),
fixed sketch size, and mergeability (the property that makes it a
distributed/streaming summary).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.sketch import (
    CMS_DEPTH,
    CMS_WIDTH,
    cms_build,
    cms_estimate,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_one_sided_guarantee_and_size(spark):
    ev = load_table(spark, SF, "events")
    sketch = cms_build(ev, "user_id")
    assert sketch.count() <= CMS_DEPTH * CMS_WIDTH
    exact = ev.groupBy("user_id").agg(F.count("*").alias("exact"))
    est = cms_estimate(sketch, exact.select("user_id"), "user_id")
    rows = exact.join(est, "user_id").collect()
    assert rows
    assert all(r["est"] >= r["exact"] for r in rows)


def test_merge_equals_whole(spark):
    # CMS(A ++ B) == cellwise-sum(CMS(A), CMS(B)): the property that
    # lets executors sketch partitions independently and merge.
    ev = load_table(spark, SF, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = (
        cms_build(a, "user_id")
        .unionByName(cms_build(b, "user_id"))
        .groupBy("depth", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )
    whole = cms_build(ev, "user_id")
    as_set = lambda df: {  # noqa: E731
        (r["depth"], r["bucket"], r["cnt"]) for r in df.collect()
    }
    assert as_set(merged) == as_set(whole)


def test_unseen_keys_bounded_by_collisions(spark):
    ev = load_table(spark, SF, "events")
    sketch = cms_build(ev, "user_id")
    n = ev.count()
    probes = spark.createDataFrame(
        [(10_000 + i,) for i in range(20)], "user_id long"
    )
    rows = cms_estimate(sketch, probes, "user_id").collect()
    # unseen keys may collide but never exceed total mass; with 4
    # independent rows over 256 buckets the min is far below N
    assert all(0 <= r["est"] <= n for r in rows)


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

def test_hll_registers_idempotent_and_mergeable(spark):
    from pyspark.sql import functions as F2
    from kafka_avro_order_processing_spark.operators.sketch import hll_registers

    ev = load_table(spark, SF, "events")
    whole = hll_registers(ev, "user_id")
    # duplicating every row must not move a single register (MAX)
    doubled = hll_registers(ev.unionByName(ev), "user_id")
    as_set = lambda df: {(r["bucket"], r["M"]) for r in df.collect()}  # noqa: E731
    assert as_set(whole) == as_set(doubled)
    # merge of split sketches == whole sketch (cellwise MAX)
    a = hll_registers(ev.filter(F2.col("event_id") % 2 == 0), "user_id")
    b = hll_registers(ev.filter(F2.col("event_id") % 2 == 1), "user_id")
    merged = (
        a.unionByName(b).groupBy("bucket").agg(F2.max("M").cast("int").alias("M"))
    )
    assert as_set(whole) == as_set(merged)


def test_hll_corrected_estimate_accuracy(spark):
    import math

    from kafka_avro_order_processing_spark.operators.sketch import (
        HLL_BUCKETS,
        hll_estimate,
        hll_registers,
    )
    from pyspark.sql import functions as F2

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    row = hll_estimate(hll_registers(ev, "user_id")).collect()[0]
    exact = ev.agg(F2.countDistinct("user_id")).collect()[0][0]
    est = row["hll_raw_estimate"]
    # linear-counting correction (engine-independent here: plain Python)
    if est <= 2.5 * HLL_BUCKETS and row["zero_registers"] > 0:
        est = HLL_BUCKETS * math.log(HLL_BUCKETS / row["zero_registers"])
    rse = 1.04 / math.sqrt(HLL_BUCKETS)
    assert abs(est - exact) <= 4 * rse * exact, (est, exact)


# ---------------------------------------------------------------------------
# Histogram quantiles
# ---------------------------------------------------------------------------

def test_histogram_quantiles_within_one_bucket_of_exact(spark):
    from kafka_avro_order_processing_spark.operators.sketch import (
        HIST_WIDTH_CENTS,
        histogram_build,
        histogram_quantiles,
    )

    ev = load_table(spark, "/root/testdata/sf0.01", "events")
    got = {
        r["quantile"]: r["est_value"]
        for r in histogram_quantiles(histogram_build(ev, "value")).collect()
    }
    exact = ev.selectExpr(
        "percentile(value, array(0.5, 0.9, 0.99)) AS p"
    ).collect()[0]["p"]
    width = HIST_WIDTH_CENTS / 100.0
    for q, ex in zip((0.5, 0.9, 0.99), exact):
        assert abs(got[q] - ex) <= width, (q, got[q], ex)


def test_histogram_merge_equals_whole(spark):
    from kafka_avro_order_processing_spark.operators.sketch import histogram_build

    ev = load_table(spark, SF, "events")
    a = histogram_build(ev.filter(F.col("event_id") % 2 == 0), "value")
    b = histogram_build(ev.filter(F.col("event_id") % 2 == 1), "value")
    merged = (
        a.unionByName(b).groupBy("bucket").agg(F.sum("cnt").alias("cnt"))
    )
    whole = histogram_build(ev, "value")
    as_set = lambda df: {(r["bucket"], r["cnt"]) for r in df.collect()}  # noqa: E731
    assert as_set(merged) == as_set(whole)
