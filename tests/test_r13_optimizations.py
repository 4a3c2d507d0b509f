"""Focused pins for the r13 optimization round's operator-internal
changes.  Each test pins an optimization's EQUIVALENCE (rows identical
to the pre-optimization form, rebuilt inline) or its plan-shape claim,
so a later refactor cannot silently regress either the speedup or the
semantics.

Changes covered (see OPTIMIZATION_r13.md):
- dedup._spread skips the parallelism repartition when the scan is
  already at least cluster-wide (guide §2.4: remove shuffles the data's
  partitioning already provides).
- dedup.near_dup_pairs rebalances the signature table before caching
  (cache partition counts derive from data size, not inherited width).
- asof.asof_join_same_source: one scan + conditional side-tagging ==
  the generic union-of-two-filtered-scans asof_join.
- registry tfidf: document frequency derived from the tf table
  (COUNT(*) over distinct (doc, token) pairs == COUNT(DISTINCT doc)).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.asof import (
    asof_join,
    asof_join_same_source,
)
from kafka_avro_order_processing_spark.operators import dedup as D


def test_spread_skips_when_scan_already_parallel(spark):
    par = spark.sparkContext.defaultParallelism
    wide = spark.range(0, 1000).withColumnRenamed("id", "doc_id").repartition(par + 2)
    assert D._spread(wide, "doc_id").rdd.getNumPartitions() == par + 2, (
        "_spread must be a no-op when the input already has >= "
        "defaultParallelism partitions — at scale the scan is already "
        "parallel and the repartition would shuffle the whole corpus"
    )
    narrow = spark.range(0, 1000).withColumnRenamed("id", "doc_id").coalesce(1)
    assert D._spread(narrow, "doc_id").rdd.getNumPartitions() == par, (
        "_spread must still widen a narrower-than-cluster scan (the "
        "CPU-bound hash work would otherwise run on one core)"
    )


def test_near_dup_pairs_unchanged_by_spread_and_rebalance(spark):
    """The signature-table rebalance and the conditional spread are pure
    plan-shape changes: rows must equal the never-spread form built from
    the same internals."""
    rows = [
        (i, f"alpha beta gamma delta epsilon zeta {i % 7} eta theta")
        for i in range(60)
    ] + [(100 + i, "alpha beta gamma delta epsilon zeta X eta theta") for i in range(4)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    def never_spread(df, id_col="doc_id", text_col="text", n=3, distinct=True, spread=True):
        return D.shingle_rows(df, id_col, text_col, n, distinct, spread=False)

    got = {tuple(r) for r in D.near_dup_pairs(docs).collect()}
    want = {tuple(r) for r in D.near_dup_pairs(docs, shingler=never_spread).collect()}
    assert got == want and len(got) > 0


def test_asof_same_source_equals_generic_asof(spark):
    rows = []
    # interleaved purchases/clicks with ts ties, users with no clicks,
    # and duplicate right timestamps exercising the tiebreak
    data = [
        (1, "u1", 10, 1.0, "click"),
        (2, "u1", 10, 2.0, "click"),      # same ts — greatest event_id wins
        (3, "u1", 10, 9.0, "purchase"),   # tie with right ts: right counts as prior
        (4, "u1", 15, 9.5, "purchase"),
        (5, "u2", 5, 7.0, "purchase"),    # no prior click -> NULL match
        (6, "u2", 6, 3.0, "click"),
        (7, "u2", 8, 8.0, "purchase"),
        (8, "u3", 1, 4.0, "view"),        # matches neither side -> dropped
    ]
    for r in data:
        rows.append(r)
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, ts long, value double, event_type string"
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    generic = asof_join(
        purchases, clicks, on="user_id", ts="ts",
        right_value_cols=("value",), right_tiebreak="event_id",
    ).select("event_id", "user_id", "ts", "value", "ts_asof", "value_asof")
    single = asof_join_same_source(
        ev, on="user_id",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "click",
        ts="ts",
        left_cols=("event_id", "user_id", "ts", "value"),
        right_value_cols=("value",), right_tiebreak="event_id",
    ).select("event_id", "user_id", "ts", "value", "ts_asof", "value_asof")
    assert generic.columns == single.columns
    g = {tuple(r) for r in generic.collect()}
    s = {tuple(r) for r in single.collect()}
    assert g == s and len(g) == 4  # one output row per purchase


def test_asof_same_source_single_scan_plan(spark):
    """The plan-shape claim: ONE scan of the source, not two."""
    import contextlib
    import io

    ev = spark.createDataFrame(
        [(1, "u", 1, 1.0, "purchase")],
        "event_id long, user_id string, ts long, value double, event_type string",
    )
    df = asof_join_same_source(
        ev, on="user_id",
        left_pred=F.col("event_type") == "purchase",
        right_pred=F.col("event_type") == "click",
        ts="ts", right_value_cols=("value",), right_tiebreak="event_id",
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue().split("\n\n")[0]
    assert plan.count("Scan") == 1, plan
    assert "Union" not in plan, plan


def test_tfidf_df_from_tf_equals_count_distinct(spark):
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "a d d"), (3, "b b b"), (4, "a")],
        "doc_id long, text string",
    )
    tok = docs.select(F.col("doc_id"), F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count("*").alias("tf"))
    via_tf = {tuple(r) for r in tf.groupBy("token").agg(F.count("*").alias("df")).collect()}
    direct = {
        tuple(r)
        for r in tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df")).collect()
    }
    assert via_tf == direct
