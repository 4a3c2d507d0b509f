"""Python UDTF surface: registration, LATERAL join, and agreement with
the codegen'd shingle formulation."""

from __future__ import annotations

from kafka_avro_order_processing_spark.functions.udtfs import register_udtfs
from kafka_avro_order_processing_spark.operators.dedup import shingle_rows


def test_udtf_direct_call(spark):
    register_udtfs(spark)
    rows = spark.sql("SELECT * FROM word_ngrams('a b c d', 2)").collect()
    assert [(r["pos"], r["shingle"]) for r in rows] == [
        (0, "a b"), (1, "b c"), (2, "c d"),
    ]


def test_udtf_lateral_join_matches_window_shingles(spark):
    register_udtfs(spark)
    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "tiny doc"), (3, "a b c")],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    via_udtf = spark.sql(
        "SELECT d.doc_id, g.shingle FROM udtf_docs d, LATERAL word_ngrams(d.text, 3) g"
    )
    got = sorted((r["doc_id"], r["shingle"]) for r in via_udtf.distinct().collect())
    expected = sorted(
        (r["doc_id"], r["shingle"]) for r in shingle_rows(docs).collect()
    )
    assert got == expected  # doc 2 (<3 tokens) absent from both
