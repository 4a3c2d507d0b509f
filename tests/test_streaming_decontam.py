"""Streaming decontamination twin: drained tags BIT-match the batch
operator on the same rows — crafted edge docs, the documents table,
and multi-epoch micro-batching.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.decontam import contamination_tags
from kafka_avro_order_processing_spark.sources.tables import load_table
from kafka_avro_order_processing_spark.streaming.decontam import (
    streaming_contamination_tags,
)

SF = "/root/testdata/sf0.001"

DOCS = [
    (1, "a b c d e f"),
    (2, "x y z w q"),
    (3, "p q"),
    (4, ""),
    (5, None),
    (6, "m b c d m m"),
    (7, "ap qx"),
]
EVALS = [(10, "z b c d k"), (11, "p q"), (12, "")]
N = 3


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_bit_matches_batch_on_edge_docs(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    evals = spark.createDataFrame(EVALS, "eval_id long, text string")
    want = _rows(contamination_tags(docs, evals, n=N))

    d = str(tmp_path / "docs")
    docs.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)  # several micro-batches
        .parquet(d)
    )
    got = _rows(streaming_contamination_tags(stream, evals, n=N))
    assert got == want


def test_stream_bit_matches_batch_on_documents_table(spark, tmp_path):
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    evals = (
        docs.filter(F.col("doc_id") % 17 == 0)
        .select(F.col("doc_id").alias("eval_id"), "text")
    )
    want = _rows(contamination_tags(docs, evals, n=5))

    d = str(tmp_path / "docs")
    docs.write.parquet(d)
    stream = (
        spark.readStream.schema("doc_id long, text string").parquet(d)
    )
    got = _rows(streaming_contamination_tags(stream, evals, n=5))
    assert got == want


def test_no_short_evals_branch(spark, tmp_path):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    evals = spark.createDataFrame([(1, "z b c d k")], "eval_id long, text string")
    want = _rows(contamination_tags(docs, evals, n=N))
    d = str(tmp_path / "docs")
    docs.write.parquet(d)
    stream = spark.readStream.schema("doc_id long, text string").parquet(d)
    got = _rows(streaming_contamination_tags(stream, evals, n=N))
    assert got == want


def test_oversized_short_eval_set_fails_loudly(spark, tmp_path, monkeypatch):
    """VERDICT r7 quality note: the inlined short-sequence literals are
    only sane at benchmark scale — past MAX_INLINE_SHORT_SEQS the twin
    must raise with guidance, not build a pathological expression tree.
    The cap is monkeypatched down so the test stays O(10)."""
    import pytest

    from kafka_avro_order_processing_spark.streaming import decontam as sd

    monkeypatch.setattr(sd, "MAX_INLINE_SHORT_SEQS", 5)
    # 6 distinct 1-token eval texts -> 6 short (< N-token) sequences
    evals = spark.createDataFrame(
        [(i, f"tok{i}") for i in range(6)], "eval_id long, text string"
    )
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    d = str(tmp_path / "docs")
    docs.write.parquet(d)
    stream = spark.readStream.schema("doc_id long, text string").parquet(d)
    with pytest.raises(ValueError, match="short"):
        sd.streaming_contamination_tags(stream, evals, n=N)
