"""Multimodal resize / frame-sample plumbing + simulated failure flag."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.functions.scalar import simulated_failure_flag
from kafka_avro_order_processing_spark.operators.multimodal import (
    binarize_text,
    resize_payloads,
    sample_frames,
)


@pytest.fixture()
def payloads(spark):
    docs = spark.createDataFrame(
        [(1, "x" * 100), (2, "short")], "doc_id long, text string"
    )
    return binarize_text(docs)


def test_resize_shapes(spark, payloads):
    out = resize_payloads(payloads, target_w=8, target_h=4).collect()
    assert len(out) == 2
    for r in out:
        assert r["width"] == 8 and r["height"] == 4
        assert len(bytes(r["resized"])) == 32  # exactly w*h bytes
    # deterministic
    again = resize_payloads(payloads, 8, 4).collect()
    assert sorted(bytes(r["resized"]) for r in out) == sorted(bytes(r["resized"]) for r in again)


def test_frame_sampling_fanout(spark, payloads):
    frames = sample_frames(payloads, every_ms=500, max_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert len(by_doc[1]) == 4  # 100 bytes -> capped at max_frames
    assert len(by_doc[2]) == 1  # 5 bytes -> one frame
    offsets = sorted(r["frame_offset_ms"] for r in by_doc[1])
    assert offsets == [0, 500, 1000, 1500]


def test_real_resize_rejects_non_image_payloads(spark, payloads):
    """decode_stub=False is REAL for PNG now (media_codecs.py), so the
    contract for these text-byte payloads is a decode error, not a
    NotImplementedError: junk must never silently pass through a
    resize."""
    with pytest.raises(Exception, match="signature|PNG"):
        resize_payloads(payloads, 2, 2, decode_stub=False).collect()


def test_simulated_failure_flag_rate_and_determinism(spark):
    df = spark.range(10_000).select(F.col("id").cast("string").alias("orderId"))
    flagged = df.select(simulated_failure_flag("orderId", rate=0.05).alias("f"))
    n = flagged.filter("f").count()
    assert 300 <= n <= 700  # ~5% of 10k, deterministic hash spread
    assert flagged.filter("f").count() == n  # same rows every evaluation
