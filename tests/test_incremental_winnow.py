"""Streaming winnowing index (streaming/incremental_winnow.py):
single-epoch drain equals the batch operator, cross-epoch pairs flag
at the later doc's epoch, replay safety, and the hot-hash star cap.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.substr import (
    winnow_candidate_pairs,
    winnow_fingerprints,
)
from kafka_avro_order_processing_spark.streaming.incremental_winnow import (
    read_winnow_pairs,
    start_incremental_winnow,
)

PASSAGE = "p1 p2 p3 p4 p5 p6 p7 p8"
K, W = 3, 4


def _stream(spark, d, per_file=True):
    r = spark.readStream.schema("doc_id long, text string")
    if per_file:
        r = r.option("maxFilesPerTrigger", 1)
    return r.parquet(d)


def _pairs(df):
    return sorted(
        ((r["doc_a"], r["doc_b"], r["shared_hashes"]) for r in df.collect()),
        key=lambda t: (t[0], t[1], -1 if t[2] is None else t[2]),
    )


def test_single_epoch_equals_batch(spark, tmp_path):
    docs = [
        (1, f"a b {PASSAGE} c d"),
        (2, f"zz {PASSAGE} yy xx"),
        (3, "entirely different words without overlap at all"),
        (4, f"qq rr {PASSAGE} ss"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    land, idx = str(tmp_path / "land"), str(tmp_path / "idx")
    df.coalesce(1).write.parquet(land)
    start_incremental_winnow(
        _stream(spark, land, per_file=False), idx, str(tmp_path / "chk"),
        k=K, window=W, min_shared=1,
    ).awaitTermination()
    got = _pairs(read_winnow_pairs(spark, idx).drop("epoch"))
    want = _pairs(
        winnow_candidate_pairs(
            winnow_fingerprints(df, k=K, window=W), min_shared=1
        )
    )
    assert got == want and got


def test_cross_epoch_flags_later_doc_only(spark, tmp_path):
    land, idx = str(tmp_path / "land"), str(tmp_path / "idx")
    spark.createDataFrame(
        [(1, f"a b {PASSAGE} c")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{land}/w1")
    spark.createDataFrame(
        [(2, f"zz {PASSAGE} yy")], "doc_id long, text string"
    ).coalesce(1).write.parquet(f"{land}/w2")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(land)
    )
    start_incremental_winnow(
        stream, idx, str(tmp_path / "chk"), k=K, window=W, min_shared=1
    ).awaitTermination()
    rows = read_winnow_pairs(spark, idx).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    # flagged at the LATER epoch (the second micro-batch)
    assert r["epoch"] > 0


def test_replay_does_not_duplicate_or_self_pair(spark, tmp_path):
    land, idx = str(tmp_path / "land"), str(tmp_path / "idx")
    df = spark.createDataFrame(
        [(1, f"a b {PASSAGE} c"), (2, f"zz {PASSAGE} yy")],
        "doc_id long, text string",
    )
    df.coalesce(1).write.parquet(land)
    start_incremental_winnow(
        _stream(spark, land, per_file=False), idx, str(tmp_path / "chkA"),
        k=K, window=W, min_shared=1,
    ).awaitTermination()
    before = _pairs(read_winnow_pairs(spark, idx))
    # fresh checkpoint over the same files replays epoch 0: the
    # epoch-exclusion read must hide the first attempt's fps rows, so
    # no doc pairs against its own replayed self and reads dedup
    start_incremental_winnow(
        _stream(spark, land, per_file=False), idx, str(tmp_path / "chkB"),
        k=K, window=W, min_shared=1,
    ).awaitTermination()
    after = _pairs(read_winnow_pairs(spark, idx))
    assert after == before


def test_hot_hash_stars_at_ingest(spark, tmp_path):
    land, idx = str(tmp_path / "land"), str(tmp_path / "idx")
    docs = [(i, f"u{i} v{i} {PASSAGE} w{i}") for i in range(1, 9)]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(
        1
    ).write.parquet(land)
    start_incremental_winnow(
        _stream(spark, land, per_file=False), idx, str(tmp_path / "chk"),
        k=K, window=W, min_shared=1, max_bucket_size=3,
    ).awaitTermination()
    rows = read_winnow_pairs(spark, idx).collect()
    stars = [r for r in rows if r["shared_hashes"] is None]
    assert stars and all(r["doc_a"] == 1 for r in stars)
    got = _pairs(read_winnow_pairs(spark, idx).drop("epoch"))
    want = _pairs(
        winnow_candidate_pairs(
            winnow_fingerprints(
                spark.createDataFrame(docs, "doc_id long, text string"),
                k=K, window=W,
            ),
            min_shared=1,
            max_bucket_size=3,
        )
    )
    assert got == want
