"""Streaming span-level dedup (streaming/incremental_spans.py):
single-epoch batch closure against the batch operator, cross-epoch
index hits, the no-retraction contract, and replay safety of the
append-only count index.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.substr import (
    duplicated_ngram_spans,
)
from kafka_avro_order_processing_spark.streaming.incremental_spans import (
    read_spans,
    start_incremental_spans,
)

BOILER = "all rights reserved no part may be reproduced without permission"


def _stream(spark, d):
    return (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


def test_single_epoch_equals_batch(spark, tmp_path):
    docs = [
        (0, f"alpha beta {BOILER} gamma"),
        (1, f"{BOILER} delta epsilon zeta"),
        (2, "unique words only here today"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    land = str(tmp_path / "land")
    df.coalesce(1).write.parquet(land)
    idx = str(tmp_path / "idx")
    start_incremental_spans(
        _stream(spark, land), idx, str(tmp_path / "chk"), n=5
    ).awaitTermination()
    got = sorted(
        (r["doc_id"], r["span_start"], r["span_end"], r["n_grams"])
        for r in read_spans(spark, idx).collect()
    )
    want = sorted(
        tuple(r) for r in duplicated_ngram_spans(df, n=5).collect()
    )
    assert got == want and got


def test_cross_epoch_flags_later_doc_only(spark, tmp_path):
    # wave 1: the passage occurs ONCE -> no flags.  wave 2 repeats it
    # -> the wave-2 doc flags against the index; wave 1 is NOT
    # retroactively flagged (the documented no-retraction contract).
    w1 = spark.createDataFrame(
        [(0, f"intro {BOILER} outro"), (1, "nothing shared here at all")],
        "doc_id long, text string",
    )
    w2 = spark.createDataFrame(
        [(10, f"prefix {BOILER} suffix"), (11, "fresh unrelated words")],
        "doc_id long, text string",
    )
    land = str(tmp_path / "land")
    idx = str(tmp_path / "idx")
    w1.coalesce(1).write.parquet(land)
    start_incremental_spans(
        _stream(spark, land), idx, str(tmp_path / "chk1"), n=5
    ).awaitTermination()
    assert read_spans(spark, idx).count() == 0  # nothing duplicated yet

    w2.coalesce(1).write.mode("append").parquet(land)
    start_incremental_spans(
        _stream(spark, land), idx, str(tmp_path / "chk1"), n=5
    ).awaitTermination()
    flags = read_spans(spark, idx).collect()
    flagged_docs = {r["doc_id"] for r in flags}
    assert flagged_docs == {10}  # later doc only; no retraction of 0
    blen = len(BOILER.split())
    (r,) = [x for x in flags if x["doc_id"] == 10]
    # 'prefix BOILER suffix': the boiler passage spans tokens 1..blen
    assert r["span_start"] <= 1 and r["span_end"] >= blen


def test_replay_does_not_overcount(spark, tmp_path):
    # A second drain over the SAME landed files with a FRESH checkpoint
    # replays epoch 0: the count index appends identical rows, the
    # read-side (gram, epoch) collapse keeps totals exact, and the
    # span flags deduplicate — nothing changes.
    df = spark.createDataFrame(
        [(0, f"x {BOILER} y"), (1, f"z {BOILER} w")],
        "doc_id long, text string",
    )
    land = str(tmp_path / "land")
    idx = str(tmp_path / "idx")
    df.coalesce(1).write.parquet(land)
    start_incremental_spans(
        _stream(spark, land), idx, str(tmp_path / "chkA"), n=5
    ).awaitTermination()
    before = sorted(tuple(r) for r in read_spans(spark, idx).collect())

    start_incremental_spans(  # replay: fresh checkpoint, same files
        _stream(spark, land), idx, str(tmp_path / "chkB"), n=5
    ).awaitTermination()
    after = sorted(tuple(r) for r in read_spans(spark, idx).collect())
    assert after == before

    # and a THIRD doc landing later still counts occurrences exactly
    # twice for the boiler grams (not four times): it flags — totals
    # pass min_occurrences regardless — but the count collapse is
    # observable through the grams store directly
    grams = spark.read.parquet(f"{idx}/grams").dropDuplicates(
        ["gram", "epoch"]
    )
    boiler_gram_occ = (
        grams.filter(F.col("gram").startswith("all rights"))
        .groupBy("gram")
        .agg(F.sum("occ").alias("occ"))
        .collect()
    )
    assert boiler_gram_occ and all(r["occ"] == 2 for r in boiler_gram_occ)


def test_compaction_preserves_semantics_and_shrinks_files(spark, tmp_path):
    import glob
    import os

    from kafka_avro_order_processing_spark.streaming.incremental_spans import (
        compact_spans_index,
        recover_spans_index,
    )

    land = str(tmp_path / "land")
    idx = str(tmp_path / "idx")
    chk = str(tmp_path / "chk")
    w1 = spark.createDataFrame(
        [(0, f"a {BOILER} b"), (1, "nothing here")], "doc_id long, text string"
    )
    w1.coalesce(1).write.parquet(land)
    start_incremental_spans(_stream(spark, land), idx, chk, n=5).awaitTermination()
    w2 = spark.createDataFrame(
        [(10, f"c {BOILER} d")], "doc_id long, text string"
    )
    w2.coalesce(1).write.mode("append").parquet(land)
    start_incremental_spans(_stream(spark, land), idx, chk, n=5).awaitTermination()
    before = sorted(tuple(r) for r in read_spans(spark, idx).collect())

    stats = compact_spans_index(spark, idx)
    assert stats["grams"]["files_after"] <= stats["grams"]["files_before"]
    # flags unchanged; ledger collapsed to one row per gram, epoch -1
    assert sorted(tuple(r) for r in read_spans(spark, idx).collect()) == before
    grams = spark.read.parquet(f"{idx}/grams")
    assert grams.groupBy("gram").count().filter("count > 1").count() == 0
    assert grams.select("epoch").distinct().collect()[0]["epoch"] == -1

    # a post-compaction wave still flags against the collapsed counts
    w3 = spark.createDataFrame(
        [(20, f"e {BOILER} f")], "doc_id long, text string"
    )
    w3.coalesce(1).write.mode("append").parquet(land)
    start_incremental_spans(_stream(spark, land), idx, chk, n=5).awaitTermination()
    assert 20 in {r["doc_id"] for r in read_spans(spark, idx).collect()}

    # crash recovery: a dangling _bak with no live store rolls back
    os.rename(f"{idx}/grams", f"{idx}/grams_bak")
    actions = recover_spans_index(idx)
    assert any("restored grams" in a for a in actions)
    assert glob.glob(f"{idx}/grams/**/*.parquet", recursive=True)
