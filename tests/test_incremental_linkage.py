"""Streaming incremental record linkage (streaming/incremental_linkage):
single-epoch equality with the batch operator, cross-epoch linking
against the growing index, the ingest-time (no-retraction) contract,
replay-duplicate collapse on read, and the hot-block skip.
"""

from __future__ import annotations

import tempfile
import uuid

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.fuzzy import fuzzy_best_match
from kafka_avro_order_processing_spark.streaming.incremental_linkage import (
    read_links,
    start_incremental_linkage,
)

SCHEMA = "id long, text string, blk string"


def _dirs():
    base = tempfile.mkdtemp(prefix=f"linkage_{uuid.uuid4().hex[:8]}_")
    return f"{base}/land", f"{base}/index", f"{base}/chk"


def _drain(spark, land, index, chk):
    stream = spark.readStream.schema(SCHEMA).parquet(land)
    q = start_incremental_linkage(stream, index, chk)
    q.awaitTermination()


def _land(spark, land, rows, part):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(land)


WAVE1 = [
    (1, "large ring", "ring"),
    (2, "large ringo", "ring"),   # dist 1 from record 1
    (3, "metal bolt", "bolt"),
    (9, "totally unrelated text", "bolt"),
]
WAVE2 = [
    (4, "large ring", "ring"),   # exact duplicate of 1 (dist 0)
    (5, "metal boot", "bolt"),   # closest to 3 (dist 1)
]


def test_single_epoch_equals_batch(spark):
    land, index, chk = _dirs()
    _land(spark, land, WAVE1 + WAVE2, "all")
    _drain(spark, land, index, chk)
    got = {
        (r["id"], r["match_id"], r["match_text"], r["distance"])
        for r in read_links(spark, index).collect()
    }
    batch = fuzzy_best_match(
        spark.createDataFrame(WAVE1 + WAVE2, SCHEMA), F.col("blk")
    )
    want = {
        (r["id"], r["match_id"], r["match_text"], r["distance"])
        for r in batch.collect()
    }
    assert got == want


def test_cross_epoch_links_against_the_index(spark):
    land, index, chk = _dirs()
    _land(spark, land, WAVE1, "w1")
    _drain(spark, land, index, chk)
    links_w1 = {r["id"]: r for r in read_links(spark, index).collect()}
    # wave 1's own-epoch links: 1<->2 within "ring"
    assert links_w1[1]["match_id"] == 2
    assert links_w1[2]["match_id"] == 1
    assert 9 not in links_w1  # nothing within distance 4

    _land(spark, land, WAVE2, "w2")
    _drain(spark, land, index, chk)  # same checkpoint: only new files
    links = {r["id"]: r for r in read_links(spark, index).collect()}
    # wave-2 records linked against wave-1 INDEX rows
    assert (links[4]["match_id"], links[4]["distance"]) == (1, 0)
    assert (links[5]["match_id"], links[5]["distance"]) == (3, 1)
    # ingest-time contract: record 1's closest overall is now 4
    # (dist 0 < dist 1 to 2), but links never retract — 1 keeps its
    # wave-1 link, and the relationship is visible from 4's side.
    assert links[1]["match_id"] == 2
    # the record store holds everything for a batch closure run
    batch = {
        r["id"]: r["match_id"]
        for r in fuzzy_best_match(
            spark.read.parquet(f"{index}/records").select(
                F.col("rid").alias("id"),
                F.col("rtext").alias("text"),
                "blk",
            ),
            F.col("blk"),
        ).collect()
    }
    assert batch[1] == 4  # the closure DOES re-link 1 to 4


def test_read_links_collapses_duplicate_appends(spark):
    land, index, chk = _dirs()
    _land(spark, land, WAVE1, "w1")
    _drain(spark, land, index, chk)
    # simulate an at-least-once replay double-appending the links store
    links = spark.read.parquet(f"{index}/links")
    links.write.mode("append").parquet(f"{index}/links")
    out = read_links(spark, index).collect()
    assert len(out) == len({r["id"] for r in out})  # one row per record


def test_hot_block_emits_nothing(spark):
    land, index, chk = _dirs()
    hot = [(i, f"name {i:03d}", "hot") for i in range(40)]
    _land(spark, land, hot + [(100, "abc", "ok"), (101, "abd", "ok")], "w1")
    stream = spark.readStream.schema(SCHEMA).parquet(land)
    q = start_incremental_linkage(stream, index, chk, max_block_size=10)
    q.awaitTermination()
    links = {r["id"]: r["match_id"] for r in read_links(spark, index).collect()}
    assert links == {100: 101, 101: 100}


def test_compaction_shrinks_files_preserves_links(spark):
    from kafka_avro_order_processing_spark.streaming.incremental_linkage import (
        compact_linkage_index,
    )

    land, index, chk = _dirs()
    _land(spark, land, WAVE1, "w1")
    _drain(spark, land, index, chk)
    _land(spark, land, WAVE2, "w2")
    _drain(spark, land, index, chk)
    before = {
        tuple(r) for r in read_links(spark, index).collect()
    }
    recs_before = {tuple(r) for r in spark.read.parquet(f"{index}/records").collect()}
    stats = compact_linkage_index(spark, index)
    assert {tuple(r) for r in read_links(spark, index).collect()} == before
    assert {
        tuple(r) for r in spark.read.parquet(f"{index}/records").collect()
    } == recs_before
    assert stats["records"]["files_after"] <= stats["records"]["files_before"]
    assert stats["links"]["files_after"] <= stats["links"]["files_before"]
    # compacted links hold exactly one row per linked record on disk
    raw = spark.read.parquet(f"{index}/links")
    assert raw.count() == raw.select("id").distinct().count()


def test_recovery_heals_mid_swap_crash(spark):
    import os
    import shutil

    from kafka_avro_order_processing_spark.streaming.incremental_linkage import (
        recover_linkage_index,
    )

    land, index, chk = _dirs()
    _land(spark, land, WAVE1, "w1")
    _drain(spark, land, index, chk)
    before = {tuple(r) for r in read_links(spark, index).collect()}
    # simulate a crash between the two swap renames: live store moved
    # to _bak, fresh layout never landed
    os.rename(f"{index}/records", f"{index}/records_bak")
    actions = recover_linkage_index(index)
    assert any("restored records" in a for a in actions)
    # drains keep working against the restored index
    _land(spark, land, WAVE2, "w2")
    _drain(spark, land, index, chk)
    after = read_links(spark, index).collect()
    links = {r["id"]: r["match_id"] for r in after}
    assert links[4] == 1  # matched against the RESTORED wave-1 index
    assert before <= {tuple(r) for r in after}  # wave-1 links survived
