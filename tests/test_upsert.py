"""Upsert and SCD2 emulation tests."""

from __future__ import annotations

import datetime as dt

from kafka_avro_order_processing_spark.operators.upsert import scd2_apply, upsert


def test_upsert_replaces_and_inserts(spark):
    target = spark.createDataFrame(
        [("Laptop", 999.0), ("Mouse", 25.0)], "product string, price double"
    )
    updates = spark.createDataFrame(
        [("Mouse", 30.0), ("Webcam", 80.0)], "product string, price double"
    )
    got = {r["product"]: r["price"] for r in upsert(target, updates, "product").collect()}
    assert got == {"Laptop": 999.0, "Mouse": 30.0, "Webcam": 80.0}


def test_scd2_closes_and_appends(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    dim = spark.createDataFrame(
        [("Mouse", 25.0, t0, None, True), ("Laptop", 999.0, t0, None, True)],
        "product string, price double, valid_from timestamp_ntz, valid_to timestamp_ntz, is_current boolean",
    )
    changes = spark.createDataFrame(
        [("Mouse", 30.0, t1)],
        "product string, price double, valid_from timestamp_ntz",
    )
    out = scd2_apply(dim, changes, key="product")
    rows = sorted(
        ((r["product"], r["price"], r["is_current"], r["valid_to"]) for r in out.collect())
    )
    assert rows == [
        ("Laptop", 999.0, True, None),          # untouched current row
        ("Mouse", 25.0, False, t1),             # closed at change ts
        ("Mouse", 30.0, True, None),            # new current version
    ]
    # history is contiguous: closed row's valid_to == new row's valid_from
    closed = next(r for r in out.collect() if r["product"] == "Mouse" and not r["is_current"])
    new = next(r for r in out.collect() if r["product"] == "Mouse" and r["is_current"])
    assert closed["valid_to"] == new["valid_from"]


def test_scd2_multiple_changes_same_key_collapse_to_latest(spark):
    """Several changes for one key in a batch must not fan out the
    dimension — only the latest (max valid_from) applies."""
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 6, 1)
    t2 = dt.datetime(2024, 9, 1)
    dim = spark.createDataFrame(
        [("Mouse", 25.0, t0, None, True)],
        "product string, price double, valid_from timestamp_ntz, valid_to timestamp_ntz, is_current boolean",
    )
    changes = spark.createDataFrame(
        [("Mouse", 30.0, t1), ("Mouse", 35.0, t2)],
        "product string, price double, valid_from timestamp_ntz",
    )
    out = scd2_apply(dim, changes, key="product").collect()
    assert len(out) == 2  # closed original + ONE new current
    current = [r for r in out if r["is_current"]]
    assert len(current) == 1 and current[0]["price"] == 35.0
    closed = next(r for r in out if not r["is_current"])
    assert closed["valid_to"] == t2


def test_upsert_duplicate_update_keys_collapse_deterministically(spark):
    """MERGE would raise on multiple matches; the emulation documents
    last-writer-wins by content sort — the key must come out unique and
    the survivor must not depend on shuffle order."""
    target = spark.createDataFrame([("Mouse", 25.0)], "product string, price double")
    updates = spark.createDataFrame(
        [("Mouse", 30.0), ("Mouse", 28.0), ("Webcam", 80.0)],
        "product string, price double",
    )
    rows = upsert(target, updates, "product").collect()
    got = {r["product"]: r["price"] for r in rows}
    assert len(rows) == len(got) == 2  # no duplicate keys survive
    assert got == {"Mouse": 30.0, "Webcam": 80.0}  # highest-sorting row wins


def test_merge_partitioned_rewrites_only_touched_buckets(spark, tmp_path):
    """The 100 TB MERGE story: untouched partitions' files must be
    byte-identical after the merge (never read, never rewritten);
    touched buckets = exactly the delta's key buckets; and the merged
    table content equals the plain anti-join+union upsert."""
    import os

    from pyspark.sql import functions as F

    from kafka_avro_order_processing_spark.operators.upsert import (
        key_bucket,
        merge_partitioned,
        upsert,
        write_partitioned,
    )

    n_buckets = 8
    target = spark.range(0, 400).select(
        F.col("id").alias("k"), (F.col("id") * 2.0).alias("v")
    )
    updates = spark.createDataFrame(
        [(16, -1.0), (24, -2.0), (-3, 99.0)], "k long, v double"
    )
    path = str(tmp_path / "t")
    write_partitioned(target, "k", path, n_buckets)

    def listing():
        out = {}
        for d in os.listdir(path):
            if d.startswith("bucket="):
                b = int(d.split("=")[1])
                out[b] = sorted(
                    (f, os.path.getmtime(os.path.join(path, d, f)))
                    for f in os.listdir(os.path.join(path, d))
                    if f.endswith(".parquet")
                )
        return out

    before = listing()
    merged = merge_partitioned(spark, updates, "k", path, n_buckets)
    after = listing()

    expected_touched = {
        r["b"] for r in updates.select(key_bucket("k", n_buckets).alias("b")).collect()
    }
    changed = {b for b in after if after[b] != before.get(b)}
    assert changed == expected_touched  # {0, 5} here: 16,24 -> 0; -3 -> 5
    for b in set(before) - expected_touched:
        assert after[b] == before[b]  # untouched files byte-for-byte in place

    want = {
        (r["k"], r["v"])
        for r in upsert(target, updates, "k").collect()
    }
    got = {(r["k"], r["v"]) for r in merged.collect()}
    assert got == want
