"""SCD2 (operators/scd.py): build + point-in-time lookup against
DuckDB window-SQL oracles on the real events table; the incremental
merge's equivalence law (merge(build(old), new) == build(old ∪ new),
exact row sets); no-op collapse minimality; NULL-attr survival for
facts predating the first version; loud duplicate-(key, ts) rejection."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.operators.scd import (
    scd2_build,
    scd2_lookup,
    scd2_merge,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

# Deterministic change log derived from events: one change per
# (user_id, ts); the "tier" attribute is the lexicographic max type.
_CH_SQL = """
  SELECT user_id, ts, MAX(event_type) AS tier
  FROM events GROUP BY user_id, ts
"""


def _changes(spark, sf=SF_DIR):
    return (
        load_table(spark, sf, "events")
        .groupBy("user_id", "ts")
        .agg(F.max("event_type").alias("tier"))
    )


_BUILD_SQL = f"""
    WITH ch AS ({_CH_SQL}), l AS (
      SELECT user_id, ts, tier,
             LAG(tier) OVER (PARTITION BY user_id ORDER BY ts) AS lt,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
      FROM ch
    ), kept AS (
      SELECT user_id, ts, tier FROM l
      WHERE rn = 1 OR (tier IS DISTINCT FROM lt)
    )
    SELECT user_id, tier, ts AS effective_from,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS effective_to,
           LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             AS is_current
    FROM kept
"""


def test_scd2_build_duckdb_oracle(spark):
    sdf = scd2_build(_changes(spark), "user_id", "ts", ["tier"])
    _assert_parity(sdf, _BUILD_SQL)


def test_scd2_lookup_duckdb_oracle(spark):
    ev = load_table(spark, SF_DIR, "events")
    dim = scd2_build(_changes(spark), "user_id", "ts", ["tier"])
    facts = ev.select("event_id", "user_id", "ts")
    sdf = scd2_lookup(facts, dim, "user_id", "ts", ["tier"])
    sql = f"""
    WITH dim AS ({_BUILD_SQL})
    SELECT f.event_id, f.user_id, f.ts, d.tier
    FROM events f LEFT JOIN dim d
      ON f.user_id = d.user_id
     AND f.ts >= d.effective_from
     AND (d.effective_to IS NULL OR f.ts < d.effective_to)
    """
    _assert_parity(sdf, sql)


def test_scd2_merge_equals_full_rebuild(spark):
    ch = _changes(spark).cache()
    cutoff = ch.agg(
        F.percentile_approx("ts", 0.7, 10000).alias("c")
    ).collect()[0]["c"]
    old = ch.filter(F.col("ts") <= F.lit(cutoff))
    new = ch.filter(F.col("ts") > F.lit(cutoff))
    assert new.count() > 0 and old.count() > 0
    merged = scd2_merge(
        scd2_build(old, "user_id", "ts", ["tier"]),
        new,
        "user_id",
        "ts",
        ["tier"],
    )
    full = scd2_build(ch, "user_id", "ts", ["tier"])
    canon = lambda d: sorted(map(tuple, d.collect()))
    assert canon(merged.select(*full.columns)) == canon(full)
    ch.unpersist()


def test_scd2_merge_new_key_passthrough(spark):
    t0 = dt.datetime(2024, 1, 1)
    t1 = dt.datetime(2024, 2, 1)
    dim = scd2_build(
        spark.createDataFrame(
            [Row(k=1, ts=t0, a="x"), Row(k=1, ts=t1, a="y")]
        ),
        "k",
        "ts",
        ["a"],
    )
    upd = spark.createDataFrame([Row(k=2, ts=t0, a="z")])
    out = scd2_merge(dim, upd, "k", "ts", ["a"])
    rows = {(r["k"], r["a"], r["is_current"]) for r in out.collect()}
    assert rows == {(1, "x", False), (1, "y", True), (2, "z", True)}


def test_scd2_noop_collapse_minimal(spark):
    ts = [dt.datetime(2024, 1, d) for d in (1, 2, 3, 4, 5)]
    df = spark.createDataFrame(
        [
            Row(k=1, ts=ts[0], a="x"),
            Row(k=1, ts=ts[1], a="x"),  # no-op
            Row(k=1, ts=ts[2], a="y"),
            Row(k=1, ts=ts[3], a="y"),  # no-op
            Row(k=1, ts=ts[4], a="x"),  # reverts -> NEW version
        ]
    )
    out = sorted(
        scd2_build(df, "k", "ts", ["a"]).collect(),
        key=lambda r: r["effective_from"],
    )
    assert [(r["a"], r["effective_from"], r["effective_to"]) for r in out] == [
        ("x", ts[0], ts[2]),
        ("y", ts[2], ts[4]),
        ("x", ts[4], None),
    ]
    assert [r["is_current"] for r in out] == [False, False, True]


def test_scd2_null_attr_versions_collapse_nullsafe(spark):
    ts = [dt.datetime(2024, 1, d) for d in (1, 2, 3)]
    df = spark.createDataFrame(
        [Row(k=1, ts=ts[0], a=None), Row(k=1, ts=ts[1], a=None),
         Row(k=1, ts=ts[2], a="x")],
        "k int, ts timestamp_ntz, a string",
    )
    out = scd2_build(df, "k", "ts", ["a"]).collect()
    assert len(out) == 2  # NULL==NULL collapses; NULL->x is a change


def test_scd2_facts_before_first_version_keep_nulls(spark):
    dim = scd2_build(
        spark.createDataFrame([Row(k=1, ts=dt.datetime(2024, 6, 1), a="x")]),
        "k",
        "ts",
        ["a"],
    )
    facts = spark.createDataFrame(
        [Row(fid=10, k=1, fts=dt.datetime(2024, 1, 1)),
         Row(fid=11, k=1, fts=dt.datetime(2024, 7, 1)),
         Row(fid=12, k=9, fts=dt.datetime(2024, 7, 1))]
    )
    got = {r["fid"]: r["a"] for r in
           scd2_lookup(facts, dim, "k", "fts", ["a"]).collect()}
    assert got == {10: None, 11: "x", 12: None}


def test_scd2_duplicate_change_raises(spark):
    t = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame([Row(k=1, ts=t, a="x"), Row(k=1, ts=t, a="y")])
    with pytest.raises(Exception, match="scd2_build: duplicate"):
        scd2_build(df, "k", "ts", ["a"]).collect()
    with pytest.raises(ValueError, match="at least one tracked attribute"):
        scd2_build(df, "k", "ts", [])


def test_scd2_lookup_stream_static(spark, tmp_path):
    """The SAME scd2_lookup code path enriches a STREAM of facts
    against the static dimension (stream-static left join with the
    interval predicate) — drained rows equal the batch lookup."""
    from kafka_avro_order_processing_spark.streaming.pipeline import (
        drain_to_df,
    )

    ev = load_table(spark, SF_DIR, "events")
    dim = scd2_build(_changes(spark), "user_id", "ts", ["tier"])
    facts = ev.select("event_id", "user_id", "ts").limit(500)
    src = str(tmp_path / "facts")
    facts.repartition(3).write.parquet(src)
    stream = (
        spark.readStream.schema(spark.read.parquet(src).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    enriched = scd2_lookup(stream, dim, "user_id", "ts", ["tier"])
    got = sorted(
        map(tuple, drain_to_df(enriched, "append").collect())
    )
    want = sorted(
        map(
            tuple,
            scd2_lookup(
                spark.read.parquet(src), dim, "user_id", "ts", ["tier"]
            ).collect(),
        )
    )
    assert got == want and len(got) == 500
