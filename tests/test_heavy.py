"""Two-pass heavy hitters (operators/heavy.py): exact DuckDB oracle
parity (the approximate pass 1 provably cannot change the final set),
the MG no-false-negative guarantee on an adversarial skew frame, the
candidate-size bound, partition invariance of the FINAL answer, and
the reduce helper's arithmetic."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.operators.heavy import (
    _mg_reduce,
    heavy_hitters,
    mg_candidates,
)
from kafka_avro_order_processing_spark.sources.tables import load_table


def _oracle(key: str, table: str, k: int, where: str = "") -> str:
    w = f"WHERE {key} IS NOT NULL {where}"
    return f"""
    WITH c AS (
      SELECT {key}, CAST(COUNT(*) AS BIGINT) AS freq FROM {table} {w}
      GROUP BY {key}
    ), t AS (SELECT CAST(SUM(freq) AS BIGINT) AS n_total FROM c)
    SELECT c.{key}, c.freq, t.n_total,
           CAST(c.freq AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS frac
    FROM c, t WHERE c.freq * {k + 1} > t.n_total
    """


def test_heavy_hitters_event_type_duckdb_oracle(spark):
    ev = load_table(spark, SF_DIR, "events")
    sdf = heavy_hitters(ev, "event_type", k=3)
    _assert_parity(sdf, _oracle("event_type", "events", 3))


def test_heavy_hitters_bigint_key_duckdb_oracle(spark):
    """Derived skewed BIGINT key: user_id collapsed mod 7."""
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "ukey", F.col("user_id") % 7
    )
    sdf = heavy_hitters(ev, "ukey", k=4)
    sql = f"""
    WITH s AS (SELECT user_id % 7 AS ukey FROM events
               WHERE user_id IS NOT NULL),
    c AS (SELECT ukey, CAST(COUNT(*) AS BIGINT) AS freq FROM s GROUP BY ukey),
    t AS (SELECT CAST(SUM(freq) AS BIGINT) AS n_total FROM c)
    SELECT c.ukey, c.freq, t.n_total,
           CAST(c.freq AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS frac
    FROM c, t WHERE c.freq * 5 > t.n_total
    """
    _assert_parity(sdf, sql)


def test_heavy_hitters_no_hitters_is_empty(spark):
    """150 roughly-uniform users, k=3 -> nobody exceeds N/4."""
    ev = load_table(spark, SF_DIR, "events")
    assert heavy_hitters(ev, "user_id", k=3).count() == 0


def _skew_frame(spark, n_parts: int = 8):
    """Adversarial frame: key 'hot' 4000x, 'warm' 1500x, 3000 singletons
    — spread round-robin over partitions so every partition sees the
    tail interleaved with the head."""
    rows = (
        [Row(k="hot")] * 4000 + [Row(k="warm")] * 1500
        + [Row(k=f"cold{i}") for i in range(3000)]
    )
    # Deterministic interleave: sort by a hash-ish of position.
    return spark.createDataFrame(rows).repartition(n_parts)


def test_guarantee_on_adversarial_skew(spark):
    df = _skew_frame(spark)
    n = 8500
    got = {r["k"]: r["freq"] for r in heavy_hitters(df, "k", k=9).collect()}
    # threshold N/10 = 850: hot and warm qualify, no singleton can.
    assert got == {"hot": 4000, "warm": 1500}
    # tighter k: only keys above N/3 ~ 2833 -> hot alone.
    got2 = {r["k"]: r["freq"] for r in heavy_hitters(df, "k", k=2).collect()}
    assert got2 == {"hot": 4000}
    assert n == df.count()


def test_candidate_bound_and_coverage(spark):
    df = _skew_frame(spark, n_parts=6)
    cand = mg_candidates(df, "k", k=9)
    rows = [r["k"] for r in cand.collect()]
    assert len(rows) <= 9 * 6  # <= k per partition
    assert {"hot", "warm"} <= set(rows)  # the true heavies must surface


def test_final_answer_partition_invariant(spark):
    ev = load_table(spark, SF_DIR, "events")
    base = {(r["event_type"], r["freq"]) for r in
            heavy_hitters(ev, "event_type", k=3).collect()}
    for parts in (1, 5, 17):
        shuf = {(r["event_type"], r["freq"]) for r in
                heavy_hitters(ev.repartition(parts), "event_type", k=3)
                .collect()}
        assert shuf == base


def test_null_keys_excluded(spark):
    df = spark.createDataFrame(
        [Row(k="a")] * 6 + [Row(k=None)] * 10 + [Row(k="b")] * 2
    )
    got = {r["k"]: (r["freq"], r["n_total"]) for r in
           heavy_hitters(df, "k", k=1).collect()}
    # N = 8 non-null; threshold N/2 = 4 -> only 'a'.
    assert got == {"a": (6, 8)}


def test_mg_reduce_arithmetic():
    assert _mg_reduce({"a": 5, "b": 3, "c": 1}, k=2) == {"a": 4, "b": 2}
    assert _mg_reduce({"a": 5, "b": 3}, k=2) == {"a": 5, "b": 3}
    assert _mg_reduce({"a": 2, "b": 2, "c": 2}, k=2) == {}


def test_k_validation(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="k >= 1"):
        mg_candidates(ev, "event_type", k=0)


def test_weighted_heavy_hitters_duckdb_oracle(spark):
    """Keys hot by SUM(value): exact decimal sums, exact oracle."""
    from kafka_avro_order_processing_spark.operators.heavy import (
        weighted_heavy_hitters,
    )

    ev = load_table(spark, SF_DIR, "events").filter(F.col("value") >= 0)
    sdf = weighted_heavy_hitters(ev, "event_type", "value", k=3)
    sql = """
    WITH c AS (
      SELECT event_type,
             SUM(CAST(value AS DECIMAL(18,2))) AS ws,
             CAST(COUNT(*) AS BIGINT) AS freq
      FROM events WHERE event_type IS NOT NULL AND value >= 0
      GROUP BY event_type
    ), t AS (SELECT SUM(ws) AS wt FROM c)
    SELECT c.event_type,
           CAST(c.ws AS DOUBLE) AS weight_sum,
           c.freq,
           CAST(t.wt AS DOUBLE) AS weight_total
    FROM c, t WHERE c.ws * 4 > t.wt
    """
    _assert_parity(sdf, sql)


def test_weighted_guarantee_and_validation(spark):
    from kafka_avro_order_processing_spark.operators.heavy import (
        weighted_heavy_hitters,
        weighted_mg_candidates,
    )

    rows = (
        [Row(k="whale", w=100.0)] * 40          # 4000 weight
        + [Row(k="mid", w=2.0)] * 500           # 1000 weight
        + [Row(k=f"c{i}", w=1.0) for i in range(3000)]  # 3000 weight
    )
    df = spark.createDataFrame(rows).repartition(6)
    got = {
        r["k"]: r["weight_sum"]
        for r in weighted_heavy_hitters(df, "k", "w", k=7).collect()
    }
    # W = 8000, threshold W/8 = 1000: whale qualifies strictly; mid
    # (exactly 1000) does NOT (strict >).
    assert got == {"whale": 4000.0}
    cand = {r["k"] for r in weighted_mg_candidates(df, "k", "w", 7).collect()}
    assert "whale" in cand
    bad = spark.createDataFrame([Row(k="a", w=1.0), Row(k="b", w=-2.0)])
    with pytest.raises(Exception, match="negative"):
        weighted_heavy_hitters(bad, "k", "w", k=1).collect()
