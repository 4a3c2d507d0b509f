"""Bloom filters (operators/bloom.py): exact DuckDB oracle parity for
the built word table AND probe verdicts; the no-false-negative
guarantee; empirical FPR against the Broder–Mitzenmacher formula; the
union law (OR of filters == filter of the union, bit-for-bit); word
bounds; loud NULL rejection; parameter helper arithmetic."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.operators.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_union,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

M, K = 4096, 5  # filter under test (events user_ids: ~150 keys)


def _h52_sql(expr: str) -> str:
    h = f"md5('bloom:' || {expr})"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    return f"({terms})"


def _pos_cte(key_sql: str, source: str) -> str:
    """All (key, position) pairs for K hash functions."""
    parts = []
    for j in range(K):
        salted = f"'{j}:' || kk"
        parts.append(
            f"SELECT kk, {_h52_sql(salted)} % {M} AS pos FROM kk_{source}"
        )
    unions = " UNION ALL ".join(parts)
    return f"""
    WITH kk_{source} AS (SELECT DISTINCT CAST({key_sql} AS VARCHAR) AS kk
                         FROM {source} WHERE {key_sql} IS NOT NULL),
    pos_{source} AS ({unions})
    """


def test_bloom_build_duckdb_oracle(spark):
    ev = load_table(spark, SF_DIR, "events")
    sdf = bloom_build(ev, "user_id", M, K)
    sql = _pos_cte("user_id", "events") + f"""
    , pw AS (
      SELECT DISTINCT CAST((pos - pos % 32) / 32 AS INT) AS word,
             CAST(POW(2, pos % 32) AS BIGINT) AS mask
      FROM pos_events
    )
    SELECT word, CAST(SUM(mask) AS BIGINT) AS bits FROM pw GROUP BY word
    """
    _assert_parity(sdf, sql)


def test_no_false_negatives_and_fpr(spark):
    ev = load_table(spark, SF_DIR, "events")
    bloom = bloom_build(ev, "user_id", M, K)
    # every inserted key answers true
    seen = bloom_might_contain(
        ev.select("user_id").distinct(), bloom, "user_id", M, K
    )
    assert seen.filter(~F.col("might_contain")).count() == 0
    n = ev.select("user_id").distinct().count()
    # fresh keys: empirical FPR within 4x of theory (small-sample slack)
    fresh = spark.range(100000, 102000).select(
        F.col("id").alias("user_id")
    )
    fp = bloom_might_contain(fresh, bloom, "user_id", M, K).filter(
        "might_contain"
    ).count()
    theory = (1 - math.exp(-K * n / M)) ** K
    assert fp / 2000 <= 4 * theory + 0.01, (fp, theory, n)


def test_probe_verdicts_duckdb_oracle(spark):
    """Mixed probe set (seen + fresh): verdicts hash-match the SQL
    replica end-to-end."""
    ev = load_table(spark, SF_DIR, "events")
    bloom = bloom_build(ev, "user_id", M, K)
    probe = (
        ev.select("user_id").distinct().limit(40)
        .unionByName(
            ev.sparkSession.range(100000, 100040).select(
                F.col("id").alias("user_id")
            )
        )
    )
    sdf = bloom_might_contain(probe, bloom, "user_id", M, K)
    probe_sql = """(SELECT user_id FROM (
        SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 40)
      UNION ALL SELECT * FROM range(100000, 100040))"""
    sql = _pos_cte("user_id", "events") + f"""
    , pw AS (
      SELECT DISTINCT CAST((pos - pos % 32) / 32 AS INT) AS word,
             CAST(POW(2, pos % 32) AS BIGINT) AS mask
      FROM pos_events
    ), bloom AS (
      SELECT word, CAST(SUM(mask) AS BIGINT) AS bits FROM pw GROUP BY word
    ), probe AS (SELECT user_id FROM {probe_sql} t(user_id)),
    pp AS (
      SELECT user_id,
             {_h52_sql("CAST(j AS VARCHAR) || ':' || CAST(user_id AS VARCHAR)")}
               % {M} AS pos
      FROM probe, range(0, {K}) r(j)
    ), ph AS (
      SELECT user_id,
             CAST((pos - pos % 32) / 32 AS INT) AS word,
             CAST(POW(2, pos % 32) AS BIGINT) AS mask
      FROM pp
    )
    SELECT ph.user_id,
           BOOL_AND((COALESCE(b.bits, 0) & ph.mask) = ph.mask)
             AS might_contain
    FROM ph LEFT JOIN bloom b USING (word)
    GROUP BY ph.user_id
    """
    _assert_parity(sdf, sql)


def test_union_law(spark):
    ev = load_table(spark, SF_DIR, "events")
    a = ev.filter(F.col("user_id") % 2 == 0)
    b = ev.filter(F.col("user_id") % 2 == 1)
    merged = bloom_union(
        bloom_build(a, "user_id", M, K), bloom_build(b, "user_id", M, K)
    )
    whole = bloom_build(ev, "user_id", M, K)
    got = {r["word"]: r["bits"] for r in merged.collect()}
    want = {r["word"]: r["bits"] for r in whole.collect()}
    assert got == want


def test_word_bounds_and_mergeability_shape(spark):
    ev = load_table(spark, SF_DIR, "events")
    rows = bloom_build(ev, "user_id", M, K).collect()
    assert all(0 <= r["word"] < M // 32 for r in rows)
    assert all(0 < r["bits"] < 2**32 for r in rows)
    assert len(rows) <= M // 32


def test_validation(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="m_bits"):
        bloom_build(ev, "user_id", 16, 2)
    with pytest.raises(ValueError, match="n_keys"):
        bloom_params(0, 0.01)
    df = ev.sparkSession.createDataFrame(
        [Row(k="a"), Row(k=None)], "k string"
    )
    with pytest.raises(Exception, match="NULL k rejected"):
        bloom_build(df, "k", 4096, 3).collect()
    m, k = bloom_params(1000, 0.01)
    assert 9000 < m < 10100 and k in (6, 7)


def test_fill_stats_duckdb_oracle_and_sanity(spark):
    from kafka_avro_order_processing_spark.operators.bloom import (
        bloom_fill_stats,
    )

    ev = load_table(spark, SF_DIR, "events")
    bloom = bloom_build(ev, "user_id", M, K)
    sdf = bloom_fill_stats(bloom, M, K)
    sql = _pos_cte("user_id", "events") + f"""
    , pw AS (
      SELECT DISTINCT CAST((pos - pos % 32) / 32 AS INT) AS word,
             CAST(POW(2, pos % 32) AS BIGINT) AS mask
      FROM pos_events
    ), bloom AS (
      SELECT word, CAST(SUM(mask) AS BIGINT) AS bits FROM pw GROUP BY word
    )
    SELECT CAST(COALESCE(SUM(bit_count(CAST(bits AS BIT))), 0) AS BIGINT)
             AS bits_set,
           CAST(COALESCE(SUM(bit_count(CAST(bits AS BIT))), 0) AS DOUBLE)
             / {float(M)} AS fill_ratio,
           POW(CAST(COALESCE(SUM(bit_count(CAST(bits AS BIT))), 0) AS DOUBLE)
             / {float(M)}, {float(K)}) AS fpr_observed
    FROM bloom
    """
    _assert_parity(sdf, sql)
    row = sdf.collect()[0]
    n = ev.select("user_id").distinct().count()
    # fill close to the expected 1 - e^{-kn/m}
    import math as _m

    expect = 1 - _m.exp(-K * n / M)
    assert abs(row["fill_ratio"] - expect) < 0.1
    assert 0 < row["fpr_observed"] < 1
