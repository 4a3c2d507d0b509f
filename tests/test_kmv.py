"""KMV distinct sketches (operators/kmv.py): exact DuckDB oracle
parity for the build (global + grouped), the estimator, and the
overlap frame; the union-closure law (merge of sketches IS the sketch
of the union, bit-for-bit); unsaturated-sketch exactness; estimator
accuracy against true cardinalities; repartition invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.operators.kmv import (
    KMV_SPACE,
    kmv_estimate,
    kmv_overlap,
    kmv_sketch,
    kmv_union,
)
from kafka_avro_order_processing_spark.sources.tables import load_table


def _h52(expr: str, salt: str = "kmv") -> str:
    """DuckDB replica of kmv_hash: 13-hex-digit md5 prefix as BIGINT."""
    h = f"md5('{salt}:' || CAST({expr} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    return f"({terms})"


def _sketch_cte(key: str, table: str, group: str | None, k: int) -> str:
    """WITH-block building the per-group (or global) KMV sketch."""
    g_sel = f"{group} AS g," if group else "CAST(1 AS INT) AS g,"
    g_part = "PARTITION BY g" if group else ""
    return f"""
    WITH hh AS (
      SELECT DISTINCT {g_sel} {_h52(key)} AS h
      FROM {table} WHERE {key} IS NOT NULL
    ), rr AS (
      SELECT g, h, ROW_NUMBER() OVER ({g_part} ORDER BY h) AS rn FROM hh
    ), sk AS (
      SELECT g, list(h ORDER BY h) AS hashes, CAST(COUNT(*) AS INT) AS n_kept
      FROM rr WHERE rn <= {k} GROUP BY g
    )
    """


def test_kmv_sketch_global_duckdb_oracle(spark):
    ev = load_table(spark, SF_DIR, "events")
    sdf = kmv_sketch(ev, "user_id", k=64)
    sql = _sketch_cte("user_id", "events", None, 64) + (
        "SELECT hashes, n_kept FROM sk"
    )
    _assert_parity(sdf, sql)


def test_kmv_sketch_grouped_duckdb_oracle(spark):
    ev = load_table(spark, SF_DIR, "events")
    sdf = kmv_sketch(ev, "user_id", k=32, by=["event_type"])
    sql = _sketch_cte("user_id", "events", "event_type", 32) + (
        "SELECT g AS event_type, hashes, n_kept FROM sk"
    )
    _assert_parity(sdf, sql)


def test_kmv_estimate_grouped_duckdb_oracle(spark):
    ev = load_table(spark, SF_DIR, "events")
    sdf = kmv_estimate(kmv_sketch(ev, "user_id", k=32, by=["event_type"]), k=32)
    est = (
        "CASE WHEN n_kept < 32 THEN CAST(n_kept AS DOUBLE) "
        f"ELSE 31.0 * {KMV_SPACE} / CAST(hashes[32] AS DOUBLE) END"
    )
    sql = _sketch_cte("user_id", "events", "event_type", 32) + (
        f"SELECT g AS event_type, hashes, n_kept, {est} AS est_distinct FROM sk"
    )
    _assert_parity(sdf, sql)


def test_kmv_estimator_accuracy(spark):
    # documents: 500 distinct doc_ids, k=256 -> rel std err ~ 6.3%.
    docs = load_table(spark, SF_DIR, "documents")
    n_true = docs.select("doc_id").distinct().count()
    est = kmv_estimate(kmv_sketch(docs, "doc_id", k=256), k=256).collect()[0][
        "est_distinct"
    ]
    assert abs(est - n_true) / n_true < 4.0 / math.sqrt(254), (est, n_true)
    # events: 150 distinct users, k=64 -> ~12.7% std err; 4-sigma band.
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    est_u = kmv_estimate(kmv_sketch(ev, "user_id", k=64), k=64).collect()[0][
        "est_distinct"
    ]
    assert abs(est_u - n_users) / n_users < 4.0 / math.sqrt(62), (est_u, n_users)


def test_kmv_unsaturated_is_exact(spark):
    ev = load_table(spark, SF_DIR, "events")
    n_users = ev.select("user_id").distinct().count()
    row = kmv_estimate(kmv_sketch(ev, "user_id", k=256), k=256).collect()[0]
    assert row["n_kept"] == n_users
    assert row["est_distinct"] == float(n_users)
    assert row["hashes"] == sorted(row["hashes"])
    assert len(set(row["hashes"])) == n_users


def test_kmv_union_closure_law(spark):
    """min-k closure: union of the halves' sketches == sketch of the
    whole, bit-for-bit, globally and per group."""
    ev = load_table(spark, SF_DIR, "events")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    for by in (None, ["event_type"]):
        merged = kmv_union(
            kmv_sketch(a, "user_id", k=32, by=by),
            kmv_sketch(b, "user_id", k=32, by=by),
            k=32,
            by=by,
        )
        whole = kmv_sketch(ev, "user_id", k=32, by=by)
        key = (lambda r: r["event_type"]) if by else (lambda r: 0)
        got = {key(r): (r["hashes"], r["n_kept"]) for r in merged.collect()}
        want = {key(r): (r["hashes"], r["n_kept"]) for r in whole.collect()}
        assert got == want


def test_kmv_union_one_sided_group_passthrough(spark):
    ev = load_table(spark, SF_DIR, "events")
    types = sorted(r[0] for r in ev.select("event_type").distinct().collect())
    only_a = types[0]
    a = kmv_sketch(ev, "user_id", k=16, by=["event_type"])
    b = kmv_sketch(
        ev.filter(F.col("event_type") != only_a), "user_id", k=16,
        by=["event_type"],
    )
    merged = {r["event_type"]: r["hashes"] for r in kmv_union(
        a, b, k=16, by=["event_type"]
    ).collect()}
    base = {r["event_type"]: r["hashes"] for r in a.collect()}
    assert merged == base  # b is a subset per group; the lone group survives


def test_kmv_overlap_duckdb_oracle(spark):
    """Full overlap frame vs a DuckDB replica over two constructed
    user sets (user_id % 3 != 0 vs user_id % 2 == 0)."""
    ev = load_table(spark, SF_DIR, "events")
    sa = kmv_sketch(ev.filter(F.col("user_id") % 3 != 0), "user_id", k=32)
    sb = kmv_sketch(ev.filter(F.col("user_id") % 2 == 0), "user_id", k=32)
    sdf = kmv_overlap(sa, sb, k=32)
    est_u = (
        "CASE WHEN n_kept < 32 THEN CAST(n_kept AS DOUBLE) "
        f"ELSE 31.0 * {KMV_SPACE} / CAST(u[32] AS DOUBLE) END"
    )
    sql = f"""
    WITH ha AS (
      SELECT DISTINCT {_h52("user_id")} AS h FROM events
      WHERE user_id IS NOT NULL AND user_id % 3 <> 0
    ), ra AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) rn FROM ha),
    ska AS (SELECT list(h ORDER BY h) AS la FROM ra WHERE rn <= 32),
    hb AS (
      SELECT DISTINCT {_h52("user_id")} AS h FROM events
      WHERE user_id IS NOT NULL AND user_id % 2 = 0
    ), rb AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) rn FROM hb),
    skb AS (SELECT list(h ORDER BY h) AS lb FROM rb WHERE rn <= 32),
    uni AS (
      SELECT la, lb, list_sort(list_distinct(la || lb))[1:32] AS u
      FROM ska, skb
    ), st AS (
      SELECT len(u) AS n_kept,
             len(list_intersect(list_intersect(u, la), lb)) AS n_match,
             len(list_intersect(u, la)) AS n_in_a,
             len(list_intersect(u, lb)) AS n_in_b,
             u
      FROM uni
    )
    SELECT CAST(n_kept AS INT) AS n_union_kept,
           CAST(n_match AS INT) AS n_match,
           CAST(n_match AS DOUBLE) / CAST(n_kept AS DOUBLE) AS jaccard_est,
           {est_u} AS est_union,
           CAST(n_match AS DOUBLE) / CAST(n_kept AS DOUBLE) * {est_u}
             AS est_intersection,
           CAST(n_in_a - n_match AS DOUBLE) / CAST(n_kept AS DOUBLE)
             * {est_u} AS est_only_a,
           CAST(n_in_b - n_match AS DOUBLE) / CAST(n_kept AS DOUBLE)
             * {est_u} AS est_only_b
    FROM st
    """
    _assert_parity(sdf, sql)


def test_kmv_overlap_accuracy(spark):
    """jaccard_est / est_intersection within the sampling band of the
    exact values on the constructed sets."""
    ev = load_table(spark, SF_DIR, "events")
    users = {r[0] for r in ev.select("user_id").distinct().collect()}
    a_set = {u for u in users if u % 3 != 0}
    b_set = {u for u in users if u % 2 == 0}
    true_j = len(a_set & b_set) / len(a_set | b_set)
    sa = kmv_sketch(ev.filter(F.col("user_id") % 3 != 0), "user_id", k=64)
    sb = kmv_sketch(ev.filter(F.col("user_id") % 2 == 0), "user_id", k=64)
    row = kmv_overlap(sa, sb, k=64).collect()[0]
    # k-sample of the union: binomial std err sqrt(j(1-j)/k) ~ 6%.
    band = 4.0 * math.sqrt(true_j * (1 - true_j) / 64) + 1e-9
    assert abs(row["jaccard_est"] - true_j) <= band, (row["jaccard_est"], true_j)
    assert abs(row["est_intersection"] - len(a_set & b_set)) <= (
        0.5 * len(a_set & b_set)
    )
    # difference estimates: three-way split is consistent and close
    assert abs(
        row["est_only_a"] + row["est_only_b"] + row["est_intersection"]
        - row["est_union"]
    ) < 1e-9
    assert abs(row["est_only_a"] - len(a_set - b_set)) <= (
        0.6 * max(len(a_set - b_set), 10)
    )
    assert abs(row["est_only_b"] - len(b_set - a_set)) <= (
        0.6 * max(len(b_set - a_set), 10)
    )


def test_kmv_repartition_invariance(spark):
    ev = load_table(spark, SF_DIR, "events")
    base = kmv_sketch(ev, "user_id", k=32, by=["event_type"]).collect()
    shuf = kmv_sketch(
        ev.repartition(13, "user_id"), "user_id", k=32, by=["event_type"]
    ).collect()
    assert {r["event_type"]: r["hashes"] for r in base} == {
        r["event_type"]: r["hashes"] for r in shuf
    }


def test_kmv_k_validation(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="k >= 2"):
        kmv_sketch(ev, "user_id", k=1)
