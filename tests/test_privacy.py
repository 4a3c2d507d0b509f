"""k-anonymity / l-diversity audits (operators/privacy.py): exact
agreement with a Python reference, NULL-as-its-own-QI-value and
NULL-sensitive-excluded semantics, DuckDB oracle parity through the
driver canonicalization on the customer table, repartition
determinism, and loud input validation.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.privacy import (
    k_anonymity_classes,
    k_anonymity_summary,
    l_diversity_classes,
    l_diversity_summary,
    with_class_size,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

ROWS = [
    # (zip, age_band, diagnosis)
    ("02139", "20-29", "flu"),
    ("02139", "20-29", "flu"),
    ("02139", "20-29", "cold"),
    ("02139", "30-39", "flu"),      # unique class
    ("94305", "20-29", "cold"),
    ("94305", "20-29", None),       # NULL sensitive: no diversity credit
    (None, "20-29", "flu"),         # NULL QI value is its own class
    (None, "20-29", "measles"),
]


def _frame(spark):
    return spark.createDataFrame(
        ROWS, "zip string, age_band string, diagnosis string"
    )


def _py_classes(rows):
    by_qi = Counter()
    sens = defaultdict(set)
    for z, a, d in rows:
        by_qi[(z, a)] += 1
        if d is not None:
            sens[(z, a)].add(d)
    return by_qi, sens


def test_k_classes_and_summary_match_reference(spark):
    df = _frame(spark)
    by_qi, _ = _py_classes(ROWS)
    got = {
        (r["zip"], r["age_band"]): r["k"]
        for r in k_anonymity_classes(df, ["zip", "age_band"]).collect()
    }
    assert got == dict(by_qi)
    s = k_anonymity_summary(df, ["zip", "age_band"], k_required=3).collect()[0]
    assert s["n_rows"] == len(ROWS)
    assert s["n_classes"] == len(by_qi)
    assert s["min_k"] == min(by_qi.values()) == 1
    assert s["n_unique_rows"] == sum(1 for v in by_qi.values() if v == 1)
    below = sum(v for v in by_qi.values() if v < 3)
    assert s["n_rows_below_k"] == below
    assert s["pct_rows_below_k"] == pytest.approx(below / len(ROWS))


def test_with_class_size_per_row(spark):
    df = _frame(spark)
    by_qi, _ = _py_classes(ROWS)
    out = with_class_size(df, ["zip", "age_band"]).collect()
    assert len(out) == len(ROWS)
    for r in out:
        assert r["k"] == by_qi[(r["zip"], r["age_band"])]


def test_l_diversity_semantics(spark):
    df = _frame(spark)
    by_qi, sens = _py_classes(ROWS)
    got = {
        (r["zip"], r["age_band"]): (r["k"], r["l"])
        for r in l_diversity_classes(df, ["zip", "age_band"], "diagnosis").collect()
    }
    assert got == {
        q: (by_qi[q], len(sens.get(q, set()))) for q in by_qi
    }
    # the all-NULL-sensitive case: l = 0, still a disclosing class
    only_null = spark.createDataFrame(
        [("x", None), ("x", None)], "zip string, diagnosis string"
    )
    row = l_diversity_classes(only_null, ["zip"], "diagnosis").collect()[0]
    assert (row["k"], row["l"]) == (2, 0)
    s = l_diversity_summary(df, ["zip", "age_band"], "diagnosis").collect()[0]
    ls = {q: len(sens.get(q, set())) for q in by_qi}
    assert s["min_l"] == min(ls.values())
    assert s["n_disclosing_classes"] == sum(1 for v in ls.values() if v <= 1)
    below = sum(by_qi[q] for q, v in ls.items() if v < 2)
    assert s["n_rows_below_l"] == below


def test_duckdb_oracle_parity_on_customer(spark):
    from test_r10_promotion_parity import _assert_parity

    cust = load_table(spark, SF, "customer")
    sdf = k_anonymity_classes(cust, ["c_nationkey", "c_mktsegment"])
    _assert_parity(
        sdf,
        f"""
        SELECT c_nationkey, c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS k
        FROM '{SF}/customer.parquet'
        GROUP BY c_nationkey, c_mktsegment
        """,
    )
    sdf2 = l_diversity_classes(cust, ["c_nationkey"], "c_mktsegment")
    _assert_parity(
        sdf2,
        f"""
        SELECT c_nationkey,
               CAST(COUNT(*) AS BIGINT) AS k,
               CAST(COUNT(DISTINCT c_mktsegment) AS BIGINT) AS l
        FROM '{SF}/customer.parquet'
        GROUP BY c_nationkey
        """,
    )


def test_repartition_determinism(spark):
    df = _frame(spark)
    base = sorted(
        (tuple(r) for r in l_diversity_classes(df, ["zip"], "diagnosis").collect()),
        key=repr,
    )
    again = sorted(
        (
            tuple(r)
            for r in l_diversity_classes(
                df.repartition(7), ["zip"], "diagnosis"
            ).collect()
        ),
        key=repr,
    )
    assert base == again


def test_empty_frame_summary(spark):
    empty = spark.createDataFrame([], "zip string, diagnosis string")
    s = k_anonymity_summary(empty, ["zip"]).collect()[0]
    assert (s["n_rows"], s["n_classes"], s["min_k"]) == (0, 0, None)
    assert s["pct_rows_below_k"] is None


def test_validation(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="non-empty"):
        k_anonymity_classes(df, [])
    with pytest.raises(ValueError, match="not in frame"):
        k_anonymity_classes(df, ["nope"])
    with pytest.raises(ValueError, match="k_required"):
        k_anonymity_summary(df, ["zip"], k_required=0)
