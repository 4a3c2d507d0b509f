"""Cross-engine fuzzing: hypothesis-generated datasets written to
parquet, run through the core operators on Spark AND DuckDB SQL — the
determinism playbook (decimal sums, tiebreakers) must hold for ANY
2-dp money data, not just the driver testdata."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_avro_order_processing_spark.operators.aggregate import product_price_stats
from kafka_avro_order_processing_spark.operators.windows import running_average

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 100_000),
        st.sampled_from(["A", "B", "C", "D", "E"]),
        st.decimals(min_value=-10_000, max_value=10_000, places=2).map(float),
    ),
    min_size=1,
    max_size=200,
    unique_by=lambda r: r[0],
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _materialize(spark, rows):
    df = spark.createDataFrame(rows, "seq long, product string, price double")
    path = os.path.join(tempfile.mkdtemp(), "fuzz.parquet")
    df.coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return spark.read.parquet(path), con


@given(rows=rows_strategy)
@SETTINGS
def test_fuzz_grouped_stats_match_duckdb(spark, rows):
    df, con = _materialize(spark, rows)
    got = sorted(
        (r["product"], r["order_count"], repr(r["price_sum"]), repr(r["average_price"]))
        for r in product_price_stats(df).collect()
    )
    want = sorted(
        (p, c, repr(s), repr(a))
        for p, c, s, a in con.execute("""
            SELECT product, COUNT(*),
                   CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE),
                   CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM t GROUP BY product
        """).fetchall()
    )
    assert got == want


@given(rows=rows_strategy)
@SETTINGS
def test_fuzz_running_avg_matches_duckdb(spark, rows):
    df, con = _materialize(spark, rows)
    run = running_average(df, key="product", value="price", order_by=("seq",))
    got = sorted(
        (r["seq"], repr(r["running_sum"]), repr(r["running_avg"]))
        for r in run.collect()
    )
    want = sorted(
        (s, repr(rs), repr(ra))
        for s, rs, ra in con.execute("""
            SELECT seq,
                   CAST(SUM(CAST(price AS DECIMAL(18,2))) OVER w AS DOUBLE),
                   CAST(SUM(CAST(price AS DECIMAL(18,2))) OVER w AS DOUBLE)
                     / (COUNT(*) OVER w)
            FROM t
            WINDOW w AS (PARTITION BY product ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """).fetchall()
    )
    assert got == want
