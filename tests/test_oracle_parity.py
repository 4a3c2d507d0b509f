"""Replicates the driver's correctness gate locally: run every
registered query on Spark AND its oracle SQL on DuckDB over the same
parquet tables, then compare row count, column names, and values
(order-insensitive, exact).
"""

from __future__ import annotations

import datetime as _dt
import math
import os

import duckdb
import pyarrow as pa
import pytest

from kafka_avro_order_processing_spark.plans.registry import QUERIES

# The full-registry sweep re-checks the same oracle surface the
# driver-contract drive (scripts/drive_parity.py) covers per commit;
# it stays in the default/round-close run but the fast per-commit
# loop may deselect it with -m "not slow" (pytest.ini).
pytestmark = pytest.mark.slow

# Spark integral type names — oracle columns matching these by name must
# come back integer-typed from DuckDB's arrow path.  DuckDB types a bare
# SUM(BIGINT) as HUGEINT (decimal128 in arrow), which pandas canonicalizes
# to float64, so the driver's string-hash sees "20079.0" vs Spark's
# "20079" even though fetchall() (used below for the value compare) maps
# HUGEINT to Python int and hides the difference.  The repo convention is
# CAST(SUM(x) AS BIGINT) in the oracle's top-level projection.
_SPARK_INTEGRAL = ("byte", "short", "integer", "long")

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _duck(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(v):
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(v)
    if isinstance(v, _dt.date):
        return v.isoformat()
    return repr(v)


def _canon(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    cols = [columns[i] for i in order]
    data = sorted(tuple(_norm(r[i]) for i in order) for r in rows)
    return cols, data


@pytest.mark.parametrize("name", [n for n, q in QUERIES.items() if q.oracle])
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    sdf = q.fn(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    con = _duck(SF_DIR)
    orows = con.execute(q.oracle).fetchall()
    ocols = [d[0] for d in con.description]

    # Dtype gate (the driver canonicalizes through pandas, fetchall()
    # does not): wherever the Spark schema says integral, the oracle's
    # arrow schema must be integer too — HUGEINT/DECIMAL there renders
    # as float64 in the driver's hash and red-rows the query.
    spark_integral = {
        f.name for f in sdf.schema.fields
        if f.dataType.typeName() in _SPARK_INTEGRAL
    }
    arrow_schema = con.execute(q.oracle).fetch_arrow_table().schema
    bad_dtypes = [
        (c, str(arrow_schema.field(c).type))
        for c in spark_integral
        if c in arrow_schema.names
        and not pa.types.is_integer(arrow_schema.field(c).type)
    ]
    assert not bad_dtypes, (
        f"{name}: oracle columns typed non-integer where Spark is integral "
        f"(driver's pandas hash renders these as float64 — add "
        f"CAST(... AS BIGINT) to the oracle's top-level projection): "
        f"{bad_dtypes}"
    )

    s_cols, s_data = _canon(scols, [tuple(r) for r in srows])
    o_cols, o_data = _canon(ocols, orows)

    assert s_cols == o_cols, f"{name}: column names differ: {s_cols} vs {o_cols}"
    assert len(s_data) == len(o_data), (
        f"{name}: row counts differ: spark={len(s_data)} oracle={len(o_data)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_data, o_data) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} mismatching rows; first: {mismatches[:3]}"


@pytest.mark.parametrize("n_shards", [5, 48])
def test_sequence_packing_parameterized_shards(spark, n_shards):
    """pack_sequences must hash-match its oracle at ANY shard count,
    not just the registry-pinned 16 — the shard count is the scale
    knob (sized to the cluster at 100 TB), so internal consistency
    across counts is what makes it safe to turn."""
    from kafka_avro_order_processing_spark.operators.packing import pack_sequences
    from kafka_avro_order_processing_spark.plans.registry import _packing_sql
    from kafka_avro_order_processing_spark.sources.tables import load_table

    sdf = pack_sequences(load_table(spark, SF_DIR, "documents"), n_shards=n_shards)
    srows = sdf.collect()
    con = _duck(SF_DIR)
    orows = con.execute(_packing_sql(n_shards)).fetchall()
    ocols = [d[0] for d in con.description]

    s_cols, s_data = _canon(sdf.columns, [tuple(r) for r in srows])
    o_cols, o_data = _canon(ocols, orows)
    assert s_cols == o_cols
    assert s_data == o_data
    assert len({r["shard"] for r in srows}) == min(
        n_shards, sdf.sparkSession.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )
