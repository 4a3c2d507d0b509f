"""kmeans_refine under heavy cell skew: one cell holding ~90% of the
vectors must (a) still hash-match the DuckDB oracle bit-for-bit and
(b) do so WITHOUT materializing whole cells in aggregation buffers —
the per-(cell, dim) mean is an order-free 2^52-scaled decimal partial
sum, so a hot cell costs O(1) aggregation state, not O(members)."""

from __future__ import annotations

import contextlib
import io
import os
import tempfile

import duckdb
import numpy as np
import pytest

from kafka_avro_order_processing_spark.operators.similarity import (
    cell_means,
    kmeans_refine,
)


def _skewed_embeddings(spark, n=400, dim=8, k=4, hot_frac=0.9, seed=7):
    """~hot_frac of vectors point near one direction (they all land in
    one Lloyd cell); the rest are spread.  float32 values, tiny
    magnitudes clipped to keep the 2^52-integrality contract."""
    rng = np.random.default_rng(seed)
    hot_dir = rng.normal(size=dim)
    hot_dir /= np.linalg.norm(hot_dir)
    rows = []
    for i in range(n):
        if i >= k and rng.random() < hot_frac:
            v = hot_dir + rng.normal(scale=0.05, size=dim)
        else:
            v = rng.normal(size=dim)
        v32 = v.astype(np.float32)
        v32[np.abs(v32) < 2.0**-29] = 0.0
        rows.append((i, [float(x) for x in v32]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.fixture(scope="module")
def skew_path(spark):
    df = _skewed_embeddings(spark)
    path = os.path.join(tempfile.mkdtemp(), "skew_embeddings.parquet")
    df.coalesce(1).write.parquet(path)
    return path


def test_skewed_cell_matches_oracle(spark, skew_path):
    from kafka_avro_order_processing_spark.plans.registry import _kmeans_oracle

    df = spark.read.parquet(skew_path)
    got = sorted(
        (r["cell_id"], r["n_members"], repr(r["centroid_norm"]), repr(r["centroid_sum"]))
        for r in kmeans_refine(df, k=4, iters=2).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{skew_path}/*.parquet')"
    )
    want = sorted(
        (c, n, repr(norm), repr(s))
        for c, n, norm, s in con.execute(_kmeans_oracle(k=4, iters=2)).fetchall()
    )
    assert got == want
    # the skew actually happened: one cell dominates
    counts = sorted(n for _, n, _, _ in got)
    assert counts[-1] >= 0.7 * sum(counts)


def test_cell_means_plan_has_no_unbounded_buffers(spark, skew_path):
    from pyspark.sql import functions as F

    df = spark.read.parquet(skew_path)
    elems = df.select(
        F.col("vec_id"), F.posexplode(F.col("embedding")).alias("dim", "val")
    )
    assigned = df.select("vec_id", (F.col("vec_id") % 4).alias("centroid_id"))
    plan_buf = io.StringIO()
    with contextlib.redirect_stdout(plan_buf):
        cell_means(assigned, elems).explain("formatted")
    plan = plan_buf.getvalue()
    assert "collect_list" not in plan
    # decimal SUM partials aggregate map-side in codegen'd HashAggregate,
    # never the ObjectHashAggregate fallback collect_list forces
    assert "ObjectHashAggregate" not in plan
    assert "HashAggregate" in plan
