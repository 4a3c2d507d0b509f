"""Gram-matrix PCA (operators/pca.py): exact integer Gram entries
(arrow == sql == numpy reference == DuckDB oracle, bit-identical under
repartitioning), planted-structure recovery, exact projection replica,
orthonormal deterministic components, and loud input validation.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.pca import (
    gram_matrix,
    pca_fit,
    pca_project,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
MS = float(1 << 40)


def _vectors(seed=7, n=60, d=6):
    """Planted rank-2 structure + small noise, float32 like parquet."""
    rng = np.random.RandomState(seed)
    a = rng.randn(d)
    b = rng.randn(d)
    X = (
        np.outer(rng.randn(n), a)
        + np.outer(rng.randn(n), b)
        + 0.01 * rng.randn(n, d)
    ).astype(np.float32)
    return X


def _frame(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<float>",
    )


def _ref_gram_ints(X):
    """Independent integer reference: per-term floor(xi*xj*2^40 + 0.5)
    in exact f64 (float32 products are exact), Python-int sums."""
    n, d = X.shape
    out = {}
    for i in range(d):
        for j in range(i, d):
            s = 0
            for r in range(n):
                p = float(X[r, i]) * float(X[r, j])  # exact in f64
                s += int(math.floor(p * MS + 0.5))
            out[(i + 1, j + 1)] = s
    return out


def test_gram_arrow_equals_sql_equals_reference(spark):
    X = _vectors()
    df = _frame(spark, X)
    ref = _ref_gram_ints(X)
    for method in ("arrow", "sql"):
        got = {
            (r["i"], r["j"]): int(r["q"])
            for r in gram_matrix(df, method=method).collect()
        }
        assert got == ref, method


def test_gram_bit_identical_under_repartitioning(spark):
    X = _vectors()
    df = _frame(spark, X)
    base = {(r["i"], r["j"]): int(r["q"]) for r in gram_matrix(df).collect()}
    for parts in (1, 13):
        again = {
            (r["i"], r["j"]): int(r["q"])
            for r in gram_matrix(df.repartition(parts)).collect()
        }
        assert again == base


def test_gram_duckdb_oracle_on_embeddings(spark):
    """The driver-canonicalization oracle for the promotion queue:
    the same floor-quantized integer sums from DuckDB list indexing."""
    from test_r10_promotion_parity import _assert_parity

    emb = load_table(spark, SF, "embeddings")
    sdf = gram_matrix(emb, "embedding", dim=64)
    sql = f"""
        SELECT i, j,
               CAST(SUM(CAST(floor(CAST(embedding[i] AS DOUBLE)
                                   * CAST(embedding[j] AS DOUBLE)
                                   * {MS!r} + 0.5) AS BIGINT))
                    AS DECIMAL(38,0)) AS q
        FROM '{SF}/embeddings.parquet',
             range(1, 65) r1(i), range(1, 65) r2(j)
        WHERE j >= i
        GROUP BY i, j
    """
    _assert_parity(sdf, sql)


def test_pca_recovers_planted_structure(spark):
    X = _vectors()
    model = pca_fit(_frame(spark, X), k=4)
    # rank-2 structure + 1% noise: top-2 components own the variance
    assert model["ratio"][0] + model["ratio"][1] > 0.95
    assert model["eigenvalues"] == sorted(model["eigenvalues"], reverse=True)
    # components are orthonormal
    W = np.array(model["components"])
    assert np.abs(W @ W.T - np.eye(4)).max() < 1e-9
    # deterministic sign convention: the largest-|loading| entry is +
    for row in W:
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_pca_matches_numpy_reference(spark):
    """Eigenvalues vs numpy PCA on the SAME quantized covariance the
    operator assembles — the distributed part is exact, so only the
    descale + eigh float path remains, which both sides share."""
    X = _vectors()
    df = _frame(spark, X)
    model = pca_fit(df, k=3)
    n, d = X.shape
    ref = _ref_gram_ints(X)
    G = np.zeros((d, d))
    for (i, j), q in ref.items():
        G[i - 1, j - 1] = G[j - 1, i - 1] = q / MS
    mu_int = [
        sum(int(math.floor(float(X[r, i]) * MS + 0.5)) for r in range(n))
        for i in range(d)
    ]
    mu = np.array(mu_int) / (MS * n)
    C = (G - n * np.outer(mu, mu)) / (n - 1)
    ev = np.linalg.eigh(C)[0][::-1]
    assert model["eigenvalues"] == pytest.approx(list(ev[:3]), rel=1e-12)
    assert model["mean"] == list(mu)


def test_projection_exact_replica_and_nulls(spark):
    X = _vectors()
    df = _frame(spark, X)
    model = pca_fit(df, k=2)
    W = np.array(model["components"])
    mu = np.array(model["mean"])
    rows = pca_project(df, model).orderBy("vec_id").collect()
    for r in rows:
        expect = W @ (np.asarray(r["embedding"], dtype=np.float64) - mu)
        assert r["pca"] == list(expect)  # exact: same numpy ops per row
    probe = spark.createDataFrame(
        [(0, None), (1, [1.0, 2.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["pca"] for r in pca_project(probe, model).collect()}
    assert got[0] is None
    assert got[1] is None  # wrong dimension: NULL, not garbage


def test_validation_rejects_bad_vectors(spark):
    """Validation is folded into the one corpus scan (r10 verdict):
    both builders return LAZILY and raise on the first bad vector at
    action time — NULL, wrong-length, and (the r10 ADVICE gap) an
    element whose |x| breaks the 2^52 floor() exactness bound."""
    bad = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, None)], "vec_id long, embedding array<float>"
    )
    short = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0])], "vec_id long, embedding array<float>"
    )
    # |x| = 65 > 64 at the default 40 scale bits: 65*65*2^40 > 2^52
    big = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [65.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    for method in ("arrow", "sql"):
        for frame in (bad, short, big):
            lazy = gram_matrix(frame, dim=2, method=method)  # no action yet
            with pytest.raises(Exception, match="filter explicitly"):
                lazy.collect()
    # the bound scales with scale_bits: |x|=65 is fine at 39 bits
    ok = gram_matrix(big, dim=2, scale_bits=39, method="sql").collect()
    assert len(ok) == 3
    with pytest.raises(ValueError, match="k must be"):
        pca_fit(_frame(spark, _vectors()), k=99)
    with pytest.raises(ValueError, match="scale_bits"):
        gram_matrix(big, dim=2, scale_bits=52)


def test_sql_method_is_python_free(spark):
    df = _frame(spark, _vectors())
    plan = (
        gram_matrix(df, method="sql")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "mapInPandas" not in plan.lower()


def test_gram_arrow_chunking_bit_equal(spark):
    """More rows than one chunk (1024 at d=6) must still be bit-equal
    to the SQL builder — the chunked int64 partials + decimal summation
    path (the silent-int64-wrap regression guard)."""
    rng = np.random.RandomState(3)
    X = (rng.randn(1500, 6) * 4).astype(np.float32)
    df = _frame(spark, X).repartition(2)
    a = {(r["i"], r["j"]): int(r["q"]) for r in gram_matrix(df, method="arrow").collect()}
    b = {(r["i"], r["j"]): int(r["q"]) for r in gram_matrix(df, method="sql").collect()}
    assert a == b
