"""SQ8 scalar quantization (operators/similarity.py): integer-code
DuckDB oracle parity, reconstruction error bound, ADC fold equals
decoded dot, and recall against the brute-force truth.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.similarity import (
    cosine_topk,
    sq8_bounds,
    sq8_encode,
    sq8_topk,
    with_norm,
)

SF = "/root/testdata/sf0.001"


def _emb(spark):
    from kafka_avro_order_processing_spark.sources.tables import load_table

    return load_table(spark, SF, "embeddings")


def test_codes_match_duckdb_oracle(spark):
    from test_oracle_parity import _canon, _duck

    emb = _emb(spark)
    sdf = sq8_encode(emb, sq8_bounds(emb))
    sql = """
    WITH pos AS (
      SELECT vec_id, embedding,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings
    ),
    b AS (
      SELECT i, MIN(CAST(embedding[i] AS DOUBLE)) AS lo,
             MAX(CAST(embedding[i] AS DOUBLE)) AS hi
      FROM pos GROUP BY i
    ),
    c AS (
      SELECT p.vec_id, p.i,
             CASE WHEN b.hi = b.lo THEN 0 ELSE
               CAST(LEAST(255, GREATEST(0,
                 FLOOR((CAST(p.embedding[p.i] AS DOUBLE) - b.lo)
                       / (b.hi - b.lo) * 255 + CAST(0.5 AS DOUBLE))))
               AS INTEGER) END AS code
      FROM pos p JOIN b USING (i)
    )
    SELECT vec_id, list(code ORDER BY i) AS codes FROM c GROUP BY vec_id
    """
    con = _duck(SF)
    orows = con.execute(sql).fetchall()
    ocols = [d[0] for d in con.description]
    s_cols, s_data = _canon(sdf.columns, [tuple(r) for r in sdf.collect()])
    o_cols, o_data = _canon(ocols, orows)
    assert s_cols == o_cols
    assert s_data == o_data


def test_reconstruction_error_within_half_step(spark):
    emb = _emb(spark)
    bounds = sq8_bounds(emb)
    by_dim = {r["dim"]: (r["lo"], r["hi"]) for r in bounds.collect()}
    codes = {r["vec_id"]: r["codes"] for r in sq8_encode(emb, bounds).collect()}
    vecs = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for vid, v in list(vecs.items())[:50]:
        for d, x in enumerate(v):
            lo, hi = by_dim[d]
            step = (hi - lo) / 255 if hi > lo else 0.0
            decoded = lo + codes[vid][d] * step
            assert abs(decoded - x) <= step / 2 + 1e-9, (vid, d)


def test_topk_recall_against_brute_force(spark):
    emb = _emb(spark)
    # normalize so the SQ8 dot ranking is a cosine ranking
    normed = with_norm(emb).select(
        "vec_id",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: (x / F.col("norm")).cast("float"),
        ).alias("embedding"),
    ).localCheckpoint(eager=True)
    queries = normed.filter(F.col("vec_id") < 5)
    truth = cosine_topk(normed, queries, k=10)
    bounds = sq8_bounds(normed)
    approx = sq8_topk(sq8_encode(normed, bounds), queries, bounds, k=10)
    n_hit = truth.join(
        approx, ["query_id", "neighbor_id"], "leftsemi"
    ).count()
    recall = n_hit / truth.count()
    assert recall >= 0.8, recall  # 8-bit/dim keeps ranking nearly exact


def test_constant_dimension_codes_zero(spark):
    rows = [(i, [float(i), 7.0]) for i in range(4)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    b = sq8_bounds(df)
    got = {r["vec_id"]: r["codes"] for r in sq8_encode(df, b).collect()}
    assert all(c[1] == 0 for c in got.values())   # hi == lo -> 0
    assert got[0][0] == 0 and got[3][0] == 255    # endpoints exact
