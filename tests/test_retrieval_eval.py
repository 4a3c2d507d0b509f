"""Ranked-retrieval evaluation (operators/retrieval_eval.py): exact
Python-replica parity on crafted cases, a hypothesis fuzz, the
bit-determinism pin under repartitioning, and a DuckDB oracle through
the driver's canonicalization (promotion-ready, like
test_r10_promotion_parity.py).
"""

from __future__ import annotations

import pytest

from hypothesis import given, settings, strategies as st

from kafka_avro_order_processing_spark.operators.retrieval_eval import (
    discount_table,
    mean_retrieval_metrics,
    ranked_retrieval_eval,
)

K = 5


def _py_eval(runs, qrels, k=K):
    """Replica: same definitions, same left-to-right float folds."""
    disc = discount_table(k)
    by_q_rel = {}
    for q, d, rel in qrels:
        by_q_rel.setdefault(q, {})[d] = float(rel)
    by_q_run = {}
    for q, d, r in runs:
        if r <= k:
            by_q_run.setdefault(q, []).append((r, d))
    out = {}
    for q, rels in by_q_rel.items():
        n_rel = sum(1 for v in rels.values() if v > 0)
        ranked = sorted(by_q_run.get(q, []))
        n_ret = len(ranked)
        hits = [(r, d) for r, d in ranked if rels.get(d, 0.0) > 0]
        n_rel_ret = len(hits)
        first = hits[0][0] if hits else None
        rr = 1.0 / first if first else 0.0
        ap_num = 0.0
        j = 0
        for r, d in ranked:  # rank order fold
            if rels.get(d, 0.0) > 0:
                j += 1
                ap_num += j / r
            else:
                ap_num += 0.0
        dcg = 0.0
        for r, d in ranked:
            g = (2.0 ** rels[d] - 1.0) if rels.get(d, 0.0) > 0 else 0.0
            dcg += g * disc[r - 1]
        gains = sorted(
            ((2.0 ** v - 1.0) if v > 0 else 0.0 for v in rels.values()),
            reverse=True,
        )[:k]
        idcg = 0.0
        for i, g in enumerate(gains):
            idcg += g * disc[i]
        out[q] = {
            "n_rel": n_rel,
            "n_ret": n_ret,
            "n_rel_ret": n_rel_ret,
            "precision_at_k": n_rel_ret / k,
            "recall_at_k": (n_rel_ret / n_rel) if n_rel else None,
            "rr": rr,
            "ap": (ap_num / n_rel) if n_rel else None,
            "dcg": dcg,
            "idcg": idcg,
            "ndcg": (dcg / idcg) if idcg > 0 else None,
        }
    return out


RUNS = [
    # q1: judged docs at ranks 1,3,5 (one irrelevant judged at 2)
    (1, 101, 1), (1, 102, 2), (1, 103, 3), (1, 104, 4), (1, 105, 5),
    (1, 106, 6),                     # beyond k — ignored
    # q2: no relevant retrieved
    (2, 201, 1), (2, 202, 2),
    # q3: unjudged query — excluded from output
    (3, 301, 1),
    # q5: under-filled run (2 of k=5)
    (5, 501, 1), (5, 502, 2),
]
QRELS = [
    (1, 101, 2.0), (1, 102, 0.0), (1, 103, 1.0), (1, 105, 3.0), (1, 999, 1.0),
    (2, 299, 1.0),
    (4, 401, 1.0),                   # judged, never retrieved
    (5, 501, 1.0), (5, 502, 2.0), (5, 503, 3.0),
    (6, 601, 0.0),                   # all judgments non-positive
]


def _collect(spark, runs, qrels, k=K):
    rdf = spark.createDataFrame(runs, "query_id long, doc_id long, rank int")
    qdf = spark.createDataFrame(qrels, "query_id long, doc_id long, rel double")
    return {
        r["query_id"]: r.asDict()
        for r in ranked_retrieval_eval(rdf, qdf, k=k).collect()
    }


def test_matches_python_replica_exactly(spark):
    got = _collect(spark, RUNS, QRELS)
    want = _py_eval([(q, d, r) for q, d, r in RUNS], QRELS)
    assert set(got) == set(want)  # judged queries only; q3 excluded
    for q, w in want.items():
        g = got[q]
        for key, v in w.items():
            assert g[key] == v, (q, key, g[key], v)


def test_edge_semantics(spark):
    got = _collect(spark, RUNS, QRELS)
    assert 3 not in got                      # unjudged query excluded
    g4 = got[4]                              # judged, never retrieved
    assert (g4["n_ret"], g4["n_rel_ret"], g4["rr"]) == (0, 0, 0.0)
    assert g4["precision_at_k"] == 0.0 and g4["recall_at_k"] == 0.0
    assert g4["dcg"] == 0.0 and g4["ndcg"] == 0.0
    g6 = got[6]                              # all judgments non-positive
    assert g6["n_rel"] == 0
    assert g6["recall_at_k"] is None and g6["ap"] is None and g6["ndcg"] is None
    g5 = got[5]                              # perfect under-filled run
    assert g5["precision_at_k"] == 2 / 5     # penalized by literal k
    assert g5["ndcg"] is not None and g5["ndcg"] < 1.0  # 503 never retrieved


def test_means_exclude_nulls(spark):
    rdf = spark.createDataFrame(RUNS, "query_id long, doc_id long, rank int")
    qdf = spark.createDataFrame(QRELS, "query_id long, doc_id long, rel double")
    per_q = ranked_retrieval_eval(rdf, qdf, k=K)
    m = mean_retrieval_metrics(per_q)
    want = _py_eval([(q, d, r) for q, d, r in RUNS], QRELS)
    vals = [w["ndcg"] for w in want.values() if w["ndcg"] is not None]
    assert m["n_ndcg"] == len(vals)
    assert abs(m["mean_ndcg"] - sum(vals) / len(vals)) < 1e-12
    assert m["n_rr"] == len(want)            # rr is never NULL


def test_bit_identical_under_repartitioning(spark):
    rdf = spark.createDataFrame(RUNS, "query_id long, doc_id long, rank int")
    qdf = spark.createDataFrame(QRELS, "query_id long, doc_id long, rel double")
    a = sorted(map(tuple, ranked_retrieval_eval(rdf, qdf, k=K).collect()))
    b = sorted(
        map(
            tuple,
            ranked_retrieval_eval(
                rdf.repartition(7), qdf.repartition(3), k=K
            ).collect(),
        )
    )
    assert a == b


@settings(max_examples=25, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(1, 3),          # query
            st.integers(1, 12),         # doc
            st.integers(0, 3),          # grade
        ),
        min_size=1,
        max_size=15,
        unique_by=lambda t: (t[0], t[1]),
    ),
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(1, 12)),
        min_size=1,
        max_size=15,
        unique_by=lambda t: (t[0], t[1]),
    ),
)
@pytest.mark.slow
def test_fuzz_vs_replica(spark, qrels, run_pairs):
    # ranks: position within each query's listed docs (1-based, unique)
    seen: dict = {}
    runs = []
    for q, d in run_pairs:
        seen[q] = seen.get(q, 0) + 1
        runs.append((q, d, seen[q]))
    got = _collect(spark, runs, [(q, d, float(g)) for q, d, g in qrels])
    want = _py_eval(runs, [(q, d, float(g)) for q, d, g in qrels])
    assert set(got) == set(want)
    for q, w in want.items():
        for key, v in w.items():
            assert got[q][key] == v, (q, key)


def test_duckdb_oracle_parity(spark):
    """Promotion-grade oracle: runs = per-lang n_chars ranking over
    documents, qrels = a deterministic judged subset with integer
    grades; compared via the driver's canonicalization (exact reprs).
    """
    from pyspark.sql import functions as F
    from test_oracle_parity import SF_DIR, _canon, _duck
    from kafka_avro_order_processing_spark.sources.tables import load_table
    from pyspark.sql import Window

    docs = load_table(spark, SF_DIR, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    runs = docs.select(
        F.col("lang").alias("query_id"),
        "doc_id",
        F.row_number().over(w).alias("rank"),
    ).filter(F.col("rank") <= K)
    qrels = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("lang").alias("query_id"),
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, (F.col("doc_id") % 4).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("rel"),
    )
    sdf = ranked_retrieval_eval(runs, qrels, k=K, query_col="query_id")

    # DuckDB lexes a bare float literal as DECIMAL and the
    # decimal->double conversion can lose the bottom ulp; routing the
    # repr through a STRING cast parses the exact double (pinned
    # gotcha: 0.38685280723454163 as a numeric literal reads back
    # ...157).
    disc_rows = ", ".join(
        f"({i + 1}, CAST('{x!r}' AS DOUBLE))"
        for i, x in enumerate(discount_table(K))
    )
    sql = f"""
    WITH disc(rank, d) AS (VALUES {disc_rows}),
    runs AS (
      SELECT lang AS q, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rank
      FROM documents
      QUALIFY rank <= {K}
    ),
    qrels AS (
      SELECT lang AS q, doc_id,
             CASE WHEN doc_id % 3 = 0 THEN CAST(doc_id % 4 AS DOUBLE)
                  ELSE 0.0 END AS rel
      FROM documents WHERE doc_id % 2 = 0
    ),
    gains AS (
      SELECT q, CAST(SUM(CASE WHEN rel > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_rel,
             list(CASE WHEN rel > 0 THEN pow(2.0, rel) - 1.0 ELSE 0.0 END
                  ORDER BY (CASE WHEN rel > 0 THEN pow(2.0, rel) - 1.0
                                 ELSE 0.0 END) DESC) AS g_desc
      FROM qrels GROUP BY q
    ),
    idcgs AS (
      SELECT q, n_rel,
             list_reduce(
               list_prepend(CAST(0.0 AS DOUBLE),
                 list_transform(
                   list_zip(g_desc[1:{K}],
                            (SELECT list(d ORDER BY rank) FROM disc)),
                   z -> COALESCE(z[1], 0.0) * COALESCE(z[2], 0.0))),
               (a, b) -> a + b) AS idcg
      FROM gains
    ),
    joined AS (
      SELECT r.q, r.rank,
             COALESCE(x.rel > 0, FALSE) AS hit,
             COALESCE(CASE WHEN x.rel > 0 THEN pow(2.0, x.rel) - 1.0 END, 0.0)
               * d.d AS dterm
      FROM runs r
      LEFT JOIN qrels x ON r.q = x.q AND r.doc_id = x.doc_id
      JOIN disc d ON d.rank = r.rank
    ),
    with_j AS (
      SELECT q, rank, hit, dterm,
             SUM(CASE WHEN hit THEN 1 ELSE 0 END)
               OVER (PARTITION BY q ORDER BY rank
                     ROWS UNBOUNDED PRECEDING) AS j
      FROM joined
    ),
    per_q AS (
      SELECT q,
             CAST(COUNT(*) AS BIGINT) AS n_ret,
             CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_rel_ret,
             MIN(CASE WHEN hit THEN rank END) AS first_rank,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(dterm ORDER BY rank)), (a, b) -> a + b) AS dcg,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CASE WHEN hit THEN CAST(j AS DOUBLE) / CAST(rank AS DOUBLE)
                         ELSE 0.0 END ORDER BY rank)),
               (a, b) -> a + b) AS ap_num
      FROM with_j GROUP BY q
    )
    SELECT i.q AS query_id,
           i.n_rel,
           CAST(COALESCE(p.n_ret, 0) AS BIGINT) AS n_ret,
           CAST(COALESCE(p.n_rel_ret, 0) AS BIGINT) AS n_rel_ret,
           CAST(COALESCE(p.n_rel_ret, 0) AS DOUBLE) / {float(K)!r} AS precision_at_k,
           CASE WHEN i.n_rel > 0 THEN
             CAST(COALESCE(p.n_rel_ret, 0) AS DOUBLE) / CAST(i.n_rel AS DOUBLE)
           END AS recall_at_k,
           COALESCE(1.0 / CAST(p.first_rank AS DOUBLE), 0.0) AS rr,
           CASE WHEN i.n_rel > 0 THEN
             COALESCE(p.ap_num, 0.0) / CAST(i.n_rel AS DOUBLE)
           END AS ap,
           COALESCE(p.dcg, 0.0) AS dcg,
           i.idcg AS idcg,
           CASE WHEN i.idcg > 0 THEN COALESCE(p.dcg, 0.0) / i.idcg END AS ndcg
    FROM idcgs i LEFT JOIN per_q p USING (q)
    """
    con = _duck(SF_DIR)
    orows = con.execute(sql).fetchall()
    ocols = [d[0] for d in con.description]
    s_cols, s_data = _canon(sdf.columns, [tuple(r) for r in sdf.collect()])
    o_cols, o_data = _canon(ocols, orows)
    assert s_cols == o_cols
    assert s_data == o_data


def test_grouped_means_bit_equal_scalar_per_group(spark):
    from pyspark.sql import functions as F

    from kafka_avro_order_processing_spark.operators.retrieval_eval import (
        grouped_mean_retrieval_metrics,
    )

    rdf = spark.createDataFrame(RUNS, "query_id long, doc_id long, rank int")
    qdf = spark.createDataFrame(QRELS, "query_id long, doc_id long, rel double")
    per_q = ranked_retrieval_eval(rdf, qdf, k=K).withColumn(
        "segment", (F.col("query_id") % 2).cast("string")
    )
    grouped = {
        r["segment"]: r.asDict()
        for r in grouped_mean_retrieval_metrics(per_q, "segment").collect()
    }
    for seg in ("0", "1"):
        scalar = mean_retrieval_metrics(per_q.filter(F.col("segment") == seg))
        g = grouped[seg]
        for c in ("precision_at_k", "recall_at_k", "rr", "ap", "ndcg"):
            assert g[f"mean_{c}"] == scalar[f"mean_{c}"], (seg, c)
            assert g[f"n_{c}"] == scalar[f"n_{c}"], (seg, c)
    # a segment of only-unjudgeable queries reports NULL-with-count-0
    only6 = per_q.filter(F.col("query_id") == 6).withColumn(
        "segment", F.lit("z")
    )
    z = grouped_mean_retrieval_metrics(only6, "segment").collect()[0]
    assert z["n_ndcg"] == 0 and z["mean_ndcg"] is None
    assert z["n_rr"] == 1  # rr exists even there


def test_grouped_duckdb_oracle_parity(spark):
    """Promotion-grade oracle for the per-segment sweep (r8 verdict
    task 6): grouped_mean_retrieval_metrics over the SAME runs/qrels
    as the scalar parity test, segmented by the query's first letter,
    through the driver's canonicalization.  Reuses the per-query SQL
    and the floor(x+0.5) HALF_UP scaled-mean idiom staged in
    plans/promotions_r10.py (Spark's double->decimal cast rounds
    HALF_UP; DuckDB's rounds half-to-even — the r9 gotcha)."""
    from pyspark.sql import functions as F
    from test_oracle_parity import SF_DIR
    from test_r10_promotion_parity import _assert_parity
    from pyspark.sql import Window

    from kafka_avro_order_processing_spark.operators.retrieval_eval import (
        grouped_mean_retrieval_metrics,
    )
    from kafka_avro_order_processing_spark.plans.promotions_r10 import (
        _PER_QUERY_SQL,
        _RET_K,
        _mean_sql,
    )
    from kafka_avro_order_processing_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    w = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    runs = docs.select(
        F.col("lang").alias("query_id"),
        "doc_id",
        F.row_number().over(w).alias("rank"),
    ).filter(F.col("rank") <= _RET_K)
    qrels = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("lang").alias("query_id"),
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0, (F.col("doc_id") % 4).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("rel"),
    )
    per_query = ranked_retrieval_eval(runs, qrels, k=_RET_K, query_col="query_id")
    sdf = grouped_mean_retrieval_metrics(
        per_query.withColumn("seg", F.substring("query_id", 1, 1)), "seg"
    )
    means = ",\n           ".join(
        _mean_sql(c)
        for c in ("precision_at_k", "recall_at_k", "rr", "ap", "ndcg")
    )
    _assert_parity(
        sdf,
        f"""
        WITH {_PER_QUERY_SQL}
        SELECT substr(query_id, 1, 1) AS seg,
               CAST(COUNT(*) AS BIGINT) AS n_queries,
               {means}
        FROM pq GROUP BY substr(query_id, 1, 1)
        """,
    )


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (rrf_fuse)
# ---------------------------------------------------------------------------


def _py_rrf(runs, k=60):
    """Replica: same term, same run-index-ordered left-to-right sum,
    same (score desc, doc asc) total order."""
    terms = {}
    for ri, run in enumerate(runs):
        for q, d, r in run:
            terms.setdefault((q, d), []).append((ri, 1.0 / (k + r)))
    fused = {}
    for (q, d), ts in terms.items():
        s = 0.0
        for _ri, t in sorted(ts):
            s += t
        fused.setdefault(q, []).append((d, s, len(ts)))
    out = {}
    for q, docs in fused.items():
        ranked = sorted(docs, key=lambda x: (-x[1], x[0]))
        for i, (d, s, n) in enumerate(ranked, 1):
            out[(q, d)] = (s, n, i)
    return out


def test_rrf_fuse_matches_replica(spark):
    from kafka_avro_order_processing_spark.operators.retrieval_eval import (
        rrf_fuse,
    )

    run_a = [("q1", 10, 1), ("q1", 11, 2), ("q1", 12, 3), ("q2", 20, 1)]
    run_b = [("q1", 11, 1), ("q1", 13, 2), ("q2", 20, 1), ("q2", 21, 2)]
    run_c = [("q1", 12, 1), ("q1", 10, 2)]
    dfs = [
        spark.createDataFrame(r, "query_id string, doc_id long, rank int")
        for r in (run_a, run_b, run_c)
    ]
    got = {
        (r["query_id"], r["doc_id"]): (
            r["rrf_score"], r["n_runs_hit"], r["fused_rank"]
        )
        for r in rrf_fuse(dfs).collect()
    }
    assert got == _py_rrf([run_a, run_b, run_c])
    # docs 10 and 11 tie EXACTLY (each scores 1/61 + 1/62, just from
    # different runs — identical f64 sums): the doc-asc tie-break is
    # what makes the ranking total, and both out-rank every other doc
    assert got[("q1", 10)][0] == got[("q1", 11)][0]
    assert got[("q1", 10)][2] == 1 and got[("q1", 11)][2] == 2
    assert got[("q1", 12)][2] == 3
    # plan rules: pure built-ins — no Python crossing, no cartesian
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        rrf_fuse(dfs).explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan and "CartesianProduct" not in plan


def test_rrf_fuse_single_run_preserves_order_and_validates(spark):
    import pytest

    from kafka_avro_order_processing_spark.operators.retrieval_eval import (
        rrf_fuse,
    )

    run = [("q", 5, 1), ("q", 9, 2), ("q", 2, 3)]
    df = spark.createDataFrame(run, "query_id string, doc_id long, rank int")
    out = {
        r["doc_id"]: r["fused_rank"] for r in rrf_fuse([df], topk=2).collect()
    }
    # 1/(k+rank) is strictly decreasing in rank: fusion of ONE run is
    # that run's own order, and topk keeps its head
    assert out == {5: 1, 9: 2}
    with pytest.raises(ValueError, match="at least one run"):
        rrf_fuse([])
    with pytest.raises(ValueError, match="k must be"):
        rrf_fuse([df], k=0)


def test_rrf_fuse_duckdb_oracle(spark):
    """Promotion-grade oracle: two runs both engines derive from
    documents (per-lang n_chars ranking and per-lang doc_id ranking),
    fused at k=60, through the driver canonicalization."""
    from pyspark.sql import functions as F
    from pyspark.sql import Window
    from test_oracle_parity import SF_DIR
    from test_r10_promotion_parity import _assert_parity

    from kafka_avro_order_processing_spark.operators.retrieval_eval import (
        rrf_fuse,
    )
    from kafka_avro_order_processing_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents")
    wa = Window.partitionBy("lang").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    wb = Window.partitionBy("lang").orderBy(F.asc("doc_id"))
    run_a = docs.select(
        F.col("lang").alias("query_id"), "doc_id",
        F.row_number().over(wa).alias("rank"),
    ).filter(F.col("rank") <= 8)
    run_b = docs.select(
        F.col("lang").alias("query_id"), "doc_id",
        F.row_number().over(wb).alias("rank"),
    ).filter(F.col("rank") <= 8)
    sdf = rrf_fuse([run_a, run_b], topk=5)
    _assert_parity(
        sdf,
        """
        WITH ra AS (
          SELECT lang AS q, doc_id, 0 AS run_idx,
                 ROW_NUMBER() OVER (PARTITION BY lang
                                    ORDER BY n_chars DESC, doc_id) AS rank
          FROM documents QUALIFY rank <= 8
        ),
        rb AS (
          SELECT lang AS q, doc_id, 1 AS run_idx,
                 ROW_NUMBER() OVER (PARTITION BY lang ORDER BY doc_id) AS rank
          FROM documents QUALIFY rank <= 8
        ),
        u AS (
          SELECT q, doc_id, run_idx,
                 1.0 / CAST(60 + rank AS DOUBLE) AS term
          FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
        ),
        agg AS (
          SELECT q AS query_id, doc_id,
                 list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                                list(term ORDER BY run_idx)),
                   (a, b) -> a + b) AS rrf_score,
                 CAST(COUNT(*) AS BIGINT) AS n_runs_hit
          FROM u GROUP BY q, doc_id
        )
        SELECT query_id, doc_id, rrf_score, n_runs_hit,
               CAST(ROW_NUMBER() OVER (
                 PARTITION BY query_id
                 ORDER BY rrf_score DESC, doc_id) AS INTEGER) AS fused_rank
        FROM agg
        QUALIFY fused_rank <= 5
        """,
    )
