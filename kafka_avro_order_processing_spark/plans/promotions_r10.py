"""Round-10 promotion queue: five registry-ready blocks, STAGED.

Round 9's rotation window has ZERO headroom (45 deadline names + 5
fills — see the ``_LEAD_ORDER`` boundary comment in ``registry.py``),
so these five strongest suite-proven operators are written here as
complete ``Query`` blocks — Spark plan, DuckDB oracle, tags, doc —
but NOT registered.  Every oracle below is the exact SQL already
proven through the driver's canonicalization by the suite
(``tests/test_r10_promotion_parity.py``,
``tests/test_winnowing.py::test_duckdb_oracle_parity``,
``tests/test_retrieval_eval.py::test_duckdb_oracle_parity``), and
``tests/test_r10_promotion_blocks.py`` drives THESE blocks end-to-end
(fn + oracle string) the way the grading driver would.

The round-10 mechanical swap (verdict r8 task 3):
1. in ``registry.py``, add ``from .promotions_r10 import promote``
   and call ``promote()`` just BEFORE ``_apply_order()``;
2. lead the r10 ``_LEAD_ORDER`` with the 45 remaining r7-window names
   (deadline r10 — the 50 r7-window names minus the 5 fills checked
   in r9: per_product_stats, overall_stats,
   generated_orders_datasource, sql_api_events_hourly,
   value_percentiles), then place THESE FIVE names as the 5 fill
   slots (new names must sit inside the first 50 — the standing
   QUERY-ADDITION rule, suite-enforced by test_rotation_window.py);
   the r8-window fills then wait for round 11.
3. run ``tests/test_rotation_window.py`` + a full sf0.01
   ``scripts/drive_parity.py`` drive before committing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.retrieval_eval import discount_table
from ..sources.tables import load_table
from .registry import QUERIES, Query, _hexval

#: Staged blocks, keyed by their future registry name.
R10_PROMOTIONS: dict[str, Query] = {}


def _stage(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn):
        R10_PROMOTIONS[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=doc
        )
        return fn

    return deco


def promote() -> None:
    """Round-10 swap: insert every staged block into the live
    registry.  Call from ``registry.py`` just before
    ``_apply_order()`` (see the module docstring's 3-step recipe).
    Refuses name collisions loudly."""
    clash = set(R10_PROMOTIONS) & set(QUERIES)
    if clash:
        raise ValueError(f"promotion names already registered: {sorted(clash)}")
    for name, q in R10_PROMOTIONS.items():
        QUERIES[name] = q


# ---------------------------------------------------------------------------
# 1. roc_auc — the exact-eval engine's headline scalar (operators/eval.py).
#    Scored frame both engines derive identically from lineitem:
#    score = l_quantity (integer-valued, tie-dense — exercises the
#    tie-corrected midrank), label = returned flag.
# ---------------------------------------------------------------------------

_SCORED_SQL = (
    "SELECT l_quantity AS s,"
    " CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM lineitem"
)


@_stage(
    "roc_auc",
    f"""
    WITH t AS ({_SCORED_SQL}),
    r AS (
      SELECT y, RANK() OVER (ORDER BY s) AS rk,
             COUNT(*) OVER (PARTITION BY s) AS c
      FROM t WHERE s IS NOT NULL
    )
    SELECT CAST(CAST(SUM(CASE WHEN y = 1 THEN 2*rk + c - 1 ELSE 0 END)
                     - SUM(y) * (SUM(y) + 1) AS BIGINT) AS DOUBLE)
           / CAST(2 * SUM(y) * (COUNT(*) - SUM(y)) AS DOUBLE) AS auc
    FROM r
    """,
    tags=("m5", "eval"),
    doc="Exact tie-corrected ROC-AUC (Mann-Whitney) of the returned "
        "flag scored by quantity — the eval engine's two-level prefix "
        "sum (operators/eval.py:159), zero SinglePartition stages; "
        "oracle is the SQL RANK midrank algebra (doubled midrank of a "
        "tie group: 2*rk + c - 1).  Proven through the driver "
        "canonicalization since r8 (test_r10_promotion_parity.py).",
)
def q_roc_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.eval import roc_auc

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("s"),
        (F.col("l_returnflag") == "R").cast("int").alias("y"),
    )
    v = roc_auc(li, "s", "y")  # 1-row scalar agg collect (sanctioned)
    return spark.createDataFrame([(float(v),)], "auc double")


# ---------------------------------------------------------------------------
# 2. winnow_fingerprints — SIGMOD'03/MOSS fingerprints over documents
#    (operators/substr.py:148), k=3-gram hashes, window=4.
# ---------------------------------------------------------------------------

_WINNOW_K, _WINNOW_W = 3, 4
_HEX_INT = " + ".join(
    f"{_hexval('md5(gram)', i + 1)} * {16 ** (7 - i)}" for i in range(8)
)


@_stage(
    "winnow_fingerprints",
    f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
                                 t -> t <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(toks, i, i + {_WINNOW_K - 1}), ' ') AS gram
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(1, greatest(len(toks) - {_WINNOW_K - 1}, 0))) AS i
        FROM toks)
    ),
    h AS (SELECT doc_id, pos, CAST({_HEX_INT} AS BIGINT) AS h FROM g),
    wnd AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY doc_id) AS n,
             MIN({{'h': h, 'np': -pos}}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN {_WINNOW_W - 1} PRECEDING AND CURRENT ROW) AS sel
      FROM h
    )
    SELECT DISTINCT doc_id,
           CAST(-((sel).np) AS INTEGER) AS pos,
           (sel).h AS hash
    FROM wnd WHERE pos >= LEAST({_WINNOW_W}, n) - 1
    """,
    tags=("m5", "dedup", "fingerprint"),
    doc="Winnowing fingerprints (Schleimer/Wilkerson/Aiken SIGMOD'03, "
        "the MOSS scheme): md5-prefix 3-gram hashes, trailing 4-window "
        "struct-min with rightmost ties, short-doc convention — the "
        "local-guarantee fingerprint family behind "
        "winnow_candidate_pairs.  Per-document windows only, no "
        "cross-doc shuffle.  Oracle proven since r8 "
        "(tests/test_winnowing.py::test_duckdb_oracle_parity).",
)
def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.substr import winnow_fingerprints

    return winnow_fingerprints(
        load_table(spark, sf_dir, "documents"), k=_WINNOW_K, window=_WINNOW_W
    )


# ---------------------------------------------------------------------------
# 3. mean_retrieval_metrics — corpus means of the trec-style ranked
#    retrieval metrics (operators/retrieval_eval.py): runs = per-lang
#    n_chars ranking, qrels = deterministic judged subset.
# ---------------------------------------------------------------------------

_RET_K = 5
_DISC_ROWS = ", ".join(
    f"({i + 1}, CAST('{x!r}' AS DOUBLE))" for i, x in enumerate(discount_table(_RET_K))
)
_MS = 4503599627370496  # similarity.MEAN_SCALE (2^52)

_PER_QUERY_SQL = f"""
    disc(rank, d) AS (VALUES {_DISC_ROWS}),
    runs AS (
      SELECT lang AS q, doc_id,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_chars DESC, doc_id) AS rank
      FROM documents
      QUALIFY rank <= {_RET_K}
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
                   list_zip(g_desc[1:{_RET_K}],
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
    ),
    pq AS (
      SELECT i.q AS query_id,
             i.n_rel,
             CAST(COALESCE(p.n_ret, 0) AS BIGINT) AS n_ret,
             CAST(COALESCE(p.n_rel_ret, 0) AS BIGINT) AS n_rel_ret,
             CAST(COALESCE(p.n_rel_ret, 0) AS DOUBLE) / {float(_RET_K)!r} AS precision_at_k,
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
    )"""


def _mean_sql(col: str) -> str:
    """The grouped_mean_retrieval_metrics division order, exactly:
    (decimal-sum -> double) / MEAN_SCALE / count — left-associative,
    two f64 divisions, NULLs excluded by SUM/COUNT in both engines.

    GOTCHA (r9): Spark's double->decimal(38,0) CAST rounds HALF_UP
    while DuckDB's rounds half-to-even — a metric like 2/5 scales to
    an exact ....5 double (ulp in [2^50, 2^52) is <= 0.5) and the two
    engines land one apart.  floor(x + 0.5) is a faithful HALF_UP for
    the non-negative scaled domain (x + 0.5 is exact there), so the
    oracle spells Spark's rounding explicitly.  The registered
    pq-oracle rows never hit this: float32-derived values times 2^52
    are exact integers, nothing to round."""
    return (
        f"CASE WHEN COUNT({col}) > 0 THEN "
        f"CAST(SUM(CAST(floor({col} * {_MS} + 0.5) AS DECIMAL(38,0))) AS DOUBLE) "
        f"/ CAST({_MS} AS DOUBLE) / CAST(COUNT({col}) AS DOUBLE) END "
        f"AS mean_{col}, CAST(COUNT({col}) AS BIGINT) AS n_{col}"
    )


@_stage(
    "mean_retrieval_metrics",
    f"""
    WITH {_PER_QUERY_SQL}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
           {_mean_sql('precision_at_k')},
           {_mean_sql('recall_at_k')},
           {_mean_sql('rr')},
           {_mean_sql('ap')},
           {_mean_sql('ndcg')}
    FROM pq
    """,
    tags=("m5", "eval", "similarity"),
    doc="Corpus-level ranked-retrieval summary (MRR, MAP, mean NDCG, "
        "mean P@k/R@k with per-metric counts) over the trec-style "
        "per-query frame (operators/retrieval_eval.py): runs = "
        "per-lang n_chars ranking of documents, qrels = a "
        "deterministic judged subset with integer grades.  Every "
        "float sum is a strict left-to-right fold over a rank-sorted "
        "array and every mean goes through the 2^52-scaled decimal "
        "sum, so the row is bit-identical under any partitioning.  "
        "Per-query SQL proven since r8 "
        "(tests/test_retrieval_eval.py::test_duckdb_oracle_parity).",
)
def q_mean_retrieval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval_eval import (
        grouped_mean_retrieval_metrics,
        ranked_retrieval_eval,
    )

    docs = load_table(spark, sf_dir, "documents")
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
    # scalar means = the grouped sweep over one literal segment
    # (suite-pinned bit-equal to mean_retrieval_metrics per group)
    return grouped_mean_retrieval_metrics(
        per_query.withColumn("__g", F.lit(1)), "__g"
    ).drop("__g")


# ---------------------------------------------------------------------------
# 4. profile_table_exact — one-pass table profile of orders, exact
#    distinct counts (operators/profile.py; single Exchange).
# ---------------------------------------------------------------------------

_PROFILE_COLS = {
    "o_orderkey": "bigint",
    "o_orderstatus": "string",
    "o_totalprice": "double",
    "o_orderdate": "timestamp_ntz",
    "o_orderpriority": "string",
}


def _profile_oracle() -> str:
    parts = []
    for c, t in _PROFILE_COLS.items():
        parts.append(f"""
        SELECT '{c}' AS "column", '{t}' AS data_type,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_nulls,
               CASE WHEN COUNT(*) > 0 THEN
                 CAST(COUNT(*) - COUNT({c}) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
               ELSE 0.0 END AS null_frac,
               CAST(MIN({c}) AS VARCHAR) AS min_value,
               CAST(MAX({c}) AS VARCHAR) AS max_value,
               CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct
        FROM orders""")
    return " UNION ALL ".join(parts)


@_stage(
    "profile_table_exact",
    _profile_oracle(),
    tags=("m5", "profile"),
    doc="One-pass table profiling of orders (operators/profile.py): "
        "per column the row count, null count/fraction, native-order "
        "min/max rendered as strings, and the EXACT distinct count "
        "(the registered mode for oracle parity; production default "
        "is HLL++).  data_type strings are Spark simpleStrings of the "
        "known schema; min/max string renderings agree across engines "
        "for bigint, non-extreme doubles, strings and second-precision "
        "timestamps.  Proven since r8 (test_r10_promotion_parity.py).",
)
def q_profile_table_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.profile import profile_table

    return profile_table(
        load_table(spark, sf_dir, "orders"),
        columns=list(_PROFILE_COLS),
        exact=True,
    )


# ---------------------------------------------------------------------------
# 5. duplicated_ngram_spans — ExactSubstr-style span-level dedup at
#    4-gram granularity (operators/substr.py:62): no doc-pair joins,
#    per-doc windows only; integer spans = fully oracle-able.
# ---------------------------------------------------------------------------


@_stage(
    "duplicated_ngram_spans",
    """
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
                                 t -> t <> '') AS toks
      FROM documents
    ),
    grams AS (
      SELECT doc_id,
             unnest(generate_series(1, greatest(len(toks) - 3, 0))) AS i,
             toks
      FROM toks
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(toks, i, i + 3), ' ') AS gram
      FROM grams
    ),
    dup AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2
    ),
    pos AS (
      SELECT g.doc_id, g.pos,
             g.pos - ROW_NUMBER() OVER (PARTITION BY g.doc_id
                                        ORDER BY g.pos) AS island
      FROM g SEMI JOIN dup USING (gram)
    )
    SELECT doc_id,
           CAST(MIN(pos) AS INTEGER) AS span_start,
           CAST(MAX(pos) + 3 AS INTEGER) AS span_end,
           CAST(COUNT(*) AS INTEGER) AS n_grams
    FROM pos GROUP BY doc_id, island
    """,
    tags=("m5", "dedup"),
    doc="Span-level dedup (the ExactSubstr idea of Lee et al. 2022 at "
        "token-4-gram granularity, operators/substr.py:62): corpus-"
        "duplicated 4-grams grouped into maximal per-doc islands via "
        "the gaps-and-islands idiom — the surgical alternative to "
        "whole-doc dedup (mask_duplicated_spans consumes these spans). "
        " No doc-pair join anywhere; one shuffle on the gram key, "
        "then per-doc windows.  Proven since r8 "
        "(test_r10_promotion_parity.py).",
)
def q_duplicated_ngram_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.substr import duplicated_ngram_spans

    return duplicated_ngram_spans(load_table(spark, sf_dir, "documents"), n=4)
