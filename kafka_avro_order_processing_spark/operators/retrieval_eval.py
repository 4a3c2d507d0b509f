"""Ranked-retrieval evaluation against relevance judgments — the
trec_eval-shaped metrics (P@k, R@k, MRR, AP, DCG/NDCG@k) a retrieval
stack (BM25 in ranking.py, the ANN family in similarity.py) needs to
grade its runs, computed EXACTLY and bit-deterministically as one
distributed plan.

Reference scope: not in the reference pipeline (an order-event
consumer); part of the engine's training-data/retrieval layer (task
brief), complementing the ROC/PR engine in eval.py with the
rank-cutoff metrics IR evaluation actually uses.

Inputs:
- ``runs``: (query_id, doc_id, rank) — 1-based rank, unique per
  query (the shape `bm25_topk`/`cosine_topk` emit).  Only ranks
  <= k participate.
- ``qrels``: (query_id, doc_id, rel) — graded relevance; rel > 0
  means relevant.  Queries with no positive qrels report NULL for
  recall/ap/ndcg (trec_eval skips them from means — NULL is the
  honest per-query value, never a fake 0).

Determinism contract (why this is oracle-able where pr_auc is not):
- every ratio is a single IEEE division of exact integers (P@k, R@k,
  RR, AP's per-hit j/i terms) — identical bits on any engine;
- every float SUM runs as a strict LEFT-TO-RIGHT fold over a
  rank-sorted array (``F.aggregate`` over ``sort_array`` here;
  ``list_reduce`` over ``list(... ORDER BY ...)`` in the DuckDB
  oracle) — never a parallel/window aggregate whose combine order
  could reassociate the additions (DuckDB's windowed SUM uses a
  segment tree; a plain window cumsum would NOT be bit-stable);
- the log2 discount table is precomputed in PYTHON and baked into
  BOTH engines as the same double literals, so no cross-engine
  ``log``/``pow`` call sits on the result path (NDCG gains use
  ``pow(2, rel)`` — exact for integer-valued grades, the documented
  contract; fractional grades ride on cross-engine pow rounding).

Scale shape: one broadcast-or-shuffle join runs×qrels on
(query, doc), then per-QUERY grouped aggregates (collect_list bounded
by k and by the query's judgment count — both evaluation-sized, never
corpus-sized) and one per-query window for the hit index.  No
SinglePartition stage; queries spread freely.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window, functions as F


def discount_table(k: int) -> list[float]:
    """1/log2(rank+1) for rank = 1..k — the shared literal table."""
    return [1.0 / math.log2(i + 1) for i in range(1, k + 1)]


def _ordered_sum(arr: Column) -> Column:
    """Strict left-to-right float fold (init 0.0) — the bit-stable sum."""
    return F.aggregate(arr, F.lit(0.0), lambda acc, x: acc + x)


def ranked_retrieval_eval(
    runs: DataFrame,
    qrels: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
) -> DataFrame:
    """Per-query metric frame: (query_col, n_rel, n_ret, n_rel_ret,
    precision_at_k, recall_at_k, rr, ap, dcg, idcg, ndcg).

    - ``precision_at_k`` divides by the LITERAL k (trec_eval P@k: an
      under-filled run is penalized, not excused);
    - ``rr`` is 1/rank of the first relevant hit within top-k, 0.0
      when none (standard MRR numerator);
    - ``ap`` = (sum over hits of j/i) / n_rel where the j-th hit sits
      at rank i — the uninterpolated AP with the cutoff at k and the
      full judgment count in the denominator (trec_eval MAP);
    - ``dcg``/``idcg``/``ndcg`` use gain 2^rel - 1 and the literal
      discount table; idcg folds the query's top-k gains sorted
      descending, so ndcg is in [0, 1] whenever grades are
      non-negative.  Queries whose judgments are all non-positive
      report NULL recall/ap/ndcg.

    The frame covers exactly the JUDGED queries (those in ``qrels``):
    a query that appears only in ``runs`` has no judgments to grade
    against and is excluded, the trec_eval convention.  A judged query
    missing from ``runs`` stays, with zero retrieval credit.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    q, d, r = F.col(query_col), F.col(doc_col), F.col(rank_col)
    discounts = F.array(*[F.lit(x) for x in discount_table(k)])

    rels = qrels.select(
        q.alias("__q"), d.alias("__d"), F.col(rel_col).cast("double").alias("__rel")
    )
    # per-query judgment rollup: positive count + descending gain list
    # (bounded by the query's judgment count — evaluation-sized)
    gains = rels.groupBy("__q").agg(
        F.sum((F.col("__rel") > 0).cast("long")).alias("n_rel"),
        F.slice(
            F.reverse(
                F.sort_array(
                    F.collect_list(
                        F.when(
                            F.col("__rel") > 0,
                            F.pow(F.lit(2.0), F.col("__rel")) - F.lit(1.0),
                        ).otherwise(F.lit(0.0))
                    )
                )
            ),
            1,
            k,
        ).alias("__g_desc"),
    )
    idcg = _ordered_sum(
        F.zip_with(
            F.col("__g_desc"),
            discounts,
            lambda g, disc: F.coalesce(g, F.lit(0.0)) * disc,
        )
    )

    topk = runs.filter(r <= k).select(
        q.alias("__q"), d.alias("__d"), r.cast("int").alias("__r")
    )
    joined = topk.join(rels, ["__q", "__d"], "left").select(
        "__q",
        "__r",
        F.coalesce((F.col("__rel") > 0), F.lit(False)).alias("__hit"),
        (
            F.coalesce(
                F.when(
                    F.col("__rel") > 0,
                    F.pow(F.lit(2.0), F.col("__rel")) - F.lit(1.0),
                ),
                F.lit(0.0),
            )
            * F.element_at(discounts, F.col("__r"))
        ).alias("__dterm"),
    )
    # j-th hit at rank i contributes P@i = j/i — the hit index is a
    # per-query window (rank order), exact integer division per term
    hit_w = Window.partitionBy("__q").orderBy("__r")
    joined = joined.withColumn(
        "__j",
        F.when(
            F.col("__hit"),
            F.sum(F.col("__hit").cast("long")).over(
                hit_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        ),
    )
    per_q = joined.groupBy("__q").agg(
        F.count(F.lit(1)).cast("long").alias("n_ret"),
        F.sum(F.col("__hit").cast("long")).alias("n_rel_ret"),
        F.min(F.when(F.col("__hit"), F.col("__r"))).alias("__first"),
        _ordered_sum(
            F.transform(
                F.sort_array(F.collect_list(F.struct("__r", "__dterm"))),
                lambda s: s.getField("__dterm"),
            )
        ).alias("dcg"),
        _ordered_sum(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "__r",
                            F.when(
                                F.col("__j").isNotNull(),
                                F.col("__j").cast("double")
                                / F.col("__r").cast("double"),
                            )
                            .otherwise(F.lit(0.0))
                            .alias("__pterm"),
                        )
                    )
                ),
                lambda s: s.getField("__pterm"),
            )
        ).alias("__ap_num"),
    )
    out = gains.join(per_q, "__q", "left").select(
        F.col("__q").alias(query_col),
        F.col("n_rel").cast("long").alias("n_rel"),
        F.coalesce("n_ret", F.lit(0)).cast("long").alias("n_ret"),
        F.coalesce("n_rel_ret", F.lit(0)).cast("long").alias("n_rel_ret"),
        (
            F.coalesce("n_rel_ret", F.lit(0)).cast("double") / F.lit(float(k))
        ).alias("precision_at_k"),
        F.when(
            F.col("n_rel") > 0,
            F.coalesce("n_rel_ret", F.lit(0)).cast("double")
            / F.col("n_rel").cast("double"),
        ).alias("recall_at_k"),
        F.coalesce(
            F.lit(1.0) / F.col("__first").cast("double"), F.lit(0.0)
        ).alias("rr"),
        F.when(
            F.col("n_rel") > 0,
            F.coalesce("__ap_num", F.lit(0.0)) / F.col("n_rel").cast("double"),
        ).alias("ap"),
        F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
        idcg.alias("idcg"),
        F.when(idcg > 0, F.coalesce("dcg", F.lit(0.0)) / idcg).alias("ndcg"),
    )
    return out


def mean_retrieval_metrics(per_query: DataFrame) -> dict:
    """Scalar means over the per-query frame (MRR, MAP, mean NDCG,
    mean P@k / R@k) through the 2^52-scaled decimal idiom, so the
    summary is bit-identical under any partitioning.  NULL per-query
    values (unjudged queries) are EXCLUDED from their metric's mean —
    the trec_eval convention — and each mean reports its own count."""
    from .similarity import MEAN_SCALE

    cols = ["precision_at_k", "recall_at_k", "rr", "ap", "ndcg"]
    aggs = []
    for c in cols:
        aggs.append(
            F.sum(
                (F.col(c) * F.lit(float(MEAN_SCALE))).cast("decimal(38,0)")
            ).alias(f"__s_{c}")
        )
        aggs.append(F.count(F.col(c)).alias(f"__n_{c}"))
    row = per_query.agg(*aggs).collect()[0]
    out: dict = {}
    for c in cols:
        n = int(row[f"__n_{c}"] or 0)
        s = row[f"__s_{c}"]
        out[f"mean_{c}"] = (float(int(s)) / float(MEAN_SCALE) / n) if n else None
        out[f"n_{c}"] = n
    return out


def grouped_mean_retrieval_metrics(
    per_query: DataFrame, group_col: str
) -> DataFrame:
    """Per-segment metric means in ONE plan — the monitoring sweep
    shape of ``grouped_roc_auc``: join a segment column onto the
    per-query frame (language, domain, query type) and get each
    segment's MRR / MAP / mean NDCG / mean P@k / mean R@k, every mean
    through the same 2^52-scaled decimal sum as the scalar
    :func:`mean_retrieval_metrics` (bit-equal to calling it per group,
    suite-pinned).  NULL per-query values are excluded per metric and
    each mean carries its count, so a segment of unjudgeable queries
    reports NULL-with-n=0, never a fake number."""
    from .similarity import MEAN_SCALE

    cols = ["precision_at_k", "recall_at_k", "rr", "ap", "ndcg"]
    aggs = [F.count(F.lit(1)).cast("long").alias("n_queries")]
    for c in cols:
        aggs.append(
            F.sum(
                (F.col(c) * F.lit(float(MEAN_SCALE))).cast("decimal(38,0)")
            ).alias(f"__s_{c}")
        )
        aggs.append(F.count(F.col(c)).cast("long").alias(f"n_{c}"))
    agg = per_query.groupBy(group_col).agg(*aggs)
    out_cols = [F.col(group_col), F.col("n_queries")]
    for c in cols:
        out_cols.append(
            F.when(
                F.col(f"n_{c}") > 0,
                F.col(f"__s_{c}").cast("double")
                / F.lit(float(MEAN_SCALE))
                / F.col(f"n_{c}").cast("double"),
            ).alias(f"mean_{c}")
        )
        out_cols.append(F.col(f"n_{c}"))
    return agg.select(*out_cols)


def rrf_fuse(
    runs: list[DataFrame],
    k: int = 60,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
    topk: int | None = None,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack, Clarke & Buettcher, SIGIR'09)
    of N retrieval runs: per (query, doc) the fused score is
    ``sum over runs of 1 / (k + rank)`` with the published k=60
    default — the standard hybrid-retrieval combiner (BM25 + ANN)
    that needs no score calibration because it only consumes RANKS.

    Returns (query_col, doc_col, rrf_score, n_runs_hit, fused_rank)
    with ``fused_rank`` dense per query by (score desc, doc asc) —
    a total order, so ties are deterministic.  Bit-determinism: each
    term is ONE f64 division of exact integers and the per-doc sum is
    a strict left-to-right fold over the terms sorted by run index
    (the retrieval-eval float-sum recipe — never a shuffle-order
    float sum), so the frame is identical under any partitioning.
    ``topk`` keeps the head of each fused ranking.

    Contract: ranks are unique per (run, query) — a run is a ranking.
    Docs missing from a run simply contribute no term (the published
    behavior).  Scale shape: one union + one groupBy on (query, doc)
    + one per-query window over fused candidates; runs are top-k
    lists, so the frame is O(queries * k * n_runs), never corpus-
    sized."""
    if not runs:
        raise ValueError("rrf_fuse needs at least one run")
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    tagged = []
    for i, r in enumerate(runs):
        tagged.append(
            r.select(
                F.col(query_col),
                F.col(doc_col),
                F.lit(i).alias("__run"),
                (
                    F.lit(1.0)
                    / (F.lit(int(k)) + F.col(rank_col)).cast("double")
                ).alias("__term"),
            )
        )
    u = tagged[0]
    for t in tagged[1:]:
        u = u.unionByName(t)
    agg = u.groupBy(query_col, doc_col).agg(
        F.expr(
            "aggregate(array_sort(collect_list(struct(__run, __term))),"
            " cast(0.0 as double), (a, x) -> a + x.__term)"
        ).alias("rrf_score"),
        F.count(F.lit(1)).cast("long").alias("n_runs_hit"),
    )
    w = Window.partitionBy(query_col).orderBy(
        F.desc("rrf_score"), F.asc(doc_col)
    )
    out = agg.withColumn("fused_rank", F.row_number().over(w))
    if topk is not None:
        out = out.filter(F.col("fused_rank") <= int(topk))
    return out
