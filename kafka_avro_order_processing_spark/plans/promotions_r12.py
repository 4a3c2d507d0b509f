"""Round-12 promotion queue: TWO registry-ready blocks, STAGED.

Rotation math after the round-10 and round-11 retirement swaps (see
the RETIRED ledger and the ``_LEAD_ORDER`` boundary comment in
``registry.py``): round 11's window is EXACTLY the 50 r8-window names
at their age-2 deadline — zero slots — and round 12's window is the
48 remaining r9-window names (50 minus the retired
``ngram_jaccard_adjacent`` and ``customers_no_pending_orders``) plus
TWO free slots.  This module stages the strongest suite-proven
candidates for those slots as complete ``Query`` blocks; each oracle
is the exact SQL already proven through the driver's canonicalization
(``tests/test_retrieval_eval.py::test_rrf_fuse_duckdb_oracle`` and
``tests/test_funnel.py::test_duckdb_oracle_parity_on_events``), and
``tests/test_r12_promotion_block.py`` drives BOTH blocks end-to-end
at two SFs the way the grading driver would.

The round-12 mechanical swap:
1. in ``registry.py``, add ``from .promotions_r12 import promote``
   next to the r10 import and call it before ``_apply_order()``;
2. lead the r12 ``_LEAD_ORDER`` with the 48 remaining r9-window names
   (registration order), then place ``rrf_fuse`` and
   ``window_funnel`` as the 49th and 50th;
3. run ``tests/test_rotation_window.py`` + a full sf0.01
   ``scripts/drive_parity.py`` drive before committing.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import QUERIES, Query

#: Staged blocks, keyed by their future registry name.
R12_PROMOTIONS: dict[str, Query] = {}


def _stage(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn):
        R12_PROMOTIONS[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=doc
        )
        return fn

    return deco


def promote() -> None:
    """Round-12 swap: insert the staged block into the live registry.
    Call from ``registry.py`` just before ``_apply_order()``.  Refuses
    name collisions loudly."""
    clash = set(R12_PROMOTIONS) & set(QUERIES)
    if clash:
        raise ValueError(f"promotion names already registered: {sorted(clash)}")
    for name, q in R12_PROMOTIONS.items():
        QUERIES[name] = q


# ---------------------------------------------------------------------------
# rrf_fuse — reciprocal-rank fusion (Cormack, Clarke & Buettcher,
# SIGIR'09), the rank-only hybrid-retrieval combiner.  Runs both
# engines derive identically from documents: per-lang n_chars ranking
# (run 0) and per-lang doc_id ranking (run 1), fused at the published
# k=60, top-5 per query.  The oracle is the suite-proven SQL from
# tests/test_retrieval_eval.py::test_rrf_fuse_duckdb_oracle verbatim.
# ---------------------------------------------------------------------------


@_stage(
    "rrf_fuse",
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
    tags=("m5", "retrieval", "eval"),
    doc="Reciprocal-rank fusion (Cormack et al. SIGIR'09,"
        " operators/retrieval_eval.rrf_fuse): per (query, doc) the"
        " fused score is sum over runs of 1/(k + rank) at the"
        " published k=60 — the standard hybrid combiner (BM25 + ANN)"
        " that consumes only RANKS, so no score calibration.  Each"
        " term is ONE f64 division of exact integers and the per-doc"
        " sum folds left-to-right in run-index order (never a"
        " shuffle-order float sum) — bit-identical under any"
        " partitioning; (score desc, doc asc) is a total order, so"
        " fused_rank is deterministic.  Scale shape: runs are top-k"
        " lists — the whole frame is O(queries x k x n_runs), never"
        " corpus-sized; one union + one groupBy + one per-query"
        " window.",
)
def q_rrf_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.retrieval_eval import rrf_fuse

    docs = load_table(spark, sf_dir, "documents")
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
    return rrf_fuse([run_a, run_b], topk=5)


# ---------------------------------------------------------------------------
# window_funnel — ClickHouse's windowFunnel over the events table
# (operators/funnel.py): per-user deepest completed step-prefix chain
# (view -> click -> purchase) inside a 1-hour horizon.  The operator's
# greedy fold is exact by exchange argument; the oracle below is the
# DECLARATIVE nested-EXISTS definition verbatim — structurally nothing
# like the fold — proven through the driver canonicalization by
# tests/test_funnel.py::test_duckdb_oracle_parity_on_events.
# ---------------------------------------------------------------------------

_FUNNEL_CHAIN_2 = (
    "SELECT 1 FROM e a, e b WHERE a.user_id = u.user_id"
    " AND b.user_id = u.user_id AND a.step = 1 AND b.step = 2"
    " AND (a.ts, a.event_id) < (b.ts, b.event_id)"
    " AND epoch_us(b.ts) - epoch_us(a.ts) <= 3600000000"
)
_FUNNEL_CHAIN_3 = (
    "SELECT 1 FROM e a, e b, e c WHERE a.user_id = u.user_id"
    " AND b.user_id = u.user_id AND c.user_id = u.user_id"
    " AND a.step = 1 AND b.step = 2 AND c.step = 3"
    " AND (a.ts, a.event_id) < (b.ts, b.event_id)"
    " AND (b.ts, b.event_id) < (c.ts, c.event_id)"
    " AND epoch_us(c.ts) - epoch_us(a.ts) <= 3600000000"
)


@_stage(
    "window_funnel",
    f"""
    WITH e AS (
      SELECT user_id, ts, event_id,
             CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                  WHEN 'purchase' THEN 3 END AS step
      FROM events
      WHERE event_type IN ('view', 'click', 'purchase')
    ), u AS (SELECT DISTINCT user_id FROM events)
    SELECT u.user_id,
           CAST(CASE
             WHEN EXISTS ({_FUNNEL_CHAIN_3}) THEN 3
             WHEN EXISTS ({_FUNNEL_CHAIN_2}) THEN 2
             WHEN EXISTS (SELECT 1 FROM e a
                          WHERE a.user_id = u.user_id AND a.step = 1)
               THEN 1
             ELSE 0 END AS INTEGER) AS funnel_level
    FROM u
    """,
    tags=("m5", "analytics", "funnel"),
    doc="windowFunnel (the ClickHouse operator Spark lacks,"
        " operators/funnel.py:49): per-user deepest step-prefix"
        " (view -> click -> purchase) completed as a chain strictly"
        " increasing in (ts, event_id) with last-minus-first <= 1h;"
        " every distinct user reported, level 0 included.  One"
        " per-user groupBy (the sessionization shuffle bound) + ONE"
        " pure-SQL aggregate() fold of the greedy"
        " latest-chain-start DP — exact by exchange argument, NULL"
        " the unreachable sentinel (pre-1970 safe), integer-"
        " microsecond arithmetic throughout, NULL rejection folded"
        " into the same scan.  The oracle is the declarative"
        " nested-EXISTS semantics, structurally unlike the fold.",
)
def q_window_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.funnel import window_funnel

    events = load_table(spark, sf_dir, "events")
    return window_funnel(events, ["view", "click", "purchase"], 3600.0)
