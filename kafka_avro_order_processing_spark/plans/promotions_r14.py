"""Round-14+ promotion queue: registry-ready blocks for the second
round-11-continuation session's experimentation/agreement families,
STAGED (suite-only — the saturation policy stands: the registry sits
at 3x50 driver capacity after the r12 swap, so these promote only
behind an audited retirement through the ``RETIRED`` ledger).

Same mechanics as plans/promotions_r13.py: each block is a complete
``Query`` whose oracle SQL is already proven through the driver
canonicalization in the family's own test file
(tests/test_labels.py::test_pairwise_kappa_duckdb_oracle,
tests/test_abtest.py::test_always_valid_integer_columns_duckdb_oracle);
``tests/test_r14_promotion_block.py`` drives both end-to-end the way
the grading driver would.

Candidate ranking for whenever slots open:
1. ``annotator_pair_kappa`` — Cohen's kappa for every annotator pair
   as ONE relational plan (self-join + grouped marginals), the kappa
   float being a single division of exact integers — a full
   hash-match on an agreement STATISTIC table.
2. ``ab_peeking_trajectory`` — the always-valid monitoring table's
   libm-free columns (cumulative per-arm counts, diff, se): windows
   over exact decimal moments, sqrt/divisions correctly rounded on
   both engines; the exp-bearing lambda/p columns stay suite-pinned
   against a Python replica (the lm.py libm convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import QUERIES, Query

R14_PROMOTIONS: dict[str, Query] = {}


def _stage(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn):
        R14_PROMOTIONS[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=doc
        )
        return fn

    return deco


def promote() -> None:
    """Insert the staged blocks into the live registry (requires open
    slots per the saturation policy).  Refuses collisions loudly."""
    clash = set(R14_PROMOTIONS) & set(QUERIES)
    if clash:
        raise ValueError(f"promotion names already registered: {sorted(clash)}")
    for name, q in R14_PROMOTIONS.items():
        QUERIES[name] = q


# ---------------------------------------------------------------------------
# 1. annotator_pair_kappa — operators/labels.py pairwise Cohen's kappa
# ---------------------------------------------------------------------------

_KAPPA_ORACLE = """
WITH one AS (
  SELECT doc_id % 101 AS item_id, source AS worker_id,
         MIN(lang) AS label
  FROM documents GROUP BY 1, 2
), p AS (
  SELECT a.worker_id AS wa, b.worker_id AS wb,
         a.label AS la, b.label AS lb
  FROM one a JOIN one b USING (item_id)
  WHERE a.worker_id < b.worker_id
), base AS (
  SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS n_items,
         CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
           AS n_agree
  FROM p GROUP BY wa, wb
), ma AS (
  SELECT wa, wb, la AS l, CAST(COUNT(*) AS BIGINT) AS ca
  FROM p GROUP BY wa, wb, la
), mb AS (
  SELECT wa, wb, lb AS l, CAST(COUNT(*) AS BIGINT) AS cb
  FROM p GROUP BY wa, wb, lb
), pe AS (
  SELECT ma.wa, ma.wb, CAST(SUM(ca * cb) AS BIGINT) AS pe_num
  FROM ma JOIN mb ON ma.wa = mb.wa AND ma.wb = mb.wb AND ma.l = mb.l
  GROUP BY ma.wa, ma.wb
)
SELECT base.wa AS worker_a, base.wb AS worker_b, n_items, n_agree,
       CAST(COALESCE(pe_num, 0) AS BIGINT) AS pe_num,
       CASE WHEN n_items * n_items - COALESCE(pe_num, 0) <> 0 THEN
         CAST(n_items * n_agree - COALESCE(pe_num, 0) AS DOUBLE)
         / CAST(n_items * n_items - COALESCE(pe_num, 0) AS DOUBLE)
       END AS kappa
FROM base LEFT JOIN pe ON base.wa = pe.wa AND base.wb = pe.wb
"""


@_stage(
    "annotator_pair_kappa",
    _KAPPA_ORACLE,
    tags=("m6", "labels", "agreement"),
    doc=(
        "Cohen's kappa for every annotator pair in one relational plan "
        "(operators/labels.py): item self-join + grouped marginals; "
        "the kappa float is ONE division of exact integers, so the "
        "whole reliability matrix hash-matches."
    ),
)
def q_annotator_pair_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.labels import pairwise_cohen_kappa

    docs = load_table(spark, sf_dir, "documents")
    labels = (
        docs.select(
            (F.col("doc_id") % 101).alias("item_id"),
            F.col("source").alias("worker_id"),
            F.col("lang").alias("label"),
        )
        .groupBy("item_id", "worker_id")
        .agg(F.min("label").alias("label"))
    )
    return pairwise_cohen_kappa(labels)


# ---------------------------------------------------------------------------
# 2. ab_peeking_trajectory — operators/abtest.py always-valid monitor
# ---------------------------------------------------------------------------

_MS = float(1 << 20)

_TRAJ_ORACLE = f"""
WITH r AS (
  SELECT CASE WHEN event_id % 2 = 0 THEN 'control' ELSE 'treat' END
           AS arm,
         CAST(event_id % 10 AS BIGINT) AS bucket,
         CAST(FLOOR((value % 7) * {_MS} + 0.5) AS BIGINT) AS q
  FROM events WHERE value IS NOT NULL
), per AS (
  SELECT arm, bucket, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(q) AS BIGINT) AS sy,
         CAST(SUM(q * q) AS BIGINT) AS syy
  FROM r GROUP BY arm, bucket
), pv AS (
  SELECT bucket,
    SUM(CASE WHEN arm = 'control' THEN n ELSE 0 END) AS dna,
    SUM(CASE WHEN arm = 'control' THEN sy ELSE 0 END) AS dsya,
    SUM(CASE WHEN arm = 'control' THEN syy ELSE 0 END) AS dsyya,
    SUM(CASE WHEN arm = 'treat' THEN n ELSE 0 END) AS dnb,
    SUM(CASE WHEN arm = 'treat' THEN sy ELSE 0 END) AS dsyb,
    SUM(CASE WHEN arm = 'treat' THEN syy ELSE 0 END) AS dsyyb
  FROM per GROUP BY bucket
), c AS (
  SELECT bucket,
    CAST(SUM(dna) OVER w AS BIGINT) AS n_a,
    CAST(SUM(dsya) OVER w AS BIGINT) AS sy_a,
    CAST(SUM(dsyya) OVER w AS BIGINT) AS syy_a,
    CAST(SUM(dnb) OVER w AS BIGINT) AS n_b,
    CAST(SUM(dsyb) OVER w AS BIGINT) AS sy_b,
    CAST(SUM(dsyyb) OVER w AS BIGINT) AS syy_b
  FROM pv WINDOW w AS (ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT bucket, n_a, n_b,
  CASE WHEN n_a >= 2 AND n_b >= 2 THEN
    CAST(sy_b AS DOUBLE) / (CAST(n_b AS DOUBLE) * {_MS})
    - CAST(sy_a AS DOUBLE) / (CAST(n_a AS DOUBLE) * {_MS})
  END AS diff,
  CASE WHEN n_a >= 2 AND n_b >= 2 THEN
    SQRT(
      CAST(CAST(n_a AS HUGEINT) * syy_a - CAST(sy_a AS HUGEINT) * sy_a AS DOUBLE)
        / (CAST(n_a AS DOUBLE) * CAST(n_a - 1 AS DOUBLE) * ({_MS} * {_MS}))
        / CAST(n_a AS DOUBLE)
      + CAST(CAST(n_b AS HUGEINT) * syy_b - CAST(sy_b AS HUGEINT) * sy_b AS DOUBLE)
        / (CAST(n_b AS DOUBLE) * CAST(n_b - 1 AS DOUBLE) * ({_MS} * {_MS}))
        / CAST(n_b AS DOUBLE)
    )
  END AS se
FROM c
"""


@_stage(
    "ab_peeking_trajectory",
    _TRAJ_ORACLE,
    tags=("m6", "abtest", "sequential"),
    doc=(
        "Always-valid monitoring table (operators/abtest.py), libm-free "
        "columns: cumulative per-arm counts + diff + se from exact "
        "decimal moment windows — sqrt and division are correctly "
        "rounded on both engines; the exp-bearing lambda/p stay "
        "replica-pinned in the suite."
    ),
)
def q_ab_peeking_trajectory(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.abtest import always_valid_pvalues

    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    frame = ev.select(
        F.when(F.col("event_id") % 2 == 0, "control")
        .otherwise("treat").alias("arm"),
        (F.col("event_id") % 10).cast("long").alias("bucket"),
        (F.col("value") % 7).cast("double").alias("y"),
    )
    return always_valid_pvalues(frame, "y", "arm", "bucket", tau=1.0).select(
        "bucket", "n_a", "n_b", "diff", "se"
    )
