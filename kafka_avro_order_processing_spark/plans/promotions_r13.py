"""Round-13+ promotion queue: registry-ready blocks for the strongest
round-11-continuation families, STAGED (suite-only).

Saturation state: after the r12 swap the registry sits at exactly 150
names = 3x50 driver capacity, so these blocks CANNOT be promoted
without an audited retirement through the ``RETIRED`` ledger — stage
them anyway so a future honest subsumption can promote mechanically
(the r12 recipe: import + ``promote()`` before ``_apply_order()``,
place the new names inside the next window's first 50, re-run
``tests/test_rotation_window.py`` + a full sf0.01 drive).

Each oracle below is the exact SQL already proven through the
driver's canonicalization in the family's own test file
(tests/test_heavy.py, tests/test_kmv.py, tests/test_sampling.py,
tests/test_scd.py); ``tests/test_r13_promotion_block.py`` drives
every staged block end-to-end the way the grading driver would.

Candidate ranking for whenever slots open (strongest first):
1. ``heavy_hitters_event_type`` — an exact GROUP BY/HAVING oracle
   despite the approximate first pass: the rare case where the
   driver's hash gate checks an approximation-algorithm output
   EXACTLY.
2. ``kmv_distinct_users`` — the sketch itself (hash arrays included)
   hash-matches; contrast the rows-only HLL entry.
3. ``priority_sample_events`` — selection, tau, and estimator all
   bit-matched through one IEEE division per row.
4. ``scd2_user_tiers`` — warehouse-core SCD2 build on the real events
   change log.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table
from .registry import QUERIES, Query

R13_PROMOTIONS: dict[str, Query] = {}


def _stage(name: str, oracle: str | None, tags: tuple[str, ...] = (), doc: str = ""):
    def deco(fn):
        R13_PROMOTIONS[name] = Query(
            name=name, fn=fn, oracle=oracle, tags=tags, doc=doc
        )
        return fn

    return deco


def promote() -> None:
    """Insert the staged blocks into the live registry (requires open
    slots per the saturation policy).  Refuses collisions loudly."""
    clash = set(R13_PROMOTIONS) & set(QUERIES)
    if clash:
        raise ValueError(f"promotion names already registered: {sorted(clash)}")
    for name, q in R13_PROMOTIONS.items():
        QUERIES[name] = q


# ---------------------------------------------------------------------------
# 1. heavy_hitters_event_type — operators/heavy.py two-pass MG
# ---------------------------------------------------------------------------

_HH_ORACLE = """
WITH c AS (
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS freq FROM events
  WHERE event_type IS NOT NULL GROUP BY event_type
), t AS (SELECT CAST(SUM(freq) AS BIGINT) AS n_total FROM c)
SELECT c.event_type, c.freq, t.n_total,
       CAST(c.freq AS DOUBLE) / CAST(t.n_total AS DOUBLE) AS frac
FROM c, t WHERE c.freq * 4 > t.n_total
"""


@_stage(
    "heavy_hitters_event_type",
    _HH_ORACLE,
    tags=("m5", "sketch", "heavy-hitters"),
    doc=(
        "Two-pass Misra-Gries heavy hitters (operators/heavy.py): "
        "map-only MG candidates + broadcast exact recount EQUALS the "
        "exact freq*(k+1) > N set without shuffling the key space — "
        "an approximate algorithm the hash gate checks exactly."
    ),
)
def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.heavy import heavy_hitters

    ev = load_table(spark, sf_dir, "events")
    return heavy_hitters(ev, "event_type", k=3)


# ---------------------------------------------------------------------------
# 2. kmv_distinct_users — operators/kmv.py sketch + estimate
# ---------------------------------------------------------------------------


def _h52_sql(expr: str) -> str:
    h = f"md5('kmv:' || CAST({expr} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    return f"({terms})"


_KMV_ORACLE = f"""
WITH hh AS (
  SELECT DISTINCT {_h52_sql('user_id')} AS h FROM events
  WHERE user_id IS NOT NULL
), rr AS (SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rn FROM hh),
sk AS (
  SELECT list(h ORDER BY h) AS hashes, CAST(COUNT(*) AS INT) AS n_kept
  FROM rr WHERE rn <= 64
)
SELECT hashes, n_kept,
       CASE WHEN n_kept < 64 THEN CAST(n_kept AS DOUBLE)
            ELSE 63.0 * 4503599627370496 / CAST(hashes[64] AS DOUBLE) END
         AS est_distinct
FROM sk
"""


@_stage(
    "kmv_distinct_users",
    _KMV_ORACLE,
    tags=("m5", "sketch", "distinct"),
    doc=(
        "KMV distinct sketch + estimator (operators/kmv.py): the k "
        "smallest distinct 52-bit hashes — the sketch CONTENT "
        "hash-matches the oracle, unlike the rows-only HLL bytes."
    ),
)
def q_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.kmv import kmv_estimate, kmv_sketch

    ev = load_table(spark, sf_dir, "events")
    return kmv_estimate(kmv_sketch(ev, "user_id", k=64), k=64)


# ---------------------------------------------------------------------------
# 3. priority_sample_events — operators/sampling.py
# ---------------------------------------------------------------------------


def _q_sql() -> str:
    h = "md5('psamp:' || CAST(event_id AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    return (
        "CAST(value AS DOUBLE) / "
        f"(CAST(({terms}) + 1 AS DOUBLE) / 4503599627370496.0)"
    )


_PS_ORACLE = f"""
WITH q AS (
  SELECT event_id, value, {_q_sql()} AS priority
  FROM events WHERE value > 0
), r AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, event_id) AS rn
  FROM q
), tt AS (
  SELECT COALESCE(MAX(CASE WHEN rn = 26 THEN priority END), 0.0) AS tau
  FROM r WHERE rn <= 26
)
SELECT r.event_id, r.value, r.priority, tt.tau,
       GREATEST(CAST(r.value AS DOUBLE), tt.tau) AS est_weight
FROM r, tt WHERE r.rn <= 25
"""


@_stage(
    "priority_sample_events",
    _PS_ORACLE,
    tags=("m5", "sampling"),
    doc=(
        "Duffield-Lund-Thorup priority sample (operators/sampling.py): "
        "25 value-weighted events rows; selection, tau, and the "
        "unbiased est_weight all bit-match (one IEEE division per row, "
        "no transcendentals)."
    ),
)
def q_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.sampling import priority_sample

    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 0)
    return priority_sample(
        ev.select("event_id", "value"), "event_id", "value", k=25
    )


# ---------------------------------------------------------------------------
# 4. scd2_user_tiers — operators/scd.py build
# ---------------------------------------------------------------------------

_SCD_ORACLE = """
WITH ch AS (
  SELECT user_id, ts, MAX(event_type) AS tier
  FROM events GROUP BY user_id, ts
), l AS (
  SELECT user_id, ts, tier,
         LAG(tier) OVER (PARTITION BY user_id ORDER BY ts) AS lt,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts) AS rn
  FROM ch
), kept AS (
  SELECT user_id, ts, tier FROM l WHERE rn = 1 OR (tier IS DISTINCT FROM lt)
)
SELECT user_id, tier, ts AS effective_from,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) AS effective_to,
       LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL AS is_current
FROM kept
"""


@_stage(
    "scd2_user_tiers",
    _SCD_ORACLE,
    tags=("m5", "warehouse", "scd2"),
    doc=(
        "SCD2 validity intervals from the events change log "
        "(operators/scd.py): NULL-safe no-op collapse, half-open "
        "[from, to), in-plan duplicate rejection."
    ),
)
def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.scd import scd2_build

    ev = load_table(spark, sf_dir, "events")
    changes = ev.groupBy("user_id", "ts").agg(
        F.max("event_type").alias("tier")
    )
    return scd2_build(changes, "user_id", "ts", ["tier"])
