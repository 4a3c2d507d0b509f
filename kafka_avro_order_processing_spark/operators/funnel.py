"""Conversion-funnel analysis — the windowFunnel operator of the
product-analytics engines (ClickHouse's windowFunnel; Snowplow/Amplitude
funnels), absent from Spark's built-ins: for each user, the deepest
prefix of an ordered step list (view -> click -> purchase) completed as
a chain of events inside a time horizon.

Semantics (declarative, so an independent SQL oracle can state them):
funnel_level(user) = the largest L such that events e_1 .. e_L of that
user exist with event_type(e_i) = steps[i], strictly increasing in the
total order (ts, event_id) — the id tiebreak, in the id column's NATIVE
ordering, makes equal-timestamp chains deterministic — and
ts_L - ts_1 <= horizon.  Every intermediate
event then automatically sits inside the horizon too (timestamps are
non-decreasing along the chain).

Implementation: one groupBy per user, the user's step events collected
and sorted, then ONE pure-SQL fold (F.aggregate) of the classical
greedy DP — state = per-level latest feasible chain-start time.  The
greedy is exact by an exchange argument: the horizon constraint only
ever compares an event to its chain's START, and a LATER start is
always at least as extendable, so keeping the maximum start per level
preserves reachability exactly as the EXISTS definition above.

Scale shape: the only shuffle is the per-user groupBy (the
sessionization bound — per-user state is the user's step-event list,
skew bounded by the busiest user); the fold is O(events x levels)
map-side JVM work, no Python, no join, no window function.  The
summary is one more tiny groupBy over per-user levels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F



def step_index_col(steps: list[str], type_col: str):
    """1-based step index of the event type, NULL for non-step events —
    shared by the batch fold and the streaming twin so both sides map
    types identically."""
    idx = F.lit(None).cast("int")
    n = len(steps)
    for i, s in enumerate(reversed(steps)):
        idx = F.when(F.col(type_col) == F.lit(s), F.lit(n - i)).otherwise(idx)
    return idx


def window_funnel(
    events: DataFrame,
    steps: list[str],
    horizon_s: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """Per-user funnel depth: (user_col, funnel_level) with one row for
    EVERY distinct user in the input frame — a user with no step-1
    event reports level 0 rather than vanishing (the drop-off at step 1
    is the first number a funnel report needs).  Rows with a NULL user,
    timestamp, or event id are rejected loudly — the check is FOLDED
    into the one corpus scan (an in-plan ``raise_error`` on the first
    offending row, surfacing at action time as a Spark
    USER_RAISED_EXCEPTION), so validation never costs a second pass."""
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    if horizon_s <= 0:
        raise ValueError(f"horizon_s must be > 0, got {horizon_s}")
    n_levels = len(steps)
    horizon_us = int(round(float(horizon_s) * 1_000_000))
    null_msg = (
        f"window_funnel: NULL {user_col} / {ts_col} / {id_col} row — "
        "filter explicitly first"
    )
    # single-pass loud rejection: the projection itself raises on the
    # first NULL key column, so no validation pre-scan doubles the read
    t_checked = F.when(
        F.col(user_col).isNull()
        | F.col(ts_col).isNull()
        | F.col(id_col).isNull(),
        F.raise_error(F.lit(null_msg)).cast("long"),
    ).otherwise(
        # accepts TIMESTAMP and TIMESTAMP_NTZ alike: the session is
        # pinned UTC (ensure_confs), so the cast is shift-free
        F.unix_micros(F.col(ts_col).cast("timestamp"))
    )
    rows = events.select(
        F.col(user_col),
        F.struct(
            t_checked.alias("t"),
            # NATIVE id type: the tiebreak needs a consistent total
            # order, not a number — casting a UUID-string id to long
            # would NULL it out and silently lose determinism
            F.col(id_col).alias("eid"),
            step_index_col(steps, type_col).alias("step"),
        ).alias("ev"),
    )
    # the greedy DP as one fold: acc[i] = latest chain-start micros of
    # any chain reaching level i+1 so far, NULL = unreachable (NULL,
    # not -1: pre-1970 timestamps are legal negative micros, and NULL
    # arithmetic/comparisons make the unreachable branch fall through
    # without any sentinel-vs-value overlap).  Non-step events carry a
    # NULL step and fall through every WHEN.
    fold = F.expr(
        f"""
        aggregate(
          array_sort(evs),
          transform(sequence(1, {n_levels}), i -> CAST(NULL AS BIGINT)),
          (acc, x) -> transform(sequence(1, {n_levels}), i ->
            CASE
              WHEN x.step = 1 AND i = 1
                THEN greatest(element_at(acc, 1), x.t)
              WHEN x.step = i AND i > 1
                   AND element_at(acc, i - 1) IS NOT NULL
                   AND x.t - element_at(acc, i - 1) <= {horizon_us}
                THEN greatest(element_at(acc, i), element_at(acc, i - 1))
              ELSE element_at(acc, i)
            END),
          acc -> size(filter(acc, v -> v IS NOT NULL))
        )
        """
    )
    return (
        rows.groupBy(user_col)
        .agg(F.collect_list("ev").alias("evs"))
        .select(F.col(user_col), fold.cast("int").alias("funnel_level"))
    )


def funnel_report(
    levels: DataFrame,
    n_steps: int,
    level_col: str = "funnel_level",
) -> DataFrame:
    """The funnel table: one row per step (1..n_steps) with the number
    of users who reached AT LEAST that level and the conversion rate
    from the previous step (NULL at step 1, and NULL when the previous
    step had nobody).  Integer counting over the per-user frame — one
    tiny aggregation."""
    if n_steps < 1:
        raise ValueError(f"n_steps must be >= 1, got {n_steps}")
    counts = levels.agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        *[
            F.sum((F.col(level_col) >= i).cast("long")).alias(f"__ge_{i}")
            for i in range(1, n_steps + 1)
        ],
    ).collect()[0]
    spark = levels.sparkSession
    rows = []
    for i in range(1, n_steps + 1):
        reached = int(counts[f"__ge_{i}"] or 0)
        prev = int(counts["n_users"]) if i == 1 else int(counts[f"__ge_{i-1}"] or 0)
        rows.append(
            (
                i,
                reached,
                (reached / prev) if (i > 1 and prev > 0) else None,
            )
        )
    return spark.createDataFrame(
        rows, "step int, n_reached long, conversion double"
    )


def retention_cohorts(
    events: DataFrame,
    period_s: float = 86400.0,
    horizon_periods: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention — the other classic product-analytics table
    (ClickHouse's retention; every analytics product's triangle chart):
    users are cohorted by the period of their FIRST event, and each
    (cohort, offset) cell counts how many of them were active again
    `offset` periods later.

    Returns (cohort bigint, offset int, n_active bigint, retention
    double) for offsets 0..horizon_periods, where cohort = the period
    index floor(first_ts / period_s), n_active = distinct cohort users
    active in cohort+offset, and retention = n_active / cohort size
    (the offset-0 cell, which is the cohort size by construction, so
    its retention is exactly 1.0).  Cells with zero active users are
    ABSENT, not zero rows — the oracle states the same.

    Plan: one distinct over (user, period) — the only corpus-sized
    shuffle — a per-user min for the cohort, a join back on the user,
    and one integer groupBy; the cohort-size frame is cohorts-sized and
    broadcast.  Pure integer arithmetic until the one retention
    division, so the table is bit-deterministic and DuckDB-oracle-able
    (suite-proven).  NULL users/timestamps are rejected loudly via an
    in-plan ``raise_error`` folded into the single corpus scan
    (surfaces at action time; no extra validation pass)."""
    if period_s <= 0:
        raise ValueError(f"period_s must be > 0, got {period_s}")
    if horizon_periods < 0:
        raise ValueError(f"horizon_periods must be >= 0, got {horizon_periods}")
    period_us = int(round(float(period_s) * 1_000_000))
    # single-pass loud rejection (the window_funnel pattern): the one
    # corpus scan raises on the first NULL user/timestamp instead of a
    # separate validation pre-scan doubling the read
    null_msg = (
        f"retention_cohorts: NULL {user_col} / {ts_col} row — "
        "filter explicitly first"
    )
    p_checked = F.when(
        F.col(user_col).isNull() | F.col(ts_col).isNull(),
        F.raise_error(F.lit(null_msg)).cast("long"),
    ).otherwise(
        F.floor(
            F.unix_micros(F.col(ts_col).cast("timestamp")) / F.lit(period_us)
        ).cast("long")
    )
    active = events.select(
        F.col(user_col).alias("u"),
        p_checked.alias("p"),
    ).distinct()
    cohorts = active.groupBy("u").agg(F.min("p").alias("cohort"))
    sizes = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).cast("long").alias("n_cohort")
    )
    cells = (
        active.join(cohorts, "u")
        .select("cohort", (F.col("p") - F.col("cohort")).cast("int").alias("offset"))
        .filter(F.col("offset") <= F.lit(int(horizon_periods)))
        .groupBy("cohort", "offset")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort").select(
        "cohort",
        "offset",
        "n_active",
        (F.col("n_active").cast("double") / F.col("n_cohort").cast("double")).alias(
            "retention"
        ),
    )
