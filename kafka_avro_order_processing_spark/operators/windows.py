"""Ordered/event-time windows.

- ``running_average``: the batch window-function twin of the
  reference's per-record running aggregate emission
  (/root/reference/src/aggregator/price_aggregator.py:35-51 returns the
  new running average after every update; SURVEY.md §2.5 defines this
  AVG OVER (... ROWS UNBOUNDED PRECEDING) form as the canonical
  verifiable semantics; streaming update-mode is its incremental view).
- ``tumbling_window_stats`` / ``sliding_window_stats`` /
  ``sessionize``: event-time windowing the reference lacks (T3/T4) but
  any stream analytics engine needs; built on Spark's native
  window()/session_window() + watermarks in the streaming twin.

Scale notes: window functions shuffle once on partitionBy key; running
aggregates then stream through each partition sorted — no state beyond
the frame.  Tumbling windows are hash aggregations on (window, key).
Skewed keys (one product = half the data) are handled by AQE skew
splitting for joins; for running windows the partitionBy key itself is
the parallelism unit — at 100 TB, prefer (key, day-bucket) composite
partitioning when a single key's history exceeds one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.scalar import dec_sum


def running_average(
    df: DataFrame,
    key: str = "product",
    value: str = "price",
    order_by: tuple[str, ...] = ("timestamp",),
) -> DataFrame:
    """Per-record running count/sum/avg within each key, ordered by
    ``order_by`` (include a unique tiebreaker column for determinism).

    Exact decimal running sum -> double, so the emitted running average
    matches an ANSI oracle bit-for-bit regardless of partitioning.

    SCALE CONTRACT (pinned by test_plan_invariants.py::
    test_running_avg_partitions_by_the_documented_bounded_key): the
    ordered window shuffles once on ``key`` and then sorts EACH KEY'S
    WHOLE HISTORY IN ONE TASK — parallelism is bounded by the key
    cardinality, and a low-cardinality key (the registered query
    partitions on event_type, ~5 values) makes every task a full-key
    straggler by construction.  Use this form only when per-key volume
    is task-sized (it is the semantically-required batch parity twin of
    the reference's per-record emission, reference
    price_aggregator.py:35-51).  For unbounded keys / 100 TB ingest,
    use the scale-correct twin
    ``streaming.stateful.streaming_running_avg_per_record``
    (applyInPandasWithState: O(keys) state, no per-key sort, same
    bit-exact per-record semantics, registered as
    ``streaming_running_avg_per_record``).
    """
    w = (
        Window.partitionBy(key)
        .orderBy(*[F.col(c) for c in order_by])
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run_cnt = F.count("*").over(w)
    run_sum = F.sum(F.col(value).cast("decimal(18,2)")).over(w).cast("double")
    return df.select(
        *df.columns,
        run_cnt.alias("running_count"),
        run_sum.alias("running_sum"),
        (run_sum / run_cnt).alias("running_avg"),
    )


def tumbling_window_stats(
    df: DataFrame,
    ts: str = "ts",
    key: str = "event_type",
    value: str = "value",
    width: str = "1 hour",
) -> DataFrame:
    """Tumbling event-time window aggregate (T3).  Windows align to the
    epoch, so `window('1 hour').start == date_trunc('hour', ts)` — the
    oracle-SQL form."""
    return (
        df.groupBy(F.window(F.col(ts), width).alias("w"), F.col(key))
        .agg(
            F.count("*").alias("n_events"),
            dec_sum(value).alias("sum_value"),
            F.min(value).alias("min_value"),
            F.max(value).alias("max_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            key,
            "n_events",
            "sum_value",
            "min_value",
            "max_value",
        )
    )


def sliding_window_stats(
    df: DataFrame,
    ts: str = "ts",
    key: str = "event_type",
    value: str = "value",
    width: str = "1 hour",
    slide: str = "30 minutes",
) -> DataFrame:
    """Sliding event-time window aggregate (T3): each event lands in
    width/slide overlapping windows."""
    return (
        df.groupBy(F.window(F.col(ts), width, slide).alias("w"), F.col(key))
        .agg(F.count("*").alias("n_events"), dec_sum(value).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), key, "n_events", "sum_value")
    )


def sessionize(
    df: DataFrame,
    ts: str = "ts",
    key: str = "user_id",
    gap_minutes: int = 30,
    order_tiebreak: str = "event_id",
) -> DataFrame:
    """Batch sessionization: gap > ``gap_minutes`` starts a new session.

    lag() + cumulative sum of session-start flags — one shuffle on key,
    then two ordered window passes; the streaming twin is
    session_window(ts, gap).  Emits one row per session with bounds and
    event count.
    """
    w = Window.partitionBy(key).orderBy(F.col(ts), F.col(order_tiebreak))
    prev_ts = F.lag(F.col(ts)).over(w)
    gap_sec = gap_minutes * 60
    # gap >= threshold starts a new session — matches Spark's native
    # session_window (exclusive end = last_ts + gap), so the batch and
    # streaming twins sessionize identically.
    new_sess = F.when(
        prev_ts.isNull()
        | ((F.unix_micros(F.col(ts).cast("timestamp")) - F.unix_micros(prev_ts.cast("timestamp"))) >= gap_sec * 1_000_000),
        F.lit(1),
    ).otherwise(F.lit(0))
    sess_id = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_sess = df.withColumn("session_id", sess_id)
    return (
        with_sess.groupBy(key, "session_id")
        .agg(
            F.min(ts).alias("session_start"),
            F.max(ts).alias("session_end"),
            F.count("*").alias("n_events"),
        )
    )
