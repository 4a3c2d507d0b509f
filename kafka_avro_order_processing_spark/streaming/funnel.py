"""Streaming conversion funnels — operators/funnel.py's stateful twin:
per-user funnel depth maintained AT INGEST with O(levels) state, the
custom-stateful-operator shape (applyInPandasWithState, the
running_stats_per_record pattern).

The batch operator folds each user's full event list; a stream cannot
hold the list, but the greedy DP never needed it — its entire memory
is the per-level latest chain-start timestamp, so the carried state is
one long[ n_levels ] per user regardless of how many events arrive.
Events are processed in (ts, event_id) order WITHIN each micro-batch
(sorted here) and batch-over-batch in arrival order — the stream-order
assumption every exact per-record twin in this engine documents
(streaming/stateful.py): with a time-ordered source the drained levels
BIT-match the batch operator on the same rows (suite-pinned, one epoch
and many), because both sides run the identical integer-microsecond
arithmetic.

Each micro-batch emits one (user, funnel_level) row per user seen in
that batch — an O(changed-keys) update changelog; the drain keeps the
latest row per user.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.funnel import step_index_col
from .pipeline import drain_to_df


def _make_update(n_levels: int, horizon_us: int, ttl_ms: int | None):
    def update(
        key: tuple,
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # idle past the TTL (>= horizon): every stored chain-start
            # is unextendable, so dropping the state loses nothing a
            # future event could use.  Emit nothing — the drained
            # changelog keeps the user's last emitted level until the
            # user reappears (the documented reset contract).
            state.remove()
            return
        if key[0] is None:
            raise ValueError(
                "streaming_window_funnel: NULL user_id — filter upstream "
                "(the batch twin rejects these loudly too)"
            )
        # NULL = unreachable (the batch fold's sentinel: -1 would
        # collide with legal pre-1970 negative micros)
        starts: list[int | None] = (
            [None if pd.isna(v) else int(v) for v in state.get[0]]
            if state.exists
            else [None] * n_levels
        )
        for pdf in pdfs:
            pdf = pdf.sort_values(["t", "eid"])
            for t, step in zip(pdf["t"], pdf["step"]):
                if pd.isna(t):
                    raise ValueError(
                        "streaming_window_funnel: NULL ts — filter upstream"
                    )
                if pd.isna(step):
                    continue
                k = int(step)
                t = int(t)
                if k == 1:
                    starts[0] = t if starts[0] is None else max(starts[0], t)
                elif (
                    starts[k - 2] is not None
                    and t - starts[k - 2] <= horizon_us
                ):
                    prev = starts[k - 2]
                    starts[k - 1] = (
                        prev if starts[k - 1] is None
                        else max(starts[k - 1], prev)
                    )
        level = sum(1 for v in starts if v is not None)
        state.update((starts,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        yield pd.DataFrame({"__user": [key[0]], "funnel_level": [level]})

    return update


def streaming_window_funnel_plan(
    stream_events: DataFrame,
    steps: list[str],
    horizon_s: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    state_ttl_s: float | None = None,
) -> DataFrame:
    """The un-drained update-mode stream of per-user funnel levels —
    (user_col, funnel_level), one changelog row per user touched in
    each micro-batch.  ``streaming_window_funnel`` drains this plan;
    production writes it continuously with its own checkpoint, which
    is also how the suite exercises the TTL across real restarts.

    ``state_ttl_s`` bounds the state store over an unbounded stream:
    without it the key space is every user ever seen (each entry a
    tight O(levels) longs, but unbounded keys).  A processing-time TTL
    of at least ``horizon_s`` is semantics-preserving for chain starts
    — a user idle longer than the horizon cannot extend any stored
    chain, only start fresh at level 1 — so eviction loses no future
    reachability.  Reset contract: the LEVEL COUNTER restarts for an
    evicted user; the drained changelog keeps their last emitted row
    (the historical level) until they reappear, after which the
    reported level is what their post-idle events achieve.  Pair the
    drain with a MAX-fold over the changelog if historical-max
    semantics are needed across evictions."""
    if len(steps) < 1:
        raise ValueError("steps must name at least one event type")
    if len(set(steps)) != len(steps):
        raise ValueError(f"steps must be distinct, got {steps}")
    if horizon_s <= 0:
        raise ValueError(f"horizon_s must be > 0, got {horizon_s}")
    if state_ttl_s is not None and state_ttl_s < horizon_s:
        raise ValueError(
            f"state_ttl_s must be >= horizon_s ({horizon_s}) — a shorter "
            f"TTL evicts chains that are still extendable, got {state_ttl_s}"
        )
    from pyspark.sql.types import IntegerType, StructField, StructType

    horizon_us = int(round(float(horizon_s) * 1_000_000))
    # NATIVE user and id types (the batch-twin contract): casting a
    # string user to long would merge every user into one NULL group
    rows = stream_events.select(
        F.col(user_col).alias("__user"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("t"),
        F.col(id_col).alias("eid"),
        step_index_col(steps, type_col).alias("step"),
    )
    out_schema = StructType(
        [
            StructField("__user", stream_events.schema[user_col].dataType),
            StructField("funnel_level", IntegerType()),
        ]
    )
    ttl_ms = None if state_ttl_s is None else max(1, int(round(state_ttl_s * 1000)))
    out = rows.groupBy("__user").applyInPandasWithState(
        _make_update(len(steps), horizon_us, ttl_ms),
        outputStructType=out_schema,
        stateStructType="starts array<long>",
        outputMode="update",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
    return out.withColumnRenamed("__user", user_col)


def streaming_window_funnel(
    stream_events: DataFrame,
    steps: list[str],
    horizon_s: float,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    state_ttl_s: float | None = None,
) -> DataFrame:
    """Drain the per-user funnel levels of a bounded event stream
    (availableNow; in production the same plan runs continuously).
    Output schema matches :func:`operators.funnel.window_funnel` —
    (user_col, funnel_level), one row per user, level 0 included.
    See :func:`streaming_window_funnel_plan` for the state/TTL
    contract."""
    out = streaming_window_funnel_plan(
        stream_events,
        steps,
        horizon_s,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        id_col=id_col,
        state_ttl_s=state_ttl_s,
    )
    return drain_to_df(out, "update", key_cols=(user_col,))
