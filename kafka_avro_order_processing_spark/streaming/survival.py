"""Streaming Kaplan–Meier — retention curves maintained against an
unbounded churn/censoring event stream: the per-(group, duration)
event/censor COUNT CELLS (the product-limit estimator's sufficient
statistic) accumulate as update-mode streaming aggregation state, and
each refresh tick drains them and assembles the curve exactly like
the batch operator.

Bit-match contract (suite-pinned): the drained cells are associative
integer sums, so the streaming curve EQUALS
:func:`operators.survival.kaplan_meier` on the same rows EXACTLY —
micro-batch boundaries cannot move an integer count, and the batch
assembly is a deterministic Fraction function of the cell table.
State is O(groups x distinct durations) integers — durations are time
buckets, so this is bounded regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pipeline import drain_to_df


def streaming_km_cells(
    stream_df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """The unbounded counting plan: ([group,] t, d, c) as update-mode
    streaming aggregation state, with the batch operator's in-plan
    validation contract."""
    op = "streaming_kaplan_meier"
    gcols = [group_col] if group_col else []
    dmsg = (
        f"{op}: NULL/negative {duration_col}, NULL {event_col} or "
        f"{event_col} not in {{0,1}}"
        + (f", or NULL {group_col}" if group_col else "")
        + " — filter explicitly first"
    )
    d = F.col(duration_col).cast("double")
    e = F.col(event_col).cast("long")
    bad = d.isNull() | F.isnan(d) | (d < 0) | e.isNull() | ~e.isin(0, 1)
    if group_col:
        bad = bad | F.col(group_col).isNull()
    checked_d = F.when(
        bad, F.raise_error(F.lit(dmsg)).cast("double")
    ).otherwise(d)
    return (
        stream_df.select(*gcols, checked_d.alias("t"), e.alias("e"))
        .groupBy(*gcols, "t")
        .agg(
            F.sum("e").cast("long").alias("d"),
            F.sum(F.lit(1) - F.col("e")).cast("long").alias("c"),
        )
    )


def streaming_kaplan_meier(
    stream_df: DataFrame,
    duration_col: str,
    event_col: str,
    group_col: str | None = None,
) -> DataFrame:
    """Drain the streaming cell state (bounded availableNow run) and
    assemble the product-limit curve on it — output schema and values
    exactly the batch operator's."""
    from ..operators.survival import MAX_CELLS, assemble_km_frame

    key_cols = ((group_col,) if group_col else ()) + ("t",)
    cells = drain_to_df(
        streaming_km_cells(stream_df, duration_col, event_col, group_col),
        "update",
        key_cols=key_cols,
    )
    rows = cells.collect()
    if not rows:
        raise ValueError("streaming_kaplan_meier: empty stream")
    if len(rows) > MAX_CELLS:
        raise ValueError(
            f"streaming_kaplan_meier: {len(rows)} cells — bucket durations "
            f"upstream (limit {MAX_CELLS})"
        )
    return assemble_km_frame(
        stream_df.sparkSession, rows, group_col,
        stream_df.schema[group_col].dataType.simpleString()
        if group_col else None,
    )


__all__ = ["streaming_km_cells", "streaming_kaplan_meier"]
