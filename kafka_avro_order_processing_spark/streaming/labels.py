"""Streaming Dawid–Skene — the label-aggregation ingest twin: crowd
labels land on an unbounded stream, and the (item, worker, label)
COUNT TABLE — the EM's sufficient statistic — is maintained as
update-mode streaming aggregation state (one integer counter per
distinct triple, the scale-preferred changelog shape).  The model
refresh then runs :func:`operators.labels.dawid_skene_from_counts`
over the drained table.

Bit-match contract (suite-pinned, single and multi micro-batch): the
streaming fit EQUALS the batch :func:`operators.labels.dawid_skene`
on the same rows EXACTLY — posteriors, MAP flags, and every model
float — because

- micro-batch boundaries provably cannot move an integer count
  (associative sums; the drained changelog folds to the identical
  count table), and
- the EM is a deterministic function of that count table alone (the
  batch operator re-sorts the counts into its pinned item-partitioned
  layout itself, so the drain's arbitrary row order is irrelevant).

This is the "incremental model refresh" deployment shape: in
production the counting query runs continuously against the label
topic with a durable checkpoint, and each refresh tick drains the
current state and re-fits — O(distinct triples) state, O(model) driver
traffic per refresh, no reprocessing of historical labels.

Reference parity note: the reference app (src/consumer/*.py) keeps
running per-key aggregates updated record-at-a-time from a stream;
this module is that pattern applied to the label-quality model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.labels import dawid_skene_from_counts
from .pipeline import drain_to_df


def streaming_label_counts(
    stream_labels: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
) -> DataFrame:
    """The unbounded counting plan: (__item, __worker, __label, __n)
    as update-mode streaming aggregation state.  NULLs are rejected
    in-plan, same contract as the batch operator (the raise fires at
    the micro-batch that contains the bad row)."""
    cond = (
        F.col(item_col).isNull()
        | F.col(worker_col).isNull()
        | F.col(label_col).isNull()
    )
    msg = (
        "streaming_dawid_skene: NULL "
        f"{item_col} / {worker_col} / {label_col} row — filter "
        "explicitly first"
    )
    item_type = stream_labels.schema[item_col].dataType.simpleString()
    checked = F.when(
        cond, F.raise_error(F.lit(msg)).cast(item_type)
    ).otherwise(F.col(item_col))
    return (
        stream_labels.select(
            checked.alias("__item"),
            F.col(worker_col).alias("__worker"),
            F.col(label_col).alias("__label"),
        )
        .groupBy("__item", "__worker", "__label")
        .agg(F.count(F.lit(1)).cast("long").alias("__n"))
    )


def streaming_dawid_skene(
    stream_labels: DataFrame,
    item_col: str = "item_id",
    worker_col: str = "worker_id",
    label_col: str = "label",
    n_iter: int = 10,
    alpha: float = 0.01,
) -> tuple[DataFrame, dict]:
    """Drain the streaming count state (bounded availableNow run) and
    fit the Dawid–Skene model on it.  Returns ``(posts, model)`` with
    the exact schema and values of the batch operator on the same
    rows.  In production the drain is a refresh tick against the
    continuously-running counting query."""
    counts = drain_to_df(
        streaming_label_counts(
            stream_labels, item_col, worker_col, label_col
        ),
        "update",
        key_cols=("__item", "__worker", "__label"),
    )
    return dawid_skene_from_counts(
        counts,
        item_type=stream_labels.schema[item_col].dataType.simpleString(),
        worker_type=stream_labels.schema[worker_col].dataType.simpleString(),
        label_type=stream_labels.schema[label_col].dataType.simpleString(),
        item_col=item_col,
        label_col=label_col,
        n_iter=n_iter,
        alpha=alpha,
    )


__all__ = ["streaming_label_counts", "streaming_dawid_skene"]
