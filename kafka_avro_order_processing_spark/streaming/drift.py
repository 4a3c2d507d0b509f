"""Streaming drift monitoring — the production form of
operators/drift.py: the reference histogram is computed ONCE from the
stable yardstick table, and the CURRENT side's bucket counts
accumulate as a streaming aggregation over the live stream, so the
pipeline can alert on PSI as data arrives instead of waiting for a
batch job.

Micro-batch independence comes for free from associativity: the only
streaming state is integer bucket counts (<= n_bins + 1 keys), which
sum identically no matter how the stream is chopped into epochs — the
suite pins bit-equality of the drained PSI detail against the batch
operator on the same rows, in one epoch and many.  The drain uses
update-mode (O(changed buckets) per epoch, and a bucket table has at
most n_bins + 1 keys — trivially bounded state at any corpus size).

Reference lineage: the reference maintains running per-key aggregates
in consumer state (src/aggregator/price_aggregator.py:35-51); this is
that pattern with the aggregate being a drift histogram instead of a
price average.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.drift import (
    _bucket_fracs,
    _fracs_from_counts,
    _numeric_bucket,
    _psi_detail,
    _ref_bounds,
)
from .pipeline import drain_to_df


def streaming_numeric_drift(
    ref: DataFrame,
    stream_df: DataFrame,
    column: str,
    n_bins: int = 16,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Numeric PSI detail with the CURRENT side accumulated from a
    stream (bounded drain; in production the same plan runs
    continuously and the PSI join happens per epoch).  Bin bounds
    resolve from the BATCH reference exactly as the batch operator —
    the shared `_numeric_bucket` expression guarantees the two paths
    bucket identically.  Output schema matches
    :func:`operators.drift.numeric_drift`."""
    lo, hi = _ref_bounds(ref, column, lo, hi)
    bucket = _numeric_bucket(column, lo, hi, n_bins)
    scounts = (
        stream_df.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cur_n"))
    )
    drained = drain_to_df(scounts, "update", key_cols=("bucket",))
    return _psi_detail(
        _bucket_fracs(ref, bucket, "ref"),
        _fracs_from_counts(drained, "cur"),
    )


def streaming_categorical_drift(
    ref: DataFrame,
    stream_df: DataFrame,
    column: str,
    max_categories: int = 64,
) -> DataFrame:
    """Categorical PSI with the CURRENT side accumulated from a
    stream.  The reference's frozen keep-set (checkpointed batch
    table) broadcasts into the stream as a static-side join — the
    standard stream-static pattern, so arriving rows bucket to a kept
    value, '__OTHER__', or '__NULL__' map-side and only <= cap + 2
    integer counters ever live in state.  Output schema matches
    :func:`operators.drift.categorical_drift`."""
    from ..operators.drift import _category_bucket, _category_keep

    keep = _category_keep(ref, column, max_categories)
    scounts = (
        _category_bucket(stream_df, column, keep)
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("cur_n"))
    )
    drained = drain_to_df(scounts, "update", key_cols=("bucket",))
    return _psi_detail(
        _bucket_fracs(_category_bucket(ref, column, keep), F.col("bucket"), "ref"),
        _fracs_from_counts(drained, "cur"),
    )
