"""Streaming table profiling — operators/profile.py's twin: the same
per-column statistics accumulated as ONE global streaming aggregation
over a live stream, so ingestion monitoring (null storms, range
excursions, cardinality blowups) runs on the data as it lands instead
of in a nightly batch.

Every statistic is an associative aggregate — counts and min/max sum/
extremize identically under any micro-batching, and distinct is the
HLL++ sketch (mergeable state; `countDistinct` is NOT a streaming
aggregate, so the twin always uses the sketch — the honest scale
choice the batch operator also defaults to).  The suite pins the
drained profile row-for-row equal to the batch operator's
(exact=False) on the same rows, one epoch and many.

State size: one wide aggregation row — O(columns) counters plus one
HLL register set per column — regardless of stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.profile import _profile_aggs, _unpivot_profile
from .pipeline import drain_to_df


def streaming_profile(
    stream_df: DataFrame,
    columns: list[str] | None = None,
    approx_rsd: float = 0.05,
) -> DataFrame:
    """Profile a stream's columns (default: all).  Bounded drain via
    complete-mode (the aggregate is ONE row, so the per-epoch snapshot
    rewrite is O(1)); in production the same plan runs continuously
    and each epoch's snapshot IS the live profile.  Output schema
    matches :func:`operators.profile.profile_table`."""
    cols = list(columns) if columns is not None else list(stream_df.columns)
    dtypes = {
        f.name: f.dataType for f in stream_df.schema.fields if f.name in cols
    }
    one = stream_df.agg(
        *_profile_aggs(cols, dtypes, exact=False, approx_rsd=approx_rsd)
    )
    drained = drain_to_df(one, "complete")
    return _unpivot_profile(drained, cols, dtypes)
