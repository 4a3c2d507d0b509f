"""Slowly-changing-dimension type 2 — validity-interval dimension
builds, incremental merges, and point-in-time lookups (Kimball & Ross,
"The Data Warehouse Toolkit", the standard SCD2 definition).

Why it matters at 100 TB: fact rows must join the dimension AS OF the
fact's event time, not as of today — re-processing a year of events
against today's customer tier silently corrupts every historical
aggregate.  The SCD2 shape (effective_from / effective_to / is_current
per version) makes that join a plain interval predicate and makes the
dimension append-only:

- ``scd2_build``: change log -> versions.  One shuffle on the natural
  key; everything else is lag/lead inside that partitioning.
  Consecutive no-op changes (all tracked attributes unchanged,
  NULL-safe) are collapsed so versions are minimal.
- ``scd2_merge``: nightly increment.  Only keys PRESENT in the update
  batch are rebuilt (their change points re-derived from the existing
  versions' effective_from rows, unioned with the new changes);
  untouched keys stream through with a broadcast anti-join against the
  tiny update key set — the 100 TB dimension is never re-windowed.
- ``scd2_lookup``: fact -> version-at-time.  Equi-join on the key
  plus the interval predicate; LEFT join, so facts predating the
  first known version survive with NULL attributes (auditable, not
  dropped).

Loud contract: a duplicate (key, ts) in the change log is ambiguous
(two versions claim the same instant) and raises IN-PLAN via the
repo's single-pass ``raise_error`` idiom — the count check rides the
same window partitioning as the build itself, no extra scan.

Determinism: pure window/join relational algebra over the inputs —
no floats, no randomness; output hash-matches an ANSI oracle exactly.

Relationship to the existing SCD2 machinery: ``operators/upsert.py``
``scd2_apply[_partitioned]`` and ``streaming/cdc.py`` apply ONE delta
of already-current rows against a bucketed dimension STORE (the
sink-side path — close the open version, append the new one, rewrite
only touched buckets).  This module is the source-side relational
algebra: build the FULL version history from an arbitrary, unordered,
multi-version-per-key change log (with no-op collapse), prove the
incremental merge equivalent to the rebuild, and enrich facts as-of
their timestamps.  The two compose: build/merge here, persist through
the bucketed apply.

The reference upserts a latest-only in-memory dict per product
(/root/reference/src/aggregator/price_aggregator.py:35-51, the
degenerate SCD1); SCD2 is what the same pipeline needs once history
must be queryable.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _changed(attr_cols: list[str]) -> Column:
    """True when any tracked attribute differs from its lag (NULL-safe),
    or when there is no previous version."""
    same = reduce(
        lambda a, b: a & b,
        [F.col(c).eqNullSafe(F.col(f"_lag_{c}")) for c in attr_cols],
    )
    return F.col("_lag_seen").isNull() | ~same


def scd2_build(
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Change log (key, ts, attrs...) -> SCD2 version table
    (key, attrs..., effective_from, effective_to, is_current).

    effective_to is the NEXT version's effective_from (half-open
    interval [from, to)); NULL marks the open, current version.
    Duplicate (key, ts) rows raise in-plan.
    """
    if not attr_cols:
        raise ValueError("scd2_build needs at least one tracked attribute")
    w = Window.partitionBy(key_col).orderBy(ts_col)
    dup = F.count("*").over(
        Window.partitionBy(key_col, ts_col)
    )
    lagged = changes.select(
        key_col,
        F.when(
            dup > 1,
            F.raise_error(
                F.concat(
                    F.lit(f"scd2_build: duplicate ({key_col}, {ts_col}) at "),
                    F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")),
                )
            ).cast(changes.schema[ts_col].dataType),
        )
        .otherwise(F.col(ts_col))
        .alias(ts_col),
        *attr_cols,
        *[F.lag(c).over(w).alias(f"_lag_{c}") for c in attr_cols],
        F.lag(F.lit(1)).over(w).alias("_lag_seen"),
    )
    kept = lagged.filter(_changed(attr_cols))
    w2 = Window.partitionBy(key_col).orderBy(ts_col)
    return kept.select(
        key_col,
        *attr_cols,
        F.col(ts_col).alias("effective_from"),
        F.lead(ts_col).over(w2).alias("effective_to"),
    ).withColumn("is_current", F.col("effective_to").isNull())


def scd2_merge(
    dim: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Incrementally fold a new change batch into an existing SCD2
    table.  Equivalent to rebuilding from (all historical change
    points + the new batch), but only keys appearing in the batch are
    re-windowed; every other dimension row passes through untouched
    via a broadcast anti-join on the batch's key set."""
    batch_keys = changes.select(key_col).distinct()
    untouched = dim.join(F.broadcast(batch_keys), on=key_col, how="left_anti")
    affected_hist = dim.join(
        F.broadcast(batch_keys), on=key_col, how="left_semi"
    ).select(
        key_col, F.col("effective_from").alias(ts_col), *attr_cols
    )
    merged_log = affected_hist.unionByName(
        changes.select(key_col, ts_col, *attr_cols)
    )
    rebuilt = scd2_build(merged_log, key_col, ts_col, attr_cols)
    return untouched.unionByName(rebuilt)


def scd2_lookup(
    facts: DataFrame,
    dim: DataFrame,
    key_col: str,
    fact_ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Point-in-time enrichment: each fact row gains the dimension
    attributes of the version whose [effective_from, effective_to)
    interval contains the fact's timestamp.  LEFT join — facts before
    the key's first version (or with unseen keys) keep NULL attrs.
    The join is equi on the key with the interval predicate in the ON
    clause; Spark plans a hash join on the key, the interval filter
    applied post-probe (versions per key are few)."""
    d = dim.select(
        F.col(key_col).alias("_dk"),
        "effective_from",
        "effective_to",
        *attr_cols,
    )
    cond = (
        (facts[key_col] == d["_dk"])
        & (facts[fact_ts_col] >= d["effective_from"])
        & (
            d["effective_to"].isNull()
            | (facts[fact_ts_col] < d["effective_to"])
        )
    )
    return facts.join(d, on=cond, how="left").drop(
        "_dk", "effective_from", "effective_to"
    )
