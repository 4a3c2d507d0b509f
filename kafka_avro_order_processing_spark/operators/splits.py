"""Leakage-safe dataset splitting — deterministic, group-aware.

Random-split leakage is a classic training-data failure: near-duplicate
or same-source documents land on both sides of a train/eval boundary
and the eval is contaminated.  The fix is to split by the GROUP (dedup
cluster id, source domain, user id), never by row, with a hash —
``rand(seed)`` depends on partitioning and row order; the md5-bucket
idiom (the engine's ``dataset_split_counts`` convention,
``plans/registry.py``) is stable under any engine, partitioning, or
replay.

Everything is a map-side expression: no shuffle, no state, no driver
data.  At 100 TB a split assignment that costs anything more than a
projection is the wrong design.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1 << 32


def md5_unit_bucket(key: Column, salt: str) -> Column:
    """Deterministic bucket in [0, 2^32) from the salted md5 of a key —
    the retrieval-stable substitute for rand(seed)."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 8
        ),
        16,
        10,
    ).cast("bigint")


def assign_split(
    df: DataFrame,
    by: str,
    fractions: dict[str, float],
    salt: str = "split",
    split_col: str = "split",
) -> DataFrame:
    """Append ``split_col`` assigning every row to a named split by the
    hash of ``by`` — all rows sharing a ``by`` value (a dedup cluster,
    a source domain) always land in the SAME split, which is the whole
    point.  ``fractions`` must sum to 1 (±1e-9); dict order fixes the
    bucket layout, so pass an ordered mapping.
    """
    total = sum(fractions.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"fractions must sum to 1, got {total}")
    if any(v < 0 for v in fractions.values()):
        raise ValueError("fractions must be non-negative")
    b = md5_unit_bucket(F.col(by), salt)
    expr = None
    cum = 0.0
    items = list(fractions.items())
    for name, frac in items[:-1]:
        cum += frac
        edge = int(cum * _BUCKETS)
        expr = (
            F.when(b < edge, F.lit(name))
            if expr is None
            else expr.when(b < edge, F.lit(name))
        )
    last = F.lit(items[-1][0])
    out = last if expr is None else expr.otherwise(last)
    return df.withColumn(split_col, out)


def kfold_assign(
    df: DataFrame,
    by: str,
    k: int,
    salt: str = "fold",
    fold_col: str = "fold",
) -> DataFrame:
    """Append ``fold_col`` in [0, k): the group-consistent fold id for
    k-fold cross-validation.  Same md5 bucket, modulo k."""
    if k < 2:
        raise ValueError("k must be >= 2")
    return df.withColumn(
        fold_col, (md5_unit_bucket(F.col(by), salt) % k).cast("int")
    )
