"""Upsert / SCD2 emulation without a transactional table format.

MERGE INTO needs Delta/Iceberg (jars not in this container); the
engine-level emulation is the standard anti-join + union rewrite:

- ``upsert``: updates replace matching keys, everything else carries
  over — one broadcast-able anti join + union, full-partition rewrite
  (the pattern a lakehouse MERGE compiles to under the hood).
- ``scd2_apply``: slowly-changing-dimension type 2 — close the current
  row of changed keys (valid_to = change ts) and append the new
  version as current.

Scale notes: at 100 TB the rewrite is bounded by partition pruning —
partition the target by a stable key range/date so only partitions
containing updated keys rewrite; the logic below is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def upsert(target: DataFrame, updates: DataFrame, key: str) -> DataFrame:
    """Rows of `updates` win on key collisions; all other target rows
    survive.  Equivalent of MERGE ... WHEN MATCHED UPDATE WHEN NOT
    MATCHED INSERT.

    Duplicate keys WITHIN `updates` collapse to one row before
    applying (a transactional MERGE would raise on multiple matches;
    this emulation instead documents a deterministic winner): the
    survivor is the row that sorts highest over the non-key columns —
    a pure function of row content, never of shuffle order, matching
    ``scd2_apply``'s tiebreak.
    """
    from pyspark.sql import Window

    attr_cols = [c for c in updates.columns if c != key]
    if attr_cols:
        w = Window.partitionBy(key).orderBy(*[F.desc(c) for c in attr_cols])
        updates = (
            updates.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1)
            .drop("__rn")
        )
    else:
        # key-only updates: duplicates are literally identical rows —
        # distinct is the collapse (an empty orderBy window would throw)
        updates = updates.distinct()
    survivors = target.join(updates.select(key), on=key, how="left_anti")
    return survivors.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    changes: DataFrame,
    key: str,
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Type-2 apply: for each changed key, the current row closes at the
    change's valid_from and the change appends as the new current row.

    `dim` schema: key, attributes..., valid_from, valid_to (null for
    current), is_current.  `changes` schema: key, attributes...,
    valid_from.

    Multiple changes for one key within a batch collapse to the LATEST
    (max valid_from) before applying — a per-key reduction, not a join
    fan-out; applying intermediate versions in-batch would require
    iterative application and is out of scope for a single apply.
    """
    from pyspark.sql import Window

    # Deterministic tiebreak for changes sharing valid_from: order by
    # the remaining columns too, so the survivor is a function of row
    # content, never of shuffle order.
    attr_cols = [c for c in changes.columns if c not in (key, ts_col)]
    w = Window.partitionBy(key).orderBy(
        F.desc(ts_col), *[F.desc(c) for c in attr_cols]
    )
    changes = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    change_ts = changes.select(
        F.col(key), F.col(ts_col).alias("__new_from")
    )
    closed = (
        dim.join(change_ts, on=key, how="left")
        .withColumn(
            end_col,
            F.when(
                F.col(current_col) & F.col("__new_from").isNotNull(),
                F.col("__new_from"),
            ).otherwise(F.col(end_col)),
        )
        .withColumn(
            current_col,
            F.when(F.col("__new_from").isNotNull(), F.lit(False)).otherwise(
                F.col(current_col)
            ),
        )
        .drop("__new_from")
    )
    new_rows = changes.withColumn(end_col, F.lit(None).cast(dict(dim.dtypes)[end_col])) \
        .withColumn(current_col, F.lit(True))
    return closed.unionByName(new_rows.select(*closed.columns))
