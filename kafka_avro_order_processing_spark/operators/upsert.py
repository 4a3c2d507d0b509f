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
containing updated keys rewrite.  ``write_partitioned`` /
``merge_partitioned`` below DO that: the target lives as a
key-bucket-partitioned parquet table, the merge scans only the
buckets the delta touches (partition pruning at the scan), and the
write-back uses dynamic partition overwrite so untouched partitions'
files are never rewritten — the IO profile a lakehouse MERGE has,
without the table-format jars.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

BUCKET_COL = "bucket"


def key_bucket(key: str, n_buckets: int):
    """Stable partition bucket for a numeric key: pmod keeps negative
    keys (e.g. synthetic inserts) inside [0, n_buckets)."""
    return F.pmod(F.col(key), F.lit(n_buckets)).cast("int")


def write_partitioned(
    df: DataFrame, key: str, path: str, n_buckets: int = 16
) -> None:
    """Seed the merge target: parquet partitioned by key bucket.

    At real scale n_buckets is sized so one bucket ~ one comfortable
    rewrite unit (e.g. thousands of buckets over 100 TB); the demo
    uses 16 to keep listings readable.
    """
    (
        df.withColumn(BUCKET_COL, key_bucket(key, n_buckets))
        .repartition(F.col(BUCKET_COL))
        .write.partitionBy(BUCKET_COL)
        .mode("overwrite")
        .parquet(path)
    )


def merge_partitioned(
    spark: SparkSession,
    updates: DataFrame,
    key: str,
    path: str,
    n_buckets: int = 16,
) -> DataFrame:
    """Partition-pruned MERGE into the table at `path`: only the
    buckets containing updated keys are scanned and rewritten.

    - touched buckets come from the (tiny) delta: one distinct
      aggregation, <= n_buckets values collected;
    - the target scan filters on the PARTITION column, so pruning
      happens at file-listing time — untouched buckets are never read;
    - the write-back uses dynamic partition overwrite: only partitions
      present in the written data are replaced, untouched partitions'
      files stay byte-identical on disk (asserted in
      tests/test_upsert.py via before/after file listings).

    Returns the full post-merge table (all buckets).
    """
    updates = updates.withColumn(BUCKET_COL, key_bucket(key, n_buckets))
    touched = [
        r[BUCKET_COL] for r in updates.select(BUCKET_COL).distinct().collect()
    ]
    target = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(touched))
    # Reconcile the delta's column types to the on-disk schema before
    # merging: dynamic overwrite rewrites ONLY touched buckets, so a
    # type drift in the updates (e.g. double-producing arithmetic over
    # a decimal target column) would otherwise land a mixed-schema
    # parquet table whose later reads fail or silently coerce.
    updates = updates.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in target.schema.fields]
    )
    merged = upsert(target, updates, key)
    # The merge output overwrites partitions of the very table it reads
    # (Spark refuses an overwrite of a path in its own lineage) — cut
    # lineage by materializing the merged touched-bucket rows first.
    # Only touched buckets flow through here, so this is O(delta
    # partitions), not O(table).
    merged = merged.localCheckpoint(eager=True)
    (
        merged.repartition(F.col(BUCKET_COL))
        .write.partitionBy(BUCKET_COL)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    return spark.read.parquet(path)


def scd2_apply_partitioned(
    spark: SparkSession,
    changes: DataFrame,
    key: str,
    path: str,
    n_buckets: int = 16,
    ts_col: str = "valid_from",
    end_col: str = "valid_to",
    current_col: str = "is_current",
) -> DataFrame:
    """Partition-pruned SCD2 apply into the versioned dimension at
    `path` (seeded with ``write_partitioned``): only buckets containing
    changed keys are scanned and rewritten — closing a key's current
    row and appending its new version both happen inside the key's own
    bucket, so the rewrite set is exactly the delta's buckets.

    Returns the full post-apply dimension (all buckets).
    """
    changes = changes.withColumn(BUCKET_COL, key_bucket(key, n_buckets))
    touched = [
        r[BUCKET_COL] for r in changes.select(BUCKET_COL).distinct().collect()
    ]
    target = spark.read.parquet(path).filter(F.col(BUCKET_COL).isin(touched))
    applied = scd2_apply(
        target.drop(BUCKET_COL),
        changes.drop(BUCKET_COL),
        key,
        ts_col=ts_col,
        end_col=end_col,
        current_col=current_col,
    ).withColumn(BUCKET_COL, key_bucket(key, n_buckets))
    # Same two safeguards as merge_partitioned: reconcile types to the
    # on-disk schema (dynamic overwrite must not land a mixed-schema
    # table) and cut lineage before overwriting a path we just read.
    applied = applied.select(
        *[F.col(f.name).cast(f.dataType).alias(f.name) for f in target.schema.fields]
    ).localCheckpoint(eager=True)
    (
        applied.repartition(F.col(BUCKET_COL))
        .write.partitionBy(BUCKET_COL)
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .parquet(path)
    )
    return spark.read.parquet(path)


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
