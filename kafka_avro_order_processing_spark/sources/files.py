"""File-level sources & layout management for large corpora.

Two concerns a 100 TB training-data pipeline has that the row-oriented
sources don't cover:

- **Raw-asset ingestion** (images/audio/video/docs as files on object
  storage): ``read_binary_files`` wraps Spark's `binaryFile` source —
  each file becomes one row (path, length, mtime, content bytes), which
  is exactly the opaque-payload shape ``operators.multimodal`` consumes
  (metadata prune JVM-side, decode via Arrow-batched mapInPandas).
  The source parallelizes across files; oversized assets are guarded by
  ``spark.sql.sources.binaryFile.maxLength``.

- **Small-file compaction**: streaming sinks and per-epoch writers leave
  thousands of KB-sized parquet files; scans then pay one task + one
  open per file.  ``compact_parquet`` rewrites a directory to
  size-targeted files (coalesce when shrinking — no shuffle; repartition
  only when growing parallelism), the standard maintenance job between
  ingest and training scans.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_binary_files(
    spark: SparkSession,
    path: str,
    glob: str | None = None,
) -> DataFrame:
    """One row per file: path, modificationTime, length, content —
    plus derived `file_name` / `extension` columns (pure expressions).

    `pathGlobFilter` prunes at listing time (files never opened);
    recursiveFileLookup walks nested asset directories.
    """
    reader = spark.read.format("binaryFile").option("recursiveFileLookup", "true")
    if glob:
        reader = reader.option("pathGlobFilter", glob)
    df = reader.load(path)
    name = F.element_at(F.split(F.col("path"), "/"), -1)
    return df.select(
        "path",
        "modificationTime",
        "length",
        "content",
        name.alias("file_name"),
        F.when(
            name.contains("."), F.element_at(F.split(name, r"\."), -1)
        ).otherwise(F.lit("")).alias("extension"),
    )


def compact_parquet(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Rewrite `src` parquet to `dst` with ~`target_file_bytes` files.

    File count = ceil(total_bytes / target).  Shrinking uses coalesce
    (narrow — no shuffle, each output task concatenates input splits);
    growing uses a round-robin repartition (needs the shuffle to split
    data that currently lives in fewer partitions).  Returns a stats
    dict ({files_before, files_after, bytes, rows}) so maintenance
    jobs can log/assert the layout change.
    """
    df = spark.read.parquet(src)
    # file inventory via the metadata column — no data read
    inv = (
        spark.read.parquet(src)
        .select(F.col("_metadata.file_path").alias("fp"), F.col("_metadata.file_size").alias("sz"))
        .groupBy("fp")
        .agg(F.first("sz").alias("sz"))
        .agg(F.count("*").alias("n"), F.sum("sz").alias("bytes"))
        .collect()[0]
    )
    # a store of only empty files inventories as 0 files / null
    # bytes (the metadata scan sees no row groups) -> one empty file
    n_before, total = inv["n"], inv["bytes"] or 0
    n_after = max(1, math.ceil(total / target_file_bytes))
    out = df.coalesce(n_after) if n_after <= n_before else df.repartition(n_after)
    out.write.mode("overwrite").parquet(dst)
    rows = spark.read.parquet(dst).count()
    return {
        "files_before": int(n_before),
        "files_after": int(n_after),
        "bytes": int(total),
        "rows": int(rows),
    }
