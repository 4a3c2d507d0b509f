"""Streaming winnowing near-dup index — operators/substr.py's
winnowing path at ingest time, completing the incremental family
(exact dedup, MinHash linkage, span index, and now shared-passage
candidates): each landing document's winnowed fingerprints are
matched against a growing fingerprint index, so partial-overlap
near-dup candidates surface AS DOCUMENTS LAND without rescanning
earlier epochs.

Index layout under ``index_path`` (the incremental_dedup pattern):

  fps/    (hash_bucket, doc_id, hash, epoch) — APPEND-ONLY distinct
          (doc, hash) fingerprints, partitioned by the hash's bucket
          so each epoch reads only the partitions its own hashes
          fall into.  Replays append byte-identical rows; reads
          collapse on (doc_id, hash, epoch) and EXCLUDE the current
          epoch's own prior rows, so at-least-once delivery cannot
          pair a document against itself-from-the-failed-attempt.
  pairs/  (doc_a, doc_b, shared_hashes, epoch) — flagged candidates,
          append-only, deduplicated at read.

CONTRACT (ingest-time best, no retraction — the incremental_linkage
convention): a pair is flagged at the LATER document's epoch, with
``shared_hashes`` counted over the index state AT THAT EPOCH; earlier
flags are never updated.  Hot hashes (shared by more than
``max_bucket_size`` visible docs — corpus boilerplate) star the
epoch's members around the visible minimum id with NULL
shared_hashes, the batch operator's cap discipline.  A single-epoch
drain over a fresh index equals ``winnow_candidate_pairs`` on the
same documents exactly (suite-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.substr import winnow_fingerprints

N_HASH_BUCKETS = 16


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def start_incremental_winnow(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    k: int = 5,
    window: int = 4,
    min_shared: int = 2,
    max_bucket_size: int = 64,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_HASH_BUCKETS,
):
    """Start the availableNow ingest query; read flagged pairs
    afterwards with :func:`read_winnow_pairs`.  One checkpoint per
    index (fresh checkpoints restart batch ids — the replay-exclusion
    corollary shared by every incremental store here)."""
    fp_store = f"{index_path}/fps"
    pair_store = f"{index_path}/pairs"

    def body(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        if df.isEmpty():
            return
        fps = (
            winnow_fingerprints(df, k=k, window=window, id_col=id_col, text_col=text_col)
            .select(F.col(id_col), F.col("hash"))
            .distinct()
            .withColumn("hash_bucket", F.pmod(F.col("hash"), F.lit(n_buckets)))
            .localCheckpoint(eager=True)
        )
        visible = fps.select(id_col, "hash")
        prior = _read_or_none(spark, fp_store)
        if prior is not None:
            buckets = [r[0] for r in fps.select("hash_bucket").distinct().collect()]
            prior_v = (
                prior.filter(F.col("hash_bucket").isin(buckets))
                .filter(F.col("epoch") != epoch_id)
                .dropDuplicates([id_col, "hash", "epoch"])
                .select(id_col, "hash")
                .distinct()
                .join(F.broadcast(fps.select("hash").distinct()), "hash", "leftsemi")
            )
            visible = visible.unionByName(prior_v).distinct()
        stats = visible.groupBy("hash").agg(
            F.count("*").alias("__n"), F.min(id_col).alias("__min")
        )
        small = stats.filter(F.col("__n") <= max_bucket_size).select("hash")
        e = (
            fps.select(F.col(id_col).alias("__ea"), F.col("hash"))
            .join(F.broadcast(small), "hash", "leftsemi")
        )
        v = visible.select(F.col(id_col).alias("__vb"), F.col("hash")).join(
            F.broadcast(small), "hash", "leftsemi"
        )
        pairs = (
            e.join(v, "hash")
            .filter(F.col("__ea") != F.col("__vb"))
            .select(
                F.least("__ea", "__vb").alias("doc_a"),
                F.greatest("__ea", "__vb").alias("doc_b"),
                "hash",
            )
            .groupBy("doc_a", "doc_b")
            .agg(F.countDistinct("hash").cast("long").alias("shared_hashes"))
            .filter(F.col("shared_hashes") >= int(min_shared))
        )
        stars = (
            fps.select(F.col(id_col), "hash")
            .join(stats.filter(F.col("__n") > max_bucket_size), "hash")
            .filter(F.col(id_col) != F.col("__min"))
            .select(
                F.least(id_col, "__min").alias("doc_a"),
                F.greatest(id_col, "__min").alias("doc_b"),
                F.lit(None).cast("long").alias("shared_hashes"),
            )
            .distinct()
        )
        flagged = pairs.unionByName(stars).withColumn(
            "epoch", F.lit(epoch_id).cast("long")
        )
        flagged.write.mode("append").parquet(pair_store)
        fps.select(
            "hash_bucket",
            F.col(id_col),
            "hash",
            F.lit(epoch_id).cast("long").alias("epoch"),
        ).write.mode("append").partitionBy("hash_bucket").parquet(fp_store)

    return (
        doc_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_winnow_pairs(spark: SparkSession, index_path: str) -> DataFrame:
    """All flagged candidate pairs, replay-deduplicated.  Empty frame
    with the right schema when nothing was ever flagged."""
    df = _read_or_none(spark, f"{index_path}/pairs")
    if df is None:
        return spark.createDataFrame(
            [], "doc_a long, doc_b long, shared_hashes long, epoch long"
        )
    # dedup on ALL columns: a doc pair can legitimately carry BOTH a
    # star edge (NULL shared_hashes, from a hot hash) and a measured
    # small-hash pair in the same epoch — exactly like the batch
    # union; only byte-identical replay rows may collapse.
    return df.dropDuplicates(["doc_a", "doc_b", "shared_hashes", "epoch"])
