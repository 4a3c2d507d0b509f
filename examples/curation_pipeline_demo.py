"""End-to-end corpus-curation demo — the training-data pipeline this
engine exists for, composed from the registered operators and run as
ONE job from raw documents to packed training shards:

  1. quality gate      quality_score + repetition filter (pure exprs)
  2. exact dedup       md5 fingerprint, keep smallest doc_id
  3. near-dup prune    MinHash-LSH pairs -> connected components ->
                       keep each cluster's min id
  4. shard + pack      hash shards, 256-token bins (sequence_packing
                       shape), written out partitioned by shard

Every stage is a declarative plan over the previous stage's DataFrame —
Catalyst pipelines the non-shuffling parts; the written shard layout is
what a trainer's data loader would read.

Run: python examples/curation_pipeline_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark import get_spark
from kafka_avro_order_processing_spark.operators.dedup import (
    exact_dedup,
    near_dup_pairs,
    set_similarity_join,
)
from kafka_avro_order_processing_spark.operators.graph import connected_components
from kafka_avro_order_processing_spark.operators.text import (
    quality_score,
    repetition_stats,
    tokens,
)
from kafka_avro_order_processing_spark.sources.tables import load_table


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None, out_dir: str | None = None) -> dict:
    """Run the curation pipeline; returns the per-stage counters (the
    funnel a curation run logs).  Creates/stops its own session only
    when none is passed in."""
    own_session = spark is None
    if own_session:
        spark = get_spark(
            app_name="curation-pipeline-demo", master="local[4]", shuffle_partitions=4
        )
    out = Path(out_dir or tempfile.mkdtemp(prefix="curation_demo_"))

    docs = load_table(spark, sf_dir, "documents").persist()
    n_raw = docs.count()

    # 1. quality gate: drop the low-quality tail and repetitive docs
    # (thresholds sit inside this corpus's observed score range —
    # quality 0.59..0.97, repetition 0..0.04 — so every stage of the
    # funnel visibly filters).
    q = quality_score(docs).filter(F.col("quality") >= 0.62).select("doc_id")
    rep = repetition_stats(docs).filter(F.col("repetition_ratio") <= 0.03).select("doc_id")
    kept = docs.join(q, "doc_id").join(rep, "doc_id")
    n_quality = kept.count()

    # 2. exact dedup: canonical doc per content hash.
    canon = exact_dedup(kept).select(F.col("canonical_doc_id").alias("doc_id"))
    kept = kept.join(canon, "doc_id")
    n_exact = kept.count()

    # 3. near-dup prune: LSH pairs -> clusters -> keep cluster minimum.
    pairs = near_dup_pairs(kept).filter(F.col("jaccard") >= 0.5)

    # 3b. recall audit: the exact prefix-filter join (AllPairs) at the
    # SAME Jaccard >= 1/2 threshold has no false negatives, so the LSH
    # path's measured recall is simply |lsh_pairs| / |exact_pairs|
    # (LSH verifies exact Jaccard, so its pairs are a subset).
    n_lsh_pairs = pairs.count()
    n_exact_pairs = set_similarity_join(kept).count()
    lsh_recall = (n_lsh_pairs / n_exact_pairs) if n_exact_pairs else 1.0

    clusters = connected_components(pairs, "doc_a", "doc_b")
    losers = clusters.filter(F.col("node") != F.col("component")).select(
        F.col("node").alias("doc_id")
    )
    kept = kept.join(losers, "doc_id", "left_anti")
    n_near = kept.count()

    # 4. shard + pack and WRITE: the trainer-facing layout.
    w_cols = kept.select(
        "doc_id",
        "text",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(tokens("text")).cast("long").alias("n_tokens"),
    )
    from pyspark.sql import Window

    win = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = w_cols.withColumn(
        "bin_id",
        F.floor((F.sum("n_tokens").over(win) - F.col("n_tokens")) / 256.0).cast("bigint"),
    )
    packed.write.mode("overwrite").partitionBy("shard").parquet(str(out / "shards"))
    shards = spark.read.parquet(str(out / "shards"))
    n_shards = shards.select("shard").distinct().count()
    n_bins = shards.select("shard", "bin_id").distinct().count()

    docs.unpersist()
    counters = {
        "raw": n_raw,
        "after_quality": n_quality,
        "after_exact_dedup": n_exact,
        "after_near_dedup": n_near,
        "lsh_pairs": n_lsh_pairs,
        "exact_pairs": n_exact_pairs,
        "lsh_recall": lsh_recall,
        "shards": n_shards,
        "bins": n_bins,
        "out": str(out),
    }
    print("curation funnel:", counters)
    if own_session:
        spark.stop()
    return counters


if __name__ == "__main__":
    main(*(sys.argv[1:2]))
