"""Incremental near-duplicate dedup: a document stream maintained
against a growing MinHash-LSH index.

The production shape for corpus ingestion at 100 TB: you do NOT
re-LSH the whole corpus when a new shard arrives — you keep an index
of (signature, band) rows and join only the NEW docs against it.
Per epoch the work is O(epoch x matching-buckets), never O(corpus):

    epoch docs -> minhash signatures -> band rows
      -> candidate pairs = (new x indexed on shared band)
                         UNION (new x new, id-ordered)
      -> signature-agreement estimate >= threshold  ==> the pair's
         HIGHER id is marked dropped
      -> append epoch signatures/bands/ids to the index

Determinism across epoch splits: the dedup rule is a pure function of
the pair set — a doc is dropped iff SOME candidate pair links it to a
lower id with est_jaccard >= threshold.  Every qualifying pair is
discovered exactly when its LATER-ARRIVING member's epoch runs (the
other member is then in the index, or in the same epoch), so the
union of per-epoch pair sets equals the batch self-join's pair set no
matter how the stream is sliced — and the dropped set is MONOTONE
(a doc once dropped never un-drops; a kept doc may be dropped by a
later epoch only if a lower-id doc arrives late, which the batch rule
gives the same answer for).  Survivors are read at the end as
ids - dropped; no retractions are ever needed.

Estimate-only verification (signature agreement, no exact-Jaccard
re-shingle) is deliberate: it is the standard corpus-dedup operating
point (the index stores fixed-width signatures, never text) and keeps
the index O(k) bytes per doc.  Consumers wanting exact Jaccard on the
survivor set run the batch `near_dup_pairs` over it.

Skew note: the per-epoch band join inherits the hot-bucket problem;
at scale, partition the band store BY band_val (bucket pruning at the
join) and let AQE skew-split the few hot values — the batch cap/star
treatment does not apply because the index must stay complete (a
capped index would silently stop dropping against popular buckets).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    BAND_ROWS,
    N_MINHASH,
    _signatures_from_rows,
    band_rows_of,
    shingle_rows,
)


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    # Cheap existence probe first: asking Spark to resolve a
    # not-yet-seeded store logs a scary (but caught) JVM
    # FileNotFoundException trace on every first epoch.  Local paths
    # short-circuit; URI stores (s3://, hdfs://) fall through to the
    # resolve-and-catch.
    if "://" not in path and not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None  # first epoch: store not seeded yet


def start_incremental_dedup(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    k: int = N_MINHASH,
    band_rows: int = BAND_ROWS,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingler=shingle_rows,
):
    """Start the availableNow ingest query.  The index at `index_path`
    holds three append-only parquet stores: ``ids`` (every streamed
    doc id — docs too short to shingle still count), ``sigs``
    (signatures), ``dropped`` (ids that lost to a lower-id near-dup).
    Read survivors afterwards with :func:`read_survivors`.
    """
    ids_store = f"{index_path}/ids"
    sig_store = f"{index_path}/sigs"
    drop_store = f"{index_path}/dropped"

    def body(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        if df.isEmpty():
            return
        # Epoch signatures: computed once (eager checkpoint — they feed
        # the band explode, both est sides, and the store append).
        sigs_new = _signatures_from_rows(
            shingler(df, id_col, text_col, distinct=False, spread=False),
            id_col,
            k,
        ).localCheckpoint(eager=True)
        bands_new = band_rows_of(sigs_new, id_col, k, band_rows)

        sigs_old = _read_or_none(spark, sig_store)
        # new x new candidates, id-ordered
        a, b = bands_new.alias("a"), bands_new.alias("b")
        pairs = (
            a.join(
                b,
                (F.col("a.band_id") == F.col("b.band_id"))
                & (F.col("a.band_val") == F.col("b.band_val"))
                & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
            )
            .select(
                F.col(f"a.{id_col}").alias("doc_a"),
                F.col(f"b.{id_col}").alias("doc_b"),
            )
        )
        sigs_all = sigs_new
        if sigs_old is not None:
            # new x indexed on shared band; id-orient the pair (the new
            # doc may have the LOWER id — then the indexed doc drops)
            bands_old = band_rows_of(sigs_old, id_col, k, band_rows)
            n, o = bands_new.alias("n"), bands_old.alias("o")
            cross = (
                n.join(
                    o,
                    (F.col("n.band_id") == F.col("o.band_id"))
                    & (F.col("n.band_val") == F.col("o.band_val")),
                )
                .select(
                    F.least(F.col(f"n.{id_col}"), F.col(f"o.{id_col}")).alias("doc_a"),
                    F.greatest(F.col(f"n.{id_col}"), F.col(f"o.{id_col}")).alias("doc_b"),
                )
            )
            pairs = pairs.unionByName(cross)
            sigs_all = sigs_new.unionByName(sigs_old)
        pairs = pairs.distinct()

        agree = sum(
            F.when(F.col(f"sa.mh{j}") == F.col(f"sb.mh{j}"), 1).otherwise(0)
            for j in range(k)
        )
        sa, sb = sigs_all.alias("sa"), sigs_all.alias("sb")
        dropped = (
            pairs.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
            .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
            .filter(agree.cast("double") / F.lit(float(k)) >= threshold)
            .select(F.col("doc_b").alias(id_col))
            .distinct()
        )
        dropped.write.mode("append").parquet(drop_store)
        sigs_new.write.mode("append").parquet(sig_store)
        df.select(id_col).write.mode("append").parquet(ids_store)

    return (
        doc_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_survivors(
    spark: SparkSession, index_path: str, id_col: str = "doc_id"
) -> DataFrame:
    """Current survivor set: every streamed id minus the dropped set.
    One anti-join over the (id-only) stores — O(corpus ids), no text."""
    ids = spark.read.parquet(f"{index_path}/ids")
    dropped = _read_or_none(spark, f"{index_path}/dropped")
    if dropped is None:
        return ids
    return ids.join(dropped, id_col, "left_anti")
