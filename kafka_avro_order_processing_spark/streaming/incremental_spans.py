"""Streaming span-level dedup — operators/substr.py's ingest-time
twin, completing the dedup family's streaming coverage (exact,
near-dup, linkage, and now repeated-span): documents are checked for
corpus-wide duplicated n-gram spans AS THEY LAND, against a growing
count index, without ever rescanning earlier epochs.

Index layout under ``index_path`` (the incremental_dedup pattern):

  grams/   (gram_bucket, gram, occ, epoch) — APPEND-ONLY count
           increments, partitioned by the gram's md5 bucket so each
           epoch reads only the partitions its own grams hash into.
           A replayed epoch appends identical (gram, epoch, occ)
           rows; every read collapses them with a distinct on
           (gram, epoch) BEFORE summing, so at-least-once delivery
           cannot overcount — exactly-once lands read-side.
  spans/   (doc_id, span_start, span_end, n_grams, epoch) — the
           flags, append-only; replays re-append identical rows,
           deduplicated at read.

CONTRACT (ingest-time best, no retraction — the incremental_linkage
convention): a document's spans are judged against all occurrences
known AT ITS EPOCH (prior index + its own epoch, same-document
repeats included).  A wave-1 passage that only becomes duplicated
when wave 2 lands flags the WAVE-2 document, not retroactively the
wave-1 one; batch closure over the full corpus is one
``duplicated_ngram_spans`` call, and a single-epoch drain equals it
exactly (suite-pinned).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.substr import _positioned_ngrams

N_GRAM_BUCKETS = 16


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def _with_bucket(grams: DataFrame, n_buckets: int) -> DataFrame:
    return grams.withColumn(
        "gram_bucket", F.pmod(F.hash(F.col("gram")), F.lit(n_buckets))
    )


def start_incremental_spans(
    doc_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    n: int = 8,
    min_occurrences: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = N_GRAM_BUCKETS,
):
    """Start the availableNow ingest query; read flags afterwards with
    :func:`read_spans`."""
    gram_store = f"{index_path}/grams"
    span_store = f"{index_path}/spans"
    if "://" not in index_path:
        # heal a crashed compaction BEFORE any epoch can mistake a
        # mid-swap missing store for "first epoch"
        recover_spans_index(index_path)

    def body(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        if df.isEmpty():
            return
        pos = _with_bucket(
            _positioned_ngrams(df, n, id_col, text_col), n_buckets
        ).localCheckpoint(eager=True)
        epoch_counts = pos.groupBy("gram_bucket", "gram").agg(
            F.count(F.lit(1)).alias("occ")
        )
        totals = epoch_counts
        prior = _read_or_none(spark, gram_store)
        if prior is not None:
            buckets = [
                r[0] for r in pos.select("gram_bucket").distinct().collect()
            ]
            prior_counts = (
                prior.filter(F.col("gram_bucket").isin(buckets))
                # replay tolerance, two layers: a re-appended epoch's
                # rows are byte-identical (collapse before summing),
                # and THIS epoch's own prior rows are excluded — a
                # replayed epoch must see exactly the pre-epoch state,
                # or its own stored counts would double its
                # occurrences and widen spans across the threshold.
                # (Corollary: one checkpoint per index — fresh
                # checkpoints restart batch ids at 0 and would
                # mis-exclude an older epoch's counts.)
                .filter(F.col("epoch") != epoch_id)
                .dropDuplicates(["gram", "epoch"])
                .join(
                    F.broadcast(epoch_counts.select("gram").distinct()),
                    "gram",
                    "leftsemi",
                )
                .groupBy("gram_bucket", "gram")
                .agg(F.sum("occ").alias("occ"))
            )
            totals = (
                totals.unionByName(prior_counts)
                .groupBy("gram_bucket", "gram")
                .agg(F.sum("occ").alias("occ"))
            )
        dup_grams = totals.filter(
            F.col("occ") >= min_occurrences
        ).select("gram")
        dup_pos = pos.join(F.broadcast(dup_grams), "gram", "leftsemi")
        w = Window.partitionBy(id_col).orderBy("pos")
        runs = dup_pos.withColumn(
            "island", F.col("pos") - F.row_number().over(w)
        )
        spans = (
            runs.groupBy(id_col, "island")
            .agg(
                F.min("pos").alias("span_start"),
                (F.max("pos") + F.lit(n - 1)).alias("span_end"),
                F.count(F.lit(1)).alias("n_grams"),
            )
            .select(
                id_col,
                F.col("span_start").cast("int"),
                F.col("span_end").cast("int").alias("span_end"),
                F.col("n_grams").cast("int"),
                F.lit(epoch_id).cast("long").alias("epoch"),
            )
        )
        spans.write.mode("append").parquet(span_store)
        epoch_counts.select(
            "gram_bucket", "gram", "occ", F.lit(epoch_id).cast("long").alias("epoch")
        ).write.mode("append").partitionBy("gram_bucket").parquet(gram_store)

    return (
        doc_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_spans(spark: SparkSession, index_path: str) -> DataFrame:
    """All ingest-time span flags, replay-deduplicated.  Empty frame
    with the right schema when nothing was ever flagged."""
    df = _read_or_none(spark, f"{index_path}/spans")
    if df is None:
        return spark.createDataFrame(
            [],
            "doc_id long, span_start int, span_end int,"
            " n_grams int, epoch long",
        )
    return df.dropDuplicates(
        ["doc_id", "span_start", "span_end", "epoch"]
    )


_SPAN_STORES = ("grams", "spans")


def recover_spans_index(index_path: str) -> list[str]:
    """Crash recovery for :func:`compact_spans_index`'s store swaps —
    the incremental_dedup recover contract: a ``_bak`` with no live
    sibling rolls back into place, a ``_bak`` beside a live store is a
    post-swap leftover (dropped), ``compacting.*`` scratch is removed.
    Run automatically at ingest start and compaction start."""
    import os
    import shutil

    actions: list[str] = []
    for name in _SPAN_STORES:
        live = f"{index_path}/{name}"
        bak, tmp = live + "_bak", f"{index_path}/compacting.{name}"
        if os.path.exists(bak):
            if os.path.exists(live):
                shutil.rmtree(bak)
                actions.append(f"dropped post-swap leftover {name}_bak")
            else:
                os.rename(bak, live)
                actions.append(f"restored {name} from {name}_bak")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
            actions.append(f"removed stale compacting.{name}")
    return actions


def compact_spans_index(spark: SparkSession, index_path: str) -> dict:
    """Maintenance compaction (run BETWEEN drains, single-writer):
    the count ledger grows one row per (gram, epoch) and one small
    file per epoch — this collapses it to ONE row per gram, stamped
    ``epoch = -1``: a batch id is never negative, so collapsed rows
    can never be mistaken for a live epoch's own increments by the
    replay-exclusion filter, and they survive every future
    (gram, epoch) dedupe untouched.  The spans store rewrites
    physically deduplicated.  Same old->bak / new->live / drop-bak
    swap and :func:`recover_spans_index` healing as the dedup index;
    local paths only.  Returns per-store file counts."""
    import glob as _glob
    import os
    import shutil

    recover_spans_index(index_path)

    def _nfiles(d: str) -> int:
        return len(_glob.glob(f"{d}/**/*.parquet", recursive=True))

    def _swap(live: str, fresh: str) -> None:
        bak = live + "_bak"
        os.rename(live, bak)
        os.rename(fresh, live)
        shutil.rmtree(bak)

    stats: dict[str, dict] = {}
    gram_store = f"{index_path}/grams"
    if os.path.exists(gram_store):
        tmp = f"{index_path}/compacting.grams"
        before = _nfiles(gram_store)
        collapsed = (
            spark.read.parquet(gram_store)
            .dropDuplicates(["gram", "epoch"])
            .groupBy("gram_bucket", "gram")
            .agg(F.sum("occ").alias("occ"))
            .select(
                "gram_bucket", "gram", "occ",
                F.lit(-1).cast("long").alias("epoch"),
            )
        )
        n = max(collapsed.select("gram_bucket").distinct().count(), 1)
        (
            collapsed.repartition(n, F.col("gram_bucket"))
            .write.mode("overwrite")
            .partitionBy("gram_bucket")
            .parquet(tmp)
        )
        _swap(gram_store, tmp)
        stats["grams"] = {"files_before": before, "files_after": _nfiles(gram_store)}
    span_store = f"{index_path}/spans"
    if os.path.exists(span_store):
        tmp = f"{index_path}/compacting.spans"
        before = _nfiles(span_store)
        spark.read.parquet(span_store).dropDuplicates(
            ["doc_id", "span_start", "span_end", "epoch"]
        ).coalesce(1).write.mode("overwrite").parquet(tmp)
        _swap(span_store, tmp)
        stats["spans"] = {"files_before": before, "files_after": _nfiles(span_store)}
    return stats
