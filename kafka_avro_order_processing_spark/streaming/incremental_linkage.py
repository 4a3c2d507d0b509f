"""Incremental record linkage: a record stream matched against a
growing blocked index — the streaming twin of
:func:`operators.fuzzy.fuzzy_best_match`.

The production shape for continuous entity resolution (new catalog
listings, incoming customer records) at scale: you do NOT re-compare
the whole corpus when a shard arrives — the corpus lives as a
block-partitioned parquet index, and each epoch joins only the NEW
records against (a) each other and (b) the index partitions their own
block keys hash into.  Per epoch:

    epoch records -> block keys (+ blk_bucket partition key)
      -> peers = epoch records UNION index rows from ONLY the
                 blk_bucket partitions the epoch touches
      -> candidates = new x peers on the block key (never all pairs)
      -> levenshtein <= max_distance, rank (distance, peer id), keep 1
      -> append links; append epoch records to the index

Per-epoch cost: O(epoch x touched partitions) — the bucket list is at
most ``n_buckets`` small integers (bounded driver collect, the same
partition-pruned pattern as the incremental dedup index and MERGE).
Nothing re-reads or re-compares the untouched corpus, ever.

Contract (stated, not hidden): a link is the best match AT INGEST
TIME — a record links against the index plus its own epoch, and
linkage does not retract or re-link (the monotone-append discipline
every store here follows).  A record whose closest counterpart
arrives LATER keeps its ingest-time link (the late arrival itself
links back, so the relationship is still discoverable — just from
the other side).  A single-epoch drain therefore equals the batch
:func:`operators.fuzzy.fuzzy_best_match` exactly (suite-pinned), and
the closure over a multi-epoch corpus is one batch run over the
record store.

Hot blocks: the cap is evaluated over the DEDUPLICATED union of epoch
+ index members of the block (so at-least-once replays cannot flip a
block across the cap), and oversized blocks emit nothing — the same
honest skip as the batch operator (for matching, a sampled or starred
comparison would report false non-matches).

At-least-once replay tolerance: peers dedup by (blk, id) — a replayed
epoch meeting its own appended rows pairs against them only via the
``new.id != peer.id`` guard's complement, i.e. not at all; duplicate
link appends dedup on read (:func:`read_links` re-ranks per id).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators.fuzzy import MAX_FUZZY_BLOCK

#: disk partitions of the record store (creation-time default; kept
#: simple here — unlike the dedup index this store is keyed by the
#: caller's own block column, so re-bucketing is a plain rewrite).
N_BLK_BUCKETS = 16


def _read_or_none(spark: SparkSession, path: str) -> DataFrame | None:
    if "://" not in path and not os.path.exists(path):
        return None
    try:
        return spark.read.parquet(path)
    except Exception:
        return None


def start_incremental_linkage(
    record_stream: DataFrame,
    index_path: str,
    checkpoint: str,
    id_col: str = "id",
    text_col: str = "text",
    block_col: str = "blk",
    max_distance: int = 4,
    max_block_size: int = MAX_FUZZY_BLOCK,
    n_buckets: int = N_BLK_BUCKETS,
):
    """Start the availableNow ingest query.  The index at `index_path`
    holds two append-only parquet stores: ``records`` (every streamed
    record, partitioned by ``blk_bucket`` for per-epoch pruning) and
    ``links`` (ingest-time best matches).  Read the per-record best
    links afterwards with :func:`read_links`."""
    rec_store = f"{index_path}/records"
    link_store = f"{index_path}/links"
    if "://" not in index_path:
        # heal a crashed compaction BEFORE any epoch can mistake a
        # mid-swap missing store for "first epoch"
        recover_linkage_index(index_path)

    def body(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        if df.isEmpty():
            return
        new = (
            df.select(
                F.col(id_col).alias("rid"),
                F.col(text_col).alias("rtext"),
                F.col(block_col).alias("blk"),
            )
            .withColumn("blk_bucket", F.pmod(F.hash(F.col("blk")), F.lit(n_buckets)))
            .localCheckpoint(eager=True)
        )
        peers = new.select("blk", F.col("rid").alias("cid"), F.col("rtext").alias("ctext"))
        idx = _read_or_none(spark, rec_store)
        if idx is not None:
            buckets = [r[0] for r in new.select("blk_bucket").distinct().collect()]
            pruned = idx.filter(F.col("blk_bucket").isin(buckets)).select(
                "blk", F.col("rid").alias("cid"), F.col("rtext").alias("ctext")
            )
            peers = peers.unionByName(pruned)
        # dedup BEFORE sizing and joining: replayed epochs must not
        # double-count members across the cap or duplicate candidates
        peers = peers.distinct()
        sizes = peers.groupBy("blk").agg(F.count("*").alias("block_n"))
        ok = sizes.filter(F.col("block_n") <= max_block_size).select("blk")
        scored = (
            new.join(ok, "blk", "leftsemi")
            .join(peers, "blk")
            .filter(F.col("rid") != F.col("cid"))
            .withColumn("distance", F.levenshtein("rtext", "ctext"))
            .filter(F.col("distance") <= max_distance)
        )
        w = Window.partitionBy("rid").orderBy(F.asc("distance"), F.asc("cid"))
        best = (
            scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                F.col("rid").alias(id_col),
                F.col("cid").alias("match_id"),
                F.col("ctext").alias("match_text"),
                F.col("distance").cast("int").alias("distance"),
            )
        )
        best.write.mode("append").parquet(link_store)
        new.write.mode("append").partitionBy("blk_bucket").parquet(rec_store)

    return (
        record_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def read_links(spark: SparkSession, index_path: str, id_col: str = "id") -> DataFrame:
    """The per-record best link over everything ingested so far.
    Re-ranks on read so at-least-once duplicate appends (and a record
    linked in several epochs as its block grew) collapse to one row:
    smallest distance, then smallest match id — the batch operator's
    exact tie rule."""
    links = spark.read.parquet(f"{index_path}/links").distinct()
    w = Window.partitionBy(id_col).orderBy(F.asc("distance"), F.asc("match_id"))
    return (
        links.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


_STORE_NAMES = ("records", "links")


def recover_linkage_index(index_path: str) -> list[str]:
    """Crash recovery for :func:`compact_linkage_index`'s store swaps
    (run automatically at ingest start and compaction start) — same
    protocol and hazard as incremental_dedup.recover_index: a crash
    between the two swap renames leaves no live store, and the next
    drain would mistake that for "first epoch" and silently link
    without the index.  A ``_bak`` with no live sibling rolls back; a
    ``_bak`` beside a live store is a post-swap leftover and drops;
    ``compacting.*`` scratch is removed."""
    import shutil

    actions: list[str] = []
    for name in _STORE_NAMES:
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


def compact_linkage_index(spark: SparkSession, index_path: str) -> dict:
    """Maintenance compaction between drains (single-writer window):

    - ``records`` rewrites to one file per ``blk_bucket`` partition
      (hash-repartition on the partition key — the pruning layout is
      preserved exactly), deduplicated (at-least-once replays may have
      double-appended rows);
    - ``links`` rewrites to the CURRENT per-record best rows only
      (the read-time re-rank of :func:`read_links`, materialized) —
      over thousands of epochs the raw append log grows with every
      re-link while the useful content stays one row per record.

    Results are unchanged: read_links before == read_links after
    (suite-pinned).  Swap protocol and crash recovery are shared with
    the dedup index (old->bak / fresh->live / drop bak;
    :func:`recover_linkage_index` heals a mid-swap crash).  Local
    paths only; returns per-store {files_before, files_after}."""
    import glob as _glob
    import shutil

    recover_linkage_index(index_path)

    def _nfiles(d: str) -> int:
        return len(_glob.glob(f"{d}/**/*.parquet", recursive=True))

    def _swap(live: str, fresh: str) -> None:
        bak = live + "_bak"
        os.rename(live, bak)
        os.rename(fresh, live)
        shutil.rmtree(bak)

    stats: dict[str, dict] = {}
    rec_store = f"{index_path}/records"
    if os.path.exists(rec_store):
        tmp = f"{index_path}/compacting.records"
        before = _nfiles(rec_store)
        df = spark.read.parquet(rec_store).distinct()
        n = max(df.select("blk_bucket").distinct().count(), 1)
        (
            df.repartition(n, F.col("blk_bucket"))
            .write.mode("overwrite")
            .partitionBy("blk_bucket")
            .parquet(tmp)
        )
        _swap(rec_store, tmp)
        stats["records"] = {"files_before": before, "files_after": _nfiles(rec_store)}
    link_store = f"{index_path}/links"
    if os.path.exists(link_store):
        tmp = f"{index_path}/compacting.links"
        before = _nfiles(link_store)
        # materialize the read-time re-rank: id_col is whatever the
        # ingest wrote — every column except the three fixed ones
        cols = spark.read.parquet(link_store).columns
        (idc,) = [c for c in cols if c not in ("match_id", "match_text", "distance")]
        read_links(spark, index_path, id_col=idc).coalesce(1).write.mode(
            "overwrite"
        ).parquet(tmp)
        _swap(link_store, tmp)
        stats["links"] = {"files_before": before, "files_after": _nfiles(link_store)}
    return stats
