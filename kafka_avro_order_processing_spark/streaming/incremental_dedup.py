"""Incremental near-duplicate dedup: a document stream maintained
against a growing MinHash-LSH index.

The production shape for corpus ingestion at 100 TB: you do NOT
re-LSH the whole corpus when a new shard arrives — you keep the BAND
TABLE itself as the persisted index and join only the NEW docs'
band rows against it.  Per epoch:

    epoch docs -> minhash signatures -> band rows (+ band bucket)
      -> candidate pairs = (new x new, id-ordered)
                         UNION (new x band-store on shared band,
                                reading ONLY the band_bucket
                                partitions the epoch touches)
      -> signature-agreement estimate >= threshold  ==> the pair's
         HIGHER id is marked dropped
      -> append epoch band rows / signatures / ids to the index

Per-epoch cost: the epoch pass (signatures + bands) is O(epoch); the
index side of the band join reads only the band-store partitions
whose bucket appears in the epoch's own band rows (disk partition
pruning on ``band_bucket = pmod(hash(band_val), n_buckets)`` — the
skew-aware layout: hot band values spread across reads, and at real
scale ``n_buckets`` grows so each epoch prunes most of the store);
the signature-estimate join touches only ids appearing in some
candidate pair (broadcast semi-join against the signature store — the
same candidate-only trick batch ``near_dup_pairs`` uses).  Nothing
re-bands or re-shingles the existing corpus, ever.

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

At-least-once replay tolerance: foreachBatch may re-run an epoch
whose store appends partially landed.  Three guards make the replay
converge instead of self-destructing: the new-vs-index join requires
``new.id != indexed.id`` (a doc meeting its own replayed index entry
is NOT a pair — without this, every replayed doc would "agree with
itself" k/k and be dropped); the signature lookup dedups by id (a
double-appended signature must not double pair rows); and survivors
dedup the ids store on read.  Duplicate band rows only produce
duplicate candidate pairs, which ``distinct()`` already removes.

Estimate-only verification (signature agreement, no exact-Jaccard
re-shingle) is deliberate: it is the standard corpus-dedup operating
point (the index stores fixed-width signatures and band rows, never
text) and keeps the index O(k) bytes per doc.  Consumers wanting
exact Jaccard on the survivor set run the batch `near_dup_pairs`
over it.
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

#: disk partitions of the band store.  Sized so one epoch's bands
#: prune a useful fraction at test scale; at 100 TB this grows (e.g.
#: 1024) — more pruning per epoch, still trivially many files ONLY if
#: epochs are large enough to fill them (tune with ingest shard size).
#: This is only the CREATION-TIME default: the count an index was
#: created with persists inside its band store (``_n_buckets.json``)
#: and every later epoch reads it back, so ingest processes with
#: different defaults can never disagree on the partitioning a store
#: is laid out in.  Re-bucket a live index with
#: ``compact_index(..., n_buckets=new_n)``.
N_BAND_BUCKETS = 16

_BUCKETS_MARKER = "_n_buckets.json"


def stored_n_buckets(index_path: str) -> int | None:
    """The bucket count the band store is PHYSICALLY laid out in, or
    None for a not-yet-created (or pre-marker legacy) store.  The
    marker lives INSIDE the band store directory so compaction's
    directory swap carries it atomically with the layout it
    describes — meta and data can never disagree after a crash."""
    mp = f"{index_path}/bands/{_BUCKETS_MARKER}"
    if "://" in index_path or not os.path.exists(mp):
        return None
    import json

    with open(mp) as f:
        return int(json.load(f)["n_band_buckets"])


def _write_buckets_marker(band_store: str, n: int) -> None:
    import json

    os.makedirs(band_store, exist_ok=True)
    # Spark's file listing hides "_"-prefixed files, so the marker is
    # invisible to parquet reads of the store
    with open(f"{band_store}/{_BUCKETS_MARKER}", "w") as f:
        json.dump({"n_band_buckets": int(n)}, f)


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


def epoch_bands(
    sigs_new: DataFrame,
    id_col: str = "doc_id",
    k: int = N_MINHASH,
    band_rows: int = BAND_ROWS,
    n_buckets: int = N_BAND_BUCKETS,
) -> DataFrame:
    """Band rows of one epoch's signatures, carrying the band_bucket
    partition key under which they are stored AND pruned."""
    return band_rows_of(sigs_new, id_col, k, band_rows).withColumn(
        "band_bucket", F.pmod(F.hash(F.col("band_val")), F.lit(n_buckets))
    )


def index_candidate_pairs(
    spark: SparkSession,
    bands_new: DataFrame,
    band_store: str,
    id_col: str = "doc_id",
) -> DataFrame | None:
    """Candidate pairs between the epoch's band rows and the PERSISTED
    band-table index — the O(epoch)-shaped half of the join.

    Reads only the ``band_bucket=`` partitions the epoch's own bands
    hit (the bucket list is at most ``n_buckets`` small integers — a
    bounded driver collect, same pattern as the partition-pruned
    MERGE).  The ``new.id != indexed.id`` guard keeps an at-least-once
    replay (epoch bands already appended) from pairing docs with
    themselves.  Returns None when the store does not exist yet or the
    epoch produced no bands."""
    if _read_or_none(spark, band_store) is None:
        return None
    buckets = [r[0] for r in bands_new.select("band_bucket").distinct().collect()]
    if not buckets:
        return None
    idx = spark.read.parquet(band_store).filter(F.col("band_bucket").isin(buckets))
    n, o = bands_new.alias("n"), idx.alias("o")
    return (
        n.join(
            o,
            (F.col("n.band_id") == F.col("o.band_id"))
            & (F.col("n.band_val") == F.col("o.band_val"))
            # id-orient below: the new doc may have the LOWER id —
            # then the indexed doc drops.  Self-meet (replayed epoch
            # finding its own index rows) is excluded here.
            & (F.col(f"n.{id_col}") != F.col(f"o.{id_col}")),
        )
        .select(
            F.least(F.col(f"n.{id_col}"), F.col(f"o.{id_col}")).alias("doc_a"),
            F.greatest(F.col(f"n.{id_col}"), F.col(f"o.{id_col}")).alias("doc_b"),
        )
    )


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
    n_buckets: int = N_BAND_BUCKETS,
):
    """Start the availableNow ingest query.  The index at `index_path`
    holds four append-only parquet stores: ``ids`` (every streamed
    doc id — docs too short to shingle still count), ``sigs``
    (signatures, read candidate-only), ``bands`` (the band-table
    index, partitioned by ``band_bucket`` for per-epoch pruning), and
    ``dropped`` (ids that lost to a lower-id near-dup).  Read
    survivors afterwards with :func:`read_survivors`.

    ``n_buckets`` applies at index CREATION only: the count persists
    inside the band store (see :func:`stored_n_buckets`) and later
    drains always band under the stored count, whatever their own
    parameter says — epochs and layout can never disagree.  Grow a
    live index's count with ``compact_index(..., n_buckets=new_n)``.
    """
    ids_store = f"{index_path}/ids"
    sig_store = f"{index_path}/sigs"
    band_store = f"{index_path}/bands"
    drop_store = f"{index_path}/dropped"
    if "://" not in index_path:
        # heal a crashed compaction BEFORE any epoch can mistake a
        # mid-swap missing store for "first epoch" (see recover_index)
        recover_index(index_path)

    def body(df: DataFrame, epoch_id: int) -> None:
        spark = df.sparkSession
        if df.isEmpty():
            return
        # The bucket count the store is laid out in ALWAYS wins over
        # this process's parameter (which only applies at creation):
        # an epoch banding under a different count than the store's
        # physical layout would prune the wrong partitions.
        stored = stored_n_buckets(index_path)
        n_eff = stored if stored is not None else n_buckets
        if stored is None and "://" not in index_path:
            _write_buckets_marker(band_store, n_eff)  # before first append
        # Epoch signatures: computed once (eager checkpoint — they feed
        # the band explode, the estimate lookup, and the store append).
        sigs_new = _signatures_from_rows(
            shingler(df, id_col, text_col, distinct=False, spread=False),
            id_col,
            k,
        ).localCheckpoint(eager=True)
        bands_new = epoch_bands(sigs_new, id_col, k, band_rows, n_eff)

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
        # new x index via the persisted band table (pruned read)
        cross = index_candidate_pairs(spark, bands_new, band_store, id_col)
        if cross is not None:
            pairs = pairs.unionByName(cross)
        # Tiny table, read three times below (two id projections + the
        # estimate join) — materialize eagerly, same stage boundary the
        # batch pipeline draws between LSH and verify.
        pairs = pairs.distinct().localCheckpoint(eager=True)

        # Signature lookup for the estimate: epoch signatures plus ONLY
        # the indexed signatures that appear in some candidate pair
        # (broadcast semi-join — the store is never shuffled, never
        # banded, never carried into the join whole).  dropDuplicates
        # tolerates a replay's double-appended signatures.
        cand_ids = pairs.select(F.col("doc_a").alias(id_col)).unionByName(
            pairs.select(F.col("doc_b").alias(id_col))
        )
        sigs_lookup = sigs_new
        sigs_old = _read_or_none(spark, sig_store)
        if sigs_old is not None:
            sigs_lookup = sigs_lookup.unionByName(
                sigs_old.join(F.broadcast(cand_ids), id_col, "semi")
            )
        sigs_lookup = sigs_lookup.dropDuplicates([id_col])

        agree = sum(
            F.when(F.col(f"sa.mh{j}") == F.col(f"sb.mh{j}"), 1).otherwise(0)
            for j in range(k)
        )
        sa, sb = sigs_lookup.alias("sa"), sigs_lookup.alias("sb")
        dropped = (
            pairs.join(sa, F.col("doc_a") == F.col(f"sa.{id_col}"))
            .join(sb, F.col("doc_b") == F.col(f"sb.{id_col}"))
            .filter(agree.cast("double") / F.lit(float(k)) >= threshold)
            .select(F.col("doc_b").alias(id_col))
            .distinct()
        )
        dropped.write.mode("append").parquet(drop_store)
        bands_new.write.mode("append").partitionBy("band_bucket").parquet(band_store)
        sigs_new.write.mode("append").parquet(sig_store)
        df.select(id_col).write.mode("append").parquet(ids_store)

    return (
        doc_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


_STORE_NAMES = ("ids", "sigs", "dropped", "bands")


def recover_index(index_path: str) -> list[str]:
    """Crash recovery for :func:`compact_index`'s store swaps — run
    automatically at ingest start and compaction start.

    The swap is old->``_bak`` / new->live / drop-``_bak``; a crash in
    the window between the two renames leaves NO live store, and
    without recovery the next drain's ``_read_or_none`` would treat
    the missing store as "first epoch" — ingestion would silently
    continue without the index, permanently losing dedup against the
    existing corpus.  Recovery rolls BACK: a ``<store>_bak`` with no
    live sibling renames back into place (the pre-compaction store is
    always complete); a ``_bak`` beside a live store is the
    post-swap leftover and is dropped; any ``compacting.<store>``
    output is stale scratch (rebuildable) and is removed.  After
    recovery exactly one complete layout is live — old or new, never
    neither.  Returns a human-readable action list (empty = clean)."""
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
                actions.append(f"restored {name} from {name}_bak after mid-swap crash")
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
            actions.append(f"removed stale compacting.{name}")
    return actions


def compact_index(
    spark: SparkSession, index_path: str, n_buckets: int | None = None
) -> dict:
    """Maintenance compaction for the index stores.

    Pass ``n_buckets`` to RE-BUCKET the band store to a new partition
    count during the rewrite (the 100 TB growth path: an index created
    at a small count re-buckets to e.g. 1024 as the corpus grows, and
    the persisted ``_n_buckets.json`` marker swaps in atomically with
    the new layout so subsequent epochs band and prune under the new
    count).  Without it the stored count — and layout — is preserved.

    Every ingest epoch appends one small parquet file per writing task
    to each store; over thousands of epochs the stores become
    LISTING-bound — the classic small-file problem, and at 100 TB the
    thing that actually kills a long-lived index.  Run this BETWEEN
    drains (single-writer maintenance window, like any lake
    compaction):

    - the band store rewrites to one file per ``band_bucket``
      partition (hash-repartition on the partition key, so pruning
      layout is preserved exactly);
    - the id-shaped stores (ids/sigs/dropped) rewrite via
      ``compact_parquet`` (size-targeted file count);
    - each store swaps in with old->bak / new->live / drop-bak; a
      crash can land in the window between the two renames (no live
      store), so BOTH this function and ingest start by running
      :func:`recover_index`, which rolls a dangling ``_bak`` back
      into place — after recovery either the old or the new layout
      is live, never neither.

    Results are unchanged — the stores are row SETS and only the file
    layout moves (survivor-identity asserted in tests).  Local-path
    stores only (the swap uses directory renames); returns per-store
    {files_before, files_after} stats."""
    import glob as _glob
    import shutil

    from ..sources.files import compact_parquet

    recover_index(index_path)  # heal any crashed prior compaction first

    def _nfiles(d: str) -> int:
        return len(_glob.glob(f"{d}/**/*.parquet", recursive=True))

    def _swap(live: str, fresh: str) -> None:
        bak = live + "_bak"
        os.rename(live, bak)
        os.rename(fresh, live)
        shutil.rmtree(bak)

    stats: dict[str, dict] = {}
    for name in ("ids", "sigs", "dropped"):
        src = f"{index_path}/{name}"
        if not os.path.exists(src):
            continue
        tmp = f"{index_path}/compacting.{name}"
        before = _nfiles(src)
        compact_parquet(spark, src, tmp)
        _swap(src, tmp)
        stats[name] = {"files_before": before, "files_after": _nfiles(src)}

    band_store = f"{index_path}/bands"
    if os.path.exists(band_store):
        tmp = f"{index_path}/compacting.bands"
        before = _nfiles(band_store)
        df = spark.read.parquet(band_store)
        cur_n = stored_n_buckets(index_path)
        target_n = n_buckets if n_buckets is not None else cur_n
        if target_n is not None and target_n != cur_n:
            # RE-BUCKET: recompute the partition key under the new
            # count (same expression epoch_bands uses, so future
            # epochs' pruning agrees with the new layout)
            df = df.withColumn(
                "band_bucket",
                F.pmod(F.hash(F.col("band_val")), F.lit(int(target_n))),
            )
        n = max(df.select("band_bucket").distinct().count(), 1)
        (
            df.repartition(n, F.col("band_bucket"))
            .write.mode("overwrite")
            .partitionBy("band_bucket")
            .parquet(tmp)
        )
        if target_n is not None:
            # marker written into the fresh layout BEFORE the swap:
            # the directory rename carries layout + marker atomically
            _write_buckets_marker(tmp, target_n)
        _swap(band_store, tmp)
        stats["bands"] = {"files_before": before, "files_after": _nfiles(band_store)}
    return stats


def read_survivors(
    spark: SparkSession, index_path: str, id_col: str = "doc_id"
) -> DataFrame:
    """Current survivor set: every streamed id minus the dropped set.
    One anti-join over the (id-only) stores — O(corpus ids), no text.
    The ids side dedups so a replayed epoch's double-append cannot
    double a survivor row."""
    ids = spark.read.parquet(f"{index_path}/ids").dropDuplicates([id_col])
    dropped = _read_or_none(spark, f"{index_path}/dropped")
    if dropped is None:
        return ids
    return ids.join(dropped, id_col, "left_anti")
