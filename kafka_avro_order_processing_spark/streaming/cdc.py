"""Streaming CDC apply: a keyed change-stream maintained as a
partition-pruned parquet table.

The reference keys its orders topic by order id
(/root/reference/scripts/setup_topics.sh:14-19 creates the keyed
`orders` topic; the consumer treats the latest record per key as
current state).  Landed in a lake, that topology is
"apply the change-stream to a maintained table" — here expressed as a
``foreachBatch`` sink whose epoch body is the partition-pruned MERGE
from ``operators.upsert.merge_partitioned``:

- each micro-batch is one MERGE: only the key-buckets the epoch's
  delta touches are scanned (partition pruning at file listing) and
  rewritten (dynamic partition overwrite) — per-epoch IO is O(delta),
  never O(table);
- sequential epochs compose: as long as the change-stream carries at
  most one change per key per epoch-overlap (Kafka's keyed-topic
  contract delivers per-key order), the final table equals the single
  batch MERGE of the whole delta — the equivalence the registry
  oracle checks;
- replay safety: foreachBatch is at-least-once, and re-merging an
  already-applied delta is idempotent (updates replace the same keys
  with the same rows), so a replayed epoch converges to the same
  table.

At 100 TB the target is thousands of buckets and the epoch cadence is
the compaction knob: smaller triggers = fresher table + more rewrite
churn per bucket; production would additionally coalesce epochs per
bucket (the same trade every lakehouse MERGE sink makes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from ..operators.upsert import merge_partitioned, scd2_apply_partitioned


def start_upsert_sink(
    change_stream: DataFrame,
    key: str,
    path: str,
    checkpoint: str,
    n_buckets: int = 16,
):
    """Start an availableNow foreachBatch query that MERGEs each
    micro-batch of `change_stream` into the partitioned table at
    `path` (seeded with ``operators.upsert.write_partitioned``).

    Returns the StreamingQuery; callers ``awaitTermination()`` and then
    read the maintained table from `path`.
    """

    def body(df: DataFrame, epoch_id: int) -> None:
        # An empty epoch (availableNow's trailing commit batch) must
        # not pay a merge plan; isEmpty is a cheap limit-1 probe.
        if df.isEmpty():
            return
        merge_partitioned(df.sparkSession, df, key, path, n_buckets)

    return (
        change_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def start_scd2_sink(
    change_stream: DataFrame,
    key: str,
    path: str,
    checkpoint: str,
    n_buckets: int = 16,
    ts_col: str = "valid_from",
):
    """The SCD2 twin of :func:`start_upsert_sink`: each micro-batch of
    attribute changes closes the affected keys' current rows and
    appends the new versions — touching only the keys' own buckets
    (``operators.upsert.scd2_apply_partitioned``).

    Epoch-composition contract: at most one change per key per stream
    (or per-key changes delivered in valid_from order, the keyed-topic
    guarantee) makes the final dimension equal to one batch
    ``scd2_apply`` of the whole delta; unlike the upsert sink, a
    replayed SCD2 epoch is NOT idempotent (re-closing re-appends a
    version), so production pairs this with the epoch-id dedup the
    aggregated-sink changelog uses.
    """

    def body(df: DataFrame, epoch_id: int) -> None:
        if df.isEmpty():
            return
        scd2_apply_partitioned(
            df.sparkSession, df, key, path, n_buckets, ts_col=ts_col
        )

    return (
        change_stream.writeStream.foreachBatch(body)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
