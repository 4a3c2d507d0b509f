"""Sequence packing: documents -> fixed-capacity token bins, the last
step before a corpus ships to pretraining.

Reference scope note: the reference pipeline
(src/aggregator/price_aggregator.py) has no packing analogue — this is
part of the engine's training-data extension surface.

Scale shape: a GLOBAL ordered cumsum is a one-partition bottleneck, so
documents are first hashed into `n_shards` independent shards and the
running token count is per-shard (one shuffle on the shard key, each
shard's window sorts only 1/n_shards of the corpus).  `n_shards` is a
real parameter sized to the cluster — parallelism AND per-task sort
volume scale with it; the 100 TB setting is "a few x the executor core
count" so each shard's sort fits one task comfortably.  bin_id is a
pure function of (shard, per-shard prefix sum), so it is stable under
any input partitioning and any n_shards choice is internally
consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import tokens

BIN_TOKENS = 256
# bin_id = shard * SHARD_STRIDE + bin-within-shard; the stride bounds
# bins per shard (tokens per shard < SHARD_STRIDE * BIN_TOKENS ~ 2.5e8
# at the default bin size — raise it if a shard can exceed that).
SHARD_STRIDE = 1_000_000


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    stride: int | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-length token windows per document — the writer-side step
    that turns raw documents into training sequences (sequence packing
    above then bins whole docs; this SPLITS long docs).  ``stride``
    defaults to ``chunk_tokens`` (disjoint windows); a smaller stride
    yields overlapping context windows, the standard trick to avoid
    truncating cross-boundary context.

    Pure per-row expression work (split -> sequence of window starts ->
    explode -> slice): no shuffle at all — the chunker is map-side
    codegen over the scan, which is exactly what a 100 TB corpus pass
    can afford.  Each chunk carries a content hash so downstream
    dedup/provenance never re-reads the text.
    """
    stride = chunk_tokens if stride is None else stride
    toks = tokens(text_col)
    n = F.size(toks)
    # number of windows: ceil(max(n - chunk_tokens, 0) / stride) + 1 —
    # every token lands in >= 1 window, the last window may be short
    n_win = (
        F.ceil(F.greatest(n - chunk_tokens, F.lit(0)) / float(stride)) + 1
    ).cast("int")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("__toks"),
        F.explode(F.sequence(F.lit(0), n_win - 1)).alias("chunk_id"),
    )
    chunk = F.slice(F.col("__toks"), F.col("chunk_id") * stride + 1, chunk_tokens)
    return base.select(
        "doc_id",
        "chunk_id",
        F.size(chunk).cast("long").alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_hash"),
    )


def pack_sequences(
    docs: DataFrame,
    n_shards: int | None = None,
    bin_tokens: int = BIN_TOKENS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Assign each document to a token bin: documents fill bins
    contiguously (by id order) within their shard; a document starts a
    new bin when the previous ones hold >= `bin_tokens` tokens.

    ``n_shards=None`` sizes the shard count to the session's default
    parallelism — the right default on a real cluster.  Pass an
    explicit count when the result must be reproducible across
    differently-sized sessions (the oracle-checked registry query pins
    one).
    """
    if n_shards is None:
        n_shards = docs.sparkSession.sparkContext.defaultParallelism
    t = docs.select(
        F.col(id_col).alias("doc_id"),
        (F.col(id_col) % n_shards).alias("shard"),
        F.size(tokens(text_col)).cast("long").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = t.withColumn("cum", F.sum("n_tokens").over(w))
    return cum.select(
        "doc_id",
        "shard",
        "n_tokens",
        (
            F.col("shard") * SHARD_STRIDE
            + F.floor((F.col("cum") - F.col("n_tokens")) / float(bin_tokens))
        ).cast("bigint").alias("bin_id"),
    )
