"""Streaming twins of the bounded-memory sketch families — sharded
KMV distinct sketches and sharded Misra–Gries heavy-hitter candidates
as ``applyInPandasWithState`` operators.

The batch operators (operators/kmv.py, operators/heavy.py) answer
"how many distinct / which keys are hot" over a table; an ingest
pipeline needs the SAME answers continuously over an unbounded
stream, with state that does not grow with the key space.  Both
sketches are associative, so the streaming shape is sharding:

- every record routes to shard = h52(key) % n_shards (DETERMINISTIC —
  the repo md5 convention — so all occurrences of a key land in ONE
  shard and per-shard guarantees lift to global ones);
- each shard's GroupState holds one bounded sketch (k hashes / k
  counters) updated per micro-batch and re-emitted in update mode —
  an O(shards) changelog per epoch, never O(keys);
- the drained changelog folds batch-side into the global answer:

  * KMV: merging the shard sketches' k smallest distinct hashes IS
    the global KMV sketch, BIT-FOR-BIT equal to the batch
    ``kmv_sketch`` of the same rows (min-k closure under union —
    sharding loses nothing).
  * MG: a key with global freq > N/(k+1) has shard freq > n_s/(k+1)
    (its shard's n_s <= N), so it survives its shard's MG summary:
    the drained candidate union has the same no-false-negative
    property as batch pass 1, and ``operators.heavy.exact_recount``
    turns it into the EXACT heavy-hitter set — the streaming path
    hash-matches the batch path and the ANSI oracle.

State bounds: n_shards * k entries total, independent of stream
length and key cardinality.  No timeout — the sketches ARE the
bounded state (contrast streaming/funnel.py's per-user state, which
needs a TTL).

The reference's consumer keeps exact per-product dict counters
updated record-at-a-time (/root/reference/src/aggregator/
price_aggregator.py:35-51); these are the same continuous-readout
semantics at cardinalities where exact state no longer fits.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..operators.heavy import _mg_reduce
from ..operators.kmv import kmv_hash

KMV_OUT_SCHEMA = "shard int, hashes array<long>, n_kept int"
KMV_STATE_SCHEMA = "hashes array<long>"
MG_OUT_SCHEMA = "shard int, key string, lower_bound long"
MG_STATE_SCHEMA = "keys array<string>, counts array<long>"
# one snapshot row per shard (levels flattened to parallel arrays):
# the update-mode drain keeps the LATEST row per shard, so the full
# sketch must travel in one row — per-(level,value) rows would be
# deduped by the changelog fold.
KLL_OUT_SCHEMA = "shard int, levels array<int>, vals array<double>"
KLL_STATE_SCHEMA = (
    "levels array<int>, values array<double>, parity array<int>"
)


def _with_shard(df: DataFrame, key_col: str, n_shards: int, salt: str):
    return df.filter(F.col(key_col).isNotNull()).withColumn(
        "_shard", (kmv_hash(F.col(key_col), salt) % n_shards).cast("int")
    )


def streaming_kmv_sketch(
    stream_df: DataFrame,
    key_col: str,
    k: int = 64,
    n_shards: int = 8,
    salt: str = "kmv",
) -> DataFrame:
    """Per-shard KMV sketches over a stream, update mode: each epoch
    re-emits the shards whose sketch changed.  Fold the drained rows
    with ``merge_shard_sketches`` for the exact global sketch."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (hashes,) = state.get if state.exists else ([],)
        current = set(hashes)
        for pdf in pdfs:
            current.update(int(h) for h in pdf["_h"])
        merged = sorted(current)[:k]
        state.update((merged,))
        yield pd.DataFrame(
            {"shard": [key[0]], "hashes": [merged], "n_kept": [len(merged)]}
        )

    hashed = _with_shard(stream_df, key_col, n_shards, salt).select(
        "_shard", kmv_hash(F.col(key_col), salt).alias("_h")
    )
    return hashed.groupBy("_shard").applyInPandasWithState(
        update,
        outputStructType=KMV_OUT_SCHEMA,
        stateStructType=KMV_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_shard_sketches(shard_rows: DataFrame, k: int) -> DataFrame:
    """Batch-side fold of drained shard sketches into the ONE global
    sketch — identical to ``kmv_sketch`` of the underlying rows."""
    return (
        shard_rows.select(F.explode("hashes").alias("h"))
        .distinct()
        .orderBy("h")
        .limit(k)
        .agg(
            F.array_sort(F.collect_list("h")).alias("hashes"),
            F.count("*").cast("int").alias("n_kept"),
        )
    )


def streaming_mg_candidates(
    stream_df: DataFrame,
    key_col: str,
    k: int = 64,
    n_shards: int = 8,
    salt: str = "mg",
) -> DataFrame:
    """Per-shard Misra–Gries summaries over a stream (STRING keys;
    cast upstream), update mode: each epoch re-emits the shard's
    surviving (key, lower_bound) counters.  The drained keys are a
    no-false-negative candidate set for freq > N/(k+1); feed them to
    ``operators.heavy.exact_recount`` against the accumulated table
    for the exact heavy-hitter set."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, counts = state.get
            counters = dict(zip(keys, (int(c) for c in counts)))
        else:
            counters = {}
        for pdf in pdfs:
            vc = pdf["_k"].value_counts()
            for kk, c in vc.items():
                counters[kk] = counters.get(kk, 0) + int(c)
            counters = _mg_reduce(counters, k)
        state.update((list(counters.keys()), list(counters.values())))
        # list-valued shard column: stays well-formed when the reduce
        # empties the summary (all counts tied above k keys).
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "key": list(counters.keys()),
                "lower_bound": list(counters.values()),
            }
        )

    sharded = _with_shard(stream_df, key_col, n_shards, salt).select(
        "_shard", F.col(key_col).cast("string").alias("_k")
    )
    return sharded.groupBy("_shard").applyInPandasWithState(
        update,
        outputStructType=MG_OUT_SCHEMA,
        stateStructType=MG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_kll_sketch(
    stream_df: DataFrame,
    value_col: str,
    k: int = 128,
    n_shards: int = 4,
) -> DataFrame:
    """Per-shard KLL/MRL quantile sketches over a stream, update mode
    (shard = h52(value) % n_shards — any deterministic router works;
    value-hash keeps shards balanced).  Each shard's GroupState holds
    one _KLL's levels flattened to parallel arrays; every epoch
    re-emits the shard's current (level, value) rows.  Fold the
    drained changelog with ``operators.kll.kll_merge``-style
    re-compaction (``merge_shard_kll``) for the global sketch: weight
    conservation stays EXACT (sharding partitions the rows, each
    shard's sketch conserves its share, re-compaction preserves the
    sum), and the error budget is the merged-sketch budget.  State:
    O(n_shards * k log n) values total."""
    from ..operators.kll import _KLL

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        sk = _KLL(k)
        if state.exists:
            levels, values, parity = state.get
            for lv in sorted(set(levels)):
                sk.add_weighted(
                    int(lv),
                    [v for l2, v in zip(levels, values) if l2 == lv],
                )
            for h, p in enumerate(parity):
                if h < len(sk.parity):
                    sk.parity[h] = int(p)
        for pdf in pdfs:
            if pdf["_v"].isna().any():
                raise ValueError(
                    "streaming_kll_sketch: NULL/NaN value rejected"
                )
            sk.add_batch(pdf["_v"])
        rows = list(sk.rows())
        state.update(
            (
                [r[0] for r in rows],
                [r[1] for r in rows],
                list(sk.parity),
            )
        )
        yield pd.DataFrame(
            {
                "shard": [key[0]],
                "levels": [[r[0] for r in rows]],
                "vals": [[r[1] for r in rows]],
            }
        )

    sharded = stream_df.select(
        (kmv_hash(F.col(value_col), "kllshard") % n_shards)
        .cast("int")
        .alias("_shard"),
        F.col(value_col).cast("double").alias("_v"),
    )
    return sharded.groupBy("_shard").applyInPandasWithState(
        update,
        outputStructType=KLL_OUT_SCHEMA,
        stateStructType=KLL_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_shard_kll(shard_rows: DataFrame, k: int) -> DataFrame:
    """Batch-side fold of drained per-shard KLL snapshots into one
    global sketch frame (level, value) — explode the arrays, then
    re-compact over sketch-sized data; total weight == total stream
    rows, exactly."""
    from ..operators.kll import _recompact

    flat = shard_rows.select(
        F.explode(F.arrays_zip("levels", "vals")).alias("z")
    ).select(
        F.col("z.levels").alias("level"), F.col("z.vals").alias("value")
    )
    return _recompact(flat, k, [], [])


PS_OUT_SCHEMA = (
    "shard int, keys array<string>, weights array<double>, "
    "priorities array<double>"
)
PS_STATE_SCHEMA = (
    "keys array<string>, weights array<double>, priorities array<double>"
)


def streaming_priority_sample(
    stream_df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    n_shards: int = 4,
    salt: str = "psamp",
) -> DataFrame:
    """Sharded streaming twin of ``operators.sampling.priority_sample``
    (STRING key domain): each shard's GroupState keeps its running
    top-(k+1) rows by (priority desc, key asc) — priorities are the
    same deterministic w/u the batch operator computes, evaluated
    in-plan BEFORE the stateful fold.  One snapshot row per shard per
    epoch (arrays; the update-mode drain keeps latest-per-shard).
    Fold the drained snapshots with ``merge_shard_samples``: the
    global top-(k+1) is contained in the union of per-shard
    top-(k+1)s, so the final sample, tau, and est_weight EQUAL the
    batch operator's over the same rows.  State: O(shards * k).
    Contract (validate upstream): weights > 0 and keys unique — the
    batch twin raises on violations; this stream path filters NULL
    keys and otherwise trusts its input."""
    from ..operators.sampling import _priority

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, weights, priorities = (list(x) for x in state.get)
        else:
            keys, weights, priorities = [], [], []
        for pdf in pdfs:
            keys += [str(v) for v in pdf["_k"]]
            weights += [float(v) for v in pdf["_w"]]
            priorities += [float(v) for v in pdf["_q"]]
        order = sorted(
            range(len(keys)), key=lambda i: (-priorities[i], keys[i])
        )[: k + 1]
        keys = [keys[i] for i in order]
        weights = [weights[i] for i in order]
        priorities = [priorities[i] for i in order]
        state.update((keys, weights, priorities))
        yield pd.DataFrame(
            {
                "shard": [key[0]],
                "keys": [keys],
                "weights": [weights],
                "priorities": [priorities],
            }
        )

    sharded = _with_shard(stream_df, key_col, n_shards, salt).select(
        "_shard",
        F.col(key_col).cast("string").alias("_k"),
        F.col(weight_col).cast("double").alias("_w"),
        _priority(weight_col, key_col, salt).alias("_q"),
    )
    return sharded.groupBy("_shard").applyInPandasWithState(
        update,
        outputStructType=PS_OUT_SCHEMA,
        stateStructType=PS_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def merge_shard_samples(shard_rows: DataFrame, k: int) -> DataFrame:
    """Batch-side fold of drained shard snapshots into the global
    priority sample: explode, global top-(k+1) (TakeOrdered over
    O(shards*k) rows), tau from the (k+1)-th, est_weight = max(w, tau)
    — identical to the batch operator's output columns (string key)."""
    from pyspark.sql import Window

    flat = shard_rows.select(
        F.explode(F.arrays_zip("keys", "weights", "priorities")).alias("z")
    ).select(
        F.col("z.keys").alias("key"),
        F.col("z.weights").alias("weight"),
        F.col("z.priorities").alias("priority"),
    )
    head = flat.orderBy(F.col("priority").desc(), F.col("key").asc()).limit(
        k + 1
    )
    w = Window.partitionBy(F.lit(1))
    w_rn = Window.orderBy(F.col("priority").desc(), F.col("key").asc())
    tau = F.max(
        F.when(F.col("_rn") == k + 1, F.col("priority"))
    ).over(w)
    return (
        head.withColumn("_rn", F.row_number().over(w_rn))
        .withColumn("tau", F.coalesce(tau, F.lit(0.0)))
        .filter(F.col("_rn") <= k)
        .withColumn(
            "est_weight", F.greatest(F.col("weight"), F.col("tau"))
        )
        .drop("_rn")
    )


def streaming_bloom_build(
    stream_df: DataFrame,
    key_col: str,
    m_bits: int,
    n_hashes: int,
    salt: str = "bloom",
) -> DataFrame:
    """Streaming twin of ``operators.bloom.bloom_build`` — and the
    one sketch twin that needs NO custom state handler: explode each
    key to its (word, mask) pairs, a stateful dropDuplicates whose
    state is BOUNDED BY THE FILTER ITSELF (at most m distinct
    (word, mask) pairs, regardless of stream length), then an
    update-mode SUM per word.  The drained latest-per-word changelog
    IS the batch filter bit-for-bit; union per-epoch filters with
    ``operators.bloom.bloom_union``."""
    from ..operators.bloom import BLOOM_WORD_BITS, _checked_key, _positions

    pos = F.explode(
        _positions(_checked_key(key_col), m_bits, n_hashes, salt)
    ).alias("pos")
    exploded = stream_df.select(pos)
    word = (
        (F.col("pos") - F.col("pos") % BLOOM_WORD_BITS) / BLOOM_WORD_BITS
    ).cast("int")
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD_BITS} AS INT))"
    )
    return (
        exploded.select(word.alias("word"), mask.alias("mask"))
        .dropDuplicates(["word", "mask"])
        .groupBy("word")
        .agg(F.sum("mask").alias("bits"))
    )


WMG_OUT_SCHEMA = "shard int, key string, lower_bound double"
WMG_STATE_SCHEMA = "keys array<string>, sums array<double>"


def streaming_weighted_mg_candidates(
    stream_df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = 64,
    n_shards: int = 8,
    salt: str = "wmg",
) -> DataFrame:
    """Weighted twin of ``streaming_mg_candidates``: per-shard MG over
    WEIGHT SUMS (bytes / spend / tokens), so a key with total weight
    > W/(k+1) is guaranteed in the drained candidates — feed them to
    ``operators.heavy.weighted_heavy_hitters``' recount (or call
    exact_recount-style SQL) against the accumulated table for the
    exact weighted heavy-hitter set.  Weights must be >= 0 (validate
    upstream; the batch operator raises)."""

    def update(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            keys, sums = state.get
            counters = dict(zip(keys, (float(c) for c in sums)))
        else:
            counters = {}
        for pdf in pdfs:
            sums_b = pdf.groupby("_k", sort=False)["_w"].sum()
            for kk, c in sums_b.items():
                counters[kk] = counters.get(kk, 0.0) + float(c)
            counters = _mg_reduce(counters, k)
        state.update((list(counters.keys()), list(counters.values())))
        yield pd.DataFrame(
            {
                "shard": [key[0]] * len(counters),
                "key": list(counters.keys()),
                "lower_bound": list(counters.values()),
            }
        )

    sharded = _with_shard(stream_df, key_col, n_shards, salt).select(
        "_shard",
        F.col(key_col).cast("string").alias("_k"),
        F.col(weight_col).cast("double").alias("_w"),
    )
    return sharded.groupBy("_shard").applyInPandasWithState(
        update,
        outputStructType=WMG_OUT_SCHEMA,
        stateStructType=WMG_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
