"""Bloom filters as relational artifacts — mergeable membership
sketches built, unioned, and probed with plain DataFrame operations
(Bloom, CACM 1970, "Space/time trade-offs in hash coding with
allowable errors"; FPR analysis per Broder & Mitzenmacher, Internet
Math. 2004).

Why it matters at 100 TB: "have we EVER seen this key?" is the ingest
pre-filter question — dedup against all history, join pruning against
a huge build side, replay suppression.  An exact answer needs the full
key set; a Bloom filter answers "definitely new" / "maybe seen" in a
FIXED m-bit array with false-positive rate ~(1 - e^{-kn/m})^k and NO
false negatives — so the expensive exact path runs only on the "maybe"
sliver.  Spark's own runtime bloom pruning (the repo's
``runtime_filtered_join``) is planner-internal and per-query; THIS
filter is a first-class, persistable, mergeable table:

- ``bloom_build``: one map-side-combinable aggregation.  Each key
  sets ``n_hashes`` bit positions h52("<j>:<key>") % m (the repo md5
  convention); positions fold into 32-bit words via SUM over distinct
  per-word masks — the sketch IS a groupBy, so partials combine
  map-side and the result is O(m/32) rows regardless of input size.
- ``bloom_union``: per-word bitwise OR of two filter frames — per-day
  / per-source filters roll up losslessly (the OR of Blooms over the
  SAME (m, k, salt) is exactly the Bloom of the union).
- ``bloom_might_contain``: probe by broadcast-joining the tiny word
  table against the queries' (word, mask) expansion; a key is "maybe"
  iff EVERY probed word covers its mask.  No shuffle of the probe
  side beyond the mask expansion.

Everything is integer/md5 arithmetic — builds, unions, and probe
verdicts hash-match an ANSI oracle exactly.  NULL keys are rejected
loudly in-plan (a NULL would silently probe nothing).

Parameter guidance (Broder & Mitzenmacher): for target FPR p and n
keys, m ≈ -n·ln p / (ln 2)^2 and k ≈ (m/n)·ln 2.

The reference dedups nothing (every record forwarded:
/root/reference/src/consumer/order_consumer.py); this is the
bounded-memory "seen before?" gate its ingest needs first at
web scale.  Complements the content-level MinHash index
(streaming/incremental_dedup.py) with an exact-key-level gate.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .kmv import kmv_hash

BLOOM_WORD_BITS = 32  # 1 << bit stays well inside a signed 64-bit long


def bloom_params(n_keys: int, target_fpr: float) -> tuple[int, int]:
    """(m_bits, n_hashes) for ``n_keys`` at ``target_fpr`` — the
    standard optimum m = -n ln p / ln2^2, k = (m/n) ln 2, both
    rounded up / to at least 1."""
    if n_keys < 1 or not (0.0 < target_fpr < 1.0):
        raise ValueError(
            f"bloom_params needs n_keys >= 1 and 0 < fpr < 1, got "
            f"({n_keys}, {target_fpr})"
        )
    m = math.ceil(-n_keys * math.log(target_fpr) / (math.log(2) ** 2))
    k = max(1, round(m / n_keys * math.log(2)))
    return m, k


def _checked_key(key_col: str) -> Column:
    return F.when(
        F.col(key_col).isNull(),
        F.raise_error(F.lit(f"bloom: NULL {key_col} rejected")).cast(
            "string"
        ),
    ).otherwise(F.col(key_col).cast("string"))


def _positions(key: Column, m_bits: int, n_hashes: int, salt: str):
    """Array of n_hashes bit positions in [0, m_bits)."""
    return F.array(
        *[
            kmv_hash(F.concat(F.lit(f"{j}:"), key), salt) % m_bits
            for j in range(n_hashes)
        ]
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    m_bits: int,
    n_hashes: int,
    salt: str = "bloom",
) -> DataFrame:
    """(word INT, bits BIGINT) — the m-bit array as ceil(m/32) 32-bit
    words (absent word rows mean 0).  ONE aggregation: keys explode to
    (word, single-bit mask) pairs, distinct masks per word OR together
    via SUM over DISTINCT masks (each distinct mask is a distinct
    power of two, so their sum IS their OR — and SUM, unlike a bit_or
    builtin, is portably exact in any engine)."""
    if m_bits < BLOOM_WORD_BITS or n_hashes < 1:
        raise ValueError(
            f"bloom_build needs m_bits >= {BLOOM_WORD_BITS} and "
            f"n_hashes >= 1, got ({m_bits}, {n_hashes})"
        )
    pos = F.explode(
        _positions(_checked_key(key_col), m_bits, n_hashes, salt)
    ).alias("pos")
    exploded = df.select(pos)
    word = (
        (F.col("pos") - F.col("pos") % BLOOM_WORD_BITS)
        / BLOOM_WORD_BITS
    ).cast("int")
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(pos % {BLOOM_WORD_BITS} AS INT))"
    )
    return (
        exploded.select(word.alias("word"), mask.alias("mask"))
        .distinct()
        .groupBy("word")
        .agg(F.sum("mask").alias("bits"))
    )


def bloom_union(a: DataFrame, b: DataFrame) -> DataFrame:
    """Per-word OR of two filters over the SAME (m, k, salt): the
    exact filter of the concatenated key sets.  OR computed as
    a + b - (a & b) on the word's bigint (portable; words are < 2^32)."""
    ar = a.select(F.col("word"), F.col("bits").alias("_ba"))
    br = b.select(F.col("word"), F.col("bits").alias("_bb"))
    joined = ar.join(br, on="word", how="full_outer").select(
        "word",
        F.coalesce(F.col("_ba"), F.lit(0)).alias("_ba"),
        F.coalesce(F.col("_bb"), F.lit(0)).alias("_bb"),
    )
    orred = (
        F.col("_ba") + F.col("_bb")
        - F.col("_ba").bitwiseAND(F.col("_bb"))
    )
    return joined.select("word", orred.alias("bits"))


def bloom_might_contain(
    df: DataFrame,
    bloom: DataFrame,
    key_col: str,
    m_bits: int,
    n_hashes: int,
    salt: str = "bloom",
) -> DataFrame:
    """Append ``might_contain`` (boolean): true iff EVERY of the key's
    n_hashes bits is set — no false negatives; false positives at the
    filter's FPR.  The probe expands each row to its n_hashes (word,
    mask) pairs, broadcast-joins the word table, and folds with
    bool_and — one narrow pass over the probe side, the filter ships
    as a broadcast.  The verdict is a function of the KEY alone, so it
    computes once per DISTINCT key and joins back — duplicate probe
    rows keep their multiplicity."""
    keys = df.select(key_col).distinct()
    probes = keys.withColumn(
        "_pos",
        F.explode(_positions(_checked_key(key_col), m_bits, n_hashes, salt)),
    )
    word = (
        (F.col("_pos") - F.col("_pos") % BLOOM_WORD_BITS)
        / BLOOM_WORD_BITS
    ).cast("int")
    mask = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST(_pos % {BLOOM_WORD_BITS} AS INT))"
    )
    expanded = probes.withColumn("_word", word).withColumn("_mask", mask)
    verdicts = (
        expanded.join(
            F.broadcast(bloom.withColumnRenamed("word", "_word")),
            on="_word",
            how="left",
        )
        .withColumn(
            "_hit",
            F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("_mask"))
            == F.col("_mask"),
        )
        .groupBy(key_col)
        .agg(F.bool_and("_hit").alias("might_contain"))
    )
    return df.join(verdicts, on=key_col, how="inner")


def bloom_fill_stats(
    bloom: DataFrame, m_bits: int, n_hashes: int
) -> DataFrame:
    """One-row health readout computed from the filter alone:
    ``bits_set`` (exact popcount over the word table), ``fill_ratio``
    (bits_set / m), and ``fpr_observed`` = fill_ratio^k — the actual
    false-positive rate of THIS filter (a probe passes iff its k
    probed bits are all set, and a uniform hash hits a set bit with
    probability fill_ratio).  Integer popcount + two fixed-order
    float ops: exact oracle parity.  Use it to decide when a rolling
    filter needs rotation (fpr_observed drifting past budget)."""
    agg = bloom.agg(
        F.coalesce(F.sum(F.bit_count("bits")), F.lit(0))
        .cast("long")
        .alias("bits_set")
    )
    fill = F.col("bits_set").cast("double") / F.lit(float(m_bits))
    return agg.select(
        "bits_set",
        fill.alias("fill_ratio"),
        F.pow(fill, F.lit(float(n_hashes))).alias("fpr_observed"),
    )
