"""K-minimum-values (KMV) distinct sketches with exact multiset
algebra — union, Jaccard, and intersection estimation (Bar-Yossef et
al. RANDOM'02 for the bottom-k estimator; Beyer, Haas, Reinwald,
Sismanis & Gemulla, SIGMOD'07, "On Synopses for Distinct Value
Estimation Under Multiset Operations" for the unbiased (k-1)/U_k
estimator and the KMV closure under union/intersection).

Why it matters at 100 TB: an exact COUNT(DISTINCT key) shuffles every
distinct key; an HLL answers only cardinality and its register bytes
are engine-opaque (the repo's ``approx_distinct_users`` is rows-only
for exactly that reason).  A KMV sketch is just the k smallest
DISTINCT hash values — a tiny sorted integer array that

- merges losslessly: kmv(A) union-merged with kmv(B) IS kmv(A ∪ B),
  bit-for-bit (min-k of a union = min-k of the union of min-k's), so
  per-partition / per-day / per-source sketches roll up freely;
- supports set algebra no HLL offers: the k smallest hashes of the
  union form a uniform sample of A ∪ B, so the fraction also present
  in BOTH sketches estimates Jaccard, and jaccard * |A ∪ B| estimates
  the intersection (Beyer et al. §4);
- is FULLY deterministic here: the "random" hash is the first 13 hex
  digits of md5(salt:key) — a 52-bit integer any engine reproduces,
  so sketches, unions, and every estimate hash-match an ANSI oracle
  exactly (the repo-wide md5 convention; contrast HLL's opaque bytes).

Estimator: with U_k = h_k / 2^52 the k-th smallest normalized hash,
distinct ≈ (k-1) / U_k, unbiased with relative std-error ~ 1/sqrt(k-2)
(Beyer et al. Theorem 2).  When a group holds fewer than k distinct
hashes the sketch IS the distinct set and the estimate is exact.

Scale shape: the build is one distinct-aggregation shuffle on
(group, hash) — map-side combined, moving distinct pairs, never rows —
then a per-group top-k.  The global (ungrouped) path compiles to
TakeOrderedAndProject (per-partition top-k, merged on the driver):
no single task ever sees more than k rows per input partition.  The
grouped path ranks inside a window partitioned by the group key; skew
is bounded by the busiest group's DISTINCT-hash count, and every
downstream operation (union, overlap, estimate) touches only k-length
arrays.

The reference engine's only distinct-count is an exact in-memory set
(/root/reference/src/aggregator/price_aggregator.py:35-51); this is
the bounded-memory, mergeable scale path for the same question.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

KMV_BITS = 52
KMV_SPACE = 2**KMV_BITS  # hash domain [0, 2^52)
KMV_K = 64


def kmv_hash(key: Column, salt: str = "kmv") -> Column:
    """52-bit deterministic hash: first 13 hex digits of
    md5('<salt>:' || key) as a BIGINT in [0, 2^52) — reproducible in
    any engine via 13-digit hex expansion (the repo md5 convention)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), key.cast("string"))), 1, 13
            ),
            16,
            10,
        )
        .cast("long")
    )


def kmv_sketch(
    df: DataFrame,
    key_col: str,
    k: int = KMV_K,
    by: list[str] | None = None,
    salt: str = "kmv",
) -> DataFrame:
    """Build per-group KMV sketches: one row per group with

    - ``hashes``: the k smallest DISTINCT 52-bit hashes, sorted asc;
    - ``n_kept``: len(hashes) (< k ⇔ the group's full distinct set).

    NULL keys are excluded (COUNT(DISTINCT key) semantics).  Groups
    with zero non-NULL keys produce no row, exactly like GROUP BY.
    """
    if k < 2:
        raise ValueError(f"kmv_sketch needs k >= 2, got {k}")
    by = list(by or [])
    h = kmv_hash(F.col(key_col), salt)
    distinct = (
        df.filter(F.col(key_col).isNotNull())
        .select(*by, h.alias("h"))
        .distinct()
    )
    if by:
        w = Window.partitionBy(*by).orderBy("h")
        kept = distinct.withColumn("rn", F.row_number().over(w)).filter(
            F.col("rn") <= k
        )
        return kept.groupBy(*by).agg(
            F.array_sort(F.collect_list("h")).alias("hashes"),
            F.count("*").cast("int").alias("n_kept"),
        )
    # Global: orderBy+limit compiles to TakeOrderedAndProject — the
    # scalable two-level top-k (per-partition heads merged on driver).
    kept = distinct.orderBy("h").limit(k)
    return kept.agg(
        F.array_sort(F.collect_list("h")).alias("hashes"),
        F.count("*").cast("int").alias("n_kept"),
    )


def _estimate_expr(k: int) -> Column:
    """Distinct estimate from (hashes, n_kept): exact count when the
    sketch is unsaturated, else the unbiased (k-1) * 2^52 / h_k.  One
    IEEE division — both engines produce the identical double."""
    h_k = F.element_at("hashes", k).cast("double")
    return F.when(
        F.col("n_kept") < k, F.col("n_kept").cast("double")
    ).otherwise(F.lit(float(k - 1) * KMV_SPACE) / h_k)


def kmv_estimate(sketch: DataFrame, k: int = KMV_K) -> DataFrame:
    """Append ``est_distinct`` to a sketch frame (exact when
    ``n_kept < k``)."""
    return sketch.withColumn("est_distinct", _estimate_expr(k))


def _merge_arrays(a: Column, b: Column, k: int) -> Column:
    """k smallest distinct hashes of two sketch arrays (NULL-safe:
    a missing side is the empty set)."""
    both = F.concat(
        F.coalesce(a, F.array().cast("array<bigint>")),
        F.coalesce(b, F.array().cast("array<bigint>")),
    )
    return F.slice(F.array_sort(F.array_distinct(both)), 1, k)


def kmv_union(
    a: DataFrame, b: DataFrame, k: int = KMV_K, by: list[str] | None = None
) -> DataFrame:
    """Merge two sketch frames group-wise: the result is EXACTLY the
    sketch of the concatenated inputs (min-k closure under union), so
    per-source / per-day sketches roll up with zero information loss
    relative to re-sketching.  Full-outer on the group key; a group
    present on one side passes through unchanged."""
    by = list(by or [])
    ar = a.select(*by, F.col("hashes").alias("_ha"))
    br = b.select(*by, F.col("hashes").alias("_hb"))
    if by:
        joined = ar.join(br, on=by, how="full_outer")
    else:
        joined = ar.crossJoin(br)
    merged = _merge_arrays(F.col("_ha"), F.col("_hb"), k)
    return joined.select(
        *by,
        merged.alias("hashes"),
        F.size(merged).alias("n_kept"),
    )


def kmv_overlap(
    a: DataFrame, b: DataFrame, k: int = KMV_K, by: list[str] | None = None
) -> DataFrame:
    """Jaccard + intersection estimates between two sketch frames
    (Beyer et al. SIGMOD'07 §4): the k smallest hashes of the UNION
    are a uniform sample of A ∪ B; the fraction present in both input
    sketches estimates J(A,B); intersection ≈ J * est|A ∪ B|.

    Returns per group: ``n_union_kept``, ``n_match``, ``jaccard_est``,
    ``est_union``, ``est_intersection``, plus the set DIFFERENCES
    ``est_only_a`` / ``est_only_b`` (the union's k-min sample split
    three ways: in-both / only-A / only-B, each fraction scaled by the
    union estimate — the full Beyer et al. multiset algebra).  Inner
    join on the group key (overlap with an absent group is vacuous).
    All arithmetic is integer counts plus single IEEE
    divisions/multiplies — exact oracle parity."""
    by = list(by or [])
    ar = a.select(*by, F.col("hashes").alias("_ha"))
    br = b.select(*by, F.col("hashes").alias("_hb"))
    joined = ar.join(br, on=by, how="inner") if by else ar.crossJoin(br)
    union_arr = _merge_arrays(F.col("_ha"), F.col("_hb"), k)
    stats = joined.select(
        *by,
        union_arr.alias("hashes"),
        F.size(union_arr).alias("n_kept"),
        F.size(
            F.array_intersect(
                F.array_intersect(union_arr, F.col("_ha")), F.col("_hb")
            )
        ).alias("n_match"),
        F.size(F.array_intersect(union_arr, F.col("_ha"))).alias("n_in_a"),
        F.size(F.array_intersect(union_arr, F.col("_hb"))).alias("n_in_b"),
    )
    kept_d = F.col("n_kept").cast("double")
    jac = F.col("n_match").cast("double") / kept_d
    est_union = _estimate_expr(k)
    only_a = (F.col("n_in_a") - F.col("n_match")).cast("double") / kept_d
    only_b = (F.col("n_in_b") - F.col("n_match")).cast("double") / kept_d
    return stats.select(
        *by,
        F.col("n_kept").alias("n_union_kept"),
        "n_match",
        jac.alias("jaccard_est"),
        est_union.alias("est_union"),
        (jac * est_union).alias("est_intersection"),
        (only_a * est_union).alias("est_only_a"),
        (only_b * est_union).alias("est_only_b"),
    )
