"""Priority sampling — fixed-size weighted sampling WITHOUT
replacement with unbiased subset-sum estimation (Duffield, Lund &
Thorup, JACM 54(6) 2007, "Priority sampling for estimation of
arbitrary subset sums"; near-optimal per Szegedy STOC'06).

Why it matters at 100 TB: you cannot eyeball, label, or re-process
100 TB — you work on a sample.  Uniform sampling wastes the budget on
the long tail when rows carry wildly different weights (bytes, spend,
token counts); weight-proportional schemes with replacement duplicate
the head.  Priority sampling keeps EXACTLY k rows, over-represents
heavy rows, and still answers ANY downstream "what is the total W of
subset S?" question unbiasedly from the sample alone:

- priority  q_i = w_i / u_i  with u_i uniform in (0,1];
- keep the k highest-priority rows; let tau = the (k+1)-th priority;
- estimate  ŵ_i = max(w_i, tau)  for kept rows, 0 otherwise.
  Then E[Σ_{i∈S} ŵ_i · [i kept]] = Σ_{i∈S} w_i for every fixed S
  (Duffield et al. Theorem 1), and Var is near-optimal.

Determinism (the repo md5 convention): u_i = (h52(salt:key)+1) / 2^52
— the numerator is an exact 52-bit integer + 1 and the denominator a
power of two, so u_i is an EXACT double, and q_i = w_i / u_i is ONE
correctly-rounded IEEE division both engines reproduce bit-for-bit.
Selection order (q desc, key asc) is therefore identical in Spark and
ANSI SQL: the whole sample, tau included, hash-matches a DuckDB
oracle exactly.  No transcendental (the exp/log of A-ES/A-Res
reservoir keys would differ in the last ulp across engines).

Scale shape: the global path is orderBy(q desc).limit(k+1) — Spark
compiles TakeOrderedAndProject (per-partition top-(k+1) heaps merged
on the driver): map-only over the data, k+1 rows per partition moved.
The grouped path window-ranks within the group key — one shuffle on
that key, skew bounded by the busiest group.  tau is derived from the
same (k+1) head rows, not a second scan.

The reference has no sampling surface (it forwards every record:
/root/reference/src/consumer/order_consumer.py); this is the
operation its pipeline needs first at data-lake scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .kmv import KMV_SPACE, kmv_hash

_PS_SALT = "psamp"


def _priority(weight_col: str, key_col: str, salt: str) -> Column:
    """q = w / u with u = (h52(key)+1)/2^52, exact per the module
    contract.  Requires w > 0 (validated by the caller)."""
    u = (kmv_hash(F.col(key_col), salt) + F.lit(1)).cast("double") / F.lit(
        float(KMV_SPACE)
    )
    return F.col(weight_col).cast("double") / u


def priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int,
    by: list[str] | None = None,
    salt: str = _PS_SALT,
) -> DataFrame:
    """Priority sample of k rows (per group when ``by`` is given).

    Returns the input columns plus:

    - ``priority``: q_i = w_i / u_i (the selection key);
    - ``tau``: the group's (k+1)-th priority (0.0 when the group has
      <= k rows — every row kept, estimates exact);
    - ``est_weight``: max(w_i, tau), the unbiased per-row estimator —
      Σ est_weight over any predicate on the sample estimates that
      predicate's true total weight.

    Contracts: ``weight_col`` must be > 0 and non-NULL and ``key_col``
    non-NULL — rejected loudly, in the same pass, via in-plan
    ``raise_error`` (lazy: the ACTION raises).  ``key_col`` must also
    be UNIQUE per group (it seeds u_i; a duplicate key replays a
    uniform draw, correlating inclusion decisions).  Uniqueness is NOT
    verified globally — that would cost the key-space shuffle this
    operator exists to avoid — but any duplicate that reaches the
    selected head (where it would actually distort tau / est_weight)
    raises; duplicates outside the head stay the caller's contract.
    """
    if k < 1:
        raise ValueError(f"priority_sample needs k >= 1, got {k}")
    by = list(by or [])
    bad_w = (
        F.col(weight_col).isNull()
        | F.isnan(F.col(weight_col).cast("double"))
        | (F.col(weight_col) <= 0)
    )
    bad_k = F.col(key_col).isNull()
    checked = F.when(
        bad_w | bad_k,
        F.raise_error(
            F.concat(
                F.lit(
                    f"priority_sample: NULL {key_col} or non-positive "
                    f"{weight_col} at key="
                ),
                F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")),
            )
        ).cast("double"),
    ).otherwise(_priority(weight_col, key_col, salt))
    scored = df.withColumn("priority", checked)

    if by:
        w_rank = Window.partitionBy(*by).orderBy(
            F.col("priority").desc(), F.col(key_col).asc()
        )
        head = scored.withColumn("_rn", F.row_number().over(w_rank)).filter(
            F.col("_rn") <= k + 1
        )
        w_tau = Window.partitionBy(*by)
    else:
        head = (
            scored.orderBy(F.col("priority").desc(), F.col(key_col).asc())
            .limit(k + 1)
            .withColumn(
                "_rn",
                F.row_number().over(
                    Window.orderBy(
                        F.col("priority").desc(), F.col(key_col).asc()
                    )
                ),
            )
        )
        w_tau = Window.partitionBy(F.lit(1))
    # tau = the (k+1)-th priority if the group reached k+1 rows else 0.
    tau = F.max(F.when(F.col("_rn") == k + 1, F.col("priority"))).over(w_tau)
    # duplicate-key detection over the SELECTED head only (tiny):
    # a replayed key inside the head would distort tau/est_weight.
    w_dup = (
        Window.partitionBy(*by, key_col) if by
        else Window.partitionBy(key_col)
    )
    dup_ct = F.count("*").over(w_dup)
    return (
        head.withColumn("tau", F.coalesce(tau, F.lit(0.0)))
        .withColumn(
            "tau",
            F.when(
                dup_ct > 1,
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"priority_sample: duplicate {key_col} in the "
                            "selected head: "
                        ),
                        F.col(key_col).cast("string"),
                    )
                ).cast("double"),
            ).otherwise(F.col("tau")),
        )
        .filter(F.col("_rn") <= k)
        .withColumn(
            "est_weight",
            F.greatest(F.col(weight_col).cast("double"), F.col("tau")),
        )
        .drop("_rn")
    )


def subset_sum_estimate(
    sample: DataFrame, predicate: Column, by: list[str] | None = None
) -> DataFrame:
    """Σ est_weight over the sampled rows matching ``predicate`` — the
    Duffield-Lund-Thorup unbiased estimate of the predicate's true
    total weight, computed from the k-row sample alone."""
    by = list(by or [])
    filtered = sample.filter(predicate)
    agg = F.sum("est_weight").alias("est_total_weight")
    return filtered.groupBy(*by).agg(agg) if by else filtered.agg(agg)


# ---------------------------------------------------------------------------
# Stratified sampling: Neyman allocation + per-stratum priority samples
# (Neyman 1934 "On the two different aspects of the representative
# method": optimal fixed-budget allocation n_h ∝ N_h·σ_h; quota
# rounding by the largest-remainder method, which is deterministic
# and preserves the total exactly).
# ---------------------------------------------------------------------------

NEYMAN_SCALE_BITS = 20


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    n_total: int,
    scale_bits: int = NEYMAN_SCALE_BITS,
) -> list[tuple]:
    """Driver-side Neyman allocation: [(stratum, N_h, k_h)] with
    Σ k_h == min(n_total, Σ min(N_h, ...)) by largest remainder.

    Exactness discipline (the abtest.py idiom): values quantize ONCE
    per row as floor(v·2^s + 0.5); per-stratum moments are
    DECIMAL(38,0)-exact integer sums; σ_h is then ONE fixed-order
    double expression + ONE correctly-rounded sqrt, so the shares —
    and hence the allocation — are bit-reproducible by any engine
    replaying the same expression (suite-pinned against a Python
    replica over DuckDB-fetched moments).  Requires |v| < 2^(44-s)
    (decimal headroom; NULL values and out-of-bound magnitudes raise
    in-plan).  Strata count is assumed driver-small (the allocation
    IS an O(strata) artifact); k_h is capped at N_h and freed budget
    re-apportioned by the same remainder order."""
    if n_total < 1:
        raise ValueError(f"neyman_allocation needs n_total >= 1")
    bound = float(2 ** (44 - scale_bits))
    v = F.col(value_col).cast("double")
    bad = F.col(value_col).isNull() | F.isnan(v) | (F.abs(v) >= bound)
    q = F.when(
        bad,
        F.raise_error(
            F.concat(
                F.lit(
                    f"neyman_allocation: NULL/NaN/|v|>={bound} in "
                    f"{value_col}: "
                ),
                F.coalesce(v.cast("string"), F.lit("NULL")),
            )
        ).cast("double"),
    ).otherwise(F.floor(v * F.lit(float(2**scale_bits)) + F.lit(0.5)))
    mo = (
        df.select(F.col(stratum_col).alias("_g"), q.alias("_q"))
        .groupBy("_g")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("_q").cast("decimal(38,0)")).alias("s1"),
            F.sum(
                (F.col("_q").cast("decimal(38,0)")
                 * F.col("_q").cast("decimal(38,0)"))
            ).alias("s2"),
        )
        .collect()
    )
    strata = sorted(mo, key=lambda r: str(r["_g"]))
    shares = []
    for r in strata:
        n_h = int(r["n"])
        if n_h < 2:
            sigma = 0.0
        else:
            # fixed expression order: (n*s2 - s1*s1) exact decimal ->
            # double; two divisions; one sqrt (all correctly rounded)
            num = float(int(r["n"]) * int(r["s2"]) - int(r["s1"]) ** 2)
            sigma = (
                num / (float(n_h) * float(n_h))
            ) ** 0.5 / float(2**scale_bits)
        shares.append((r["_g"], n_h, float(n_h) * sigma))
    total_share = sum(s for _, _, s in shares)
    if total_share == 0.0:
        # all-constant strata: fall back to proportional allocation
        shares = [(g, n_h, float(n_h)) for g, n_h, _ in shares]
        total_share = sum(s for _, _, s in shares)
    # largest-remainder apportionment, capped at N_h, deterministic
    quotas = [
        (g, n_h, n_total * s / total_share) for g, n_h, s in shares
    ]
    base = [(g, n_h, min(int(qt), n_h), qt - int(qt)) for g, n_h, qt in quotas]
    k = {g: b for g, _, b, _ in base}
    left = n_total - sum(k.values())
    # hand out the remainder: biggest fractional part first, then
    # stratum id — skip strata already at capacity N_h
    order = sorted(base, key=lambda t: (-t[3], str(t[0])))
    i = 0
    while left > 0 and any(k[g] < n_h for g, n_h, _, _ in base):
        g, n_h, _, _ = order[i % len(order)]
        if k[g] < n_h:
            k[g] += 1
            left -= 1
        i += 1
    return [(g, n_h, k[g]) for g, n_h, _, _ in base]


def stratified_priority_sample(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    stratum_col: str,
    allocation: list[tuple],
    salt: str = _PS_SALT,
) -> DataFrame:
    """Priority-sample k_h rows inside each stratum per a
    driver-computed allocation (e.g. ``neyman_allocation``'s).  One
    window rank per stratum against a broadcast allocation table;
    per-stratum tau and est_weight exactly as the flat operator, so
    Σ est_weight per stratum estimates that stratum's weight total.
    Strata absent from the allocation are dropped (they were not
    budgeted)."""
    if not allocation:
        raise ValueError("stratified_priority_sample: empty allocation")
    spark = df.sparkSession
    # build via Rows so the stratum keeps its native dtype
    from pyspark.sql import Row as _Row

    alloc = spark.createDataFrame(
        [_Row(**{stratum_col: g, "_k": int(kh)}) for g, _, kh in allocation]
    )
    scored = df.withColumn(
        "priority", _priority(weight_col, key_col, salt)
    ).join(F.broadcast(alloc), on=stratum_col, how="inner")
    w_rank = Window.partitionBy(stratum_col).orderBy(
        F.col("priority").desc(), F.col(key_col).asc()
    )
    head = scored.withColumn("_rn", F.row_number().over(w_rank)).filter(
        F.col("_rn") <= F.col("_k") + 1
    )
    w_tau = Window.partitionBy(stratum_col)
    tau = F.max(
        F.when(F.col("_rn") == F.col("_k") + 1, F.col("priority"))
    ).over(w_tau)
    return (
        head.withColumn("tau", F.coalesce(tau, F.lit(0.0)))
        .filter(F.col("_rn") <= F.col("_k"))
        .withColumn(
            "est_weight",
            F.greatest(F.col(weight_col).cast("double"), F.col("tau")),
        )
        .drop("_rn", "_k")
    )


def uniform_sample(
    df: DataFrame,
    key_col: str,
    k: int,
    by: list[str] | None = None,
    salt: str = _PS_SALT,
) -> DataFrame:
    """Deterministic UNIFORM k-row sample (per group with ``by``):
    priority sampling with unit weights degenerates to keeping the k
    smallest key hashes — every subset of equal size is equally
    likely under the md5-uniform u_i, reruns/repartitionings return
    the SAME rows, and est_weight sums estimate subset COUNTS (each
    kept row stands for ~n/k rows).  One TakeOrdered / window pass,
    same scale shape as ``priority_sample``."""
    return priority_sample(
        df.withColumn("_unit_w", F.lit(1.0)),
        key_col,
        "_unit_w",
        k,
        by=by,
        salt=salt,
    ).drop("_unit_w")
