"""Count-min sketch — sublinear frequency estimation (Cormode &
Muthukrishnan '05) as a distributed aggregation.

Why it matters at 100 TB: exact per-key counts of a high-cardinality
column need a shuffle keyed by that column (state linear in the number
of distinct keys); the CMS is a FIXED d x w integer grid whose cells
are plain sums — associative and mergeable, so map-side partials
combine freely, executors each fold their partitions into a local grid,
and the merged sketch answers any point-frequency query with
 est >= exact  and  est <= exact + eps * N  (w = ceil(e/eps), with
probability 1 - delta, d = ceil(ln 1/delta)).  The same grid is the
standard building block for heavy-hitter detection over streams (the
reference's per-product counters, at cardinalities where exact state
no longer fits).

Determinism: bucket hashes are the first two hex digits of
md5("cms<depth>:<key>") — integer arithmetic reproducible in any
engine (the repo-wide md5 convention), and every cell value is an
integer sum, so sketches and estimates hash-match an ANSI oracle
exactly.

The reference engine keeps exact dict counters
(/root/reference/src/aggregator/price_aggregator.py:35-51); this is
the bounded-memory scale path for the same ask.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CMS_DEPTH = 4
CMS_WIDTH = 256  # first two md5 hex digits: exactly [0, 256)


def _bucket(key_col: str, depth: int):
    """Bucket of `key_col` in row `depth`: first two hex digits of
    md5('cms<depth>:'||key) as an int in [0, 256)."""
    return (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(f"cms{depth}:"), F.col(key_col).cast("string")
                    )
                ),
                1,
                2,
            ),
            16,
            10,
        )
        .cast("int")
    )


# ---------------------------------------------------------------------------
# Fixed-width histogram quantiles — the transparent mergeable quantile
# sketch: where percentile_approx's KLL sketch bytes are engine-opaque
# (rows-only check), an integer-cents histogram is a plain keyed count
# — associative, map-side-combinable, mergeable across streams/days,
# O(value_range / width) state — and its interpolated quantile
# estimates are deterministic double arithmetic both engines reproduce
# bit-for-bit.  Error bound: an estimate is within one bucket width of
# the exact quantile by construction.
# ---------------------------------------------------------------------------

HIST_WIDTH_CENTS = 100  # $1 buckets


def histogram_build(
    df: DataFrame, value_col: str, width_cents: int = HIST_WIDTH_CENTS
) -> DataFrame:
    """(bucket, cnt) histogram over NON-NEGATIVE 2-dp money values:
    cents via exact DECIMAL(18,2) (the repo-wide money convention),
    bucket = cents div width.  A plain count aggregation — the whole
    point: the sketch IS a groupBy, so it inherits every scale
    property aggregation has (partial combine, streaming state,
    mergeability)."""
    cents = F.expr(
        f"CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
    )
    bucket = F.expr(
        f"CAST((CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
        f" - (CAST(CAST({value_col} AS DECIMAL(18,2)) * 100 AS BIGINT)"
        f" % {width_cents})) / {width_cents} AS BIGINT)"
    )
    return (
        df.filter(cents >= 0)
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt"))
    )


def histogram_quantiles(
    hist: DataFrame,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    width_cents: int = HIST_WIDTH_CENTS,
) -> DataFrame:
    """Interpolated quantile estimates from a histogram: rank
    r = ceil(q*N); the answering bucket is the first whose cumulative
    count reaches r; the estimate interpolates linearly inside it.
    The histogram is tiny (bounded by value range / width), so the
    global cumulative window is a single-task pass over sketch rows —
    never over data rows."""
    from pyspark.sql import Window

    spark = hist.sparkSession
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.select(
        "bucket",
        "cnt",
        F.sum("cnt").over(w).alias("cum"),
        F.sum("cnt").over(Window.partitionBy()).alias("n_total"),
    )
    qs = spark.createDataFrame([(q,) for q in quantiles], "quantile double")
    hit = (
        cum.crossJoin(F.broadcast(qs))
        .withColumn("r", F.ceil(F.col("quantile") * F.col("n_total")).cast("long"))
        .filter(F.col("cum") >= F.col("r"))
    )
    first = Window.partitionBy("quantile").orderBy("bucket")
    return (
        hit.withColumn("rn", F.row_number().over(first))
        .filter(F.col("rn") == 1)
        .select(
            "quantile",
            (
                (
                    (F.col("bucket") * width_cents).cast("double")
                    + (
                        (F.col("r") - (F.col("cum") - F.col("cnt")))
                        * width_cents
                    ).cast("double")
                    / F.col("cnt").cast("double")
                )
                / F.lit(100.0)
            ).alias("est_value"),
            F.col("n_total"),
        )
    )


# ---------------------------------------------------------------------------
# HyperLogLog from first principles (Flajolet et al. '07) — the
# transparent twin of approx_count_distinct: Spark's HLL++ sketch bytes
# are engine-opaque (its driver row is rows-only by necessity), but the
# algorithm itself is pure integer/bit arithmetic on a deterministic
# hash, so a from-scratch HLL is fully hash-oracle-able.
# ---------------------------------------------------------------------------

HLL_BUCKETS = 256  # b = 8 bucket bits; rse ~ 1.04/sqrt(256) ~ 6.5%
# alpha_m * m^2 as ONE literal (both engines parse the same decimal
# string to the same double, and E = AM2 / S is then a single division)
HLL_ALPHA_M2 = 47072.71267120224  # 0.7213/(1+1.079/256) * 256^2


def hll_registers(df: DataFrame, key_col: str) -> DataFrame:
    """(bucket, M) rows for non-empty registers: bucket = first two md5
    hex digits, M = max over keys of rho(32-bit hash suffix) where rho
    is the 1-based position of the leftmost 1-bit (33 for a zero
    suffix).  MAX is idempotent AND associative — the register table
    merges across partitions, streams, and days, and re-adding the
    same key is a no-op (the property countDistinct lacks)."""
    h = F.md5(F.concat(F.lit("hll:"), F.col(key_col).cast("string")))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("int")
    v = F.conv(F.substring(h, 3, 8), 16, 10).cast("long")
    # length(bin(v)) = floor(log2(v)) + 1 exactly (no leading zeros in
    # either engine) — integer-exact leading-zero count, no libm log2.
    rho = F.when(v == 0, F.lit(33)).otherwise(
        F.lit(33) - F.length(F.bin(v))
    )
    return (
        df.select(bucket.alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").cast("int").alias("M"))
    )


def hll_estimate(registers: DataFrame) -> DataFrame:
    """One-row raw HLL estimate from a register table.  The harmonic
    sum's terms are all exact powers of two spanning < 53 bits, so
    every partial sum is exactly representable and the float SUM is
    order-independent — the rare float aggregation that is safe under
    any shuffle order.  The raw estimate is emitted WITHOUT the
    small-range linear-counting correction (it needs ln(), whose
    libm bits differ across engines); zero_registers is exposed so a
    consumer can apply it, and the accuracy test does exactly that."""
    return registers.agg(
        F.count("*").alias("n_nonempty"),
        F.sum(
            F.lit(1.0) / F.expr("CAST(shiftleft(CAST(1 AS BIGINT), M) AS DOUBLE)")
        ).alias("s_nonempty"),
        F.sum("M").cast("long").alias("register_sum"),
        F.max("M").cast("int").alias("max_register"),
    ).select(
        (F.lit(HLL_BUCKETS) - F.col("n_nonempty")).cast("int").alias("zero_registers"),
        (
            F.lit(HLL_ALPHA_M2)
            / (
                (F.lit(HLL_BUCKETS) - F.col("n_nonempty")).cast("double")
                + F.col("s_nonempty")
            )
        ).alias("hll_raw_estimate"),
        "register_sum",
        "max_register",
    )


def cms_build(df: DataFrame, key_col: str, depth: int = CMS_DEPTH) -> DataFrame:
    """Fold a column into a count-min sketch: (depth, bucket, cnt) rows,
    at most depth * CMS_WIDTH of them regardless of input size.

    One narrow projection (each input row contributes `depth`
    (depth, bucket) pairs via an inline explode) and one keyed sum with
    map-side partials over a key space of d*w values — the shuffle
    moves O(d*w) partial rows per task, not the data."""
    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("depth"), _bucket(key_col, r).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p")
    ).select("p.depth", "p.bucket")
    return pairs.groupBy("depth", "bucket").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame, probes: DataFrame, key_col: str, depth: int = CMS_DEPTH
) -> DataFrame:
    """Point-frequency estimates: for each probe key, min over its
    depth cells.  The sketch is tiny (<= d*w rows) — broadcast it; the
    min is an integer aggregate (order-free)."""
    probe_cells = probes.select(
        F.col(key_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("depth"), _bucket(key_col, r).alias("bucket")
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    ).select(key_col, "p.depth", "p.bucket")
    return (
        probe_cells.join(F.broadcast(sketch), ["depth", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).cast("long").alias("est"))
    )
