"""Distribution-drift detection between a reference table and a new
batch — the monitoring step that decides whether yesterday's model/
pipeline assumptions still hold for today's data.  Implements the
Population Stability Index (PSI), the standard credit-scoring drift
metric (Siddiqi, "Credit Risk Scorecards", 2006): for bucketed
fractions p (reference) and q (current),

    PSI = sum over buckets of (q_b - p_b) * ln(q_b / p_b)

with epsilon-smoothing for empty buckets.  Rule-of-thumb thresholds:
< 0.1 stable, 0.1-0.25 moderate, > 0.25 major drift.

Scale shape: each side is ONE partial+final groupBy on the bucket key
(numeric rows never shuffle raw values — the bucket id is computed
map-side), the two bucket tables (<= n_bins or max_categories + 1
rows) join tiny-vs-tiny, and totals come from the same aggregation —
no collect, no per-row Python, no second pass over the data.
Categorical domains can be unbounded, so the categorical variant caps
the bucket set at the reference's top `max_categories` values
(deterministic: count desc, value asc) and rolls everything else into
an OTHER bucket — bounded output regardless of cardinality, and the
rollup is itself drift-sensitive (new unseen categories inflate
OTHER's current fraction).

ln() is IEEE-unrounded in both Spark and DuckDB (see SCALE.md), so
cross-engine checks compare to 1e-12 tolerance, not bit-exact — which
is why these are suite-tested operators rather than hash-oracled
registry rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import MEAN_SCALE as _EMB_SCALE

PSI_EPSILON = 1e-6


def _bucket_fracs(df: DataFrame, bucket: F.Column, side: str) -> DataFrame:
    counts = df.select(bucket.alias("bucket")).groupBy("bucket").agg(
        F.count(F.lit(1)).alias(f"{side}_n")
    )
    return _fracs_from_counts(counts, side)


def _fracs_from_counts(counts: DataFrame, side: str) -> DataFrame:
    """Attach the side's total to a (bucket, {side}_n) count table —
    the entry point for callers that already HAVE bucket counts (the
    streaming twin accumulates them as its aggregation state)."""
    total = counts.agg(F.sum(f"{side}_n").alias(f"{side}_total"))
    return counts.crossJoin(F.broadcast(total))


def _psi_detail(ref_b: DataFrame, cur_b: DataFrame) -> DataFrame:
    """Full-outer join of the two bucket tables -> per-bucket fractions
    and PSI contribution, epsilon-smoothed.  Missing totals (one side
    empty) are treated as 0 counts over a total of 1."""
    joined = ref_b.join(cur_b, "bucket", "full_outer").select(
        "bucket",
        F.coalesce("ref_n", F.lit(0)).alias("ref_n"),
        F.coalesce("cur_n", F.lit(0)).alias("cur_n"),
        F.coalesce(
            F.max("ref_total").over(_all_rows()), F.lit(1)
        ).alias("ref_total"),
        F.coalesce(
            F.max("cur_total").over(_all_rows()), F.lit(1)
        ).alias("cur_total"),
    )
    p = F.greatest(
        F.col("ref_n").cast("double") / F.col("ref_total").cast("double"),
        F.lit(PSI_EPSILON),
    )
    q = F.greatest(
        F.col("cur_n").cast("double") / F.col("cur_total").cast("double"),
        F.lit(PSI_EPSILON),
    )
    return joined.select(
        "bucket",
        "ref_n",
        "cur_n",
        p.alias("ref_frac"),
        q.alias("cur_frac"),
        ((q - p) * F.log(q / p)).alias("psi_contrib"),
    )


def _all_rows():
    from pyspark.sql import Window

    # Window over the (tiny, <= bins+1 rows) joined bucket table only —
    # never over raw data.  Propagates each side's total to rows the
    # OTHER side contributed alone in the full-outer join.
    return Window.partitionBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )


def numeric_drift(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    n_bins: int = 16,
    lo: float | None = None,
    hi: float | None = None,
) -> DataFrame:
    """Per-bin PSI detail for a numeric column.  Bin edges are fixed
    and equal-width over [lo, hi]; when not given they come from the
    REFERENCE side's min/max (one 2-value driver scalar — the
    sanctioned bounded collect), because the reference frame is the
    stable yardstick and current-side outliers belong in the edge bins
    rather than reshaping the histogram.  Values below lo clamp to bin
    0, above hi to bin n_bins-1; NULLs take bucket -1 (their drift is
    tracked too — a null storm IS drift).

    Returns (bucket, ref_n, cur_n, ref_frac, cur_frac, psi_contrib);
    ``agg(sum(psi_contrib))`` is the PSI.  Fraction floors at 1e-6 keep
    ln() finite on empty bins (standard PSI practice).
    """
    lo, hi = _ref_bounds(ref, column, lo, hi)
    bucket = _numeric_bucket(column, lo, hi, n_bins)
    return _psi_detail(
        _bucket_fracs(ref, bucket, "ref"),
        _bucket_fracs(cur, bucket, "cur"),
    )


def _ref_bounds(
    ref: DataFrame, column: str, lo: float | None, hi: float | None
) -> tuple[float, float]:
    """Resolve missing bin bounds from the reference side's min/max
    (one 2-value driver scalar); degenerate references (empty or
    constant column) widen to a single usable bucket."""
    if lo is None or hi is None:
        row = ref.agg(
            F.min(F.col(column).cast("double")).alias("lo"),
            F.max(F.col(column).cast("double")).alias("hi"),
        ).collect()[0]
        lo = row["lo"] if lo is None else lo
        hi = row["hi"] if hi is None else hi
    if lo is None or hi is None or not (hi > lo):
        lo, hi = (lo or 0.0), (lo or 0.0) + 1.0
    return lo, hi


def _numeric_bucket(column: str, lo: float, hi: float, n_bins: int) -> F.Column:
    """Map-side bin id: clamp-to-edges, NULL -> bucket -1.  Shared
    verbatim by the batch operator and the streaming twin so their
    bucket semantics cannot drift apart."""
    width = (hi - lo) / n_bins
    x = F.col(column).cast("double")
    b = F.floor((x - F.lit(lo)) / F.lit(width)).cast("long")
    return (
        F.when(x.isNull(), F.lit(-1))
        .when(b < 0, F.lit(0))
        .when(b >= n_bins, F.lit(n_bins - 1))
        .otherwise(b)
    )


def categorical_drift(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    max_categories: int = 64,
) -> DataFrame:
    """Per-category PSI detail for a categorical column, with the
    bucket set capped at the reference's top `max_categories` values
    (count desc, value asc — deterministic) and everything else —
    including categories the reference has never seen — rolled into
    the '__OTHER__' bucket.  NULL maps to '__NULL__'.  Same output
    shape as :func:`numeric_drift`."""
    keep = _category_keep(ref, column, max_categories)
    return _psi_detail(
        _bucket_fracs(_category_bucket(ref, column, keep), F.col("bucket"), "ref"),
        _bucket_fracs(_category_bucket(cur, column, keep), F.col("bucket"), "cur"),
    )


def _category_keep(ref: DataFrame, column: str, max_categories: int) -> DataFrame:
    """The reference's top `max_categories` category values (count
    desc, value asc — deterministic), checkpointed so both sides — and
    the streaming twin — bucket against the identical frozen set.
    Partial top-k per partition first: the global ranking window never
    sees more than max_categories * n_partitions rows."""
    from pyspark.sql import Window

    norm = F.coalesce(F.col(column).cast("string"), F.lit("__NULL__"))
    ref_counts = ref.select(norm.alias("v")).groupBy("v").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.desc("n"), F.asc("v")
    )
    wg = Window.orderBy(F.desc("n"), F.asc("v"))
    return (
        ref_counts.withColumn("pr", F.row_number().over(w))
        .filter(F.col("pr") <= max_categories)
        .withColumn("r", F.row_number().over(wg))
        .filter(F.col("r") <= max_categories)
        .select("v")
        .localCheckpoint(eager=True)
    )


def _category_bucket(df: DataFrame, column: str, keep: DataFrame) -> DataFrame:
    """Map each row to its category bucket: kept value, '__OTHER__'
    for everything outside the keep set, '__NULL__' for NULL.  A
    broadcast left join against the (tiny) keep set — streaming-safe."""
    norm = F.coalesce(F.col(column).cast("string"), F.lit("__NULL__"))
    return (
        df.select(norm.alias("v"))
        .join(F.broadcast(keep.withColumn("keep", F.lit(True))), "v", "left")
        .select(
            F.when(F.col("keep"), F.col("v"))
            .otherwise(F.lit("__OTHER__"))
            .alias("bucket")
        )
    )


def psi(detail: DataFrame) -> float:
    """Collapse a drift detail frame to its scalar PSI (driver-side
    1-row collect — the monitoring value a pipeline alerts on)."""
    return float(
        detail.agg(F.sum("psi_contrib").alias("psi")).collect()[0]["psi"]
    )


def quantile_drift(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    n_bins: int = 10,
    relative_error: float = 0.001,
) -> DataFrame:
    """PSI over EQUAL-FREQUENCY bins — the canonical scorecard
    formulation (reference deciles for n_bins=10): bin edges are the
    reference's interior quantiles, so every reference bin holds ~1/n
    of the mass and the metric is scale-free (a heavy-tailed column
    does not pile 99% of both frames into one equal-width bin and hide
    the shift).  Edges come from `approx_percentile` (the GK sketch:
    one pass, bounded state, mergeable) and land in the plan as an
    n_bins-1 literal array; bucketing is a map-side count of edges at
    or below the value.  Duplicate edges (heavy ties in the reference)
    are collapsed, so degenerate references yield fewer, wider bins
    instead of spurious empty ones — with the documented limit that a
    CONSTANT reference collapses to one "≥ edge" bucket and cannot see
    shifts above it (use :func:`numeric_drift` for near-constant
    columns; its equal-width fallback handles them).  NULL -> bucket
    -1, same as :func:`numeric_drift`.  Output schema is identical."""
    qs = [i / n_bins for i in range(1, n_bins)]
    edges_row = ref.agg(
        F.percentile_approx(
            F.col(column).cast("double"),
            F.array(*[F.lit(q) for q in qs]),
            F.lit(int(1.0 / relative_error)),
        ).alias("e")
    ).collect()[0]["e"]
    edges = sorted(set(edges_row or []))
    bucket = _edges_bucket(column, edges)
    return _psi_detail(
        _bucket_fracs(ref, bucket, "ref"),
        _bucket_fracs(cur, bucket, "cur"),
    )


def _edges_bucket(column: str, edges: list[float]) -> F.Column:
    """Bucket id = number of interior edges <= x (map-side fold over a
    literal edge array; n_bins is small so the fold is O(n_bins) per
    row with no join, no shuffle).  NULL -> -1."""
    x = F.col(column).cast("double")
    if not edges:
        return F.when(x.isNull(), F.lit(-1)).otherwise(F.lit(0))
    arr = ", ".join(repr(float(e)) + "D" for e in edges)
    b = F.expr(
        f"size(filter(array({arr}), e -> e <= cast({column} as double)))"
    ).cast("long")
    return F.when(x.isNull(), F.lit(-1)).otherwise(b)


def ks_2sample(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    n_buckets: int = 64,
) -> float:
    """EXACT two-sample Kolmogorov-Smirnov statistic between the
    reference and current distributions of a numeric column — the
    unbinned complement to the PSI family: D = max |F_ref(x) − F_cur(x)|
    over every distinct value, no bins to hide a shift in.

    Runs on the same two-level prefix-sum engine as the eval metrics
    (``operators/eval._cumulative_score_counts``): the union of both
    sides, tagged 0/1, collapses to distinct values with per-side
    cumulative counts — one groupBy + one bucket-local window, no
    single-partition ORDER BY.  Each |ΔCDF| is one deterministic double
    per distinct value and max is order-free, so the result is
    bit-identical under any partitioning.  NULL rows are excluded on
    both sides.  Raises ValueError if either side is empty.
    """
    from .eval import _cumulative_score_counts

    tagged = ref.select(
        F.col(column).cast("double").alias("v"), F.lit(0).alias("side")
    ).unionByName(
        cur.select(
            F.col(column).cast("double").alias("v"), F.lit(1).alias("side")
        )
    )
    cum = _cumulative_score_counts(tagged, "v", "side", n_buckets)
    tot = cum.agg(
        F.sum("c").alias("n"), F.sum("p").alias("n_cur")
    ).collect()[0]
    n_cur = int(tot["n_cur"] or 0)
    n_ref = int(tot["n"] or 0) - n_cur
    if n_ref == 0 or n_cur == 0:
        raise ValueError("ks_2sample needs non-empty ref and cur")
    # CDF at v (inclusive): ref side uses (c_lt - p_lt) + (c - p).
    cdf_ref = (
        (F.col("c_lt") - F.col("p_lt") + F.col("c") - F.col("p"))
        .cast("double")
        / F.lit(float(n_ref))
    )
    cdf_cur = (F.col("p_lt") + F.col("p")).cast("double") / F.lit(
        float(n_cur)
    )
    row = cum.agg(F.max(F.abs(cdf_ref - cdf_cur)).alias("d")).collect()[0]
    return float(row["d"])


def embedding_drift(
    ref: DataFrame,
    cur: DataFrame,
    vec_col: str = "embedding",
) -> dict:
    """Embedding-space drift: cosine distance between the EXACT mean
    vectors of the reference and current corpora — did the centroid of
    the embedding cloud move?  (The embedding analogue of numeric PSI:
    a retrained encoder, a new content mix, or a corrupted pipeline all
    shift the mean long before any single neighbor query notices.)

    Per-dim means come from the kmeans idiom (2^52-scaled
    DECIMAL(38,0) partial sums — exact for float32-derived doubles, so
    the means are bit-identical under any partitioning); the final
    cosine runs once on the driver over 2·dims exact means.  Vectors
    must share dimensionality per side (posexplode pairs by dim);
    mismatched dims across sides raise.  Returns {'cosine_distance',
    'l2_distance', 'n_ref', 'n_cur', 'dims'}.
    """
    import math

    def mean_vec(df: DataFrame, side: str) -> tuple[dict, int]:
        exploded = df.select(
            F.posexplode(F.col(vec_col)).alias("dim", "val")
        )
        rows = (
            exploded.groupBy("dim")
            .agg(
                F.sum(
                    F.expr(
                        f"CAST(CAST(val AS DOUBLE) * {_EMB_SCALE}D"
                        " AS DECIMAL(38,0))"
                    )
                ).alias("ssum"),
                F.count("*").alias("n"),
            )
            .collect()
        )
        if not rows:
            raise ValueError(f"embedding_drift: empty {side} side")
        n = {r["dim"]: int(r["n"]) for r in rows}
        if len(set(n.values())) != 1:
            raise ValueError(
                f"embedding_drift: ragged vector lengths on {side} side"
            )
        means = {
            r["dim"]: int(r["ssum"]) / (n[r["dim"]] * _EMB_SCALE)
            for r in rows
        }
        return means, next(iter(n.values()))

    m_ref, n_ref = mean_vec(ref, "ref")
    m_cur, n_cur = mean_vec(cur, "cur")
    if set(m_ref) != set(m_cur):
        raise ValueError("embedding_drift: ref and cur dims differ")
    dims = sorted(m_ref)
    a = [m_ref[d] for d in dims]
    b = [m_cur[d] for d in dims]
    dot = sum(x * y for x, y in zip(a, b))
    na = math.sqrt(sum(x * x for x in a))
    nb = math.sqrt(sum(y * y for y in b))
    l2 = math.sqrt(sum((x - y) ** 2 for x, y in zip(a, b)))
    # clamp: float rounding can push dot/(na·nb) past 1 for identical
    # means — self-drift must read exactly 0, not -2e-16
    cos_d = max(0.0, 1.0 - dot / (na * nb)) if na > 0 and nb > 0 else None
    return {
        "cosine_distance": cos_d,
        "l2_distance": l2,
        "n_ref": n_ref,
        "n_cur": n_cur,
        "dims": len(dims),
    }


def grouped_ks_2sample(
    ref: DataFrame,
    cur: DataFrame,
    column: str,
    group_col: str,
    n_buckets: int = 64,
) -> DataFrame:
    """Per-segment exact two-sample KS in ONE plan — the grouped twin
    of :func:`ks_2sample` (suite-pinned equal to it per group): one D
    statistic per language/source/domain, the sweep a drift monitor
    actually runs.  Groups present on only one side report NULL (no
    distribution to compare against — absence is itself the finding,
    surfaced via the n_ref/n_cur columns, never silently dropped).

    Columns: <group_col>, n_ref, n_cur, ks.
    """
    from .eval import _cumulative_score_counts

    tagged = ref.select(
        F.col(group_col),
        F.col(column).cast("double").alias("v"),
        F.lit(0).alias("side"),
    ).unionByName(
        cur.select(
            F.col(group_col),
            F.col(column).cast("double").alias("v"),
            F.lit(1).alias("side"),
        )
    )
    cum = _cumulative_score_counts(
        tagged, "v", "side", n_buckets, group_cols=[group_col]
    )
    tot = cum.groupBy(group_col).agg(
        F.sum("c").alias("__n"), F.sum("p").alias("n_cur")
    )
    j = cum.join(tot, group_col)
    n_ref = F.col("__n") - F.col("n_cur")
    cdf_ref = (
        (F.col("c_lt") - F.col("p_lt") + F.col("c") - F.col("p"))
        .cast("double")
        / n_ref.cast("double")
    )
    cdf_cur = (F.col("p_lt") + F.col("p")).cast("double") / F.col(
        "n_cur"
    ).cast("double")
    d = F.when(
        (n_ref > 0) & (F.col("n_cur") > 0), F.abs(cdf_ref - cdf_cur)
    )
    return j.groupBy(group_col).agg(
        F.max(n_ref).alias("n_ref"),
        F.max("n_cur").alias("n_cur"),
        F.max(d).alias("ks"),
    )
