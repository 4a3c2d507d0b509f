"""Binary-classifier evaluation — exact, distributed, deterministic.

The quality-filter loop (``operators/classifier.py``, ``operators/lm.py``)
needs honest metrics at corpus scale: ROC-AUC, ROC/PR curves, confusion
counts.  The naive formulations don't scale — AUC is a statement about
all positive×negative pairs (O(n²)), and rank-based rewrites usually
reach for a global ``ORDER BY`` window, which Spark plans as a SINGLE
partition.  Neither survives 100 TB.

This module computes EXACT tie-corrected ranks with a two-level prefix
sum instead:

1. group rows by distinct score (one shuffle — ties collapse to one row
   with a count, so boilerplate scores are one hot key, not n rows);
2. range-bucket the distinct scores by value against ~``n_buckets``
   driver-literal edges (an ``approx_percentile`` probe — the edges only
   BALANCE the buckets, the result never depends on where they fall,
   so the sketch's approximation is invisible in the output);
3. per-bucket totals (≤ ``n_buckets`` rows) are collected, prefix-summed
   on the driver — the sanctioned O(buckets) scalar action — and
   broadcast-joined back;
4. within each bucket an ordered window finishes the cumulative counts
   (parallel across buckets; no single-partition stage anywhere).

Equal scores always share a bucket (assignment is strictly
value-based), so tie groups are never split.  All counts are integers;
the Mann-Whitney identity

    AUC = (sum of doubled avg ranks of positives − n1·(n1+1)) / (2·n1·n0)

is evaluated from exact BIGINT/DECIMAL sums with ONE float division at
the end — bit-identical under any partitioning, shuffle order, or
micro-batching (suite-pinned), the same doubled-rank idiom as
``qty_price_rank_corr``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cumulative_score_counts(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_buckets: int = 64,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per distinct score (within each group, if ``group_cols``): its
    count ``c``, positive count ``p``, and EXACT counts strictly below
    it in the same group (``c_lt``, ``p_lt``).  Rows with a NULL score
    or label are excluded.

    The engine of every metric here.  One groupBy shuffle + one
    bucket-local window; driver traffic is O(groups × n_buckets) offset
    rows — the bounded-collect contract assumes group cardinality is
    segment-like (languages, sources), not key-like.  Bucket edges are
    GLOBAL approximate quantiles either way: they only balance work,
    the counts never depend on where they fall (ties can't split — the
    bucket is a pure function of the score value).
    """
    group_cols = list(group_cols or [])
    gsel = [F.col(c) for c in group_cols]
    cond = F.col("s").isNotNull() & F.col("y").isNotNull()
    for c in group_cols:
        # NULL groups are excluded like NULL scores (the offsets join
        # is null-unsafe; a NULL segment is a data bug upstream).
        cond = cond & F.col(c).isNotNull()
    base = df.select(
        *gsel,
        F.col(score_col).cast("double").alias("s"),
        F.col(label_col).cast("bigint").alias("y"),
    ).filter(cond)

    g = base.groupBy(*group_cols, "s").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("y").alias("p"),
    )

    n_buckets = max(1, int(n_buckets))
    if n_buckets > 1:
        probs = [i / n_buckets for i in range(1, n_buckets)]
        row = base.agg(
            F.percentile_approx("s", probs, 10000).alias("q")
        ).collect()[0]
        edges = sorted(set(row["q"] or []))
    else:
        edges = []
    # Plain literal-comparison sum, not a higher-order F.aggregate:
    # lambda expressions inside a broadcast-join key trip a Catalyst
    # binding bug (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) in Spark 4.1.
    bucket = F.lit(0)
    for e in edges:
        bucket = bucket + F.when(
            F.col("s") > F.lit(float(e)), 1
        ).otherwise(0)
    g = g.withColumn("bk", bucket)

    totals = (
        g.groupBy(*group_cols, "bk")
        .agg(F.sum("c").alias("tc"), F.sum("p").alias("tp"))
        .collect()
    )
    # Prefix-sum per group over ascending bucket id.
    rows = sorted(
        totals, key=lambda r: (tuple(r[c] for c in group_cols), r["bk"])
    )
    off_rows, run = [], {}
    for r in rows:
        key = tuple(r[c] for c in group_cols)
        rc, rp = run.get(key, (0, 0))
        off_rows.append(tuple(r[c] for c in group_cols) + (r["bk"], rc, rp))
        run[key] = (rc + r["tc"], rp + r["tp"])
    spark = df.sparkSession
    from pyspark.sql.types import (
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    gfields = [g.schema[c] for c in group_cols]
    off_schema = StructType(
        list(gfields)
        + [
            StructField("bk", IntegerType(), False),
            StructField("off_c", LongType(), False),
            StructField("off_p", LongType(), False),
        ]
    )
    offsets = spark.createDataFrame(off_rows, off_schema)

    w = (
        Window.partitionBy(*group_cols, "bk")
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = g.select(
        *group_cols,
        "bk",
        "s",
        "c",
        "p",
        F.coalesce(F.sum("c").over(w), F.lit(0)).alias("w_c"),
        F.coalesce(F.sum("p").over(w), F.lit(0)).alias("w_p"),
    )
    join_keys = group_cols + ["bk"]
    return within.join(F.broadcast(offsets), join_keys).select(
        *group_cols,
        "s",
        "c",
        "p",
        (F.col("w_c") + F.col("off_c")).alias("c_lt"),
        (F.col("w_p") + F.col("off_p")).alias("p_lt"),
    )


def roc_auc(
    df: DataFrame,
    score_col: str = "quality_prob",
    label_col: str = "label",
    n_buckets: int = 64,
) -> float:
    """Exact tie-corrected ROC-AUC (Mann-Whitney).  Raises ValueError
    when either class is empty — a 'metric' there would be a lie."""
    cum = _cumulative_score_counts(df, score_col, label_col, n_buckets)
    # Doubled average rank of a tie group: 2*c_lt + c + 1 (integer).
    # Positives in the group contribute p * that; values reach ~2n² so
    # the sum accumulates in DECIMAL(38,0) — order-free, exact.
    agg = cum.agg(
        F.sum(
            F.col("p").cast("decimal(38,0)")
            * (2 * F.col("c_lt") + F.col("c") + 1).cast("decimal(38,0)")
        ).alias("r2_sum"),
        F.sum("c").alias("n"),
        F.sum("p").alias("n1"),
    ).collect()[0]
    n1 = int(agg["n1"] or 0)
    n0 = int(agg["n"] or 0) - n1
    if n1 == 0 or n0 == 0:
        raise ValueError("roc_auc needs both classes present")
    return float(int(agg["r2_sum"]) - n1 * (n1 + 1)) / float(2 * n1 * n0)


def pr_auc(
    df: DataFrame,
    score_col: str = "quality_prob",
    label_col: str = "label",
    n_buckets: int = 64,
) -> float:
    """Average precision — the step-interpolated area under the exact
    precision-recall curve: AP = Σ_t (R_t − R_{t−1}) · P_t over distinct
    thresholds descending (the standard AP definition; ties handled by
    the group counts, no trapezoid optimism).

    Falls straight out of the cumulative-count frame row-locally:
    at threshold s, ΔR = p(s)/n1 and P = (n1 − p_lt)/(n − c_lt), so
    AP = Σ_s p(s)·tp(s)/(n − c_lt) / n1 — ONE aggregation, no ordered
    traversal.  Each term's double is deterministic; the sum
    accumulates through the 2^52-scaled decimal idiom so the result is
    bit-identical under any partitioning.  Raises ValueError when
    either class is empty.
    """
    from .similarity import MEAN_SCALE

    cum = _cumulative_score_counts(df, score_col, label_col, n_buckets)
    tot = cum.agg(
        F.sum("c").alias("n"), F.sum("p").alias("n1")
    ).collect()[0]
    n = int(tot["n"] or 0)
    n1 = int(tot["n1"] or 0)
    if n1 == 0 or n1 == n:
        raise ValueError("pr_auc needs both classes present")
    term = (
        F.col("p").cast("double")
        * (F.lit(n1) - F.col("p_lt")).cast("double")
        / (F.lit(n) - F.col("c_lt")).cast("double")
    )
    row = cum.agg(
        F.sum(
            (term * F.lit(float(MEAN_SCALE))).cast("decimal(38,0)")
        ).alias("ap_scaled")
    ).collect()[0]
    return float(int(row["ap_scaled"])) / float(MEAN_SCALE) / n1


def grouped_roc_auc(
    df: DataFrame,
    group_col: str,
    score_col: str = "quality_prob",
    label_col: str = "label",
    n_buckets: int = 64,
) -> DataFrame:
    """Exact tie-corrected ROC-AUC per segment (language, source,
    domain) in ONE distributed plan — the per-group twin of
    :func:`roc_auc`, bit-identical to calling it per group
    (suite-pinned).  Ranks are computed within each group by the same
    two-level prefix sum; single-class groups report NULL auc instead
    of raising (a monitoring sweep must not die on a degenerate
    segment).  Driver traffic: O(groups × n_buckets) offset rows.

    Columns: <group_col>, n, n_pos, n_neg, auc.  Exactness envelope:
    group sizes up to ~9·10⁷ keep 2n² below 2^53 for the final
    decimal→double division operands.
    """
    cum = _cumulative_score_counts(
        df, score_col, label_col, n_buckets, group_cols=[group_col]
    )
    agg = cum.groupBy(group_col).agg(
        F.sum(
            F.col("p").cast("decimal(38,0)")
            * (2 * F.col("c_lt") + F.col("c") + 1).cast("decimal(38,0)")
        ).alias("r2_sum"),
        F.sum("c").alias("n"),
        F.sum("p").alias("n1"),
    )
    n1 = F.col("n1")
    n0 = F.col("n") - n1
    num = F.col("r2_sum") - (
        n1.cast("decimal(38,0)") * (n1 + 1).cast("decimal(38,0)")
    )
    return agg.select(
        group_col,
        F.col("n"),
        n1.alias("n_pos"),
        n0.alias("n_neg"),
        F.when(
            (n1 > 0) & (n0 > 0),
            num.cast("double") / (2 * n1 * n0).cast("double"),
        ).alias("auc"),
    )


def grouped_threshold_for_keep_rate(
    df: DataFrame,
    group_col: str,
    keep_rate: float,
    score_col: str = "quality_prob",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-segment filter calibration — the per-domain quality bar of a
    curation run: for every group, the LARGEST threshold keeping at
    least ``ceil(keep_rate · n_group)`` rows, exactly (the grouped twin
    of :func:`threshold_for_keep_rate`, suite-pinned equal to it per
    group).  A uniform global bar over-prunes weak domains and
    under-prunes strong ones; this is the fix.

    Columns: <group_col>, n, threshold, kept.  ceil runs on the same
    IEEE double product in the JVM as the scalar version does in
    Python, so the two agree bit-for-bit.
    """
    if not (0.0 < keep_rate <= 1.0):
        raise ValueError("keep_rate must be in (0, 1]")
    cum = _cumulative_score_counts(
        df.withColumn("__one", F.lit(1)),
        score_col,
        "__one",
        n_buckets,
        group_cols=[group_col],
    )
    tot = cum.groupBy(group_col).agg(F.sum("c").alias("n"))
    target = F.ceil(F.lit(float(keep_rate)) * F.col("n").cast("double"))
    thr = (
        cum.join(tot, group_col)
        .filter(F.col("n") - F.col("c_lt") >= target)
        .groupBy(group_col, "n")
        .agg(F.max("s").alias("threshold"))
    )
    kept = (
        cum.join(thr.select(group_col, "threshold"), group_col)
        .filter(F.col("s") >= F.col("threshold"))
        .groupBy(group_col)
        .agg(F.sum("c").alias("kept"))
    )
    return thr.join(kept, group_col).select(
        group_col, "n", "threshold", "kept"
    )


def grouped_pr_auc(
    df: DataFrame,
    group_col: str,
    score_col: str = "quality_prob",
    label_col: str = "label",
    n_buckets: int = 64,
) -> DataFrame:
    """Per-segment average precision in ONE plan — the grouped twin of
    :func:`pr_auc` (suite-pinned equal to it per group).  Groups with a
    single class report NULL instead of raising.

    Columns: <group_col>, n, n_pos, ap.
    """
    from .similarity import MEAN_SCALE

    cum = _cumulative_score_counts(
        df, score_col, label_col, n_buckets, group_cols=[group_col]
    )
    tot = cum.groupBy(group_col).agg(
        F.sum("c").alias("n"), F.sum("p").alias("n1")
    )
    j = cum.join(tot, group_col)
    term = (
        F.col("p").cast("double")
        * (F.col("n1") - F.col("p_lt")).cast("double")
        / (F.col("n") - F.col("c_lt")).cast("double")
    )
    agg = j.groupBy(group_col, "n", "n1").agg(
        F.sum(
            (term * F.lit(float(MEAN_SCALE))).cast("decimal(38,0)")
        ).alias("ap_scaled")
    )
    return agg.select(
        group_col,
        F.col("n"),
        F.col("n1").alias("n_pos"),
        F.when(
            (F.col("n1") > 0) & (F.col("n1") < F.col("n")),
            F.col("ap_scaled").cast("double")
            / F.lit(float(MEAN_SCALE))
            / F.col("n1").cast("double"),
        ).alias("ap"),
    )


def percentile_normalize(
    df: DataFrame,
    score_col: str,
    group_col: str | None = None,
    out_col: str = "pct",
    n_buckets: int = 64,
) -> DataFrame:
    """Midrank percentile of a score within its group, appended as
    ``out_col`` in (0, 1) — the CCNet normalization: raw quality/LM
    scores are NOT comparable across languages or domains (every
    language has its own perplexity scale), so curation buckets by
    PER-GROUP percentile (head/middle/tail) instead of raw value.

    pct = (c_lt + (c+1)/2) / n over the group's distinct-score counts —
    exact tie-averaged midrank from the same two-level prefix sum as
    roc_auc, joined back by (group, score) value.  Deterministic under
    any partitioning; rows with a NULL score (or group) keep a NULL
    percentile.  Range is (0, 1]: a group's minimum maps to
    (c_min+1)/(2n) > 0, but a UNIQUE maximum maps to exactly 1.0 (the
    midrank definition) — bucket with `pct >= edge`, not `pct > edge`.
    """
    gcols = [group_col] if group_col else []
    cum = _cumulative_score_counts(
        df.withColumn("__one", F.lit(1)),
        score_col,
        "__one",
        n_buckets,
        group_cols=gcols,
    )
    if gcols:
        tot = cum.groupBy(*gcols).agg(F.sum("c").alias("__n"))
        pcts = cum.join(tot, gcols)
    else:
        tot = cum.agg(F.sum("c").alias("__n"))
        pcts = cum.crossJoin(F.broadcast(tot))
    pcts = pcts.select(
        *gcols,
        F.col("s").alias(score_col + "__s"),
        (
            (2 * F.col("c_lt") + F.col("c") + 1).cast("double")
            / (2 * F.col("__n")).cast("double")
        ).alias(out_col),
    )
    keys = gcols + [score_col + "__s"]
    return (
        df.withColumn(score_col + "__s", F.col(score_col).cast("double"))
        .join(pcts, keys, "left")
        .drop(score_col + "__s")
    )


def roc_points(
    df: DataFrame,
    score_col: str = "quality_prob",
    label_col: str = "label",
    n_buckets: int = 64,
) -> DataFrame:
    """The exact ROC/PR operating points: one row per distinct score
    (the rule 'predict positive when score >= threshold'), with integer
    confusion counts and the derived rates.

    Columns: threshold, tp, fp, fn, tn, tpr, fpr, precision.
    """
    cum = _cumulative_score_counts(df, score_col, label_col, n_buckets)
    tot = cum.agg(
        F.sum("c").alias("n"), F.sum("p").alias("n1")
    ).collect()[0]
    n = int(tot["n"] or 0)
    n1 = int(tot["n1"] or 0)
    n0 = n - n1
    tp = F.lit(n1) - F.col("p_lt")
    fp = F.lit(n0) - (F.col("c_lt") - F.col("p_lt"))
    return cum.select(
        F.col("s").alias("threshold"),
        tp.alias("tp"),
        fp.alias("fp"),
        (F.lit(n1) - tp).alias("fn"),
        (F.lit(n0) - fp).alias("tn"),
        (tp.cast("double") / F.lit(float(n1))).alias("tpr")
        if n1
        else F.lit(None).cast("double").alias("tpr"),
        (fp.cast("double") / F.lit(float(n0))).alias("fpr")
        if n0
        else F.lit(None).cast("double").alias("fpr"),
        F.when(tp + fp > 0, tp.cast("double") / (tp + fp).cast("double"))
        .alias("precision"),
    )


def ks_statistic(
    df: DataFrame,
    score_col: str = "quality_prob",
    label_col: str = "label",
    n_buckets: int = 64,
) -> float:
    """Kolmogorov-Smirnov separation: max |TPR - FPR| over the exact
    ROC points.  0 = classes indistinguishable by the score."""
    pts = roc_points(df, score_col, label_col, n_buckets)
    row = pts.agg(
        F.max(F.abs(F.col("tpr") - F.col("fpr"))).alias("ks")
    ).collect()[0]
    return float(row["ks"] or 0.0)


def rank_correlation(
    df: DataFrame,
    col_a: str,
    col_b: str,
    n_buckets: int = 64,
) -> float:
    """Exact tie-corrected Spearman rank correlation between two score
    columns — the 'do these two quality signals agree?' check when
    comparing filters (LM score vs classifier vs compressibility).

    Both columns get exact global doubled average ranks from the same
    two-level prefix sum as roc_auc (doubling keeps tie-averaged ranks
    integer); Pearson on those ranks is assembled from DECIMAL(38,0)
    integer moments — exact, so the result is bit-identical under any
    partitioning.  Rows with a NULL in either column are excluded
    (pairwise-complete).  sqrt is IEEE-correctly-rounded, so the one
    float step is reproducible.  Raises ValueError when either column
    is constant (undefined correlation).  Envelope: moment sums reach
    4n³ — exact to n ≈ 10¹¹ rows in DECIMAL(38,0).
    """
    base = (
        df.select(
            F.col(col_a).cast("double").alias("a"),
            F.col(col_b).cast("double").alias("b"),
        )
        .filter(F.col("a").isNotNull() & F.col("b").isNotNull())
        .withColumn("__one", F.lit(1))
        .localCheckpoint(eager=True)
    )

    def ranks(col: str) -> DataFrame:
        cum = _cumulative_score_counts(base, col, "__one", n_buckets)
        return cum.select(
            F.col("s").alias(col),
            (2 * F.col("c_lt") + F.col("c") + 1).alias(f"r_{col}"),
        )

    joined = base.join(ranks("a"), "a").join(ranks("b"), "b")
    d = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ra, rb = F.col("r_a"), F.col("r_b")
    m = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d(ra)).alias("sa"),
        F.sum(d(rb)).alias("sb"),
        F.sum(d(ra) * d(rb)).alias("sab"),
        F.sum(d(ra) * d(ra)).alias("saa"),
        F.sum(d(rb) * d(rb)).alias("sbb"),
    ).collect()[0]
    n = int(m["n"] or 0)
    if n < 2:
        raise ValueError("rank_correlation needs >= 2 complete rows")
    sa, sb = int(m["sa"]), int(m["sb"])
    num = n * int(m["sab"]) - sa * sb
    va = n * int(m["saa"]) - sa * sa
    vb = n * int(m["sbb"]) - sb * sb
    if va == 0 or vb == 0:
        raise ValueError("rank_correlation undefined for a constant column")
    # Perfect monotone agreement is an INTEGER identity (Cauchy-Schwarz
    # equality): report exactly ±1.0 instead of a sqrt-rounded 0.99…9.
    if num * num == va * vb:
        return 1.0 if num > 0 else -1.0
    import math

    return num / math.sqrt(va * vb)


def calibration_bins(
    df: DataFrame,
    score_col: str = "quality_prob",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram data: scores in [0,1] bucketed into
    ``n_bins`` equal-width bins (score 1.0 clamps into the top bin),
    with exact counts and the mean score per bin (order-free decimal
    sum).  A calibrated classifier has pos_rate ≈ mean_score per bin.
    One groupBy; NULL rows excluded.

    Columns: bin, n, n_pos, mean_score, pos_rate.
    """
    from .similarity import MEAN_SCALE

    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("bigint")
    b = F.least(
        F.floor(s * n_bins).cast("int"), F.lit(int(n_bins) - 1)
    )
    return (
        df.filter(s.isNotNull() & y.isNotNull())
        .groupBy(b.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(y).alias("n_pos"),
            (
                F.sum(
                    F.expr(
                        f"CAST(CAST(`{score_col}` AS DOUBLE) * {MEAN_SCALE}D"
                        " AS DECIMAL(38,0))"
                    )
                ).cast("double")
                / (F.count(F.lit(1)) * F.lit(float(MEAN_SCALE)))
            ).alias("mean_score"),
            (F.sum(y).cast("double") / F.count(F.lit(1))).alias("pos_rate"),
        )
    )


def threshold_for_keep_rate(
    df: DataFrame,
    keep_rate: float,
    score_col: str = "quality_prob",
    n_buckets: int = 64,
) -> tuple[float, int]:
    """The exact filter calibration a curation run needs: the LARGEST
    threshold t (a distinct score) such that 'keep rows with score >= t'
    keeps at least ``ceil(keep_rate * n)`` rows.  Returns (t, kept).

    Built on the same two-level cumulative counts as roc_auc — exact
    and deterministic, no approx-quantile in the answer.  ``keep_rate``
    of 1.0 returns the minimum score (everything kept).
    """
    import math

    if not (0.0 < keep_rate <= 1.0):
        raise ValueError("keep_rate must be in (0, 1]")
    # label is irrelevant here; reuse the machinery with a constant
    cum = _cumulative_score_counts(
        df.withColumn("__one", F.lit(1)), score_col, "__one", n_buckets
    )
    tot = cum.agg(F.sum("c").alias("n")).collect()[0]
    n = int(tot["n"] or 0)
    if n == 0:
        raise ValueError("no non-null scores")
    target = math.ceil(keep_rate * n)
    row = (
        cum.filter(F.lit(n) - F.col("c_lt") >= target)
        .agg(F.max("s").alias("t"))
        .collect()[0]
    )
    t = float(row["t"])
    kept = (
        cum.filter(F.col("s") >= t)
        .agg(F.sum("c").alias("k"))
        .collect()[0]["k"]
    )
    return t, int(kept)


def confusion_at_threshold(
    df: DataFrame,
    threshold: float,
    score_col: str = "quality_prob",
    label_col: str = "label",
) -> dict:
    """Exact confusion counts + derived metrics at one threshold
    ('predict positive when score >= threshold').  One aggregation,
    no window.  NULL score/label rows are excluded, like roc_auc."""
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("bigint")
    pred = (s >= F.lit(float(threshold))).cast("bigint")
    row = (
        df.filter(s.isNotNull() & y.isNotNull())
        .agg(
            F.sum(pred * y).alias("tp"),
            F.sum(pred * (1 - y)).alias("fp"),
            F.sum((1 - pred) * y).alias("fn"),
            F.sum((1 - pred) * (1 - y)).alias("tn"),
        )
        .collect()[0]
    )
    tp, fp = int(row["tp"] or 0), int(row["fp"] or 0)
    fn, tn = int(row["fn"] or 0), int(row["tn"] or 0)
    n = tp + fp + fn + tn
    prec = tp / (tp + fp) if tp + fp else None
    rec = tp / (tp + fn) if tp + fn else None
    f1 = (
        2 * prec * rec / (prec + rec)
        if prec is not None and rec is not None and (prec + rec)
        else None
    )
    return {
        "tp": tp,
        "fp": fp,
        "fn": fn,
        "tn": tn,
        "accuracy": (tp + tn) / n if n else None,
        "precision": prec,
        "recall": rec,
        "f1": f1,
    }
