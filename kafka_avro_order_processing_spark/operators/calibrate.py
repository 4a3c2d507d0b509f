"""Monotone score calibration — isotonic regression (PAV) and Platt
scaling, the two published calibrators (Zadrozny & Elkan, KDD 2002
"Transforming classifier scores into accurate multiclass probability
estimates"; Platt 1999) that turn a quality classifier's raw score
into a usable keep-probability before thresholding a corpus on it.

Why this operator: the engine already trains scorers (classifier.py
logistic, nb.py Naive Bayes, lm.py perplexity) and thresholds on them
(eval.threshold_for_keep_rate, mixture rates); calibration is the
published missing step between the two — NB scores in particular are
well-ranked but badly scaled, and isotonic regression is the standard
non-parametric fix.

Isotonic fit = pool-adjacent-violators (PAV, Best & Chakravarti 1990).
The distributed shape follows Spark MLlib's parallel design
(SPARK-3278): pre-pool by distinct score, range-partition + sort, PAV
within each partition, then one final PAV over the collected blocks on
the driver.  Two-phase PAV is exact, not approximate: the isotonic fit
is the unique L2 projection onto the monotone cone, and ANY maximal
sequence of adjacent-violator poolings reaches it, so pooling some
violators early (per partition) and the rest later (driver) lands on
the same fixed point regardless of where range boundaries fell.

Float discipline (the nb.py pattern): the target is quantized ONCE per
row in the JVM (2^52-scaled DECIMAL(38,0)); every pooled mass is then
an exact integer, and PAV compares block means by integer
CROSS-MULTIPLICATION (sy_a * w_b > sy_b * w_a — Python bigints, no
division), so the fitted blocks are bit-identical under any
partitioning or range-boundary placement.  The single float rounding
per block happens at the very end (p = sy / (w * 2^52)).

Scale shape: one groupBy on the score column (pre-pooling — exact tie
handling AND the main data reduction), one range shuffle of the pooled
(score, sy, w) triples, Arrow-batched per-partition PAV, and a driver
collect that is O(surviving blocks) — the MLlib budget; calibration
curves pool heavily in practice, and the block count is the model
size, not the corpus size.  Applying the model is one broadcast
interval join (disjoint covering intervals — exactly one match per
row), O(blocks) per row under BroadcastNestedLoopJoin.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import MEAN_SCALE

_BLOCK_SCHEMA = "lo double, hi double, sy string, w long"


def _pav(blocks: list[tuple[float, float, int, int]]) -> list[tuple[float, float, int, int]]:
    """Pool adjacent violators over (lo, hi, sy, w) blocks sorted by
    lo, for an INCREASING fit.  sy is the 2^52-scaled integer target
    mass, w the integer weight mass; the violation test
    sy_prev * w_next > sy_next * w_prev is exact bigint arithmetic."""
    stack: list[tuple[float, float, int, int]] = []
    for blk in blocks:
        stack.append(blk)
        while len(stack) >= 2 and stack[-2][2] * stack[-1][3] > stack[-1][2] * stack[-2][3]:
            b = stack.pop()
            a = stack.pop()
            stack.append((a[0], b[1], a[2] + b[2], a[3] + b[3]))
    return stack


def _pav_partition(batches: Iterator) -> Iterator:
    """mapInPandas worker: PAV over one sorted range-partition of
    pooled (score, sy, w) rows.  Accumulates the partition (bounded by
    the pre-pooled distinct-score count of its range), emits surviving
    blocks with sy serialized as a decimal string (> int64 range)."""
    import pandas as pd

    rows: list[tuple[float, float, int, int]] = []
    for pdf in batches:
        for s, sy, w in zip(pdf["score"], pdf["sy"], pdf["w"]):
            rows.append((float(s), float(s), int(sy), int(w)))
    rows.sort(key=lambda r: r[0])
    pooled = _pav(rows)
    yield pd.DataFrame(
        {
            "lo": [b[0] for b in pooled],
            "hi": [b[1] for b in pooled],
            "sy": [str(b[2]) for b in pooled],
            "w": [b[3] for b in pooled],
        }
    )


def isotonic_fit(
    df: DataFrame,
    score_col: str,
    target_col: str,
    weight_col: str | None = None,
    increasing: bool = True,
    n_ranges: int = 32,
) -> dict:
    """Fit isotonic regression of ``target_col`` on ``score_col``.
    Returns the model dict ``{score_lo, score_hi, p, n, increasing}``
    (parallel lists, blocks in increasing score order) that
    :func:`isotonic_apply` consumes — the MLlib-style driver-side
    model, O(blocks).

    ``weight_col`` must be a POSITIVE integer column (repeat counts)
    so pooled masses stay exact; rows with NULL score or target are
    rejected loudly (silently dropping them would bias the curve), and
    so are NULL, zero, or negative weights — a NULL weight would
    silently drop its row, an all-zero score group divides by zero,
    and a negative weight inverts the pooled-mean cross-multiplication
    (drop zero-weight rows explicitly before fitting if they are
    intentional).  ``increasing=False`` fits a decreasing curve by
    negating the score (exact for floats) and un-negating the block
    edges."""
    if n_ranges < 1:
        raise ValueError(f"n_ranges must be >= 1, got {n_ranges}")
    bad_cond = F.col(score_col).isNull() | F.col(target_col).isNull()
    if weight_col:
        bad_cond = (
            bad_cond
            | F.col(weight_col).isNull()
            | (F.col(weight_col).cast("long") <= 0)
        )
    n_bad = df.filter(bad_cond).count()
    if n_bad:
        raise ValueError(
            f"isotonic_fit: {n_bad} rows have a NULL {score_col!r} or "
            f"{target_col!r}"
            + (
                f", or a NULL/zero/negative {weight_col!r}"
                if weight_col
                else ""
            )
            + " — filter or impute explicitly before fitting"
        )
    score = F.col(score_col).cast("double")
    if not increasing:
        score = -score
    w = (
        F.col(weight_col).cast("long")
        if weight_col
        else F.lit(1).cast("long")
    )
    # the ONLY double->decimal rounding of the fit, once per row in the JVM
    y_int = F.expr(
        f"CAST(CAST(`{target_col}` AS DOUBLE) * {MEAN_SCALE}D AS DECIMAL(38,0))"
    )
    pooled = (
        df.select(score.alias("score"), y_int.alias("y"), w.alias("w"))
        .groupBy("score")
        .agg(
            F.sum(F.col("y") * F.col("w")).cast("decimal(38,0)").alias("sy"),
            F.sum("w").alias("w"),
        )
    )
    parts = (
        pooled.repartitionByRange(n_ranges, "score")
        .sortWithinPartitions("score")
        .mapInPandas(_pav_partition, _BLOCK_SCHEMA)
        .collect()
    )
    # range partitions cover disjoint score intervals, so sorting the
    # surviving blocks by lo restores the global order exactly
    blocks = sorted(
        ((r["lo"], r["hi"], int(r["sy"]), r["w"]) for r in parts),
        key=lambda b: b[0],
    )
    final = _pav(blocks)
    if not increasing:
        final = [(-hi, -lo, sy, w) for (lo, hi, sy, w) in reversed(final)]
    return {
        "score_lo": [b[0] for b in final],
        "score_hi": [b[1] for b in final],
        "p": [b[2] / (b[3] * MEAN_SCALE) for b in final],
        "n": [b[3] for b in final],
        "increasing": increasing,
    }


def isotonic_apply(
    df: DataFrame,
    model: dict,
    score_col: str,
    out_col: str = "calibrated",
) -> DataFrame:
    """Append the calibrated value: the step function of the fitted
    blocks (each block's pooled mean over its score range, clamped at
    both ends — a score below the first block gets the first block's
    value).  One broadcast interval join against disjoint covering
    intervals, so exactly one match per non-NULL score; NULL scores
    keep a NULL calibrated value."""
    los, ps = model["score_lo"], model["p"]
    if not los:
        raise ValueError("isotonic_apply: empty model (fit on no rows?)")
    spark = df.sparkSession
    # covering intervals [edge_i, edge_{i+1}): block i's lower score
    # edge, first block extended to -inf; for a decreasing model the
    # blocks are stored in increasing score order too, so the same
    # edges work unchanged
    rows = [
        (
            float("-inf") if i == 0 else float(los[i]),
            float(los[i + 1]) if i + 1 < len(los) else None,
            float(ps[i]),
        )
        for i in range(len(los))
    ]
    iv = spark.createDataFrame(rows, "__iv_lo double, __iv_next double, __iv_p double")
    score = F.col(score_col).cast("double")
    joined = df.join(
        F.broadcast(iv),
        (score >= F.col("__iv_lo"))
        & (F.col("__iv_next").isNull() | (score < F.col("__iv_next"))),
        "left",
    )
    return joined.select(
        *[F.col(c) for c in df.columns], F.col("__iv_p").alias(out_col)
    )


def platt_fit(
    df: DataFrame,
    score_col: str,
    label_col: str = "label",
    n_rounds: int = 200,
    lr: float = 0.5,
) -> dict:
    """Platt scaling (Platt 1999): a 1-feature logistic regression of
    the 0/1 label on the raw score — the parametric sibling of
    :func:`isotonic_fit` (better with little data, worse when the true
    curve is not sigmoid).  Pure reuse of
    :func:`classifier.fit_logistic` (bit-deterministic decimal
    gradient sums); apply with :func:`classifier.score_logistic`,
    which is a single map-side expression."""
    from .classifier import fit_logistic

    return fit_logistic(df, [score_col], label_col, n_rounds=n_rounds, lr=lr)


def expected_calibration_error(
    df: DataFrame,
    score_col: str = "quality_prob",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """ECE (Naeini et al., AAAI 2015; the scalar the reliability
    diagram summarizes): sum over equal-width bins of
    (n_b / n) * |pos_rate_b - mean_score_b|.  Built directly on
    :func:`eval.calibration_bins` (exact counts, decimal-exact bin
    means), so the only float work is the |gap| fold over the
    O(n_bins) bin rows — one row out: (ece, n, n_bins_used).  The
    number to report before and after :func:`isotonic_fit` /
    :func:`platt_fit`."""
    from .eval import calibration_bins

    bins = calibration_bins(df, score_col, label_col, n_bins)
    return bins.agg(
        (
            F.coalesce(
                F.sum(
                    F.abs(F.col("pos_rate") - F.col("mean_score"))
                    * F.col("n").cast("double")
                ),
                F.lit(0.0),
            )
            / F.when(F.sum("n") > 0, F.sum("n").cast("double"))
        ).alias("ece"),
        F.coalesce(F.sum("n"), F.lit(0)).cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
    )
