"""Trainable quality classifier — the "fastText filter" shape of web
curation (GPT-3/LLaMA data pipelines: label a small seed of
known-good vs random documents, train a linear classifier on cheap
features, score the whole corpus): logistic regression by full-batch
gradient descent, run as Spark aggregations.

Why hand-rolled rather than MLlib: the engine's determinism contract.
Each GD round's gradient is a SUM over rows of
(sigmoid(w·x) - y) * x_j — float addition is not associative, so a
naive sum makes the learned weights depend on partitioning.  Here
every per-round gradient component accumulates through the repo's
2^52-scaled DECIMAL(38,0) partial sums (the kmeans/LM idiom):
order-free, mergeable, bit-identical weights under any shuffle or
repartitioning (suite-pinned).  The driver receives one
(n_features+1)-vector per round — the sanctioned iterative-algorithm
driver action, same budget class as k-means centroids.

Scale shape: training is n_rounds passes of one partial+final
aggregation over the (feature-projected) training frame — no shuffle
of raw rows, no Python in the loop; scoring is a single map-side
expression (the dot product is a fold over a literal weight array).
Feature standardization (train-set mean/std, applied identically at
scoring) is part of the model, not a caller chore.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import MEAN_SCALE


def _dec_sum(name: str) -> F.Column:
    """Order-free decimal partial sum of a named double column."""
    return F.sum(
        F.expr(f"CAST(`{name}` * {MEAN_SCALE}D AS DECIMAL(38,0))")
    ).cast("double") / F.lit(float(MEAN_SCALE))


def fit_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    n_rounds: int = 50,
    lr: float = 0.5,
    pos_weight: float = 1.0,
    tol: float = 0.0,
) -> dict:
    """Fit w, b on standardized features.  Returns the model dict
    {features, means, stds, weights, bias, rounds_run} that
    :func:`score_logistic` consumes.  ``label_col`` must be 0/1.

    One aggregation per round; weights are bit-deterministic under
    any input partitioning (decimal gradient sums).  Degenerate
    (constant) features standardize with std 1 — their weight then
    stays at whatever the bias absorbs, instead of dividing by zero.

    ``pos_weight`` multiplies the positive class's gradient (and loss)
    contribution — the imbalanced-filter knob (rare good docs in a sea
    of junk: upweight them instead of oversampling).  ``tol`` > 0
    enables early stopping: the same per-round aggregation also
    accumulates the weighted log-loss (decimal sum — deterministic, so
    the stopping round is too), and the loop exits once the mean loss
    improves by less than ``tol``.  Defaults keep the exact historical
    behavior (every round runs, uniform weights).
    """
    # Standardization moments through the SAME order-free decimal sums
    # as the gradients: float avg/stddev are partition-order dependent
    # in the last ulp, and 50+ GD rounds amplify that into visibly
    # different weights (caught by the repartitioning test).  Envelope:
    # |feature| below ~1e22 keeps x·2^52 inside DECIMAL(38,0); beyond
    # that the sum nulls out and the fit fails loudly, not wrongly.
    k = len(feature_cols)
    proj = df.select(
        *[F.col(c).cast("double").alias(f"v{i}") for i, c in enumerate(feature_cols)],
        *[
            (F.col(c).cast("double") * F.col(c).cast("double")).alias(f"q{i}")
            for i, c in enumerate(feature_cols)
        ],
    )
    stats = proj.agg(
        F.count(F.lit(1)).alias("n"),
        *[_dec_sum(f"v{i}").alias(f"m{i}") for i in range(k)],
        *[_dec_sum(f"q{i}").alias(f"s{i}") for i in range(k)],
    ).collect()[0]
    n = stats["n"]
    means, stds = [], []
    for i in range(k):
        mean = float(stats[f"m{i}"]) / n
        var = float(stats[f"s{i}"]) / n - mean * mean
        means.append(mean)
        stds.append(var**0.5 if var > 0 else 1.0)
    # Spread the standardized frame over the cluster before the GD
    # rounds: every round scans it, and inheriting a narrow input
    # layout (e.g. a 3-file read) would serialize all n_rounds passes.
    par = df.sparkSession.sparkContext.defaultParallelism
    z = (
        df.select(
            F.col(label_col).cast("double").alias("y"),
            *[
                (
                    (F.col(c).cast("double") - F.lit(means[i]))
                    / F.lit(stds[i])
                ).alias(f"x{i}")
                for i, c in enumerate(feature_cols)
            ],
        )
        .repartition(par)
        .localCheckpoint(eager=True)
    )

    w = [0.0] * k
    b = 0.0
    # per-row gradient weight: pos_weight for y=1, 1 for y=0
    rw = F.lit(1.0) + F.col("y") * F.lit(float(pos_weight) - 1.0)
    prev_loss = None
    rounds_run = 0
    for _ in range(n_rounds):
        dot = " + ".join(f"({w[i]!r}D * x{i})" for i in range(k)) or "0D"
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.expr(dot) + F.lit(b))))
        err = rw * (p - F.col("y"))
        cols = [
            err.alias("err"),
            *[(err * F.col(f"x{i}")).alias(f"e{i}") for i in range(k)],
        ]
        aggs = [
            _dec_sum("err").alias("gb"),
            *[_dec_sum(f"e{i}").alias(f"g{i}") for i in range(k)],
        ]
        if tol > 0.0:
            # weighted log-loss from the SAME pass (clamped away from
            # log(0); Spark-side ln is deterministic within the engine)
            pc = F.greatest(
                F.least(p, F.lit(1.0 - 1e-15)), F.lit(1e-15)
            )
            cols.append(
                (
                    -rw
                    * (
                        F.col("y") * F.log(pc)
                        + (F.lit(1.0) - F.col("y")) * F.log(F.lit(1.0) - pc)
                    )
                ).alias("ls")
            )
            aggs.append(_dec_sum("ls").alias("loss"))
        g = z.select(*cols).agg(*aggs).collect()[0]
        b -= lr * float(g["gb"]) / n
        for i in range(k):
            w[i] -= lr * float(g[f"g{i}"]) / n
        rounds_run += 1
        if tol > 0.0:
            loss = float(g["loss"]) / n
            if prev_loss is not None and prev_loss - loss < tol:
                break
            prev_loss = loss
    return {
        "features": list(feature_cols),
        "means": means,
        "stds": stds,
        "weights": w,
        "bias": b,
        "rounds_run": rounds_run,
    }


def crossval_logistic(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str = "label",
    k: int = 5,
    by: str | None = None,
    n_rounds: int = 50,
    lr: float = 0.5,
    salt: str = "fold",
) -> list[dict]:
    """k-fold cross-validation of the logistic quality filter: fit on
    k-1 folds, score the held-out fold, report its exact ROC-AUC
    (:func:`operators.eval.roc_auc`).  Folds are md5-hash groups of
    ``by`` (default: the first feature row's identity is NOT usable —
    pass the id/group column; leakage-safe when ``by`` is a dedup
    cluster or source key, per ``operators/splits.py``).

    Returns one dict per fold: {fold, model, auc, n_test}.  Driver
    cost is k sequential fits — each fit is the sanctioned
    one-aggregation-per-round loop; nothing per-row ever reaches the
    driver.
    """
    from .eval import roc_auc
    from .splits import kfold_assign

    if by is None:
        raise ValueError("crossval_logistic needs an id/group column 'by'")
    folded = kfold_assign(df, by, k, salt=salt).localCheckpoint(eager=True)
    out = []
    for fold in range(k):
        train = folded.filter(F.col("fold") != fold)
        test = folded.filter(F.col("fold") == fold)
        model = fit_logistic(
            train, feature_cols, label_col, n_rounds=n_rounds, lr=lr
        )
        scored = score_logistic(test, model)
        out.append(
            {
                "fold": fold,
                "model": model,
                "auc": roc_auc(scored, "quality_prob", label_col),
                "n_test": test.count(),
            }
        )
    return out


def score_logistic(
    df: DataFrame, model: dict, score_col: str = "quality_prob"
) -> DataFrame:
    """Append P(label=1) under the model — a single map-side
    expression (standardization baked in), no join, no UDF."""
    terms = []
    for i, c in enumerate(model["features"]):
        terms.append(
            F.lit(model["weights"][i])
            * (
                (F.col(c).cast("double") - F.lit(model["means"][i]))
                / F.lit(model["stds"][i])
            )
        )
    dot = terms[0] if terms else F.lit(0.0)
    for t in terms[1:]:
        dot = dot + t
    logit = dot + F.lit(model["bias"])
    return df.withColumn(
        score_col, F.lit(1.0) / (F.lit(1.0) + F.exp(-logit))
    )
