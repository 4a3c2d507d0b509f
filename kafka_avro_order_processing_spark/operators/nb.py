"""Trainable multinomial Naive Bayes over character n-grams — the
langid.py / fastText-lite classifier shape for corpus-scale
language / domain / source identification, as pure Spark plans.

Why this operator: the engine's heuristic ``text.language_id`` covers
the fixed-rule case and ``classifier.fit_logistic`` covers numeric
features; a TRAINABLE text classifier over char n-grams is the
published workhorse between them (Cavnar & Trenkle 1994 n-gram text
categorization; langid.py, Lui & Baldwin 2012) — label a seed corpus,
train integer count tables, score everything map-shaped.

Model (multinomial NB with add-alpha smoothing, the standard form):

  score(c, d) = log P(c) + sum over grams g of d:
                  cnt_d(g) * log( (cnt_c(g) + a) / (T_c + a*V) )

with V = number of distinct grams in the TRAINING corpus, T_c = total
gram count of class c, and grams unseen at training time SKIPPED (the
fixed-vocabulary convention of sklearn/langid — an unknown gram says
nothing about any class).  The implementation never materializes the
dense (doc x class x vocab) cube; it rewrites the sum as

  baseline(c)   = n_d_vocab * log( a / (T_c + a*V) )      [per class]
  correction(c) = sum over g with cnt_c(g) > 0 of
                  cnt_d(g) * log( (cnt_c(g) + a) / a )

(the denominators cancel in the correction), so scoring is ONE join
of the doc-gram counts against the sparse feature table + one
(doc, class) aggregation + a broadcast of the tiny class-constant
frame.  Float discipline: every log term is one f64 log of exact
integers, rounded ONCE per (gram, label) to a 2^52-scaled
DECIMAL(38,0) integer in the JVM; per-(doc, class) sums are then
pure integer arithmetic (cnt x scaled term) — bit-identical under
any partitioning, and the streaming twin (streaming/nb.py) inherits
the exact same integers by collecting them, so its predictions
BIT-match without replicating Java's double->string digit
generation.  ln() is not IEEE-portable across engines, so scores pin
against a Python replica (the lm.py convention); the TRAINING tables
are pure integer counts and carry a DuckDB oracle.

Scale shape: training is two integer groupBys over the exploded gram
stream (the word-count class of job); scoring shuffles only
(doc, gram, cnt) pairs into a sparse join — O(doc length), never
O(vocab) per doc; the class-constant and prior frames are
broadcast literals-sized (n_classes rows).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _log_term_scaled(alpha: float):
    """The per-(gram, label) correction term ``log((count+a)/a)``
    scaled by 2^52 and rounded to an integer IN THE JVM — the single
    double->decimal cast of the scoring plan.  Shared verbatim by
    :func:`nb_score` and the streaming artifact collector
    (streaming/nb.py) so both sides start from the identical integer:
    the JVM cast's digit generation (Java's ``Double.toString``, which
    pre-Ryu emits non-minimal digits) never needs replicating."""
    from .similarity import MEAN_SCALE

    return (
        F.log(
            (F.col("count").cast("double") + F.lit(float(alpha)))
            / F.lit(float(alpha))
        )
        * F.lit(float(MEAN_SCALE))
    ).cast("decimal(38,0)")


def _gram_expr(text_col: str, n: int) -> str:
    """SQL: all character n-grams of the column (empty array when the
    text is shorter than n — guard for the descending sequence(1, 0)
    gotcha)."""
    return (
        f"CASE WHEN {text_col} IS NULL OR length({text_col}) < {n}"
        " THEN cast(array() as array<string>)"
        f" ELSE transform(sequence(1, length({text_col}) - {n} + 1),"
        f" i -> substring({text_col}, i, {n})) END"
    )


def nb_train(
    docs: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n: int = 3,
) -> tuple[DataFrame, DataFrame, int]:
    """Train the count tables: returns ``(priors, features, n_vocab)``
    where ``priors`` is (label, n_docs, n_grams) — document counts for
    the prior and total gram mass T_c — ``features`` is the sparse
    (label, gram, count) table, and ``n_vocab`` is the distinct-gram
    count V of the training corpus (one driver scalar, the sanctioned
    budget).  Rows with a NULL label are rejected loudly — silently
    dropping labeled data corrupts the priors."""
    if n < 1:
        raise ValueError(f"n must be >= 1, got {n}")
    n_null = docs.filter(F.col(label_col).isNull()).count()
    if n_null:
        raise ValueError(
            f"nb_train: {n_null} rows have a NULL {label_col!r} — "
            "filter or impute labels explicitly before training"
        )
    grams = docs.select(
        F.col(label_col).alias("label"),
        F.explode(F.expr(_gram_expr(text_col, n))).alias("gram"),
    )
    features = grams.groupBy("label", "gram").agg(
        F.count(F.lit(1)).cast("long").alias("count")
    )
    gram_mass = features.groupBy("label").agg(
        F.sum("count").cast("long").alias("n_grams")
    )
    priors = (
        docs.groupBy(F.col(label_col).alias("label"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .join(gram_mass, "label", "left")
        .select(
            "label",
            "n_docs",
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
        )
    )
    n_vocab = features.select("gram").distinct().count()
    return priors, features, int(n_vocab)


def nb_score(
    docs: DataFrame,
    priors: DataFrame,
    features: DataFrame,
    n_vocab: int,
    alpha: float = 1.0,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-(doc, class) log scores: (id_col, label, log_score,
    n_vocab_grams).  Every document gets a row for EVERY trained
    class (a doc with zero in-vocabulary grams scores each class by
    its log prior alone).  Bit-deterministic under any partitioning
    (decimal-scaled term sums)."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    from .similarity import MEAN_SCALE

    pri = priors.collect()  # n_classes rows — broadcast-literal scale
    if not pri:
        raise ValueError("nb_score: empty priors table")
    n_total_docs = sum(r["n_docs"] for r in pri)
    spark = docs.sparkSession
    consts = spark.createDataFrame(
        [
            (
                r["label"],
                math.log(r["n_docs"] / n_total_docs),
                math.log(alpha / (r["n_grams"] + alpha * n_vocab)),
            )
            for r in pri
        ],
        "label string, log_prior double, log_miss double",
    )

    dg = (
        docs.select(
            F.col(id_col), F.explode(F.expr(_gram_expr(text_col, n))).alias("gram")
        )
        .groupBy(id_col, "gram")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    # in-vocabulary gram mass per doc (semi-join against the vocab)
    vocab = features.select("gram").distinct()
    doc_mass = (
        dg.join(vocab, "gram", "leftsemi")
        .groupBy(id_col)
        .agg(F.sum("cnt").cast("long").alias("n_vocab_grams"))
    )
    base = docs.select(F.col(id_col)).distinct().join(doc_mass, id_col, "left")
    base = base.select(
        F.col(id_col),
        F.coalesce("n_vocab_grams", F.lit(0)).cast("long").alias("n_vocab_grams"),
    )
    # correction terms: only (gram, label) pairs the class actually
    # saw.  The ONLY double->decimal rounding happens ONCE per
    # (gram, label) on the log term itself (log_term_scaled below);
    # after that everything is integer-exact decimal arithmetic
    # (cnt * scaled term, summed), so the per-(doc, class) sum is
    # bit-identical under any partitioning AND trivially replicable
    # outside the JVM (streaming/nb.py collects these same scaled
    # integers).  Rounding cnt*term per row instead (the old scheme)
    # would pin the result to Java's Double.toString digit generation
    # — not reproducible from Python for arbitrary magnitudes.
    corr = (
        dg.join(features, "gram")
        .select(
            F.col(id_col),
            "label",
            (
                F.col("cnt").cast("decimal(18,0)")
                * _log_term_scaled(alpha)
            ).cast("decimal(38,0)").alias("__term_int"),
        )
        .groupBy(id_col, "label")
        .agg(
            (
                F.sum("__term_int").cast("double")
                / F.lit(float(MEAN_SCALE))
            ).alias("__corr")
        )
    )
    out = (
        base.crossJoin(F.broadcast(consts))
        .join(corr, [id_col, "label"], "left")
        .select(
            F.col(id_col),
            "label",
            (
                F.col("log_prior")
                + F.col("n_vocab_grams").cast("double") * F.col("log_miss")
                + F.coalesce("__corr", F.lit(0.0))
            ).alias("log_score"),
            "n_vocab_grams",
        )
    )
    return out


def nb_predict(
    docs: DataFrame,
    priors: DataFrame,
    features: DataFrame,
    n_vocab: int,
    alpha: float = 1.0,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Argmax over :func:`nb_score`: (id_col, label, log_score,
    margin) — ``margin`` is the winner's lead over the runner-up in
    log space (NULL with a single trained class), the standard
    low-confidence routing signal.  Ties break on label ascending (a
    total order — deterministic)."""
    scored = nb_score(
        docs, priors, features, n_vocab, alpha, n, id_col, text_col
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("log_score"), F.asc("label"))
    ranked = scored.withColumn("__rk", F.row_number().over(w)).withColumn(
        "__next", F.lead("log_score").over(w)
    )
    return ranked.filter(F.col("__rk") == 1).select(
        F.col(id_col),
        "label",
        "log_score",
        (F.col("log_score") - F.col("__next")).alias("margin"),
    )
