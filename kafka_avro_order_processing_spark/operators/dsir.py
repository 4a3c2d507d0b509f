"""DSIR — Data Selection via Importance Resampling (Xie et al.,
NeurIPS 2023) over hashed n-gram features, as pure Spark plans.

The published pipeline for picking pretraining data that "looks like"
a small high-quality target corpus: estimate bag-of-hashed-ngram
categorical distributions for the target (p) and the raw pool (q),
weight every raw document by its log importance ratio

    log w(d) = sum over hashed features b of d:  c_d(b) * (log p_b - log q_b)

and resample without replacement via Gumbel-top-k on the weights.
This is the third member of the engine's data-selection family next to
the CCNet perplexity buckets (operators/lm.py) and the trainable NB
classifier (operators/nb.py) — DSIR needs NO trained LM and no labels,
just the target corpus itself.

Engineering choices:

- **Features** are word unigrams + bigrams (the paper's configuration)
  hashed into ``n_buckets`` cells with the engine's portable salted-md5
  bucket idiom (first 4 hex digits of ``md5('dsir:' || gram)``) — the
  same cross-engine-replicable construction as the split/sample family,
  so the COUNT tables carry DuckDB oracles.  Word splitting is the
  standing ASCII ``split(text, '\\s+')`` contract.
- **Float discipline** is the NB scheme (operators/nb.py): ``ln`` is
  not IEEE-portable across engines, so each bucket's log ratio is
  computed as ONE f64 expression of exact integer counts and rounded
  ONCE per bucket to a 2^52-scaled DECIMAL(38,0) integer in the JVM
  (:func:`_log_ratio_scaled`); per-document sums are then pure integer
  arithmetic (cnt x scaled ratio) — bit-identical under any
  partitioning, and the streaming twin (streaming/dsir.py) collects
  the very same integers, so ingest weights BIT-match batch.
- **Gumbel noise** is hash-derived, not rand(): u = (13-hex-digit md5
  draw + 0.5) / 2^52 in (0, 1), g = -ln(-ln(u)) — the generator
  family's deterministic-draw idiom, so the "random" resample is a
  stable property of (seed, doc_id): reruns and engines agree, and the
  sample is still distributed exactly as Gumbel-top-k requires.

Scale shape: fitting is two integer groupBys over exploded features
(word-count class); the ratio table is O(n_buckets) rows — a
broadcastable dimension (10k buckets in the paper).  Scoring is one
broadcast join of sparse per-doc counts against that table — O(doc
length) work per doc, never O(n_buckets).  Resampling is a global
top-k (TakeOrderedAndProject — no full sort materialization).  No
all-pairs anywhere; skew is bounded by the busiest hash bucket, which
the salted md5 keeps uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .similarity import MEAN_SCALE

#: Paper configuration: 10k hash buckets is the published default; the
#: tests use smaller B to force collisions.
DEFAULT_BUCKETS = 10_000

#: Salt for the feature hash — fixed so the fitted table and any later
#: scoring run agree on the bucketing.
_FEATURE_SALT = "dsir:"


def _bucket_expr(gram_col: str, n_buckets: int):
    """Portable hash bucket of a gram: first 4 hex digits of the
    salted md5, mod ``n_buckets`` — exactly replicable in ANSI SQL via
    the strpos-per-digit idiom (see the DuckDB oracle in
    tests/test_dsir.py)."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(_FEATURE_SALT), F.col(gram_col))), 1, 4
            ),
            16,
            10,
        ).cast("int")
        % F.lit(int(n_buckets))
    )


def _grams_expr(text_col: str) -> str:
    """SQL: word unigrams + bigrams of the text (ASCII-whitespace
    split, the standing contract).  Empty/NULL text -> empty array;
    the bigram branch guards the descending sequence(1, 0) gotcha."""
    ws = f"filter(split({text_col}, '\\\\s+'), w -> w != '')"
    return (
        f"CASE WHEN {text_col} IS NULL THEN cast(array() as array<string>) "
        f"ELSE concat({ws}, CASE WHEN size({ws}) >= 2 THEN "
        f"transform(sequence(1, size({ws}) - 1), "
        f"i -> concat(element_at({ws}, i), ' ', element_at({ws}, i + 1))) "
        f"ELSE cast(array() as array<string>) END) END"
    )


def dsir_features(
    docs: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Sparse per-document hashed feature counts:
    (id_col, bucket, cnt).  Docs with no words contribute no rows
    (downstream weight joins are left joins from the doc base)."""
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    return (
        docs.select(
            F.col(id_col),
            F.explode(F.expr(_grams_expr(text_col))).alias("gram"),
        )
        .select(F.col(id_col), _bucket_expr("gram", n_buckets).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def _bucket_totals(features: DataFrame) -> DataFrame:
    """(bucket, n) totals of a sparse feature table."""
    return features.groupBy("bucket").agg(
        F.sum("cnt").cast("long").alias("n")
    )


def _log_ratio_scaled(alpha: float, n_buckets: int):
    """Per-bucket ``log p_b - log q_b`` (add-alpha smoothed), scaled by
    2^52 and rounded to an integer IN THE JVM — the single
    double->decimal cast of the scoring path, shared verbatim by
    :func:`dsir_fit` and the streaming artifact collector.  Expects
    columns ``t`` (target count), ``r`` (raw count),
    ``tot_t``/``tot_r`` (corpus totals — NOT ``T``/``R``: Spark
    resolves column names case-insensitively by default)."""
    a = float(alpha)
    b = float(int(n_buckets))
    p = (F.col("t").cast("double") + F.lit(a)) / (
        F.col("tot_t").cast("double") + F.lit(a) * F.lit(b)
    )
    q = (F.col("r").cast("double") + F.lit(a)) / (
        F.col("tot_r").cast("double") + F.lit(a) * F.lit(b)
    )
    return ((F.log(p) - F.log(q)) * F.lit(float(MEAN_SCALE))).cast(
        "decimal(38,0)"
    )


def dsir_fit(
    target_features: DataFrame,
    raw_features: DataFrame,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
) -> DataFrame:
    """The fitted importance table: (bucket, t, r, ratio_int) for
    EVERY bucket 0..n_buckets-1 (absent buckets smooth to the alpha
    floor), where ``ratio_int`` is the 2^52-scaled quantized
    ``log p_b - log q_b``.  O(n_buckets) rows — broadcast it into
    scoring joins."""
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    spark = target_features.sparkSession
    base = spark.range(int(n_buckets)).select(
        F.col("id").cast("int").alias("bucket")
    )
    t = _bucket_totals(target_features).withColumnRenamed("n", "t")
    r = _bucket_totals(raw_features).withColumnRenamed("n", "r")
    joined = (
        base.join(t, "bucket", "left")
        .join(r, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("t", F.lit(0)).cast("long").alias("t"),
            F.coalesce("r", F.lit(0)).cast("long").alias("r"),
        )
    )
    totals = joined.agg(
        F.sum("t").cast("long").alias("tot_t"),
        F.sum("r").cast("long").alias("tot_r"),
    )
    return (
        joined.crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            "t",
            "r",
            _log_ratio_scaled(alpha, n_buckets).alias("ratio_int"),
        )
    )


def dsir_log_weights(
    docs: DataFrame,
    raw_features: DataFrame,
    ratios: DataFrame,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document log importance weight: (id_col, log_weight).
    Every document in ``docs`` gets a row (featureless docs weigh
    exactly 0.0 — the neutral ratio).  One broadcast join + one
    integer sum: bit-identical under any partitioning."""
    scored = (
        raw_features.join(
            F.broadcast(ratios.select("bucket", "ratio_int")), "bucket"
        )
        .select(
            F.col(id_col),
            (F.col("cnt").cast("decimal(18,0)") * F.col("ratio_int"))
            .cast("decimal(38,0)")
            .alias("__term_int"),
        )
        .groupBy(id_col)
        .agg(
            (
                F.sum("__term_int").cast("double")
                / F.lit(float(MEAN_SCALE))
            ).alias("__lw")
        )
    )
    return (
        docs.select(F.col(id_col))
        .distinct()
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("__lw", F.lit(0.0)).alias("log_weight"),
        )
    )


def _gumbel_expr(id_col: str, seed: int):
    """Deterministic standard-Gumbel draw per document: u from the
    13-hex-digit (52-bit) salted-md5 draw mapped to (0, 1) open — the
    generator family's idiom — then g = -ln(-ln(u))."""
    draw = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit(f"dsir-gumbel:{int(seed)}:"),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            13,
        ),
        16,
        10,
    ).cast("double")
    u = (draw + F.lit(0.5)) / F.lit(float(MEAN_SCALE))
    return -F.log(-F.log(u))


def dsir_resample(
    weights: DataFrame,
    k: int,
    seed: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel-top-k resampling WITHOUT replacement (the paper's
    sampler): keep the k documents with the largest
    ``log_weight + Gumbel(id, seed)``.  Output: (id_col, log_weight,
    key) sorted by key desc — deterministic given the seed (ties break
    on id ascending), and distributed exactly as sampling k docs with
    probability proportional to their importance weights.  Global
    top-k, not a full sort: Spark plans ORDER BY + LIMIT as
    TakeOrderedAndProject (per-partition heaps + one k-row merge)."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    return (
        weights.select(
            F.col(id_col),
            "log_weight",
            (F.col("log_weight") + _gumbel_expr(id_col, seed)).alias("key"),
        )
        .orderBy(F.desc("key"), F.asc(id_col))
        .limit(int(k))
    )


def dsir_select(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    k: int,
    n_buckets: int = DEFAULT_BUCKETS,
    alpha: float = 1.0,
    seed: int = 0,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """The whole published pipeline in one call: featurize both
    corpora, fit the ratio table, weight the raw pool, Gumbel-top-k
    resample.  Returns (id_col, log_weight, key) of the k selected raw
    documents."""
    tf = dsir_features(target_docs, n_buckets, id_col, text_col)
    rf = dsir_features(raw_docs, n_buckets, id_col, text_col)
    ratios = dsir_fit(tf, rf, n_buckets, alpha)
    w = dsir_log_weights(raw_docs, rf, ratios, id_col)
    return dsir_resample(w, k, seed, id_col)


__all__ = [
    "DEFAULT_BUCKETS",
    "dsir_features",
    "dsir_fit",
    "dsir_log_weights",
    "dsir_resample",
    "dsir_select",
]
