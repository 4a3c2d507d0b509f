"""N-gram language-model quality scoring — the CCNet-style filter
(Wenzek et al., LREC'20 "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data"): train a small LM on a trusted
reference corpus, score every candidate document by its per-token
log-probability, and keep the head of the distribution.  The LM here
is an add-alpha-smoothed bigram model — the cheapest model that still
separates fluent text from shuffled or gibberish tokens, and every
training statistic is an integer count, so training is exact and
mergeable.

Scale shape:
- training is ONE partial+final groupBy over the reference corpus's
  exploded bigrams (plus one over unigrams) — associative integer
  counts, so the LM can be unioned across corpus shards or refreshed
  incrementally;
- scoring joins each candidate's exploded bigrams against the LM
  tables on their natural keys (w1, w2)/(w1,) and averages log-probs
  per document: two hash joins and one groupBy on doc_id, no Python,
  no per-row UDF.  A trusted-corpus LM is usually small enough to
  broadcast; the code leaves the strategy to AQE because "small" is a
  deployment fact, not an operator invariant.

Probability model (alpha > 0, V = reference vocab size + 1 for the
unseen type):

    P(w2 | w1) = (c(w1, w2) + alpha) / (c(w1) + alpha * V)

Documents are scored over bigrams (BOS, w1), (w1, w2) ... — the BOS
marker makes one-token documents scorable.  ln() is not IEEE-rounded
across engines, so this family is suite-tested against a Python
reference (1e-9), not hash-oracled.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BOS = "<s>"


def _doc_bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, w1, w2) rows: BOS-prefixed adjacent whitespace-token pairs,
    empty tokens dropped; documents with no tokens emit nothing."""
    seq = F.expr(
        f"concat(array('{BOS}'),"
        f" filter(split({text_col}, '\\\\s+'), t -> t != ''))"
    )
    pairs = F.expr(
        "CASE WHEN size(seq) < 2 THEN"
        " cast(array() as array<struct<w1: string, w2: string>>)"
        " ELSE transform(sequence(1, size(seq) - 1),"
        " i -> struct(element_at(seq, i) as w1,"
        "             element_at(seq, i + 1) as w2)) END"
    )
    return (
        df.select(F.col(id_col), seq.alias("seq"))
        .select(F.col(id_col), F.explode(pairs).alias("p"))
        .select(F.col(id_col), "p.w1", "p.w2")
    )


def train_bigram_lm(
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame, int]:
    """Train on the reference corpus.  Returns
    (bigrams: (w1, w2, c2), unigram_context: (w1, c1), vocab_size)
    where c1 counts w1 AS A BIGRAM CONTEXT (so BOS is included and the
    model is properly normalized: sum_w2 P(w2|w1) = 1) and vocab_size
    is the distinct token count + 1 unseen type."""
    bg = _doc_bigrams(ref, id_col, text_col)
    bigrams = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    contexts = bg.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    vocab_size = (
        bg.select(F.col("w2").alias("w")).distinct().count() + 1
    )
    return bigrams, contexts, vocab_size


def lm_score(
    docs: DataFrame,
    bigrams: DataFrame,
    contexts: DataFrame,
    vocab_size: int,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score candidate documents under the trained LM.  Returns
    (id_col, n_bigrams, avg_logprob) — higher is more reference-like;
    empty documents emit no row (nothing to score).  Unseen contexts
    coalesce to c1 = 0 (the model backs off to the uniform
    alpha / (alpha * V) = 1/V mass)."""
    return _score_agg(
        _logprob_rows(docs, bigrams, contexts, vocab_size, alpha, id_col, text_col),
        id_col,
    )


def _logprob_rows(
    docs, bigrams, contexts, vocab_size, alpha, id_col, text_col
) -> DataFrame:
    """(id, lp) — one smoothed bigram log-probability per position.
    Pure joins + expressions, so the SAME plan runs on a batch frame
    or a stream (the LM tables are the static side of a stream-static
    join in the streaming twin)."""
    bg = _doc_bigrams(docs, id_col, text_col)
    return (
        bg.join(bigrams, ["w1", "w2"], "left")
        .join(contexts, ["w1"], "left")
        .select(
            F.col(id_col),
            F.log(
                (F.coalesce(F.col("c2"), F.lit(0)).cast("double") + F.lit(alpha))
                / (
                    F.coalesce(F.col("c1"), F.lit(0)).cast("double")
                    + F.lit(alpha) * F.lit(float(vocab_size))
                )
            ).alias("lp"),
        )
    )


def _score_agg(scored: DataFrame, id_col: str) -> DataFrame:
    # Order-free mean: float addition is not associative, so a plain
    # avg() would depend on partitioning; the 2^52-scaled DECIMAL(38,0)
    # partial sum (the kmeans_refine idiom) is exact-integer mergeable
    # and bit-deterministic under any shuffle order, at ~1e-16 rounding
    # on each term — far inside the model's own alpha-smoothing slack.
    from .similarity import MEAN_SCALE

    return scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        (
            F.sum(
                F.expr(f"CAST(lp * {MEAN_SCALE}D AS DECIMAL(38,0))")
            ).cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(float(MEAN_SCALE)))
        ).alias("avg_logprob"),
    )


def ccnet_buckets(
    df: DataFrame,
    score_col: str,
    group_col: str | None = None,
    edges: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    lower_is_better: bool = True,
    out_col: str = "bucket",
) -> DataFrame:
    """CCNet's head/middle/tail quality bucketing (Wenzek et al.,
    LREC 2020): documents are ranked by LM score WITHIN their group
    (language — raw perplexities are not comparable across languages)
    and split at the published third-percentile edges.  ``head`` is
    the best third, so with a perplexity-like column (lower is
    better, the default orientation) head = lowest scores; pass
    ``lower_is_better=False`` for ``avg_logprob``-style columns where
    higher means more fluent (orientation flips by negating the score
    before ranking — exact for floats, no epsilon games).

    Built on :func:`operators.eval.percentile_normalize` (exact
    tie-averaged midrank from the two-level prefix sum — deterministic
    under any partitioning, zero SinglePartition stages): bucket =
    head if pct <= edges[0], middle if pct <= edges[1], else tail.
    Tied scores share one midrank so they always land in ONE bucket —
    a tie can never straddle an edge.  NULL scores keep a NULL pct
    and a NULL bucket (unknown, not tail); the ``pct`` column rides
    along for auditing.  Adds one small join per the normalize plan;
    the corpus itself is never re-shuffled."""
    from .eval import percentile_normalize

    if not (0.0 < edges[0] < edges[1] <= 1.0):
        raise ValueError(f"edges must satisfy 0 < e0 < e1 <= 1, got {edges}")
    work = "__ccnet_rank_score"
    oriented = df.withColumn(
        work,
        F.col(score_col).cast("double")
        if lower_is_better
        else -F.col(score_col).cast("double"),
    )
    pcts = percentile_normalize(oriented, work, group_col=group_col)
    return pcts.withColumn(
        out_col,
        F.when(F.col("pct").isNull(), F.lit(None).cast("string"))
        .when(F.col("pct") <= float(edges[0]), F.lit("head"))
        .when(F.col("pct") <= float(edges[1]), F.lit("middle"))
        .otherwise(F.lit("tail")),
    ).drop(work)


def ccnet_threshold_edges(
    df: DataFrame,
    score_col: str,
    group_col: str | None = None,
    edges: tuple[float, float] = (1.0 / 3.0, 2.0 / 3.0),
    lower_is_better: bool = True,
) -> DataFrame:
    """Freeze :func:`ccnet_buckets`' split as per-group SCORE cutoffs —
    the static side a streaming ingest twin can broadcast (the frozen
    keep-set pattern of streaming_categorical_drift).  Returns one row
    per group: (group_col?, head_cut, middle_cut) where the cuts are
    the largest ORIENTED score (score, or -score when
    ``lower_is_better=False``) whose midrank percentile is inside the
    respective edge.  Because the percentile is monotone in the
    oriented score, ``oriented <= head_cut`` decides head EXACTLY as
    the batch percentile does on the reference rows — suite-pinned.
    A group whose smallest percentile already exceeds an edge gets a
    NULL cut (nothing can enter that bucket at these thresholds)."""
    bucketed = ccnet_buckets(
        df, score_col, group_col, edges, lower_is_better, out_col="__b"
    ).withColumn(
        "__oriented",
        F.col(score_col).cast("double")
        if lower_is_better
        else -F.col(score_col).cast("double"),
    )
    aggs = [
        F.max(F.when(F.col("__b") == "head", F.col("__oriented"))).alias("head_cut"),
        F.max(
            F.when(F.col("__b").isin("head", "middle"), F.col("__oriented"))
        ).alias("middle_cut"),
    ]
    if group_col:
        return bucketed.groupBy(group_col).agg(*aggs)
    return bucketed.agg(*aggs)


# ---------------------------------------------------------------------------
# Stupid-backoff trigram LM (Brants et al., EMNLP 2007 "Large Language
# Models in Machine Translation").  The published web-scale recipe: raw
# relative frequencies, no discounting, a fixed backoff penalty lambda
# per level — chosen by Google's MT group precisely BECAUSE it trains as
# pure distributed counting (associative integer groupBys, no held-out
# normalization pass), which is the 100 TB shape this engine wants.
#
#   S(c | a b) = c3(a,b,c)/c2ctx(a,b)                 if c3 > 0
#              = lambda * c2(b,c)/c1ctx(b)            elif c2 > 0
#              = lambda^2 * (c1(c)+alpha)/(N+alpha*V) otherwise
#
# The unigram floor deviates from the paper in one documented way: the
# paper scores a closed giga-vocabulary and never meets an unseen word;
# an open-corpus filter must, so the unigram level is add-alpha smoothed
# (the lm.py bigram convention) and out-of-vocabulary tokens get the
# finite lambda^2 * alpha/(N+alpha*V) floor instead of -inf.
#
# Float discipline (the nb.py pattern): the backoff score is resolved
# and log-quantized ONCE per DISTINCT (a,b,c) gram of the scoring corpus
# — one f64 log rounded to a 2^52-scaled DECIMAL(38,0) in the JVM — and
# per-document sums are pure integer arithmetic afterwards, so scores
# are bit-identical under any partitioning.  ln() is not IEEE-portable
# across engines, so the score family pins against a Python replica
# (1e-9) like lm_score; the count tables are integer-exact and
# DuckDB-oracle-able.
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class BackoffLM:
    """Trained stupid-backoff model.  ``tri``/``bi``/``uni`` are sparse
    count tables, ``bi_ctx``/``uni_ctx`` the matching context masses
    (derived from ``tri`` by aggregation, so every level is consistent
    with the same padded-position multiset by construction);
    ``n_tokens``/``vocab_size`` are the two sanctioned driver scalars."""

    tri: DataFrame       # (a, b, c, c3)
    bi_ctx: DataFrame    # (a, b, c2ctx)  = sum_c c3
    bi: DataFrame        # (b, c, c2)     = sum_a c3
    uni_ctx: DataFrame   # (b, c1ctx)     = sum_{a,c} c3
    uni: DataFrame       # (c, c1)        = sum_{a,b} c3
    n_tokens: int        # N  = total scored positions
    vocab_size: int      # V  = distinct predicted tokens + 1 unseen

    def materialized(self) -> "BackoffLM":
        """Pin all five tables with eager localCheckpoints — required
        before stream-static joins (a lazy static side re-derives from
        the training corpus every micro-batch) and the right move for
        any repeated scoring."""
        return BackoffLM(
            tri=self.tri.localCheckpoint(eager=True),
            bi_ctx=self.bi_ctx.localCheckpoint(eager=True),
            bi=self.bi.localCheckpoint(eager=True),
            uni_ctx=self.uni_ctx.localCheckpoint(eager=True),
            uni=self.uni.localCheckpoint(eager=True),
            n_tokens=self.n_tokens,
            vocab_size=self.vocab_size,
        )


def _doc_trigram_positions(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, a, b, c): one row per token, double-BOS padded, so every
    token is scored with its full (possibly synthetic) bigram context.
    Empty documents emit nothing (nothing to score)."""
    seq = F.expr(
        f"concat(array('{BOS}', '{BOS}'),"
        f" filter(split({text_col}, '\\\\s+'), t -> t != ''))"
    )
    grams = F.expr(
        "CASE WHEN size(seq) < 3 THEN"
        " cast(array() as array<struct<a: string, b: string, c: string>>)"
        " ELSE transform(sequence(3, size(seq)),"
        " i -> struct(element_at(seq, i - 2) as a,"
        "             element_at(seq, i - 1) as b,"
        "             element_at(seq, i) as c)) END"
    )
    return (
        df.select(F.col(id_col), seq.alias("seq"))
        .select(F.col(id_col), F.explode(grams).alias("g"))
        .select(F.col(id_col), "g.a", "g.b", "g.c")
    )


def train_backoff_lm(
    ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> BackoffLM:
    """Train on the reference corpus: ONE groupBy over the exploded
    trigram positions builds the trigram table; every lower level is
    aggregated from it (tables the size of the MODEL, not the corpus),
    so all five tables describe the identical position multiset and the
    trigram ratios are properly bounded (c3 <= c2ctx, c2 <= c1ctx).
    The corpus is exploded exactly once."""
    pos = _doc_trigram_positions(ref, id_col, text_col)
    tri = pos.groupBy("a", "b", "c").agg(F.count(F.lit(1)).cast("long").alias("c3"))
    bi_ctx = tri.groupBy("a", "b").agg(F.sum("c3").cast("long").alias("c2ctx"))
    bi = tri.groupBy("b", "c").agg(F.sum("c3").cast("long").alias("c2"))
    uni_ctx = bi.groupBy("b").agg(F.sum("c2").cast("long").alias("c1ctx"))
    uni = bi.groupBy("c").agg(F.sum("c2").cast("long").alias("c1"))
    totals = uni.agg(
        F.coalesce(F.sum("c1"), F.lit(0)).alias("n"),
        F.count(F.lit(1)).alias("v"),
    ).collect()[0]
    return BackoffLM(
        tri=tri,
        bi_ctx=bi_ctx,
        bi=bi,
        uni_ctx=uni_ctx,
        uni=uni,
        n_tokens=int(totals["n"]),
        vocab_size=int(totals["v"]) + 1,
    )


def _backoff_log_scaled(lm: BackoffLM, lam: float, alpha: float):
    """The per-gram backoff log score scaled by 2^52 and cast to
    DECIMAL(38,0) IN THE JVM — the single double->decimal rounding of
    the scoring plan (shared by the batch scorer and any streaming
    twin, so both start from the identical integer)."""
    from .similarity import MEAN_SCALE

    floor_den = float(lm.n_tokens) + float(alpha) * float(lm.vocab_size)
    score = (
        F.when(
            F.col("c3").isNotNull(),
            F.col("c3").cast("double") / F.col("c2ctx").cast("double"),
        )
        .when(
            F.col("c2").isNotNull(),
            F.lit(float(lam))
            * F.col("c2").cast("double")
            / F.col("c1ctx").cast("double"),
        )
        .otherwise(
            F.lit(float(lam) * float(lam))
            * (F.coalesce(F.col("c1"), F.lit(0)).cast("double") + F.lit(float(alpha)))
            / F.lit(floor_den)
        )
    )
    return (F.log(score) * F.lit(float(MEAN_SCALE))).cast("decimal(38,0)")


def backoff_lm_score(
    docs: DataFrame,
    lm: BackoffLM,
    lam: float = 0.4,
    alpha: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Score candidate documents under the trained model.  Returns
    (id_col, n_tokens, avg_logscore, n_tri, n_bi, n_uni, n_oov) —
    higher avg_logscore is more reference-like; the four disjoint level
    counters (n_tri + n_bi + n_uni + n_oov = n_tokens) audit how deep
    the model had to back off (a document scored mostly at the OOV
    floor is out-of-domain no matter its average).  Empty documents
    emit no row.

    Plan: explode positions -> DISTINCT grams -> five left hash joins
    against the model tables -> resolve + log-quantize once per gram ->
    join the integer scores back to the positions -> one integer
    groupBy per document.  The distinct-resolve both bounds the log
    math to O(gram types) and makes the join-back a skinny
    (gram, integer) table; model tables are usually broadcast-sized,
    and the code leaves that to AQE (deployment fact, not operator
    invariant)."""
    if not (0.0 < lam <= 1.0):
        raise ValueError(f"lam must be in (0, 1], got {lam}")
    if alpha <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")
    if lm.n_tokens <= 0:
        raise ValueError("backoff_lm_score: model trained on an empty corpus")
    pos = _doc_trigram_positions(docs, id_col, text_col)
    resolved = _backoff_join_and_resolve(
        pos.select("a", "b", "c").distinct(), lm, lam, alpha, ("a", "b", "c")
    )
    return _backoff_agg(pos.join(resolved, ["a", "b", "c"]), id_col)


def _backoff_join_and_resolve(rows, lm, lam, alpha, keep: tuple[str, ...]):
    """Left-join the five model tables and resolve the quantized log
    score + backoff level.  Shared by the batch scorer (per DISTINCT
    gram) and the streaming twin (per position row — a streaming frame
    cannot self-join its own distinct, but the resolving expression is
    the same, so the integers match bit-for-bit either way)."""
    return (
        rows.join(lm.tri, ["a", "b", "c"], "left")
        .join(lm.bi_ctx, ["a", "b"], "left")
        .join(lm.bi, ["b", "c"], "left")
        .join(lm.uni_ctx, ["b"], "left")
        .join(lm.uni, ["c"], "left")
        .select(
            *keep,
            _backoff_log_scaled(lm, lam, alpha).alias("__lp_int"),
            F.when(F.col("c3").isNotNull(), F.lit("tri"))
            .when(F.col("c2").isNotNull(), F.lit("bi"))
            .when(F.col("c1").isNotNull(), F.lit("uni"))
            .otherwise(F.lit("oov"))
            .alias("__level"),
        )
    )


def _backoff_agg(rows, id_col: str):
    """Per-document integer aggregation over (__lp_int, __level) rows —
    the decimal sum is order-free and mergeable, so the same expression
    serves batch and update-mode streaming."""
    from .similarity import MEAN_SCALE

    return rows.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"),
        (
            F.sum("__lp_int").cast("double")
            / (F.count(F.lit(1)).cast("double") * F.lit(float(MEAN_SCALE)))
        ).alias("avg_logscore"),
        F.sum((F.col("__level") == "tri").cast("long")).alias("n_tri"),
        F.sum((F.col("__level") == "bi").cast("long")).alias("n_bi"),
        F.sum((F.col("__level") == "uni").cast("long")).alias("n_uni"),
        F.sum((F.col("__level") == "oov").cast("long")).alias("n_oov"),
    )
