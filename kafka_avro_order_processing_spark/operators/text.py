"""Text-analysis operators for training-data pipelines (SURVEY.md §7 M5).

Tokenization, per-document statistics, corpus token frequencies,
heuristic language-ID, quality scoring, and content fingerprinting —
all as pure Column expressions (zero Python in the hot path; at 100 TB
these run inside whole-stage codegen over the parquet scan).

Portability rule: anything compared against an ANSI oracle uses md5 and
integer arithmetic (identical across engines); ratios are double
divisions of identical integer operands, hence bit-deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny per-language word profiles for the heuristic scorer.  Real
#: pipelines plug in character-n-gram profiles per language; the
#: mechanism (score = profile hits, argmax with fixed tie order) is
#: what the engine provides.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "fast", "small"),
    "es": ("order", "data", "valor", "tabla"),
    "de": ("der", "und", "stream", "batch"),
}

STOPWORDS: tuple[str, ...] = ("the", "a", "of", "and")


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Split on the LITERAL separator (F.split takes a regex — an
    unescaped '.' or '|' would split between every character)."""
    import re

    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, re.escape(sep))


def doc_token_stats(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Per-document token statistics: counts, distinct counts, lengths."""
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    sum_len = F.aggregate(
        F.transform(toks, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x
    ).cast("long")
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        (sum_len.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
    )


def token_counts(
    df: DataFrame, text_col: str = "text", k: int | None = None
) -> DataFrame:
    """Corpus word frequencies (explode -> partial+final count agg); the
    classic first shuffle of any corpus pipeline.  Optional global top-k
    (TakeOrderedAndProject — no full sort)."""
    out = (
        df.select(F.explode(tokens(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("n"))
    )
    if k is not None:
        out = out.orderBy(F.desc("n"), F.asc("token")).limit(k)
    return out


def language_id(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    profiles: dict[str, tuple[str, ...]] = LANG_PROFILES,
) -> DataFrame:
    """Heuristic language ID: per-language profile-hit score over the
    token set, argmax with deterministic tie order (profile dict order)."""
    toks = F.array_distinct(tokens(text_col))
    scores = {
        lang: F.size(F.array_intersect(toks, F.array(*[F.lit(w) for w in words])))
        for lang, words in profiles.items()
    }
    langs = list(profiles)
    # argmax with first-wins tie-break in declared order
    pred = F.lit(langs[-1])
    for lang in reversed(langs[:-1]):
        later = [scores[l] for l in langs[langs.index(lang) + 1:]]
        cond = scores[lang] >= later[0]
        for c in later[1:]:
            cond = cond & (scores[lang] >= c)
        pred = F.when(cond, F.lit(lang)).otherwise(pred)
    out_cols = [F.col(id_col)]
    if "lang" in df.columns:
        out_cols.append(F.col("lang"))
    return df.select(*out_cols, pred.alias("predicted_lang"))


def quality_score(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: tuple[str, ...] = STOPWORDS,
) -> DataFrame:
    """Document quality heuristics: length, lexical diversity, stopword
    ratio, and a combined [0,1] score.  All ratios are double divisions
    of exact integer counts."""
    toks = tokens(text_col)
    n = F.size(toks).cast("double")
    n_distinct = F.size(F.array_distinct(toks)).cast("double")
    stop_arr = F.array(*[F.lit(w) for w in stopwords])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, x))).cast("double")
    diversity = n_distinct / n
    stop_ratio = n_stop / n
    return df.select(
        F.col(id_col),
        n.cast("long").alias("n_tokens"),
        diversity.alias("lexical_diversity"),
        stop_ratio.alias("stopword_ratio"),
        (F.lit(0.5) * diversity + F.lit(0.5) * (F.lit(1.0) - stop_ratio)).alias("quality"),
    )


def doc_fingerprint(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Content fingerprint: md5 of the lowercased text plus a 16-hex
    prefix for bucketing.  The exact-dedup key (dedup.py builds on it)."""
    fp = F.md5(F.lower(F.col(text_col)))
    return df.select(
        F.col(id_col),
        fp.alias("fingerprint"),
        F.substring(fp, 1, 16).alias("fingerprint_prefix"),
    )


def repetition_stats(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Intra-document repetition: fraction of word n-grams that are
    duplicates of an earlier n-gram in the same document — the
    Gopher-style repetition filter (boilerplate/looping text scores
    high).  Bag-semantics shingles, one partial+final aggregation per
    doc; docs shorter than n tokens have no n-grams and drop out."""
    from .dedup import shingle_rows

    grams = shingle_rows(df, id_col, text_col, n, distinct=False)
    return grams.groupBy(id_col).agg(
        F.count("*").alias("n_grams"),
        F.countDistinct("shingle").alias("n_distinct_grams"),
        (
            F.lit(1.0)
            - F.countDistinct("shingle").cast("double") / F.count("*").cast("double")
        ).alias("repetition_ratio"),
    )


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    topk: int = 20,
) -> DataFrame:
    """BM25 document ranking for a fixed query-term set (Robertson/
    Sparck Jones probabilistic relevance; the standard retrieval scorer
    a curation pipeline uses to mine topic-relevant training docs).

    Two cross-engine determinism choices (see module docstring):

    - the idf keeps the classic rational core (N - df + 0.5)/(df + 0.5)
      WITHOUT the log wrap — log is monotone, so rankings are identical,
      and libm rounding is the only thing the log would add;
    - the per-doc score sums its per-term contributions in FIXED query
      order via one conditional sum per term (float addition is not
      associative; a bag SUM would be partial-aggregation-order
      dependent), then adds them left-to-right.

    avgdl is exact: token counts are integers, so their double sum is
    order-independent (< 2^53) and avg = sum/n is one deterministic
    division.

    One explode + two aggregations (per-doc tf for the query terms,
    corpus df/avgdl as a broadcast single row); the explode only emits
    query-term hits, so the shuffle is O(matching tokens), not
    O(corpus tokens).
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("token"))
    dl = df.select(
        F.col(id_col), F.size(tokens(text_col)).cast("double").alias("dl")
    )
    hits = tok.filter(F.col("token").isin(*terms))
    tf = hits.groupBy(id_col, "token").agg(F.count("*").cast("double").alias("tf"))
    dfreq = hits.groupBy("token").agg(
        F.countDistinct(id_col).cast("double").alias("df")
    )
    stats = df.agg(
        F.count("*").cast("double").alias("n_docs"),
        (F.sum(F.size(tokens(text_col)).cast("double")) / F.count("*")).alias("avgdl"),
    )
    idf = (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    w = (
        idf
        * F.col("tf")
        * F.lit(k1 + 1.0)
        / (
            F.col("tf")
            + F.lit(k1)
            * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
        )
    )
    weights = (
        tf.join(F.broadcast(dfreq), "token")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .select(F.col(id_col), F.col("token"), w.alias("w"))
    )
    # fixed-order sum: one conditional aggregate per query term, added
    # in query order (each term has at most one row per doc, so the
    # conditional sums are single-element and exact)
    per_term = weights.groupBy(id_col).agg(
        *[
            F.sum(F.when(F.col("token") == t, F.col("w"))).alias(f"w{i}")
            for i, t in enumerate(terms)
        ]
    )
    score = None
    for i in range(len(terms)):
        c = F.coalesce(F.col(f"w{i}"), F.lit(0.0))
        score = c if score is None else score + c
    from pyspark.sql import Window

    # top-k FIRST via orderBy+limit (distributed TakeOrderedAndProject
    # — per-partition heaps, no global sort shuffle), then number the
    # <=topk survivors; a row_number window over the full corpus would
    # drag every row into one partition.
    top = (
        per_term.select(F.col(id_col), score.alias("bm25"))
        .orderBy(F.desc("bm25"), F.asc(id_col))
        .limit(topk)
    )
    return top.withColumn(
        "rank",
        F.row_number()
        .over(Window.orderBy(F.desc("bm25"), F.asc(id_col)))
        .cast("int"),
    )
