"""Benchmark decontamination: remove training documents that overlap
an evaluation set (GPT-3 Appendix C / PaLM App. D n-gram rule).

Reference scope: the reference pipeline (an order-event consumer) has
no decontamination stage; this module is part of the engine's
training-data layer (task brief: "operations a large-scale
training-data pipeline would need").  The published rule implemented
here: a training document is contaminated if it shares any word
N-gram (N=13 in GPT-3/PaLM) with any evaluation example; evaluation
examples SHORTER than N words count as a single whole-sequence gram
and are matched by contiguous-token containment.

Scale shape (100 TB corpus vs MB-scale benchmarks):
- The eval gram set is tiny relative to the corpus -> built once,
  ``F.broadcast`` into a hash join against the corpus gram stream; the
  corpus side never shuffles on gram (only the final per-doc count agg
  shuffles, on doc_id).
- Short eval examples (< n tokens) are matched by a broadcast
  nested-loop containment scan over space-sentineled token text —
  bounded by the (small) short-eval count, NOT by corpus pairs.
- All outputs are exact integer counts and divisions thereof
  (cross-engine deterministic; Python-reference parity in
  tests/test_decontam.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .dedup import shingle_rows
from .text import tokens

DEFAULT_N = 13


def _norm_tokens(text_col: str):
    """Whitespace tokens of the doc (the corpus convention: single-space
    separated synthetic text; real pipelines normalize upstream with
    clean.clean_text)."""
    return tokens(text_col)


def eval_gram_table(
    evaldf: DataFrame,
    id_col: str = "eval_id",
    text_col: str = "text",
    n: int = DEFAULT_N,
) -> tuple[DataFrame, DataFrame]:
    """Split the evaluation set into its two published matching forms.

    Returns ``(grams, short_seqs)``:
    - ``grams``: distinct word n-grams of eval examples with >= n
      tokens, as (shingle) rows.
    - ``short_seqs``: eval examples with 1..n-1 tokens, as their full
      space-joined token sequence (matched by containment downstream).
    Empty-token examples match nothing and are dropped.
    """
    t = _norm_tokens(text_col)
    long_part = shingle_rows(
        evaldf.filter(F.size(t) >= n), id_col, text_col, n, distinct=True,
        spread=False,
    ).select("shingle").distinct()
    short_part = (
        evaldf.filter((F.size(t) < n) & (F.size(t) >= 1))
        .select(F.concat_ws(" ", t).alias("seq"))
        .filter(F.col("seq") != "")  # empty text splits to [""] — matches nothing
        .distinct()
    )
    return long_part, short_part


def contamination_tags(
    docs: DataFrame,
    evaldf: DataFrame,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    eval_id: str = "eval_id",
    eval_text: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """Per-training-doc contamination report.

    Output columns (one row per input doc, including gram-less docs):
    ``doc_id, n_grams, n_hit_grams, hit_frac, n_short_hits,
    is_contaminated`` — ``n_grams`` counts the doc's DISTINCT n-grams,
    ``n_hit_grams`` those also present in the eval gram set,
    ``n_short_hits`` the count of short eval sequences contained
    contiguously in the doc, and ``is_contaminated`` the published
    any-overlap rule.  hit_frac is NULL for docs with no n-grams
    (shorter than n tokens) rather than a fake 0/0.
    """
    grams, short_seqs = eval_gram_table(evaldf, eval_id, eval_text, n)

    doc_grams = shingle_rows(docs, doc_id, doc_text, n, distinct=True)
    # Broadcast-hash semi-shape: LEFT join against the (small) eval gram
    # set, count hits map-side-combinable per doc.
    hits = (
        doc_grams.join(
            F.broadcast(grams.withColumn("_hit", F.lit(1))), "shingle", "left"
        )
        .groupBy(doc_id)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hit_grams"),
        )
    )

    # Short eval sequences: contiguous-token containment via sentinel
    # spaces (" a b " contains " a ", not "ba").  Broadcast nested-loop
    # over the SHORT subset only — its row count is the loop bound.
    body = F.concat(F.lit(" "), F.concat_ws(" ", _norm_tokens(doc_text)), F.lit(" "))
    short_hits = (
        docs.select(F.col(doc_id), body.alias("_body"))
        .join(
            F.broadcast(short_seqs),
            F.col("_body").contains(F.concat(F.lit(" "), F.col("seq"), F.lit(" "))),
            "left",
        )
        .groupBy(doc_id)
        .agg(F.count("seq").cast("long").alias("n_short_hits"))
    )

    out = (
        docs.select(doc_id)
        .join(hits, doc_id, "left")
        .join(short_hits, doc_id, "left")
        .select(
            F.col(doc_id),
            F.coalesce("n_grams", F.lit(0)).alias("n_grams"),
            F.coalesce("n_hit_grams", F.lit(0)).alias("n_hit_grams"),
            F.when(
                F.coalesce("n_grams", F.lit(0)) > 0,
                F.coalesce("n_hit_grams", F.lit(0)).cast("double")
                / F.col("n_grams").cast("double"),
            ).alias("hit_frac"),
            F.coalesce("n_short_hits", F.lit(0)).alias("n_short_hits"),
            (
                (F.coalesce("n_hit_grams", F.lit(0)) > 0)
                | (F.coalesce("n_short_hits", F.lit(0)) > 0)
            ).alias("is_contaminated"),
        )
    )
    return out


def decontaminate(
    docs: DataFrame,
    evaldf: DataFrame,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    eval_id: str = "eval_id",
    eval_text: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """The corpus with contaminated docs removed (left-anti against the
    tag frame's contaminated ids) — schema preserved."""
    bad = (
        contamination_tags(docs, evaldf, doc_id, doc_text, eval_id, eval_text, n)
        .filter(F.col("is_contaminated"))
        .select(doc_id)
    )
    return docs.join(bad, doc_id, "left_anti")


def eval_leakage_report(
    docs: DataFrame,
    evaldf: DataFrame,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    eval_id: str = "eval_id",
    eval_text: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """The reverse view: per EVAL example, how much of it leaks into the
    training corpus — ``eval_id, n_grams, n_leaked_grams, leaked_frac``
    where a gram is leaked if ANY training doc contains it.  Long-form
    examples only (short ones are all-or-nothing by the containment
    rule and are reported with n_grams = 1).

    The corpus gram set is the big side: grams are DISTINCT-ed corpus
    wide (one shuffle on gram) and the small eval gram table joins
    against it; the per-eval aggregation is then eval-sized.
    """
    t = _norm_tokens(eval_text)
    long_eval = shingle_rows(
        evaldf.filter(F.size(t) >= n), eval_id, eval_text, n, distinct=True,
        spread=False,
    )
    corpus_grams = (
        shingle_rows(docs, doc_id, doc_text, n, distinct=True)
        .select("shingle")
        .distinct()
        .withColumn("_leak", F.lit(1))
    )
    long_rep = (
        long_eval.join(corpus_grams, "shingle", "left")
        .groupBy(eval_id)
        .agg(
            F.count("*").cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_leak"), F.lit(0))).cast("long").alias("n_leaked_grams"),
        )
    )
    # Short examples: contained-in-any-doc => fully leaked (1/1).  An
    # outer join cannot broadcast its preserved side, so: INNER
    # containment join (small side broadcast) -> per-eval count -> left
    # join back onto the short-eval id list.
    short_eval = (
        evaldf.filter((F.size(t) < n) & (F.size(t) >= 1))
        .select(F.col(eval_id), F.concat_ws(" ", t).alias("seq"))
        .filter(F.col("seq") != "")
    )
    body = F.concat(F.lit(" "), F.concat_ws(" ", _norm_tokens(doc_text)), F.lit(" "))
    short_hits = (
        docs.select(body.alias("_body"))
        .join(
            F.broadcast(short_eval),
            F.col("_body").contains(F.concat(F.lit(" "), F.col("seq"), F.lit(" "))),
            "inner",
        )
        .groupBy(eval_id)
        .agg(F.count("*").cast("long").alias("_n_docs"))
    )
    short_rep = (
        short_eval.select(eval_id)
        .join(short_hits, eval_id, "left")
        .select(
            F.col(eval_id),
            F.lit(1).cast("long").alias("n_grams"),
            F.when(F.coalesce("_n_docs", F.lit(0)) > 0, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("n_leaked_grams"),
        )
    )
    rep = long_rep.unionByName(short_rep)
    return rep.select(
        eval_id,
        "n_grams",
        "n_leaked_grams",
        (F.col("n_leaked_grams").cast("double") / F.col("n_grams").cast("double")).alias("leaked_frac"),
    )
