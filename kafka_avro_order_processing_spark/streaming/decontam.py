"""Streaming decontamination — operators/decontam.py's twin: the eval
gram set is the STATIC side of a stream-static join, so training docs
are tagged (and can be dropped) as they are INGESTED, instead of by a
batch sweep after the corpus lands.

Twin-pattern notes (same contract as streaming/lm.py):
- a document's n-grams are assembled as a doc-local array expression
  and explode within the row that carries the document, so every doc's
  counts finalize inside its own micro-batch — ONE keyed streaming
  aggregation, update-mode changelog drain;
- the short-eval containment arm is evaluated PER ROW against the
  (tiny, bounded) short-sequence list inlined as literals — no second
  aggregation branch, which Structured Streaming would reject anyway
  (no chained/streamed-twice aggregations);
- all outputs are exact integer counts and int/int divisions, so the
  drained frame BIT-matches the batch operator on the same rows under
  any micro-batching (suite-pinned, one epoch and many).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..operators.decontam import DEFAULT_N, eval_gram_table
from ..operators.text import tokens
from .pipeline import drain_to_df

#: Hard cap on the number of short (< n-token) eval sequences inlined
#: as literal expressions.  Benchmark eval sets carry at most a few
#: hundred sub-n-gram items; past this the literal when-tree stops
#: being "a broadcast-sized constant" and becomes a pathological plan.
MAX_INLINE_SHORT_SEQS = 1000


def _gram_array(text_col: str, n: int):
    """Doc-local DISTINCT word n-grams as one array per row — the
    expression form of dedup.shingle_rows (same zip-of-shifted-slices
    assembly, no explode until after the per-row work is attached)."""
    t = tokens(text_col)
    m = F.greatest(F.size(t) - (n - 1), F.lit(0))
    zipped = F.arrays_zip(*[F.slice(t, j + 1, m) for j in range(n)])
    grams = F.transform(
        zipped, lambda g: F.concat_ws(" ", *[g.getField(str(j)) for j in range(n)])
    )
    return F.array_distinct(grams)


def streaming_contamination_tags(
    stream_docs: DataFrame,
    evaldf: DataFrame,
    doc_id: str = "doc_id",
    doc_text: str = "text",
    eval_id: str = "eval_id",
    eval_text: str = "text",
    n: int = DEFAULT_N,
) -> DataFrame:
    """Tag a document stream against a batch eval set (bounded drain;
    in production the same plan runs continuously in front of the
    lake writer).  Output schema matches
    :func:`operators.decontam.contamination_tags`.

    Raises ``ValueError`` when the eval set carries more than
    ``MAX_INLINE_SHORT_SEQS`` short (< n-token) sequences: those are
    inlined as literal expressions, which is only sane at benchmark
    scale.  Oversized short sets belong on the batch path
    (:func:`operators.decontam.contamination_tags`), whose short arm
    is a broadcast join, not an expression tree."""
    grams, short_seqs = eval_gram_table(evaldf, eval_id, eval_text, n)
    # The short list is eval-set-derived and < n-token sequences only —
    # bounded like any broadcast side; inlined so the stream needs no
    # second join-aggregate branch.  collect() one row past the cap so
    # an oversized set fails loudly without materializing all of it.
    shorts = [r["seq"] for r in short_seqs.limit(MAX_INLINE_SHORT_SEQS + 1).collect()]
    if len(shorts) > MAX_INLINE_SHORT_SEQS:
        raise ValueError(
            f"eval set has more than {MAX_INLINE_SHORT_SEQS} short "
            f"(< {n}-token) sequences; the streaming twin inlines these "
            "as literals and would build a pathological expression tree. "
            "Use the batch operators.decontam.contamination_tags (its "
            "short arm is a bounded broadcast join), or raise n."
        )

    body = F.concat(F.lit(" "), F.concat_ws(" ", tokens(doc_text)), F.lit(" "))
    if shorts:
        short_arr = F.array(*[F.lit(s) for s in shorts])
        n_short = F.size(
            F.filter(
                short_arr,
                lambda s: body.contains(F.concat(F.lit(" "), s, F.lit(" "))),
            )
        ).cast("long")
    else:
        n_short = F.lit(0).cast("long")

    exploded = (
        stream_docs.select(
            F.col(doc_id),
            n_short.alias("__n_short"),
            F.explode_outer(_gram_array(doc_text, n)).alias("shingle"),
        )
        .join(F.broadcast(grams.withColumn("_hit", F.lit(1))), "shingle", "left")
    )
    agg = exploded.groupBy(doc_id).agg(
        F.count("shingle").cast("long").alias("n_grams"),
        F.sum(
            F.when(F.col("shingle").isNotNull(), F.coalesce(F.col("_hit"), F.lit(0)))
            .otherwise(F.lit(0))
        ).cast("long").alias("n_hit_grams"),
        F.min("__n_short").alias("n_short_hits"),
    )
    out = agg.select(
        F.col(doc_id),
        "n_grams",
        "n_hit_grams",
        F.when(
            F.col("n_grams") > 0,
            F.col("n_hit_grams").cast("double") / F.col("n_grams").cast("double"),
        ).alias("hit_frac"),
        "n_short_hits",
        ((F.col("n_hit_grams") > 0) | (F.col("n_short_hits") > 0)).alias(
            "is_contaminated"
        ),
    )
    return drain_to_df(out, "update", key_cols=(doc_id,))
