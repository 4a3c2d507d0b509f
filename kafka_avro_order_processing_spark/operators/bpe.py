"""Distributed BPE vocabulary training and encoding (Sennrich,
Haddow & Birch, ACL'16 "Neural Machine Translation of Rare Words with
Subword Units") — the tokenizer-construction step of an LLM data
pipeline, run as Spark plans instead of a single-machine counter.

The classic algorithm is corpus-scale-friendly because of one
observation the distributed version leans on even harder: merges
operate on the DISTINCT-WORD table weighted by word frequency, never
on the corpus.  The first job collapses N tokens of corpus to V
distinct words (Zipf: V grows ~sqrt-ish, millions of words for
trillions of tokens), and every merge round after that is

  1. one groupBy over the adjacent symbol pairs of those V rows
     (weighted by word count) to find the most frequent pair —
     deterministic ties on (count desc, left asc, right asc),
  2. one driver scalar (the chosen pair: the sanctioned
     iterative-algorithm driver action, same budget class as
     k-means centroids and connected-components convergence counts),
  3. one map-side fold that rewrites each word's symbol array with
     the pair merged greedily left-to-right (pure SQL `aggregate`
     lambda — no Python in the loop), followed by a localCheckpoint
     to cut lineage.

So training cost is n_merges * O(V) with no shuffle of corpus rows
after the first word count.  Production vocab sizes (32k merges) mean
32k small jobs — the honest cost of exact frequency-ordered BPE; the
standard mitigations (train on a frequency-capped word sample, batch
non-overlapping merges per round) compose with this plan but change
the merge order contract, so they are not the default here.

Encoding is embarrassingly parallel: the merge table (rank, left,
right) is a broadcast literal list applied in rank order per word —
map-side only, no shuffle, checkpointed every `checkpoint_every`
merges to keep the expression tree bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END_OF_WORD = "</w>"


def _sql_str(s: str) -> str:
    return "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _merge_expr(sym_col: str, left: str, right: str, merged: str) -> str:
    """One greedy left-to-right merge pass over a symbol array as a
    pure SQL fold: consume (left, right) at the leftmost positions,
    never re-using a consumed element (so 'a a a' under (a,a) gives
    ['aa','a'], matching the reference algorithm)."""
    L, R, M = _sql_str(left), _sql_str(right), _sql_str(merged)
    s = sym_col
    return (
        f"aggregate(sequence(1, size({s})),"
        " named_struct('acc', cast(array() as array<string>), 'skip', false),"
        " (st, i) -> IF(st.skip,"
        "   named_struct('acc', st.acc, 'skip', false),"
        f"   IF(i < size({s}) AND element_at({s}, i) = {L}"
        f"      AND element_at({s}, i + 1) = {R},"
        f"     named_struct('acc', array_append(st.acc, {M}), 'skip', true),"
        f"     named_struct('acc', array_append(st.acc, element_at({s}, i)),"
        "       'skip', false))),"
        " st -> st.acc)"
    )


def word_table(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, n) distinct-word table: whitespace-split,
    empty tokens dropped.  The ONLY corpus-scale job in training."""
    return (
        docs.select(
            F.explode(F.split(F.col(text_col), r"\s+")).alias("word")
        )
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _initial_symbols(words: DataFrame) -> DataFrame:
    """Each word as its character symbols plus the end-of-word marker
    (the marker is what lets a merged subword know it ends a word)."""
    return words.select(
        "word",
        "n",
        F.expr(
            "array_append(transform(split(word, ''), c -> c),"
            f" {_sql_str(END_OF_WORD)})"
        ).alias("sym"),
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
) -> DataFrame:
    """Learn `n_merges` BPE merges from the corpus.  Returns the merge
    table (rank, left, right, merged, pair_count) in merge order —
    rank 0 is the first (most frequent) merge.  Stops early when no
    adjacent pair occurs at least twice (nothing left worth merging).
    """
    spark = docs.sparkSession
    syms = _initial_symbols(word_table(docs, text_col)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for rank in range(n_merges):
        # CASE guard: sequence(1, 0) is DESCENDING [1, 0] in Spark, not
        # empty — a fully-merged single-symbol word would crash
        # element_at(sym, 0).
        pairs = syms.select(
            "n",
            F.explode(
                F.expr(
                    "CASE WHEN size(sym) < 2"
                    " THEN cast(array() as array<struct<l: string, r: string>>)"
                    " ELSE transform(sequence(1, size(sym) - 1),"
                    " i -> struct(element_at(sym, i) as l,"
                    "             element_at(sym, i + 1) as r)) END"
                )
            ).alias("p"),
        )
        best = (
            pairs.groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("c"))
            .orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best or best[0]["c"] < 2:
            break
        left, right, c = best[0]["l"], best[0]["r"], int(best[0]["c"])
        merged = left + right
        merges.append((rank, left, right, merged, c))
        syms = syms.select(
            "word",
            "n",
            F.expr(_merge_expr("sym", left, right, merged)).alias("sym"),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, pair_count long"
    )


def bpe_encode(
    docs: DataFrame,
    merges: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    checkpoint_every: int = 16,
) -> DataFrame:
    """Encode documents with a learned merge table: per word, apply
    every merge in rank order (the standard greedy encoder).  Returns
    (id_col, tokens: array<string>) with words' token lists
    concatenated in order.

    Map-side only — the merge list is a driver-side literal baked into
    fold expressions (vocab-sized, the same class as k-means centroid
    literals), applied wordwise; a localCheckpoint every
    `checkpoint_every` merges keeps the expression tree bounded.  At
    100 TB this is the plain "tokenize" map stage; nothing shuffles.
    """
    ranked = [
        (r["left"], r["right"], r["merged"])
        for r in merges.orderBy("rank").collect()
    ]
    out = docs.select(
        F.col(id_col),
        F.expr(
            f"transform(filter(split({text_col}, '\\\\s+'), w -> w != ''),"
            " w -> array_append(transform(split(w, ''), c -> c),"
            f" {_sql_str(END_OF_WORD)}))"
        ).alias("wsyms"),
    )
    for i, (left, right, merged) in enumerate(ranked):
        inner = _merge_expr("w", left, right, merged)
        out = out.select(
            F.col(id_col),
            F.expr(f"transform(wsyms, w -> {inner})").alias("wsyms"),
        )
        if (i + 1) % checkpoint_every == 0:
            out = out.localCheckpoint(eager=True)
    return out.select(F.col(id_col), F.flatten("wsyms").alias("tokens"))
