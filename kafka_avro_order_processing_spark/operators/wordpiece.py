"""Distributed WordPiece tokenizer training and encoding (Schuster &
Nakajima, ICASSP 2012 "Japanese and Korean voice search"; the BERT
tokenizer of Devlin et al. 2019) — the third member of the engine's
tokenizer-trainer family next to frequency-ordered BPE
(``operators/bpe.py``) and the unigram-LM hard-EM trainer
(``operators/unigram.py``).

WordPiece differs from BPE in exactly two contractual places, both
implemented here the way the published trainers do:

1. **Merge score is likelihood gain, not raw frequency**: the pair
   (a, b) maximizing ``count(ab) / (count(a) * count(b))`` is merged —
   the corpus-likelihood improvement of a unigram LM when the pair
   becomes one unit, so rare-but-strongly-coupled pairs beat frequent
   incidental ones.  The score is ONE IEEE f64 division of two exact
   integer-valued doubles (pair count, and the BIGINT product of the
   symbol counts) — deterministic cross-engine; the count product is
   exact while it stays below 2^53 (documented envelope: fine for any
   corpus whose token count is below ~95M per symbol pair; far past
   the test SFs, and the comparison only has to be STABLE, not
   unbounded).  Ties pin to (left asc, right asc).
2. **Continuation prefix**: a word is initially
   ``[w[0], ##w[1], ..., ##w[-1]]`` and a merged token keeps the
   left's prefix status while stripping the right's ``##`` — so the
   learned vocabulary is directly the BERT-style piece inventory.

Training runs on the DISTINCT-WORD table exactly like the BPE
trainer (the Zipf collapse is the whole scale story): per merge round
one pair-count groupBy, one symbol-count groupBy (both over V rows,
never the corpus), one driver scalar (the argmax pair — the
sanctioned iterative-algorithm driver action), and one map-side SQL
fold rewriting the symbol arrays (``bpe._merge_expr`` — the greedy
left-to-right pass is contractually identical).

Encoding is NOT merge replay: WordPiece inference is greedy
LONGEST-MATCH-FIRST against the final vocabulary (the published
algorithm BERT ships) — per word, take the longest vocab prefix,
then repeatedly the longest ``##``-continuation match; any dead end
maps the WHOLE word to ``[UNK]``.  Implemented as one Arrow-batched
pandas UDF over token occurrences with the vocabulary as a broadcast
set (the ``unigram_segment`` shape: map-side, one shuffle to
reassemble documents).

Reference scope: not in the reference pipeline (a 1.1k-LoC order
consumer); part of the engine's training-data layer (task brief).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import _merge_expr, _sql_str, word_table

#: BERT's continuation prefix for non-initial subword pieces.
CONTINUATION_PREFIX = "##"

#: The unknown-word piece emitted when greedy matching dead-ends.
UNK_PIECE = "[UNK]"


def _initial_wp_symbols(words: DataFrame) -> DataFrame:
    """Each word as WordPiece initial symbols: first character bare,
    every later character ``##``-prefixed."""
    pfx = _sql_str(CONTINUATION_PREFIX)
    return words.select(
        "word",
        "n",
        F.expr(
            "transform(split(word, ''),"
            f" (c, i) -> IF(i = 0, c, concat({pfx}, c)))"
        ).alias("sym"),
    )


def _strip_continuation(s: str) -> str:
    return s[len(CONTINUATION_PREFIX):] if s.startswith(CONTINUATION_PREFIX) else s


def wordpiece_train(
    docs: DataFrame,
    n_merges: int,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` WordPiece merges.  Returns the merge table
    (rank, left, right, merged, pair_count, left_count, right_count,
    score) in merge order; stops early when no pair reaches
    ``min_pair_count``.  ``score`` is the recorded f64
    ``pair_count / (left_count * right_count)`` the argmax used.

    Integer counts only inside the aggregation (order-free, exact);
    the single division per candidate pair happens once, identically,
    in any engine — the comparison contract the DuckDB oracle in
    tests/test_wordpiece.py replays verbatim.
    """
    spark = docs.sparkSession
    syms = _initial_wp_symbols(word_table(docs, text_col)).localCheckpoint(
        eager=True
    )
    merges: list[tuple[int, str, str, str, int, int, int, float]] = []
    for rank in range(n_merges):
        # Symbol occurrence counts (weighted by word frequency) — the
        # score's denominator terms.  One groupBy over V rows.
        sym_counts = (
            syms.select("n", F.explode("sym").alias("s"))
            .groupBy("s")
            .agg(F.sum("n").alias("c"))
        )
        # Adjacent-pair counts.  CASE guard: sequence(1, 0) is
        # DESCENDING [1, 0] in Spark, not empty (bpe.py gotcha).
        pairs = (
            syms.select(
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
            .groupBy("p.l", "p.r")
            .agg(F.sum("n").alias("c"))
            .filter(F.col("c") >= int(min_pair_count))
        )
        # Score and argmax: ONE f64 division of exact ints per pair;
        # ties (exact f64 equality) pin to (left asc, right asc).
        best = (
            pairs.join(sym_counts.withColumnRenamed("s", "l").withColumnRenamed("c", "cl"), "l")
            .join(sym_counts.withColumnRenamed("s", "r").withColumnRenamed("c", "cr"), "r")
            .select(
                "l",
                "r",
                "c",
                "cl",
                "cr",
                (
                    F.col("c").cast("double")
                    / (F.col("cl") * F.col("cr")).cast("double")
                ).alias("score"),
            )
            .orderBy(F.desc("score"), F.asc("l"), F.asc("r"))
            .limit(1)
            .collect()
        )
        if not best:
            break
        row = best[0]
        left, right = row["l"], row["r"]
        merged = left + _strip_continuation(right)
        merges.append(
            (
                rank,
                left,
                right,
                merged,
                int(row["c"]),
                int(row["cl"]),
                int(row["cr"]),
                float(row["score"]),
            )
        )
        syms = syms.select(
            "word",
            "n",
            F.expr(_merge_expr("sym", left, right, merged)).alias("sym"),
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges,
        "rank int, left string, right string, merged string,"
        " pair_count long, left_count long, right_count long, score double",
    )


def wordpiece_vocab(docs: DataFrame, merges: DataFrame, text_col: str = "text") -> list[str]:
    """The final piece inventory: every initial symbol of the training
    corpus (bare first characters + ``##`` continuations) plus every
    merged token, sorted — what :func:`wordpiece_encode` matches
    against.  Driver-side list (vocab-sized by construction)."""
    alpha = [
        r["s"]
        for r in _initial_wp_symbols(word_table(docs, text_col))
        .select(F.explode("sym").alias("s"))
        .distinct()
        .collect()
    ]
    merged = [r["merged"] for r in merges.select("merged").collect()]
    return sorted(set(alpha) | set(merged))


def _wp_pieces(word: str, vocab: set) -> list[str]:
    """BERT's greedy longest-match-first WordPiece inference: the
    longest vocab prefix, then repeatedly the longest ``##``
    continuation; any dead end -> the whole word is [UNK]."""
    if not word:
        return []
    out: list[str] = []
    i, n = 0, len(word)
    while i < n:
        j = n
        piece = None
        while j > i:
            sub = word[i:j]
            if i > 0:
                sub = CONTINUATION_PREFIX + sub
            if sub in vocab:
                piece = sub
                break
            j -= 1
        if piece is None:
            return [UNK_PIECE]
        out.append(piece)
        i = j
    return out


def _wp_udf(vocab: set):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(words: pd.Series) -> pd.Series:
        return words.map(lambda w: _wp_pieces(w, vocab) if w else [])

    return seg


def wordpiece_encode(
    docs: DataFrame,
    vocab: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Encode documents against a WordPiece vocabulary: (id_col,
    pieces: array<string>, n_pieces, n_unk).  Greedy longest-match per
    word (``_wp_pieces``), words joined in document order — the
    ``unigram_segment`` plan shape: map-side Arrow-batched UDF over
    token occurrences, one shuffle on the doc key to reassemble.
    ``n_unk`` counts words that dead-ended to ``[UNK]`` (the QA signal
    oov_stats tracks for id-vocabularies)."""
    vset = set(vocab)
    seg = _wp_udf(vset)
    pos = docs.select(
        F.col(id_col),
        F.posexplode_outer(
            F.expr(f"filter(split({text_col}, '\\\\s+'), w -> w != '')")
        ).alias("pos", "word"),
    )
    segd = pos.withColumn("pieces", seg(F.coalesce("word", F.lit(""))))
    unk = _sql_str(UNK_PIECE)
    return (
        segd.groupBy(id_col)
        .agg(
            F.expr(
                "flatten(transform(array_sort(collect_list(CASE WHEN pos IS"
                " NOT NULL THEN struct(pos, pieces) END)), s -> s.pieces))"
            ).alias("pieces")
        )
        .select(
            F.col(id_col),
            "pieces",
            F.size("pieces").cast("long").alias("n_pieces"),
            F.expr(
                f"size(filter(pieces, p -> p = {unk}))"
            ).cast("long").alias("n_unk"),
        )
    )
