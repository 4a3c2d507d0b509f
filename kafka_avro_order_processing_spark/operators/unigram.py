"""Distributed unigram-LM subword tokenizer training (Kudo, ACL'18
"Subword Regularization"; the SentencePiece unigram model) — the
other major subword algorithm next to BPE (operators/bpe.py), built
on the same scale insight: training iterates over the DISTINCT-WORD
table weighted by frequency, never over the corpus.

This implementation is the HARD-EM (Viterbi-count) variant, stated
openly: the E-step segments each word with the current piece scores'
single best segmentation instead of accumulating posterior expected
counts over all segmentations.  That choice buys two engine
properties the soft version cannot give:

- the M-step aggregates INTEGER counts (piece occurrences weighted by
  integer word frequency) — order-free, exact, bit-deterministic
  under any partitioning, no scaled-decimal machinery needed;
- convergence is an integer fixed point (segmentations stop
  changing), checkable exactly.

Pipeline per round:

  1. E-step: Viterbi-segment every distinct word under the current
     (piece -> logprob) table.  The DP is per-word and the vocabulary
     is MB-scale, so this is the engine's sanctioned Python surface:
     one Arrow-batched ``pandas_udf`` with the score table in the
     closure — no per-row Python, no JVM round-trips inside a word.
  2. M-step: explode segmentations, weight by word count, integer-sum
     per piece (one shuffle over the piece key).
  3. Prune: multi-char pieces drop to the top
     ``max(target_multi, floor(0.8 * current))`` by
     (count desc, piece asc) — the paper's gradual 20%-per-round
     shrink with a deterministic total tie order.  Single-character
     pieces are NEVER pruned (full coverage: every word stays
     segmentable), and zero-count single chars keep a floor count of
     1 (smoothing) so their scores stay finite.

Viterbi tie-break, pinned (and mirrored by the test reference):
maximize total logprob; on an exact float tie prefer FEWER pieces;
still tied, prefer the LATEST split point — ``cand[2] > best[2]``
keeps the largest backpointer j, i.e. the SHORTEST final piece
(``_viterbi('abc')`` under a full tie returns ``['ab', 'c']``, not
``['a', 'bc']``), applied recursively through the DP prefix — any
total order works, it just has to be the same one everywhere
(ADVICE r8: an earlier draft of this prose said "longest final
piece"; the fuzz test enumerates the actual key).

Encoding (``unigram_segment``) is the same Viterbi under the final
table — embarrassingly parallel, exact.
"""

from __future__ import annotations

import math

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .bpe import word_table

#: characters absent from the vocabulary segment as themselves with
#: this score — finite, so unknown characters degrade, never crash.
UNK_LOGPROB = -100.0


def _viterbi(word: str, scores: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of `word` under `scores` (logprobs).  The
    pinned tie order: higher score, then fewer pieces, then the
    later/longer split at each DP cell (the `>` vs `>=` choice below).
    Pure function — the single source of truth for train AND encode,
    and the test reference calls it directly."""
    n = len(word)
    # dp: (score, n_pieces, back_j) per position; base cell at 0
    dp: list[tuple[float, int, int] | None] = [None] * (n + 1)
    dp[0] = (0.0, 0, -1)
    for i in range(1, n + 1):
        best = None
        for j in range(max(0, i - max_len), i):
            if dp[j] is None:
                continue
            piece = word[j:i]
            s = scores.get(piece)
            if s is None:
                if i - j == 1:
                    s = UNK_LOGPROB  # unknown single char fallback
                else:
                    continue
            cand = (dp[j][0] + s, dp[j][1] + 1, j)
            if (
                best is None
                or cand[0] > best[0]
                or (cand[0] == best[0] and cand[1] < best[1])
                or (cand[0] == best[0] and cand[1] == best[1] and cand[2] > best[2])
            ):
                best = cand
        dp[i] = best
    out: list[str] = []
    i = n
    while i > 0:
        j = dp[i][2]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


def _segment_udf(scores: dict[str, float], max_len: int):
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def seg(words: pd.Series) -> pd.Series:
        return words.map(
            lambda w: _viterbi(w, scores, max_len) if w else []
        )

    return seg


def seed_pieces(
    words: DataFrame, max_piece_len: int = 8, seed_size: int = 1_000_000
) -> DataFrame:
    """Candidate piece table: every substring (length 1..max_piece_len)
    of every distinct word, counted with word frequency; kept to the
    top ``seed_size`` multi-char pieces by (count desc, piece asc)
    plus ALL single characters.  One explode + one integer groupBy —
    the SentencePiece suffix-array seeding, Spark-shaped."""
    subs = F.expr(
        "flatten(transform(sequence(1, length(word)),"
        " i -> transform(sequence(i, least(length(word), i + {m} - 1)),"
        "      j -> substring(word, i, j - i + 1))))".format(m=max_piece_len)
    )
    counted = (
        words.select(F.col("n"), F.explode(subs).alias("piece"))
        .groupBy("piece")
        .agg(F.sum("n").cast("long").alias("count"))
    )
    chars = counted.filter(F.length("piece") == 1)
    multi = (
        counted.filter(F.length("piece") > 1)
        .orderBy(F.desc("count"), F.asc("piece"))
        .limit(int(seed_size))
    )
    return chars.unionByName(multi)


def unigram_train(
    docs: DataFrame,
    vocab_size: int,
    n_rounds: int = 10,
    max_piece_len: int = 8,
    seed_size: int = 10_000,
    text_col: str = "text",
) -> DataFrame:
    """Learn a unigram piece table of (piece, count, logprob) with at
    most ``vocab_size`` entries (all single chars always included, so
    the floor is the alphabet size).  Stops early when segmentations
    reach a fixed point AND the vocabulary is at target size.  Driver
    traffic per round: the piece table (vocab-sized, the sanctioned
    iterative-driver budget, same class as the BPE merge pick)."""
    if vocab_size < 1:
        raise ValueError("vocab_size must be >= 1")
    if n_rounds < 1:
        raise ValueError("n_rounds must be >= 1")
    words = word_table(docs, text_col).localCheckpoint(eager=True)
    pieces = seed_pieces(words, max_piece_len, seed_size)

    def collect_scores(pdf: DataFrame) -> dict[str, float]:
        rows = pdf.select("piece", "count").collect()
        total = sum(int(r["count"]) for r in rows) or 1
        return {
            r["piece"]: math.log(int(r["count"]) / total) for r in rows
        }

    scores = collect_scores(pieces)
    prev_counts: dict[str, int] | None = None
    for _ in range(n_rounds):
        seg = words.select(
            "word",
            "n",
            _segment_udf(scores, max_piece_len)(F.col("word")).alias("pieces"),
        )
        counts = (
            seg.select(F.col("n"), F.explode("pieces").alias("piece"))
            .groupBy("piece")
            .agg(F.sum("n").cast("long").alias("count"))
        )
        # coverage floor: single chars survive at count >= 1 even when
        # the Viterbi never picks them standalone
        alphabet = pieces.filter(F.length("piece") == 1).select("piece")
        counts = (
            alphabet.join(counts, "piece", "left")
            .select("piece", F.coalesce("count", F.lit(0)).alias("count"))
            .withColumn("count", F.greatest("count", F.lit(1)))
            .unionByName(
                counts.join(alphabet, "piece", "left_anti").select(
                    "piece", "count"
                )
            )
        )
        n_chars = alphabet.count()
        target_multi = max(int(vocab_size) - n_chars, 0)
        multi = counts.filter(F.length("piece") > 1)
        n_multi = multi.count()
        keep_multi = max(target_multi, int(math.floor(0.8 * n_multi)))
        pruned_multi = multi.orderBy(
            F.desc("count"), F.asc("piece")
        ).limit(keep_multi)
        pieces = (
            counts.filter(F.length("piece") == 1)
            .unionByName(pruned_multi)
            .localCheckpoint(eager=True)
        )
        new_counts = {
            r["piece"]: int(r["count"])
            for r in pieces.select("piece", "count").collect()
        }
        scores = collect_scores(pieces)
        if prev_counts == new_counts and n_multi <= target_multi:
            break
        prev_counts = new_counts

    total = sum(new_counts.values()) or 1
    spark = docs.sparkSession
    return spark.createDataFrame(
        sorted(
            (p, c, math.log(c / total)) for p, c in new_counts.items()
        ),
        "piece string, count long, logprob double",
    )


def unigram_segment(
    tokenized: DataFrame,
    pieces: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "tokens",
    max_piece_len: int = 8,
) -> DataFrame:
    """Segment each document's tokens under a trained piece table:
    (id_col, pieces: array<string>, n_pieces).  Same Viterbi, same tie
    order as training — the train/encode consistency BPE gets from its
    merge list.  Unknown characters segment as themselves at
    ``UNK_LOGPROB`` (finite — never a crash, visible in QA via
    oov-style checks)."""
    rows = pieces.select("piece", "logprob").collect()
    scores = {r["piece"]: float(r["logprob"]) for r in rows}
    seg = _segment_udf(scores, max_piece_len)
    # Explode tokens with position, segment each token, reassemble in
    # order — one shuffle on the doc key, the encode_ids shape.
    pos = tokenized.select(
        F.col(id_col), F.posexplode_outer(tokens_col).alias("pos", "token")
    )
    segd = pos.withColumn("pieces", seg(F.coalesce("token", F.lit(""))))
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
        )
    )
