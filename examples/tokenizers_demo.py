"""Tokenizer-trainer bake-off — the engine's three subword trainers
on one corpus, as one user journey:

  1. train       BPE (frequency-ordered merges, Sennrich ACL'16),
                 WordPiece (likelihood-scored merges, Schuster &
                 Nakajima 2012 / BERT), and the unigram-LM hard-EM
                 trainer (SentencePiece family) on the documents table
  2. encode      the same corpus under each trained tokenizer
  3. compare     fertility (pieces per word — the standard tokenizer
                 quality number), conservation (no text lost), and
                 coverage (zero UNK / zero unknown-char fallbacks on
                 the training corpus itself — by construction for all
                 three, asserted not assumed)
  4. holdout     encode a held-out slice the trainers never saw and
                 report fertility drift + WordPiece's UNK count (the
                 honest generalization signal; BPE and unigram
                 degrade to characters instead of UNK)

Run: python examples/tokenizers_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark import get_spark
from kafka_avro_order_processing_spark.operators.bpe import (
    bpe_encode,
    bpe_train,
    word_table,
)
from kafka_avro_order_processing_spark.operators.unigram import (
    unigram_segment,
    unigram_train,
)
from kafka_avro_order_processing_spark.operators.wordpiece import (
    wordpiece_encode,
    wordpiece_train,
    wordpiece_vocab,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

N_MERGES = 24
UNI_VOCAB = 40


def _word_count(docs) -> int:
    return int(
        word_table(docs).select(F.sum(F.col("n"))).collect()[0][0] or 0
    )


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    own_session = spark is None
    if own_session:
        spark = get_spark(
            app_name="tokenizers-demo", master="local[4]", shuffle_partitions=4
        )
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    train = docs.filter(F.col("doc_id") % 10 != 0).localCheckpoint(eager=True)
    holdout = docs.filter(F.col("doc_id") % 10 == 0).localCheckpoint(eager=True)
    n_words_train = _word_count(train)
    n_words_hold = _word_count(holdout)

    # 1. train all three on the SAME corpus slice
    bpe_merges = bpe_train(train, N_MERGES).localCheckpoint(eager=True)
    wp_merges = wordpiece_train(train, N_MERGES).localCheckpoint(eager=True)
    wp_vocab = wordpiece_vocab(train, wp_merges)
    # enough prune rounds for the 20%-per-round shrink to actually
    # reach the target (0.8^n * seed <= vocab), else every distinct
    # word survives as its own piece and fertility is trivially 1.0
    uni_pieces = unigram_train(
        train, vocab_size=UNI_VOCAB, n_rounds=16, seed_size=2000
    ).localCheckpoint(eager=True)

    # 2+3. encode the training corpus, measure fertility
    def fertility(n_pieces: int, n_words: int) -> float:
        return n_pieces / n_words if n_words else 0.0

    bpe_pieces = int(
        bpe_encode(train, bpe_merges)
        .select(F.sum(F.size("tokens")))
        .collect()[0][0]
    )
    wp = wordpiece_encode(train, wp_vocab)
    wp_row = wp.agg(
        F.sum("n_pieces").alias("p"), F.sum("n_unk").alias("u")
    ).collect()[0]
    toks = train.select(
        "doc_id",
        F.expr("filter(split(text, '\\\\s+'), w -> w != '')").alias("tokens"),
    )
    uni = unigram_segment(toks, uni_pieces)
    uni_pieces_n = int(uni.select(F.sum("n_pieces")).collect()[0][0])

    stats = {
        # BPE counts the </w> marker per word; subtract to compare like
        # with like (pieces of actual text)
        "bpe_fertility": fertility(bpe_pieces - n_words_train, n_words_train),
        "wordpiece_fertility": fertility(int(wp_row["p"]), n_words_train),
        "unigram_fertility": fertility(uni_pieces_n, n_words_train),
        "wordpiece_train_unk": int(wp_row["u"]),
        "n_words_train": n_words_train,
        "n_words_holdout": n_words_hold,
    }

    # 4. holdout generalization
    bpe_hold = int(
        bpe_encode(holdout, bpe_merges)
        .select(F.sum(F.size("tokens")))
        .collect()[0][0]
    )
    wp_hold = wordpiece_encode(holdout, wp_vocab).agg(
        F.sum("n_pieces").alias("p"), F.sum("n_unk").alias("u")
    ).collect()[0]
    uni_hold = int(
        unigram_segment(
            holdout.select(
                "doc_id",
                F.expr(
                    "filter(split(text, '\\\\s+'), w -> w != '')"
                ).alias("tokens"),
            ),
            uni_pieces,
        )
        .select(F.sum("n_pieces"))
        .collect()[0][0]
    )
    stats.update(
        {
            "bpe_fertility_holdout": fertility(bpe_hold - n_words_hold, n_words_hold),
            "wordpiece_fertility_holdout": fertility(int(wp_hold["p"]), n_words_hold),
            "unigram_fertility_holdout": fertility(uni_hold, n_words_hold),
            "wordpiece_holdout_unk": int(wp_hold["u"]),
        }
    )

    print("tokenizer bake-off:", stats)
    if own_session:
        spark.stop()
    return stats


if __name__ == "__main__":
    main(*(sys.argv[1:2]))
