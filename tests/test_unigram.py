"""Unigram tokenizer (operators/unigram.py): Viterbi tie-break
pinning, train parity against a local composition of the same
hard-EM (exercising the distributed seeding/counting/pruning), piece
conservation, unknown-character degradation, and segmentation shape.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest

from kafka_avro_order_processing_spark.operators.unigram import (
    UNK_LOGPROB,
    _viterbi,
    seed_pieces,
    unigram_segment,
    unigram_train,
)

MAX_LEN = 8


def _ref_train(word_counts, vocab_size, n_rounds, max_len=MAX_LEN, seed_size=10_000):
    """Local replica of unigram_train's exact loop (same _viterbi, so
    this pins the DISTRIBUTED plumbing: seed explode, integer M-step,
    floor, prune order, stopping rule)."""
    cnt: Counter = Counter()
    for w, n in word_counts.items():
        for i in range(len(w)):
            for j in range(i + 1, min(len(w), i + max_len) + 1):
                cnt[w[i:j]] += n
    chars = {p for p in cnt if len(p) == 1}
    multi = sorted(
        ((p, c) for p, c in cnt.items() if len(p) > 1),
        key=lambda t: (-t[1], t[0]),
    )[:seed_size]
    pieces = {p: c for p, c in cnt.items() if len(p) == 1}
    pieces.update(dict(multi))

    def scores_of(pc):
        total = sum(pc.values()) or 1
        return {p: math.log(c / total) for p, c in pc.items()}

    scores = scores_of(pieces)
    prev = None
    new = pieces
    for _ in range(n_rounds):
        counts: Counter = Counter()
        for w, n in word_counts.items():
            for p in _viterbi(w, scores, max_len):
                counts[p] += n
        new = {p: max(counts.get(p, 0), 1) for p in chars}
        multi_new = {p: c for p, c in counts.items() if len(p) > 1}
        target_multi = max(vocab_size - len(chars), 0)
        keep = max(target_multi, math.floor(0.8 * len(multi_new)))
        kept = sorted(multi_new.items(), key=lambda t: (-t[1], t[0]))[:keep]
        new.update(dict(kept))
        scores = scores_of(new)
        if prev == new and len(multi_new) <= target_multi:
            break
        prev = new
    return new


def test_viterbi_prefers_higher_score_then_fewer_pieces():
    s = {"a": -1.0, "b": -1.0, "ab": -1.5}
    assert _viterbi("ab", s, 8) == ["ab"]          # -1.5 beats -2.0
    s2 = {"a": -1.0, "b": -1.0, "ab": -2.0}
    assert _viterbi("ab", s2, 8) == ["ab"]         # tie -2.0: fewer pieces
    s3 = {"a": -0.5, "b": -0.5, "ab": -2.0}
    assert _viterbi("ab", s3, 8) == ["a", "b"]     # -1.0 beats -2.0


def test_viterbi_unknown_chars_degrade():
    assert _viterbi("xy", {"x": -1.0}, 8) == ["x", "y"]
    assert _viterbi("q", {}, 8) == ["q"]
    # unknown multi-char never forms a piece
    assert _viterbi("qq", {}, 8) == ["q", "q"]


def test_seed_pieces_counts_and_cap(spark):
    from kafka_avro_order_processing_spark.operators.bpe import word_table

    docs = spark.createDataFrame(
        [(1, "abab ab"), (2, "abab")], "doc_id long, text string"
    )
    words = word_table(docs)
    got = {
        r["piece"]: r["count"]
        for r in seed_pieces(words, max_piece_len=4, seed_size=3).collect()
    }
    # chars always present; 'abab' substring counts: word 'abab' n=2,
    # 'ab' n=1 -> piece 'ab' appears 2x in 'abab' (positions 1,3) * 2
    # + 1 in 'ab' = 5
    assert got["a"] == 5 and got["b"] == 5
    assert got["ab"] == 5
    assert sum(1 for p in got if len(p) > 1) == 3  # seed cap


CORPUS = [
    (1, "low lower lowest low low"),
    (2, "new newer newest new newer"),
    (3, "wide wider widest wide"),
    (4, "low new wide slow slower"),
]


def test_train_matches_local_composition(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = {
        r["piece"]: r["count"]
        for r in unigram_train(docs, vocab_size=30, n_rounds=5).collect()
    }
    wc: Counter = Counter()
    for _, t in CORPUS:
        wc.update(t.split())
    want = _ref_train(dict(wc), vocab_size=30, n_rounds=5)
    assert got == want
    # vocab size honored (chars floor + multi target)
    n_chars = sum(1 for p in got if len(p) == 1)
    assert len(got) <= max(30, n_chars)


def test_segment_conserves_and_matches_viterbi(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    pieces = unigram_train(docs, vocab_size=30, n_rounds=5)
    scores = {
        r["piece"]: r["logprob"] for r in pieces.collect()
    }
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, '\\\\s+'), t -> t != '')").alias("tokens"),
    )
    seg = {
        r["doc_id"]: (r["pieces"], r["n_pieces"])
        for r in unigram_segment(toks, pieces).collect()
    }
    for did, text in CORPUS:
        want = []
        for w in text.split():
            want.extend(_viterbi(w, scores, MAX_LEN))
        assert seg[did][0] == want, did
        assert seg[did][1] == len(want)
        # conservation: concatenating pieces reproduces the tokens
        assert "".join(seg[did][0]) == text.replace(" ", "")


def test_segment_handles_unknown_and_empty(spark):
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    pieces = unigram_train(docs, vocab_size=30, n_rounds=3)
    toks = spark.createDataFrame(
        [(10, ["lowqz"]), (11, []), (12, None)],
        "doc_id long, tokens array<string>",
    )
    got = {
        r["doc_id"]: r["pieces"] for r in unigram_segment(toks, pieces).collect()
    }
    assert "".join(got[10]) == "lowqz"  # unknown chars ride through
    assert got[11] == [] and got[12] == []


def test_validates_params(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    with pytest.raises(ValueError):
        unigram_train(docs, vocab_size=0)
    with pytest.raises(ValueError):
        unigram_train(docs, vocab_size=10, n_rounds=0)


@pytest.mark.slow
def test_streaming_unigram_segment_bit_matches_batch(spark, tmp_path):
    """The ingest twin: a landing doc's tokens Viterbi-segment inside
    their own row against the broadcast trained piece table — drained
    == batch on the same rows, one epoch and many (3 files -> 3
    micro-batches), including empty and NULL token arrays and unknown
    characters (UNK_LOGPROB fallback)."""
    from pyspark.sql import functions as F

    from kafka_avro_order_processing_spark.operators.unigram import (
        unigram_segment,
        unigram_train,
    )
    from kafka_avro_order_processing_spark.streaming.tokens import (
        streaming_unigram_segment,
    )

    texts = [
        "low lower lowest low low",
        "new newer newest new newer",
        "wide wider widest wide",
        "low new wide lowest",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    pieces = unigram_train(
        docs, vocab_size=12, n_rounds=8, seed_size=200
    ).localCheckpoint(eager=True)
    toks = docs.select(
        "doc_id",
        F.expr("filter(split(text, '\\\\s+'), w -> w != '')").alias("tokens"),
    )
    extra = spark.createDataFrame(
        [(9, ["zzq", "low"]), (10, []), (11, None)],
        "doc_id long, tokens array<string>",
    )
    allt = toks.unionByName(extra)
    want = sorted(
        (r["doc_id"], tuple(r["pieces"]), r["n_pieces"])
        for r in unigram_segment(allt, pieces).collect()
    )

    d = str(tmp_path / "toks")
    allt.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema("doc_id long, tokens array<string>")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = sorted(
        (r["doc_id"], tuple(r["pieces"]), r["n_pieces"])
        for r in streaming_unigram_segment(stream, pieces).collect()
    )
    assert got == want
