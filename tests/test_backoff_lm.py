"""Stupid-backoff trigram LM (operators/lm.py, Brants et al. EMNLP
2007): count tables integer-exact vs a Python reference, scores to
1e-9 vs the same reference (ln is not IEEE-portable), level counters
disjoint and exhaustive, bit-identical under repartitioning (the
quantize-once discipline), and degenerate inputs handled.
"""

from __future__ import annotations

import math
from collections import Counter

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.lm import (
    BOS,
    backoff_lm_score,
    train_backoff_lm,
)

REF = [
    "the quick brown fox jumps over the lazy dog",
    "the lazy dog sleeps in the sun",
    "a quick fox runs over the hill",
    "the sun rises over the hill",
    "the quick fox jumps over the lazy dog again",
]
CAND = [
    "the quick fox jumps over the hill",     # mostly trigram hits
    "dog the over quick hill a the runs",    # same words, shuffled: backoff
    "zyx wvu tsr qpo nml",                   # pure OOV
    "sun",                                   # one token: double-BOS context
    "",                                      # empty: no row
    "the   quick",                      # NBSP is NOT Java \s: stays a token
]


def _py_positions(text):
    # replicate Spark's Java \s+ split exactly (ASCII whitespace only —
    # the NBSP row keeps \xa0 as its own out-of-vocabulary token)
    toks = []
    cur = ""
    for ch in text:
        if ch in " \t\n\x0b\f\r":
            if cur:
                toks.append(cur)
            cur = ""
        else:
            cur += ch
    if cur:
        toks.append(cur)
    seq = [BOS, BOS] + toks
    return [(seq[i - 2], seq[i - 1], seq[i]) for i in range(2, len(seq))]


def _py_train(texts):
    tri = Counter()
    for t in texts:
        for g in _py_positions(t):
            tri[g] += 1
    bi_ctx = Counter()
    bi = Counter()
    for (a, b, c), n in tri.items():
        bi_ctx[(a, b)] += n
        bi[(b, c)] += n
    uni_ctx = Counter()
    uni = Counter()
    for (b, c), n in bi.items():
        uni_ctx[b] += n
        uni[c] += n
    n_tokens = sum(uni.values())
    vocab = len(uni) + 1
    return tri, bi_ctx, bi, uni_ctx, uni, n_tokens, vocab


def _py_score(text, model, lam=0.4, alpha=0.5):
    tri, bi_ctx, bi, uni_ctx, uni, n_tok, vocab = model
    levels = Counter()
    lps = []
    for a, b, c in _py_positions(text):
        if tri.get((a, b, c)):
            s = tri[(a, b, c)] / bi_ctx[(a, b)]
            levels["tri"] += 1
        elif bi.get((b, c)):
            s = lam * bi[(b, c)] / uni_ctx[b]
            levels["bi"] += 1
        else:
            s = lam * lam * (uni.get(c, 0) + alpha) / (n_tok + alpha * vocab)
            levels["uni" if c in uni else "oov"] += 1
        lps.append(math.log(s))
    if not lps:
        return None
    return len(lps), sum(lps) / len(lps), levels


def _frames(spark):
    ref = spark.createDataFrame(
        [(i, t) for i, t in enumerate(REF)], "doc_id long, text string"
    )
    cand = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CAND)], "doc_id long, text string"
    )
    return ref, cand


def test_train_tables_match_reference(spark):
    ref, _ = _frames(spark)
    lm = train_backoff_lm(ref)
    tri, bi_ctx, bi, uni_ctx, uni, n_tok, vocab = _py_train(REF)
    got3 = {(r["a"], r["b"], r["c"]): r["c3"] for r in lm.tri.collect()}
    assert got3 == dict(tri)
    got_bc = {(r["a"], r["b"]): r["c2ctx"] for r in lm.bi_ctx.collect()}
    assert got_bc == dict(bi_ctx)
    got2 = {(r["b"], r["c"]): r["c2"] for r in lm.bi.collect()}
    assert got2 == dict(bi)
    got_uc = {r["b"]: r["c1ctx"] for r in lm.uni_ctx.collect()}
    assert got_uc == dict(uni_ctx)
    got1 = {r["c"]: r["c1"] for r in lm.uni.collect()}
    assert got1 == dict(uni)
    assert lm.n_tokens == n_tok
    assert lm.vocab_size == vocab
    # BOS is context-only: it never appears as a predicted token
    assert BOS not in got1


def test_scores_match_python_reference(spark):
    ref, cand = _frames(spark)
    lm = train_backoff_lm(ref)
    model = _py_train(REF)
    rows = {r["doc_id"]: r for r in backoff_lm_score(cand, lm).collect()}
    assert 4 not in rows  # empty doc: no row
    for i, text in enumerate(CAND):
        expect = _py_score(text, model)
        if expect is None:
            assert i not in rows
            continue
        n, avg, levels = expect
        got = rows[i]
        assert got["n_tokens"] == n
        assert got["avg_logscore"] == pytest.approx(avg, abs=1e-9)
        assert got["n_tri"] == levels["tri"]
        assert got["n_bi"] == levels["bi"]
        assert got["n_uni"] == levels["uni"]
        assert got["n_oov"] == levels["oov"]
        assert got["n_tri"] + got["n_bi"] + got["n_uni"] + got["n_oov"] == n


def test_fluency_ordering_and_oov_floor(spark):
    ref, cand = _frames(spark)
    lm = train_backoff_lm(ref)
    rows = {r["doc_id"]: r for r in backoff_lm_score(cand, lm).collect()}
    # in-domain > shuffled > gibberish
    assert rows[0]["avg_logscore"] > rows[1]["avg_logscore"] > rows[2]["avg_logscore"]
    # the gibberish doc is scored entirely at the OOV floor, finitely
    assert rows[2]["n_oov"] == rows[2]["n_tokens"]
    assert math.isfinite(rows[2]["avg_logscore"])
    # the in-domain doc mostly resolves at the trigram level
    assert rows[0]["n_tri"] >= rows[0]["n_tokens"] - 2


def test_one_token_doc_scored_via_double_bos(spark):
    ref, cand = _frames(spark)
    lm = train_backoff_lm(ref)
    row = backoff_lm_score(cand, lm).filter(F.col("doc_id") == 3).collect()[0]
    assert row["n_tokens"] == 1
    # "sun" follows (BOS, BOS) only if some REF doc starts with it; none
    # does, but (BOS, sun) bigram also never occurs -> unigram level
    assert row["n_uni"] == 1


def test_bit_identical_under_repartitioning(spark):
    ref, cand = _frames(spark)
    lm = train_backoff_lm(ref)
    base = {
        r["doc_id"]: r["avg_logscore"]
        for r in backoff_lm_score(cand, lm).collect()
    }
    for parts in (1, 7):
        again = {
            r["doc_id"]: r["avg_logscore"]
            for r in backoff_lm_score(cand.repartition(parts), lm).collect()
        }
        assert again == base  # exact float equality, not approx


def test_empty_model_rejected(spark):
    empty = spark.createDataFrame([], "doc_id long, text string")
    lm = train_backoff_lm(empty)
    assert lm.n_tokens == 0
    _, cand = _frames(spark)
    with pytest.raises(ValueError, match="empty corpus"):
        backoff_lm_score(cand, lm)


def test_param_validation(spark):
    ref, cand = _frames(spark)
    lm = train_backoff_lm(ref)
    with pytest.raises(ValueError, match="lam"):
        backoff_lm_score(cand, lm, lam=0.0)
    with pytest.raises(ValueError, match="alpha"):
        backoff_lm_score(cand, lm, alpha=0.0)


def test_no_python_udf_in_plan(spark):
    ref, cand = _frames(spark)
    lm = train_backoff_lm(ref)
    plan = backoff_lm_score(cand, lm)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_streaming_backoff_bit_matches_batch(spark):
    from kafka_avro_order_processing_spark.sources.tables import load_table
    from kafka_avro_order_processing_spark.streaming.lm import (
        streaming_backoff_lm_score,
    )
    from kafka_avro_order_processing_spark.streaming.pipeline import stream_table

    SF = "/root/testdata/sf0.001"
    docs = load_table(spark, SF, "documents").select("doc_id", "text")
    lm = train_backoff_lm(docs.filter(F.col("doc_id") % 2 == 0)).materialized()
    want = sorted(tuple(r) for r in backoff_lm_score(docs, lm).collect())
    got = sorted(
        tuple(r)
        for r in streaming_backoff_lm_score(
            stream_table(spark, SF, "documents").select("doc_id", "text"), lm
        ).collect()
    )
    assert got == want


def test_streaming_backoff_multi_epoch_equals_single(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.lm import (
        streaming_backoff_lm_score,
    )

    ref, cand = _frames(spark)
    lm = train_backoff_lm(ref).materialized()
    d = str(tmp_path / "docs")
    cand.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    want = sorted(tuple(r) for r in backoff_lm_score(cand, lm).collect())
    got = sorted(
        tuple(r) for r in streaming_backoff_lm_score(stream, lm).collect()
    )
    assert got == want
