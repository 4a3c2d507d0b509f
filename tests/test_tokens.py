"""Trainer-shard assembly (operators/tokens.py): vocabulary ranking,
id encoding, and fixed-length sequence packing against Python
references; global conservation invariants under multi-shard packing;
the end-to-end BPE -> ids -> sequences path on real documents.
"""

from __future__ import annotations

import pytest

from collections import Counter

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.tokens import (
    build_vocab,
    encode_ids,
    pack_token_sequences,
)

TOKS = {
    0: ["the", "cat", "sat", "on", "the", "mat", "</w>"],
    1: ["the", "dog", "sat", "</w>"],
    2: [],
    3: ["mat", "mat", "mat", "the", "</w>"],
}


def _tokenized(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in TOKS.items()], "doc_id long, tokens array<string>"
    )


def _py_vocab():
    c = Counter(t for ts in TOKS.values() for t in ts)
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    return {t: i for i, (t, _) in enumerate(ranked)}


def test_build_vocab_matches_reference(spark):
    got = {
        r["token"]: r["token_id"]
        for r in build_vocab(_tokenized(spark)).collect()
    }
    assert got == _py_vocab()


def test_encode_ids_matches_reference(spark):
    v = _py_vocab()
    vocab = build_vocab(_tokenized(spark))
    got = {
        r["doc_id"]: (list(r["ids"]), r["n_tokens"])
        for r in encode_ids(_tokenized(spark), vocab).collect()
    }
    for d, ts in TOKS.items():
        assert got[d] == ([v[t] for t in ts], len(ts)), d


def test_encode_ids_oov_marker(spark):
    vocab = build_vocab(_tokenized(spark))
    new = spark.createDataFrame(
        [(9, ["the", "zebra", "sat"])], "doc_id long, tokens array<string>"
    )
    r = encode_ids(new, vocab).collect()[0]
    v = _py_vocab()
    assert list(r["ids"]) == [v["the"], -1, v["sat"]]


def test_pack_single_shard_matches_reference(spark):
    # n_shards=1: shard-local concatenation IS total doc_id order, so
    # the reference is a plain flatten + chunk.
    vocab = build_vocab(_tokenized(spark))
    enc = encode_ids(_tokenized(spark), vocab)
    seq_len = 5
    out = sorted(
        (r["seq_id"], list(r["token_ids"]), r["n_tokens"],
         [(s["doc_id"], s["start"], s["end"]) for s in r["doc_spans"]])
        for r in pack_token_sequences(
            enc, seq_len=seq_len, n_shards=1
        ).collect()
    )
    v = _py_vocab()
    stream, spans_ref = [], []
    for d in sorted(k for k in TOKS if TOKS[k]):
        start = len(stream)
        stream.extend(v[t] for t in TOKS[d])
        spans_ref.append((d, start, len(stream) - 1))
    want = []
    for i in range(0, len(stream), seq_len):
        chunk = stream[i : i + seq_len]
        spans = []
        for d, s, e in spans_ref:
            lo, hi = max(s, i), min(e, i + seq_len - 1)
            if lo <= hi:
                spans.append((d, lo - i, hi - i))
        want.append((i // seq_len, chunk, len(chunk), sorted(spans, key=lambda x: x[1])))
    assert out == want


def test_pack_multi_shard_conserves_every_document(spark):
    # 4 shards: reconstruct every document from its spans across
    # sequences (ordered by seq_id) — must equal its encoded ids
    # exactly; and the total token count must be conserved.
    vocab = build_vocab(_tokenized(spark))
    enc = encode_ids(_tokenized(spark), vocab)
    rows = pack_token_sequences(enc, seq_len=4, n_shards=4).collect()
    rebuilt: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: r["seq_id"]):
        for s in r["doc_spans"]:
            rebuilt.setdefault(s["doc_id"], []).extend(
                r["token_ids"][s["start"] : s["end"] + 1]
            )
    v = _py_vocab()
    for d, ts in TOKS.items():
        if ts:
            assert rebuilt[d] == [v[t] for t in ts], d
    assert sum(r["n_tokens"] for r in rows) == sum(len(t) for t in TOKS.values())


def test_pack_partitioning_independence(spark):
    vocab = build_vocab(_tokenized(spark))
    enc = encode_ids(_tokenized(spark), vocab)
    norm = lambda rows: sorted(  # noqa: E731
        (r["seq_id"], tuple(r["token_ids"]),
         tuple((s["doc_id"], s["start"], s["end"]) for s in r["doc_spans"]))
        for r in rows
    )
    a = norm(pack_token_sequences(enc, seq_len=4, n_shards=3).collect())
    b = norm(
        pack_token_sequences(
            enc.repartition(7, F.col("doc_id")), seq_len=4, n_shards=3
        ).collect()
    )
    assert a == b


@pytest.mark.slow
def test_bpe_to_sequences_end_to_end(spark):
    # the full last mile on real documents: BPE train+encode -> vocab
    # -> ids -> packed sequences; no OOV (vocab trained on the same
    # corpus), token counts conserved end to end.
    from kafka_avro_order_processing_spark.operators.bpe import (
        bpe_encode,
        bpe_train,
    )
    from kafka_avro_order_processing_spark.sources.tables import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("doc_id") < 30)
        .select("doc_id", "text")
    )
    tokenized = bpe_encode(docs, bpe_train(docs, 8))
    vocab = build_vocab(tokenized)
    enc = encode_ids(tokenized, vocab)
    assert enc.filter(F.array_contains("ids", -1)).count() == 0
    total = enc.agg(F.sum("n_tokens")).collect()[0][0]
    seqs = pack_token_sequences(enc, seq_len=64, n_shards=4)
    assert seqs.agg(F.sum("n_tokens")).collect()[0][0] == total
    # every full sequence is exactly seq_len; short ones are shard tails
    lens = [r["n_tokens"] for r in seqs.collect()]
    assert sum(1 for x in lens if x < 64) <= 4  # <= one tail per shard


def test_oov_stats_exact(spark):
    from kafka_avro_order_processing_spark.operators.tokens import (
        encode_ids,
        oov_stats,
    )

    vocab = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 2)], "token string, token_id int"
    )
    docs = spark.createDataFrame(
        [
            (1, ["a", "b", "zz", "c"]),   # 1 OOV of 4
            (2, ["a", "a"]),              # clean
            (3, ["q", "r", "s"]),         # all OOV
            (4, []),                      # empty doc -> NULL rate
        ],
        "doc_id int, tokens array<string>",
    )
    enc = encode_ids(docs, vocab)
    per_doc, totals = oov_stats(enc)
    got = {r["doc_id"]: r for r in per_doc.collect()}
    assert (got[1]["n_oov"], got[1]["n_tokens"]) == (1, 4)
    assert abs(got[1]["oov_rate"] - 0.25) < 1e-15
    assert got[2]["n_oov"] == 0 and got[3]["n_oov"] == 3
    assert got[4]["n_tokens"] == 0 and got[4]["oov_rate"] is None
    assert totals == {
        "n_docs": 4,
        "n_tokens": 9,
        "n_oov": 4,
        "oov_rate": 4 / 9,
        "n_docs_with_oov": 2,
    }


def _py_span_corruption(doc_id, toks, mask_rate=0.15, salt="t5"):
    import hashlib

    edge = int(mask_rate * (1 << 32))

    def masked(pos):
        h = hashlib.md5(f"{salt}:{doc_id}:{pos}".encode()).hexdigest()
        return int(h[:8], 16) < edge

    inputs, targets = [], []
    k = -1
    in_run = False
    n_masked = 0
    for i, t in enumerate(toks):
        if masked(i):
            n_masked += 1
            if not in_run:
                k += 1
                in_run = True
                inputs.append(f"<extra_id_{k}>")
                targets.append(f"<extra_id_{k}>")
            targets.append(t)
        else:
            in_run = False
            inputs.append(t)
    return inputs, targets, n_masked


def test_span_corruption_matches_python_replica(spark):
    import random

    from kafka_avro_order_processing_spark.operators.tokens import (
        span_corruption,
    )

    rnd = random.Random(79)
    docs = [
        (i, [f"w{rnd.randint(0, 30)}" for _ in range(rnd.randint(0, 60))])
        for i in range(40)
    ]
    df = spark.createDataFrame(docs, "doc_id int, tokens array<string>")
    out = {
        r["doc_id"]: r
        for r in span_corruption(df, mask_rate=0.3).collect()
    }
    assert set(out) == set(range(40))  # empty docs keep a row
    any_masked = False
    for i, toks in docs:
        want_in, want_tgt, want_n = _py_span_corruption(i, toks, 0.3)
        r = out[i]
        assert r["inputs"] == want_in, i
        assert r["targets"] == want_tgt, i
        assert r["n_masked"] == want_n, i
        any_masked = any_masked or want_n > 0
        # conservation: unmasked tokens + hidden tokens = all tokens
        n_sent_in = sum(1 for t in r["inputs"] if t.startswith("<extra_id_"))
        assert len(r["inputs"]) - n_sent_in + r["n_masked"] == len(toks)
    assert any_masked

    # deterministic under partitioning; salt changes the corruption
    again = {
        r["doc_id"]: (r["inputs"], r["targets"])
        for r in span_corruption(df.repartition(7), mask_rate=0.3).collect()
    }
    assert again == {i: (out[i]["inputs"], out[i]["targets"]) for i in out}
    other = {
        r["doc_id"]: r["inputs"]
        for r in span_corruption(df, mask_rate=0.3, salt="other").collect()
    }
    assert any(other[i] != out[i]["inputs"] for i in out)

    # rate 0: nothing masked, inputs = tokens
    zero = {
        r["doc_id"]: r
        for r in span_corruption(df, mask_rate=0.0).collect()
    }
    for i, toks in docs:
        assert zero[i]["inputs"] == toks and zero[i]["targets"] == []

    import pytest as _pytest

    with _pytest.raises(ValueError):
        span_corruption(df, mask_rate=1.0)


def test_streaming_oov_stats_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.operators.tokens import (
        encode_ids,
        oov_stats,
    )
    from kafka_avro_order_processing_spark.streaming.tokens import (
        streaming_oov_stats,
    )

    vocab = spark.createDataFrame(
        [("a", 0), ("b", 1), ("c", 2)], "token string, token_id int"
    )
    docs = [
        (1, ["a", "b", "zz", "c"]),
        (2, ["a", "a"]),
        (3, ["q", "r", "s"]),
        (4, []),
        (5, ["b", "zz", "zz"]),
        (6, ["c"]),
    ]
    df = spark.createDataFrame(docs, "doc_id int, tokens array<string>")
    per_doc, totals = oov_stats(encode_ids(df, vocab))
    want = sorted(tuple(r) for r in per_doc.collect())

    d = str(tmp_path / "docs")
    df.repartition(3).write.parquet(d)  # 3 files -> 3 micro-batches
    stream = (
        spark.readStream.schema("doc_id int, tokens array<string>")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    drained = streaming_oov_stats(stream, vocab)
    got = sorted(tuple(r) for r in drained.collect())
    assert got == want
    # batch fold over the drained frame reproduces the exact totals
    from pyspark.sql import functions as F2

    agg = drained.agg(
        F2.count(F2.lit(1)).alias("d"),
        F2.sum("n_tokens").alias("t"),
        F2.sum("n_oov").alias("o"),
        F2.sum((F2.col("n_oov") > 0).cast("bigint")).alias("dw"),
    ).collect()[0]
    assert {
        "n_docs": agg["d"],
        "n_tokens": int(agg["t"]),
        "n_oov": int(agg["o"]),
        "oov_rate": int(agg["o"]) / int(agg["t"]),
        "n_docs_with_oov": int(agg["dw"]),
    } == totals


def _py_mlm(doc_id, toks, vocab_tokens, mask_rate=0.15, salt="mlm"):
    import hashlib

    edge = int(mask_rate * (1 << 32))
    v = len(vocab_tokens)

    def draw(tag, pos):
        h = hashlib.md5(f"{salt}.{tag}:{doc_id}:{pos}".encode()).hexdigest()
        return int(h[:8], 16)

    inputs, labels, n_sel = [], [], 0
    for i, t in enumerate(toks):
        if draw("sel", i) < edge:
            n_sel += 1
            labels.append(t)
            b = draw("branch", i) % 10
            if b <= 7:
                inputs.append("[MASK]")
            elif b == 8:
                inputs.append(vocab_tokens[draw("repl", i) % v])
            else:
                inputs.append(t)
        else:
            inputs.append(t)
            labels.append(None)
    return inputs, labels, n_sel


def test_mlm_masking_matches_python_replica(spark):
    import random

    from kafka_avro_order_processing_spark.operators.tokens import (
        build_vocab,
        mlm_masking,
    )

    rnd = random.Random(89)
    docs = [
        (i, [f"w{rnd.randint(0, 20)}" for _ in range(rnd.randint(0, 50))])
        for i in range(30)
    ]
    df = spark.createDataFrame(docs, "doc_id int, tokens array<string>")
    vocab = build_vocab(df).localCheckpoint(eager=True)
    # dense-id token list in id order, as the operator's random branch sees it
    vt = [
        r["token"]
        for r in vocab.orderBy("token_id").collect()
    ]
    out = {
        r["doc_id"]: r for r in mlm_masking(df, vocab, mask_rate=0.3).collect()
    }
    assert set(out) == set(range(30))
    branches = set()
    for i, toks in docs:
        want_in, want_lab, want_n = _py_mlm(i, toks, vt, 0.3)
        r = out[i]
        assert r["input_tokens"] == want_in, i
        assert list(r["labels"]) == want_lab, i
        assert r["n_selected"] == want_n, i
        assert len(r["input_tokens"]) == len(toks)  # length preserved
        for a, b, lab in zip(r["input_tokens"], toks, r["labels"]):
            if lab is None:
                assert a == b  # unselected positions untouched
            else:
                branches.add(
                    "mask" if a == "[MASK]" else ("keep" if a == b else "rand")
                )
    assert branches == {"mask", "keep", "rand"}  # all three 80/10/10 arms hit

    # deterministic under partitioning
    again = {
        r["doc_id"]: r["input_tokens"]
        for r in mlm_masking(df.repartition(7), vocab, mask_rate=0.3).collect()
    }
    assert again == {i: out[i]["input_tokens"] for i in out}

    import pytest as _pytest

    with _pytest.raises(ValueError):
        mlm_masking(df, vocab, mask_rate=1.0)
    with _pytest.raises(ValueError):
        mlm_masking(df, vocab.filter("token_id < 0"))
