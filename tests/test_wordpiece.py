"""WordPiece trainer + greedy encoder (operators/wordpiece.py): exact
Python-replica parity for training (likelihood-scored merges with the
pinned f64-score / (left, right) tie order) and encoding (BERT's
longest-match-first with [UNK] dead ends), tie-pressure fuzz on a tiny
alphabet, partitioning independence, conservation, and a DuckDB merge-
table oracle through the driver's canonicalization (registry-ready,
the bpe_train chained-CTE pattern — a future promotion candidate).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.wordpiece import (
    CONTINUATION_PREFIX,
    UNK_PIECE,
    wordpiece_encode,
    wordpiece_train,
    wordpiece_vocab,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low new wide lowest",
]


def _py_merge_word(s, left, right, merged):
    out, i = [], 0
    while i < len(s):
        if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
            out.append(merged)
            i += 2
        else:
            out.append(s[i])
            i += 1
    return out


def _py_wp_train(texts, n_merges, min_pair_count=2):
    words: dict[str, int] = {}
    for t in texts:
        for w in t.split():
            if w:
                words[w] = words.get(w, 0) + 1
    syms = {
        w: [w[0]] + [CONTINUATION_PREFIX + c for c in w[1:]] for w in words
    }
    merges = []
    for rank in range(n_merges):
        pc: dict[tuple[str, str], int] = {}
        sc: dict[str, int] = {}
        for w, n in words.items():
            s = syms[w]
            for x in s:
                sc[x] = sc.get(x, 0) + n
            for a, b in zip(s, s[1:]):
                pc[(a, b)] = pc.get((a, b), 0) + n
        cands = [
            (c / (sc[a] * sc[b]), a, b, c)  # ONE f64 division of exact ints
            for (a, b), c in pc.items()
            if c >= min_pair_count
        ]
        if not cands:
            break
        score, a, b, c = min(cands, key=lambda t: (-t[0], t[1], t[2]))
        merged = a + (
            b[len(CONTINUATION_PREFIX):]
            if b.startswith(CONTINUATION_PREFIX)
            else b
        )
        merges.append((rank, a, b, merged, c, sc[a], sc[b], score))
        for w in syms:
            syms[w] = _py_merge_word(syms[w], a, b, merged)
    return merges


def _py_wp_pieces(word, vocab):
    if not word:
        return []
    out, i, n = [], 0, len(word)
    while i < n:
        j, piece = n, None
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


def _rows(df):
    return [
        (
            r["rank"], r["left"], r["right"], r["merged"],
            r["pair_count"], r["left_count"], r["right_count"], r["score"],
        )
        for r in df.orderBy("rank").collect()
    ]


def test_wordpiece_train_matches_reference(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    got = _rows(wordpiece_train(docs, 8))
    want = _py_wp_train(TEXTS, 8)
    assert got == want
    # the continuation contract: every right side is ##-prefixed and
    # the merged token keeps the left's prefix status only
    for _, left, right, merged, *_ in got:
        assert right.startswith(CONTINUATION_PREFIX)
        assert merged == left + right[len(CONTINUATION_PREFIX):]


def test_wordpiece_scores_differ_from_bpe_order(spark):
    """The likelihood score must actually change the merge order vs
    raw pair frequency on a corpus built for it: 'xq' appears less
    often than 'ab' but x and q appear NOWHERE else, so
    c/(c_l*c_r) ranks (x, ##q) first while BPE would take (a, ##b)."""
    texts = ["xq xq xq", "ab ab ab ab az az az az"]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = _rows(wordpiece_train(docs, 1))
    # (x, ##q): 3/(3*3) = 1/3 beats (a, ##b) and (a, ##z): 4/(8*4)
    assert (got[0][1], got[0][2]) == ("x", "##q")
    want = _py_wp_train(texts, 1)
    assert got == want
    # and raw frequency really does prefer the other pairs
    assert got[0][4] == 3  # xq count 3 < ab/az count 4


def test_wordpiece_train_partitioning_independence(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS * 3)], "doc_id long, text string"
    )
    a = _rows(wordpiece_train(docs, 6))
    b = _rows(wordpiece_train(docs.repartition(7, F.col("doc_id")), 6))
    assert a == b


def test_wordpiece_encode_matches_reference_and_conserves(spark):
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = wordpiece_train(docs, 8)
    vocab = wordpiece_vocab(docs, merges)
    enc = {
        r["doc_id"]: (list(r["pieces"]), r["n_pieces"], r["n_unk"])
        for r in wordpiece_encode(docs, vocab).collect()
    }
    vset = set(vocab)
    for i, t in enumerate(TEXTS):
        want = []
        for w in t.split():
            want.extend(_py_wp_pieces(w, vset))
        pieces, n_pieces, n_unk = enc[i]
        assert pieces == want, (t, pieces, want)
        assert n_pieces == len(want)
        assert n_unk == sum(1 for p in want if p == UNK_PIECE)
        # conservation: vocab covers the training corpus, so zero UNK
        # and stripping ## reconstructs the text's words exactly
        assert n_unk == 0
        joined = "".join(
            p[len(CONTINUATION_PREFIX):]
            if p.startswith(CONTINUATION_PREFIX)
            else p
            for p in pieces
        )
        assert joined == t.replace(" ", "")


def test_wordpiece_encode_unknown_word_and_empty(spark):
    docs = spark.createDataFrame(
        [(1, "low zz low"), (2, ""), (3, None)], "doc_id long, text string"
    )
    merges = wordpiece_train(
        docs.filter(F.col("doc_id") == 1).select(
            "doc_id", F.lit("low low").alias("text")
        ),
        2,
    )
    vocab = wordpiece_vocab(
        docs.select("doc_id", F.lit("low low").alias("text")), merges
    )
    got = {
        r["doc_id"]: (list(r["pieces"]), r["n_unk"])
        for r in wordpiece_encode(docs, vocab).collect()
    }
    # 'zz' dead-ends ('z' not in the vocab): the WHOLE word is [UNK]
    assert got[1][0] == ["low", UNK_PIECE, "low"]
    assert got[1][1] == 1
    assert got[2] == ([], 0)
    assert got[3] == ([], 0)


@pytest.mark.slow
def test_wordpiece_on_documents_table_matches_reference(spark):
    docs = (
        load_table(spark, SF, "documents")
        .filter(F.col("doc_id") < 40)
        .select("doc_id", "text")
    )
    texts = [r["text"] for r in docs.collect()]
    got = _rows(wordpiece_train(docs, 10))
    want = _py_wp_train(texts, 10)
    assert got == want
    # encode compresses: fewer pieces than characters
    vocab = wordpiece_vocab(docs, wordpiece_train(docs, 10))
    enc = wordpiece_encode(docs, vocab)
    n_pieces = enc.select(F.sum("n_pieces")).collect()[0][0]
    n_chars = docs.select(
        F.sum(F.length(F.regexp_replace("text", r"\s+", "")))
    ).collect()[0][0]
    assert 0 < n_pieces < n_chars
    assert enc.select(F.sum("n_unk")).collect()[0][0] == 0


@pytest.mark.slow
def test_wordpiece_fuzz_matches_reference(spark):
    # Tiny alphabet = maximal tie pressure on the score/(l, r) argmax;
    # fixed-seed battery (one Spark run per corpus — hypothesis'
    # adaptive search would be too slow, the bpe fuzz convention).
    import random

    for seed in range(6):
        rnd = random.Random(1000 + seed)
        texts = [
            " ".join(
                "".join(rnd.choice("ab") for _ in range(rnd.randint(1, 5)))
                for _ in range(rnd.randint(1, 8))
            )
            for _ in range(rnd.randint(1, 6))
        ]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = _rows(wordpiece_train(docs, 6))
        want = _py_wp_train(texts, 6)
        assert got == want, (seed, texts, got, want)


# ---------------------------------------------------------------------------
# DuckDB merge-table oracle (registry-ready; the bpe_train chained-CTE
# pattern with per-round symbol counts and the f64 likelihood score)
# ---------------------------------------------------------------------------


def _wp_round_sql(k: int) -> str:
    """One WordPiece merge round as chained CTEs: per-round symbol +
    pair counts over the chr(1)-wrapped symbol strings, the argmax by
    CAST(c AS DOUBLE) / CAST(cl*cr AS DOUBLE) with (l, r) ties —
    exactly the trainer's comparison — then the greedy non-overlapping
    REPLACE merge (the bpe oracle's fold trick)."""
    p = k - 1
    return f"""
        syms_{k} AS (
          SELECT word, n,
                 string_split(substr(symstr, 2, length(symstr) - 2),
                              chr(1) || chr(1)) AS syms
          FROM r{p}
        ),
        sc_{k} AS (
          SELECT s, CAST(SUM(n) AS BIGINT) AS c FROM (
            SELECT n, unnest(syms) AS s FROM syms_{k}
          ) GROUP BY s
        ),
        pairs_{k} AS (
          SELECT l, r, CAST(SUM(n) AS BIGINT) AS c FROM (
            SELECT n, syms[i] AS l, syms[i + 1] AS r FROM (
              SELECT n, syms,
                     unnest(generate_series(1, greatest(len(syms) - 1, 0))) AS i
              FROM syms_{k})
          ) GROUP BY l, r HAVING SUM(n) >= 2
        ),
        best_{k} AS (
          SELECT p.l, p.r, p.c, a.c AS cl, b.c AS cr,
                 CAST(p.c AS DOUBLE) / CAST(a.c * b.c AS DOUBLE) AS score,
                 p.l || CASE WHEN starts_with(p.r, '##') THEN substr(p.r, 3)
                             ELSE p.r END AS merged
          FROM pairs_{k} p
          JOIN sc_{k} a ON a.s = p.l
          JOIN sc_{k} b ON b.s = p.r
          ORDER BY score DESC, p.l ASC, p.r ASC LIMIT 1
        ),
        r{k} AS MATERIALIZED (
          SELECT w.word, w.n,
                 COALESCE(
                   (SELECT replace(w.symstr,
                                   chr(1) || b.l || chr(1) || chr(1) || b.r || chr(1),
                                   chr(1) || b.merged || chr(1))
                    FROM best_{k} b),
                   w.symstr) AS symstr
          FROM r{p} w
        )"""


def _wp_merge_table_sql(n_merges: int) -> str:
    rounds = ",".join(_wp_round_sql(k) for k in range(1, n_merges + 1))
    finals = " UNION ALL ".join(
        f"SELECT CAST({k - 1} AS INTEGER) AS rank, l AS \"left\","
        f" r AS \"right\", merged, c AS pair_count, cl AS left_count,"
        f" cr AS right_count, score FROM best_{k}"
        for k in range(1, n_merges + 1)
    )
    return f"""
        WITH wt AS (
          SELECT word, COUNT(*) AS n FROM (
            SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
                                      t -> t <> '')) AS word
            FROM documents) GROUP BY word
        ),
        r0 AS (
          SELECT word, n,
                 chr(1) || array_to_string(
                   list_transform(range(1, length(word) + 1),
                     i -> CASE WHEN i = 1 THEN substr(word, 1, 1)
                               ELSE '##' || substr(word, i, 1) END),
                   chr(1) || chr(1)) || chr(1) AS symstr
          FROM wt
        ),
        {rounds}
        SELECT * FROM ({finals}) ORDER BY rank
    """


def test_wordpiece_merge_table_duckdb_oracle(spark):
    from test_oracle_parity import SF_DIR
    from test_r10_promotion_parity import _assert_parity

    sdf = wordpiece_train(load_table(spark, SF_DIR, "documents"), n_merges=6)
    _assert_parity(sdf, _wp_merge_table_sql(6))


def test_streaming_wordpiece_encode_bit_matches_batch(spark, tmp_path):
    """The ingest twin: a landing doc segments inside its own row, so
    the drained frame bit-matches the batch encoder on the same rows —
    one epoch and many (3 files -> 3 micro-batches)."""
    from kafka_avro_order_processing_spark.streaming.tokens import (
        streaming_wordpiece_encode,
    )

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)]
        + [
            (9, "low zz"),
            (10, None),
            # Non-ASCII whitespace: Spark's Java \s+ does NOT split on
            # NBSP/\x85/\u2009, so "low<NBSP>zz" must stay ONE word in
            # BOTH engines (a Python str.split() in the twin would
            # split it and break the bit-match — the r9 ADVICE case).
            (11, "low\u00a0zz high\u2009low \x85end"),
        ],
        "doc_id long, text string",
    )
    vocab = wordpiece_vocab(docs.filter("text IS NOT NULL"), wordpiece_train(docs, 8))
    want = sorted(
        (r["doc_id"], tuple(r["pieces"]), r["n_pieces"], r["n_unk"])
        for r in wordpiece_encode(docs, vocab).collect()
    )

    d = str(tmp_path / "docs")
    docs.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = sorted(
        (r["doc_id"], tuple(r["pieces"]), r["n_pieces"], r["n_unk"])
        for r in streaming_wordpiece_encode(stream, vocab).collect()
    )
    assert got == want


def test_wordpiece_and_promotion_plans_obey_invariants(spark):
    """The registry-wide plan rules (no row-wise Python, no
    CartesianProduct) applied to the round-9 suite-only operators —
    test_plan_invariants.py covers registered names only.  The
    Python crossings here must surface as ArrowEvalPython (batched),
    never BatchEvalPython."""
    import contextlib
    import io

    from kafka_avro_order_processing_spark.operators.lm import ccnet_buckets
    from kafka_avro_order_processing_spark.plans.promotions_r10 import (
        R10_PROMOTIONS,
    )

    def plan_of(df):
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        return buf.getvalue()

    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(TEXTS)], "doc_id long, text string"
    )
    merges = wordpiece_train(docs, 4)
    vocab = wordpiece_vocab(docs, merges)
    plans = {
        "wordpiece_encode": plan_of(wordpiece_encode(docs, vocab)),
        "ccnet_buckets": plan_of(
            ccnet_buckets(
                docs.withColumn("s", F.length("text").cast("double")),
                "s",
            )
        ),
    }
    for name, q in R10_PROMOTIONS.items():
        plans[f"promo_{name}"] = plan_of(q.fn(spark, SF))
    for name, plan in plans.items():
        assert "BatchEvalPython" not in plan, f"{name}: row-wise Python UDF"
        assert "CartesianProduct" not in plan, f"{name}: cartesian join"
