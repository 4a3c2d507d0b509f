"""DSIR importance resampling (operators/dsir.py, Xie et al. NeurIPS
2023): DuckDB oracles for the hashed-feature count tables (the salted-
md5 bucket idiom is exact cross-engine), Python-replica parity for the
smoothed log ratios (ln is not IEEE-portable — the lm.py/nb.py
convention), EXACT integer parity for the per-doc weight sums,
repartition bit-identity, Gumbel-top-k determinism + enrichment e2e,
the streaming ingest twin's bit-match (incl. non-ASCII whitespace),
and plan rules.
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.dsir import (
    dsir_features,
    dsir_fit,
    dsir_log_weights,
    dsir_resample,
    dsir_select,
)
from kafka_avro_order_processing_spark.operators.similarity import MEAN_SCALE
from kafka_avro_order_processing_spark.sources.tables import load_table

B = 64  # small bucket count -> forced collisions

TARGET = [
    (1, "spark shuffles data across the cluster"),
    (2, "the spark optimizer prunes columns and partitions"),
    (3, "broadcast joins avoid the shuffle in spark"),
]

RAW = [
    (11, "spark shuffles and the optimizer prunes partitions"),
    (12, "broadcast the small side and spark avoids the shuffle"),
    (13, "my cat sat on the warm mat all afternoon"),
    (14, "the dog chased a ball across the muddy yard"),
    (15, "rain fell on the quiet village all night long"),
    (16, "spark partitions data and prunes columns"),
    (17, ""),
    (18, None),
]


def _py_bucket(gram: str) -> int:
    h = hashlib.md5(("dsir:" + gram).encode()).hexdigest()
    return int(h[:4], 16) % B


def _py_feats(text):
    if not text:
        return {}
    ws = text.split()  # ASCII corpora in these fixtures
    grams = list(ws) + [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    out = {}
    for g in grams:
        k = _py_bucket(g)
        out[k] = out.get(k, 0) + 1
    return out


def _frames(spark):
    t = spark.createDataFrame(TARGET, "doc_id long, text string")
    r = spark.createDataFrame(RAW, "doc_id long, text string")
    return t, r


def test_features_match_replica(spark):
    _t, r = _frames(spark)
    got = {
        (x["doc_id"], x["bucket"]): x["cnt"]
        for x in dsir_features(r, B).collect()
    }
    want = {}
    for i, t in RAW:
        for b, c in _py_feats(t).items():
            want[(i, b)] = c
    assert got == want


def _hex4_bucket_sql(gram: str) -> str:
    digits = " + ".join(
        f"(strpos('0123456789abcdef', substr(md5('dsir:' || {gram}), {p}, 1)) - 1) * {16 ** (4 - p)}"
        for p in range(1, 5)
    )
    return f"(({digits}) % {B})"


def test_features_duckdb_oracle(spark):
    """The hashed-feature count table through the driver's
    canonicalization on the documents table — promotion-grade for the
    integer half of the pipeline."""
    from test_oracle_parity import SF_DIR
    from test_r10_promotion_parity import _assert_parity

    docs = load_table(spark, SF_DIR, "documents")
    sdf = dsir_features(docs, B)
    _assert_parity(
        sdf,
        f"""
        WITH toks AS (
          SELECT doc_id,
                 list_filter(regexp_split_to_array(text, '\\s+'),
                             w -> w <> '') AS ws
          FROM documents WHERE text IS NOT NULL
        ),
        grams AS (
          SELECT doc_id,
                 unnest(list_concat(ws,
                   CASE WHEN len(ws) >= 2
                     THEN list_transform(range(1, len(ws)),
                                         i -> ws[i] || ' ' || ws[i+1])
                     ELSE [] END)) AS gram
          FROM toks
        )
        SELECT doc_id,
               CAST({_hex4_bucket_sql('gram')} AS INTEGER) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS cnt
        FROM grams GROUP BY doc_id, bucket
        """,
    )


def test_fit_counts_oracle_and_ratio_replica(spark):
    t, r = _frames(spark)
    tf, rf = dsir_features(t, B), dsir_features(r, B)
    fitted = dsir_fit(tf, rf, B).collect()
    assert len(fitted) == B  # every bucket smooths to the alpha floor

    # integer halves vs the replica
    want_t, want_r = {}, {}
    for rows, acc in ((TARGET, want_t), (RAW, want_r)):
        for _i, txt in rows:
            for b, c in _py_feats(txt).items():
                acc[b] = acc.get(b, 0) + c
    T, R = sum(want_t.values()), sum(want_r.values())
    for row in fitted:
        assert row["t"] == want_t.get(row["bucket"], 0)
        assert row["r"] == want_r.get(row["bucket"], 0)
        # ratio replica at 1e-9 of the unscaled value (ln not portable)
        p = (row["t"] + 1.0) / (T + 1.0 * B)
        q = (row["r"] + 1.0) / (R + 1.0 * B)
        want = math.log(p) - math.log(q)
        assert abs(int(row["ratio_int"]) / MEAN_SCALE - want) < 1e-9, row

    with pytest.raises(ValueError, match="alpha"):
        dsir_fit(tf, rf, B, alpha=0.0)


def test_log_weights_exact_integer_parity(spark):
    """The per-doc sum is EXACTLY sum(cnt * ratio_int) / 2^52 — the
    integer discipline makes the replica exact, not approximate."""
    t, r = _frames(spark)
    tf, rf = dsir_features(t, B), dsir_features(r, B)
    ratios = dsir_fit(tf, rf, B)
    table = {
        row["bucket"]: int(row["ratio_int"]) for row in ratios.collect()
    }
    got = {
        row["doc_id"]: row["log_weight"]
        for row in dsir_log_weights(r, rf, ratios).collect()
    }
    assert set(got) == {i for i, _ in RAW}
    for i, txt in RAW:
        acc = sum(c * table[b] for b, c in _py_feats(txt).items())
        want = float(acc) / float(MEAN_SCALE) if acc else 0.0
        assert got[i] == want, i  # exact float equality
    # featureless docs weigh exactly 0.0
    assert got[17] == 0.0 and got[18] == 0.0
    # target-like raw docs outweigh off-target ones
    assert min(got[11], got[12], got[16]) > max(got[13], got[14], got[15])


def test_weights_bit_identical_under_repartitioning(spark):
    t, r = _frames(spark)
    tf, rf = dsir_features(t, B), dsir_features(r, B)
    ratios = dsir_fit(tf, rf, B)
    a = sorted(tuple(x) for x in dsir_log_weights(r, rf, ratios).collect())
    b = sorted(
        tuple(x)
        for x in dsir_log_weights(
            r.repartition(5),
            rf.repartition(7, F.col("bucket")),
            ratios.repartition(3),
        ).collect()
    )
    assert a == b


def test_resample_determinism_and_enrichment(spark):
    t, _ = _frames(spark)
    # amplify texts 6x so the weight separation (scales with counts)
    # dominates the O(1) Gumbel noise -- the test asserts ENRICHMENT,
    # not a noise-free argmax (that is test_log_weights' job)
    # featureless docs weigh exactly 0.0, which outranks every real
    # document (content weights are negative in expectation:
    # E_q[log p/q] = -KL(q||p)) -- exclude them here, they are
    # asserted in test_log_weights_exact_integer_parity
    r = spark.createDataFrame(
        [(i, ((txt + " ") * 6).strip()) for i, txt in RAW if txt],
        "doc_id long, text string",
    )
    sel1 = [row["doc_id"] for row in dsir_select(t, r, k=3, n_buckets=B).collect()]
    sel2 = [row["doc_id"] for row in dsir_select(t, r, k=3, n_buckets=B).collect()]
    assert sel1 == sel2  # hash-derived Gumbel: stable across runs
    # the seed re-rolls the Gumbel draw: with these fixtures the
    # weight gaps dominate (selection is stable) but every key must
    # move -- noise is really (seed, id)-derived, not constant
    k0 = {
        row["doc_id"]: row["key"]
        for row in dsir_select(t, r, k=3, n_buckets=B).collect()
    }
    k7 = {
        row["doc_id"]: row["key"]
        for row in dsir_select(t, r, k=3, n_buckets=B, seed=7).collect()
    }
    common = set(k0) & set(k7)
    assert common and all(k0[d] != k7[d] for d in common)
    # enrichment: the spark-flavoured raw docs dominate the selection
    assert len(set(sel1) & {11, 12, 16}) >= 2
    # k >= n keeps everything
    everything = dsir_select(t, r, k=100, n_buckets=B).collect()
    assert len(everything) == sum(1 for _i, txt in RAW if txt)
    with pytest.raises(ValueError, match="k"):
        dsir_resample(dsir_log_weights(r, dsir_features(r, B),
                                       dsir_fit(dsir_features(t, B),
                                                dsir_features(r, B), B)), 0)


def test_streaming_twin_bit_matches_batch(spark, tmp_path):
    """The ingest twin: frozen ratio table broadcast, each landing doc
    weighs in its own row — drained weights BIT-match batch on the
    same rows across 3 micro-batches, incl. degenerate docs and a
    non-ASCII-whitespace doc (the Java \\s split contract)."""
    from kafka_avro_order_processing_spark.streaming.dsir import (
        streaming_dsir_log_weights,
    )

    t, _r = _frames(spark)
    # doc 20 carries a NBSP: Spark's Java \s split keeps
    # "spark<NBSP>data" ONE word -- the twin must too (a Python
    # str.split() would break the bit-match)
    raw_rows = RAW + [
        (19, "spark shuffles the data spark"),
        (20, "spark\u00a0data across the cluster"),
    ]
    r = spark.createDataFrame(raw_rows, "doc_id long, text string")
    tf, rf = dsir_features(t, B), dsir_features(r, B)
    ratios = dsir_fit(tf, rf, B)
    want = sorted(
        tuple(x) for x in dsir_log_weights(r, rf, ratios).collect()
    )

    d = str(tmp_path / "docs")
    r.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = sorted(
        tuple(x)
        for x in streaming_dsir_log_weights(stream, ratios, B).collect()
    )
    assert got == want  # exact equality, floats included


def test_plan_rules(spark):
    import contextlib
    import io

    t, r = _frames(spark)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        dsir_select(t, r, k=3, n_buckets=B).explain("formatted")
    plan = buf.getvalue()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # pure JVM expressions
    assert "CartesianProduct" not in plan  # totals join is broadcast
    assert "TakeOrderedAndProject" in plan  # top-k, not a full sort


# ---------------------------------------------------------------------------
# Property tests (hypothesis): featurization replica equality and the
# conservation law sum(cnt) == n_words + n_bigrams on randomized text,
# including whitespace-only, repeated-word, and punctuation shapes.
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402

_WORDS = ["spark", "data", "the", "a", "x", "shuffle", "q1", "-", "a.b"]
_text_strategy = st.lists(
    st.sampled_from(_WORDS), min_size=0, max_size=12
).map(" ".join)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(texts=st.lists(_text_strategy, min_size=1, max_size=8))
@_SETTINGS
def test_featurization_matches_replica_and_conserves(spark, texts):
    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {}
    for x in dsir_features(df, B).collect():
        got[(x["doc_id"], x["bucket"])] = x["cnt"]
    want = {}
    for i, t in rows:
        for b, c in _py_feats(t).items():
            want[(i, b)] = c
    assert got == want
    # conservation: total count == words + adjacent bigrams per doc
    for i, t in rows:
        ws = t.split()
        total = sum(c for (d, _b), c in got.items() if d == i)
        assert total == len(ws) + max(0, len(ws) - 1), (i, t)
