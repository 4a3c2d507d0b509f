"""Trainable char-n-gram Naive Bayes (operators/nb.py): exact
Python-replica parity for scores/predictions (the lm.py ln()
convention — 1e-9, ln is not IEEE-portable), exact integer parity +
a DuckDB oracle for the training tables, the fixed-vocabulary
skip-unseen-grams pin, degenerate docs, repartition bit-identity of
the decimal-scaled sums, and an end-to-end language-ID journey on a
crafted trilingual corpus.
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.nb import (
    nb_predict,
    nb_score,
    nb_train,
)

TRAIN = [
    (1, "en", "the cat sat on the mat with the hat"),
    (2, "en", "the dog ran to the man with the can"),
    (3, "en", "this is the thing that the other thing was"),
    (4, "de", "das ist das ding das der hund sah"),
    (5, "de", "der hund lief zu dem mann mit der kanne"),
    (6, "de", "die katze sass auf der matte mit dem hut"),
    (7, "zh", "zhang wang zhao qian sun zhou wu zheng"),
    (8, "zh", "zhong guo ren min xie hui zhang cheng"),
    (9, "zh", "sheng zhang zhi shi zhong xin cheng shi"),
]

TEST = [
    (101, "en", "the cat and the hat sat"),
    (102, "de", "der mann und der hund"),
    (103, "zh", "zhang zhou zheng zhong"),
    (104, "en", "that thing is the other"),
    (105, "de", "die katze und das ding"),
    (106, "zh", "cheng shi ren min"),
]


def _py_grams(t, n=3):
    if t is None or len(t) < n:
        return []
    return [t[i : i + n] for i in range(len(t) - n + 1)]


def _py_train(rows, n=3):
    feats = defaultdict(Counter)
    priors = Counter()
    for _i, lab, t in rows:
        priors[lab] += 1
        feats[lab].update(_py_grams(t, n))
    vocab = set(g for c in feats.values() for g in c)
    return priors, feats, vocab


def _py_score(text, priors, feats, vocab, alpha=1.0, n=3):
    n_docs = sum(priors.values())
    grams = Counter(g for g in _py_grams(text, n) if g in vocab)
    nv = sum(grams.values())
    out = {}
    for lab, p in priors.items():
        tc = sum(feats[lab].values())
        miss = math.log(alpha / (tc + alpha * len(vocab)))
        s = math.log(p / n_docs) + nv * miss
        # same split as the Spark plan: baseline + cancelled-denominator
        # correction for grams the class actually saw
        for g, cd in grams.items():
            cc = feats[lab].get(g, 0)
            if cc > 0:
                s += cd * math.log((cc + alpha) / alpha)
        out[lab] = s
    return out


def _model(spark, rows=TRAIN, n=3):
    df = spark.createDataFrame(rows, "doc_id long, label string, text string")
    return df, nb_train(df, n=n)


def test_train_tables_match_replica(spark):
    df, (priors, features, V) = _model(spark)
    py_pri, py_feats, py_vocab = _py_train(TRAIN)
    assert V == len(py_vocab)
    got_pri = {r["label"]: (r["n_docs"], r["n_grams"]) for r in priors.collect()}
    assert got_pri == {
        lab: (c, sum(py_feats[lab].values())) for lab, c in py_pri.items()
    }
    got_feats = {
        (r["label"], r["gram"]): r["count"] for r in features.collect()
    }
    want = {
        (lab, g): c for lab, cnt in py_feats.items() for g, c in cnt.items()
    }
    assert got_feats == want


def test_train_rejects_null_labels(spark):
    df = spark.createDataFrame(
        [(1, None, "some text")], "doc_id long, label string, text string"
    )
    with pytest.raises(ValueError, match="NULL"):
        nb_train(df)


def test_scores_match_python_replica(spark):
    df, (priors, features, V) = _model(spark)
    py_pri, py_feats, py_vocab = _py_train(TRAIN)
    cand = spark.createDataFrame(
        [(i, t) for i, _lab, t in TEST] + [(900, ""), (901, None), (902, "ab")],
        "doc_id long, text string",
    )
    got = {
        (r["doc_id"], r["label"]): r["log_score"]
        for r in nb_score(cand, priors, features, V).collect()
    }
    for i, _lab, t in TEST:
        want = _py_score(t, py_pri, py_feats, py_vocab)
        for lab, s in want.items():
            assert abs(got[(i, lab)] - s) < 1e-9, (i, lab)
    # degenerate docs (empty / NULL / shorter than n): score = prior only
    for i in (900, 901, 902):
        for lab, p in py_pri.items():
            assert abs(
                got[(i, lab)] - math.log(p / sum(py_pri.values()))
            ) < 1e-12, (i, lab)


def test_predictions_and_margin(spark):
    df, (priors, features, V) = _model(spark)
    cand = spark.createDataFrame(
        [(i, t) for i, _lab, t in TEST], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["label"], r["margin"])
        for r in nb_predict(cand, priors, features, V).collect()
    }
    for i, lab, _t in TEST:
        assert got[i][0] == lab, (i, got[i])
        assert got[i][1] > 0.0


def test_unseen_grams_are_skipped(spark):
    """The fixed-vocabulary pin: a doc made ENTIRELY of grams the
    training corpus never saw scores exactly the log priors — an
    unknown gram says nothing about any class."""
    df, (priors, features, V) = _model(spark)
    cand = spark.createDataFrame(
        [(1, "QQQQQQQQ")], "doc_id long, text string"
    )
    got = {
        r["label"]: (r["log_score"], r["n_vocab_grams"])
        for r in nb_score(cand, priors, features, V).collect()
    }
    py_pri, *_ = _py_train(TRAIN)
    n_docs = sum(py_pri.values())
    for lab, p in py_pri.items():
        s, nv = got[lab]
        assert nv == 0
        assert abs(s - math.log(p / n_docs)) < 1e-12


def test_score_bit_identical_under_repartitioning(spark):
    df, (priors, features, V) = _model(spark)
    cand = spark.createDataFrame(
        [(i, t * 3) for i, _lab, t in TEST], "doc_id long, text string"
    )
    a = sorted(
        tuple(r) for r in nb_score(cand, priors, features, V).collect()
    )
    b = sorted(
        tuple(r)
        for r in nb_score(
            cand.repartition(7, F.col("doc_id")),
            priors.repartition(3),
            features.repartition(5, F.col("gram")),
            V,
        ).collect()
    )
    assert a == b  # exact float equality: the decimal-sum discipline


def test_train_tables_duckdb_oracle(spark):
    """Integer training counts over documents (label = lang) through
    the driver canonicalization — promotion-grade for the trainable
    half; scoring stays replica-pinned (ln() is not cross-engine)."""
    from test_oracle_parity import SF_DIR
    from test_r10_promotion_parity import _assert_parity

    from kafka_avro_order_processing_spark.sources.tables import load_table

    docs = load_table(spark, SF_DIR, "documents").select(
        "doc_id", F.col("lang").alias("label"), "text"
    )
    priors, features, V = nb_train(docs, n=3)
    _assert_parity(
        features,
        """
        WITH g AS (
          SELECT lang AS label,
                 unnest(list_transform(
                   generate_series(1, greatest(length(text) - 2, 0)),
                   i -> substr(text, CAST(i AS INTEGER), 3))) AS gram
          FROM documents WHERE length(text) >= 3
        )
        SELECT label, gram, CAST(COUNT(*) AS BIGINT) AS count
        FROM g GROUP BY label, gram
        """,
    )
    _assert_parity(
        priors,
        """
        WITH g AS (
          SELECT lang AS label,
                 unnest(list_transform(
                   generate_series(1, greatest(length(text) - 2, 0)),
                   i -> substr(text, CAST(i AS INTEGER), 3))) AS gram
          FROM documents WHERE length(text) >= 3
        ),
        m AS (SELECT label, COUNT(*) AS n_grams FROM g GROUP BY label)
        SELECT d.lang AS label,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COALESCE(ANY_VALUE(m.n_grams), 0) AS BIGINT) AS n_grams
        FROM documents d LEFT JOIN m ON m.label = d.lang
        GROUP BY d.lang
        """,
    )
    con_v = None  # V checked against the oracle's own distinct count
    import duckdb

    con_v = duckdb.connect()
    con_v.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    want_v = con_v.execute(
        """
        SELECT COUNT(DISTINCT gram) FROM (
          SELECT unnest(list_transform(
                   generate_series(1, greatest(length(text) - 2, 0)),
                   i -> substr(text, CAST(i AS INTEGER), 3))) AS gram
          FROM documents WHERE length(text) >= 3)
        """
    ).fetchone()[0]
    assert V == want_v


def test_plan_rules(spark):
    import contextlib
    import io

    df, (priors, features, V) = _model(spark)
    cand = spark.createDataFrame(
        [(i, t) for i, _lab, t in TEST], "doc_id long, text string"
    )
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        nb_score(cand, priors, features, V).explain("formatted")
    plan = buf.getvalue()
    assert "EvalPython" not in plan  # pure JVM expressions
    # the class-constant cross join must be broadcast, never a
    # shuffled cartesian
    assert "CartesianProduct" not in plan


@pytest.mark.slow
def test_streaming_nb_predict_bit_matches_batch(spark, tmp_path):
    """The ingest twin: the model ships as a broadcast artifact with
    the batch plan's own JVM-quantized term integers, each landing doc
    classifies in its own row — predictions BIT-match batch nb_predict
    (exact float equality: shared JVM logs + integer-exact correction
    sums), across 3 micro-batches, incl. degenerate docs,
    all-unseen-gram docs (prior-only argmax), and a LONG document
    whose cnt*term*2^52 magnitudes exceed 2^63 — the range where
    Java's pre-Ryu Double.toString makes a per-row double->decimal
    cast irreproducible from Python (the r9 ADVICE case)."""
    from kafka_avro_order_processing_spark.streaming.nb import (
        streaming_nb_predict,
    )

    df, (priors, features, V) = _model(spark)
    long_doc = " ".join(t for _i, _lab, t in TEST) * 400  # ~50k chars
    cand = spark.createDataFrame(
        [(i, t) for i, _lab, t in TEST]
        + [(900, ""), (901, None), (902, "ab"), (903, "QQQQQQQQ")]
        + [(904, long_doc)],
        "doc_id long, text string",
    )
    want = sorted(
        tuple(r) for r in nb_predict(cand, priors, features, V).collect()
    )

    d = str(tmp_path / "docs")
    cand.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = sorted(
        tuple(r)
        for r in streaming_nb_predict(stream, priors, features, V).collect()
    )
    assert got == want  # exact equality, floats included


def test_streaming_nb_single_class_margin_is_null(spark, tmp_path):
    """A single-class model's margin is a true SQL NULL in BOTH paths:
    batch (lead() over one row) and streaming (object-dtype margin
    column -> Arrow null, never float64 NaN) — the r9 ADVICE edge."""
    from kafka_avro_order_processing_spark.streaming.nb import (
        streaming_nb_predict,
    )

    one_class = [(i, lab, t) for i, lab, t in TRAIN if lab == "en"]
    df, (priors, features, V) = _model(spark, rows=one_class)
    cand = spark.createDataFrame(
        [(i, t) for i, _lab, t in TEST[:3]] + [(901, None)],
        "doc_id long, text string",
    )
    want = sorted(
        tuple(r) for r in nb_predict(cand, priors, features, V).collect()
    )
    assert all(r[1] == "en" and r[3] is None for r in want)

    d = str(tmp_path / "docs")
    cand.repartition(2).write.parquet(d)
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    drained = streaming_nb_predict(stream, priors, features, V)
    assert drained.schema["margin"].dataType.typeName() == "double"
    got = sorted(tuple(r) for r in drained.collect())
    assert got == want
    assert all(r[3] is None for r in got)  # NULL, not NaN


def test_collect_nb_model_shape_and_validation(spark):
    import pytest as _pytest

    from kafka_avro_order_processing_spark.streaming.nb import collect_nb_model

    df, (priors, features, V) = _model(spark)
    m = collect_nb_model(priors, features, V)
    assert set(m["consts"]) == {"en", "de", "zh"}
    # sparse: only (gram, label) pairs the class saw carry a term
    n_terms = sum(len(v) for v in m["terms"].values())
    assert n_terms == features.count()
    assert all(t > 0 for v in m["terms"].values() for t in v.values())
    with _pytest.raises(ValueError, match="alpha"):
        collect_nb_model(priors, features, V, alpha=0.0)
