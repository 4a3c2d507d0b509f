"""Distributed logistic regression (operators/classifier.py): exact
agreement with a pure-Python full-batch GD reference (the decimal
gradient sums make this checkable to float noise), separability,
partitioning-determinism of the learned weights, and the end-to-end
quality-filter journey on real documents.
"""

from __future__ import annotations

import pytest

import math

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.classifier import (
    fit_logistic,
    score_logistic,
)


def _py_fit(rows, k, n_rounds=50, lr=0.5):
    n = len(rows)
    means = [sum(r[i] for r, _ in rows) / n for i in range(k)]
    stds = []
    for i in range(k):
        v = sum((r[i] - means[i]) ** 2 for r, _ in rows) / n
        stds.append(math.sqrt(v) if v > 0 else 1.0)
    z = [
        ([(r[i] - means[i]) / stds[i] for i in range(k)], y) for r, y in rows
    ]
    w, b = [0.0] * k, 0.0
    for _ in range(n_rounds):
        gb = 0.0
        gw = [0.0] * k
        for x, y in z:
            p = 1.0 / (1.0 + math.exp(-(sum(w[i] * x[i] for i in range(k)) + b)))
            e = p - y
            gb += e
            for i in range(k):
                gw[i] += e * x[i]
        b -= lr * gb / n
        for i in range(k):
            w[i] -= lr * gw[i] / n
    return w, b, means, stds


def _toy(seed=5, n=200):
    import random

    rnd = random.Random(seed)
    rows = []
    for _ in range(n):
        y = rnd.random() < 0.5
        x0 = rnd.gauss(2.0 if y else -1.0, 1.0)
        x1 = rnd.gauss(-1.0 if y else 1.5, 1.5)
        rows.append(([x0, x1], 1 if y else 0))
    return rows


def test_fit_matches_python_reference(spark):
    rows = _toy()
    df = spark.createDataFrame(
        [(r[0], r[1], y) for r, y in rows], "f0 double, f1 double, label int"
    )
    m = fit_logistic(df, ["f0", "f1"], n_rounds=30)
    w, b, means, stds = _py_fit(rows, 2, n_rounds=30)
    for i in range(2):
        assert abs(m["means"][i] - means[i]) < 1e-9
        assert abs(m["stds"][i] - stds[i]) < 1e-9
        # decimal sums vs python float sums: tiny per-round drift only
        assert abs(m["weights"][i] - w[i]) < 1e-6
    assert abs(m["bias"] - b) < 1e-6


def test_learned_model_separates(spark):
    rows = _toy()
    df = spark.createDataFrame(
        [(r[0], r[1], y) for r, y in rows], "f0 double, f1 double, label int"
    )
    m = fit_logistic(df, ["f0", "f1"])
    scored = score_logistic(df, m)
    acc = scored.filter(
        ((F.col("quality_prob") >= 0.5) & (F.col("label") == 1))
        | ((F.col("quality_prob") < 0.5) & (F.col("label") == 0))
    ).count() / len(rows)
    assert acc >= 0.9


def test_weights_partitioning_independent(spark):
    rows = _toy(seed=9)
    df = spark.createDataFrame(
        [(r[0], r[1], y) for r, y in rows], "f0 double, f1 double, label int"
    )
    a = fit_logistic(df, ["f0", "f1"], n_rounds=20)
    b = fit_logistic(df.repartition(7), ["f0", "f1"], n_rounds=20)
    assert a["weights"] == b["weights"] and a["bias"] == b["bias"]


def test_constant_feature_does_not_crash(spark):
    df = spark.createDataFrame(
        [(1.0, float(i % 2), i % 2) for i in range(50)],
        "f0 double, f1 double, label int",
    )
    m = fit_logistic(df, ["f0", "f1"], n_rounds=10)
    assert m["stds"][0] == 1.0  # degenerate std fallback
    assert all(math.isfinite(x) for x in m["weights"] + [m["bias"]])


def test_pos_weight_matches_python_reference(spark):
    rows = _toy(seed=57, n=150)
    df = spark.createDataFrame(
        [(r[0], r[1], y) for r, y in rows], "f0 double, f1 double, label int"
    )
    pw = 3.0
    m = fit_logistic(df, ["f0", "f1"], n_rounds=20, pos_weight=pw)

    # weighted python reference
    k, n = 2, len(rows)
    means = [sum(r[i] for r, _ in rows) / n for i in range(k)]
    stds = []
    for i in range(k):
        v = sum((r[i] - means[i]) ** 2 for r, _ in rows) / n
        stds.append(math.sqrt(v) if v > 0 else 1.0)
    z = [([(r[i] - means[i]) / stds[i] for i in range(k)], y) for r, y in rows]
    w, b = [0.0] * k, 0.0
    for _ in range(20):
        gb, gw = 0.0, [0.0] * k
        for x, y in z:
            p = 1.0 / (1.0 + math.exp(-(sum(w[i] * x[i] for i in range(k)) + b)))
            e = (pw if y == 1 else 1.0) * (p - y)
            gb += e
            for i in range(k):
                gw[i] += e * x[i]
        b -= 0.5 * gb / n
        for i in range(k):
            w[i] -= 0.5 * gw[i] / n
    for i in range(k):
        assert abs(m["weights"][i] - w[i]) < 1e-6
    assert abs(m["bias"] - b) < 1e-6
    # upweighting positives raises predicted positive rates
    m0 = fit_logistic(df, ["f0", "f1"], n_rounds=20)
    s_pw = score_logistic(df, m).agg(F.avg("quality_prob")).collect()[0][0]
    s_0 = score_logistic(df, m0).agg(F.avg("quality_prob")).collect()[0][0]
    assert s_pw > s_0


@pytest.mark.slow
def test_early_stopping_is_deterministic(spark):
    rows = _toy(seed=63, n=200)
    df = spark.createDataFrame(
        [(r[0], r[1], y) for r, y in rows], "f0 double, f1 double, label int"
    )
    m = fit_logistic(df, ["f0", "f1"], n_rounds=200, tol=1e-4)
    assert m["rounds_run"] < 200  # converged early
    # the stopping round and weights are partitioning-independent
    m2 = fit_logistic(
        df.repartition(9), ["f0", "f1"], n_rounds=200, tol=1e-4
    )
    assert m["rounds_run"] == m2["rounds_run"]
    assert m["weights"] == m2["weights"] and m["bias"] == m2["bias"]
    # the early-stopped model still separates
    scored = score_logistic(df, m)
    acc = scored.filter(
        ((F.col("quality_prob") >= 0.5) & (F.col("label") == 1))
        | ((F.col("quality_prob") < 0.5) & (F.col("label") == 0))
    ).count() / len(rows)
    assert acc >= 0.9


def test_streaming_scoring_bit_matches_batch(spark, tmp_path):
    # scoring is a stateless literal expression, so the drained stream
    # must BIT-match batch on the same rows — across micro-batches too.
    from kafka_avro_order_processing_spark.streaming.classifier import (
        streaming_score_logistic,
    )

    rows = _toy(seed=21, n=150)
    df = spark.createDataFrame(
        [(i, r[0], r[1], y) for i, (r, y) in enumerate(rows)],
        "i int, f0 double, f1 double, label int",
    )
    model = fit_logistic(df, ["f0", "f1"], n_rounds=15)
    want = sorted(tuple(r) for r in score_logistic(df, model).collect())
    d = str(tmp_path / "feats")
    df.repartition(4).write.parquet(d)  # several files -> several epochs
    stream = (
        spark.readStream.schema("i int, f0 double, f1 double, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = sorted(
        tuple(r) for r in streaming_score_logistic(stream, model).collect()
    )
    assert got == want


def test_quality_filter_journey_on_documents(spark):
    # the fastText-filter shape end-to-end: "good" = real documents,
    # "bad" = the same docs with shuffled words; features are the
    # engine's own quality stats + LM score.  The classifier must rank
    # held-out real docs above their shuffled twins.
    from kafka_avro_order_processing_spark.operators.lm import (
        lm_score,
        train_bigram_lm,
    )
    from kafka_avro_order_processing_spark.operators.text import quality_score
    from kafka_avro_order_processing_spark.sources.tables import load_table

    docs = (
        load_table(spark, "/root/testdata/sf0.001", "documents")
        .filter(F.col("doc_id") < 120)
        .select("doc_id", "text")
    )
    shuffled = docs.select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.array_join(
            F.shuffle(F.split("text", " ")), " "
        ).alias("text"),
    )
    labeled = docs.withColumn("label", F.lit(1)).unionByName(
        shuffled.withColumn("label", F.lit(0))
    )
    ref = docs.filter(F.col("doc_id") % 2 == 0)
    bigrams, contexts, V = train_bigram_lm(ref)
    bigrams = bigrams.localCheckpoint(eager=True)
    contexts = contexts.localCheckpoint(eager=True)
    feats = (
        quality_score(labeled)
        .join(
            lm_score(labeled, bigrams, contexts, V).select(
                "doc_id", "avg_logprob"
            ),
            "doc_id",
        )
        .join(labeled.select("doc_id", "label"), "doc_id")
        .localCheckpoint(eager=True)
    )
    train = feats.filter(F.col("doc_id") % 3 != 0)
    test = feats.filter(F.col("doc_id") % 3 == 0)
    model = fit_logistic(train, ["quality", "avg_logprob"], n_rounds=40)
    scored = score_logistic(test, model)
    mean_by_label = {
        r["label"]: r["m"]
        for r in scored.groupBy("label")
        .agg(F.avg("quality_prob").alias("m"))
        .collect()
    }
    assert mean_by_label[1] > mean_by_label[0] + 0.1
