"""Exact binary-classifier evaluation (operators/eval.py): AUC against
a brute-force pair-count reference (the O(n²) definition the operator
must never compute but must always equal), tie correction, ROC-point
parity with a Python sweep, partitioning/bucketing invariance (the
determinism contract), degenerate inputs, and the end-to-end journey
with the trained classifier.
"""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.eval import (
    confusion_at_threshold,
    ks_statistic,
    roc_auc,
    roc_points,
)


def _pairs_auc(rows):
    """The definition: P(s_pos > s_neg) + 0.5 P(s_pos = s_neg)."""
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    num = 0.0
    for p in pos:
        for q in neg:
            if p > q:
                num += 1.0
            elif p == q:
                num += 0.5
    return num / (len(pos) * len(neg))


def _toy(seed=3, n=400, quant=None):
    rnd = random.Random(seed)
    rows = []
    for _ in range(n):
        y = 1 if rnd.random() < 0.4 else 0
        s = rnd.gauss(1.0 if y else 0.0, 1.0)
        if quant:
            s = round(s * quant) / quant  # force heavy ties
        rows.append((s, y))
    return rows


@pytest.mark.parametrize("quant", [None, 4])
def test_auc_matches_brute_force(spark, quant):
    rows = _toy(quant=quant)
    df = spark.createDataFrame(rows, "score double, label int")
    got = roc_auc(df, "score", "label")
    want = _pairs_auc(rows)
    assert abs(got - want) < 1e-12


def test_auc_partitioning_and_bucketing_invariant(spark):
    rows = _toy(seed=11, quant=8)
    df = spark.createDataFrame(rows, "score double, label int")
    a = roc_auc(df, "score", "label", n_buckets=64)
    b = roc_auc(df.repartition(13), "score", "label", n_buckets=64)
    c = roc_auc(df, "score", "label", n_buckets=1)
    d = roc_auc(df, "score", "label", n_buckets=7)
    assert a == b == c == d  # bit-exact, not approx


def test_roc_points_match_python_sweep(spark):
    rows = _toy(seed=7, n=150, quant=3)
    df = spark.createDataFrame(rows, "score double, label int")
    pts = {
        r["threshold"]: r
        for r in roc_points(df, "score", "label").collect()
    }
    n1 = sum(y for _, y in rows)
    n0 = len(rows) - n1
    for t in sorted({s for s, _ in rows}):
        tp = sum(1 for s, y in rows if y == 1 and s >= t)
        fp = sum(1 for s, y in rows if y == 0 and s >= t)
        r = pts[t]
        assert (r["tp"], r["fp"]) == (tp, fp)
        assert (r["fn"], r["tn"]) == (n1 - tp, n0 - fp)
        assert abs(r["tpr"] - tp / n1) < 1e-15
        assert abs(r["fpr"] - fp / n0) < 1e-15
        want_prec = tp / (tp + fp) if tp + fp else None
        if want_prec is None:
            assert r["precision"] is None
        else:
            assert abs(r["precision"] - want_prec) < 1e-15
    assert len(pts) == len({s for s, _ in rows})


def test_ks_matches_python(spark):
    rows = _toy(seed=19, n=200, quant=2)
    df = spark.createDataFrame(rows, "score double, label int")
    n1 = sum(y for _, y in rows)
    n0 = len(rows) - n1
    want = max(
        abs(
            sum(1 for s, y in rows if y == 1 and s >= t) / n1
            - sum(1 for s, y in rows if y == 0 and s >= t) / n0
        )
        for t in {s for s, _ in rows}
    )
    assert abs(ks_statistic(df, "score", "label") - want) < 1e-12


def test_confusion_at_threshold(spark):
    rows = _toy(seed=23, n=120)
    df = spark.createDataFrame(rows, "score double, label int")
    m = confusion_at_threshold(df, 0.5, "score", "label")
    tp = sum(1 for s, y in rows if y == 1 and s >= 0.5)
    fp = sum(1 for s, y in rows if y == 0 and s >= 0.5)
    fn = sum(1 for s, y in rows if y == 1 and s < 0.5)
    tn = sum(1 for s, y in rows if y == 0 and s < 0.5)
    assert (m["tp"], m["fp"], m["fn"], m["tn"]) == (tp, fp, fn, tn)
    assert abs(m["precision"] - tp / (tp + fp)) < 1e-15
    assert abs(m["recall"] - tp / (tp + fn)) < 1e-15
    prec, rec = tp / (tp + fp), tp / (tp + fn)
    assert abs(m["f1"] - 2 * prec * rec / (prec + rec)) < 1e-15
    assert abs(m["accuracy"] - (tp + tn) / len(rows)) < 1e-15


def test_single_class_raises(spark):
    df = spark.createDataFrame(
        [(0.3, 1), (0.7, 1)], "score double, label int"
    )
    with pytest.raises(ValueError):
        roc_auc(df, "score", "label")


def test_null_rows_excluded(spark):
    rows = _toy(seed=31, n=80)
    df = spark.createDataFrame(rows, "score double, label int")
    noisy = df.unionByName(
        spark.createDataFrame(
            [(None, 1), (0.4, None), (None, None)],
            "score double, label int",
        )
    )
    assert roc_auc(noisy, "score", "label") == roc_auc(
        df, "score", "label"
    )
    m_a = confusion_at_threshold(noisy, 0.2, "score", "label")
    m_b = confusion_at_threshold(df, 0.2, "score", "label")
    assert m_a == m_b


def test_perfect_and_random_separation(spark):
    perfect = spark.createDataFrame(
        [(float(i), 1 if i >= 50 else 0) for i in range(100)],
        "score double, label int",
    )
    assert roc_auc(perfect, "score", "label") == 1.0
    constant = spark.createDataFrame(
        [(0.5, i % 2) for i in range(100)], "score double, label int"
    )
    assert roc_auc(constant, "score", "label") == 0.5  # all ties -> 0.5
    assert ks_statistic(constant, "score", "label") == 0.0


def test_roc_plan_has_no_single_partition_stage(spark):
    # the whole point of the two-level prefix sum: the exact global
    # ranks must never plan a single-partition ORDER BY window or any
    # Python. (The scalar .agg() in roc_auc is partial+final — this
    # pins the row-producing roc_points plan.)
    import contextlib
    import io

    df = spark.range(10000).select(
        (F.col("id") % 97 / 97.0).alias("score"),
        (F.col("id") % 2).alias("label"),
    )
    pts = roc_points(df, "score", "label")
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pts.explain("formatted")
    plan = buf.getvalue()
    assert "SinglePartition" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Window" in plan  # the within-bucket prefix window is there


def _py_spearman(pairs):
    """Tie-corrected Spearman: Pearson on average ranks."""

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    ra = avg_ranks([a for a, _ in pairs])
    rb = avg_ranks([b for _, b in pairs])
    n = len(pairs)
    ma, mb = sum(ra) / n, sum(rb) / n
    num = sum((x - ma) * (y - mb) for x, y in zip(ra, rb))
    va = sum((x - ma) ** 2 for x in ra)
    vb = sum((y - mb) ** 2 for y in rb)
    return num / math.sqrt(va * vb)


def test_rank_correlation_matches_python(spark):
    from kafka_avro_order_processing_spark.operators.eval import (
        rank_correlation,
    )

    rnd = random.Random(53)
    pairs = []
    for _ in range(250):
        a = round(rnd.gauss(0, 1) * 3) / 3  # ties in both columns
        b = round((a + rnd.gauss(0, 0.8)) * 3) / 3
        pairs.append((a, b))
    df = spark.createDataFrame(pairs, "a double, b double")
    got = rank_correlation(df, "a", "b")
    assert abs(got - _py_spearman(pairs)) < 1e-12
    assert 0.3 < got < 0.95  # correlated but noisy, by construction
    # bit-exact invariance
    assert got == rank_correlation(df.repartition(13), "a", "b")
    assert got == rank_correlation(df, "a", "b", n_buckets=3)
    # perfect monotone (nonlinear) relation -> exactly 1.0
    mono = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(50)], "a double, b double"
    )
    assert rank_correlation(mono, "a", "b") == 1.0
    # nulls excluded pairwise
    noisy = df.unionByName(
        spark.createDataFrame(
            [(None, 1.0), (1.0, None)], "a double, b double"
        )
    )
    assert rank_correlation(noisy, "a", "b") == got
    with pytest.raises(ValueError):
        rank_correlation(
            spark.createDataFrame([(1.0, 2.0)] * 5, "a double, b double"),
            "a",
            "b",
        )


def _py_ap(rows):
    """Step AP over distinct thresholds descending (ties grouped)."""
    n1 = sum(y for _, y in rows)
    ap = 0.0
    tp = fp = 0
    for t in sorted({s for s, _ in rows}, reverse=True):
        p_here = sum(1 for s, y in rows if s == t and y == 1)
        c_here = sum(1 for s, _ in rows if s == t)
        tp += p_here
        fp += c_here - p_here
        ap += (p_here / n1) * (tp / (tp + fp))
    return ap


@pytest.mark.parametrize("quant", [None, 4])
def test_pr_auc_matches_python_step_definition(spark, quant):
    from kafka_avro_order_processing_spark.operators.eval import pr_auc

    rows = _toy(seed=47, n=300, quant=quant)
    df = spark.createDataFrame(rows, "score double, label int")
    got = pr_auc(df, "score", "label")
    assert abs(got - _py_ap(rows)) < 1e-9  # 2^-52-scaled decimal sum
    # partitioning/bucketing invariance is BIT-exact
    assert got == pr_auc(df.repartition(11), "score", "label")
    assert got == pr_auc(df, "score", "label", n_buckets=3)
    # perfect ranking -> AP 1.0
    perfect = spark.createDataFrame(
        [(float(i), 1 if i >= 30 else 0) for i in range(60)],
        "score double, label int",
    )
    assert pr_auc(perfect, "score", "label") == 1.0
    with pytest.raises(ValueError):
        pr_auc(
            spark.createDataFrame([(0.1, 1)], "score double, label int"),
            "score",
            "label",
        )


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_score = st.one_of(
    st.sampled_from([0.0, -0.0, 1.0, -1.0, 1e300, -1e300, 1e-300, 0.5]),
    st.floats(
        min_value=-100, max_value=100, allow_nan=False, allow_infinity=False
    ),
)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    rows=st.lists(
        st.tuples(_score, st.integers(min_value=0, max_value=1)),
        min_size=2,
        max_size=40,
    ).filter(
        lambda rs: any(y for _, y in rs) and any(1 - y for _, y in rs)
    ),
    n_buckets=st.sampled_from([1, 3, 64]),
)
def test_auc_fuzz_vs_pair_definition(spark, rows, n_buckets):
    # arbitrary tie patterns, ±0.0, extreme magnitudes, any bucket
    # count: the rank machinery must equal the O(n²) definition.
    # (NaN scores are out of contract — exclude-like-NULL behavior is
    # not defined for them.)
    df = spark.createDataFrame(rows, "score double, label int")
    got = roc_auc(df, "score", "label", n_buckets=n_buckets)
    assert abs(got - _pairs_auc(rows)) < 1e-12


def test_grouped_auc_bit_matches_per_group_roc_auc(spark):
    from kafka_avro_order_processing_spark.operators.eval import (
        grouped_roc_auc,
    )

    rnd = random.Random(37)
    rows = []
    for g in ("en", "de", "fr"):
        sep = {"en": 1.2, "de": 0.4, "fr": 0.0}[g]
        for _ in range(120):
            y = rnd.randint(0, 1)
            s = round(rnd.gauss(sep if y else 0.0, 1.0) * 4) / 4  # ties
            rows.append((g, s, y))
    rows.append(("single", 0.7, 1))  # one-class group
    rows.append((None, 0.5, 1))      # NULL group: excluded
    df = spark.createDataFrame(rows, "lang string, score double, label int")
    got = {
        r["lang"]: r
        for r in grouped_roc_auc(df, "lang", "score", "label").collect()
    }
    assert set(got) == {"en", "de", "fr", "single"}
    for g in ("en", "de", "fr"):
        want = roc_auc(
            df.filter(F.col("lang") == g), "score", "label"
        )
        assert got[g]["auc"] == want  # bit-equal, not approx
        assert got[g]["n"] == 120
        assert got[g]["n_pos"] + got[g]["n_neg"] == 120
    assert got["single"]["auc"] is None
    assert got["en"]["auc"] > got["de"]["auc"] > 0.4
    # invariance under partitioning and bucket count, like roc_auc
    again = {
        r["lang"]: r["auc"]
        for r in grouped_roc_auc(
            df.repartition(9), "lang", "score", "label", n_buckets=5
        ).collect()
    }
    assert {k: v["auc"] for k, v in got.items()} == again


@pytest.mark.slow
def test_grouped_pr_auc_and_threshold_match_scalar_twins(spark):
    from kafka_avro_order_processing_spark.operators.eval import (
        grouped_pr_auc,
        grouped_threshold_for_keep_rate,
        pr_auc,
        threshold_for_keep_rate,
    )

    rnd = random.Random(71)
    rows = []
    for g in ("web", "code", "papers"):
        sep = {"web": 0.8, "code": 1.6, "papers": 0.2}[g]
        for _ in range(140):
            y = rnd.randint(0, 1)
            s = round(rnd.gauss(sep if y else 0.0, 1.0) * 4) / 4
            rows.append((g, s, y))
    rows.append(("onlypos", 0.9, 1))
    df = spark.createDataFrame(rows, "src string, score double, label int")

    ap = {r["src"]: r for r in grouped_pr_auc(df, "src", "score", "label").collect()}
    for g in ("web", "code", "papers"):
        want = pr_auc(df.filter(F.col("src") == g), "score", "label")
        assert ap[g]["ap"] == want  # bit-equal
        assert ap[g]["n"] == 140
    assert ap["onlypos"]["ap"] is None

    th = {
        r["src"]: r
        for r in grouped_threshold_for_keep_rate(
            df, "src", 0.3, "score"
        ).collect()
    }
    for g in ("web", "code", "papers"):
        t, kept = threshold_for_keep_rate(
            df.filter(F.col("src") == g), 0.3, "score"
        )
        assert th[g]["threshold"] == t and th[g]["kept"] == kept
    assert th["onlypos"]["kept"] == 1  # tiny group keeps its one row


def test_percentile_normalize_matches_python_midrank(spark):
    from kafka_avro_order_processing_spark.operators.eval import (
        percentile_normalize,
    )

    rnd = random.Random(73)
    rows = []
    for i, g in enumerate(["en"] * 90 + ["de"] * 60):
        rows.append((i, g, round(rnd.gauss(0, 1) * 3) / 3))  # ties
    rows.append((999, "en", None))  # NULL score keeps NULL pct
    df = spark.createDataFrame(rows, "id int, lang string, score double")
    out = {
        r["id"]: r["pct"]
        for r in percentile_normalize(df, "score", "lang").collect()
    }

    def midrank(vals, v):
        lt = sum(1 for x in vals if x < v)
        eq = sum(1 for x in vals if x == v)
        return (lt + (eq + 1) / 2) / len(vals)

    by_g = {}
    for _, g, s in rows:
        if s is not None:
            by_g.setdefault(g, []).append(s)
    for i, g, s in rows:
        if s is None:
            assert out[i] is None
        else:
            assert abs(out[i] - midrank(by_g[g], s)) < 1e-12
            assert 0.0 < out[i] <= 1.0  # (0, 1]: unique max hits 1.0
    # deterministic under partitioning
    again = {
        r["id"]: r["pct"]
        for r in percentile_normalize(
            df.repartition(7), "score", "lang", n_buckets=3
        ).collect()
    }
    assert out == again
    # ungrouped variant: global midranks
    glob = {
        r["id"]: r["pct"]
        for r in percentile_normalize(df, "score").collect()
    }
    all_vals = [s for _, _, s in rows if s is not None]
    for i, _, s in rows:
        if s is not None:
            assert abs(glob[i] - midrank(all_vals, s)) < 1e-12
    # the CCNet shape: per-group head/middle/tail buckets are exact
    # row partitions (no row lost, no row doubled)
    bucketed = percentile_normalize(df, "score", "lang").withColumn(
        "tier",
        F.when(F.col("pct") >= 2 / 3, "head")
        .when(F.col("pct") >= 1 / 3, "middle")
        .otherwise(F.lit("tail")),
    )
    assert bucketed.count() == len(rows)


def test_calibration_bins_match_python(spark):
    rnd = random.Random(13)
    rows = [
        (min(max(rnd.random(), 0.0), 1.0), rnd.randint(0, 1))
        for _ in range(500)
    ] + [(0.0, 0), (1.0, 1)]  # boundary scores
    from kafka_avro_order_processing_spark.operators.eval import (
        calibration_bins,
    )

    df = spark.createDataFrame(rows, "score double, label int")
    got = {
        r["bin"]: r
        for r in calibration_bins(df, "score", "label", n_bins=10).collect()
    }
    import collections

    want_n = collections.Counter()
    want_p = collections.Counter()
    want_s = collections.defaultdict(float)
    for s, y in rows:
        b = min(int(s * 10), 9)
        want_n[b] += 1
        want_p[b] += y
        want_s[b] += s
    for b in want_n:
        r = got[b]
        assert r["n"] == want_n[b]
        assert r["n_pos"] == want_p[b]
        assert abs(r["mean_score"] - want_s[b] / want_n[b]) < 1e-9
        assert abs(r["pos_rate"] - want_p[b] / want_n[b]) < 1e-15
    assert set(got) == set(want_n)


def test_threshold_for_keep_rate_exact(spark):
    from kafka_avro_order_processing_spark.operators.eval import (
        threshold_for_keep_rate,
    )

    rnd = random.Random(29)
    vals = [round(rnd.random() * 20) / 20 for _ in range(400)]  # ties
    df = spark.createDataFrame([(v,) for v in vals], "score double")
    for rate in (0.1, 0.25, 0.5, 0.9, 1.0):
        t, kept = threshold_for_keep_rate(df, rate, "score")
        target = math.ceil(rate * len(vals))
        assert kept == sum(1 for v in vals if v >= t)
        assert kept >= target
        # t is the LARGEST distinct score keeping >= target rows
        above = sorted({v for v in vals if v > t})
        if above:
            assert sum(1 for v in vals if v >= above[0]) < target
    with pytest.raises(ValueError):
        threshold_for_keep_rate(df, 0.0, "score")


def test_streaming_confusion_bit_matches_batch(spark, tmp_path):
    from kafka_avro_order_processing_spark.streaming.eval import (
        streaming_confusion,
    )

    rows = _toy(seed=43, n=200, quant=4) + [(None, 1), (0.3, None)]
    df = spark.createDataFrame(rows, "score double, label int")
    want = confusion_at_threshold(df, 0.25, "score", "label")
    d = str(tmp_path / "scores")
    df.repartition(5).write.parquet(d)  # several files -> several epochs
    stream = (
        spark.readStream.schema("score double, label int")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    got = streaming_confusion(stream, 0.25, "score", "label").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["tp"], r["fp"], r["fn"], r["tn"]) == (
        want["tp"],
        want["fp"],
        want["fn"],
        want["tn"],
    )


def test_classifier_journey_auc(spark):
    # trained classifier scored on held-out rows must clear AUC 0.9 on
    # the separable toy -- the metric and the model agree end to end.
    from kafka_avro_order_processing_spark.operators.classifier import (
        fit_logistic,
        score_logistic,
    )

    rnd = random.Random(41)
    rows = []
    for i in range(300):
        y = 1 if rnd.random() < 0.5 else 0
        rows.append(
            (
                i,
                rnd.gauss(2.0 if y else -1.0, 1.0),
                rnd.gauss(-1.0 if y else 1.5, 1.5),
                y,
            )
        )
    df = spark.createDataFrame(rows, "i int, f0 double, f1 double, label int")
    train = df.filter(F.col("i") % 3 != 0)
    test = df.filter(F.col("i") % 3 == 0)
    model = fit_logistic(train, ["f0", "f1"], n_rounds=30)
    scored = score_logistic(test, model)
    auc = roc_auc(scored, "quality_prob", "label")
    assert auc > 0.9
    # threshold sweep must contain the 0.5 operating point's counts
    m = confusion_at_threshold(scored, 0.5, "quality_prob", "label")
    assert m["tp"] + m["fp"] + m["fn"] + m["tn"] == test.count()
    assert math.isfinite(auc)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    pairs=st.lists(
        st.tuples(
            st.integers(min_value=-6, max_value=6),
            st.integers(min_value=-6, max_value=6),
        ),
        min_size=2,
        max_size=30,
    ).filter(
        lambda ps: len({a for a, _ in ps}) > 1 and len({b for _, b in ps}) > 1
    ),
    n_buckets=st.sampled_from([1, 5, 64]),
)
@pytest.mark.slow
def test_rank_correlation_fuzz_vs_python(spark, pairs, n_buckets):
    # small integer grids maximize tie pressure — the hard case for
    # tie-corrected ranks
    from kafka_avro_order_processing_spark.operators.eval import (
        rank_correlation,
    )

    fp = [(float(a), float(b)) for a, b in pairs]
    df = spark.createDataFrame(fp, "a double, b double")
    got = rank_correlation(df, "a", "b", n_buckets=n_buckets)
    assert abs(got - _py_spearman(fp)) < 1e-9
