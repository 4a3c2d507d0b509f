"""Isotonic (PAV) + Platt calibration (operators/calibrate.py): exact
agreement with an independent O(n^2) Python PAV reference, weighted ==
repeated rows, bit-identical across range-partition counts (two-phase
PAV exactness), decreasing fits, the covering-interval apply path
(clamps + NULL propagation), and loud NULL rejection.

Targets in these tests are dyadic (0, 1, 0.25, 0.5) so the single JVM
target quantization (y * 2^52 -> DECIMAL) is exact and the Python
reference can match bit-for-bit, sidestepping the Double.toString
rounding gotcha.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.calibrate import (
    isotonic_apply,
    isotonic_fit,
    platt_fit,
)
from kafka_avro_order_processing_spark.operators.similarity import MEAN_SCALE


def _ref_pav(pairs, weights=None):
    """Independent PAV: repeated full scans (the textbook O(n^2) form,
    structurally unlike the operator's stack), exact integer masses."""
    weights = weights or [1] * len(pairs)
    agg = {}
    for (s, y), w in zip(pairs, weights):
        sy, sw = agg.get(s, (0, 0))
        agg[s] = (sy + int(round(y * MEAN_SCALE)) * w, sw + w)
    blocks = [[s, s, sy, sw] for s, (sy, sw) in sorted(agg.items())]
    changed = True
    while changed:
        changed = False
        for i in range(len(blocks) - 1):
            a, b = blocks[i], blocks[i + 1]
            if a[2] * b[3] > b[2] * a[3]:
                blocks[i : i + 2] = [[a[0], b[1], a[2] + b[2], a[3] + b[3]]]
                changed = True
                break
    return {
        "score_lo": [b[0] for b in blocks],
        "score_hi": [b[1] for b in blocks],
        "p": [b[2] / (b[3] * MEAN_SCALE) for b in blocks],
        "n": [b[3] for b in blocks],
    }


PAIRS = [
    (1.0, 0.0), (2.0, 1.0), (3.0, 0.0), (4.0, 1.0),
    (5.0, 1.0), (6.0, 0.0), (7.0, 1.0), (8.0, 1.0),
    (3.0, 1.0),  # tied score: pre-pooled exactly
    (2.5, 0.25), (2.5, 0.5),  # dyadic fractional targets
]


def _frame(spark, pairs=PAIRS, weights=None):
    if weights is None:
        rows = [(s, y) for s, y in pairs]
        return spark.createDataFrame(rows, "score double, y double")
    rows = [(s, y, w) for (s, y), w in zip(pairs, weights)]
    return spark.createDataFrame(rows, "score double, y double, w long")


def test_fit_matches_reference_exactly(spark):
    model = isotonic_fit(_frame(spark), "score", "y")
    ref = _ref_pav(PAIRS)
    assert model["score_lo"] == ref["score_lo"]
    assert model["score_hi"] == ref["score_hi"]
    assert model["p"] == ref["p"]  # exact float equality by construction
    assert model["n"] == ref["n"]
    # the fit is monotone non-decreasing
    assert model["p"] == sorted(model["p"])


def test_partition_count_invariance(spark):
    base = isotonic_fit(_frame(spark), "score", "y", n_ranges=1)
    for n in (3, 32):
        again = isotonic_fit(_frame(spark), "score", "y", n_ranges=n)
        assert again == base


def test_weighted_equals_repeated_rows(spark):
    weights = [1, 3, 2, 1, 1, 2, 1, 1, 1, 1, 4]
    repeated = [p for p, w in zip(PAIRS, weights) for _ in range(w)]
    wm = isotonic_fit(_frame(spark, weights=weights), "score", "y", weight_col="w")
    rm = isotonic_fit(_frame(spark, pairs=repeated), "score", "y")
    assert wm == rm
    assert wm == {**_ref_pav(PAIRS, weights), "increasing": True}


def test_decreasing_fit_mirrors_increasing(spark):
    dec = isotonic_fit(_frame(spark), "score", "y", increasing=False)
    neg = _ref_pav([(-s, y) for s, y in PAIRS])
    # un-negated edges, blocks reported in increasing score order
    assert dec["score_lo"] == [-hi for hi in reversed(neg["score_hi"])]
    assert dec["score_hi"] == [-lo for lo in reversed(neg["score_lo"])]
    assert dec["p"] == list(reversed(neg["p"]))
    assert dec["p"] == sorted(dec["p"], reverse=True)
    assert dec["increasing"] is False


def test_apply_step_clamp_and_null(spark):
    model = isotonic_fit(_frame(spark), "score", "y")
    probe = spark.createDataFrame(
        [(0, -100.0), (1, 1.0), (2, 4.7), (3, 100.0), (4, None)],
        "pid long, score double",
    )
    got = {
        r["pid"]: r["calibrated"]
        for r in isotonic_apply(probe, model, "score").collect()
    }
    los, his, ps = model["score_lo"], model["score_hi"], model["p"]
    assert got[0] == ps[0]  # below the first block: clamped
    assert got[3] == ps[-1]  # above the last block: clamped
    # in-range scores get their covering block's value
    for pid, s in ((1, 1.0), (2, 4.7)):
        idx = max(i for i, lo in enumerate(los) if s >= lo)
        assert got[pid] == ps[idx]
    assert got[4] is None  # NULL score -> NULL calibrated
    # exactly one row out per row in
    assert isotonic_apply(probe, model, "score").count() == probe.count()


def test_apply_is_a_broadcast_join(spark):
    model = isotonic_fit(_frame(spark), "score", "y")
    probe = spark.createDataFrame([(1.0,)], "score double")
    plan = (
        isotonic_apply(probe, model, "score")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan


def test_null_rows_rejected(spark):
    bad = spark.createDataFrame(
        [(1.0, 0.0), (None, 1.0)], "score double, y double"
    )
    with pytest.raises(ValueError, match="NULL"):
        isotonic_fit(bad, "score", "y")


def test_bad_weights_rejected(spark):
    """The documented 'positive integer' weight contract is enforced
    (r10 ADVICE): a NULL weight would silently drop its row, an
    all-zero score group divides by zero at p = sy/(w*2^52), and a
    negative weight inverts the bigint cross-multiplication."""
    rows = [(1.0, 0.0, 1), (2.0, 1.0, 2)]
    for bad_w in (None, 0, -3):
        df = spark.createDataFrame(
            rows + [(3.0, 1.0, bad_w)], "score double, y double, w int"
        )
        with pytest.raises(ValueError, match="w"):
            isotonic_fit(df, "score", "y", weight_col="w")
    ok = spark.createDataFrame(rows, "score double, y double, w int")
    model = isotonic_fit(ok, "score", "y", weight_col="w")
    assert model["n"] and sum(model["n"]) == 3


def test_empty_model_apply_rejected(spark):
    empty = spark.createDataFrame([], "score double, y double")
    model = isotonic_fit(empty, "score", "y")
    assert model["score_lo"] == []
    with pytest.raises(ValueError, match="empty model"):
        isotonic_apply(_frame(spark), model, "score")


def test_platt_fit_is_monotone_sigmoid(spark):
    from kafka_avro_order_processing_spark.operators.classifier import (
        score_logistic,
    )

    df = spark.createDataFrame(
        [(float(s), 1 if s > 4 else 0) for s in range(1, 9) for _ in range(3)],
        "score double, label int",
    )
    model = platt_fit(df, "score", "label", n_rounds=100)
    probe = spark.createDataFrame([(float(s),) for s in range(0, 10)], "score double")
    out = [
        r["quality_prob"]
        for r in score_logistic(probe, model).orderBy("score").collect()
    ]
    assert out == sorted(out)  # monotone in the score
    assert out[0] < 0.5 < out[-1]


def test_isotonic_apply_streams_bit_match(spark, tmp_path):
    """The apply path is a stateless broadcast interval join, so the
    SAME plan runs on a streaming frame — calibrated values at ingest
    BIT-match the batch operator on the same rows."""
    from kafka_avro_order_processing_spark.streaming.pipeline import drain_to_df

    model = isotonic_fit(_frame(spark), "score", "y")
    probe = spark.createDataFrame(
        [(i, float(s)) for i, s in enumerate((-5.0, 1.0, 2.5, 4.7, 99.0, 3.0))],
        "pid long, score double",
    )
    d = str(tmp_path / "scores")
    probe.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema("pid long, score double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    want = sorted(
        tuple(r) for r in isotonic_apply(probe, model, "score").collect()
    )
    got = sorted(
        tuple(r)
        for r in drain_to_df(
            isotonic_apply(stream, model, "score"), "append"
        ).collect()
    )
    assert got == want


def test_expected_calibration_error(spark):
    from kafka_avro_order_processing_spark.operators.calibrate import (
        expected_calibration_error,
    )

    # perfectly calibrated within bins: score == bin pos_rate
    rows = (
        [(0.25, 1)] * 1 + [(0.25, 0)] * 3   # bin 2: mean 0.25, rate 0.25
        + [(0.75, 1)] * 3 + [(0.75, 0)] * 1  # bin 7: mean 0.75, rate 0.75
    )
    df = spark.createDataFrame(rows, "quality_prob double, label int")
    row = expected_calibration_error(df).collect()[0]
    assert row["ece"] == pytest.approx(0.0, abs=1e-12)
    assert row["n"] == 8 and row["n_bins_used"] == 2
    # a maximally miscalibrated frame: confident scores, opposite labels
    bad = spark.createDataFrame(
        [(0.95, 0)] * 4 + [(0.05, 1)] * 4, "quality_prob double, label int"
    )
    brow = expected_calibration_error(bad).collect()[0]
    # both bins gap by |rate - mean| = 0.95
    assert brow["ece"] == pytest.approx(0.95, abs=1e-12)
    # python reference on mixed data
    mixed = [(0.1, 0), (0.15, 1), (0.62, 1), (0.68, 0), (0.9, 1), (0.97, 1)]
    mdf = spark.createDataFrame(mixed, "quality_prob double, label int")
    bins = {}
    for s, y in mixed:
        b = min(int(s * 10), 9)
        n, npos, ssum = bins.get(b, (0, 0, 0.0))
        bins[b] = (n + 1, npos + y, ssum + s)
    ref = sum(
        n * abs(npos / n - ssum / n) for n, npos, ssum in bins.values()
    ) / len(mixed)
    mrow = expected_calibration_error(mdf).collect()[0]
    assert mrow["ece"] == pytest.approx(ref, abs=1e-9)
    # empty frame: NULL ece, zero counts
    empty = spark.createDataFrame([], "quality_prob double, label int")
    erow = expected_calibration_error(empty).collect()[0]
    assert erow["ece"] is None and erow["n"] == 0


def test_pav_hypothesis_battery():
    """Property battery over the PAV core (pure Python, no Spark):
    against the O(n^2) textbook reference on random integer block
    sequences — identical blocks, monotone means, conserved mass."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kafka_avro_order_processing_spark.operators.calibrate import _pav

    blocks_strategy = st.lists(
        st.tuples(
            st.integers(min_value=-(10**15), max_value=10**15),  # sy
            st.integers(min_value=1, max_value=10**6),  # w
        ),
        min_size=0,
        max_size=40,
    )

    def ref(blocks):
        bl = [list(b) for b in blocks]
        changed = True
        while changed:
            changed = False
            for i in range(len(bl) - 1):
                a, b = bl[i], bl[i + 1]
                if a[2] * b[3] > b[2] * a[3]:
                    bl[i : i + 2] = [[a[0], b[1], a[2] + b[2], a[3] + b[3]]]
                    changed = True
                    break
        return [tuple(b) for b in bl]

    @settings(max_examples=200, deadline=None)
    @given(blocks_strategy)
    def prop(raw):
        blocks = [
            (float(i), float(i), sy, w) for i, (sy, w) in enumerate(raw)
        ]
        got = _pav(blocks)
        assert got == ref(blocks)
        # monotone means (exact cross-multiplied comparison)
        for a, b in zip(got, got[1:]):
            assert a[2] * b[3] <= b[2] * a[3]
        # mass and target conservation
        assert sum(b[3] for b in got) == sum(w for _, w in raw)
        assert sum(b[2] for b in got) == sum(sy for sy, _ in raw)
        # edges tile the input in order
        if got:
            assert got[0][0] == 0.0 and got[-1][1] == float(len(raw) - 1)

    prop()
