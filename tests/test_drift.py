"""Distribution drift / PSI (operators/drift.py): agreement with a
pure-Python PSI reference, a DuckDB cross-check (1e-12 — ln is not
IEEE-rounded, see SCALE.md), null-storm and unseen-category
sensitivity, clamping, and the bounded-bucket contract.
"""

from __future__ import annotations

import pytest

import math

import duckdb
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.drift import (
    PSI_EPSILON,
    categorical_drift,
    numeric_drift,
    psi,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def _py_psi_numeric(ref, cur, n_bins, lo, hi):
    width = (hi - lo) / n_bins

    def bucket(x):
        if x is None:
            return -1
        b = math.floor((x - lo) / width)
        return max(0, min(n_bins - 1, b))

    def fracs(vals):
        counts = {}
        for v in vals:
            b = bucket(v)
            counts[b] = counts.get(b, 0) + 1
        total = max(len(vals), 1)
        return counts, total

    rc, rt = fracs(ref)
    cc, ct = fracs(cur)
    out = 0.0
    for b in set(rc) | set(cc):
        p = max(rc.get(b, 0) / rt, PSI_EPSILON)
        q = max(cc.get(b, 0) / ct, PSI_EPSILON)
        out += (q - p) * math.log(q / p)
    return out


def test_numeric_psi_matches_python_reference(spark):
    import random

    rnd = random.Random(5)
    ref_vals = [rnd.gauss(10, 2) for _ in range(400)] + [None] * 10
    cur_vals = [rnd.gauss(12, 3) for _ in range(300)] + [None] * 40
    ref = spark.createDataFrame([(v,) for v in ref_vals], "x double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "x double")
    lo = min(v for v in ref_vals if v is not None)
    hi = max(v for v in ref_vals if v is not None)
    got = psi(numeric_drift(ref, cur, "x", n_bins=8))
    want = _py_psi_numeric(ref_vals, cur_vals, 8, lo, hi)
    assert abs(got - want) < 1e-9
    assert got > 0.1  # the shifted distribution reads as drift


def test_identical_distributions_have_zero_psi(spark):
    orders = load_table(spark, SF, "orders")
    d = numeric_drift(orders, orders, "o_totalprice", n_bins=12)
    assert abs(psi(d)) < 1e-12
    r = d.agg(
        F.sum(F.when(F.col("ref_n") != F.col("cur_n"), 1).otherwise(0)).alias("m")
    ).collect()[0]["m"]
    assert r == 0


def test_null_storm_is_drift(spark):
    ref = spark.createDataFrame([(float(i % 50),) for i in range(500)], "x double")
    cur = spark.createDataFrame(
        [(float(i % 50) if i % 2 else None,) for i in range(500)], "x double"
    )
    d = numeric_drift(ref, cur, "x", n_bins=8)
    null_row = [r for r in d.collect() if r["bucket"] == -1]
    assert null_row and null_row[0]["cur_n"] == 250 and null_row[0]["ref_n"] == 0
    assert psi(d) > 0.25


def test_outliers_clamp_to_edge_bins(spark):
    ref = spark.createDataFrame([(float(i),) for i in range(100)], "x double")
    cur = spark.createDataFrame([(-1000.0,), (1000.0,)], "x double")
    rows = {r["bucket"]: r for r in numeric_drift(ref, cur, "x", n_bins=4).collect()}
    assert rows[0]["cur_n"] == 1 and rows[3]["cur_n"] == 1
    assert set(rows) == {0, 1, 2, 3}


def test_categorical_unseen_category_lands_in_other(spark):
    ref = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [("c",)] * 20, "v string"
    )
    cur = spark.createDataFrame(
        [("a",)] * 40 + [("b",)] * 30 + [("z",)] * 30, "v string"
    )
    d = {r["bucket"]: r for r in categorical_drift(ref, cur, "v").collect()}
    assert d["__OTHER__"]["cur_n"] == 30 and d["__OTHER__"]["ref_n"] == 0
    assert d["c"]["cur_n"] == 0
    assert psi(categorical_drift(ref, cur, "v")) > 0.1


def test_categorical_cap_bounds_buckets_deterministically(spark):
    ref = spark.createDataFrame(
        [(f"v{i:03d}",) for i in range(200) for _ in range(200 - i)], "v string"
    )
    cur = ref
    d = categorical_drift(ref, cur, "v", max_categories=10).collect()
    buckets = {r["bucket"] for r in d}
    # top-10 by count desc (v000 most frequent) + OTHER; no NULL bucket
    assert buckets == {f"v{i:03d}" for i in range(10)} | {"__OTHER__"}
    assert abs(sum(r["psi_contrib"] for r in d)) < 1e-12


def test_categorical_matches_duckdb(spark):
    orders = load_table(spark, SF, "orders")
    half_a = orders.filter(F.col("o_orderkey") % 2 == 0)
    half_b = orders.filter(F.col("o_orderkey") % 2 == 1)
    got = psi(categorical_drift(half_a, half_b, "o_orderpriority"))
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM"
        f" read_parquet('{SF}/orders.parquet')"
    )
    want = con.execute(
        """
        WITH r AS (SELECT coalesce(o_orderpriority,'__NULL__') v, count(*) n
                   FROM orders WHERE o_orderkey % 2 = 0 GROUP BY 1),
             c AS (SELECT coalesce(o_orderpriority,'__NULL__') v, count(*) n
                   FROM orders WHERE o_orderkey % 2 = 1 GROUP BY 1),
             j AS (SELECT coalesce(r.v, c.v) v,
                          coalesce(r.n, 0) rn, coalesce(c.n, 0) cn
                   FROM r FULL OUTER JOIN c ON r.v = c.v)
        SELECT sum((greatest(cn * 1.0 / (SELECT sum(cn) FROM j), 1e-6)
                  - greatest(rn * 1.0 / (SELECT sum(rn) FROM j), 1e-6))
                 * ln(greatest(cn * 1.0 / (SELECT sum(cn) FROM j), 1e-6)
                    / greatest(rn * 1.0 / (SELECT sum(rn) FROM j), 1e-6)))
        FROM j
        """
    ).fetchone()[0]
    con.close()
    # o_orderpriority has < 64 categories, so no OTHER rollup: the
    # DuckDB expression is the exact same algebra.  ln() tolerance.
    assert abs(got - want) < 1e-12


def test_drift_plan_is_python_free(spark):
    orders = load_table(spark, SF, "orders")
    plan = (
        numeric_drift(orders, orders, "o_totalprice")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan


def test_streaming_numeric_drift_bit_matches_batch(spark):
    # The streaming twin's only state is integer bucket counts —
    # associative, so the drained PSI detail must BIT-match the batch
    # operator on the same rows regardless of micro-batching.
    from kafka_avro_order_processing_spark.operators.drift import (
        numeric_drift,
    )
    from kafka_avro_order_processing_spark.streaming.drift import (
        streaming_numeric_drift,
    )
    from kafka_avro_order_processing_spark.streaming.pipeline import (
        stream_table,
    )

    ref = load_table(spark, SF, "orders").filter(F.col("o_orderkey") % 3 == 0)
    cur_batch = load_table(spark, SF, "orders")
    cur_stream = stream_table(spark, SF, "orders")

    want = sorted(
        tuple(r) for r in numeric_drift(ref, cur_batch, "o_totalprice").collect()
    )
    got = sorted(
        tuple(r)
        for r in streaming_numeric_drift(ref, cur_stream, "o_totalprice").collect()
    )
    assert got == want


def test_streaming_drift_multi_epoch_equals_single(spark, tmp_path):
    # Chop the same rows into 3 files (3 micro-batches under
    # maxFilesPerTrigger=1): the drained detail must still bit-match.
    from kafka_avro_order_processing_spark.operators.drift import (
        numeric_drift,
    )
    from kafka_avro_order_processing_spark.streaming.drift import (
        streaming_numeric_drift,
    )

    ref = spark.createDataFrame(
        [(float(i % 40),) for i in range(400)], "x double"
    )
    cur_rows = [(float((i * 7) % 53),) for i in range(300)]
    cur = spark.createDataFrame(cur_rows, "x double")
    d = str(tmp_path / "cur")
    cur.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema("x double")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    want = sorted(tuple(r) for r in numeric_drift(ref, cur, "x").collect())
    got = sorted(
        tuple(r) for r in streaming_numeric_drift(ref, stream, "x").collect()
    )
    assert got == want


def test_streaming_categorical_drift_bit_matches_batch(spark):
    from kafka_avro_order_processing_spark.streaming.drift import (
        streaming_categorical_drift,
    )
    from kafka_avro_order_processing_spark.streaming.pipeline import (
        stream_table,
    )

    ref = load_table(spark, SF, "orders").filter(F.col("o_orderkey") % 3 == 0)
    cur_batch = load_table(spark, SF, "orders")
    cur_stream = stream_table(spark, SF, "orders")
    want = sorted(
        tuple(r)
        for r in categorical_drift(ref, cur_batch, "o_orderpriority").collect()
    )
    got = sorted(
        tuple(r)
        for r in streaming_categorical_drift(
            ref, cur_stream, "o_orderpriority"
        ).collect()
    )
    assert got == want


def test_quantile_drift_equal_frequency_reference(spark):
    # Decile bins: on the reference itself every bin holds ~10% of the
    # mass (exact up to quantile-sketch placement of ties), PSI ~ 0,
    # and a genuinely shifted current side scores higher than the
    # equal-width metric gives a heavy-tailed column.
    from kafka_avro_order_processing_spark.operators.drift import (
        quantile_drift,
    )

    import random

    rnd = random.Random(9)
    # heavy tail: 95% of mass in [0, 1), outliers to 10^6
    ref_vals = [rnd.random() for _ in range(950)] + [
        rnd.random() * 1e6 for _ in range(50)
    ]
    cur_vals = [rnd.random() * 2 for _ in range(950)] + [
        rnd.random() * 1e6 for _ in range(50)
    ]
    ref = spark.createDataFrame([(v,) for v in ref_vals], "x double")
    cur = spark.createDataFrame([(v,) for v in cur_vals], "x double")
    dq = quantile_drift(ref, cur, "x", n_bins=10)
    rows = dq.collect()
    fracs = [r["ref_frac"] for r in rows if r["bucket"] >= 0]
    assert len(fracs) == 10
    assert all(abs(f - 0.1) < 0.03 for f in fracs), fracs
    # the doubled-scale shift is visible in quantile bins but hidden
    # from equal-width bins stretched to the 1e6 outlier
    q_psi = psi(dq)
    w_psi = psi(numeric_drift(ref, cur, "x", n_bins=10))
    assert q_psi > 0.25
    assert q_psi > w_psi


def test_quantile_drift_self_is_near_zero(spark):
    from kafka_avro_order_processing_spark.operators.drift import (
        quantile_drift,
    )

    orders = load_table(spark, SF, "orders")
    assert abs(psi(quantile_drift(orders, orders, "o_totalprice"))) < 1e-12


def test_quantile_drift_constant_reference_collapses_bins(spark):
    from kafka_avro_order_processing_spark.operators.drift import (
        quantile_drift,
    )

    ref = spark.createDataFrame([(1.0,)] * 100, "x double")
    cur = spark.createDataFrame([(1.0,)] * 50 + [(2.0,)] * 50, "x double")
    rows = quantile_drift(ref, cur, "x", n_bins=10).collect()
    # all edges duplicate -> collapse to <= 2 buckets, no crash
    assert 1 <= len([r for r in rows if r["bucket"] >= 0]) <= 2
    # documented limitation: a CONSTANT reference has no quantile
    # structure — every value >= the single collapsed edge shares one
    # bucket, so this shift is invisible to equal-frequency bins (PSI
    # 0) while equal-width bins see it.  Degenerate references belong
    # to numeric_drift.
    assert psi(quantile_drift(ref, cur, "x")) == 0.0
    from kafka_avro_order_processing_spark.operators.drift import (
        numeric_drift as nd,
    )

    assert psi(nd(ref, cur, "x")) > 0.1


@pytest.mark.slow
def test_ks_2sample_matches_python_exact(spark):
    import random

    from kafka_avro_order_processing_spark.operators.drift import ks_2sample

    rnd = random.Random(61)
    a = [round(rnd.gauss(0, 1) * 4) / 4 for _ in range(300)]   # ties
    b = [round(rnd.gauss(0.4, 1.2) * 4) / 4 for _ in range(200)]
    ref = spark.createDataFrame([(v,) for v in a], "x double")
    cur = spark.createDataFrame([(v,) for v in b], "x double")

    def py_ks(xs, ys):
        vals = sorted(set(xs) | set(ys))
        return max(
            abs(
                sum(1 for x in xs if x <= v) / len(xs)
                - sum(1 for y in ys if y <= v) / len(ys)
            )
            for v in vals
        )

    got = ks_2sample(ref, cur, "x")
    assert abs(got - py_ks(a, b)) < 1e-15
    # bit-exact under partitioning and bucket count
    assert got == ks_2sample(ref.repartition(7), cur, "x", n_buckets=3)
    # identical samples -> exactly 0; disjoint ranges -> exactly 1
    assert ks_2sample(ref, ref, "x") == 0.0
    lo = spark.createDataFrame([(float(i),) for i in range(50)], "x double")
    hi = spark.createDataFrame(
        [(float(i + 1000),) for i in range(50)], "x double"
    )
    assert ks_2sample(lo, hi, "x") == 1.0
    # NULLs excluded
    noisy = cur.unionByName(
        spark.createDataFrame([(None,)], "x double")
    )
    assert ks_2sample(ref, noisy, "x") == got
    import pytest as _pytest

    with _pytest.raises(ValueError):
        ks_2sample(ref, spark.createDataFrame([], "x double"), "x")


def test_embedding_drift_matches_numpy_and_detects_shift(spark):
    import random

    from kafka_avro_order_processing_spark.operators.drift import (
        embedding_drift,
    )

    rnd = random.Random(67)
    dims = 8

    def corpus(axis, n):
        return [
            ([rnd.gauss(2.0 if d == axis else 0.0, 1.0) for d in range(dims)],)
            for _ in range(n)
        ]

    a = corpus(0, 300)
    b = corpus(0, 200)   # same direction -> tiny cosine distance
    c = corpus(1, 200)   # rotated mean -> large cosine distance
    ref = spark.createDataFrame(a, "embedding array<double>")
    same = spark.createDataFrame(b, "embedding array<double>")
    moved = spark.createDataFrame(c, "embedding array<double>")

    d_same = embedding_drift(ref, same)
    d_moved = embedding_drift(ref, moved)
    assert d_same["dims"] == dims and d_same["n_ref"] == 300
    assert d_moved["cosine_distance"] > 5 * d_same["cosine_distance"]
    assert d_moved["l2_distance"] > d_same["l2_distance"]

    # exact python parity (the decimal sums round per row at most; the
    # test vectors are float32-representable scale so means are exact)
    def pymean(rows):
        n = len(rows)
        return [sum(r[0][d] for r in rows) / n for d in range(dims)]

    import math

    ma, mb = pymean(a), pymean(b)
    dot = sum(x * y for x, y in zip(ma, mb))
    na = math.sqrt(sum(x * x for x in ma))
    nb = math.sqrt(sum(y * y for y in mb))
    assert abs(d_same["cosine_distance"] - (1 - dot / (na * nb))) < 1e-9

    # drift of a corpus against itself is exactly zero
    d_self = embedding_drift(ref, ref)
    assert d_self["cosine_distance"] == 0.0 and d_self["l2_distance"] == 0.0

    # ragged / mismatched shapes fail loudly
    import pytest as _pytest

    ragged = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0, 2.0, 3.0],)], "embedding array<double>"
    )
    with _pytest.raises(ValueError):
        embedding_drift(ref, ragged)
    with _pytest.raises(ValueError):
        embedding_drift(
            ref, spark.createDataFrame([], "embedding array<double>")
        )


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_v = st.one_of(
    st.sampled_from([0.0, -0.0, 1.0, -1e300, 1e-300]),
    st.floats(min_value=-50, max_value=50, allow_nan=False, allow_infinity=False),
)


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    xs=st.lists(_v, min_size=1, max_size=30),
    ys=st.lists(_v, min_size=1, max_size=30),
    n_buckets=st.sampled_from([1, 4, 64]),
)
@pytest.mark.slow
def test_ks_2sample_fuzz_vs_python(spark, xs, ys, n_buckets):
    from kafka_avro_order_processing_spark.operators.drift import ks_2sample

    ref = spark.createDataFrame([(v,) for v in xs], "x double")
    cur = spark.createDataFrame([(v,) for v in ys], "x double")
    got = ks_2sample(ref, cur, "x", n_buckets=n_buckets)
    vals = sorted(set(xs) | set(ys))
    want = max(
        abs(
            sum(1 for x in xs if x <= v) / len(xs)
            - sum(1 for y in ys if y <= v) / len(ys)
        )
        for v in vals
    )
    assert abs(got - want) < 1e-12


def test_grouped_ks_matches_scalar_twin(spark):
    import random

    from kafka_avro_order_processing_spark.operators.drift import (
        grouped_ks_2sample,
        ks_2sample,
    )

    rnd = random.Random(83)
    refs, curs = [], []
    for g, shift in (("en", 0.0), ("de", 0.8), ("fr", 2.0)):
        refs += [(g, round(rnd.gauss(0, 1) * 4) / 4) for _ in range(150)]
        curs += [(g, round(rnd.gauss(shift, 1) * 4) / 4) for _ in range(120)]
    refs.append(("ref_only", 1.0))
    curs.append(("cur_only", 1.0))
    ref = spark.createDataFrame(refs, "lang string, x double")
    cur = spark.createDataFrame(curs, "lang string, x double")
    got = {
        r["lang"]: r
        for r in grouped_ks_2sample(ref, cur, "x", "lang").collect()
    }
    for g in ("en", "de", "fr"):
        want = ks_2sample(
            ref.filter(F.col("lang") == g),
            cur.filter(F.col("lang") == g),
            "x",
        )
        assert got[g]["ks"] == want  # bit-equal
        assert got[g]["n_ref"] == 150 and got[g]["n_cur"] == 120
    # the shift ordering shows through
    assert got["fr"]["ks"] > got["de"]["ks"] > got["en"]["ks"]
    # one-sided groups are reported, not dropped; their D is NULL
    assert got["ref_only"]["ks"] is None and got["ref_only"]["n_cur"] == 0
    assert got["cur_only"]["ks"] is None and got["cur_only"]["n_ref"] == 0
    # partitioning/bucket invariance, bit-exact
    again = {
        r["lang"]: r["ks"]
        for r in grouped_ks_2sample(
            ref.repartition(9), cur, "x", "lang", n_buckets=3
        ).collect()
    }
    assert again == {k: v["ks"] for k, v in got.items()}
