"""Exact-moment Pearson correlation (quantity_price_correlation): the
integer-moment assembly must agree with numpy's float corrcoef to
float tolerance (same statistic), and — the operator's actual contract
— be BIT-identical under any repartitioning (integer partials are
associative; a float running corr is not).
"""

from __future__ import annotations

import math

import numpy as np

from kafka_avro_order_processing_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _rows(spark, sf=SF):
    return {
        r["l_returnflag"]: r
        for r in QUERIES["quantity_price_correlation"].fn(spark, sf).collect()
    }


def test_agrees_with_numpy_corrcoef(spark):
    got = _rows(spark)
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    by_flag: dict[str, tuple[list, list]] = {}
    for r in li:
        xs, ys = by_flag.setdefault(r["l_returnflag"], ([], []))
        xs.append(r["l_quantity"])
        ys.append(round(r["l_extendedprice"] * 100))
    assert set(got) == set(by_flag)
    for flag, (xs, ys) in by_flag.items():
        ref = float(np.corrcoef(xs, ys)[0, 1])
        assert math.isclose(got[flag]["corr_qty_price"], ref, rel_tol=1e-9), flag
        assert got[flag]["n_items"] == len(xs)
        assert got[flag]["sum_qty"] == int(sum(xs))
        assert got[flag]["sum_price_cents"] == int(sum(ys))


def test_bit_identical_under_repartitioning(spark):
    # The whole point of integer moments: the float output is one fixed
    # expression over exact sums, so partitioning cannot move a bit.
    # Runs the REGISTERED plan's own building blocks (_qpc_moments /
    # _qpc_assemble) over the repartitioned table, so expression drift
    # in the plan cannot silently diverge from this test.
    from kafka_avro_order_processing_spark.plans.registry import (
        _qpc_assemble,
        _qpc_moments,
    )

    base = _rows(spark)
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    for parts in (1, 7, 32):
        shuffled = li.repartition(parts, "l_orderkey")
        rerun = {
            r["l_returnflag"]: r
            for r in _qpc_assemble(_qpc_moments(shuffled)).collect()
        }
        for flag, r in base.items():
            # exact float equality — the contract, not a tolerance
            assert rerun[flag]["corr_qty_price"] == r["corr_qty_price"], (
                flag,
                parts,
            )


def test_trend_agrees_with_numpy_polyfit(spark):
    row = QUERIES["daily_revenue_trend"].fn(spark, SF).collect()[0]
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    import calendar

    daily: dict[int, int] = {}
    for r in orders:
        # timegm, not .timestamp(): naive-datetime .timestamp() applies
        # the HOST timezone while the Spark session pins UTC — on a
        # non-UTC host the day bucketing would shift.
        day = calendar.timegm(r["o_orderdate"].timetuple()) // 86400
        daily[day] = daily.get(day, 0) + round(r["o_totalprice"] * 100)
    xs = np.array(sorted(daily), dtype=float)
    ys = np.array([daily[d] for d in sorted(daily)], dtype=float)
    slope, intercept = np.polyfit(xs, ys, 1)
    assert row["n_days"] == len(xs)
    assert math.isclose(row["slope_cents_per_day"], float(slope), rel_tol=1e-9)
    assert math.isclose(row["intercept_cents"], float(intercept), rel_tol=1e-9)


def test_trend_is_deterministic_across_runs(spark):
    a = QUERIES["daily_revenue_trend"].fn(spark, SF).collect()[0]
    b = QUERIES["daily_revenue_trend"].fn(spark, SF).collect()[0]
    assert a["slope_cents_per_day"] == b["slope_cents_per_day"]
    assert a["intercept_cents"] == b["intercept_cents"]


def test_streaming_twin_equals_batch_bit_for_bit(spark):
    # Moments are associative integer sums: draining them as
    # update-mode streaming state must reproduce the batch result
    # EXACTLY (same contract as the sketch twins).
    batch = _rows(spark)
    stream = {
        r["l_returnflag"]: r
        for r in QUERIES["streaming_quantity_price_correlation"]
        .fn(spark, SF)
        .collect()
    }
    assert set(stream) == set(batch)
    for flag, r in batch.items():
        s = stream[flag]
        assert (
            s["n_items"],
            s["sum_qty"],
            s["sum_price_cents"],
            s["corr_qty_price"],
        ) == (
            r["n_items"],
            r["sum_qty"],
            r["sum_price_cents"],
            r["corr_qty_price"],
        ), flag


def test_zero_variance_group_yields_null(spark):
    # All-identical x AND y in a group: variance is zero, r undefined.
    # The contract is NULL (SQL corr() convention) — NOT NaN: Spark's
    # double 0/0 is IEEE NaN while DuckDB's is NULL, so a non-total
    # expression diverges cross-engine (found by the generative fuzz).
    from kafka_avro_order_processing_spark.plans.registry import (
        _qpc_assemble,
        _qpc_moments,
    )

    df = spark.createDataFrame(
        [("Z", 1, 1.0)] * 4 + [("W", 1, 2.0), ("W", 2, 9.0), ("W", 3, 4.0)],
        "l_returnflag string, l_quantity long, l_extendedprice double",
    )
    rows = {r["l_returnflag"]: r for r in _qpc_assemble(_qpc_moments(df)).collect()}
    assert rows["Z"]["corr_qty_price"] is None
    assert rows["W"]["corr_qty_price"] is not None


def test_spearman_agrees_with_python_average_ranks(spark):
    """qty_price_rank_corr: the doubled-average-rank Pearson must agree
    with an independent Python implementation of tie-corrected Spearman
    (average ranks + np.corrcoef) to float tolerance, and the doubling
    must cancel exactly."""
    rows = {
        r["l_returnflag"]: r
        for r in QUERIES["qty_price_rank_corr"].fn(spark, SF).collect()
    }
    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    ).collect()
    by_flag: dict[str, tuple[list, list]] = {}
    for r in li:
        xs, ys = by_flag.setdefault(r["l_returnflag"], ([], []))
        xs.append(r["l_quantity"])
        ys.append(round(r["l_extendedprice"] * 100))

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            avg = (i + j) / 2 + 1
            for k in range(i, j + 1):
                ranks[order[k]] = avg
            i = j + 1
        return ranks

    assert set(rows) == set(by_flag)
    for flag, (xs, ys) in by_flag.items():
        ref = float(np.corrcoef(avg_ranks(xs), avg_ranks(ys))[0, 1])
        assert math.isclose(
            rows[flag]["spearman_rho"], ref, rel_tol=1e-9
        ), flag
        assert rows[flag]["n_items"] == len(xs)


def test_spearman_null_on_constant_group(spark):
    """Zero-variance groups (every x tied) must yield NULL, the same
    total contract as the Pearson row."""
    from kafka_avro_order_processing_spark.plans.registry import QUERIES as Q
    import tempfile

    df = spark.createDataFrame(
        [("Z", 5.0, float(p)) for p in range(4)] + [("W", 1.0, 2.0), ("W", 2.0, 1.0)],
        "l_returnflag string, l_quantity double, l_extendedprice double",
    )
    d = tempfile.mkdtemp()
    df.write.mode("overwrite").parquet(f"{d}/lineitem.parquet")
    out = {
        r["l_returnflag"]: r["spearman_rho"]
        for r in Q["qty_price_rank_corr"].fn(spark, d).collect()
    }
    assert out["Z"] is None          # constant quantity: no rank variance
    assert out["W"] == -1.0          # perfectly anti-monotone
