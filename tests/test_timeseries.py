"""Time-series resample + anomaly queries (daily_revenue_filled,
revenue_anomaly_days): the gap-filled spine must be dense and carry
values forward exactly like a pure-Python LOCF, and the zero-float
anomaly inequality must equal an exact-integer reference flag for
flag (the operator's contract — no float z-score boundary drift).
"""

from __future__ import annotations

import calendar

from kafka_avro_order_processing_spark.plans.registry import QUERIES

SF = "/root/testdata/sf0.001"


def _daily(spark) -> dict[int, int]:
    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        "o_orderdate", "o_totalprice"
    ).collect()
    daily: dict[int, int] = {}
    for r in orders:
        # timegm, not .timestamp(): naive-datetime .timestamp() applies
        # the HOST timezone while the Spark session pins UTC.
        day = calendar.timegm(r["o_orderdate"].timetuple()) // 86400
        daily[day] = daily.get(day, 0) + round(r["o_totalprice"] * 100)
    return daily


def test_gap_fill_matches_python_locf(spark):
    daily = _daily(spark)
    lo, hi = min(daily), max(daily)
    rows = {
        r["day"]: r
        for r in QUERIES["daily_revenue_filled"].fn(spark, SF).collect()
    }
    assert set(rows) == set(range(lo, hi + 1))  # dense spine
    carried = None
    for day in range(lo, hi + 1):
        if day in daily:
            carried = daily[day]
            assert rows[day]["was_missing"] is False
        else:
            assert rows[day]["was_missing"] is True
        assert rows[day]["rev_cents_filled"] == carried, day


def test_anomaly_flags_match_exact_integer_reference(spark):
    daily = _daily(spark)
    n = len(daily)
    sy = sum(daily.values())
    syy = sum(v * v for v in daily.values())
    rows = {
        r["day"]: r
        for r in QUERIES["revenue_anomaly_days"].fn(spark, SF).collect()
    }
    assert set(rows) == set(daily)
    n_flagged = 0
    for day, v in daily.items():
        expect = (n * v - sy) ** 2 > 4 * (n * syy - sy * sy)
        assert rows[day]["is_anomaly"] == expect, day
        assert rows[day]["rev_cents"] == v
        n_flagged += expect
    # sanity: some but not most days flag on real data
    assert 0 < n_flagged < n // 2


def test_streaming_anomaly_equals_batch_bit_for_bit(spark):
    batch = {
        r["day"]: (r["rev_cents"], r["is_anomaly"])
        for r in QUERIES["revenue_anomaly_days"].fn(spark, SF).collect()
    }
    stream = {
        r["day"]: (r["rev_cents"], r["is_anomaly"])
        for r in QUERIES["streaming_revenue_anomaly"].fn(spark, SF).collect()
    }
    assert stream == batch


def test_grouped_trend_matches_numpy_per_group(spark):
    import math

    import numpy as np

    rows = {
        r["event_type"]: r
        for r in QUERIES["event_type_daily_trend"].fn(spark, SF).collect()
    }
    from kafka_avro_order_processing_spark.sources.tables import load_table

    evn = load_table(spark, SF, "events").select("event_type", "ts").collect()
    daily: dict[tuple[str, int], int] = {}
    for r in evn:
        day = calendar.timegm(r["ts"].timetuple()) // 86400
        daily[(r["event_type"], day)] = daily.get((r["event_type"], day), 0) + 1
    by_type: dict[str, dict[int, int]] = {}
    for (et, day), c in daily.items():
        by_type.setdefault(et, {})[day] = c
    assert set(rows) == set(by_type)
    for et, series in by_type.items():
        xs = np.array(sorted(series), dtype=float)
        ys = np.array([series[d] for d in sorted(series)], dtype=float)
        assert rows[et]["n_days"] == len(xs)
        assert rows[et]["total_events"] == int(ys.sum())
        if len(xs) > 1:
            slope = np.polyfit(xs, ys, 1)[0]
            assert math.isclose(
                rows[et]["slope_events_per_day"], float(slope), rel_tol=1e-9
            ), et
