"""Z-order layout (operators/zorder.py): exact DuckDB oracle parity
for the Morton key (pure integer arithmetic), the multi-dimensional
pruning property (a rectangle query touches a small fraction of
z-ordered files vs ~all row-ordered files), zone-map correctness,
and the loud bounds/validation contracts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.operators.zorder import (
    pruning_fraction,
    zbucket,
    quantize_minmax,
    zone_maps,
    zorder_key,
    zorder_key_auto,
    zorder_layout,
)
from kafka_avro_order_processing_spark.sources.tables import load_table


def _zkey_sql(cols_lo_hi: list[tuple[str, int, int]], bits: int) -> str:
    """DuckDB replica: integer-div quantization + bit interleave."""
    k = len(cols_lo_hi)
    terms = []
    for c_idx, (c, lo, hi) in enumerate(cols_lo_hi):
        span = hi - lo + 1
        q = f"((({c} - {lo}) * {2 ** bits}) // {span})"
        for j in range(bits):
            terms.append(f"((({q} >> {j}) & 1) << {j * k + c_idx})")
    return " + ".join(terms)


def test_zorder_key_duckdb_oracle(spark):
    ev = load_table(spark, SF_DIR, "events")
    lo_u, hi_u = 0, 149
    lo_e, hi_e = (
        ev.agg(F.min("event_id"), F.max("event_id")).collect()[0][0],
        ev.agg(F.max("event_id")).collect()[0][0],
    )
    qs = [
        quantize_minmax(F.col("user_id"), lo_u, hi_u, 8),
        quantize_minmax(F.col("event_id"), lo_e, hi_e, 8),
    ]
    sdf = ev.select(
        "event_id", zorder_key(qs, 8).alias("zkey")
    )
    sql = f"""
    SELECT event_id,
           {_zkey_sql([("user_id", lo_u, hi_u), ("event_id", lo_e, hi_e)], 8)}
             AS zkey
    FROM events
    """
    _assert_parity(sdf, sql)


def _grid(spark):
    """Rows on a 32 x 32 grid, two independent dimensions (spans the
    full grid even at the smallest SF's 1k events)."""
    ev = load_table(spark, SF_DIR, "events")
    return ev.select(
        (F.col("event_id") % 32).alias("x"),
        ((F.col("event_id") / 32).cast("long") % 32).alias("y"),
    )


def test_pruning_rectangle_query(spark):
    """Deterministic layout comparison via arithmetic z-buckets (the
    physical repartitionByRange samples its boundaries per
    recomputation, so the test keys zone maps on the reproducible
    bucket id instead)."""
    df = _grid(spark)
    zdf, _ = zorder_key_auto(df, ["x", "y"], bits=5)
    zdf = zdf.withColumn("f", zbucket(F.col("zkey"), 16, 2, 5))
    zm = zone_maps(zdf, ["x", "y"], file_col="f")
    # single-column baseline: bucketed by x alone — x prunes
    # perfectly, y locality is destroyed (each x slice spans all y).
    bdf = df.withColumn("f", (F.col("x") - F.col("x") % 2) / 2)
    base = zone_maps(bdf, ["x", "y"], file_col="f")
    rect = {"x": (0, 7), "y": (0, 7)}
    frac_z = pruning_fraction(zm, rect)
    # 16 buckets = 8x8 z-blocks: the rectangle is exactly one block.
    assert frac_z < 0.3, frac_z
    # query on the NON-bucketed column alone: x-bucketing reads
    # everything, z-order keeps pruning power on BOTH dimensions.
    frac_y_base = pruning_fraction(base, {"y": (0, 3)})
    frac_y_z = pruning_fraction(zm, {"y": (0, 3)})
    assert frac_y_base > 0.9, frac_y_base
    assert frac_y_z < 0.6, frac_y_z
    assert frac_y_z < frac_y_base


def test_zone_maps_cover_all_rows(spark):
    df = _grid(spark)
    zed = zorder_layout(df, ["x", "y"], n_files=16, bits=5)
    zm = zone_maps(zed, ["x", "y"]).collect()
    assert sum(r["n_rows"] for r in zm) == df.count()
    assert all(r["min_x"] <= r["max_x"] and r["min_y"] <= r["max_y"]
               for r in zm)


def test_frozen_bounds_match_auto(spark):
    df = _grid(spark)
    auto_df, bounds = zorder_key_auto(df, ["x", "y"], bits=5)
    qs = [
        quantize_minmax(F.col(c), bounds[c][0], bounds[c][1], 5)
        for c in ("x", "y")
    ]
    manual = df.withColumn("zkey", zorder_key(qs, 5))
    assert sorted(map(tuple, auto_df.collect())) == sorted(
        map(tuple, manual.collect())
    )


def test_quantize_out_of_bounds_raises(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(Exception, match="outside"):
        ev.select(
            quantize_minmax(F.col("user_id"), 0, 10, 8).alias("q")
        ).collect()


def test_validation_contracts(spark):
    with pytest.raises(ValueError, match="hi .* < lo"):
        quantize_minmax(F.col("x"), 10, 5, 8)
    with pytest.raises(ValueError, match="exact-double"):
        quantize_minmax(F.col("x"), 0, 2**50, 10)
    with pytest.raises(ValueError, match=">= 63"):
        zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=21)
    with pytest.raises(ValueError, match="at least one column"):
        zorder_key([], bits=8)


def test_non_integral_column_rejected(spark):
    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="not integral"):
        zorder_key_auto(ev, ["value"], bits=8)


def test_balanced_layout_buckets(spark):
    """KLL-boundary buckets: row counts near-balanced (within the
    sketch's rank budget), assignment deterministic given boundaries,
    and exact-SQL reproducible."""
    import math

    from kafka_avro_order_processing_spark.operators.zorder import (
        kll_range_boundaries,
        range_bucket,
        zorder_layout_balanced,
    )

    df = _grid(spark)
    out = zorder_layout_balanced(df, ["x", "y"], n_files=8, bits=5, k=128)
    counts = {
        r["zbucket"]: r["n"]
        for r in out.groupBy("zbucket").agg(F.count("*").alias("n")).collect()
    }
    n = df.count()
    ideal = n / 8
    budget = n * math.log2(max(n / 128, 2)) / 128 + 1
    assert set(counts) == set(range(8)), counts
    assert all(abs(c - ideal) <= 2 * budget + 8 for c in counts.values()), (
        counts,
        ideal,
        budget,
    )
    # determinism: same boundaries -> identical assignment
    zdf, _ = zorder_key_auto(df, ["x", "y"], bits=5)
    bounds = kll_range_boundaries(zdf, "zkey", 8, k=128)
    a = zdf.withColumn("b", range_bucket(F.col("zkey"), bounds))
    s1 = sorted(map(tuple, a.collect()))
    s2 = sorted(map(tuple, a.collect()))
    assert s1 == s2
    # exact DuckDB parity of the bucket function over literal bounds
    import duckdb

    con = duckdb.connect()
    zvals = [r["zkey"] for r in zdf.select("zkey").collect()]
    con.execute("CREATE TABLE z AS SELECT * FROM (VALUES "
                + ",".join(f"({v})" for v in zvals[:500]) + ") t(zkey)")
    case = " + ".join(
        f"CASE WHEN {b} <= CAST(zkey AS DOUBLE) THEN 1 ELSE 0 END"
        for b in bounds
    )
    want = dict(con.execute(f"SELECT zkey, {case} FROM z").fetchall())
    got = {
        r["zkey"]: r["b"]
        for r in a.select("zkey", "b").limit(0).unionByName(
            a.select("zkey", "b")
        ).collect()
    }
    assert all(got[zv] == want[zv] for zv in list(want)[:500])


def test_balanced_layout_validation(spark):
    from kafka_avro_order_processing_spark.operators.zorder import (
        kll_range_boundaries,
        range_bucket,
    )

    with pytest.raises(ValueError, match="n_buckets >= 2"):
        kll_range_boundaries(_grid(spark), "x", 1)
    with pytest.raises(ValueError, match="ascending"):
        range_bucket(F.col("x"), [3.0, 1.0])
    with pytest.raises(ValueError, match="at least one boundary"):
        range_bucket(F.col("x"), [])
