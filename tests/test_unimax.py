"""UniMax mixture allocation (operators/mixture.py, Chung et al. ICLR
2023): water-filling invariants vs a Python reference, epoch-cap
binding, budget-exceeds-capacity saturation, token-weighted sizing,
deterministic application, and loud validation.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.mixture import (
    apply_mixture_rates,
    unimax_rates,
)

# (domain, n_docs): one giant head, a middle, two tails
SIZES = {"en": 1000, "fr": 200, "sw": 20, "yo": 5}


def _frame(spark):
    rows = [
        (f"{d}-{i}", d) for d, n in SIZES.items() for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id string, domain string")


def _ref_unimax(sizes, budget, c):
    order = sorted(sizes, key=lambda d: (c * sizes[d], d))
    remaining = float(budget)
    alloc = {}
    for idx, d in enumerate(order):
        share = remaining / (len(order) - idx)
        alloc[d] = min(c * sizes[d], share)
        remaining -= alloc[d]
    return alloc


def test_matches_reference_and_water_filling(spark):
    df = _frame(spark)
    budget, c = 600, 2.0
    got = {r["domain"]: r for r in unimax_rates(df, "domain", budget, c).collect()}
    ref = _ref_unimax(SIZES, budget, c)
    for d, b in ref.items():
        assert got[d]["budget"] == pytest.approx(b, rel=1e-12)
        assert got[d]["epochs"] == pytest.approx(b / SIZES[d], rel=1e-12)
        assert got[d]["rate"] == pytest.approx(min(1.0, b / SIZES[d]), rel=1e-12)
    # full budget spent (capacity 2450 > 600)
    assert sum(r["budget"] for r in got.values()) == pytest.approx(budget)
    # water-filling: every uncapped domain gets the SAME share, and no
    # capped domain exceeds its capacity
    uncapped = [r["budget"] for r in got.values() if r["epochs"] < c - 1e-9]
    assert max(uncapped) - min(uncapped) < 1e-9
    for r in got.values():
        assert r["budget"] <= c * r["n"] + 1e-9
    # tails are repeated up to the cap: yo (5 docs) absorbs 2 epochs
    assert got["yo"]["epochs"] == pytest.approx(c)
    assert got["yo"]["rate"] == 1.0  # one-pass keep-all, loader repeats


def test_budget_exceeds_capacity_saturates(spark):
    df = _frame(spark)
    c = 1.5
    cap = c * sum(SIZES.values())
    got = {r["domain"]: r for r in unimax_rates(df, "domain", 10**9, c).collect()}
    assert sum(r["budget"] for r in got.values()) == pytest.approx(cap)
    for d, n in SIZES.items():
        assert got[d]["epochs"] == pytest.approx(c)


def test_token_weighted_sizing(spark):
    rows = [("a", "en", 100), ("b", "en", 300), ("c", "sw", 50)]
    df = spark.createDataFrame(rows, "doc_id string, domain string, n_tokens long")
    got = {
        r["domain"]: r
        for r in unimax_rates(
            df, "domain", 200, max_epochs=1.0, size_col="n_tokens"
        ).collect()
    }
    # sizes are token sums: en=400, sw=50; sw caps at 50, en takes 150
    assert got["sw"]["n"] == 50 and got["en"]["n"] == 400
    assert got["sw"]["budget"] == pytest.approx(50.0)
    assert got["en"]["budget"] == pytest.approx(150.0)


def test_apply_is_deterministic_and_rate_shaped(spark):
    df = _frame(spark)
    rates = unimax_rates(df, "domain", 600, 2.0)
    kept1 = sorted(r["doc_id"] for r in apply_mixture_rates(df, rates, "domain").collect())
    kept2 = sorted(r["doc_id"] for r in apply_mixture_rates(df, rates, "domain").collect())
    assert kept1 == kept2  # salted-md5 buckets: rerun-stable
    # every rate-1.0 domain is kept in full
    by_dom = {
        r["domain"]: r["n_kept"]
        for r in apply_mixture_rates(df, rates, "domain")
        .groupBy("domain")
        .agg(F.count(F.lit(1)).alias("n_kept"))
        .collect()
    }
    full = {r["domain"] for r in rates.filter(F.col("rate") >= 1.0).collect()}
    for d in full:
        assert by_dom[d] == SIZES[d]


def test_validation(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="budget"):
        unimax_rates(df, "domain", 0)
    with pytest.raises(ValueError, match="max_epochs"):
        unimax_rates(df, "domain", 10, max_epochs=0)
    withnull = spark.createDataFrame(
        [("a", None), ("b", "en")], "doc_id string, domain string"
    )
    with pytest.raises(ValueError, match="NULL domain"):
        unimax_rates(withnull, "domain", 10)
    empty = spark.createDataFrame([], "doc_id string, domain string")
    with pytest.raises(ValueError, match="no domains"):
        unimax_rates(empty, "domain", 10)


def test_apply_mixture_rates_streams_bit_match(spark, tmp_path):
    """apply_mixture_rates is a broadcast join + map-side hash filter —
    stateless, so the SAME plan runs on a stream: documents kept at
    ingest are EXACTLY the batch keep-set (frozen rates, the
    streaming_ccnet_buckets pattern)."""
    from kafka_avro_order_processing_spark.streaming.pipeline import drain_to_df

    df = _frame(spark)
    rates = unimax_rates(df, "domain", 600, 2.0).localCheckpoint(eager=True)
    d = str(tmp_path / "docs")
    df.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema("doc_id string, domain string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    want = sorted(
        tuple(r) for r in apply_mixture_rates(df, rates, "domain").collect()
    )
    got = sorted(
        tuple(r)
        for r in drain_to_df(
            apply_mixture_rates(stream, rates, "domain"), "append"
        ).collect()
    )
    assert got == want
