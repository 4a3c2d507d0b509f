"""UDF extension surface (SURVEY.md §2.10): scalar pandas UDFs
(Arrow-vectorized), SQL-registered functions, and grouped-map
applyInPandas — the sanctioned escape hatches when column expressions
can't express the semantics."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T


def test_scalar_pandas_udf(spark):
    @F.pandas_udf(T.DoubleType())
    def price_with_tax(price: pd.Series) -> pd.Series:
        return price * 1.19

    df = spark.createDataFrame([(100.0,), (10.0,)], "price double")
    got = sorted(r[0] for r in df.select(price_with_tax("price")).collect())
    assert got == pytest.approx([11.9, 119.0])


def test_sql_registered_udf(spark):
    @F.pandas_udf(T.StringType())
    def classify_price(price: pd.Series) -> pd.Series:
        return pd.Series(pd.cut(price, [0, 50, 500, float("inf")],
                                labels=["budget", "mid", "premium"]).astype(str))

    spark.udf.register("classify_price", classify_price)
    spark.createDataFrame([(10.0,), (100.0,), (1000.0,)], "price double") \
        .createOrReplaceTempView("udf_prices")
    rows = spark.sql(
        "SELECT classify_price(price) AS tier FROM udf_prices ORDER BY price"
    ).collect()
    assert [r["tier"] for r in rows] == ["budget", "mid", "premium"]


def test_grouped_map_apply_in_pandas(spark):
    """Per-group normalization — the grouped-map form of the extension
    surface (the PriceAggregator-style custom per-key logic slot)."""

    def center(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf["centered"] = pdf["price"] - pdf["price"].mean()
        return pdf

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 10.0)], "key string, price double"
    )
    out = df.groupBy("key").applyInPandas(
        center, schema="key string, price double, centered double"
    )
    got = {(r["key"], r["price"]): r["centered"] for r in out.collect()}
    assert got == {("a", 1.0): -1.0, ("a", 3.0): 1.0, ("b", 10.0): 0.0}
