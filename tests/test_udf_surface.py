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


def test_map_in_arrow(spark):
    # mapInArrow: the zero-copy batch surface (RecordBatch in/out, no
    # pandas conversion) — compute L2 norms with pyarrow compute and
    # match the codegen'd expression form exactly.
    import pyarrow as pa
    import pyarrow.compute as pc

    from kafka_avro_order_processing_spark.operators.similarity import with_norm
    from kafka_avro_order_processing_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")

    def norms(batches):
        for batch in batches:
            tbl = pa.Table.from_batches([batch])
            vals = tbl.column("embedding").combine_chunks()
            out = []
            for i in range(len(vals)):
                v = vals[i].as_py()
                acc = 0.0
                for x in v:  # same sequential fold as the expression
                    acc += float(x) * float(x)
                out.append(acc ** 0.5)
            yield pa.RecordBatch.from_arrays(
                [tbl.column("vec_id").combine_chunks(), pa.array(out, pa.float64())],
                names=["vec_id", "norm"],
            )

    got = {
        r["vec_id"]: r["norm"]
        for r in emb.mapInArrow(norms, "vec_id long, norm double").collect()
    }
    want = {r["vec_id"]: r["norm"] for r in with_norm(emb).select("vec_id", "norm").collect()}
    assert got == want  # bit-exact: identical fold order


def test_apply_in_arrow(spark):
    # applyInArrow: grouped Arrow-native aggregation; integer sums so
    # the comparison with the expression form is exact.
    import pyarrow as pa
    import pyarrow.compute as pc
    from pyspark.sql import functions as F

    from kafka_avro_order_processing_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "event_type", "event_id"
    )

    def per_group(key, tbl):
        return pa.Table.from_pydict(
            {
                "event_type": [key[0].as_py()],
                "n": [tbl.num_rows],
                "id_sum": [pc.sum(tbl.column("event_id")).as_py()],
            },
            schema=pa.schema(
                [("event_type", pa.string()), ("n", pa.int64()), ("id_sum", pa.int64())]
            ),
        )

    got = sorted(
        tuple(r)
        for r in ev.groupBy("event_type")
        .applyInArrow(per_group, "event_type string, n long, id_sum long")
        .collect()
    )
    want = sorted(
        tuple(r)
        for r in ev.groupBy("event_type")
        .agg(F.count("*").alias("n"), F.sum("event_id").alias("id_sum"))
        .collect()
    )
    assert got == want
