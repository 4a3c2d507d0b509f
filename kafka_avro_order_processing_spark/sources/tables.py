"""Parquet table catalog for the driver testdata.

Batch twin of the reference's Kafka sources (SURVEY.md §2.1 S4/S6):
where the reference polls topics, we scan columnar parquet — filters and
projections push down to the scan (Catalyst), so at 100 TB a query that
touches 2 columns reads 2 columns.

The only quirk handled here: ``events.ts`` is written as parquet
INT64 TIMESTAMP(NANOS), which Spark reads only as a raw long under
``spark.sql.legacy.parquet.nanosAsLong``; we convert to timestamp_ntz
(microsecond floor — same truncation DuckDB applies when casting its
TIMESTAMP_NS to TIMESTAMP, keeping oracle comparisons exact).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..session import ensure_confs

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing types.

    - ``events.ts``: nanos-long -> timestamp_ntz (µs floor).
    - everything else: as stored (TIMESTAMP_NTZ / DOUBLE / VARCHAR ...).
    """
    ensure_confs(spark)
    df = spark.read.parquet(f"{sf_dir.rstrip('/')}/{name}.parquet")
    if name == "events" and isinstance(df.schema["ts"].dataType, T.LongType):
        df = df.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")).cast("timestamp_ntz")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view (SQL entry path)."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
