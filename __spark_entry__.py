"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``kafka_avro_order_processing_spark.plans.registry``:
- ``entry(spark)`` — flagship query (TPC-H-style pricing summary) at
  sf0.001, smoke-checked by the driver.
- ``queries()`` — one named callable per implemented operator from
  SURVEY.md §2 (+ M5 extensions).
- ``oracle_sql()`` — matching DuckDB-runnable ANSI SQL per query.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

# Make the package importable when the driver runs this file from /root/repo.
_REPO = str(Path(__file__).resolve().parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kafka_avro_order_processing_spark.plans.registry import (  # noqa: E402
    get_oracles,
    get_queries,
)

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return get_queries()["pricing_summary"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return get_queries()


def oracle_sql() -> dict[str, str]:
    return get_oracles()
