"""Repo-wide physical-plan invariants over the registered queries.

The engine's standing rules (SCALE.md): no row-at-a-time Python UDFs
anywhere in a registered plan (Python crossings must be Arrow-batched
— ArrowEvalPython / MapInPandas / custom DataSource scans), and no
unbounded CartesianProduct (cross joins must be broadcast
nested-loop over singleton sides).  Previously these were manual
audits; this pins them in the suite so a future plan change cannot
regress silently.

Streaming-tagged queries are skipped here: their functions RUN a
drain to produce the result table (their plan shape is pinned by the
dedicated streaming tests), while batch plans can be explained
cheaply.
"""

from __future__ import annotations

import contextlib
import io
import os

import pytest

from kafka_avro_order_processing_spark.plans.registry import QUERIES

SF_DIR = os.environ.get("PARITY_SF_DIR", "/root/testdata/sf0.001")

BATCH_NAMES = [
    n for n, q in QUERIES.items() if "streaming" not in q.tags
]


def _plan_of(spark, name: str) -> str:
    df = QUERIES[name].fn(spark, SF_DIR)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.mark.parametrize("name", BATCH_NAMES)
def test_no_row_wise_python_udf_or_cartesian(spark, name):
    plan = _plan_of(spark, name)
    # BatchEvalPython = row-at-a-time Python UDF (pickled row loop);
    # the allowed Python crossings surface as ArrowEvalPython /
    # MapInPandas / FlatMapGroupsInPandas / PythonDataSource scans.
    assert "BatchEvalPython" not in plan, f"{name} uses a row-wise Python UDF"
    assert "CartesianProduct" not in plan, (
        f"{name} has an unbounded cartesian join (broadcast the singleton side)"
    )


#: queries whose FIRST operation is a selective filter on a base-table
#: column — the filter must reach the parquet scan as a pushed
#: predicate, or at 100 TB the scan reads the whole table to drop most
#: of it afterwards.
PUSHDOWN_CASES = {
    "pricing_summary": "l_shipdate",        # date cutoff on lineitem
    "shipping_priority": "o_orderdate",     # date bound on orders
    "purchase_avg_lookup": "event_type",    # single-key point lookup
}


@pytest.mark.parametrize("name", sorted(PUSHDOWN_CASES))
def test_selective_filters_reach_the_scan(spark, name):
    plan = _plan_of(spark, name)
    col = PUSHDOWN_CASES[name]
    scans = [p for p in plan.split("\n\n") if "PushedFilters" in p]
    assert any(
        col in s.split("PushedFilters", 1)[1].split("\n", 1)[0] for s in scans
    ), f"{name}: filter on {col} not pushed to the scan\n{plan}"
