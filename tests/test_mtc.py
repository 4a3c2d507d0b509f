"""Multiple-testing corrections (operators/mtc.py): exact DuckDB
oracle parity for BH/Holm/Bonferroni over hash-derived p-values on
events (grouped families), hand-computed textbook values, tie
stability, the power ordering (Bonferroni ⊆ Holm ⊆ BH rejections),
and loud invalid-p rejection."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.operators.kmv import KMV_SPACE, kmv_hash
from kafka_avro_order_processing_spark.operators.mtc import (
    bh_adjust,
    bonferroni_adjust,
    holm_adjust,
)
from kafka_avro_order_processing_spark.sources.tables import load_table


def _pframe(spark, sf=SF_DIR):
    """~100 hypotheses per event_type family: p = h52(event_id)/2^52
    (an exact double both engines reproduce)."""
    ev = load_table(spark, sf, "events").filter(F.col("event_id") % 97 == 0)
    return ev.select(
        "event_id",
        "event_type",
        (kmv_hash(F.col("event_id")).cast("double") / F.lit(float(KMV_SPACE))
         ).alias("p"),
    )


_P_CTE_HEAD = """
    WITH pf AS (
      SELECT event_id, event_type,
             CAST(({h}) AS DOUBLE) / {den} AS p
      FROM events WHERE event_id % 97 = 0
    ), r AS (
      SELECT *, CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS m,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY p) AS rn
      FROM pf
    )
"""


def _cte() -> str:
    h = "md5('kmv:' || CAST(event_id AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    return _P_CTE_HEAD.format(h=terms, den=float(KMV_SPACE))


def test_bh_duckdb_oracle(spark):
    sdf = bh_adjust(_pframe(spark), "p", by=["event_type"], alpha=0.2)
    sql = _cte() + """
    SELECT event_id, event_type, p, m,
           LEAST(1.0, MIN((p * m) / rn) OVER (
             PARTITION BY event_type ORDER BY rn DESC
             ROWS UNBOUNDED PRECEDING)) AS p_adj,
           LEAST(1.0, MIN((p * m) / rn) OVER (
             PARTITION BY event_type ORDER BY rn DESC
             ROWS UNBOUNDED PRECEDING)) <= 0.2 AS reject
    FROM r
    """
    _assert_parity(sdf, sql)


def test_holm_duckdb_oracle(spark):
    sdf = holm_adjust(_pframe(spark), "p", by=["event_type"], alpha=0.2)
    sql = _cte() + """
    SELECT event_id, event_type, p, m,
           LEAST(1.0, MAX(p * (m - rn + 1)) OVER (
             PARTITION BY event_type ORDER BY rn
             ROWS UNBOUNDED PRECEDING)) AS p_adj,
           LEAST(1.0, MAX(p * (m - rn + 1)) OVER (
             PARTITION BY event_type ORDER BY rn
             ROWS UNBOUNDED PRECEDING)) <= 0.2 AS reject
    FROM r
    """
    _assert_parity(sdf, sql)


def test_bonferroni_duckdb_oracle(spark):
    sdf = bonferroni_adjust(_pframe(spark), "p", by=["event_type"])
    sql = _cte() + """
    SELECT event_id, event_type, p, m,
           LEAST(1.0, p * m) AS p_adj,
           LEAST(1.0, p * m) <= 0.05 AS reject
    FROM r
    """
    _assert_parity(sdf, sql)


def _textbook(spark):
    return spark.createDataFrame(
        [Row(h=i, p=p) for i, p in enumerate([0.01, 0.02, 0.03, 0.04, 0.05])]
    )


def test_textbook_values(spark):
    bh = {r["h"]: r["p_adj"] for r in
          bh_adjust(_textbook(spark), "p").collect()}
    assert all(abs(v - 0.05) < 1e-12 for v in bh.values()), bh
    holm = {r["h"]: r["p_adj"] for r in
            holm_adjust(_textbook(spark), "p").collect()}
    assert [round(holm[i], 10) for i in range(5)] == [
        0.05, 0.08, 0.09, 0.09, 0.09
    ]
    bonf = {r["h"]: r["p_adj"] for r in
            bonferroni_adjust(_textbook(spark), "p").collect()}
    assert [round(bonf[i], 10) for i in range(5)] == [
        0.05, 0.1, 0.15, 0.2, 0.25
    ]


def test_tie_stability(spark):
    df = spark.createDataFrame(
        [Row(h=i, p=p) for i, p in
         enumerate([0.01, 0.02, 0.02, 0.02, 0.8])]
    )
    for fn in (bh_adjust, holm_adjust):
        out = fn(df, "p").collect()
        tied = {r["p_adj"] for r in out if r["p"] == 0.02}
        assert len(tied) == 1, (fn.__name__, out)


def test_power_ordering(spark):
    pf = _pframe(spark)
    nrej = lambda d: d.filter("reject").count()
    a = 0.3
    bonf = nrej(bonferroni_adjust(pf, "p", by=["event_type"], alpha=a))
    holm = nrej(holm_adjust(pf, "p", by=["event_type"], alpha=a))
    bh = nrej(bh_adjust(pf, "p", by=["event_type"], alpha=a))
    assert bonf <= holm <= bh
    assert bh > 0  # the band is wide enough to reject something


def test_invalid_p_raises(spark):
    df = spark.createDataFrame([Row(h=1, p=0.5), Row(h=2, p=1.5)])
    with pytest.raises(Exception, match="invalid p-value"):
        bh_adjust(df, "p").collect()
    df2 = spark.createDataFrame(
        [Row(h=1, p=0.5), Row(h=2, p=None)], "h int, p double"
    )
    with pytest.raises(Exception, match="invalid p-value"):
        holm_adjust(df2, "p").collect()
