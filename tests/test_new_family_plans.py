"""Physical-plan invariants for the session's sketch/sample/layout
families: the scale arguments in their docstrings must be visible in
`.explain("formatted")` — global top-k compiles to
TakeOrderedAndProject (never a global Sort+Exchange of data rows),
the heavy-hitter recount broadcasts the candidate side, pass-1 MG is
exchange-free, and nothing row-wise-Python or Cartesian sneaks in."""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR

from kafka_avro_order_processing_spark.operators.heavy import (
    heavy_hitters,
    mg_candidates,
)
from kafka_avro_order_processing_spark.operators.kll import kll_sketch
from kafka_avro_order_processing_spark.operators.kmv import kmv_sketch
from kafka_avro_order_processing_spark.operators.sampling import (
    priority_sample,
)
from kafka_avro_order_processing_spark.sources.tables import load_table


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _events(spark):
    return load_table(spark, SF_DIR, "events")


def _node_ids(plan: str, op: str) -> list[int]:
    """Operator ids from the formatted tree (ids grow from the scan
    UP toward the sink, so 'below' means a smaller id)."""
    return [int(m) for m in re.findall(rf"{op}(?:\w*)? \((\d+)\)", plan)]


def test_global_kmv_is_take_ordered(spark):
    plan = _plan(kmv_sketch(_events(spark), "user_id", k=32))
    assert "TakeOrderedAndProject" in plan, plan
    # no global single-partition Sort of data rows anywhere
    assert "Sort (" not in plan, plan


def test_global_priority_sample_is_take_ordered(spark):
    df = _events(spark).filter(F.col("value") > 0).select(
        "event_id", "value"
    )
    plan = _plan(priority_sample(df, "event_id", "value", k=25))
    assert "TakeOrderedAndProject" in plan, plan


def test_mg_candidates_pass_is_exchange_free(spark):
    """Pass 1 is map-only: the only exchange allowed is the final
    tiny distinct over <= k*P candidate keys."""
    plan = _plan(mg_candidates(_events(spark), "event_type", k=5))
    map_ids = _node_ids(plan, "MapInPandas")
    ex_ids = _node_ids(plan, "Exchange")
    assert map_ids, plan  # the MG fold is in the plan
    # every exchange sits ABOVE the fold (bigger id): only candidate
    # keys shuffle, never data rows
    assert all(e > max(map_ids) for e in ex_ids), plan


def test_heavy_hitters_recount_broadcasts_candidates(spark):
    plan = _plan(heavy_hitters(_events(spark), "event_type", k=5))
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_kll_pass1_is_map_only(spark):
    """No exchange below the sketch fold: raw rows never shuffle."""
    plan = _plan(kll_sketch(_events(spark), "value", k=64))
    map_ids = _node_ids(plan, "MapInPandas")
    ex_ids = _node_ids(plan, "Exchange")
    assert map_ids, plan
    assert all(e > min(map_ids) for e in ex_ids), plan


def test_no_row_wise_python_or_cartesian_anywhere(spark):
    ev = _events(spark)
    frames = [
        kmv_sketch(ev, "user_id", k=32, by=["event_type"]),
        heavy_hitters(ev, "event_type", k=5),
        priority_sample(
            ev.filter(F.col("value") > 0).select(
                "event_type", "event_id", "value"
            ),
            "event_id",
            "value",
            k=10,
            by=["event_type"],
        ),
        kll_sketch(ev, "value", k=64, by=["event_type"]),
    ]
    for df in frames:
        plan = _plan(df)
        assert "BatchEvalPython" not in plan, plan
        assert "CartesianProduct" not in plan, plan


def test_stratified_sample_broadcasts_allocation(spark):
    from kafka_avro_order_processing_spark.operators.sampling import (
        stratified_priority_sample,
    )

    ev = _events(spark).filter(F.col("value") > 0).select(
        "event_type", "event_id", "value"
    )
    alloc = [("view", 100, 5), ("click", 100, 5), ("purchase", 100, 5)]
    plan = _plan(
        stratified_priority_sample(ev, "event_id", "value", "event_type",
                                   alloc)
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan, plan


def test_bloom_probe_broadcasts_filter(spark):
    from kafka_avro_order_processing_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
    )

    ev = _events(spark)
    bloom = bloom_build(ev, "user_id", 4096, 5)
    plan = _plan(
        bloom_might_contain(ev.select("user_id"), bloom, "user_id", 4096, 5)
    )
    assert "BroadcastHashJoin" in plan, plan
    assert "BatchEvalPython" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_qte_plan_partitions_window_by_arm_and_stays_jvm_side(spark):
    """quantile_treatment_effects' cumulative window must stay
    PARTITIONED BY ARM (two tasks — the docstring's bound; a silent
    de-partitioning funnels the whole frame through one task for no
    semantic gain), and the whole plan must stay JVM-side with no
    Cartesian product (the ppm explode is a column-wise generator,
    not a join)."""
    from kafka_avro_order_processing_spark.operators.abtest import (
        quantile_treatment_effects,
    )

    df = _events(spark).filter("value IS NOT NULL").select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") % 13).cast("double").alias("y"),
    )
    plan = _plan(
        quantile_treatment_effects(df, "y", "arm", ppms=(500_000,))
    )
    # every window definition's partition spec (the trailing [cols]
    # list) must key on arm — a de-partitioned window shows [] there
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs, "no window definitions found in the QTE plan"
    assert all(s == "arm" for s in specs), specs
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_qte_cis_plan_contract(spark):
    """quantile_treatment_effect_cis shares QTE's plan contract: the
    cumulative window keys on arm, the rank table joins BROADCAST
    (O(arms x ppms) driver rows — never a shuffle), and the plan
    stays JVM-side with no Cartesian product."""
    from kafka_avro_order_processing_spark.operators.abtest import (
        quantile_treatment_effect_cis,
    )

    df = _events(spark).filter("value IS NOT NULL").select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        (F.col("value") % 13).cast("double").alias("y"),
    )
    plan = _plan(
        quantile_treatment_effect_cis(df, "y", "arm", ppms=(500_000,))
    )
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs, "no window definitions found in the QTE-CI plan"
    assert all(s == "arm" for s in specs), specs
    assert "BroadcastHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_robust_readout_windows_partition_by_arm(spark):
    """winsorized_ab_test / trimmed_mean_ab_test share QTE's plan
    contract: their cumulative/count windows key on arm (two tasks
    over the bounded bucket frame — never a partition-less funnel),
    and the plans stay JVM-side.  Pinned on the count-table stage the
    dict readouts are built from."""
    from kafka_avro_order_processing_spark.operators.abtest import (
        _arm_checked,
        _q_expr,
    )

    df = _events(spark).filter("value IS NOT NULL")
    counts = (
        df.select(
            _arm_checked("event_type", "pin").alias("arm"),
            _q_expr("value", 10, "pin").alias("v"),
        )
        .groupBy("arm", "v")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    from pyspark.sql import Window

    w_cum = Window.partitionBy("arm").orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_arm = Window.partitionBy("arm")
    staged = counts.withColumn(
        "cw", F.sum("c").over(w_cum).cast("long")
    ).withColumn("n", F.sum("c").over(w_arm).cast("long"))
    plan = _plan(staged)
    specs = re.findall(r"windowspecdefinition\((\w+)#", plan)
    assert specs and all(s == "arm" for s in specs), specs
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
