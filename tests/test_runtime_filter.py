"""Runtime-filter pruning: when the dim side of a selective join is
too big to broadcast (the 100 TB case), Spark should build a bloom
filter from the dim side's join keys at runtime and push it into the
fact scan — rows that can't match never reach the shuffle.  This
pins that the engine's session/query shape actually triggers the
optimization (spark.sql.optimizer.runtime.bloomFilter.*), not just
that the conf exists."""

from __future__ import annotations

import contextlib
import io

import pytest

from kafka_avro_order_processing_spark.plans.registry import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@contextlib.contextmanager
def _confs(spark, **kv):
    old = {}
    for k, v in kv.items():
        key = k.replace("__", ".")
        old[key] = spark.conf.get(key, None)
        spark.conf.set(key, v)
    try:
        yield
    finally:
        for key, v in old.items():
            if v is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, v)


def _formatted_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_bloom_filter_injects_under_shuffle_join(spark):
    """Force the shuffle-join regime a 100 TB dim side lives in
    (broadcast off, injection thresholds at zero — at real scale the
    default 10 MB/10 GB thresholds pass on their own) and assert the
    bloom filter lands in the fact side of the plan."""
    with _confs(
        spark,
        spark__sql__autoBroadcastJoinThreshold="-1",
        spark__sql__optimizer__runtime__bloomFilter__enabled="true",
        # creationSideThreshold is a MAX (dim side must be small enough
        # to build the filter cheaply — default 10MB already passes);
        # applicationSideScanSizeThreshold is a MIN (fact side must be
        # big enough to be worth filtering — default 10GB, zeroed so
        # the test-scale fact qualifies like a 100 TB one would).
        spark__sql__optimizer__runtime__bloomFilter__applicationSideScanSizeThreshold="0",
    ):
        df = QUERIES["runtime_filtered_join"].fn(spark, SF_DIR)
        plan = _formatted_plan(df)
        assert "bloomfilter" in plan.lower() or "might_contain" in plan.lower(), plan
        # and the result is still right (count spot-check vs defaults)
        forced = sorted((r["priority"], r["n_orders"]) for r in df.collect())
    default = sorted(
        (r["priority"], r["n_orders"])
        for r in QUERIES["runtime_filtered_join"].fn(spark, SF_DIR).collect()
    )
    assert forced == default


def test_default_plan_broadcasts_tiny_dim(spark):
    """At test SF the dim side is KB-sized; the right plan is a
    broadcast join (no shuffle of the fact table at all)."""
    plan = _formatted_plan(QUERIES["runtime_filtered_join"].fn(spark, SF_DIR))
    assert "BroadcastHashJoin" in plan or "broadcast" in plan.lower()
