"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

`value` is the total wall-clock over all benched queries (excluding
session startup and a warm-up action).  Each query is collected fully
(count() after a collect-less materialization would let lazy plans
hide work, so we force the whole result).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_avro_order_processing_spark import get_spark  # noqa: E402
from kafka_avro_order_processing_spark.plans.registry import QUERIES  # noqa: E402

# Headline set: the reference-parity core + the heavy M5 operators.
BENCH_QUERIES = [
    "per_product_stats",
    "overall_stats",
    "running_avg",
    "validated_orders",
    "pricing_summary",
    "top_customers",
    "revenue_by_region",
    "events_hourly",
    "user_sessions",
    "top3_events_per_type",
    "doc_token_stats",
    "token_counts_top20",
    "dedup_exact",
    "near_dup_pairs",
    "simhash_fingerprints",
    "embedding_topk",
    "asof_purchase_click",
    "priority_line_revenue",
    "tfidf_top_terms",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="kaop-bench")

    # Warm iteration (not timed): JVM/codegen warm-up + OS page cache
    # for the inputs — we measure engine steady state, not cold start.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in BENCH_QUERIES:
        QUERIES[name].fn(spark, sf_dir).collect()
        spark.catalog.clearCache()  # operators persist intermediates; don't let runs accumulate

    # min of 2 timed runs per query (3 when the first two disagree by
    # >25% — host-level noisy-neighbor contention produces exactly that
    # signature): steady-state engine cost, robust to one-off
    # GC/compilation hiccups.  The per-query [min, max] spread across
    # the timed runs is reported alongside so a reader can separate
    # plan regressions from sandbox noise (a wide spread on an
    # untouched query is environment, not code).
    timings: dict[str, float] = {}
    spread: dict[str, list[float]] = {}
    for name in BENCH_QUERIES:
        fn = QUERIES[name].fn
        runs: list[float] = []
        while len(runs) < 2 or (
            len(runs) < 3 and max(runs) > 1.25 * min(runs)
        ):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
            del rows
            spark.catalog.clearCache()
        timings[name] = round(min(runs), 3)
        spread[name] = [round(min(runs), 3), round(max(runs), 3)]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "spread": spread,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
