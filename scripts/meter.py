"""Deterministic per-query run metrics for optimization work.

Wall-clock on this shared host swings up to ~6x between contention
bands (even executorCpuTime inflates ~3x), so optimization decisions
are ranked by the DETERMINISTIC plan metrics this meter reports —
jobs / stages / tasks / shuffle bytes — with CPU and wall (min over
repeats) as corroboration only.  Used throughout the r13 optimization
round (OPTIMIZATION_r13.md); kept for the next one.

Usage:
    python scripts/meter.py [query ...]        # default: the bench set

Requires nothing beyond the repo: it enables the UI on port 4099 for
its own session and reads the status REST API.
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kafka_avro_order_processing_spark import get_spark  # noqa: E402

UI_PORT = 4099


def make_session(extra: dict | None = None):
    conf = {"spark.ui.enabled": "true", "spark.ui.port": str(UI_PORT)}
    conf.update(extra or {})
    return get_spark(app_name="meter", extra_conf=conf)


def _api(path: str):
    with urllib.request.urlopen(f"http://localhost:{UI_PORT}/api/v1/{path}") as r:
        return json.loads(r.read())


class Meter:
    """measure(label, thunk, n) -> best-wall record with job/stage/task/
    CPU/shuffle totals for that execution (SKIPPED stages excluded)."""

    def __init__(self, spark):
        self.spark = spark
        self.app = _api("applications")[0]["id"]

    def measure(self, label: str, thunk, n: int = 3) -> dict:
        sc = self.spark.sparkContext
        best = None
        for it in range(n):
            g = f"{label}-{it}"
            sc.setJobGroup(g, label)
            t0 = time.perf_counter()
            thunk()
            wall = time.perf_counter() - t0
            sc.setJobGroup(None, None)
            self.spark.catalog.clearCache()
            jobs = [j for j in _api(f"applications/{self.app}/jobs")
                    if j.get("jobGroup") == g]
            stage_ids = sorted({s for j in jobs for s in j["stageIds"]})
            run = cpu = tasks = sread = swrite = 0
            for sid in stage_ids:
                for att in _api(f"applications/{self.app}/stages/{sid}"):
                    if att.get("status") == "SKIPPED":
                        continue
                    run += att.get("executorRunTime", 0)
                    cpu += att.get("executorCpuTime", 0) // 1_000_000
                    tasks += att.get("numCompleteTasks", 0)
                    sread += att.get("shuffleReadBytes", 0)
                    swrite += att.get("shuffleWriteBytes", 0)
            rec = dict(label=label, wall=round(wall, 3), jobs=len(jobs),
                       stages=len(stage_ids), tasks=tasks, runMs=run,
                       cpuMs=cpu, shufR=sread, shufW=swrite)
            if best is None or rec["wall"] < best["wall"]:
                best = rec
        print(f"{best['label']:42s} wall={best['wall']:7.3f} jobs={best['jobs']:3d} "
              f"stages={best['stages']:3d} tasks={best['tasks']:5d} "
              f"run={best['runMs']:6d}ms cpu={best['cpuMs']:6d}ms "
              f"shufW={best['shufW']:>10d}")
        return best


BENCH = [
    "per_product_stats", "overall_stats", "running_avg", "validated_orders",
    "pricing_summary", "top_customers", "revenue_by_region", "events_hourly",
    "user_sessions", "top3_events_per_type", "doc_token_stats",
    "token_counts_top20", "dedup_exact", "near_dup_pairs",
    "simhash_fingerprints", "embedding_topk", "asof_purchase_click",
    "priority_line_revenue", "tfidf_top_terms",
]


def main() -> None:
    import os

    from kafka_avro_order_processing_spark.plans.registry import QUERIES

    names = sys.argv[1:] or BENCH
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = make_session()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for n in names:  # warm: codegen + page cache
        QUERIES[n].fn(spark, sf).collect()
        spark.catalog.clearCache()
    m = Meter(spark)
    total = 0.0
    for n in names:
        total += m.measure(n, lambda n=n: QUERIES[n].fn(spark, sf).collect())["wall"]
    print(f"TOTAL wall (min-of-3 sum): {total:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
