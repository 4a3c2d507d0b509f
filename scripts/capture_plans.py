"""Capture .explain("formatted") for the bench queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> [query ...]
Writes plans/<tag>/<query>_<suffix>.txt where suffix is "before" or
"after" (second positional arg style kept simple: tag is e.g. "r13" and
the suffix comes from $PLAN_SUFFIX, default "before").

Also prints a one-line plan summary per query: #Exchange, join nodes,
#Window sorts, Python-boundary nodes — the shape facts the optimization
notes cite.
"""

from __future__ import annotations

import contextlib
import io
import os
import re
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kafka_avro_order_processing_spark import get_spark  # noqa: E402
from kafka_avro_order_processing_spark.plans.registry import QUERIES  # noqa: E402

BENCH_QUERIES = [
    "per_product_stats", "overall_stats", "running_avg", "validated_orders",
    "pricing_summary", "top_customers", "revenue_by_region", "events_hourly",
    "user_sessions", "top3_events_per_type", "doc_token_stats",
    "token_counts_top20", "dedup_exact", "near_dup_pairs",
    "simhash_fingerprints", "embedding_topk", "asof_purchase_click",
    "priority_line_revenue", "tfidf_top_terms",
]


def summarize(plan: str) -> str:
    n_ex = len(re.findall(r"\bExchange\b", plan))
    n_win = len(re.findall(r"\bWindow\b", plan))
    n_sort = len(re.findall(r"\bSort\b", plan))
    joins = sorted(set(re.findall(r"(\w*Join\w*)", plan)))
    py = sorted(set(re.findall(r"(BatchEvalPython|ArrowEvalPython|MapInPandas|MapInArrow|PythonDataSource)", plan)))
    return f"Exchange={n_ex} Sort={n_sort} Window={n_win} joins={joins} py={py}"


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r13"
    names = sys.argv[2:] or BENCH_QUERIES
    suffix = os.environ.get("PLAN_SUFFIX", "before")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = Path(_REPO) / "plans" / tag
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    for name in names:
        df = QUERIES[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print(f"{name}: {summarize(plan)}")
    spark.stop()


if __name__ == "__main__":
    main()
