"""Registry-wide physical-plan audit (r13 optimization round).

Explains every non-streaming registered query at sf0.001 and prints one
shape line per query: Exchange / Sort / Window counts (from the plan
tree), SortMergeJoin / CartesianProduct / BatchEvalPython / Expand
occurrences.  Used for the breadth audit in OPTIMIZATION_r13.md
("no BatchEvalPython, no CartesianProduct anywhere; high-exchange plans
are the by-design multi-pass algorithms").

Usage: python scripts/audit_plans.py [sf_dir]
"""

from __future__ import annotations

import contextlib
import io
import re
import sys
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from kafka_avro_order_processing_spark import get_spark  # noqa: E402
from kafka_avro_order_processing_spark.plans.registry import QUERIES  # noqa: E402


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="audit-plans")
    for name, q in QUERIES.items():
        if "streaming" in q.tags:
            continue
        try:
            df = q.fn(spark, sf)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            tree = buf.getvalue().split("\n\n")[0]
            print(
                f"{name:40s} "
                f"ex={len(re.findall(r'Exchange', tree)):2d} "
                f"sort={len(re.findall(r'Sort', tree)):2d} "
                f"win={len(re.findall(r'Window', tree)):2d} "
                f"smj={len(re.findall(r'SortMergeJoin', tree))} "
                f"cart={len(re.findall(r'CartesianProduct', tree))} "
                f"batchpy={len(re.findall(r'BatchEvalPython', tree))} "
                f"expand={len(re.findall(r'Expand', tree))}"
            )
        except Exception as e:  # pragma: no cover - audit tool
            print(f"{name:40s} ERROR {type(e).__name__}: {str(e)[:80]}")
    spark.stop()


if __name__ == "__main__":
    main()
