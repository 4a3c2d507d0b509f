"""Regenerate QUERIES.md from plans/registry.py.

Run from the repo root:  python scripts/gen_queries_md.py
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from kafka_avro_order_processing_spark.plans.registry import QUERIES  # noqa: E402


def main() -> None:
    n_oracle = sum(1 for q in QUERIES.values() if q.oracle)
    lines = [
        "# QUERIES — the registered operator surface (auto-generated from plans/registry.py)",
        "",
        f"{len(QUERIES)} queries; {n_oracle} with DuckDB",
        "oracles (hash-checked at sf0.001 / sf0.01 / sf0.1), the rest rows-only.",
        "",
        "Ordering note: the driver checks the first 50 queries in registration",
        "order, so the registry leads with (1) never-driver-checked queries,",
        "(2) queries whose plan changed this round, (3) the stalest",
        "round-1-only names; see _LEAD_ORDER in plans/registry.py.",
        "",
        "| # | query | oracle | tags | what it demonstrates |",
        "|---|---|---|---|---|",
    ]
    for i, (name, q) in enumerate(QUERIES.items(), 1):
        oracle = "✓" if q.oracle else "rows-only"
        tags = ", ".join(q.tags)
        doc = " ".join((q.doc or "").split())
        lines.append(f"| {i} | `{name}` | {oracle} | {tags} | {doc} |")
    (REPO / "QUERIES.md").write_text("\n".join(lines) + "\n")
    print(f"wrote QUERIES.md: {len(QUERIES)} queries, {n_oracle} oracled")


if __name__ == "__main__":
    main()
