"""Driver-contract verification drive: run every registry query on
Spark and its oracle SQL on DuckDB at a given SF, compare rows +
column names + values through the driver's pandas canonicalization
(NOT fetchall — pandas is what exposes HUGEINT/decimal typing drift).

Usage: python scripts/drive_parity.py [sf_dir]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

_REPO = str(Path(__file__).resolve().parent.parent)
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

import __spark_entry__ as entry_mod  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _canon_pdf(pdf):
    """The driver's canonicalization: sort columns by name, stringify
    every cell from the pandas frame, sort rows."""
    pdf = pdf[sorted(pdf.columns)]
    rows = sorted(
        tuple(str(v) for v in rec) for rec in pdf.itertuples(index=False, name=None)
    )
    return list(pdf.columns), rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.sql.adaptive.enabled", "true")
        .appName("drive_parity")
        .getOrCreate()
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    t0 = time.time()
    n_pass = n_rows_only = 0
    fails: list[str] = []
    for i, (name, fn) in enumerate(queries.items(), 1):
        try:
            sdf = fn(spark, sf_dir)
            spdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            fails.append(f"{name}: SPARK ERR {e}")
            print(f"[{i}] {name}: SPARK ERR {e}", flush=True)
            continue
        sql = oracles.get(name)
        if sql is None:
            n_rows_only += 1
            print(f"[{i}] {name}: rows-only ({len(spdf)} rows)", flush=True)
            continue
        try:
            opdf = con.execute(sql).df()
        except Exception as e:  # noqa: BLE001
            fails.append(f"{name}: ORACLE ERR {e}")
            print(f"[{i}] {name}: ORACLE ERR {e}", flush=True)
            continue
        scols, srows = _canon_pdf(spdf)
        ocols, orows = _canon_pdf(opdf)
        if scols != ocols:
            fails.append(f"{name}: SCHEMA {scols} vs {ocols}")
            print(f"[{i}] {name}: SCHEMA MISMATCH", flush=True)
        elif srows != orows:
            diff = next(
                (f"spark={a} oracle={b}" for a, b in zip(srows, orows) if a != b),
                f"row counts {len(srows)} vs {len(orows)}",
            )
            fails.append(f"{name}: VALUES {diff[:300]}")
            print(f"[{i}] {name}: VALUE MISMATCH {diff[:200]}", flush=True)
        else:
            n_pass += 1
            if i % 10 == 0:
                print(f"[{i}] ... {name} OK ({time.time() - t0:.0f}s)", flush=True)
    dt = time.time() - t0
    print(
        json.dumps(
            {
                "sf_dir": sf_dir,
                "total": len(queries),
                "hash_pass": n_pass,
                "rows_only": n_rows_only,
                "fails": fails,
                "sec": round(dt, 1),
            }
        ),
        flush=True,
    )
    spark.stop()
    return 1 if fails else 0


if __name__ == "__main__":
    raise SystemExit(main())
