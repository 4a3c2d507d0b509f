"""Avro-lake lifecycle demo — land, skip, compact, vacuum, end-to-end:

  1. Orders LAND on a manifest-managed (``file://`` URI) directory as
     four append jobs, range-clustered on price, part sizes bounded by
     ``maxRecordsPerPart``, bloom filters on the order key
     (``bloomColumns``) — many small stats-bearing container parts,
     the shape a streaming ingest leaves behind.  A final-named orphan
     no commit published is planted as debris: the manifest commit
     protocol keeps it invisible to every read below.
  2. A selective RANGE read (``statsPruning=true`` + a price filter)
     plans only the parts whose min/max stats admit a match — the
     parquet-style file-skipping story, one manifest read for all
     stats.
  3. A POINT lookup on the hash-spread order key prunes by per-part
     bloom filter — the case min/max can never help.
  4. ``compact_avro_dir`` rewrites the committed rows dense (single
     manifest-PUT swap; row count planned from the parts' own stats),
     then ``vacuum_avro_dir`` deletes the orphan the manifest was
     hiding.
  5. Both reads re-run post-compaction and must return the same
     answers — maintenance is invisible to consumers.
  6. TIME TRAVEL: each landing commit left an immutable
     ``_manifest.v{N}.json`` snapshot, so the table is read back AS OF
     the second append (half the residues); after vacuum with zero
     grace only the current version's snapshot survives — the
     Delta-style "vacuum bounds history" contract, demonstrated.
  7. ROW-LEVEL OPS: a MERGE upserts one order and inserts a new one,
     then a pruned DELETE purges a key range — both touch only the
     parts whose stats admit the keys, each in one manifest swap.

The reference has no lake tier at all (its state lives in one Python
process, src/consumer/price_aggregator.py:35-51); this is the
lakehouse counterpart every 100 TB deployment actually operates.

Run: python examples/lake_maintenance_demo.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark import get_spark
from kafka_avro_order_processing_spark.sources.avro_ocf import (
    AvroOcfPruningReader,
    _list_avro,
    compact_avro_dir,
    delete_where_avro_dir,
    manifest_history,
    merge_into_avro_dir,
    read_avro_ocf,
    register,
    vacuum_avro_dir,
    write_avro_ocf,
)

SF_DEFAULT = "/root/testdata/sf0.001"
PRICE_CUTOFF = 50_000.0
LOOKUP_KEY = 777

COLS = ["o_orderkey", "o_orderpriority", "o_totalprice"]

ORPHAN_SCHEMA = {
    "type": "record", "name": "SparkRecord", "fields": [
        {"name": "o_orderkey", "type": ["null", "long"]},
        {"name": "o_orderpriority", "type": ["null", "string"]},
        {"name": "o_totalprice", "type": ["null", "double"]},
    ],
}


def _planned_parts(uri: str, filters) -> int:
    """How many parts the pruning reader plans for the given pushed
    filters (the file-skipping evidence the demo reports)."""
    r = AvroOcfPruningReader(uri, None, COLS)
    r.pushFilters(filters)
    return len(r.partitions())


def _answers(spark, uri: str):
    base = (
        spark.read.format("kaop_avro")
        .option("path", uri)
        .option("statsPruning", "true")
        .load()
    )
    range_rows = (
        base.filter(F.col("o_totalprice") < PRICE_CUTOFF)
        .groupBy("o_orderpriority")
        .count()
        .orderBy("o_orderpriority")
        .collect()
    )
    point_rows = base.filter(F.col("o_orderkey") == LOOKUP_KEY).collect()
    return (
        [(r["o_orderpriority"], r["count"]) for r in range_rows],
        sorted((r["o_orderkey"], r["o_orderpriority"]) for r in point_rows),
    )


def main(sf_dir: str = SF_DEFAULT, spark=None, out_dir: str | None = None) -> dict:
    from pyspark.sql.datasource import EqualTo, LessThan

    own_session = spark is None
    if own_session:
        spark = get_spark(app_name="lake-maintenance-demo")
    register(spark)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    base = out_dir or tempfile.mkdtemp(prefix="kaop_lake_demo_")
    uri = "file://" + str(base) + "/orders"

    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").select(*COLS)
    rows_total = orders.count()

    # 1. land: four append jobs, range-clustered, bounded stats-bearing parts
    landing_versions = []
    for residue in range(4):
        (
            orders.filter(F.col("o_orderkey") % 4 == residue)
            .repartitionByRange(2, "o_totalprice")
            .write.format("kaop_avro")
            .option("path", uri)
            .option("bloomColumns", "o_orderkey")
            .option("maxRecordsPerPart", "150")
            .mode("append")
            .save()
        )
        landing_versions.append(manifest_history(uri)[-1]["version"])
    parts_before = len(_list_avro(uri))
    # debris: a final-named part no commit published (invisible via manifest)
    write_avro_ocf(
        f"{uri}/part-zz-orphan.avro",
        [{"o_orderkey": -1, "o_orderpriority": "X", "o_totalprice": 9e9}],
        ORPHAN_SCHEMA,
    )

    # 2./3. file-skipping evidence + the actual answers
    range_planned = _planned_parts(uri, [LessThan(("o_totalprice",), PRICE_CUTOFF)])
    point_planned = _planned_parts(uri, [EqualTo(("o_orderkey",), LOOKUP_KEY)])
    before = _answers(spark, uri)

    # 6a. time travel while history is still retained: the table AS OF
    # the second landing commit holds exactly residues {0, 1}
    history_versions = len(manifest_history(uri))
    rows_at_v2 = read_avro_ocf(spark, uri, version=landing_versions[1]).count()
    rows_first_two = orders.filter(F.col("o_orderkey") % 4 < 2).count()

    # 4. maintenance
    stats = compact_avro_dir(spark, uri, target_records=500)
    orphans = vacuum_avro_dir(uri, grace_seconds=0.0)

    # 5. consumers see identical answers on the dense layout
    after = _answers(spark, uri)

    # 6b. zero-grace vacuum pruned every snapshot but the current one:
    # vacuum bounds time travel, by contract
    history_after_vacuum = len(manifest_history(uri))

    # 7. row-level ops on the compacted table: MERGE one patched order
    # + one brand-new key, then DELETE a small key range.
    rows_pre_ops = read_avro_ocf(spark, uri).count()
    updates = spark.createDataFrame(
        [(LOOKUP_KEY, "0-PATCHED", 1.0), (10_000_001, "5-NEW", 2.0)],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    mstats = merge_into_avro_dir(spark, uri, updates, ["o_orderkey"])
    dstats = delete_where_avro_dir(
        spark,
        uri,
        "o_orderkey >= 1 AND o_orderkey <= 8",
        prune_filter=[["o_orderkey", ">=", 1], ["o_orderkey", "<=", 8]],
    )
    final = read_avro_ocf(spark, uri)
    patched = final.filter(F.col("o_orderkey") == LOOKUP_KEY).collect()
    row_ops_ok = (
        len(patched) == 1
        and patched[0]["o_orderpriority"] == "0-PATCHED"
        and final.count()
        == rows_pre_ops + mstats["rows_inserted"] - dstats["rows_deleted"]
    )

    counters = {
        "rows_total": rows_total,
        "parts_before": parts_before,
        "range_parts_planned": range_planned,
        "point_parts_planned": point_planned,
        "parts_after": stats["parts_after"],
        "compact_rows": stats["rows"],
        "orphans_deleted": len([n for n in orphans if n.endswith(".avro")]),
        "snapshots_pruned": len(
            [n for n in orphans if n.startswith("_manifest.v")]
        ),
        "answers_stable": before == after,
        "history_versions": history_versions,
        "time_travel_v2_exact": rows_at_v2 == rows_first_two,
        "history_after_vacuum": history_after_vacuum,
        "merge_matched": mstats["rows_matched"],
        "merge_inserted": mstats["rows_inserted"],
        "deleted_rows": dstats["rows_deleted"],
        "row_ops_ok": row_ops_ok,
    }
    if own_session:
        print(counters)
        spark.stop()
    return counters


if __name__ == "__main__":
    main()
