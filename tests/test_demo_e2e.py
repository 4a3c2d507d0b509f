"""The end-to-end demo (reference run_demo.sh analogue) must run
inside the suite and produce the expected split."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))


def test_demo_end_to_end(spark):
    from order_pipeline_demo import main

    counters = main(n_orders=20, spark=spark)
    assert counters["processed"] == 20        # all generated orders valid
    assert counters["sent_to_dlq"] == 2       # the two seeded invalids
    assert counters["offered"] == 22


def test_curation_demo_end_to_end(spark, tmp_path):
    """The raw-docs -> packed-shards curation pipeline: the funnel only
    shrinks, every stage keeps >0 docs, and the written shard layout is
    readable with dense per-shard packing bins."""
    from curation_pipeline_demo import main

    c = main("/root/testdata/sf0.001", spark=spark, out_dir=str(tmp_path))
    assert c["raw"] >= c["after_quality"] >= c["after_exact_dedup"] >= c["after_near_dedup"] > 0
    assert c["after_quality"] < c["raw"]          # quality gate filtered
    assert c["after_near_dedup"] < c["after_exact_dedup"]  # near-dups pruned
    assert c["shards"] == 8
    shards = spark.read.parquet(str(tmp_path / "shards"))
    assert shards.count() == c["after_near_dedup"]
    assert set(shards.columns) == {"doc_id", "text", "shard", "n_tokens", "bin_id"}


def test_streaming_ingest_demo_end_to_end(spark):
    """Two waves of landed .avro files stream through the partitioned
    kaop_avro source into the incremental dedup index: every planted
    wave-2 near-dup of a wave-1 doc drops against the index; fresh
    docs all survive."""
    from streaming_ingest_demo import main

    c = main(spark=spark, n_docs=30)
    assert c["planted_dups"] == 5
    assert c["late_dups_caught"] == c["planted_dups"]  # index caught all
    assert c["dropped"] == c["planted_dups"]           # nothing else dropped
    assert c["survivors"] == c["ingested"] - c["dropped"]


def test_lake_maintenance_demo_end_to_end(spark, tmp_path):
    """Land -> skip -> compact -> vacuum: pruning plans fewer parts
    than the directory holds (range by min/max, point by bloom),
    compaction shrinks the part count without changing any answer,
    and vacuum retires exactly the planted orphan."""
    from lake_maintenance_demo import main

    c = main("/root/testdata/sf0.001", spark=spark, out_dir=str(tmp_path))
    assert c["rows_total"] == 1500 == c["compact_rows"]
    assert c["parts_before"] > c["parts_after"]
    assert 0 < c["range_parts_planned"] < c["parts_before"]
    assert 0 < c["point_parts_planned"] < c["range_parts_planned"]
    assert c["orphans_deleted"] == 1
    assert c["answers_stable"] is True
