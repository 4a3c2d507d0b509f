"""Streaming lake-ingest demo — the ingestion topology the engine's
custom pieces compose into, run end-to-end:

  1. Avro container files LAND in a directory (two waves, as an
     upstream exporter would drop them — spec-compliant OCF bytes,
     no spark-avro jar anywhere).
  2. Each wave streams in through ``format("kaop_avro")`` — the
     PARTITIONED Python stream reader: file-count offsets, one
     executor task per landed file, records never funnel through the
     driver.
  3. Each micro-batch dedups against the GROWING MinHash-LSH index
     (streaming/incremental_dedup.py): the persisted band table is
     the index, the epoch joins only the band-store partitions its
     own bands hit, and the higher id of any agreeing pair drops —
     so wave-2 near-dups of wave-1 docs are caught without ever
     re-scanning wave 1.
  4. Survivors = ids - dropped, read with one anti-join.
  5. MONITORS: the landing stream is also watched by the streaming
     twins — a live column profile (row/null counts as the data
     lands), a PSI drift check of the length distribution against
     wave 1 as the reference frame, ingest-time LM fluency scoring
     under a wave-1-trained bigram model, and DSIR importance
     weighting against wave 1 as the trusted target (the fitted
     ratio table broadcasts into the stream; wave-1 docs must
     outweigh fresh wave-2 docs at ingest).

The reference's consumer loop ingests records one at a time into one
process (src/consumer/avro_order_consumer.py:163-202); this is the
same landing->decode->maintain-state topology with every stage a
distributed plan.

Run: python examples/streaming_ingest_demo.py
"""

from __future__ import annotations

import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from kafka_avro_order_processing_spark import get_spark
from kafka_avro_order_processing_spark.sources.avro_ocf import (
    register,
    write_avro_ocf,
)
from kafka_avro_order_processing_spark.streaming.incremental_dedup import (
    read_survivors,
    start_incremental_dedup,
)

DOC_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": "string"},
    ],
}


def _doc(i: int) -> dict:
    # Token-unique bodies: every trigram shingle carries an i-derived
    # token, so DISTINCT docs share (almost) no shingles and only the
    # planted same-text near-dups can agree on minhash signatures.
    words = " ".join(f"w{i}x{j}v{i * 31 + j * 7}" for j in range(10))
    return {"doc_id": i, "text": f"doc {i} body {words}"}


def main(spark=None, n_docs: int = 30) -> dict:
    """Run the two-wave ingest; returns the counters a production run
    would log.  Wave 2 contains near-duplicates of wave-1 docs (same
    text, higher id) — they must drop against the index, not survive."""
    own_session = spark is None
    if own_session:
        spark = get_spark(
            app_name="streaming-ingest-demo", master="local[4]", shuffle_partitions=4
        )
    base = tempfile.mkdtemp(prefix="ingest_demo_")
    land, idx, chk = f"{base}/landing", f"{base}/index", f"{base}/chk"

    half = n_docs // 2
    wave1 = [_doc(i) for i in range(half)]
    # wave 2: fresh docs + near-dups of wave-1 docs (higher ids)
    dup_of = list(range(0, half, 3))
    wave2 = [_doc(i) for i in range(half, n_docs)] + [
        {"doc_id": 1000 + i, "text": _doc(i)["text"] + " appended"} for i in dup_of
    ]

    register(spark)

    def land_and_drain(wave: list[dict], part: str) -> None:
        write_avro_ocf(f"{land}/{part}.avro", wave, DOC_SCHEMA)
        stream = spark.readStream.format("kaop_avro").option("path", land).load()
        start_incremental_dedup(stream, idx, chk).awaitTermination()

    land_and_drain(wave1, "part-0001")
    land_and_drain(wave2, "part-0002")

    survivors = {r["doc_id"] for r in read_survivors(spark, idx).collect()}
    ingested = len(wave1) + len(wave2)

    # 5. monitors: profile + drift + LM scoring over the SAME landing
    # stream (fresh bounded drains; continuous queries in production)
    from pyspark.sql import functions as F

    from kafka_avro_order_processing_spark.operators.drift import psi
    from kafka_avro_order_processing_spark.operators.lm import train_bigram_lm
    from kafka_avro_order_processing_spark.sources.avro_ocf import read_avro_ocf
    from kafka_avro_order_processing_spark.streaming.drift import (
        streaming_numeric_drift,
    )
    from kafka_avro_order_processing_spark.streaming.lm import streaming_lm_score
    from kafka_avro_order_processing_spark.streaming.profile import (
        streaming_profile,
    )

    def landing_stream():
        return spark.readStream.format("kaop_avro").option("path", land).load()

    prof = {
        r["column"]: r for r in streaming_profile(landing_stream()).collect()
    }
    wave1_ref = read_avro_ocf(spark, f"{land}/part-0001.avro")
    with_len = lambda d: d.select(  # noqa: E731
        F.size(F.split("text", " ")).cast("long").alias("len")
    )
    length_psi = psi(
        streaming_numeric_drift(
            with_len(wave1_ref), with_len(landing_stream()), "len", n_bins=8
        )
    )
    bigrams, contexts, V = train_bigram_lm(wave1_ref)
    scores = streaming_lm_score(
        landing_stream(),
        bigrams.localCheckpoint(eager=True),
        contexts.localCheckpoint(eager=True),
        V,
    )

    # DSIR ingest weighting (streaming/dsir.py): the trusted corpus is
    # wave 1, the raw pool is everything landed; the fitted ratio
    # table broadcasts into the landing stream, so every doc gets its
    # log importance weight AT INGEST.  Wave-1 docs (the target
    # itself) must outweigh the fresh wave-2 docs, whose unique tokens
    # the target never saw.
    from kafka_avro_order_processing_spark.operators.dsir import (
        dsir_features,
        dsir_fit,
    )
    from kafka_avro_order_processing_spark.streaming.dsir import (
        streaming_dsir_log_weights,
    )

    all_landed = read_avro_ocf(spark, f"{land}/part-0001.avro").unionByName(
        read_avro_ocf(spark, f"{land}/part-0002.avro")
    )
    nb_buckets = 512
    ratios = dsir_fit(
        dsir_features(wave1_ref, nb_buckets),
        dsir_features(all_landed, nb_buckets),
        nb_buckets,
    ).localCheckpoint(eager=True)
    lw = streaming_dsir_log_weights(landing_stream(), ratios, nb_buckets)
    mean_w1 = (
        lw.filter(F.col("doc_id") < half).agg(F.avg("log_weight")).collect()[0][0]
    )
    mean_fresh = (
        lw.filter((F.col("doc_id") >= half) & (F.col("doc_id") < 1000))
        .agg(F.avg("log_weight"))
        .collect()[0][0]
    )
    # Exact-key Bloom gate (operators/bloom.py): a filter over wave-1
    # TEXT keys answers "definitely new?" for wave 2 BEFORE any
    # content pass — the planted near-dups have APPENDED text (new
    # keys), so the exact-key gate must pass them through to the
    # content-level MinHash index (which catches them above); truly
    # re-sent identical text would short-circuit here.
    from kafka_avro_order_processing_spark.operators.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_params,
    )

    wave2_landed = read_avro_ocf(spark, f"{land}/part-0002.avro")
    m_bl, k_bl = bloom_params(max(len(wave1), 1), 0.01)
    m_bl = max(m_bl, 32)
    gate = bloom_build(wave1_ref, "text", m_bl, k_bl)
    wave2_verdicts = bloom_might_contain(
        wave2_landed.select("doc_id", "text"), gate, "text", m_bl, k_bl
    )
    gate_definitely_new = wave2_verdicts.filter(
        ~F.col("might_contain")
    ).count()
    # re-send wave-1 texts: the gate must flag EVERY one as "maybe"
    resent = bloom_might_contain(
        wave1_ref.select("text"), gate, "text", m_bl, k_bl
    )
    gate_resent_caught = resent.filter(F.col("might_contain")).count()

    out = {
        "ingested": ingested,
        "survivors": len(survivors),
        "dropped": ingested - len(survivors),
        "late_dups_caught": sum(1 for i in dup_of if 1000 + i not in survivors),
        "planted_dups": len(dup_of),
        "monitor_rows": int(prof["text"]["n_rows"]),
        "monitor_text_nulls": int(prof["text"]["n_nulls"]),
        "monitor_length_psi": length_psi,
        "monitor_docs_scored": scores.count(),
        "monitor_dsir_weighed": lw.count(),
        "monitor_dsir_mean_lw_wave1": float(mean_w1),
        "monitor_dsir_mean_lw_fresh": float(mean_fresh),
        "gate_definitely_new": gate_definitely_new,
        "gate_wave2_total": wave2_verdicts.count(),
        "gate_resent_caught": gate_resent_caught,
        "gate_wave1_total": len(wave1),
    }
    if own_session:
        spark.stop()
    return out


if __name__ == "__main__":
    counters = main()
    for k, v in counters.items():
        print(f"{k:18s} {v}")
