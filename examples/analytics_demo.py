"""Graph + sketch analytics over the event stream — the "monitoring
and network analysis" composition: one pass over the events table feeds
three bounded-state sketches (count-min frequencies, HyperLogLog
distinct users, histogram quantiles) while the same events derive a
user co-activity graph ranked by fixed-point PageRank and scored for
cohesion with degree-ordered triangle counts.

The reference's aggregator keeps exact in-memory dict counters
(/root/reference/src/aggregator/price_aggregator.py:35-51); everything
here is its bounded-memory, cluster-scale counterpart: each sketch is a
fixed-size mergeable aggregate, each graph round a keyed join — no
driver-side state anywhere.

Run: python examples/analytics_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from kafka_avro_order_processing_spark.operators.graph import (  # noqa: E402
    label_propagation,
    co_activity_edges,
    label_propagation_auto,
    modularity,
    pagerank,
    triangle_counts,
)
from kafka_avro_order_processing_spark.operators.sketch import (  # noqa: E402
    cms_build,
    cms_estimate,
    histogram_build,
    histogram_quantiles,
    hll_estimate,
    hll_registers,
)
from kafka_avro_order_processing_spark.sources.tables import load_table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None) -> dict:
    if spark is None:
        from kafka_avro_order_processing_spark import get_spark

        spark = get_spark(app_name="analytics-demo")
    ev = load_table(spark, sf_dir, "events")

    # --- sketches: three fixed-size summaries of an unbounded stream
    sketch = cms_build(ev, "user_id").localCheckpoint(eager=True)
    top_exact = (
        ev.groupBy("user_id").agg(F.count("*").alias("exact"))
        .orderBy(F.desc("exact"), F.asc("user_id")).limit(5)
    )
    cms_top = cms_estimate(sketch, top_exact.select("user_id"), "user_id")
    cms_rows = {
        r["user_id"]: (r["exact"], r["est"])
        for r in top_exact.join(cms_top, "user_id").collect()
    }
    hll_row = hll_estimate(hll_registers(ev, "user_id")).collect()[0]
    quantile_rows = {
        r["quantile"]: r["est_value"]
        for r in histogram_quantiles(histogram_build(ev, "value")).collect()
    }

    # --- second-generation sketches: KMV distinct algebra, exact
    # heavy hitters without a key-space shuffle, KLL quantiles over
    # the unbounded value domain, and a priority sample whose
    # est_weight sums answer subset totals unbiasedly.
    from kafka_avro_order_processing_spark.operators.heavy import (
        heavy_hitters,
    )
    from kafka_avro_order_processing_spark.operators.kll import (
        kll_quantiles,
        kll_sketch,
    )
    from kafka_avro_order_processing_spark.operators.kmv import (
        kmv_estimate,
        kmv_overlap,
        kmv_sketch,
    )
    from kafka_avro_order_processing_spark.operators.sampling import (
        priority_sample,
        subset_sum_estimate,
    )

    kmv_users = kmv_estimate(kmv_sketch(ev, "user_id", k=64), 64).collect()[
        0
    ]
    buyers = kmv_sketch(
        ev.filter(F.col("event_type") == "purchase"), "user_id", k=64
    )
    clickers = kmv_sketch(
        ev.filter(F.col("event_type") == "click"), "user_id", k=64
    )
    overlap_row = kmv_overlap(buyers, clickers, k=64).collect()[0]
    hot_types = {
        r["event_type"]: r["freq"]
        for r in heavy_hitters(ev, "event_type", k=9).collect()
    }
    kll_qs = {
        r["q"]: r["est"]
        for r in kll_quantiles(
            kll_sketch(ev, "value", k=128), (0.5, 0.9, 0.99)
        ).collect()
    }
    pos = ev.filter(F.col("value") > 0).select(
        "event_id", "event_type", "value"
    )
    samp = priority_sample(pos, "event_id", "value", k=200)
    est_purchase_value = (
        subset_sum_estimate(samp, F.col("event_type") == "purchase")
        .collect()[0]["est_total_weight"]
        or 0.0
    )
    true_purchase_value = (
        pos.filter(F.col("event_type") == "purchase")
        .agg(F.sum("value"))
        .collect()[0][0]
    )

    # --- graph: co-activity network, ranked and scored
    bk = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(600)
    ).cast("long")
    os_ = ev.select(bk.alias("bk"), "user_id").distinct()
    pairs = (
        os_.select("bk", F.col("user_id").alias("src"))
        .join(os_.select("bk", F.col("user_id").alias("dst")), "bk")
        .filter(F.col("src") < F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)
    )
    sym = pairs.unionByName(
        pairs.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    pr = pagerank(sym, iterations=3)
    tri = triangle_counts(pairs)
    top_users = (
        pr.join(tri, "node")
        .orderBy(F.desc("rank_scaled"), F.asc("node"))
        .limit(5)
        .collect()
    )

    # --- communities: the SPARSER 2-minute same-event-type graph (the
    # 10-min graph is dense enough that LPA collapses to one block —
    # see q_user_communities), scored with exact-integer modularity.
    bk2 = F.floor(
        F.unix_timestamp(F.col("ts").cast("timestamp")) / F.lit(120)
    ).cast("long")
    os2 = ev.select(bk2.alias("bk"), "event_type", "user_id").distinct()
    cpairs = co_activity_edges(os2, ("bk", "event_type")).localCheckpoint(
        eager=True
    )
    comm = label_propagation(cpairs, iterations=3)
    mod_rows = modularity(cpairs, comm).collect()
    q_num = sum(r["contrib_num"] for r in mod_rows)
    q_den = mod_rows[0]["denom"] if mod_rows else 1

    # modularity-guided round selection: let Q pick the round instead
    # of pinning 3 — reports which round the integer Q numerator peaks
    _, auto_round, q_history = label_propagation_auto(
        cpairs, max_iterations=6, patience=2
    )

    # --- conversion funnel: the windowFunnel operator over the same
    # event stream — how many users view -> click -> purchase inside
    # an hour, with per-step conversion (level-0 users included).
    from kafka_avro_order_processing_spark.operators.funnel import (
        funnel_report,
        window_funnel,
    )

    levels = window_funnel(
        ev, ["view", "click", "purchase"], horizon_s=3600.0
    ).localCheckpoint(eager=True)
    funnel_rows = {
        r["step"]: (r["n_reached"], r["conversion"])
        for r in funnel_report(levels, 3).collect()
    }

    # experiment readouts on a hash-split of purchase values: the QTE
    # tail view WITH its distribution-free error bar (round-13) and
    # the whale-proof winsorized mean (round-12 family)
    from kafka_avro_order_processing_spark.operators.abtest import (
        quantile_treatment_effect_cis,
        quantile_treatment_effects,
        winsorized_ab_test,
    )

    exp = ev.filter("value IS NOT NULL").select(
        F.when(F.col("user_id") % 2 == 0, "a").otherwise("b").alias("arm"),
        F.col("value").cast("double").alias("y"),
    )
    qte_rows = {
        r["ppm"]: r["qte"]
        for r in quantile_treatment_effects(
            exp, "y", "arm", ppms=(500_000, 900_000)
        ).collect()
    }
    qte_bands = {
        r["ppm"]: (r["qte_lo"], r["qte"], r["qte_hi"])
        for r in quantile_treatment_effect_cis(
            exp, "y", "arm", ppms=(500_000, 900_000),
            confidence_ppm=950_000,
        ).collect()
    }
    wz = winsorized_ab_test(exp, "y", "arm", scale_bits=10)

    print(f"events: {ev.count()}, co-activity edges: {pairs.count()}")
    print(f"QTE by arm-split (p50/p90): {qte_rows}")
    print("QTE 95% bands (lo, qte, hi):",
          {p: tuple(round(x, 2) for x in band)
           for p, band in qte_bands.items()})
    print(f"winsorized A/B: diff={wz['diff']:.4f} z={wz['z']:.2f} "
          f"(clamp a: [{wz['per_arm']['a']['lo']:.2f}, "
          f"{wz['per_arm']['a']['hi']:.2f}])")
    print(f"communities: {len(mod_rows)}, modularity Q = {q_num}/{q_den}"
          f" = {q_num / q_den:.4f}")
    print(f"LPA auto-rounds: best round {auto_round} of {len(q_history)} run "
          f"(Q numerators: {q_history})")
    print(f"HLL distinct users: raw={hll_row['hll_raw_estimate']:.1f} "
          f"(exact={hll_row.asDict().get('n_exact_users', 'n/a')}, "
          f"zero_regs={hll_row['zero_registers']})")
    print("value quantiles (histogram sketch):",
          {q: round(v, 2) for q, v in quantile_rows.items()})
    print("top-5 users by exact count vs CMS estimate:", cms_rows)
    print(f"KMV distinct users: est={kmv_users['est_distinct']:.1f} "
          f"(n_kept={kmv_users['n_kept']})")
    print(f"buyer/clicker overlap: jaccard~{overlap_row['jaccard_est']:.3f}, "
          f"intersection~{overlap_row['est_intersection']:.1f}")
    print("heavy event types (exact, freq > N/10):", hot_types)
    print("value quantiles (KLL sketch):",
          {q: round(v, 2) for q, v in kll_qs.items()})
    print(f"purchase value total from a 200-row priority sample: "
          f"est={est_purchase_value:.2f} vs true={true_purchase_value:.2f}")
    print("view->click->purchase funnel (1h):",
          {s_: n for s_, (n, _) in funnel_rows.items()})
    print("top-5 users by PageRank (with triangle cohesion):")
    for r in top_users:
        print(f"  user {r['node']}: rank_scaled={r['rank_scaled']}, "
              f"degree={r['degree']}, triangles={r['n_triangles']}")

    return {
        "n_events": ev.count(),
        "n_edges": pairs.count(),
        "hll_raw": hll_row["hll_raw_estimate"],
        "zero_registers": hll_row["zero_registers"],
        "quantiles": quantile_rows,
        "cms_top": cms_rows,
        "pagerank_top": [(r["node"], r["rank_scaled"], r["n_triangles"]) for r in top_users],
        "n_communities": len(mod_rows),
        "modularity_num": q_num,
        "modularity_den": q_den,
        "lpa_auto_round": auto_round,
        "lpa_q_history": q_history,
        "funnel": funnel_rows,
        "kmv_est_users": kmv_users["est_distinct"],
        "kmv_overlap_jaccard": overlap_row["jaccard_est"],
        "heavy_types": hot_types,
        "kll_quantiles": kll_qs,
        "sampled_purchase_value": (est_purchase_value, true_purchase_value),
        "qte": qte_rows,
        "qte_bands": qte_bands,
        "winsorized_diff": wz["diff"],
    }


if __name__ == "__main__":
    main(*sys.argv[1:2])
