"""End-to-end experiment readout — the composition the
experimentation operators exist for, in the order a real experiment
platform runs them:

1. **Health gate**: sample_ratio_mismatch chi-squares the observed
   assignment against the design — an SRM alarm invalidates
   everything downstream (Fabijan et al. KDD'19).
2. **Fixed-horizon readout**: exact-moment per-arm stats, then CUPED
   (single and multi-covariate OLS) variance reduction (Deng et al.
   WSDM'13; Lin 2013).
3. **Sequential monitoring**: the always-valid mSPRT p trajectory —
   peeking-safe at any cadence (Johari et al. KDD'17).
4. **Sizing**: minimum detectable effect at the current traffic and
   the per-arm n needed to halve it.
5. **Ratio metric**: clicks-per-event under USER-level randomization
   with delta-method clustered SEs (Deng, Knoblich & Lu KDD'18).
6. **Nonparametric cross-check**: Mann-Whitney U on the same
   metric — the readout that survives skew the Welch z does not.
7. **Retention**: per-arm Kaplan-Meier user-retention curves with a
   log-rank comparison (censoring-aware, unlike a raw churn ECDF).
8. **Label quality sidebar**: the same events' annotation table
   audited with pairwise Cohen's kappa and Krippendorff's alpha
   before any label-derived metric is trusted.

The reference app's consumers print per-key running aggregates
(/root/reference/src/consumer/*.py); this demo is that reporting
loop re-expressed as the statistics an experimentation platform
actually ships.

Run: python examples/experimentation_demo.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from pyspark.sql import functions as F  # noqa: E402

from kafka_avro_order_processing_spark.operators.abtest import (  # noqa: E402
    ab_arm_stats,
    always_valid_pvalues,
    cuped_ab_test,
    cuped_ab_test_multi,
    mann_whitney_u,
    minimum_detectable_effect,
    ratio_metric_ab_test,
)
from kafka_avro_order_processing_spark.operators.labels import (  # noqa: E402
    krippendorff_alpha_nominal,
    pairwise_cohen_kappa,
)
from kafka_avro_order_processing_spark.operators.srm import (  # noqa: E402
    sample_ratio_mismatch,
)
from kafka_avro_order_processing_spark.operators.survival import (  # noqa: E402
    kaplan_meier,
    logrank_test,
    median_survival_time,
)
from kafka_avro_order_processing_spark.sources.tables import load_table  # noqa: E402


def main(sf_dir: str = "/root/testdata/sf0.001", spark=None):
    if spark is None:
        from kafka_avro_order_processing_spark import get_spark

        spark = get_spark(app_name="experimentation-demo")

    ev = load_table(spark, sf_dir, "events").filter("value IS NOT NULL")
    # the experiment frame: user-level randomization, an event metric,
    # a pre-period covariate pair correlated with the metric, a time
    # bucket for the monitoring trajectory
    frame = ev.select(
        F.when(F.col("user_id") % 2 == 0, "control")
        .otherwise("treat").alias("arm"),
        F.col("user_id").alias("unit"),
        (F.col("value") % 7).cast("double").alias("y"),
        ((F.col("value") % 7) * 0.7
         + (F.col("event_id") % 5).cast("double")).alias("x1"),
        (F.col("event_id") % 3).cast("double").alias("x2"),
        (F.col("event_id") % 8).cast("long").alias("bucket"),
        (F.col("value") % 2).cast("double").alias("clicks"),
    )

    # 1. health gate — on the ASSIGNMENT LOG (one row per unit), not
    # the event rows: randomization is by user, users carry different
    # event counts, so a per-row 50/50 expectation is simply the wrong
    # null (it alarms on traffic skew, not broken assignment)
    assignments = frame.select("arm", "unit").distinct()
    srm = sample_ratio_mismatch(assignments, "arm", {"control": 1, "treat": 1})
    if srm["srm"]:
        raise RuntimeError(f"SRM alarm — stop reading metrics: {srm}")

    # 2. fixed-horizon readout with variance reduction
    arms = {r["arm"]: r for r in ab_arm_stats(frame, "y", "arm").collect()}
    cuped1 = cuped_ab_test(frame, "y", "x1", "arm")
    cuped2 = cuped_ab_test_multi(frame, "y", ["x1", "x2"], "arm")

    # 3. sequential monitoring trajectory
    traj = sorted(
        always_valid_pvalues(frame, "y", "arm", "bucket", tau=1.0).collect(),
        key=lambda r: r["bucket"],
    )

    # 4. sizing
    mde = minimum_detectable_effect(
        frame, "y", "arm", target_mde=None
    )
    sized = minimum_detectable_effect(
        frame, "y", "arm", target_mde=mde["mde"] / 2.0
    )

    # 5. clustered ratio metric
    ratio = ratio_metric_ab_test(frame, "clicks", "y", "unit", "arm")

    # 6. nonparametric cross-check on the same metric, with the
    # Hodges-Lehmann robust effect size + CI that pairs with it (r13)
    mwu = mann_whitney_u(frame, "y", "arm")
    from kafka_avro_order_processing_spark.operators.abtest import (
        hodges_lehmann_shift,
    )

    hl = hodges_lehmann_shift(frame, "y", "arm")

    # 7. censoring-aware retention: per-user span in days, censored
    # when the span reaches the observation horizon
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    span = (
        ev.groupBy("user_id")
        .agg((((F.max(us) - F.min(us)) / F.lit(86400.0 * 1e6))
              .cast("int").cast("double")).alias("days"))
        .select(
            "days",
            F.when(F.col("user_id") % 2 == 0, "control")
            .otherwise("treat").alias("arm"),
            (F.col("days") < 6.0).cast("int").alias("churned"),
        )
    )
    km = kaplan_meier(span, "days", "churned", group_col="arm")
    medians = median_survival_time(km, group_col="arm")
    lr = logrank_test(span, "days", "churned", "arm")

    # 8. label-quality sidebar on the documents annotation table
    docs = load_table(spark, sf_dir, "documents")
    labels = docs.select(
        (F.col("doc_id") % 101).alias("item_id"),
        F.col("source").alias("worker_id"),
        F.col("lang").alias("label"),
    )
    alpha = krippendorff_alpha_nominal(labels)
    dedup = labels.groupBy("item_id", "worker_id").agg(
        F.min("label").alias("label")
    )
    kappas = pairwise_cohen_kappa(dedup).collect()

    print(f"SRM gate: p = {srm['p']:.4f} (counts {srm['counts']}) — pass")
    print(f"raw arms: " + ", ".join(
        f"{a}: mean={arms[a]['mean']:.4f} var={arms[a]['var']:.4f}"
        for a in sorted(arms)))
    print(f"CUPED d=1: var_reduction = {cuped1['var_reduction']:.3f}, "
          f"z = {cuped1['cuped']['z']:.3f}")
    print(f"CUPED d=2: var_reduction = {cuped2['var_reduction']:.3f}, "
          f"z = {cuped2['cuped']['z']:.3f}")
    print("always-valid p by look:",
          [round(r["p_always"], 4) for r in traj])
    print(f"MDE now = {mde['mde']:.4f}; halving it needs "
          f"{sized['n_per_arm_needed']} per arm "
          f"(have {min(mde['n'].values())})")
    print(f"clicks/y ratio: diff = {ratio['diff']:.5f}, "
          f"se = {ratio['se']:.5f}, z = {ratio['z']:.3f}")
    print(f"rank test: U z = {mwu['z']:.3f}, p = {mwu['p']:.4f}")
    print(f"HL shift = {hl['shift']:.4f} "
          f"[{hl['ci_lo']:.4f}, {hl['ci_hi']:.4f}] "
          f"({hl['n_pairs']} implied pairs, never materialized)")
    print(f"retention medians (days): {medians}; "
          f"log-rank chi2 = {lr['chi2']:.3f}, p = {lr['p']:.4f}")
    print(f"label quality: krippendorff alpha = {alpha['alpha']:.4f} "
          f"over {alpha['n_items']} items; "
          f"{len(kappas)} annotator pairs audited")

    return {
        "srm_p": srm["p"],
        "arms": {a: (arms[a]["n"], arms[a]["mean"], arms[a]["var"])
                 for a in arms},
        "cuped1_vr": cuped1["var_reduction"],
        "cuped2_vr": cuped2["var_reduction"],
        "p_trajectory": [r["p_always"] for r in traj],
        "mde": mde["mde"],
        "n_for_half_mde": sized["n_per_arm_needed"],
        "ratio_z": ratio["z"],
        "ratio_se": ratio["se"],
        "mwu_p": mwu["p"],
        "hl_shift": hl["shift"],
        "hl_ci": (hl["ci_lo"], hl["ci_hi"]),
        "retention_medians": medians,
        "logrank_p": lr["p"],
        "kripp_alpha": alpha["alpha"],
        "n_kappa_pairs": len(kappas),
    }


if __name__ == "__main__":
    main(*sys.argv[1:2])
