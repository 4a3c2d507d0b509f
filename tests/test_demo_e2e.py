"""The end-to-end demo (reference run_demo.sh analogue) must run
inside the suite and produce the expected split."""

from __future__ import annotations

import pytest

import math
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))


def test_demo_end_to_end(spark):
    from order_pipeline_demo import main

    counters = main(n_orders=20, spark=spark)
    assert counters["processed"] == 20        # all generated orders valid
    assert counters["sent_to_dlq"] == 2       # the two seeded invalids
    assert counters["offered"] == 22


@pytest.mark.slow
def test_curation_demo_end_to_end(spark, tmp_path):
    """The raw-docs -> packed-shards curation pipeline: the funnel only
    shrinks, every stage keeps >0 docs, and the written shard layout is
    readable with dense per-shard packing bins."""
    from curation_pipeline_demo import main

    c = main("/root/testdata/sf0.001", spark=spark, out_dir=str(tmp_path))
    assert (
        c["raw"]
        >= c["after_quality"]
        >= c["after_exact_dedup"]
        >= c["after_near_dedup"]
        >= c["after_decontam"]
        > 0
    )
    assert c["after_quality"] < c["raw"]          # quality gate filtered
    assert c["after_near_dedup"] < c["after_exact_dedup"]  # near-dups pruned
    # decontamination: eval-set copies surviving the dedups are removed
    assert c["after_decontam"] < c["after_near_dedup"]
    # PII audit ran; the synthetic corpus is PII-free
    assert c["pii_docs"] == 0
    assert c["shards"] == 8
    # three-way near-dup recall audit against the exact AllPairs truth
    # set (its own recall is 1.0 by construction — no false negatives)
    assert c["setsim_recall"] == 1.0
    # the INCLUSION invariant: LSH verifies exact Jaccard over the
    # same shingles at the same threshold, so every LSH pair is a
    # truth pair — zero extras, and recall is just the band hit rate
    assert c["lsh_extra_pairs"] == 0
    assert c["lsh_pairs"] <= c["exact_pairs"]
    assert 0.0 <= c["lsh_recall"] <= 1.0
    # winnowing must cover near-dup pairs well (shared text => shared
    # passages) and may legitimately surface extra partial overlaps
    # (shared passages in otherwise-distinct docs — not false
    # positives, the capability whole-doc Jaccard lacks)
    assert 0.0 <= c["winnow_recall"] <= 1.0
    if c["exact_pairs"]:
        assert c["winnow_recall"] >= 0.5
    assert c["winnow_extra_pairs"] >= 0
    # DSIR audit: the draw is (seed, id)-deterministic, the selection
    # is exactly k, and the selected half's mean log weight is at
    # least the pool's (top-k by weight + O(1) Gumbel noise)
    assert c["dsir_selected"] == c["dsir_k"] > 0
    assert c["dsir_deterministic"] is True
    assert c["dsir_mean_lw_selected"] >= c["dsir_mean_lw_pool"]
    shards = spark.read.parquet(str(tmp_path / "shards"))
    assert shards.count() == c["after_decontam"]
    assert set(shards.columns) == {"doc_id", "text", "shard", "n_tokens", "bin_id"}
    # profile stage: the synthetic documents table has no null text
    assert c["text_nulls"] == 0
    # clean stage ran; the synthetic corpus is already clean
    assert c["texts_cleaned"] == 0
    # learned filter audit: the classifier separates real docs from
    # their scrambled twins on held-out groups (fluency is learnable)
    assert 0.7 < c["filter_auc"] <= 1.0
    # CCNet bucket audit over the combined real+scrambled pool: the
    # head (best LM third) is dominated by real docs, not scrambles
    assert c["ccnet_real_head"] > c["ccnet_scrambled_head"]
    assert c["ccnet_real_head"] > 0
    # published-rule audit ran and kept a sane majority
    assert 0 < c["gopher_kept"] <= c["raw"]
    # isotonic calibration: the held-out Brier score must not degrade
    # beyond noise, and the curve actually pooled (1 <= blocks <= n)
    assert c["iso_blocks"] >= 1
    assert c["brier_calibrated"] <= c["brier_raw"] + 0.02
    # ECE reported for both; bounded (isotonic usually improves it,
    # but a small held-out set can wiggle — loose pin, audit not vow)
    assert 0.0 <= c["ece_calibrated"] <= 1.0
    assert 0.0 <= c["ece_raw"] <= 1.0
    # stupid-backoff audit: real docs out-score their scrambles, and
    # the separation is visible in backoff DEPTH (trigram hit rate),
    # with no OOV on the shared closed vocabulary
    assert c["backoff_real_mean"] > c["backoff_scrambled_mean"]
    assert c["backoff_real_tri_frac"] > c["backoff_scrambled_tri_frac"]
    assert c["backoff_real_oov_frac"] == 0.0
    # denoising objective: ~15% of BPE tokens masked, none lost
    assert 0 < c["denoise_masked"] < c["bpe_tokens"]
    assert c["denoise_conserved"] is True
    # drift audit: curation reshapes the length distribution some, but
    # not into a different corpus (sane PSI, not epsilon-dominated)
    assert 0.0 <= c["length_psi"] < 1.0
    # tokenizer stage: all requested merges learned, and BPE compresses
    # vs raw symbol count (chars + end-of-word markers)
    assert c["bpe_merges"] == 12
    assert c["bpe_tokens"] > 0
    # span dedup ran on the synthetic corpus (tiny vocab -> repeats
    # guaranteed) and actually removed tokens
    assert c["span_docs"] > 0 and c["tokens_masked"] > 0
    # trainer shards: a real vocab, >0 sequences, token conservation
    # through ids -> packing -> parquet round trip
    assert c["vocab_size"] > 0 and c["token_sequences"] > 0
    assert c["tokens_conserved"] is True


@pytest.mark.slow
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
    # monitors over the same landing stream: profile saw every landed
    # row with no nulls, the drift monitor produced a finite PSI (a
    # 15-doc reference is epsilon-noise-dominated — the e2e pins that
    # the monitor RUNS; the metric's calibration is tests/test_drift),
    # and every document got an LM score
    assert c["monitor_rows"] == c["ingested"]
    assert c["monitor_text_nulls"] == 0
    assert c["monitor_length_psi"] >= 0.0
    assert c["monitor_docs_scored"] == c["ingested"]
    # DSIR ingest weighting: every landed doc got a weight, and the
    # trusted wave-1 docs (the target itself) outweigh fresh wave-2
    # docs whose unique tokens the target never saw
    assert c["monitor_dsir_weighed"] == c["ingested"]
    assert c["monitor_dsir_mean_lw_wave1"] > c["monitor_dsir_mean_lw_fresh"]
    # exact-key Bloom gate: every re-sent wave-1 text flags "maybe
    # seen" (no false negatives), and most of wave 2 — whose texts are
    # all new keys, including the APPENDED near-dups the content index
    # catches instead — is "definitely new" (FPR-bounded)
    assert c["gate_resent_caught"] == c["gate_wave1_total"]
    assert c["gate_definitely_new"] >= 0.7 * c["gate_wave2_total"]


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
    # time travel: >= 4 landing commits retained pre-vacuum, the AS-OF
    # read of the second append was exact, and zero-grace vacuum left
    # only the current version's snapshot
    assert c["history_versions"] >= 4
    assert c["time_travel_v2_exact"] is True
    assert c["history_after_vacuum"] == 1
    assert c["snapshots_pruned"] >= 3
    # row-level ops: the merge patched the lookup key and inserted one
    # new order; the pruned delete purged keys 1..8; final row count
    # reconciles exactly
    assert c["merge_matched"] == 1 and c["merge_inserted"] == 1
    assert c["deleted_rows"] == 8
    assert c["row_ops_ok"] is True


def test_analytics_demo_end_to_end(spark):
    """Graph + sketch composition: sketches obey their guarantees
    (CMS one-sided, HLL registers non-degenerate, quantiles ordered)
    and the graph ranks are consistent with the sketch of the same
    stream."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    from analytics_demo import main

    out = main("/root/testdata/sf0.001", spark=spark)
    assert out["n_events"] > 0 and out["n_edges"] > 0
    # CMS one-sided guarantee on the top users
    assert all(est >= exact for exact, est in out["cms_top"].values())
    # quantile estimates must be monotone in q
    qs = out["quantiles"]
    assert qs[0.5] <= qs[0.9] <= qs[0.99]
    # hll raw estimate positive, registers not saturated
    assert out["hll_raw"] > 0 and 0 <= out["zero_registers"] < 256
    # pagerank top list is sorted desc and triangle counts non-negative
    ranks = [r for _, r, _ in out["pagerank_top"]]
    assert ranks == sorted(ranks, reverse=True)
    assert all(t >= 0 for _, _, t in out["pagerank_top"])
    # second-generation sketches: KMV estimate in the 4-sigma band of
    # the exact distinct count; jaccard in [0,1]; KLL quantiles
    # monotone and near the histogram sketch's on the same data;
    # priority-sampled subset total within half of truth.
    n_users = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select("user_id").distinct().count()
    assert abs(out["kmv_est_users"] - n_users) / n_users < 0.6
    assert 0.0 <= out["kmv_overlap_jaccard"] <= 1.0
    kq = out["kll_quantiles"]
    assert kq[0.5] <= kq[0.9] <= kq[0.99]
    est_v, true_v = out["sampled_purchase_value"]
    assert abs(est_v - true_v) <= 0.5 * true_v
    # exact heavy types obey the threshold: freq*10 > N
    assert all(f_ * 10 > out["n_events"] for f_ in out["heavy_types"].values())
    # funnel: reached counts shrink monotonically and conversions bound
    f = out["funnel"]
    assert f[1][0] >= f[2][0] >= f[3][0] >= 0
    assert f[1][0] > 0
    for step in (2, 3):
        if f[step][1] is not None:
            assert 0.0 <= f[step][1] <= 1.0
    # QTE bands bracket the point estimate at every reported ppm, and
    # the point column agrees with the plain QTE readout
    for ppm, (lo, mid, hi) in out["qte_bands"].items():
        assert lo <= mid <= hi
        assert mid == out["qte"][ppm]


def test_retrieval_demo_end_to_end(spark):
    """IVFADC shortlist -> exact re-rank -> recall audit -> hard
    negatives: re-ranking never loses recall vs plain ADC (same
    shortlist, exact ordering), and negatives never overlap declared
    positives."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    from retrieval_demo import main

    c = main("/root/testdata/sf0.001", spark=spark)
    assert 0.0 <= c["recall_adc_at_10"] <= 1.0
    assert c["recall_reranked_at_10"] >= c["recall_adc_at_10"]
    assert c["recall_reranked_at_10"] > 0.0
    # trec-style grading against the brute-force truth: every metric
    # bounded, and with binary relevance NDCG@10 cannot fall below
    # recall@10 of the same run (missing docs hurt NDCG at most as
    # much as the discount of the positions they'd fill)
    assert 0.0 < c["mrr"] <= 1.0
    assert 0.0 < c["map"] <= 1.0
    assert 0.0 < c["ndcg_at_10"] <= 1.0
    # RRF hybrid of the ADC ordering and the exact rerank: bounded
    # and non-degenerate (rank-only fusion needs no calibration; it
    # is not guaranteed to beat the better run, only audited)
    assert 0.0 < c["fused_mrr"] <= 1.0
    assert 0.0 < c["fused_ndcg_at_10"] <= 1.0
    assert c["recall_sq8_at_10"] >= 0.8  # 8 bits/dim is near-exact
    # PCA16 point on the curve: bounded, and recall cannot beat what
    # the captured energy allows by much on near-isotropic synthetics
    # (loose pin — the stage is an audit, not a guarantee)
    assert 0.0 < c["recall_pca16_at_10"] <= 1.0
    assert 0.0 < c["pca16_energy"] <= 1.0
    assert c["negatives"] == c["queries"] * 5
    assert c["negatives_overlapping_positives"] == 0


@pytest.mark.slow
def test_tokenizers_demo_end_to_end(spark):
    """The tokenizer bake-off: all three trainers produce working
    encoders on the same corpus — full coverage of the training set
    (zero WordPiece UNK), sane fertility (strictly above 1 piece/word
    once the unigram vocab is below the distinct-word count, and at
    most the character bound), and holdout fertility in the same
    ballpark (the synthetic corpus has a closed 31-word vocabulary,
    so generalization barely drifts)."""
    from tokenizers_demo import main

    s = main("/root/testdata/sf0.001", spark=spark)
    assert s["wordpiece_train_unk"] == 0
    assert s["wordpiece_holdout_unk"] == 0
    for k in ("bpe_fertility", "wordpiece_fertility", "unigram_fertility"):
        assert 1.0 < s[k] < 10.0, (k, s[k])
        hold = s[f"{k}_holdout"]
        assert abs(hold - s[k]) < 0.5, (k, s[k], hold)
    assert s["n_words_train"] > 0 and s["n_words_holdout"] > 0


def test_experimentation_demo_end_to_end(spark):
    """The experiment-platform composition: SRM gate passes on the
    designed split, multi-covariate CUPED beats single, the always-
    valid trajectory is monotone, sizing follows the 4x law, and the
    agreement sidebar returns defined statistics."""
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "examples"))
    from experimentation_demo import main

    out = main("/root/testdata/sf0.001", spark=spark)
    assert out["srm_p"] > 1e-3
    assert 0.0 < out["cuped1_vr"] <= out["cuped2_vr"] < 1.0
    ps = out["p_trajectory"]
    assert all(a >= b for a, b in zip(ps, ps[1:]))
    assert all(0.0 <= p <= 1.0 for p in ps)
    n_have = min(n for n, _, _ in out["arms"].values())
    assert 3.0 * n_have < out["n_for_half_mde"] < 5.0 * n_have
    assert math.isfinite(out["ratio_z"]) and out["ratio_se"] > 0
    assert 0.0 <= out["mwu_p"] <= 1.0
    # the HL interval brackets its point estimate
    assert out["hl_ci"][0] <= out["hl_shift"] <= out["hl_ci"][1]
    assert 0.0 <= out["logrank_p"] <= 1.0
    assert set(out["retention_medians"]) == {"control", "treat"}
    assert -1.0 <= out["kripp_alpha"] <= 1.0
    assert out["n_kappa_pairs"] > 0
