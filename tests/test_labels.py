"""Label aggregation (operators/labels.py): majority vote + worker
agreement against DuckDB oracles on the real documents table,
Dawid–Skene EM against an independent Python replica (exact-int
M-sums, tolerance on the float model), planted-truth recovery with a
label-flipping worker, bit-determinism under repartitioning, and the
loud-rejection contracts.
"""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.operators.labels import (
    _POST_SCALE,
    dawid_skene,
    majority_vote,
    worker_agreement,
)
from kafka_avro_order_processing_spark.sources.tables import load_table


def _doc_labels(spark, sf=SF_DIR):
    """(item, worker, label) derived from documents: docs bucketed to
    101 items, the source as the annotator, the lang as the vote."""
    return load_table(spark, sf, "documents").select(
        (F.col("doc_id") % 101).alias("item_id"),
        F.col("source").alias("worker_id"),
        F.col("lang").alias("label"),
    )


_MAJ_CTE = """
    WITH v AS (
      SELECT doc_id % 101 AS item_id, source AS worker_id, lang AS label
      FROM documents
    ), c AS (
      SELECT item_id, label, CAST(COUNT(*) AS BIGINT) AS n_votes
      FROM v GROUP BY item_id, label
    ), t AS (
      SELECT item_id, CAST(SUM(n_votes) AS BIGINT) AS n_total
      FROM c GROUP BY item_id
    ), r AS (
      SELECT c.item_id, c.label, c.n_votes, t.n_total,
             ROW_NUMBER() OVER (PARTITION BY c.item_id
                                ORDER BY c.n_votes DESC, c.label) AS rn
      FROM c JOIN t USING (item_id)
    )
"""


def test_majority_vote_duckdb_oracle(spark):
    sdf = majority_vote(_doc_labels(spark))
    sql = _MAJ_CTE + """
    SELECT item_id, label, n_votes, n_total,
           CAST(n_votes AS DOUBLE) / CAST(n_total AS DOUBLE) AS vote_frac
    FROM r WHERE rn = 1
    """
    _assert_parity(sdf, sql)


def test_worker_agreement_duckdb_oracle(spark):
    sdf = worker_agreement(_doc_labels(spark))
    sql = _MAJ_CTE + """
    , win AS (SELECT item_id, label AS maj FROM r WHERE rn = 1)
    SELECT v.worker_id,
           CAST(COUNT(*) AS BIGINT) AS n_labels,
           CAST(SUM(CASE WHEN v.label = w.maj THEN 1 ELSE 0 END) AS BIGINT)
             AS n_agree,
           CAST(SUM(CASE WHEN v.label = w.maj THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS agree_rate
    FROM v JOIN win w USING (item_id)
    GROUP BY v.worker_id
    """
    _assert_parity(sdf, sql)


def test_majority_tiebreak_is_smallest_label(spark):
    df = spark.createDataFrame(
        [(1, "w1", "b"), (1, "w2", "a"), (2, "w1", "z")],
        "item_id long, worker_id string, label string",
    )
    got = {r["item_id"]: r for r in majority_vote(df).collect()}
    assert got[1]["label"] == "a" and got[1]["n_votes"] == 1
    assert got[1]["n_total"] == 2
    assert got[2]["label"] == "z" and got[2]["vote_frac"] == 1.0


# ---------------------------------------------------------------------------
# Dawid–Skene
# ---------------------------------------------------------------------------

# 12 items, truth alternates a/b; two reliable workers, one FLIPPER
# (always wrong), one mostly-right worker.  Majority (3v1 or 2v2 with
# the flipper+noisy aligned) stays correct; DS must also identify the
# flipper's inverted confusion matrix.
TRUTH = {i: ("a" if i % 2 == 0 else "b") for i in range(12)}


def _flip(v):
    return "b" if v == "a" else "a"


def _crafted_rows():
    rows = []
    for i, t in TRUTH.items():
        rows.append((i, "good1", t))
        rows.append((i, "good2", t))
        rows.append((i, "flipper", _flip(t)))
        rows.append((i, "noisy", _flip(t) if i in (0, 5) else t))
    return rows


def _crafted(spark):
    return spark.createDataFrame(
        _crafted_rows(), "item_id long, worker_id string, label string"
    )


def test_ds_recovers_planted_truth_and_flipper(spark):
    posts, model = dawid_skene(_crafted(spark), n_iter=8)
    mapped = {
        r["item_id"]: r["label"]
        for r in posts.filter("map_label").collect()
    }
    assert mapped == TRUTH
    pi = {w: np.array(m) for w, m in model["pi"].items()}
    # flipper: off-diagonal mass dominates both true-class rows
    assert pi["flipper"][0, 1] > 0.9 and pi["flipper"][1, 0] > 0.9
    # reliable workers: diagonal dominates
    for w in ("good1", "good2"):
        assert pi[w][0, 0] > 0.9 and pi[w][1, 1] > 0.9
    # posteriors are confident and classes ordered as collected
    assert model["classes"] == ["a", "b"]
    top = {r["item_id"]: r["posterior"] for r in posts.filter("map_label").collect()}
    assert min(top.values()) > 0.9


def test_ds_bit_identical_under_repartitioning(spark):
    df = _crafted(spark)
    p1, m1 = dawid_skene(df, n_iter=4)
    p2, m2 = dawid_skene(df.repartition(7), n_iter=4)
    r1 = sorted(tuple(r) for r in p1.collect())
    r2 = sorted(tuple(r) for r in p2.collect())
    assert r1 == r2  # exact — quantized integers all the way through
    assert m1["log_prior"] == m2["log_prior"]
    assert m1["pi"] == m2["pi"]


def _ds_replica(rows, n_iter, alpha=0.01):
    """Independent pure-Python replica of the quantized EM: the same
    integer M-sums and fixed-order driver divisions, per-item E-step
    folded in (worker, label) order."""
    from collections import defaultdict

    counts = defaultdict(int)
    for i, w, v in rows:
        counts[(i, w, v)] += 1
    classes = sorted({v for _, _, v in rows})
    k = len(classes)
    idx = {c: j for j, c in enumerate(classes)}
    items = sorted({i for i, _, _ in rows})
    by_item = defaultdict(list)
    for (i, w, v), n in counts.items():
        by_item[i].append((w, v, n))
    for i in by_item:
        by_item[i].sort(key=lambda t: (t[0], t[1]))

    def posts_for(model):
        out = {}
        for i in items:
            if model is None:
                v = np.zeros(k)
                for w, lab, n in by_item[i]:
                    v[idx[lab]] += n
                post = v / v.sum()
            else:
                s = model["log_prior"].copy()
                for w, lab, n in by_item[i]:
                    s = s + float(n) * model["log_pi"][w][:, idx[lab]]
                s -= s.max()
                e = np.exp(s)
                post = e / e.sum()
            out[i] = np.floor(post * _POST_SCALE + 0.5).astype(np.int64)
        return out

    model = None
    for _ in range(n_iter):
        pq = posts_for(model)
        prior_sums = [0] * k
        conf = defaultdict(lambda: [[0] * k for _ in range(k)])
        for i in items:
            for j in range(k):
                prior_sums[j] += int(pq[i][j])
            for w, lab, n in by_item[i]:
                for j in range(k):
                    conf[w][j][idx[lab]] += n * int(pq[i][j])
        tot = sum(prior_sums)
        log_prior = np.array(
            [
                math.log((float(p) + alpha * _POST_SCALE)
                         / (float(tot) + k * alpha * _POST_SCALE))
                for p in prior_sums
            ]
        )
        log_pi = {}
        for w in sorted(conf, key=str):
            lp = np.empty((k, k))
            for j in range(k):
                denom = float(sum(conf[w][j]))
                for o in range(k):
                    lp[j, o] = math.log(
                        (float(conf[w][j][o]) + alpha * _POST_SCALE)
                        / (denom + k * alpha * _POST_SCALE)
                    )
            log_pi[w] = lp
        model = {"log_prior": log_prior, "log_pi": log_pi}
    return classes, posts_for(model), model


def test_ds_matches_python_replica(spark):
    rows = _crafted_rows()
    posts, model = dawid_skene(_crafted(spark), n_iter=5)
    classes, rep_posts, rep_model = _ds_replica(rows, n_iter=5)
    assert model["classes"] == classes
    got = {
        (r["item_id"], r["label"]): r["posterior"]
        for r in posts.collect()
    }
    for i, pq in rep_posts.items():
        for j, c in enumerate(classes):
            want = int(pq[j]) / _POST_SCALE
            assert got[(i, c)] == pytest.approx(want, abs=1e-9), (i, c)
    for j in range(len(classes)):
        assert model["log_prior"][j] == pytest.approx(
            float(rep_model["log_prior"][j]), abs=1e-9
        )


def test_ds_and_vote_validation(spark):
    df = _crafted(spark)
    with pytest.raises(ValueError, match="n_iter"):
        dawid_skene(df, n_iter=0)
    with pytest.raises(ValueError, match="alpha"):
        dawid_skene(df, alpha=0.0)
    one_class = spark.createDataFrame(
        [(1, "w", "a"), (2, "w", "a")],
        "item_id long, worker_id string, label string",
    )
    with pytest.raises(ValueError, match="distinct"):
        dawid_skene(one_class)
    withnull = spark.createDataFrame(
        [(1, "w", "a"), (2, None, "b")],
        "item_id long, worker_id string, label string",
    )
    # single-pass in-plan rejection: lazy call, loud action
    lazy = majority_vote(withnull)
    with pytest.raises(Exception, match="NULL"):
        lazy.collect()
    with pytest.raises(Exception, match="NULL"):
        dawid_skene(withnull)


# ------------------------------------------------- agreement statistics

from kafka_avro_order_processing_spark.operators.labels import (  # noqa: E402
    cohen_kappa,
    fleiss_kappa,
    krippendorff_alpha_nominal,
    pairwise_cohen_kappa,
)


def _dedup_doc_labels(spark):
    """One label per (item, worker): MIN(label) over the doc buckets —
    a valid contingency frame both engines can derive identically."""
    return (
        _doc_labels(spark)
        .groupBy("item_id", "worker_id")
        .agg(F.min("label").alias("label"))
    )


def test_cohen_kappa_hand_computed(spark):
    # confusion: AA=4, AB=1, BA=2, BB=3 -> n=10, agree=7
    # rowsums: A=5, B=5; colsums: A=6, B=4; pe_num = 5*6 + 5*4 = 50
    # kappa = (10*7 - 50) / (100 - 50) = 20/50 = 0.4
    rows = (
        [(i, "w1", "A") for i in range(5)]
        + [(i, "w2", "A") for i in range(4)] + [(4, "w2", "B")]
        + [(i, "w1", "B") for i in range(5, 10)]
        + [(5, "w2", "A"), (6, "w2", "A")]
        + [(i, "w2", "B") for i in range(7, 10)]
    )
    df = spark.createDataFrame(rows, "item_id long, worker_id string, label string")
    out = cohen_kappa(df, "w1", "w2")
    assert out["n_items"] == 10
    assert out["po"] == 0.7
    assert out["pe"] == 0.5
    assert out["kappa"] == 0.4


def test_cohen_kappa_edges(spark):
    ids = list(range(8))
    perfect = spark.createDataFrame(
        [(i, w, "L" + str(i % 3)) for i in ids for w in ("a", "b")],
        "item_id long, worker_id string, label string",
    )
    assert cohen_kappa(perfect, "a", "b")["kappa"] == 1.0
    # degenerate: both constant and identical -> pe = 1 -> NaN
    const = spark.createDataFrame(
        [(i, w, "X") for i in ids for w in ("a", "b")],
        "item_id long, worker_id string, label string",
    )
    assert math.isnan(cohen_kappa(const, "a", "b")["kappa"])
    # duplicate (worker, item) labels raise
    dup = perfect.union(
        spark.createDataFrame([(0, "a", "L9")],
                              "item_id long, worker_id string, label string")
    )
    with pytest.raises(ValueError, match="more than once"):
        cohen_kappa(dup, "a", "b")
    # disjoint item sets raise (no shared items)
    disj = spark.createDataFrame(
        [(1, "a", "X"), (2, "b", "X")],
        "item_id long, worker_id string, label string",
    )
    with pytest.raises(ValueError, match="share no items"):
        cohen_kappa(disj, "a", "b")


@pytest.mark.slow
def test_pairwise_matches_scalar_kappa(spark):
    df = _dedup_doc_labels(spark)
    table = {
        (r["worker_a"], r["worker_b"]): r
        for r in pairwise_cohen_kappa(df).collect()
    }
    # expected pair set = worker pairs that actually SHARE >= 1 item
    # (the scalar form raises on disjoint pairs; the table omits them)
    by_item: dict = {}
    for r in df.collect():
        by_item.setdefault(r["item_id"], set()).add(r["worker_id"])
    want_pairs = {
        (a, b)
        for ws in by_item.values()
        for a in ws
        for b in ws
        if a < b
    }
    assert set(table) == want_pairs
    for wa, wb in sorted(want_pairs)[:25]:  # scalar re-check on a prefix
        want = cohen_kappa(df, wa, wb)
        got = table[(wa, wb)]
        assert got["n_items"] == want["n_items"]
        assert got["kappa"] == want["kappa"], (wa, wb)


def test_pairwise_kappa_duckdb_oracle(spark):
    sdf = pairwise_cohen_kappa(_dedup_doc_labels(spark))
    sql = """
    WITH one AS (
      SELECT doc_id % 101 AS item_id, source AS worker_id,
             MIN(lang) AS label
      FROM documents GROUP BY 1, 2
    ), p AS (
      SELECT a.worker_id AS wa, b.worker_id AS wb,
             a.label AS la, b.label AS lb
      FROM one a JOIN one b USING (item_id)
      WHERE a.worker_id < b.worker_id
    ), base AS (
      SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS n_items,
             CAST(SUM(CASE WHEN la = lb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_agree
      FROM p GROUP BY wa, wb
    ), ma AS (
      SELECT wa, wb, la AS l, CAST(COUNT(*) AS BIGINT) AS ca
      FROM p GROUP BY wa, wb, la
    ), mb AS (
      SELECT wa, wb, lb AS l, CAST(COUNT(*) AS BIGINT) AS cb
      FROM p GROUP BY wa, wb, lb
    ), pe AS (
      SELECT ma.wa, ma.wb, CAST(SUM(ca * cb) AS BIGINT) AS pe_num
      FROM ma JOIN mb ON ma.wa = mb.wa AND ma.wb = mb.wb AND ma.l = mb.l
      GROUP BY ma.wa, ma.wb
    )
    SELECT base.wa AS worker_a, base.wb AS worker_b, n_items, n_agree,
           CAST(COALESCE(pe_num, 0) AS BIGINT) AS pe_num,
           CASE WHEN n_items * n_items - COALESCE(pe_num, 0) <> 0 THEN
             CAST(n_items * n_agree - COALESCE(pe_num, 0) AS DOUBLE)
             / CAST(n_items * n_items - COALESCE(pe_num, 0) AS DOUBLE)
           END AS kappa
    FROM base LEFT JOIN pe ON base.wa = pe.wa AND base.wb = pe.wb
    """
    _assert_parity(sdf, sql)


def test_pairwise_no_shared_label_pair_is_zero_not_missing(spark):
    rows = [(i, "a", "X") for i in range(4)] + [(i, "b", "Y") for i in range(4)]
    df = spark.createDataFrame(rows, "item_id long, worker_id string, label string")
    out = pairwise_cohen_kappa(df).collect()
    assert len(out) == 1
    assert out[0]["pe_num"] == 0 and out[0]["kappa"] == 0.0


def _pair_replica_po(items):
    """Observed agreement by brute-force pair counting (the
    independent formulation both Fleiss and Krippendorff reduce to)."""
    agree = tot = 0
    for labs in items.values():
        n = len(labs)
        for i in range(n):
            for j in range(n):
                if i != j:
                    tot += 1
                    agree += labs[i] == labs[j]
    return agree, tot


def test_fleiss_kappa_replica_and_validation(spark):
    # constant panel of 4 raters over 12 items, 3 classes, deterministic
    rows = []
    items: dict = {}
    for i in range(12):
        labs = []
        for w in range(4):
            lab = "c" + str((i * 7 + w * w) % 3)
            rows.append((i, f"w{w}", lab))
            labs.append(lab)
        items[i] = labs
    df = spark.createDataFrame(rows, "item_id long, worker_id string, label string")
    out = fleiss_kappa(df)
    agree, tot = _pair_replica_po(items)
    from fractions import Fraction

    po = Fraction(agree, tot)
    n_all = [l for labs in items.values() for l in labs]
    pe = sum(
        Fraction(n_all.count(c), len(n_all)) ** 2 for c in set(n_all)
    )
    want = float((po - pe) / (1 - pe))
    assert out["po"] == float(po)
    assert abs(out["pe"] - float(pe)) < 1e-15
    assert abs(out["kappa"] - want) < 1e-12
    assert out["n_raters"] == 4 and out["n_items"] == 12
    # ragged panel raises and names the alternative
    ragged = df.union(
        spark.createDataFrame([(0, "w9", "c0")],
                              "item_id long, worker_id string, label string")
    )
    with pytest.raises(ValueError, match="krippendorff"):
        fleiss_kappa(ragged)


def test_krippendorff_hand_case_and_replica(spark):
    # u1: A,A,B ; u2: A,A  ->  Do = 0.4, De = 0.4, alpha = 0 exactly
    rows = [(1, "a", "A"), (1, "b", "A"), (1, "c", "B"),
            (2, "a", "A"), (2, "b", "A")]
    df = spark.createDataFrame(rows, "item_id long, worker_id string, label string")
    out = krippendorff_alpha_nominal(df)
    assert out["n_values"] == 5 and out["n_items"] == 2
    assert out["do"] == 0.4 and out["de"] == 0.4
    assert out["alpha"] == 0.0
    # replica on a ragged deterministic frame
    rows2 = []
    items: dict = {}
    for i in range(30):
        k = 2 + (i % 4)  # 2..5 raters
        labs = []
        for w in range(k):
            lab = "c" + str((i + w * 3) % 4)
            rows2.append((i, f"w{w}", lab))
            labs.append(lab)
        items[i] = labs
    df2 = spark.createDataFrame(rows2, "item_id long, worker_id string, label string")
    got = krippendorff_alpha_nominal(df2)
    # brute-force: Do = within-item disagreeing pair rate (weighted by
    # 1/(n_u - 1)), De = all-values disagreeing pair rate
    from fractions import Fraction

    dsum = Fraction(0)
    n = 0
    for labs in items.values():
        nu = len(labs)
        n += nu
        dis = sum(
            1 for i in range(nu) for j in range(nu)
            if i != j and labs[i] != labs[j]
        )
        dsum += Fraction(dis, nu - 1)
    do = dsum / n
    allv = [l for labs in items.values() for l in labs]
    dis_all = sum(
        1 for i in range(len(allv)) for j in range(len(allv))
        if i != j and allv[i] != allv[j]
    )
    de = Fraction(dis_all, n * (n - 1))
    want = float(1 - do / de)
    assert got["alpha"] == want          # EXACT: Fraction assembly
    assert got["do"] == float(do)
    # single-rating items are excluded and cannot move the statistic
    plus = df2.union(
        spark.createDataFrame([(900, "w0", "c0"), (901, "w1", "c3")],
                              "item_id long, worker_id string, label string")
    )
    got2 = krippendorff_alpha_nominal(plus)
    assert got2["alpha"] == got["alpha"]
    # perfect agreement -> alpha exactly 1
    perf = spark.createDataFrame(
        [(i, w, "L") if False else (i, w, "L" + str(i % 2))
         for i in range(6) for w in ("a", "b", "c")],
        "item_id long, worker_id string, label string",
    )
    assert krippendorff_alpha_nominal(perf)["alpha"] == 1.0


# --------------------------------------------------- streaming twin

from kafka_avro_order_processing_spark.streaming.labels import (  # noqa: E402
    streaming_dawid_skene,
)


def _stream_from_dir(spark, d, schema):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )


@pytest.mark.slow
def test_streaming_ds_bit_matches_batch(spark, tmp_path):
    """The count table is the EM's sufficient statistic, so the
    streaming fit over the drained update-mode counts must BIT-match
    batch — posteriors, MAP flags, and every model float — across
    multiple micro-batches, and again after more label files land
    (the incremental-refresh tick)."""
    df = _crafted(spark)
    d = str(tmp_path / "labels")
    df.repartition(3).write.parquet(d)

    def fit_stream():
        return streaming_dawid_skene(
            _stream_from_dir(spark, d, df.schema), n_iter=6
        )

    def fit_batch():
        return dawid_skene(spark.read.parquet(d), n_iter=6)

    def canon(posts):
        return sorted(tuple(r) for r in posts.collect())

    s_posts, s_model = fit_stream()
    b_posts, b_model = fit_batch()
    assert canon(s_posts) == canon(b_posts)
    assert s_model == b_model
    # refresh tick: two more files of labels (a new worker appears)
    extra = spark.createDataFrame(
        [(i, "late", t) for i, t in TRUTH.items()],
        "item_id long, worker_id string, label string",
    )
    extra.repartition(2).write.mode("append").parquet(d)
    s_posts2, s_model2 = fit_stream()
    b_posts2, b_model2 = fit_batch()
    assert canon(s_posts2) == canon(b_posts2)
    assert s_model2 == b_model2
    assert "late" in s_model2["pi"] and "late" not in s_model["pi"]


def test_streaming_ds_null_rejected_in_plan(spark, tmp_path):
    bad = spark.createDataFrame(
        [(1, "w", "a"), (2, None, "b")],
        "item_id long, worker_id string, label string",
    )
    d = str(tmp_path / "bad")
    bad.write.parquet(d)
    with pytest.raises(Exception, match="NULL"):
        streaming_dawid_skene(
            _stream_from_dir(spark, d, bad.schema), n_iter=2
        )


def test_krippendorff_interval_hand_case_and_replica(spark):
    from kafka_avro_order_processing_spark.operators.labels import (
        krippendorff_alpha_interval,
    )

    # u1: 1,2 -> pairwise 2*(1)^2 = 2 over den 1; u2: 3,3 -> 0
    # n=4, De = 2*(4*23 - 81)/12 = 22/12 -> alpha = 1 - (1/2)/(11/6) = 8/11
    rows = [(1, "a", 1.0), (1, "b", 2.0), (2, "a", 3.0), (2, "b", 3.0)]
    df = spark.createDataFrame(rows, "item_id long, worker_id string, value double")
    out = krippendorff_alpha_interval(df)
    from fractions import Fraction

    assert out["n_values"] == 4 and out["n_items"] == 2
    assert out["do"] == 0.5
    assert out["de"] == float(Fraction(22, 12))
    assert out["alpha"] == float(Fraction(8, 11))
    # ragged deterministic frame vs a brute-force pair replica — EXACT
    rows2 = []
    items: dict = {}
    for i in range(25):
        k = 2 + (i % 4)
        vals = [float((i * 3 + w * w) % 9) for w in range(k)]
        for w, v in enumerate(vals):
            rows2.append((i, f"w{w}", v))
        items[i] = vals
    df2 = spark.createDataFrame(rows2, "item_id long, worker_id string, value double")
    got = krippendorff_alpha_interval(df2)
    sb = 1 << 20
    q = lambda v: int(v) * sb  # integer values quantize exactly  # noqa: E731
    do = Fraction(0)
    n = 0
    for vals in items.values():
        nu = len(vals)
        n += nu
        d = sum(
            (q(a) - q(b)) ** 2 for i, a in enumerate(vals)
            for j, b in enumerate(vals) if i != j
        )
        do += Fraction(d, nu - 1)
    do /= n
    allq = [q(v) for vals in items.values() for v in vals]
    de = Fraction(
        sum((a - b) ** 2 for i, a in enumerate(allq)
            for j, b in enumerate(allq) if i != j),
        n * (n - 1),
    )
    assert got["alpha"] == float(1 - do / de)
    # invariances with integer-valued ratings: shift and scale cancel
    shifted = krippendorff_alpha_interval(
        df2.withColumn("value", F.col("value") + 5.0)
    )
    doubled = krippendorff_alpha_interval(
        df2.withColumn("value", F.col("value") * 2.0)
    )
    assert shifted["alpha"] == got["alpha"]
    assert doubled["alpha"] == got["alpha"]
    # and repartitioning cannot move a bit
    again = krippendorff_alpha_interval(df2.repartition(9))
    assert again == got


def test_krippendorff_interval_edges(spark):
    from kafka_avro_order_processing_spark.operators.labels import (
        krippendorff_alpha_interval,
    )

    # perfect agreement -> Do = 0 -> alpha = 1 exactly
    perf = spark.createDataFrame(
        [(i, w, float(i % 3)) for i in range(6) for w in ("a", "b", "c")],
        "item_id long, worker_id string, value double",
    )
    assert krippendorff_alpha_interval(perf)["alpha"] == 1.0
    # constant column -> De = 0 -> NaN (undefined, not a crash)
    const = spark.createDataFrame(
        [(i, w, 2.0) for i in range(4) for w in ("a", "b")],
        "item_id long, worker_id string, value double",
    )
    assert math.isnan(krippendorff_alpha_interval(const)["alpha"])
    with pytest.raises(Exception, match="NULL"):
        krippendorff_alpha_interval(
            spark.createDataFrame(
                [(1, "a", 1.0), (1, "b", None)],
                "item_id long, worker_id string, value double",
            )
        )
    with pytest.raises(ValueError, match="scale_bits"):
        krippendorff_alpha_interval(perf, scale_bits=44)
    with pytest.raises(ValueError, match=">= 2"):
        krippendorff_alpha_interval(
            spark.createDataFrame(
                [(1, "a", 1.0), (2, "b", 2.0)],
                "item_id long, worker_id string, value double",
            )
        )


@pytest.mark.slow
def test_krippendorff_ordinal_hand_case_and_replica(spark):
    from fractions import Fraction

    from kafka_avro_order_processing_spark.operators.labels import (
        krippendorff_alpha_ordinal,
    )

    # ordered scale lo < mid < hi; ragged panels; replica from the
    # published ordinal delta over GLOBAL pairable frequencies
    rows = []
    items: dict = {}
    scale = ["a_lo", "b_mid", "c_hi"]
    for i in range(20):
        kk = 2 + (i % 3)
        labs = [scale[(i + w * w) % 3] for w in range(kk)]
        for w, lab in enumerate(labs):
            rows.append((i, f"w{w}", lab))
        items[i] = labs
    df = spark.createDataFrame(rows, "item_id long, worker_id string, label string")
    got = krippendorff_alpha_ordinal(df)

    allv = [l for labs in items.values() for l in labs]
    n = len(allv)
    freq = {c: allv.count(c) for c in scale}

    def delta(a, b):
        ia, ib = sorted((scale.index(a), scale.index(b)))
        if ia == ib:
            return Fraction(0)
        mid = sum(freq[scale[x]] for x in range(ia, ib + 1))
        return (Fraction(mid) - Fraction(freq[a] + freq[b], 2)) ** 2

    do = Fraction(0)
    for labs in items.values():
        nu = len(labs)
        d = sum(
            delta(labs[i], labs[j])
            for i in range(nu) for j in range(nu) if i != j
        )
        do += Fraction(d, nu - 1)
    do /= n
    de = Fraction(
        sum(delta(allv[i], allv[j])
            for i in range(n) for j in range(n) if i != j),
        n * (n - 1),
    )
    assert got["alpha"] == float(1 - do / de)  # EXACT
    assert got["do"] == float(do)
    assert got["de"] == float(de)
    # single-category items count in n but add zero disagreement
    plus = df.union(
        spark.createDataFrame(
            [(800, "w0", "b_mid"), (800, "w1", "b_mid")],
            "item_id long, worker_id string, label string",
        )
    )
    got2 = krippendorff_alpha_ordinal(plus)
    assert got2["n_values"] == got["n_values"] + 2
    # perfect agreement -> alpha = 1 exactly
    perf = spark.createDataFrame(
        [(i, w, scale[i % 3]) for i in range(9) for w in ("x", "y")],
        "item_id long, worker_id string, label string",
    )
    assert krippendorff_alpha_ordinal(perf)["alpha"] == 1.0
    # with a BINARY scale, ordinal == nominal up to the delta scaling
    # (only one pair -> both reduce to the same 0/1 structure)
    from kafka_avro_order_processing_spark.operators.labels import (
        krippendorff_alpha_nominal,
    )

    binary = spark.createDataFrame(
        [(i, f"w{w}", scale[(i + w) % 2]) for i in range(12)
         for w in range(2 + i % 2)],
        "item_id long, worker_id string, label string",
    )
    a_ord = krippendorff_alpha_ordinal(binary)["alpha"]
    a_nom = krippendorff_alpha_nominal(binary)["alpha"]
    assert abs(a_ord - a_nom) < 1e-12  # constant delta cancels
    with pytest.raises(ValueError, match="max_categories"):
        krippendorff_alpha_ordinal(df, max_categories=2)
