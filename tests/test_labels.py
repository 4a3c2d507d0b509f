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
