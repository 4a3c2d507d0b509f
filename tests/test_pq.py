"""Product quantization: codebook/encode/ADC sanity plus the
partitioning-independence contract (every cross-row float reduction is
either decimal-exact or pivoted to fixed order, so the result cannot
depend on how the input is split).

Reference behavior target: none (the reference engine has no vector
ops) — this is the M5 ANN-at-memory-scale path complementing the IVF
partition-pruning queries.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.similarity import (
    pq_codebooks,
    pq_subvectors,
    pq_topk,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_subvector_shapes(spark):
    emb = load_table(spark, SF, "embeddings")
    sub = pq_subvectors(emb, dim=64, m=4)
    n = emb.count()
    assert sub.count() == 4 * n
    lens = sub.select(F.size("svec").alias("l")).distinct().collect()
    assert [r["l"] for r in lens] == [16]


def test_codebooks_cover_subspaces(spark):
    emb = load_table(spark, SF, "embeddings")
    cb = pq_codebooks(pq_subvectors(emb, dim=64, m=4)).collect()
    by_sub: dict[int, int] = {}
    for r in cb:
        by_sub[r["sub"]] = by_sub.get(r["sub"], 0) + 1
        assert len(r["cent"]) == 16
    assert set(by_sub) == {0, 1, 2, 3}
    assert all(1 <= n <= 8 for n in by_sub.values())


def test_partitioning_independence(spark):
    emb = load_table(spark, SF, "embeddings")
    a = pq_topk(emb, dim=64)
    b = pq_topk(emb.repartition(7, F.col("vec_id")), dim=64)
    assert _rows(a) == _rows(b)


def test_planted_duplicate_is_nearest(spark):
    # A corpus with an exact clone of the query must rank the clone
    # first: identical sub-vectors take identical codes, so the clone's
    # ADC distance equals the query's own quantization error — the
    # minimum possible.  Random fillers (seeded) sit far away.
    import random

    rnd = random.Random(3)
    rows = []
    base = [rnd.uniform(-1, 1) for _ in range(64)]
    rows.append((0, [float(x) for x in base]))          # query
    rows.append((50, [float(x) for x in base]))         # exact clone
    for i in range(1, 40):
        rows.append((50 + i, [rnd.uniform(-1, 1) for _ in range(64)]))
    # seeds vec_id<8 must exist: add spread seed vectors 1..7
    for i in range(1, 8):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = pq_topk(emb, dim=64, n_queries=1, topk=3).collect()
    best = min(out, key=lambda r: r["rank"])
    assert best["neighbor_id"] == 50
    assert all(best["adc_dist"] <= r["adc_dist"] for r in out)


def test_adc_recall_floor(spark):
    # ADC is approximate, but on the small corpus with 8x4 codes it
    # must agree with exact L2 search on a healthy fraction of the
    # top-10 (empirically ~0.5+; floor set far below noise).
    from pyspark.sql import Window

    emb = load_table(spark, SF, "embeddings")
    approx = pq_topk(emb, dim=64, n_queries=5, topk=10)
    d = (
        "aggregate(zip_with(q_vec, c_vec, (x, y) ->"
        " (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))), 0D, (a, v) -> a + v)"
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.expr(d).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    exact = scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 10)
    hits = approx.join(exact, ["query_id", "neighbor_id"]).count()
    assert hits >= 10  # >= 0.2 recall over 50 slots


def test_registered_recall_query_matches_floor(spark):
    # The registered pq_recall_at_k row is the metric form of the
    # floor test above: 5 queries, each recall a multiple of 1/10 in
    # [0, 1], and the total must clear the same 0.2 floor.
    from kafka_avro_order_processing_spark.plans.registry import QUERIES

    rows = QUERIES["pq_recall_at_k"].fn(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        v = r["recall_at_10"]
        assert 0.0 <= v <= 1.0
        assert abs(v * 10 - round(v * 10)) < 1e-12
    assert sum(r["recall_at_10"] for r in rows) >= 0.2 * 5


def test_rerank_beats_or_ties_plain_adc(spark):
    # Two-stage retrieval: exact rescoring of the 50-candidate ADC
    # shortlist must agree with exact search at least as often as the
    # plain ADC top-10 does (re-ranking can only fix orderings, never
    # lose a shortlist member), and every rerank distance is an exact
    # distance, so overlapping pairs carry identical ranks source.
    from pyspark.sql import Window

    emb = load_table(spark, SF, "embeddings")
    d = (
        "aggregate(zip_with(q_vec, c_vec, (x, y) ->"
        " (cast(x as double) - cast(y as double))"
        " * (cast(x as double) - cast(y as double))), 0D, (a, v) -> a + v)"
    )
    q = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_vec")
    )
    c = emb.select(F.col("vec_id").alias("neighbor_id"), F.col("embedding").alias("c_vec"))
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id", F.expr(d).alias("dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"), F.asc("neighbor_id"))
    exact = scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 10
    ).select("query_id", "neighbor_id")

    from kafka_avro_order_processing_spark.plans.registry import QUERIES

    adc = QUERIES["pq_adc_topk"].fn(spark, SF).select("query_id", "neighbor_id")
    rerank = QUERIES["pq_rerank_topk"].fn(spark, SF).select("query_id", "neighbor_id")
    adc_hits = adc.join(exact, ["query_id", "neighbor_id"]).count()
    rr_hits = rerank.join(exact, ["query_id", "neighbor_id"]).count()
    assert rr_hits >= adc_hits
    assert rr_hits >= 10  # same floor as the ADC test, trivially cleared


# ---------------------------------------------------------------------------
# IVF-PQ composite (ivfpq_topk): cell pruning + ADC in one index.
# ---------------------------------------------------------------------------


def _py_cells_and_probes(rows, n_cells=8, n_probe=2, n_queries=None):
    """Independent pure-Python IVF reference: assignment = argmax cosine
    (tie -> smallest centroid id), probes = top-n_probe cells per query.
    Sequential left-fold sums in array order match Spark's aggregate()."""
    import math

    if n_queries is None:
        # derive from the operator's constant so the reference query
        # set cannot silently diverge from ivfpq_topk's default
        from kafka_avro_order_processing_spark.operators.similarity import (
            PQ_N_QUERIES,
        )

        n_queries = PQ_N_QUERIES
    cents = {i: v for i, v in rows if i < n_cells}

    def cos(a, b):
        dot = 0.0
        for x, y in zip(a, b):
            dot += x * y
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return dot / (na * nb)

    def ranked(v):
        return sorted(((-cos(v, c), cid) for cid, c in cents.items()))

    assign = {i: ranked(v)[0][1] for i, v in rows}
    probes = {
        i: {cid for _, cid in ranked(v)[:n_probe]}
        for i, v in rows
        if i < n_queries
    }
    return assign, probes


def test_ivfpq_candidates_within_probed_cells(spark):
    # The defining property of the composite index: no neighbor outside
    # the query's probed cells, ever — checked against an independent
    # Python IVF reference, not the operator's own assignment.
    from kafka_avro_order_processing_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, SF, "embeddings")
    rows = [(r["vec_id"], [float(x) for x in r["embedding"]]) for r in emb.collect()]
    assign, probes = _py_cells_and_probes(rows)
    out = ivfpq_topk(emb, dim=64).collect()
    assert out, "ivfpq returned nothing"
    for r in out:
        assert assign[r["neighbor_id"]] in probes[r["query_id"]], (
            r["query_id"],
            r["neighbor_id"],
        )


def test_ivfpq_adc_distances_match_global_pq(spark):
    # Same codebooks, same encoding, same fixed-order ADC sum: every
    # (query, neighbor) pair ivfpq emits must carry bit-identical
    # adc_dist in the unpruned pq_topk ranking.
    from kafka_avro_order_processing_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, SF, "embeddings")
    pruned = ivfpq_topk(emb, dim=64, topk=10)
    full = pq_topk(emb, dim=64, topk=500)
    j = pruned.alias("p").join(
        full.alias("f"), ["query_id", "neighbor_id"]
    ).select(
        F.col("p.adc_dist").alias("pa"), F.col("f.adc_dist").alias("fa")
    )
    n = pruned.count()
    assert j.count() == n  # every pruned pair exists globally
    assert j.filter(F.col("pa") != F.col("fa")).count() == 0


def test_ivfpq_planted_duplicate_is_nearest(spark):
    # The clone shares the query's cell (identical vector -> identical
    # assignment), the query's own cell is its top probe, and identical
    # codes give the minimum possible ADC distance.
    import random

    from kafka_avro_order_processing_spark.operators.similarity import ivfpq_topk

    rnd = random.Random(11)
    base = [rnd.uniform(-1, 1) for _ in range(64)]
    rows = [(0, [float(x) for x in base]), (50, [float(x) for x in base])]
    for i in range(1, 40):
        rows.append((50 + i, [rnd.uniform(-1, 1) for _ in range(64)]))
    for i in range(1, 8):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(64)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = ivfpq_topk(emb, dim=64, n_queries=1, topk=3).collect()
    best = min(out, key=lambda r: r["rank"])
    assert best["neighbor_id"] == 50


def test_ivfpq_partitioning_independence(spark):
    from kafka_avro_order_processing_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, SF, "embeddings")
    a = ivfpq_topk(emb, dim=64)
    b = ivfpq_topk(emb.repartition(7, F.col("vec_id")), dim=64)
    assert _rows(a) == _rows(b)


def _clustered_corpus(seed, n_clusters=8, per=12, dim=64, noise_dims=2, amp=4.0):
    """The regime where residual (IVFADC) encoding provably wins:
    #clusters == #codes, so GLOBAL codebooks get ~one code per cluster
    and zero within-cluster resolution, while RESIDUAL codebooks see
    only the pooled within-cluster variation — which is deliberately
    LOW-dimensional (noise in `noise_dims` dims), the structure real
    embedding manifolds have and isotropic noise lacks.  Ids are
    round-robin across clusters so the IVF seeds (ids < n_cells) span
    clusters; one IVF cell per cluster."""
    import random

    rnd = random.Random(seed)
    centers = [
        [rnd.uniform(-10, 10) for _ in range(dim)] for _ in range(n_clusters)
    ]
    pts = []
    for c in range(n_clusters):
        for _ in range(per):
            v = list(centers[c])
            for d in range(noise_dims):
                v[d] += rnd.uniform(-amp, amp)
            pts.append([float(x) for x in v])
    order = [pts[c * per + r] for r in range(per) for c in range(n_clusters)]
    return [(i, v) for i, v in enumerate(order)]


@pytest.mark.slow
def test_ivfpq_residual_beats_global_on_clustered_data(spark):
    # True IVFADC (residual=True) must both (a) approximate true
    # distances better and (b) recall more true neighbors than global
    # codebooks on the clustered corpus — pinned on two seeds.
    from kafka_avro_order_processing_spark.operators.similarity import ivfpq_topk

    def sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    for seed in (2, 5):
        rows = _clustered_corpus(seed)
        emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        vecs = dict(rows)
        n_q, kk = 4, 5
        exact = {
            qid: [
                nid
                for _, nid in sorted(
                    (sq(vecs[qid], v), i) for i, v in vecs.items() if i != qid
                )[:kk]
            ]
            for qid in range(n_q)
        }
        err, rec = {}, {}
        for residual in (False, True):
            out = ivfpq_topk(
                emb,
                dim=64,
                n_cells=8,
                n_probe=1,
                n_queries=n_q,
                topk=100,
                residual=residual,
            ).collect()
            err[residual] = sum(
                abs(r["adc_dist"] - sq(vecs[r["query_id"]], vecs[r["neighbor_id"]]))
                for r in out
            ) / len(out)
            top = [r for r in out if r["rank"] <= kk]
            rec[residual] = sum(
                1 for r in top if r["neighbor_id"] in exact[r["query_id"]]
            ) / (n_q * kk)
        assert err[True] < err[False], (seed, err)
        assert rec[True] > rec[False], (seed, rec)
        assert rec[True] >= 0.6


def test_residual_codebooks_are_not_degenerate(spark):
    # Regression: residual PQ seeds must skip ids < n_cells (those ARE
    # the centroids — zero residuals would collapse every codebook to
    # one code).  Every sub-space must end with > 1 distinct code used.
    from kafka_avro_order_processing_spark.operators.similarity import (
        _pq_assign,
        ivf_assign,
        pq_codebooks,
        pq_subvectors,
    )

    # isotropic noise (all 64 dims) so every sub-space has real
    # residual structure for the codebook to spread over
    rows = _clustered_corpus(1, noise_dims=64, amp=1.0)
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cents = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assign = ivf_assign(emb, cents)
    cvec = cents.select("centroid_id", F.col("embedding").alias("cent_vec"))
    res = (
        emb.join(assign, "vec_id")
        .join(F.broadcast(cvec), "centroid_id")
        .select(
            "vec_id",
            F.expr(
                "zip_with(embedding, cent_vec,"
                " (x, y) -> cast(x as double) - cast(y as double))"
            ).alias("embedding"),
        )
    )
    sub = pq_subvectors(res, 64, 4)
    books = pq_codebooks(sub, 8, seed_lo=8)
    codes = _pq_assign(sub, F.broadcast(books), "vec_id")
    used = {
        r["sub"]: r["n"]
        for r in codes.groupBy("sub")
        .agg(F.countDistinct("code").alias("n"))
        .collect()
    }
    assert set(used) == {0, 1, 2, 3}
    assert all(n > 1 for n in used.values()), used


def test_ivfpq_residual_partitioning_independence(spark):
    from kafka_avro_order_processing_spark.operators.similarity import ivfpq_topk

    emb = load_table(spark, SF, "embeddings")
    a = ivfpq_topk(emb, dim=64, residual=True)
    b = ivfpq_topk(emb.repartition(7, F.col("vec_id")), dim=64, residual=True)
    assert _rows(a) == _rows(b)
