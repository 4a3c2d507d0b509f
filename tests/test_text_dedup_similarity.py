"""Unit tests for the M5 operators on small, hand-checkable inputs."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.dedup import (
    exact_dedup,
    near_dup_pairs,
    simhash,
)
from kafka_avro_order_processing_spark.operators.multimodal import (
    binarize_text,
    decode_features,
    payload_metadata,
)
from kafka_avro_order_processing_spark.operators.similarity import (
    cosine_topk,
    ivf_assign,
)
from kafka_avro_order_processing_spark.operators.text import (
    doc_token_stats,
    quality_score,
)


def test_exact_dedup_finds_copies(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "x y z")], "doc_id long, text string"
    )
    got = {r["canonical_doc_id"]: r["n_copies"] for r in exact_dedup(docs).collect()}
    assert got == {1: 2, 3: 1}


def test_near_dup_detects_overlap(spark):
    base = "the quick brown fox jumps over the lazy dog again and again today"
    near = base.replace("today", "tonight")
    far = "completely different words with no overlap whatsoever in any shingle set"
    docs = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    pairs = {(r["doc_a"], r["doc_b"]): r for r in near_dup_pairs(docs).collect()}
    assert (1, 2) in pairs
    assert pairs[(1, 2)]["jaccard"] > 0.5
    assert all(3 not in p for p in pairs)


def test_simhash_similar_docs_close(spark):
    a = "spark batch stream join filter group window sort merge hash " * 3
    b = a + "extra token"
    c = "entirely unrelated vocabulary about cooking pasta sauce tomatoes basil"
    docs = spark.createDataFrame([(1, a.strip()), (2, b.strip()), (3, c)], "doc_id long, text string")
    fp = {r["doc_id"]: r["simhash"] for r in simhash(docs).collect()}
    ham_ab = bin(fp[1] ^ fp[2]).count("1")
    ham_ac = bin(fp[1] ^ fp[3]).count("1")
    assert ham_ab < ham_ac


def test_token_stats_and_quality(spark):
    docs = spark.createDataFrame([(1, "the cat sat on the mat")], "doc_id long, text string")
    s = doc_token_stats(docs).collect()[0]
    assert s["n_tokens"] == 6 and s["n_distinct_tokens"] == 5
    assert s["avg_token_len"] == pytest.approx((3 + 3 + 3 + 2 + 3 + 3) / 6)
    q = quality_score(docs).collect()[0]
    assert q["stopword_ratio"] == pytest.approx(2 / 6)
    assert 0.0 <= q["quality"] <= 1.0


def test_cosine_topk_orders_by_similarity(spark):
    vecs = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # closest to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [0.7, 0.3, 0.0]),
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    got = cosine_topk(df, df.filter(F.col("vec_id") == 0), k=3).collect()
    order = [r["neighbor_id"] for r in sorted(got, key=lambda r: r["rank"])]
    assert order == [1, 3, 2]
    top = next(r for r in got if r["rank"] == 1)
    assert top["cosine"] == pytest.approx(0.9 / math.sqrt(0.81 + 0.01), rel=1e-6)


def test_ivf_assign_nearest_centroid(spark):
    vecs = spark.createDataFrame(
        [(10, [1.0, 0.0]), (11, [0.0, 1.0]), (12, [0.9, 0.4])],
        "vec_id long, embedding array<float>",
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0])], "centroid_id int, embedding array<float>"
    )
    got = {r["vec_id"]: r["centroid_id"] for r in ivf_assign(vecs, cents).collect()}
    assert got == {10: 0, 11: 1, 12: 0}


def test_multimodal_metadata_and_stub_decode(spark):
    docs = spark.createDataFrame([(1, "hello world"), (2, "abc")], "doc_id long, text string")
    payloads = binarize_text(docs)
    meta = {r["doc_id"]: r for r in payload_metadata(payloads).collect()}
    assert meta[1]["byte_len"] == 11
    assert meta[1]["mime"] == "application/octet-stream"
    feats = {r["doc_id"]: r for r in decode_features(payloads).collect()}
    assert feats[1]["content_hash"] == meta[1]["content_hash"]
    assert 1 <= feats[1]["n_channels"] <= 3
    assert feats[1]["width"] >= 1 and feats[1]["height"] >= 1


def test_multimodal_magic_sniff(spark):
    png = bytearray(b"\x89PNG\r\n\x1a\n" + b"fakebody")
    jpg = bytearray(b"\xff\xd8\xff\xe0" + b"fakebody")
    df = spark.createDataFrame([(1, png), (2, jpg)], "doc_id long, payload binary")
    got = {r["doc_id"]: r["mime"] for r in payload_metadata(df).collect()}
    assert got == {1: "image/png", 2: "image/jpeg"}


def test_decode_stub_raises_without_decoder(spark):
    docs = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    payloads = binarize_text(docs)
    with pytest.raises(Exception, match="NotImplementedError|real media decode"):
        decode_features(payloads, decode_stub=False).collect()


def test_connected_components_clusters(spark):
    from kafka_avro_order_processing_spark.operators.graph import (
        connected_components,
    )

    # two components: {1,2,3} (chain) and {7,9}
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "src long, dst long"
    )
    got = {r["node"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}


def test_lsh_hot_bucket_cap_linear_pairs(spark):
    """A degenerate corpus (many identical docs) must not produce a
    quadratic candidate-pair count: oversized LSH buckets fall back to
    a star on the bucket-min id that keeps the set transitively
    connected with diameter 2."""
    from kafka_avro_order_processing_spark.operators.dedup import (
        MAX_BUCKET_SIZE,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from kafka_avro_order_processing_spark.operators.graph import (
        connected_components,
    )

    n = 300
    docs = spark.createDataFrame(
        [(f"doc_{i:04d}", "the same boilerplate text repeated everywhere here") for i in range(n)],
        "doc_id string, text string",
    )
    sigs = minhash_signatures(docs)
    pairs = lsh_candidate_pairs(sigs).persist()
    n_pairs = pairs.count()
    assert n > MAX_BUCKET_SIZE  # the corpus genuinely overflows a bucket
    assert n_pairs == n - 1, "expected one star on the bucket min, not all-pairs"
    comps = connected_components(pairs, "doc_a", "doc_b")
    assert comps.select("component").distinct().count() == 1
    pairs.unpersist()


def test_lsh_small_buckets_unchanged_by_cap(spark):
    """Buckets under the cap keep exact all-pairs semantics."""
    from kafka_avro_order_processing_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [
            ("a", "alpha beta gamma delta epsilon zeta"),
            ("b", "alpha beta gamma delta epsilon zeta"),
            ("c", "alpha beta gamma delta epsilon eta"),
            ("d", "totally different content entirely unrelated words"),
        ],
        "doc_id string, text string",
    )
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(minhash_signatures(docs)).collect()
    }
    assert ("a", "b") in pairs
    assert not any("d" in p for p in pairs)


def test_minhash_oracle_mirrors_bucket_cap(spark, tmp_path):
    """The DuckDB oracle must reproduce the hot-bucket star fallback,
    not just the all-pairs path — otherwise parity silently breaks the
    first time real data overflows a bucket (sf0.01 maxes at 4-member
    buckets, so the driver's run never exercises the cap; this test
    does, with a 120-identical-doc corpus)."""
    import duckdb

    from kafka_avro_order_processing_spark.operators.dedup import (
        MAX_BUCKET_SIZE,
        near_dup_pairs,
    )
    from kafka_avro_order_processing_spark.plans.registry import _minhash_oracle

    n_hot = 120
    assert n_hot > MAX_BUCKET_SIZE
    rows = [
        (i, "the same boilerplate text repeated for every mirror page")
        for i in range(n_hot)
    ] + [
        (500 + i, " ".join(f"w{i}_{j} unique content" for j in range(8)))
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs.parquet")
    df.coalesce(1).write.parquet(path)

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    got = sorted(
        (r["doc_a"], r["doc_b"], repr(r["est_jaccard"]), repr(r["jaccard"]))
        for r in near_dup_pairs(spark.read.parquet(path)).collect()
    )
    want = sorted(
        (a, b, repr(e), repr(j)) for a, b, e, j in con.execute(_minhash_oracle()).fetchall()
    )
    assert got == want
    # the hot bucket produced a linear star, not quadratic all-pairs
    assert len(got) == n_hot - 1


def test_hyperplane_lsh_finds_identical_vectors(spark):
    """Identical vectors share every sign bit, so they collide in all
    bands and come out with cosine exactly 1.0; an orthogonal one-hot
    basis has pairwise cosine 0 and should never pass the threshold."""
    from kafka_avro_order_processing_spark.operators.similarity import (
        embedding_lsh_near_dup,
    )

    dim = 16
    dup = [0.5] * dim
    rows = [(1, dup), (2, dup)] + [
        (10 + i, [1.0 if j == i else 0.0 for j in range(dim)]) for i in range(6)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r["vec_a"], r["vec_b"]): r["cosine"]
        for r in embedding_lsh_near_dup(df, dim=dim, threshold=0.9).collect()
    }
    assert got == {(1, 2): 1.0}


def test_hyperplane_signature_deterministic(spark):
    from kafka_avro_order_processing_spark.operators.similarity import (
        hyperplane_matrix,
        hyperplane_signatures,
    )

    assert hyperplane_matrix(4, 8) == hyperplane_matrix(4, 8)
    df = spark.createDataFrame(
        [(1, [1.0, -2.0, 0.5, 3.0])], "vec_id long, embedding array<float>"
    )
    a = hyperplane_signatures(df, dim=4, bits=8).collect()[0]
    b = hyperplane_signatures(df, dim=4, bits=8).collect()[0]
    assert a == b
    assert all(a[f"mh{j}"] in ("0", "1") for j in range(8))


def test_bm25_ranks_term_dense_docs_first(spark):
    """A doc saturated with the query terms must outrank one with a
    single hit; docs with no hits are absent; ranks are 1..k dense."""
    from kafka_avro_order_processing_spark.operators.text import bm25_topk

    rows = [
        (1, "join vector stream join vector stream join"),
        (2, "join filler filler filler filler filler filler"),
        (3, "nothing relevant here at all whatsoever truly"),
        (4, "vector stream filler filler filler filler filler"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = bm25_topk(df, ("join", "vector", "stream"), topk=10).collect()
    by_id = {r["doc_id"]: r for r in got}
    assert 3 not in by_id
    assert by_id[1]["rank"] == 1
    assert [r["rank"] for r in sorted(got, key=lambda r: r["rank"])] == list(
        range(1, len(got) + 1)
    )
    assert by_id[1]["bm25"] > by_id[2]["bm25"]


def test_kmeans_refine_partitions_all_vectors(spark):
    """Two well-separated clusters seeded with one vector from each:
    every vector lands in a cell, counts partition the corpus, and the
    refined centroid of a tight cluster has ~the cluster norm."""
    from kafka_avro_order_processing_spark.operators.similarity import kmeans_refine

    rows = [(0, [1.0, 0.0, 0.01 * 0]), (1, [0.0, 1.0, 0.0])] + [
        (2 + i, [1.0, 0.02 * i, 0.0]) for i in range(5)
    ] + [(10 + i, [0.01 * i, 1.0, 0.0]) for i in range(5)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["cell_id"]: r for r in kmeans_refine(df, k=2, iters=2).collect()}
    assert set(out) == {0, 1}
    assert out[0]["n_members"] + out[1]["n_members"] == len(rows)
    assert out[0]["n_members"] == 6 and out[1]["n_members"] == 6
    for r in out.values():
        assert 0.9 < r["centroid_norm"] < 1.2


def test_semantic_dedup_cluster_then_prune(spark):
    """Planted near-duplicates drop within their cell; distinct
    vectors survive; summary digests pin the dropped set."""
    from kafka_avro_order_processing_spark.operators.similarity import (
        semantic_dedup,
    )

    # two orthogonal seed directions (ids 0,1 double as centroids with
    # k=2); ids 10/11 are near-copies of seed 0, id 20 is a distinct
    # member of seed 1's cell
    vecs = spark.createDataFrame(
        [
            (0, [1.0, 0.0, 0.0]),
            (1, [0.0, 1.0, 0.0]),
            (10, [0.99, 0.05, 0.0]),     # near-dup of 0
            (11, [0.98, 0.0, 0.05]),     # near-dup of 0 (and of 10)
            (20, [0.05, 0.7, -0.7]),     # same cell as 1, not a dup
        ],
        "vec_id long, embedding array<float>",
    )
    out = {r.cell_id: r for r in semantic_dedup(vecs, k=2, threshold=0.9).collect()}
    assert out[0].n_members == 3 and out[1].n_members == 2
    # monotone rule: 10 and 11 drop (lower-id peer 0 within threshold)
    assert out[0].n_dropped == 2 and out[0].dropped_id_sum == 21
    # 20 is cosine ~0.71 from seed 1 -> below 0.9, survives
    assert out[1].n_dropped == 0 and out[1].dropped_id_sum == 0


def test_setsim_positional_filter_prunes_candidates(spark):
    """The PPJoin size/positional filters are work reduction: on a
    corpus where a tiny doc shares RARE shingles with much larger docs
    (whose own filler is common, so the shared shingle lands in both
    prefixes), plain prefix joining emits (tiny, big) candidates that
    can never pass Jaccard >= 1/2 — the size filter must kill them
    before verification, while the final result stays correct (the
    fuzz suite pins result equality; this pins that pruning engages)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from kafka_avro_order_processing_spark.operators.dedup import (
        set_similarity_join,
        shingle_rows,
    )

    a = [f"a{i}" for i in range(6)]          # doc 0: 6 tokens, 4 shingles
    filler = " ".join(f"f{j}" for j in range(40))  # common to all big docs
    rows = [(0, " ".join(a))] + [
        # big doc i starts with doc 0's i-th shingle window, then the
        # shared filler: the shared shingle has f=2 (rare), the filler
        # shingles have f=4 (common), so the shared one sorts into the
        # big doc's prefix.
        (i + 1, " ".join(a[i:i + 3]) + " " + filler)
        for i in range(4)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    sh = shingle_rows(df)
    freq = sh.groupBy("shingle").agg(F.count("*").alias("f"))
    sized = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    ordered = (
        sh.join(freq, "shingle")
        .join(sized, "doc_id")
        .withColumn(
            "pos",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy("f", "shingle")
            ),
        )
    )
    x = F.col("sz") * 1 + 1
    prefix = ordered.filter(
        F.col("pos") <= F.col("sz") - ((x - x % 2) / 2).cast("long") + 1
    )
    plain_doc0 = (
        prefix.select(F.col("doc_id").alias("a"), "shingle")
        .join(prefix.select(F.col("doc_id").alias("b"), "shingle"), "shingle")
        .filter((F.col("a") == 0) & (F.col("b") > 0))
        .select("a", "b")
        .distinct()
        .count()
    )
    # plain prefix joining DID generate (tiny, big) candidates...
    assert plain_doc0 >= 3
    # ...and the operator's size filter prunes them all before the
    # verify join: no doc-0 pair can reach Jaccard 1/2 at sizes 4 vs ~43
    out = set_similarity_join(df).collect()
    assert all(r["doc_a"] != 0 and r["doc_b"] != 0 for r in out)
    # the big docs legitimately match each other (shared filler)
    assert len(out) > 0


def test_setsim_shingle_table_is_cached_in_plan(spark):
    """The shingle table persist is load-bearing (5 consumers, 2x at
    sf0.1): the physical plan must read it through InMemoryTableScan,
    so removing the persist fails here instead of silently doubling
    the corpus scan cost."""
    from kafka_avro_order_processing_spark.operators.dedup import (
        set_similarity_join,
    )

    df = spark.createDataFrame(
        [(i, f"tok{i} tok{i+1} tok{i+2} tok{i+3}") for i in range(8)],
        "doc_id long, text string",
    )
    out = set_similarity_join(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan


def test_multiprobe_lsh_is_superset_with_better_recall(spark):
    """Multi-probe LSH (Lv et al. VLDB'07): same index, extra probe
    lookups — the verified result must be a SUPERSET of single-probe's
    and, on the driver embeddings, strictly larger (measured ~3x
    recall at identical bands; all emitted pairs are exact-cosine
    verified so none can be false)."""
    from kafka_avro_order_processing_spark.operators.similarity import (
        embedding_lsh_near_dup,
        embedding_lsh_near_dup_multiprobe,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    single = {
        (r["vec_a"], r["vec_b"]) for r in embedding_lsh_near_dup(emb).collect()
    }
    multi_rows = embedding_lsh_near_dup_multiprobe(emb).collect()
    multi = {(r["vec_a"], r["vec_b"]) for r in multi_rows}
    assert single <= multi
    assert len(multi) > len(single)
    assert all(r["cosine"] >= 0.35 for r in multi_rows)  # verify stage held


def test_probe_rows_flip_exactly_one_bit(spark):
    """Per vector per band: one exact row and one probe row whose
    value differs in EXACTLY one bit position (the minimum-|margin|
    one)."""
    from kafka_avro_order_processing_spark.operators.similarity import (
        hyperplane_probe_rows,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(20)
    rows = hyperplane_probe_rows(emb, dim=64).collect()
    by_key = {}
    for r in rows:
        by_key.setdefault((r["vec_id"], r["band_id"]), {})[r["kind"]] = r["band_val"]
    assert by_key  # non-empty
    for (vid, band), kinds in by_key.items():
        assert set(kinds) == {"e", "p"}, (vid, band)
        diffs = sum(a != b for a, b in zip(kinds["e"], kinds["p"]))
        assert diffs == 1, (vid, band, kinds)
