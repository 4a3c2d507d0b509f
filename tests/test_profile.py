"""One-pass table profiling (operators/profile.py): exact agreement
with DuckDB per column (counts, nulls, min/max, exact distinct), the
approx-distinct error envelope, the single-aggregation plan shape, and
the partial-top-k correctness of column_topk.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.profile import (
    column_topk,
    profile_table,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


def test_profile_matches_duckdb_exactly(spark):
    cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"]
    orders = load_table(spark, SF, "orders")
    prof = {
        r["column"]: r
        for r in profile_table(orders, cols, exact=True).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM"
        f" read_parquet('{SF}/orders.parquet')"
    )
    for c in cols:
        n, nn, nd, mn, mx = con.execute(
            f"SELECT count(*), count({c}), count(distinct {c}),"
            f" min({c}), max({c}) FROM orders"
        ).fetchone()
        r = prof[c]
        assert r["n_rows"] == n
        assert r["n_nulls"] == n - nn
        assert r["n_distinct"] == nd
        # min/max compare on the NATIVE order then stringify; DuckDB's
        # values stringify the same way for ints and strings.  Decimals
        # keep their scale in Spark ('904.20'), so compare numerically
        # when the column is numeric.
        if isinstance(mn, str):
            assert r["min_value"] == mn and r["max_value"] == mx
        else:
            assert float(r["min_value"]) == float(mn)
            assert float(r["max_value"]) == float(mx)
    con.close()


def test_profile_null_and_type_handling(spark):
    df = spark.createDataFrame(
        [
            (1, "a", {"k": 1}),
            (2, None, None),
            (3, "b", {"j": 2}),
            (4, None, None),
        ],
        "id long, s string, m map<string,int>",
    )
    prof = {r["column"]: r for r in profile_table(df, exact=True).collect()}
    assert prof["s"]["n_nulls"] == 2
    assert abs(prof["s"]["null_frac"] - 0.5) < 1e-15
    assert prof["s"]["min_value"] == "a" and prof["s"]["max_value"] == "b"
    assert prof["s"]["n_distinct"] == 2
    # maps are unorderable: profiled (counts, distinct via hash) but
    # min/max stay NULL rather than failing the whole profile
    assert prof["m"]["min_value"] is None and prof["m"]["max_value"] is None
    assert prof["m"]["n_nulls"] == 2
    assert prof["m"]["data_type"].startswith("map<")
    assert prof["id"]["null_frac"] == 0.0
    assert prof["id"]["min_value"] == "1" and prof["id"]["max_value"] == "4"


def test_profile_is_one_aggregation(spark):
    # The whole profile must be ONE global aggregate: no row shuffle
    # (Exchange carries only partial aggregation state: a SinglePartition
    # exchange), no join, no BatchEvalPython, regardless of column count.
    orders = load_table(spark, SF, "orders")
    plan = profile_table(
        orders, ["o_orderkey", "o_orderstatus", "o_totalprice"]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "BatchEvalPython" not in plan
    assert plan.count("Exchange") == 1
    assert "SinglePartition" in plan


def test_profile_approx_distinct_envelope(spark):
    # HLL++ at rsd=0.05 on ~30k distinct keys must land within 3*rsd.
    orders = load_table(spark, SF, "orders")
    r = {
        x["column"]: x
        for x in profile_table(orders, ["o_orderkey"], exact=False).collect()
    }["o_orderkey"]
    exact = orders.select("o_orderkey").distinct().count()
    assert abs(r["n_distinct"] - exact) <= 0.15 * exact


def test_column_topk_matches_duckdb(spark):
    orders = load_table(spark, SF, "orders")
    got = [
        (r["value"], r["n"], r["rank"])
        for r in column_topk(orders, "o_orderpriority", k=3)
        .orderBy("rank")
        .collect()
    ]
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW orders AS SELECT * FROM"
        f" read_parquet('{SF}/orders.parquet')"
    )
    want = con.execute(
        "SELECT CAST(o_orderpriority AS VARCHAR) v, count(*) n,"
        " CAST(row_number() OVER (ORDER BY count(*) DESC, v ASC) AS INT) r"
        " FROM orders WHERE o_orderpriority IS NOT NULL"
        " GROUP BY v ORDER BY r LIMIT 3"
    ).fetchall()
    con.close()
    assert got == [tuple(w) for w in want]


def test_column_topk_partial_topk_is_lossless(spark):
    # The per-partition pre-filter must never drop a global top-k value:
    # compare against the unbounded ranking on a skewed synthetic.
    rows = [(i, f"v{i % 7}") for i in range(500)] + [(9999, None)]
    df = spark.createDataFrame(rows, "id long, s string").repartition(8)
    got = sorted(
        (r["value"], r["n"]) for r in column_topk(df, "s", k=5).collect()
    )
    from collections import Counter

    cnt = Counter(s for _, s in rows if s is not None)
    want = sorted(
        (v, n)
        for v, n in sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    )
    assert got == want


def test_streaming_profile_matches_batch(spark):
    from kafka_avro_order_processing_spark.streaming.pipeline import (
        stream_table,
    )
    from kafka_avro_order_processing_spark.streaming.profile import (
        streaming_profile,
    )

    cols = ["o_orderkey", "o_orderstatus", "o_totalprice"]
    want = sorted(
        tuple(r)
        for r in profile_table(
            load_table(spark, SF, "orders"), cols, exact=False
        ).collect()
    )
    got = sorted(
        tuple(r)
        for r in streaming_profile(stream_table(spark, SF, "orders"), cols).collect()
    )
    assert got == want


def test_streaming_profile_multi_epoch_equals_single(spark, tmp_path):
    # Same rows in 3 files under maxFilesPerTrigger=1: counts/min/max
    # are associative and HLL++ registers merge deterministically, so
    # the drained profile must be identical to the one-shot batch.
    from kafka_avro_order_processing_spark.streaming.profile import (
        streaming_profile,
    )

    rows = [(i, f"v{i % 17}" if i % 5 else None) for i in range(300)]
    df = spark.createDataFrame(rows, "id long, s string")
    d = str(tmp_path / "cur")
    df.repartition(3).write.parquet(d)
    stream = (
        spark.readStream.schema("id long, s string")
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    want = sorted(tuple(r) for r in profile_table(df, exact=False).collect())
    got = sorted(tuple(r) for r in streaming_profile(stream).collect())
    assert got == want


# ---------------------------------------------------------------------------
# corpus_diff (snapshot-to-snapshot content audit)
# ---------------------------------------------------------------------------


def test_corpus_diff_statuses(spark):
    from kafka_avro_order_processing_spark.operators.profile import corpus_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None), (5, None), (6, "gone")],
        "doc_id long, text string",
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, None), (5, "now text"), (7, "fresh")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r["status"] for r in corpus_diff(old, new).collect()
    }
    assert got == {
        1: "unchanged",   # same content
        2: "changed",     # content differs
        3: "removed",
        4: "unchanged",   # NULL == NULL (null-safe)
        5: "changed",     # NULL -> text is a real change
        6: "removed",
        7: "added",
    }


def test_corpus_diff_duckdb_oracle(spark):
    """Promotion-grade oracle: old = documents, new = documents with a
    deterministic slice dropped, a slice rewritten, and a synthetic
    tail added — both engines derive the same snapshots."""
    from test_oracle_parity import SF_DIR, _duck
    from test_r10_promotion_parity import _assert_parity

    from kafka_avro_order_processing_spark.operators.profile import corpus_diff
    from kafka_avro_order_processing_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    old = docs
    new = (
        docs.filter(F.col("doc_id") % 7 != 0)  # drop a slice
        .withColumn(
            "text",
            F.when(
                F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" v2"))
            ).otherwise(F.col("text")),
        )
        .unionByName(
            docs.select(
                (F.col("doc_id") + 1000000).alias("doc_id"),
                F.lit("synthetic new doc").alias("text"),
            ).filter(F.col("doc_id") % 3 == 0)
        )
    )
    sdf = corpus_diff(old, new)
    _assert_parity(
        sdf,
        """
        WITH oldc AS (SELECT doc_id, md5(text) AS old_hash FROM documents),
        newc AS (
          SELECT doc_id,
                 md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                          ELSE text END) AS new_hash
          FROM documents WHERE doc_id % 7 <> 0
          UNION ALL
          SELECT doc_id + 1000000 AS doc_id,
                 md5('synthetic new doc') AS new_hash
          FROM documents WHERE (doc_id + 1000000) % 3 = 0
        )
        SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN o.old_hash IS NOT DISTINCT FROM n.new_hash
                      THEN 'unchanged'
                    ELSE 'changed' END AS status,
               o.old_hash, n.new_hash
        FROM oldc o FULL OUTER JOIN newc n ON o.doc_id = n.doc_id
        """,
    )
