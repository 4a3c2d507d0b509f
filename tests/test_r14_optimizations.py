"""Focused pins for the r14 optimization round.

Each test pins an optimization's EQUIVALENCE (rows identical to the
pre-optimization form) or its plan-shape claim, so a later refactor
cannot silently regress either the speedup or the semantics.

Covered (see OPTIMIZATION_r14.md):
- asof_join_same_source gates the right-side payload on ``right_pred``
  itself, not ``~left_pred`` (r13 ADVICE: a NULL-evaluating left
  predicate silently nulled a matching right row's carried value).
- dedup._scan_splits / _needs_spread: the spread decision now comes
  from driver-side scan metadata (file list + sizes), not a
  plan-to-RDD conversion (r13 verdict task 8 / ADVICE low).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.asof import (
    asof_join,
    asof_join_same_source,
)
from kafka_avro_order_processing_spark.operators import dedup as D


def test_scan_splits_estimates_from_file_metadata(spark, tmp_path):
    par = spark.sparkContext.defaultParallelism
    # one tiny single-file parquet -> narrower than any cluster
    one = str(tmp_path / "one")
    spark.range(0, 100).selectExpr("id as doc_id", "'x' as text").coalesce(1).write.parquet(one)
    narrow = spark.read.parquet(one)
    assert D._scan_splits(narrow) is not None
    assert D._scan_splits(narrow) < par
    assert D._needs_spread(narrow)
    # many-file parquet -> at least cluster-wide, spread skipped
    many = str(tmp_path / "many")
    (
        spark.range(0, 200_000)
        .selectExpr("id as doc_id", "repeat('x', 300) as text")
        .repartition(2 * par)
        .write.parquet(many)
    )
    wide = spark.read.parquet(many)
    assert D._scan_splits(wide) >= par
    assert not D._needs_spread(wide)
    # in-memory relations read no files -> RDD-probe fallback only
    mem = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    assert D._scan_splits(mem) is None


def test_load_table_schema_cache_metadata_only(spark, tmp_path):
    """The load_table schema cache keys on (path, mtime, size) — a
    rewritten file re-infers; row data is never cached."""
    from kafka_avro_order_processing_spark.sources import tables as TT

    p = str(tmp_path / "t.parquet")
    spark.range(0, 3).selectExpr("id AS a").write.mode("overwrite").parquet(p)
    # load_table reads <sf_dir>/<name>.parquet; call _parquet_schema directly
    import glob
    part = glob.glob(p + "/part-*.parquet")[0]
    s1 = TT._parquet_schema(spark, part)
    assert s1 is not None and [f.name for f in s1.fields] == ["a"]
    assert TT._parquet_schema(spark, part) is s1  # cache hit
    # rewrite with a different schema -> different file -> fresh inference
    spark.range(0, 3).selectExpr("id AS b").write.mode("overwrite").parquet(p)
    part2 = glob.glob(p + "/part-*.parquet")[0]
    s2 = TT._parquet_schema(spark, part2)
    assert [f.name for f in s2.fields] == ["b"]
    # non-existent path -> None (fall back to inference)
    assert TT._parquet_schema(spark, str(tmp_path / "nope.parquet")) is None


def test_load_table_rows_identical_with_schema_cache(spark):
    from kafka_avro_order_processing_spark.sources.tables import load_table

    df1 = load_table(spark, "/root/testdata/sf0.001", "events")  # cached path
    df2 = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert [f.name for f in df1.schema.fields] == [f.name for f in df2.schema.fields]
    assert df1.count() == df2.count()


def test_lsh_candidate_pairs_no_self_join_in_plan(spark):
    """r14: in-bucket pairs come from a bounded collect_list + one
    codegen'd pair expression — the sized⋈sized self-join (two extra
    band-table exchanges at scale) must stay gone."""
    import contextlib, io

    from kafka_avro_order_processing_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i} x y z a b c d") for i in range(8)], "doc_id long, text string"
    )
    import re

    pairs = lsh_candidate_pairs(minhash_signatures(docs))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        pairs.explain("formatted")
    full = buf.getvalue()
    # the bounded collect_list produces the bucket arrays...
    assert "collect_list" in full and "sort_array" in full
    # ...and the only joins left are the equi-join-backs of the bucket
    # stats: no join carries the old self-join's doc_id < doc_id
    # inequality condition
    for m in re.finditer(r"Join condition: (.*)", full):
        assert "<" not in m.group(1), m.group(1)


def _full_plan(df):
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_similarity_candidate_spread_is_scale_adaptive(spark, tmp_path):
    """r13 verdict task 5 plan pins: cosine_topk / hard_negatives /
    sq8_topk shuffle the candidate payload ONLY when the scan is
    narrower than the cluster.  Wide scan -> no candidate-side
    Exchange (the 100 TB shape: stream into the broadcast join);
    narrow scan -> the spread repartition appears."""
    from kafka_avro_order_processing_spark.operators.similarity import (
        cosine_topk,
        hard_negatives,
        sq8_bounds,
        sq8_encode,
        sq8_topk,
    )

    par = spark.sparkContext.defaultParallelism
    vecs = spark.range(0, 50_000).selectExpr(
        "id AS vec_id",
        "array(cast(id % 7 AS float), cast(id % 5 + 1 AS float)) AS embedding",
    )
    wide_p, narrow_p = str(tmp_path / "wide"), str(tmp_path / "narrow")
    vecs.repartition(2 * par).write.parquet(wide_p)
    vecs.limit(200).coalesce(1).write.parquet(narrow_p)
    wide = spark.read.parquet(wide_p)
    narrow = spark.read.parquet(narrow_p)
    q = narrow.filter("vec_id < 3")

    for label, build in [
        ("cosine_topk", lambda v: cosine_topk(v, q)),
        (
            "hard_negatives",
            lambda v: hard_negatives(
                v, q, q.selectExpr("vec_id AS query_id", "vec_id + 1 AS neighbor_id")
            ),
        ),
        (
            "sq8_topk",
            lambda v: sq8_topk(sq8_encode(v, sq8_bounds(narrow)), q, sq8_bounds(narrow)),
        ),
    ]:
        wide_plan = _full_plan(build(wide))
        narrow_plan = _full_plan(build(narrow))
        assert "hashpartitioning(vec_id" not in wide_plan, (label, wide_plan)
        assert "hashpartitioning(vec_id" in narrow_plan, (label, narrow_plan)


def test_asof_same_source_null_evaluating_left_pred(spark):
    """r13 ADVICE (medium): with left_pred = (flag = 'p') over a NULL
    flag, ~left_pred is NULL — the old form kept the row as a right row
    but dropped its payload.  The generic composition is the spec."""
    rows = [
        # (event_id, user_id, ts, value, flag) — flag NULL on the click
        (1, "u1", 5, 3.0, None),   # right row (flag != 'p' is NULL, IS click by right_pred)
        (2, "u1", 10, 9.0, "p"),   # left row -> must match event 1's value
        (3, "u2", 1, 4.0, "x"),    # neither side -> dropped
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id string, ts long, value double, flag string"
    )
    left_pred = F.col("flag") == "p"          # NULL on row 1
    right_pred = F.col("flag").isNull()       # TRUE on row 1
    generic = asof_join(
        ev.filter(left_pred), ev.filter(right_pred), on="user_id", ts="ts",
        right_value_cols=("value",), right_tiebreak="event_id",
    ).select("event_id", "user_id", "ts", "value", "ts_asof", "value_asof")
    single = asof_join_same_source(
        ev, on="user_id", left_pred=left_pred, right_pred=right_pred,
        ts="ts", left_cols=("event_id", "user_id", "ts", "value"),
        right_value_cols=("value",), right_tiebreak="event_id",
    ).select("event_id", "user_id", "ts", "value", "ts_asof", "value_asof")
    g = {tuple(r) for r in generic.collect()}
    s = {tuple(r) for r in single.collect()}
    assert g == s, (g, s)
    assert s == {(2, "u1", 10, 9.0, 5, 3.0)}, s
