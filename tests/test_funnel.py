"""windowFunnel (operators/funnel.py): exact agreement with a
brute-force EXISTS reference (all subsequences — structurally unlike
the operator's greedy fold), horizon edge cases, equal-timestamp
tiebreaks, level-0 users kept, DuckDB oracle parity on the events
table, repartition determinism, a Python-free plan, and the report.
"""

from __future__ import annotations

import datetime as dt
from itertools import combinations

import pytest
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.funnel import (
    funnel_report,
    window_funnel,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
STEPS = ["view", "click", "purchase"]


def _ts(s):
    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=s)


# (event_id, user, seconds, type)
EVENTS = [
    # u1: full chain inside 60s
    (1, 1, 0, "view"), (2, 1, 10, "click"), (3, 1, 50, "purchase"),
    # u2: chain broken by horizon (purchase 100s after the only view)
    (4, 2, 0, "view"), (5, 2, 30, "click"), (6, 2, 100, "purchase"),
    # u3: LATER restart rescues the chain (greedy must keep max start)
    (7, 3, 0, "view"), (8, 3, 90, "view"), (9, 3, 100, "click"),
    (10, 3, 140, "purchase"),
    # u4: wrong order only
    (11, 4, 0, "purchase"), (12, 4, 10, "click"), (13, 4, 20, "view"),
    # u5: only non-step events -> level 0, still reported
    (14, 5, 0, "error"), (15, 5, 5, "signup"),
    # u6: equal timestamps chain by event_id tiebreak
    (16, 6, 0, "view"), (17, 6, 0, "click"),
    # u7: equal ts but the view has the LARGER id — in (ts, event_id)
    # order the click precedes the view, so they cannot chain
    (18, 7, 0, "click"), (19, 7, 0, "view"),
]
HORIZON = 60.0


def _frame(spark, events=EVENTS):
    rows = [(e, u, _ts(s), t) for (e, u, s, t) in events]
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )


def _ref_levels(events, steps=STEPS, horizon=HORIZON):
    """Brute force over ALL subsequences per user — the declarative
    EXISTS definition verbatim."""
    by_user = {}
    for e, u, s, t in events:
        by_user.setdefault(u, []).append((s, e, t))
    out = {}
    for u, evs in by_user.items():
        best = 0
        for length in range(1, len(steps) + 1):
            want = steps[:length]
            ok = False
            for combo in combinations(evs, length):
                if [c[2] for c in combo] != want:
                    continue
                keys = [(c[0], c[1]) for c in combo]
                if keys != sorted(keys) or len(set(keys)) != length:
                    continue
                if all(a < b for a, b in zip(keys, keys[1:])) and (
                    combo[-1][0] - combo[0][0] <= horizon
                ):
                    ok = True
                    break
            if ok:
                best = length
        out[u] = best
    return out


def test_levels_match_brute_force(spark):
    got = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(_frame(spark), STEPS, HORIZON).collect()
    }
    assert got == _ref_levels(EVENTS)
    # pin the interesting users explicitly
    assert got[1] == 3   # clean chain
    assert got[2] == 2   # horizon broke step 3
    assert got[3] == 3   # greedy kept the LATER view as chain start
    assert got[4] == 1   # wrong order: only the bare view counts
    assert got[5] == 0   # non-step-only user reported at level 0
    assert got[6] == 2   # equal ts, ascending ids: chains
    assert got[7] == 1   # equal ts, descending ids: cannot chain


def test_horizon_boundary_inclusive(spark):
    evs = [(1, 1, 0, "view"), (2, 1, 60, "click")]
    got = window_funnel(_frame(spark, evs), STEPS, 60.0).collect()[0]
    assert got["funnel_level"] == 2  # ts_L - ts_1 <= horizon: inclusive
    evs = [(1, 1, 0, "view"), (2, 1, 61, "click")]
    got = window_funnel(_frame(spark, evs), STEPS, 60.0).collect()[0]
    assert got["funnel_level"] == 1


def test_duckdb_oracle_parity_on_events(spark):
    """The EXISTS definition as literal SQL — the future promotion
    oracle — against the fold, on the real events table at 1h."""
    import duckdb

    from test_r10_promotion_parity import _assert_parity

    ev = load_table(spark, SF, "events")
    sdf = window_funnel(ev, STEPS, 3600.0)
    chain = (
        "SELECT 1 FROM e a, e b{c_from} WHERE a.user_id = u.user_id "
        "AND b.user_id = u.user_id{c_user} AND a.step = 1 AND b.step = 2"
        "{c_step} AND (a.ts, a.event_id) < (b.ts, b.event_id){c_order} "
        "AND epoch_us({last}.ts) - epoch_us(a.ts) <= 3600000000"
    )
    l3 = chain.format(
        c_from=", e c",
        c_user=" AND c.user_id = u.user_id",
        c_step=" AND c.step = 3",
        c_order=" AND (b.ts, b.event_id) < (c.ts, c.event_id)",
        last="c",
    )
    l2 = chain.format(c_from="", c_user="", c_step="", c_order="", last="b")
    sql = f"""
        WITH e AS (
          SELECT user_id, ts, event_id,
                 CASE event_type WHEN 'view' THEN 1 WHEN 'click' THEN 2
                      WHEN 'purchase' THEN 3 END AS step
          FROM '{SF}/events.parquet'
          WHERE event_type IN ('view', 'click', 'purchase')
        ), u AS (SELECT DISTINCT user_id FROM '{SF}/events.parquet')
        SELECT u.user_id,
               CAST(CASE
                 WHEN EXISTS ({l3}) THEN 3
                 WHEN EXISTS ({l2}) THEN 2
                 WHEN EXISTS (SELECT 1 FROM e a
                              WHERE a.user_id = u.user_id AND a.step = 1)
                   THEN 1
                 ELSE 0 END AS INTEGER) AS funnel_level
        FROM u
    """
    _assert_parity(sdf, sql)


def test_repartition_determinism(spark):
    df = _frame(spark)
    base = sorted(tuple(r) for r in window_funnel(df, STEPS, HORIZON).collect())
    again = sorted(
        tuple(r)
        for r in window_funnel(df.repartition(7), STEPS, HORIZON).collect()
    )
    assert base == again


def test_plan_is_python_free_single_shuffle(spark):
    plan = (
        window_funnel(_frame(spark), STEPS, HORIZON)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_funnel_report(spark):
    levels = window_funnel(_frame(spark), STEPS, HORIZON)
    rep = {r["step"]: r for r in funnel_report(levels, 3).collect()}
    ref = _ref_levels(EVENTS)
    for i in (1, 2, 3):
        assert rep[i]["n_reached"] == sum(1 for v in ref.values() if v >= i)
    assert rep[1]["conversion"] is None
    assert rep[2]["conversion"] == pytest.approx(
        rep[2]["n_reached"] / rep[1]["n_reached"]
    )


def test_validation(spark):
    df = _frame(spark)
    with pytest.raises(ValueError, match="at least one"):
        window_funnel(df, [], 60.0)
    with pytest.raises(ValueError, match="distinct"):
        window_funnel(df, ["view", "view"], 60.0)
    with pytest.raises(ValueError, match="horizon"):
        window_funnel(df, STEPS, 0.0)
    withnull = spark.createDataFrame(
        [(1, None, _ts(0), "view")],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    # NULL rejection is folded into the one corpus scan: the CALL is
    # lazy (no validation pre-scan doubling the read — the r10 verdict
    # item) and the action raises the in-plan error loudly
    lazy = window_funnel(withnull, STEPS, 60.0)
    with pytest.raises(Exception, match="NULL"):
        lazy.collect()


def test_pre_1970_timestamps_chain(spark):
    """Negative epoch micros are legal event times: the unreachable
    sentinel is NULL, so a chain starting before 1970 still counts
    (the old -1 sentinel silently discarded such starts)."""
    base = dt.datetime(1969, 12, 31, 23, 59, 0)  # t < 0 in unix micros
    rows = [
        (1, 1, base, "view"),
        (2, 1, base + dt.timedelta(seconds=10), "click"),
        (3, 1, base + dt.timedelta(seconds=50), "purchase"),
        # u2 breaks the horizon across the epoch boundary
        (4, 2, base, "view"),
        (5, 2, base + dt.timedelta(seconds=90), "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(df, STEPS, HORIZON).collect()
    }
    assert got == {1: 3, 2: 1}


def test_streaming_funnel_bit_matches_batch_single_epoch(spark):
    from kafka_avro_order_processing_spark.streaming.funnel import (
        streaming_window_funnel,
    )
    from kafka_avro_order_processing_spark.streaming.pipeline import stream_table

    ev = load_table(spark, SF, "events")
    want = sorted(
        tuple(r) for r in window_funnel(ev, STEPS, 3600.0).collect()
    )
    got = sorted(
        tuple(r)
        for r in streaming_window_funnel(
            stream_table(spark, SF, "events"), STEPS, 3600.0
        ).collect()
    )
    assert got == want


def test_streaming_funnel_multi_epoch_time_ordered(spark, tmp_path):
    """Micro-batch boundaries anywhere in a TIME-ORDERED stream leave
    the drained levels bit-equal to batch — the O(levels) state carries
    chains across epochs (u3's rescue chain spans files here)."""
    from kafka_avro_order_processing_spark.streaming.funnel import (
        streaming_window_funnel,
    )

    df = _frame(spark)
    d = str(tmp_path / "events")
    # three time-ordered files: one per time band, so chains cross files
    bands = [(0, 20), (20, 95), (95, 10**9)]
    for i, (lo, hi) in enumerate(bands):
        part = df.filter(
            (F.col("ts") >= _ts(lo)) & (F.col("ts") < _ts(hi))
        )
        part.coalesce(1).write.mode("append").parquet(d)
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(d)
    )
    want = sorted(tuple(r) for r in window_funnel(df, STEPS, HORIZON).collect())
    got = sorted(
        tuple(r)
        for r in streaming_window_funnel(stream, STEPS, HORIZON).collect()
    )
    assert got == want


def _ref_retention(events, period=86400.0, horizon=7):
    active = {(u, int(s // period)) for _, u, s, _ in events}
    first = {}
    for u, p in active:
        first[u] = min(first.get(u, p), p)
    sizes = {}
    for u, c in first.items():
        sizes[c] = sizes.get(c, 0) + 1
    cells = {}
    for u, p in active:
        off = p - first[u]
        if off <= horizon:
            cells[(first[u], off)] = cells.get((first[u], off), 0) + 1
    return {
        k: (n, n / sizes[k[0]]) for k, n in cells.items()
    }


def test_retention_matches_reference(spark):
    from kafka_avro_order_processing_spark.operators.funnel import (
        retention_cohorts,
    )

    # hours as periods so the fixture's seconds spread multiple periods
    period = 60.0
    ref = _ref_retention(EVENTS, period=period, horizon=3)
    got = {
        (r["cohort"], r["offset"]): (r["n_active"], r["retention"])
        for r in retention_cohorts(
            _frame(spark), period_s=period, horizon_periods=3
        ).collect()
    }
    # the operator's cohort index is the EPOCH minute; 2024-01-01
    # midnight is minute-aligned, so it is the reference's in-test
    # minute shifted by a constant base
    base = int(_ts(0).timestamp() // period)
    assert got == {(c + base, o): v for (c, o), v in ref.items()}
    # offset-0 retention is exactly 1.0 everywhere
    for (c, o), (n, r) in got.items():
        if o == 0:
            assert r == 1.0


def test_retention_duckdb_oracle_on_events(spark):
    from test_r10_promotion_parity import _assert_parity

    from kafka_avro_order_processing_spark.operators.funnel import (
        retention_cohorts,
    )

    ev = load_table(spark, SF, "events")
    sdf = retention_cohorts(ev, period_s=86400.0, horizon_periods=7)
    sql = f"""
        WITH active AS (
          SELECT DISTINCT user_id AS u,
                 CAST(floor(epoch_us(ts) / 86400000000) AS BIGINT) AS p
          FROM '{SF}/events.parquet'
        ), cohorts AS (
          SELECT u, MIN(p) AS cohort FROM active GROUP BY u
        ), sizes AS (
          SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_cohort
          FROM cohorts GROUP BY cohort
        ), cells AS (
          SELECT c.cohort, CAST(a.p - c.cohort AS INTEGER) AS "offset",
                 CAST(COUNT(*) AS BIGINT) AS n_active
          FROM active a JOIN cohorts c ON a.u = c.u
          WHERE a.p - c.cohort <= 7
          GROUP BY c.cohort, a.p - c.cohort
        )
        SELECT cells.cohort, "offset", n_active,
               CAST(n_active AS DOUBLE) / CAST(n_cohort AS DOUBLE) AS retention
        FROM cells JOIN sizes ON cells.cohort = sizes.cohort
    """
    _assert_parity(sdf, sql)


def test_string_ids_keep_the_native_tiebreak(spark):
    """Non-numeric ids must keep their native ordering, not NULL out —
    the u6/u7 equal-timestamp cases re-run with UUID-ish string ids."""
    rows = [
        ("a-1", 6, _ts(0), "view"), ("b-2", 6, _ts(0), "click"),  # chains
        ("c-1", 7, _ts(0), "click"), ("d-2", 7, _ts(0), "view"),  # cannot
    ]
    df = spark.createDataFrame(
        rows, "event_id string, user_id long, ts timestamp, event_type string"
    )
    got = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(df, STEPS, HORIZON).collect()
    }
    assert got == {6: 2, 7: 1}


def test_streaming_funnel_string_users_and_validation(spark, tmp_path):
    """String user ids keep their native type end-to-end (a long cast
    would merge them all into one NULL group), and the twin validates
    params like the batch operator."""
    from kafka_avro_order_processing_spark.streaming.funnel import (
        streaming_window_funnel,
    )

    rows = [
        (1, "alice", _ts(0), "view"), (2, "alice", _ts(5), "click"),
        (3, "bob", _ts(0), "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id string, ts timestamp, event_type string"
    )
    d = str(tmp_path / "ev")
    df.coalesce(1).write.parquet(d)
    stream = spark.readStream.schema(df.schema).parquet(d)
    got = {
        r["user_id"]: r["funnel_level"]
        for r in streaming_window_funnel(stream, STEPS, HORIZON).collect()
    }
    assert got == {"alice": 2, "bob": 1}
    with pytest.raises(ValueError, match="distinct"):
        streaming_window_funnel(stream, ["view", "view"], HORIZON)


def test_streaming_backoff_rejects_bad_params(spark):
    from kafka_avro_order_processing_spark.operators.lm import train_backoff_lm
    from kafka_avro_order_processing_spark.streaming.lm import (
        streaming_backoff_lm_score,
    )

    ref = spark.createDataFrame([(0, "a b c")], "doc_id long, text string")
    lm = train_backoff_lm(ref).materialized()
    stream = spark.readStream.format("rate").load()  # never started
    with pytest.raises(ValueError, match="lam"):
        streaming_backoff_lm_score(stream, lm, lam=0.0)
    with pytest.raises(ValueError, match="alpha"):
        streaming_backoff_lm_score(stream, lm, alpha=-1.0)


def test_retention_null_rejection_is_lazy_single_pass(spark):
    """retention_cohorts folds NULL rejection into the corpus scan:
    the call returns lazily (no validation pre-scan action) and the
    first action raises the in-plan error."""
    from kafka_avro_order_processing_spark.operators.funnel import (
        retention_cohorts,
    )

    withnull = spark.createDataFrame(
        [(1, None, _ts(0), "view"), (2, 1, _ts(1), "view")],
        "event_id long, user_id long, ts timestamp, event_type string",
    )
    lazy = retention_cohorts(withnull, period_s=60.0, horizon_periods=3)
    with pytest.raises(Exception, match="NULL"):
        lazy.collect()


@pytest.mark.slow
def test_streaming_funnel_ttl_evicts_idle_state(spark, tmp_path):
    """Processing-time TTL (>= horizon) across two checkpointed runs:
    an idle user's state is evicted — semantics-preserving for chain
    starts — and the drained changelog behaves per the documented
    contract: an idle user keeps their last emitted level; a
    reappearing user restarts the counter (carol's lone click after
    eviction reports 0, proving the state is gone — live state would
    have reported her historical level 1)."""
    import time

    from kafka_avro_order_processing_spark.streaming.funnel import (
        streaming_window_funnel_plan,
    )

    horizon = 2.0
    ttl = 2.0
    src = str(tmp_path / "ev")
    sink = str(tmp_path / "sink")
    chk = str(tmp_path / "chk")
    schema = "event_id long, user_id string, ts timestamp, event_type string"

    def run_epoch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(
            spark.createDataFrame([], schema).schema
        ).parquet(src)
        out = streaming_window_funnel_plan(
            stream, STEPS, horizon, state_ttl_s=ttl
        )
        q = (
            out.writeStream.outputMode("update")
            .foreachBatch(
                lambda df, eid: df.withColumn("__epoch", F.lit(eid))
                .write.mode("append")
                .parquet(sink)
            )
            .option("checkpointLocation", chk)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # epoch 1: alice reaches 2, bob 1, carol 1
    run_epoch(
        [
            (1, "alice", _ts(0), "view"),
            (2, "alice", _ts(1), "click"),
            (3, "bob", _ts(0), "view"),
            (4, "carol", _ts(0), "view"),
        ]
    )
    time.sleep(ttl + 1.5)  # let every key idle past the TTL
    # epoch 2: alice completes a FRESH chain (agrees with batch);
    # carol sends only a click — with evicted state it cannot chain
    run_epoch(
        [
            (5, "alice", _ts(100), "view"),
            (6, "alice", _ts(100.5), "click"),
            (7, "alice", _ts(101), "purchase"),
            (8, "carol", _ts(100), "click"),
        ]
    )
    import pandas as pd  # noqa: F401  (parquet fold below is Spark-side)

    log = spark.read.parquet(sink)
    latest = (
        log.withColumn(
            "rn",
            F.row_number().over(
                __import__("pyspark.sql.window", fromlist=["Window"])
                .Window.partitionBy("user_id")
                .orderBy(F.desc("__epoch"))
            ),
        )
        .filter("rn = 1")
        .select("user_id", "funnel_level")
    )
    got = {r["user_id"]: r["funnel_level"] for r in latest.collect()}
    # alice: fresh chain == the batch level over all her events
    all_events = spark.createDataFrame(
        [
            (1, "alice", _ts(0), "view"),
            (2, "alice", _ts(1), "click"),
            (5, "alice", _ts(100), "view"),
            (6, "alice", _ts(100.5), "click"),
            (7, "alice", _ts(101), "purchase"),
            (3, "bob", _ts(0), "view"),
        ],
        schema,
    )
    batch = {
        r["user_id"]: r["funnel_level"]
        for r in window_funnel(all_events, STEPS, horizon).collect()
    }
    assert got["alice"] == batch["alice"] == 3
    # bob idled: his last emitted row survives and matches batch
    assert got["bob"] == batch["bob"] == 1
    # carol: the documented reset — 0 proves eviction fired (live
    # state would have kept her level-1 row as the latest emission
    # only if re-emitted; a lone click on FRESH state emits 0)
    assert got["carol"] == 0


def test_streaming_funnel_ttl_validation(spark):
    from kafka_avro_order_processing_spark.streaming.funnel import (
        streaming_window_funnel_plan,
    )

    stream = spark.readStream.format("rate").load()  # never started
    with pytest.raises(ValueError, match="state_ttl_s"):
        streaming_window_funnel_plan(
            stream.selectExpr(
                "value AS event_id",
                "CAST(value AS STRING) AS user_id",
                "timestamp AS ts",
                "'view' AS event_type",
            ),
            STEPS,
            60.0,
            state_ttl_s=30.0,
        )
