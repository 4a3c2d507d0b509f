"""Cross-engine fuzzing: hypothesis-generated datasets written to
parquet, run through the core operators on Spark AND DuckDB SQL — the
determinism playbook (decimal sums, tiebreakers) must hold for ANY
2-dp money data, not just the driver testdata."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_avro_order_processing_spark.operators.aggregate import product_price_stats
from kafka_avro_order_processing_spark.operators.windows import running_average

rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 100_000),
        st.sampled_from(["A", "B", "C", "D", "E", None]),
        st.one_of(
            st.none(),
            st.decimals(min_value=-10_000, max_value=10_000, places=2).map(float),
        ),
    ),
    min_size=1,
    max_size=200,
    unique_by=lambda r: r[0],
)

SETTINGS = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)



# durations-driven slow set (r12): pure fuzz re-check sweep —
# the fast gate keeps the exact-law and oracle primaries
pytestmark = pytest.mark.slow


def _materialize(spark, rows):
    df = spark.createDataFrame(rows, "seq long, product string, price double")
    path = os.path.join(tempfile.mkdtemp(), "fuzz.parquet")
    df.coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return spark.read.parquet(path), con


@given(rows=rows_strategy)
@SETTINGS
def test_fuzz_grouped_stats_match_duckdb(spark, rows):
    df, con = _materialize(spark, rows)
    got = sorted(
        (repr(r["product"]), r["order_count"], repr(r["price_sum"]), repr(r["average_price"]))
        for r in product_price_stats(df).collect()
    )
    want = sorted(
        (repr(p), c, repr(s), repr(a))
        for p, c, s, a in con.execute("""
            SELECT product, COUNT(*),
                   CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE),
                   CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*)
            FROM t GROUP BY product
        """).fetchall()
    )
    assert got == want


@given(rows=rows_strategy)
@SETTINGS
def test_fuzz_running_avg_matches_duckdb(spark, rows):
    df, con = _materialize(spark, rows)
    run = running_average(df, key="product", value="price", order_by=("seq",))
    got = sorted(
        (r["seq"], repr(r["running_sum"]), repr(r["running_avg"]))
        for r in run.collect()
    )
    want = sorted(
        (s, repr(rs), repr(ra))
        for s, rs, ra in con.execute("""
            SELECT seq,
                   CAST(SUM(CAST(price AS DECIMAL(18,2))) OVER w AS DOUBLE),
                   CAST(SUM(CAST(price AS DECIMAL(18,2))) OVER w AS DOUBLE)
                     / (COUNT(*) OVER w)
            FROM t
            WINDOW w AS (PARTITION BY product ORDER BY seq
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """).fetchall()
    )
    assert got == want


ts_rows_strategy = st.lists(
    st.tuples(
        st.integers(0, 50_000),                        # event id (unique)
        st.integers(1, 6),                             # user id
        st.integers(0, 6 * 3600 * 1_000_000),          # ts micros within 6h
    ),
    min_size=2,
    max_size=120,
    unique_by=lambda r: r[0],
)


def _materialize_events(spark, rows):
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    data = [
        (eid, uid, base + dt.timedelta(microseconds=us)) for eid, uid, us in rows
    ]
    df = spark.createDataFrame(data, "event_id long, user_id long, ts timestamp_ntz")
    path = os.path.join(tempfile.mkdtemp(), "ev.parquet")
    df.coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    return spark.read.parquet(path), con


@given(rows=ts_rows_strategy)
@SETTINGS
def test_fuzz_sessionize_matches_duckdb(spark, rows):
    """Gap-based sessionization on random microsecond timestamps — the
    >= boundary and tie ordering must agree across engines."""
    from kafka_avro_order_processing_spark.operators.windows import sessionize

    df, con = _materialize_events(spark, rows)
    got = sorted(
        (r["user_id"], r["session_id"], r["session_start"].isoformat(),
         r["session_end"].isoformat(), r["n_events"])
        for r in sessionize(df, ts="ts", key="user_id", gap_minutes=30,
                            order_tiebreak="event_id").collect()
    )
    want = sorted(
        (u, s, a.isoformat(), b.isoformat(), n)
        for u, s, a, b, n in con.execute("""
            WITH flagged AS (
              SELECT user_id, ts, event_id,
                     CASE WHEN lag(ts) OVER w IS NULL
                               OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                          THEN 1 ELSE 0 END AS new_sess
              FROM t WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            ), sess AS (
              SELECT user_id, ts,
                     CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sid
              FROM flagged)
            SELECT user_id, sid, MIN(ts), MAX(ts), COUNT(*)
            FROM sess GROUP BY user_id, sid
        """).fetchall()
    )
    assert got == want


@given(rows=ts_rows_strategy)
@SETTINGS
def test_fuzz_asof_join_matches_duckdb(spark, rows):
    """As-of join on random timestamps (left = even ids, right = odd):
    nearest-prior semantics incl. exact-tie handling must agree with the
    independent LATERAL formulation."""
    from pyspark.sql import functions as F

    from kafka_avro_order_processing_spark.operators.asof import asof_join

    df, con = _materialize_events(spark, rows)
    left = df.filter(F.col("event_id") % 2 == 0)
    right = df.filter(F.col("event_id") % 2 == 1)
    if left.count() == 0 or right.count() == 0:
        return
    out = asof_join(
        left, right, on="user_id", ts="ts",
        right_value_cols=("event_id",), right_tiebreak="event_id",
    )
    got = sorted(
        (r["event_id"], r["ts_asof"].isoformat() if r["ts_asof"] else None,
         r["event_id_asof"])
        for r in out.collect()
    )
    want = sorted(
        (eid, ts.isoformat() if ts else None, rid)
        for eid, ts, rid in con.execute("""
            SELECT l.event_id, r.ts, r.event_id
            FROM (SELECT * FROM t WHERE event_id % 2 = 0) l
            LEFT JOIN LATERAL (
              SELECT ts, event_id FROM t r
              WHERE r.event_id % 2 = 1 AND r.user_id = l.user_id AND r.ts <= l.ts
              ORDER BY r.ts DESC, r.event_id DESC LIMIT 1) r ON TRUE
        """).fetchall()
    )
    assert got == want


@given(rows=ts_rows_strategy)
@SETTINGS
def test_fuzz_tumbling_windows_match_duckdb(spark, rows):
    """Epoch-aligned tumbling windows over random microsecond
    timestamps: Spark's window('1 hour') boundaries must equal
    date_trunc-based bucketing exactly."""
    from kafka_avro_order_processing_spark.operators.windows import (
        tumbling_window_stats,
    )

    df, con = _materialize_events(spark, rows)
    ev = df.withColumn("value", (df.event_id % 97).cast("double"))
    got = sorted(
        (r["window_start"].isoformat(), r["n_events"], repr(r["sum_value"]))
        for r in tumbling_window_stats(
            ev, ts="ts", key="user_id", value="value", width="1 hour"
        ).select("window_start", "n_events", "sum_value").collect()
    )
    want = sorted(
        (w.isoformat(), n, repr(s))
        for w, n, s in con.execute("""
            SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS w, COUNT(*),
                   CAST(SUM(CAST(CAST(event_id % 97 AS DOUBLE) AS DECIMAL(18,2))) AS DOUBLE)
            FROM t GROUP BY 1, user_id
        """).fetchall()
    )
    assert got == want


@given(rows=rows_strategy)
@SETTINGS
def test_fuzz_validation_split_matches_duckdb(spark, rows):
    """The reject branch (messages included) on arbitrary invalid data —
    double-to-string formatting inside the error text must agree."""
    from kafka_avro_order_processing_spark.operators.validate import (
        split_valid_invalid,
    )

    df, con = _materialize(spark, rows)
    _, invalid = split_valid_invalid(
        df, key="product", value="price", id_col=None
    )
    got = sorted(
        (r["seq"], r["error_message"]) for r in invalid.collect()
    )
    want = sorted(
        (s, m)
        for s, m in con.execute("""
            SELECT seq,
                   CASE WHEN product IS NULL OR price IS NULL
                        THEN 'Missing required fields in order data'
                        ELSE 'Invalid price: ' || CAST(price AS VARCHAR) END
            FROM t
            WHERE NOT (product IS NOT NULL AND price IS NOT NULL AND price > 0)
               OR (product IS NOT NULL AND price IS NOT NULL AND price > 0) IS NULL
        """).fetchall()
    )
    assert got == want


# --- near-dup / LSH fuzzing -------------------------------------------------

_VOCAB = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]

corpus_strategy = st.lists(
    st.lists(st.sampled_from(_VOCAB), min_size=0, max_size=12).map(" ".join),
    min_size=1,
    max_size=30,
)


@given(texts=corpus_strategy)
@SETTINGS
def test_fuzz_near_dup_pairs_match_duckdb(spark, texts):
    """The full minhash->LSH->verify pipeline vs its ANSI oracle on
    arbitrary tiny-vocab corpora — small vocabularies force heavy
    shingle collisions, duplicate docs, and (at the size cap) hot
    buckets, the adversarial regime for the banding/cap logic."""
    from kafka_avro_order_processing_spark.operators.dedup import near_dup_pairs
    from kafka_avro_order_processing_spark.plans.registry import _minhash_oracle

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = os.path.join(tempfile.mkdtemp(), "docs.parquet")
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
        (a, b, repr(e), repr(j))
        for a, b, e, j in con.execute(_minhash_oracle()).fetchall()
    )
    assert got == want


embedding_strategy = st.lists(
    st.lists(
        st.floats(-1, 1, width=32, allow_nan=False), min_size=8, max_size=8
    ),
    min_size=2,
    max_size=25,
)


@given(vecs=embedding_strategy)
@SETTINGS
def test_fuzz_hyperplane_lsh_matches_duckdb(spark, vecs):
    """Hyperplane-LSH near-dup vs its oracle on arbitrary float32
    vectors (including duplicates, zeros and near-parallel pairs)."""
    from kafka_avro_order_processing_spark.operators.similarity import (
        embedding_lsh_near_dup,
    )
    from kafka_avro_order_processing_spark.plans.registry import _hyperplane_oracle

    rows = [(i, v) for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    path = os.path.join(tempfile.mkdtemp(), "emb.parquet")
    df.coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{path}/*.parquet')"
    )
    got = sorted(
        (r["vec_a"], r["vec_b"], repr(r["cosine"]))
        for r in embedding_lsh_near_dup(
            spark.read.parquet(path), dim=8, bits=16, band_rows=4
        ).collect()
    )
    want = sorted(
        (a, b, repr(c))
        for a, b, c in con.execute(
            _hyperplane_oracle(bits=16, band_rows=4, dim=8)
        ).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Sketches: for ANY generated keyset, the md5-derived CMS grid and HLL
# registers must match a DuckDB replica bit-for-bit, and the CMS
# one-sided guarantee must hold.
# ---------------------------------------------------------------------------

keys_strategy = st.lists(
    st.tuples(st.integers(0, 50_000), st.integers(-5, 40)),
    min_size=1,
    max_size=150,
    unique_by=lambda r: r[0],
)


def _hexval(expr: str, pos: int) -> str:
    return f"(strpos('0123456789abcdef', substr({expr}, {pos}, 1)) - 1)"


@given(rows=keys_strategy)
@SETTINGS
def test_fuzz_cms_matches_duckdb_and_guarantee(spark, rows):
    from kafka_avro_order_processing_spark.operators.sketch import (
        cms_build,
        cms_estimate,
    )

    df = spark.createDataFrame(rows, "seq long, user_id long")
    path = os.path.join(tempfile.mkdtemp(), "fuzz.parquet")
    df.coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    sdf = spark.read.parquet(path)
    sketch = cms_build(sdf, "user_id")
    got = sorted(tuple(r) for r in sketch.collect())
    h = "md5('cms' || CAST(r.depth AS VARCHAR) || ':' || CAST(user_id AS VARCHAR))"
    want = sorted(
        tuple(r)
        for r in con.execute(f"""
        SELECT r.depth, ({_hexval(h, 1)} * 16 + {_hexval(h, 2)}) AS bucket,
               COUNT(*) AS cnt
        FROM t CROSS JOIN (SELECT UNNEST(range(4)) AS depth) r
        GROUP BY 1, 2""").fetchall()
    )
    assert got == want
    exact = sdf.groupBy("user_id").count()
    est = cms_estimate(sketch, exact.select("user_id"), "user_id")
    joined = exact.join(est, "user_id").collect()
    assert all(r["est"] >= r["count"] for r in joined)


@given(rows=keys_strategy)
@SETTINGS
def test_fuzz_hll_registers_match_duckdb(spark, rows):
    from kafka_avro_order_processing_spark.operators.sketch import hll_registers

    df = spark.createDataFrame(rows, "seq long, user_id long")
    path = os.path.join(tempfile.mkdtemp(), "fuzz.parquet")
    df.coalesce(1).write.parquet(path)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{path}/*.parquet')")
    got = sorted(tuple(r) for r in hll_registers(spark.read.parquet(path), "user_id").collect())
    h = "md5('hll:' || CAST(user_id AS VARCHAR))"
    v = " + ".join(f"{_hexval(h, i + 3)} * {16 ** (7 - i)}" for i in range(8))
    want = sorted(
        tuple(r)
        for r in con.execute(f"""
        WITH hashed AS (
          SELECT ({_hexval(h, 1)} * 16 + {_hexval(h, 2)}) AS bucket,
                 CAST({v} AS BIGINT) AS v
          FROM t)
        SELECT bucket,
               CAST(MAX(CASE WHEN v = 0 THEN 33
                             ELSE 33 - length(bin(v)) END) AS INTEGER) AS M
        FROM hashed GROUP BY bucket""").fetchall()
    )
    assert got == want


money_strategy = st.lists(
    st.tuples(
        st.integers(0, 50_000),
        st.decimals(min_value=0, max_value=500, places=2).map(float),
    ),
    min_size=1,
    max_size=200,
    unique_by=lambda r: r[0],
)


@given(rows=money_strategy)
@SETTINGS
def test_fuzz_histogram_quantile_error_bound(spark, rows):
    # For ANY non-negative 2-dp money data, each interpolated estimate
    # must land within one bucket width of the exact ceil-rank
    # quantile: the answering bucket contains the rank-r value by
    # construction, and the estimate never leaves that bucket.
    import math

    from kafka_avro_order_processing_spark.operators.sketch import (
        HIST_WIDTH_CENTS,
        histogram_build,
        histogram_quantiles,
    )

    df = spark.createDataFrame(rows, "seq long, value double")
    got = {
        r["quantile"]: r["est_value"]
        for r in histogram_quantiles(histogram_build(df, "value")).collect()
    }
    vals = sorted(v for _, v in rows)
    width = HIST_WIDTH_CENTS / 100.0
    for q in (0.5, 0.9, 0.99):
        exact = vals[math.ceil(q * len(vals)) - 1]
        assert abs(got[q] - exact) <= width, (q, got[q], exact)


# ---------------------------------------------------------------------------
# Modularity: the all-integer decomposition must match a DuckDB SQL
# replica bit-for-bit on ANY random graph + partition (the driver row
# pins one fixed graph; this pins the algebra itself).
# ---------------------------------------------------------------------------

edges_strategy = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)),
    min_size=1,
    max_size=80,
).filter(lambda es: any(a != b for a, b in es))

labels_seed = st.integers(0, 2**31 - 1)


@given(edges=edges_strategy, seed=labels_seed)
@SETTINGS
def test_fuzz_modularity_matches_duckdb(spark, edges, seed):
    from kafka_avro_order_processing_spark.operators.graph import modularity

    nodes = sorted({n for e in edges for n in e})
    labels = [(n, (n * seed) % 5) for n in nodes]
    e_df = spark.createDataFrame(edges, "src long, dst long")
    l_df = spark.createDataFrame(labels, "node long, community long")
    got = sorted(
        (
            r["community"],
            r["n_members"],
            r["intra_edges"],
            r["degree_sum"],
            r["contrib_num"],
            r["denom"],
        )
        for r in modularity(e_df, l_df).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE e (src BIGINT, dst BIGINT); "
        "CREATE TABLE l (node BIGINT, community BIGINT)"
    )
    con.executemany("INSERT INTO e VALUES (?, ?)", edges)
    con.executemany("INSERT INTO l VALUES (?, ?)", labels)
    want = sorted(
        tuple(r)
        for r in con.execute("""
            WITH und AS (
              SELECT DISTINCT LEAST(src, dst) AS lo, GREATEST(src, dst) AS hi
              FROM e WHERE src <> dst),
            m AS (SELECT COUNT(*) AS m FROM und),
            sym AS (SELECT lo AS n FROM und UNION ALL SELECT hi FROM und),
            deg AS (SELECT n, COUNT(*) AS d FROM sym GROUP BY n),
            intra AS (
              SELECT la.community, COUNT(*) AS c
              FROM und u
              JOIN l la ON la.node = u.lo
              JOIN l lb ON lb.node = u.hi
              WHERE la.community = lb.community GROUP BY 1),
            degsum AS (
              -- LEFT join: nodes labeled but absent from the canonical
              -- edge list (e.g. self-loop-only nodes) count as members
              -- with zero degree, mirroring operators/graph.modularity
              SELECT l.community, COUNT(*) AS nm,
                     CAST(SUM(COALESCE(d.d, 0)) AS BIGINT) AS ds
              FROM l LEFT JOIN deg d ON d.n = l.node GROUP BY 1)
            SELECT ds.community, ds.nm,
                   CAST(COALESCE(i.c, 0) AS BIGINT),
                   ds.ds,
                   CAST(4 * m.m * COALESCE(i.c, 0) - ds.ds * ds.ds AS BIGINT),
                   CAST(4 * m.m * m.m AS BIGINT)
            FROM degsum ds CROSS JOIN m
            LEFT JOIN intra i ON i.community = ds.community
        """).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# Exact-moment Pearson r: bit-identical to a DuckDB replica on ANY
# (group, small-int, 2-dp money) data — the strongest claim the
# statistics family makes, pinned beyond the fixed driver tables.
# ---------------------------------------------------------------------------

corr_rows_strategy = st.lists(
    st.tuples(
        st.sampled_from(["A", "B", "C"]),
        st.integers(1, 50),
        st.decimals(min_value=1, max_value=100_000, places=2).map(float),
    ),
    min_size=4,
    max_size=150,
)


@given(rows=corr_rows_strategy)
@SETTINGS
def test_fuzz_exact_moment_corr_matches_duckdb(spark, rows):
    df = spark.createDataFrame(
        rows, "l_returnflag string, l_quantity long, l_extendedprice double"
    )
    from kafka_avro_order_processing_spark.plans.registry import (
        _qpc_assemble,
        _qpc_moments,
    )

    got = sorted(
        (r["l_returnflag"], r["n_items"], r["sum_qty"],
         r["sum_price_cents"], repr(r["corr_qty_price"]))
        for r in _qpc_assemble(_qpc_moments(df)).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t (l_returnflag VARCHAR, l_quantity BIGINT,"
        " l_extendedprice DOUBLE)"
    )
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        (f, n, sx, sy, repr(c))
        for f, n, sx, sy, c in con.execute("""
            WITH xy AS (
              SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
                     CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
                          AS BIGINT) AS y
              FROM t),
            mo AS (
              SELECT l_returnflag, COUNT(*) AS n,
                     CAST(SUM(x) AS BIGINT) AS sx,
                     CAST(SUM(y) AS BIGINT) AS sy,
                     CAST(SUM(x * x) AS BIGINT) AS sxx,
                     CAST(SUM(x * y) AS BIGINT) AS sxy,
                     SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
              FROM xy GROUP BY l_returnflag)
            SELECT l_returnflag, n, sx, sy,
                   CAST(CAST(n AS DECIMAL(10,0)) * CAST(sxy AS DECIMAL(28,0))
                        - CAST(sx AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                        AS DOUBLE)
                   / sqrt(
                       CAST(CAST(n AS DECIMAL(10,0)) * CAST(sxx AS DECIMAL(28,0))
                            - CAST(sx AS DECIMAL(19,0)) * CAST(sx AS DECIMAL(19,0))
                            AS DOUBLE)
                       * CAST(CAST(n AS DECIMAL(10,0)) * CAST(syy AS DECIMAL(28,0))
                            - CAST(sy AS DECIMAL(19,0)) * CAST(sy AS DECIMAL(19,0))
                            AS DOUBLE))
            FROM mo
        """).fetchall()
    )
    assert got == want


# ---------------------------------------------------------------------------
# The LOCF count-over/max idiom (daily_revenue_filled) and the
# zero-float anomaly inequality (revenue_anomaly_days): both must
# agree with DuckDB replicas on ARBITRARY sparse integer series, not
# just the driver's orders table.
# ---------------------------------------------------------------------------

series_strategy = st.dictionaries(
    st.integers(0, 60),        # day index
    st.integers(0, 10**9),     # cents
    min_size=1,
    max_size=40,
)


@given(series=series_strategy)
@SETTINGS
def test_fuzz_locf_idiom_matches_duckdb(spark, series):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    rows = sorted(series.items())
    daily = spark.createDataFrame(rows, "day long, rev_cents long")
    spine = daily.agg(
        F.min("day").alias("lo"), F.max("day").alias("hi")
    ).select(F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("day"))
    w_run = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    joined = spine.join(daily, "day", "left").withColumn(
        "grp", F.count("rev_cents").over(w_run)
    )
    got = sorted(
        (r["day"], r["filled"], r["was_missing"])
        for r in joined.select(
            "day",
            F.max("rev_cents").over(Window.partitionBy("grp")).alias("filled"),
            F.col("rev_cents").isNull().alias("was_missing"),
        ).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (day BIGINT, rev_cents BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute("""
            WITH bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
            spine AS (SELECT UNNEST(range(lo, hi + 1)) AS day FROM bounds),
            joined AS (
              SELECT s.day, d.rev_cents,
                     COUNT(d.rev_cents) OVER (ORDER BY s.day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS grp
              FROM spine s LEFT JOIN d ON d.day = s.day)
            SELECT day,
                   CAST(MAX(rev_cents) OVER (PARTITION BY grp) AS BIGINT),
                   rev_cents IS NULL
            FROM joined
        """).fetchall()
    )
    assert got == want
    # LOCF semantics directly: python reference over the same series
    lo, hi = min(series), max(series)
    carried = None
    ref = []
    for day in range(lo, hi + 1):
        if day in series:
            carried = series[day]
        ref.append((day, carried, day not in series))
    assert got == ref


@given(series=series_strategy)
@SETTINGS
def test_fuzz_anomaly_inequality_matches_python_ints(spark, series):
    from pyspark.sql import functions as F

    rows = sorted(series.items())
    daily = spark.createDataFrame(rows, "day long, rev_cents long")
    mo = daily.agg(
        F.count("*").alias("n"),
        F.sum("rev_cents").cast("long").alias("sy"),
        F.sum(
            (F.col("rev_cents") * F.col("rev_cents")).cast("decimal(38,0)")
        ).alias("syy"),
    )
    dev = (
        F.col("n").cast("decimal(10,0)") * F.col("rev_cents").cast("decimal(19,0)")
        - F.col("sy").cast("decimal(28,0)")
    ).cast("decimal(19,0)")
    var4 = 4 * (
        F.col("n").cast("decimal(10,0)") * F.col("syy").cast("decimal(28,0)")
        - F.col("sy").cast("decimal(19,0)") * F.col("sy").cast("decimal(19,0)")
    )
    got = {
        r["day"]: r["flag"]
        for r in daily.crossJoin(F.broadcast(mo))
        .select("day", ((dev * dev) > var4).alias("flag"))
        .collect()
    }
    n = len(series)
    sy = sum(series.values())
    syy = sum(v * v for v in series.values())
    for day, v in series.items():
        assert got[day] == ((n * v - sy) ** 2 > 4 * (n * syy - sy * sy)), day


# ---------------------------------------------------------------------------
# The md5-ordering idiom family (training_order_shuffle /
# stratified_sample / deterministic_sample): a pseudo-random but
# engine-reproducible order comes from sorting on md5(seed:id).  That
# only works if BOTH engines produce identical hex digests AND order
# them identically (byte-wise, no collation drift) AND break the
# (astronomically unlikely, but also planted-duplicate) ties the same
# way.  Fuzz the idiom itself over arbitrary id sets and seeds.
# ---------------------------------------------------------------------------

ids_strategy = st.lists(
    st.integers(0, 2**40), min_size=1, max_size=120, unique=True
)
seed_strategy = st.integers(0, 10**6)


@given(ids=ids_strategy, seed=seed_strategy)
@SETTINGS
def test_fuzz_md5_shuffle_order_matches_duckdb(spark, ids, seed):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    key = F.md5(F.concat(F.lit(f"epoch{seed}:"), F.col("doc_id").cast("string")))
    w = Window.orderBy("shuffle_key", "doc_id")
    got = [
        (r["doc_id"], r["shuffle_key"], r["pos"], r["bucket"])
        for r in df.select("doc_id", key.alias("shuffle_key"))
        .select(
            "doc_id",
            "shuffle_key",
            F.row_number().over(w).alias("pos"),
            F.substring("shuffle_key", 1, 2).alias("bucket"),
        )
        .collect()
    ]
    got.sort(key=lambda t: t[2])
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT)")
    con.executemany("INSERT INTO d VALUES (?)", [(i,) for i in ids])
    want = con.execute(f"""
        SELECT doc_id, shuffle_key,
               ROW_NUMBER() OVER (ORDER BY shuffle_key, doc_id) AS pos,
               substring(shuffle_key, 1, 2) AS bucket
        FROM (SELECT doc_id,
                     md5('epoch{seed}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
              FROM d)
        ORDER BY pos
    """).fetchall()
    assert got == [tuple(r) for r in want]


strata_strategy = st.lists(
    st.tuples(st.sampled_from(["news", "web", "code", "books"]),
              st.integers(0, 2**40)),
    min_size=1,
    max_size=120,
    unique_by=lambda r: r[1],
)


@given(rows=strata_strategy, seed=seed_strategy)
@SETTINGS
def test_fuzz_stratified_md5_quota_matches_duckdb(spark, rows, seed):
    """Exact-quota stratified sampling: one rank window per stratum
    ordered by the md5 draw — the sampled SET (not just counts) must be
    identical across engines for any data and seed."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    QUOTA = 3
    df = spark.createDataFrame(rows, "source string, doc_id long")
    key = F.md5(
        F.concat(F.lit(f"s{seed}:"), F.col("doc_id").cast("string"))
    )
    w = Window.partitionBy("source").orderBy("draw", "doc_id")
    got = sorted(
        (r["source"], r["doc_id"], r["rk"])
        for r in df.select("source", "doc_id", key.alias("draw"))
        .select("source", "doc_id", F.row_number().over(w).alias("rk"))
        .filter(F.col("rk") <= QUOTA)
        .collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE d (source VARCHAR, doc_id BIGINT)")
    con.executemany("INSERT INTO d VALUES (?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(f"""
            SELECT source, doc_id, rk FROM (
              SELECT source, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY source
                       ORDER BY md5('s{seed}:' || CAST(doc_id AS VARCHAR)),
                                doc_id) AS rk
              FROM d)
            WHERE rk <= {QUOTA}
        """).fetchall()
    )
    assert got == want
    # quota exactness: per-stratum count = min(QUOTA, stratum size)
    from collections import Counter

    sizes = Counter(s for s, _ in rows)
    picked = Counter(s for s, _, _ in got)
    assert picked == {s: min(QUOTA, n) for s, n in sizes.items()}


# ---------------------------------------------------------------------------
# Exact set-similarity join (prefix filtering / AllPairs): the filter
# is an OPTIMIZATION, so the result must equal the brute-force
# all-pairs Jaccard computation on ANY corpus — the no-false-negatives
# property that separates it from MinHash-LSH.  Tiny vocabularies force
# heavy shingle sharing, the adversarial regime for prefix rarity.
# ---------------------------------------------------------------------------


def _shingles3(text: str) -> set[str]:
    t = text.split(" ")
    return {
        " ".join(t[i:i + 3]) for i in range(len(t) - 2)
    } if len(t) >= 3 else set()


@given(texts=corpus_strategy)
@SETTINGS
def test_fuzz_setsim_join_equals_brute_force(spark, texts):
    from kafka_avro_order_processing_spark.operators.dedup import (
        set_similarity_join,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["n_common"], r["size_a"], r["size_b"])
        for r in set_similarity_join(df).collect()
    )
    sets = {i: _shingles3(t) for i, t in rows}
    want = sorted(
        (a, b, len(sets[a] & sets[b]), len(sets[a]), len(sets[b]))
        for a in sets
        for b in sets
        if a < b and sets[a] and sets[b]
        and 3 * len(sets[a] & sets[b]) >= len(sets[a]) + len(sets[b])
    )
    assert got == want


@given(texts=corpus_strategy)
@SETTINGS
def test_fuzz_setsim_join_general_threshold(spark, texts):
    """The prefix-length and verification algebra must hold for ANY
    rational threshold, not just the registered 1/2 — run t = 2/3
    against brute force (different prefix lengths, different integer
    inequality: 5*|∩| >= 2*(|a|+|b|))."""
    from kafka_avro_order_processing_spark.operators.dedup import (
        set_similarity_join,
    )

    rows = [(i, t) for i, t in enumerate(texts)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = sorted(
        (r["doc_a"], r["doc_b"], r["n_common"])
        for r in set_similarity_join(df, sim_num=2, sim_den=3).collect()
    )
    sets = {i: _shingles3(t) for i, t in rows}
    want = sorted(
        (a, b, len(sets[a] & sets[b]))
        for a in sets
        for b in sets
        if a < b and sets[a] and sets[b]
        and 5 * len(sets[a] & sets[b]) >= 2 * (len(sets[a]) + len(sets[b]))
    )
    assert got == want


occupancy_strategy = st.lists(
    st.tuples(st.integers(0, 5), st.integers(0, 30)),   # (bucket, user)
    min_size=1,
    max_size=120,
).map(lambda xs: sorted(set(xs)))


@given(occ=occupancy_strategy)
@SETTINGS
def test_fuzz_co_activity_cap_matches_python(spark, occ):
    """The capped co-activity edge construction vs a direct Python
    reference of the count+min rule, with the cap forced low (4) so
    arbitrary occupancies cross it both ways."""
    from kafka_avro_order_processing_spark.operators.graph import (
        co_activity_edges,
    )

    CAP = 4
    df = spark.createDataFrame(occ, "bk long, user_id long")
    got = {
        (r["src"], r["dst"])
        for r in co_activity_edges(df, ("bk",), max_bucket_size=CAP).collect()
    }
    from collections import defaultdict

    members = defaultdict(set)
    for bk, u in occ:
        members[bk].add(u)
    want = set()
    for us in members.values():
        if len(us) <= CAP:
            us = sorted(us)
            want |= {(a, b) for i, a in enumerate(us) for b in us[i + 1:]}
        else:
            m = min(us)
            want |= {(m, u) for u in us if u != m}
    assert got == want
