"""Priority sampling (operators/sampling.py): exact DuckDB oracle
parity for the full sample frame (global + grouped; priorities, tau,
est_weight all bit-matched), the <=k exact regime, subset-sum
unbiasedness across 200 independent replications in ONE grouped job,
loud rejection of NULL keys / non-positive weights, and partition
invariance."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.operators.sampling import (
    priority_sample,
    subset_sum_estimate,
)
from kafka_avro_order_processing_spark.sources.tables import load_table

_U_DEN = 4503599627370496.0  # 2^52


def _q_sql(key: str, weight: str, salt: str = "psamp") -> str:
    h = f"md5('{salt}:' || CAST({key} AS VARCHAR))"
    terms = " + ".join(
        f"(strpos('0123456789abcdef', substr({h}, {i + 1}, 1)) - 1)"
        f" * {16 ** (12 - i)}"
        for i in range(13)
    )
    return (
        f"CAST({weight} AS DOUBLE) / "
        f"(CAST(({terms}) + 1 AS DOUBLE) / {_U_DEN})"
    )


def test_global_sample_duckdb_oracle(spark):
    """Positive-value events rows, k=25: every output column including
    tau and est_weight bit-matches the replica."""
    ev = load_table(spark, SF_DIR, "events").filter(F.col("value") > 0)
    sdf = priority_sample(
        ev.select("event_id", "value"), "event_id", "value", k=25
    )
    sql = f"""
    WITH q AS (
      SELECT event_id, value, {_q_sql("event_id", "value")} AS priority
      FROM events WHERE value > 0
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (ORDER BY priority DESC, event_id) AS rn
      FROM q
    ), tt AS (
      SELECT COALESCE(MAX(CASE WHEN rn = 26 THEN priority END), 0.0) AS tau
      FROM r WHERE rn <= 26
    )
    SELECT r.event_id, r.value, r.priority, tt.tau,
           GREATEST(CAST(r.value AS DOUBLE), tt.tau) AS est_weight
    FROM r, tt WHERE r.rn <= 25
    """
    _assert_parity(sdf, sql)


def test_grouped_sample_duckdb_oracle(spark):
    ev = load_table(spark, SF_DIR, "events").filter(F.col("value") > 0)
    sdf = priority_sample(
        ev.select("event_type", "event_id", "value"),
        "event_id",
        "value",
        k=10,
        by=["event_type"],
    )
    sql = f"""
    WITH q AS (
      SELECT event_type, event_id, value,
             {_q_sql("event_id", "value")} AS priority
      FROM events WHERE value > 0
    ), r AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY priority DESC, event_id) AS rn
      FROM q
    ), tt AS (
      SELECT event_type,
             COALESCE(MAX(CASE WHEN rn = 11 THEN priority END), 0.0) AS tau
      FROM r WHERE rn <= 11 GROUP BY event_type
    )
    SELECT r.event_type, r.event_id, r.value, r.priority, tt.tau,
           GREATEST(CAST(r.value AS DOUBLE), tt.tau) AS est_weight
    FROM r JOIN tt USING (event_type) WHERE r.rn <= 10
    """
    _assert_parity(sdf, sql)


def test_small_group_exact_regime(spark):
    """Groups with <= k rows keep everything, tau = 0, est == weight:
    the estimator degenerates to the exact total."""
    df = spark.createDataFrame(
        [Row(g="a", key=i, w=float(i + 1)) for i in range(5)]
        + [Row(g="b", key=100 + i, w=2.0) for i in range(30)]
    )
    out = priority_sample(df, "key", "w", k=8, by=["g"]).collect()
    a_rows = [r for r in out if r["g"] == "a"]
    assert len(a_rows) == 5
    assert all(r["tau"] == 0.0 and r["est_weight"] == r["w"] for r in a_rows)
    assert len([r for r in out if r["g"] == "b"]) == 8


def test_subset_sum_unbiased_over_200_reps(spark):
    """200 independent replications (distinct key namespaces) in ONE
    grouped job; the mean subset-sum estimate must sit within 4
    empirical standard errors of the true subset total."""
    base = [(i, float(1 + (i * 7) % 40)) for i in range(40)]
    true_subset = sum(w for i, w in base if i % 3 == 0)
    rows = [
        Row(rep=rep, key=f"{rep}:{i}", i=i, w=w)
        for rep in range(200)
        for i, w in base
    ]
    df = spark.createDataFrame(rows)
    samp = priority_sample(df, "key", "w", k=10, by=["rep"])
    ests = [
        r["est_total_weight"] or 0.0
        for r in subset_sum_estimate(
            samp, F.col("i") % 3 == 0, by=["rep"]
        ).collect()
    ]
    # groups where no subset row was kept contribute 0 (missing rows).
    ests += [0.0] * (200 - len(ests))
    mean = sum(ests) / 200
    var = sum((e - mean) ** 2 for e in ests) / 199
    se = math.sqrt(var / 200)
    assert abs(mean - true_subset) <= 4 * se + 1e-9, (mean, true_subset, se)


def test_loud_rejection(spark):
    bad_w = spark.createDataFrame(
        [Row(key=1, w=2.0), Row(key=2, w=0.0), Row(key=3, w=1.0)]
    )
    with pytest.raises(Exception, match="non-positive"):
        priority_sample(bad_w, "key", "w", k=2).collect()
    bad_k = spark.createDataFrame(
        [Row(key=1, w=2.0), Row(key=None, w=1.0)]
    )
    with pytest.raises(Exception, match="priority_sample"):
        priority_sample(bad_k, "key", "w", k=2).collect()
    with pytest.raises(ValueError, match="k >= 1"):
        priority_sample(bad_w, "key", "w", k=0)


def test_partition_invariance(spark):
    ev = load_table(spark, SF_DIR, "events").filter(F.col("value") > 0)
    pick = lambda d: sorted(
        (r["event_id"], r["priority"], r["tau"]) for r in
        priority_sample(
            d.select("event_id", "value"), "event_id", "value", k=15
        ).collect()
    )
    assert pick(ev) == pick(ev.repartition(13))


def test_duplicate_key_in_head_raises(spark):
    """A replayed key inside the selected head distorts tau -> raise."""
    df = spark.createDataFrame(
        [Row(key=i % 5, w=1.0 + i % 3) for i in range(20)]
    )
    with pytest.raises(Exception, match="duplicate key"):
        priority_sample(df, "key", "w", k=8).collect()
    # unique keys at the same k stay silent
    ok = spark.createDataFrame([Row(key=i, w=1.0 + i % 3) for i in range(20)])
    assert priority_sample(ok, "key", "w", k=8).count() == 8


def _neyman_replica(moments, n_total, scale_bits=20):
    """Python replica over exact integer moments: same fixed-order
    float expressions, same largest-remainder order."""
    strata = sorted(moments, key=lambda t: str(t[0]))
    shares = []
    for g, n_h, s1, s2 in strata:
        if n_h < 2:
            sigma = 0.0
        else:
            num = float(n_h * s2 - s1 * s1)
            sigma = (num / (float(n_h) * float(n_h))) ** 0.5 / float(
                2**scale_bits
            )
        shares.append((g, n_h, float(n_h) * sigma))
    tot = sum(s for _, _, s in shares)
    if tot == 0.0:
        shares = [(g, n_h, float(n_h)) for g, n_h, _ in shares]
        tot = sum(s for _, _, s in shares)
    base = [
        (g, n_h, min(int(n_total * s / tot), n_h), (n_total * s / tot)
         - int(n_total * s / tot))
        for g, n_h, s in shares
    ]
    k = {g: b for g, _, b, _ in base}
    left = n_total - sum(k.values())
    order = sorted(base, key=lambda t: (-t[3], str(t[0])))
    i = 0
    while left > 0 and any(k[g] < n_h for g, n_h, _, _ in base):
        g, n_h, _, _ = order[i % len(order)]
        if k[g] < n_h:
            k[g] += 1
            left -= 1
        i += 1
    return [(g, n_h, k[g]) for g, n_h, _, _ in base]


def test_neyman_allocation_replica_and_budget(spark):
    """Allocation equals an independent Python replica over
    DuckDB-fetched exact moments; budget preserved; high-variance
    strata get MORE than proportional."""
    import duckdb

    from kafka_avro_order_processing_spark.operators.sampling import (
        neyman_allocation,
    )

    ev = load_table(spark, SF_DIR, "events")
    alloc = neyman_allocation(ev, "event_type", "value", n_total=100)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/events.parquet')"
    )
    moments = con.execute("""
        SELECT event_type, COUNT(*),
               CAST(SUM(CAST(FLOOR(value * 1048576.0 + 0.5) AS HUGEINT))
                    AS VARCHAR),
               CAST(SUM(CAST(FLOOR(value * 1048576.0 + 0.5) AS HUGEINT)
                        * CAST(FLOOR(value * 1048576.0 + 0.5) AS HUGEINT))
                    AS VARCHAR)
        FROM events GROUP BY event_type
    """).fetchall()
    moments = [(g, int(n), int(s1), int(s2)) for g, n, s1, s2 in moments]
    want = _neyman_replica(moments, 100)
    assert sorted(alloc) == sorted(want)
    assert sum(kh for _, _, kh in alloc) == 100
    # sanity: every budgeted stratum within its population
    assert all(0 <= kh <= n_h for _, n_h, kh in alloc)


def test_stratified_sample_matches_per_stratum_flat(spark):
    """Each stratum's rows equal a flat per-group priority_sample at
    that stratum's k (same priorities, tau, est_weight)."""
    from kafka_avro_order_processing_spark.operators.sampling import (
        neyman_allocation,
        stratified_priority_sample,
    )

    ev = load_table(spark, SF_DIR, "events").filter(F.col("value") > 0)
    alloc = neyman_allocation(ev, "event_type", "value", n_total=40)
    samp = stratified_priority_sample(
        ev.select("event_type", "event_id", "value"),
        "event_id",
        "value",
        "event_type",
        alloc,
    )
    got = {
        (r["event_type"], r["event_id"]): (r["priority"], r["tau"],
                                           r["est_weight"])
        for r in samp.collect()
    }
    n_rows = 0
    for g, _, kh in alloc:
        if kh == 0:
            continue
        flat = priority_sample(
            ev.filter(F.col("event_type") == g).select(
                "event_id", "value"
            ),
            "event_id",
            "value",
            k=kh,
        )
        for r in flat.collect():
            n_rows += 1
            assert got[(g, r["event_id"])] == (
                r["priority"], r["tau"], r["est_weight"]
            ), (g, r)
    assert n_rows == len(got) == sum(kh for _, _, kh in alloc)


def test_neyman_validation(spark):
    from kafka_avro_order_processing_spark.operators.sampling import (
        neyman_allocation,
        stratified_priority_sample,
    )

    ev = load_table(spark, SF_DIR, "events")
    with pytest.raises(ValueError, match="n_total >= 1"):
        neyman_allocation(ev, "event_type", "value", 0)
    bad = spark.createDataFrame(
        [Row(g="a", v=1.0), Row(g="a", v=None)], "g string, v double"
    )
    with pytest.raises(Exception, match="NULL/NaN"):
        neyman_allocation(bad, "g", "v", 5)
    with pytest.raises(ValueError, match="empty allocation"):
        stratified_priority_sample(ev, "event_id", "value", "event_type", [])


def test_uniform_sample_is_k_smallest_hashes(spark):
    """Unit weights degenerate to the k-min-hash uniform sample:
    deterministic, and subset-count estimation stays unbiased-ish
    (the est_weight sum over the sample approximates n)."""
    from kafka_avro_order_processing_spark.operators.kmv import kmv_hash
    from kafka_avro_order_processing_spark.operators.sampling import (
        uniform_sample,
    )

    ev = load_table(spark, SF_DIR, "events").select("event_id").distinct()
    n = ev.count()
    samp = uniform_sample(ev, "event_id", k=50)
    got = sorted(r["event_id"] for r in samp.collect())
    want = sorted(
        r["event_id"]
        for r in ev.withColumn(
            "h", kmv_hash(F.col("event_id"), "psamp")
        ).orderBy("h").limit(50).collect()
    )
    assert got == want
    est_n = sum(r["est_weight"] for r in samp.collect())
    assert abs(est_n - n) / n < 0.35, (est_n, n)
    # rerun-deterministic
    again = sorted(r["event_id"] for r in uniform_sample(
        ev.repartition(7), "event_id", k=50
    ).collect())
    assert again == got
