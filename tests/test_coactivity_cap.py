"""Hot-bucket cap for co-activity edge construction.

The naive per-bucket self-join is quadratic in bucket occupancy: one
bucket with 10^3 co-active users would emit ~5*10^5 pairs, and a
production bucket with 10^6 users would emit ~5*10^11 — the same blowup
lsh_candidate_pairs already guards against with a bucket cap + star
fallback.  These tests plant a hot bucket and pin:

1. the edge count is O(cap * n_buckets + hot_bucket_n), not O(n^2);
2. the fallback is the deterministic star (min id -> every other
   member), so hot-bucket members stay transitively connected;
3. the DuckDB mirror of the rule (the same count+min construction the
   registry oracles use) produces the IDENTICAL edge set on a
   triggering instance — the sf-parity tests never trigger the cap
   (max observed bucket at sf0.1 is 42 users), so this is the only
   place the mirrored branch is exercised.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from kafka_avro_order_processing_spark.operators.graph import (
    MAX_COACTIVITY_BUCKET,
    co_activity_edges,
)

HOT_N = 1000     # planted hot-bucket occupancy (>> MAX_COACTIVITY_BUCKET)
SMALL_N = 5      # a sane bucket that must keep all-pairs semantics


def _occupancy(spark):
    # Bucket 1: HOT_N users (hot).  Bucket 2: SMALL_N users (small).
    # User 7 sits in both buckets, so dedup across branches matters.
    rows = [(1, u) for u in range(7, 7 + HOT_N)] + [
        (2, u) for u in range(7, 7 + SMALL_N)
    ]
    return spark.createDataFrame(rows, "bk long, user_id long")


def test_hot_bucket_emits_star_not_all_pairs(spark):
    edges = co_activity_edges(_occupancy(spark), ("bk",)).collect()
    got = {(r.src, r.dst) for r in edges}
    # Hot bucket: star around min id (7).  Small bucket: all pairs.
    star = {(7, u) for u in range(8, 7 + HOT_N)}
    small_pairs = {
        (a, b)
        for a in range(7, 7 + SMALL_N)
        for b in range(a + 1, 7 + SMALL_N)
    }
    assert got == star | small_pairs
    # O(n) not O(n^2): the uncapped construction would emit
    # HOT_N*(HOT_N-1)/2 = 499500 pairs for the hot bucket alone.
    # (Union, not sum: user 7 sits in both buckets, so the small
    # bucket's (7, u) pairs coincide with star edges.)
    assert len(got) == len(star | small_pairs) < 2 * HOT_N


def test_cap_boundary_is_exact(spark):
    # A bucket at exactly the cap keeps all-pairs; one past it stars.
    at_cap = spark.createDataFrame(
        [(1, u) for u in range(MAX_COACTIVITY_BUCKET)], "bk long, user_id long"
    )
    n = MAX_COACTIVITY_BUCKET
    assert co_activity_edges(at_cap, ("bk",)).count() == n * (n - 1) // 2
    over = spark.createDataFrame(
        [(1, u) for u in range(n + 1)], "bk long, user_id long"
    )
    assert co_activity_edges(over, ("bk",)).count() == n


def test_duckdb_mirror_matches_on_triggering_instance(spark):
    """The registry oracles mirror the cap with the same count+min SQL;
    prove the two constructions agree on data that actually triggers
    the star branch (the parquet SFs never do)."""
    occ = _occupancy(spark)
    got = {
        (r.src, r.dst) for r in co_activity_edges(occ, ("bk",)).collect()
    }
    con = duckdb.connect()
    con.register("os_pd", pd.DataFrame(
        [(1, u) for u in range(7, 7 + HOT_N)]
        + [(2, u) for u in range(7, 7 + SMALL_N)],
        columns=["bk", "user_id"],
    ))
    # The identical shape the registry oracles use (see _TRIANGLE_ORACLE
    # / _lpa_ctes / _kcore_oracle in plans/registry.py).
    mirrored = con.execute(f"""
        WITH os AS (SELECT DISTINCT bk, user_id FROM os_pd),
        bs AS (
          SELECT bk, COUNT(*) AS bucket_n, MIN(user_id) AS min_id
          FROM os GROUP BY bk)
        SELECT DISTINCT lo, hi FROM (
          SELECT a.user_id AS lo, b.user_id AS hi
          FROM os a
          JOIN os b ON a.bk = b.bk AND a.user_id < b.user_id
          JOIN bs ON bs.bk = a.bk
                 AND bs.bucket_n <= {MAX_COACTIVITY_BUCKET}
          UNION ALL
          SELECT s.min_id AS lo, o.user_id AS hi
          FROM os o JOIN bs s ON s.bk = o.bk
          WHERE s.bucket_n > {MAX_COACTIVITY_BUCKET}
            AND o.user_id <> s.min_id)
    """).fetchall()
    assert got == set(mirrored)


def test_multi_column_bucket_keys(spark):
    # The (bk, event_type) variant used by user_communities /
    # community_modularity: the hot bucket in one event type must not
    # leak stars into another type's bucket with the same bk.
    rows = [(1, "click", u) for u in range(200)] + [
        (1, "purchase", u) for u in range(3)
    ]
    occ = spark.createDataFrame(rows, "bk long, event_type string, user_id long")
    edges = co_activity_edges(occ, ("bk", "event_type")).collect()
    got = {(r.src, r.dst) for r in edges}
    star = {(0, u) for u in range(1, 200)}
    purchase_pairs = {(0, 1), (0, 2), (1, 2)}
    assert got == star | purchase_pairs
