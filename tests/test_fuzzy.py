"""Blocked edit-distance record linkage (operators/fuzzy.py): exact
agreement with a pure-Python reference, the deterministic oversize-skip
bound, tie-break totality, and a cross-engine ASCII fuzz (Spark and
DuckDB levenshtein agree on ASCII; non-ASCII diverges by design —
codepoints vs bytes — which the operator contract excludes).
"""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_avro_order_processing_spark.operators.fuzzy import (
    MAX_FUZZY_BLOCK,
    fuzzy_best_match,
)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _py_best(rows, max_distance=4, max_block=MAX_FUZZY_BLOCK):
    from collections import Counter

    sizes = Counter(blk for _, _, blk in rows)
    out = {}
    for rid, text, blk in rows:
        if sizes[blk] > max_block:
            continue
        cands = [
            (_lev(text, ct), cid, ct)
            for cid, ct, cb in rows
            if cb == blk and cid != rid and sizes[cb] <= max_block
        ]
        cands = [c for c in cands if c[0] <= max_distance]
        if cands:
            d, cid, ct = min(cands)
            out[rid] = (cid, ct, d)
    return out


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "id long, text string, blk string")
    return {
        r["id"]: (r["match_id"], r["match_text"], r["distance"])
        for r in fuzzy_best_match(df, F.col("blk"), **kw).collect()
    }


def test_matches_python_reference(spark):
    rows = [
        (1, "large ring", "ring"),
        (2, "small ring", "ring"),
        (3, "large wing", "ring"),      # same block, dist 1 to #1
        (4, "totally different name", "ring"),
        (5, "large ring", "bolt"),      # other block: never matches #1
        (6, "larg ring", "bolt"),
    ]
    got = _run(spark, rows)
    assert got == _py_best(rows)
    assert got[1] == (3, "large wing", 1)     # nearest, not just any
    assert 4 not in got                        # beyond threshold: no row


def test_oversized_block_is_skipped(spark):
    rows = [(i, f"name {i:04d}", "hot") for i in range(30)] + [
        (100, "abc", "cool"),
        (101, "abd", "cool"),
    ]
    got = _run(spark, rows, max_block_size=10)
    # hot block (30 > 10) contributes nothing; cool block matches.
    assert got == {100: (101, "abd", 1), 101: (100, "abc", 1)}


def test_tie_breaks_on_smallest_candidate_id(spark):
    rows = [
        (10, "aaaa", "b"),
        (7, "aaab", "b"),
        (8, "aaac", "b"),   # same distance 1 from #10 as #7
    ]
    got = _run(spark, rows)
    assert got[10] == (7, "aaab", 1)  # smallest cid wins the tie


ascii_rows = st.lists(
    st.tuples(
        st.integers(0, 10_000),
        st.text(alphabet="abcdef ", min_size=0, max_size=8),
        st.sampled_from(["p", "q"]),
    ),
    min_size=1,
    max_size=25,
    unique_by=lambda r: r[0],
)


@given(rows=ascii_rows)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_fuzz_matches_duckdb_on_ascii(spark, rows):
    got = sorted((k, *v) for k, v in _run(spark, rows).items())
    con = duckdb.connect()
    con.execute("CREATE TABLE t (id BIGINT, text VARCHAR, blk VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    want = sorted(
        tuple(r)
        for r in con.execute(f"""
            WITH sizes AS (SELECT blk, COUNT(*) n FROM t GROUP BY blk),
            ok AS (SELECT t.* FROM t JOIN sizes s
                   ON s.blk = t.blk AND s.n <= {MAX_FUZZY_BLOCK}),
            scored AS (
              SELECT a.id, c.id AS cid, c.text AS ctext,
                     levenshtein(a.text, c.text) AS d
              FROM ok a JOIN ok c ON a.blk = c.blk AND a.id <> c.id
              WHERE levenshtein(a.text, c.text) <= 4)
            SELECT id, cid, ctext, CAST(d AS INTEGER)
            FROM (SELECT id, cid, ctext, d,
                         ROW_NUMBER() OVER (PARTITION BY id
                                            ORDER BY d, cid) rn
                  FROM scored)
            WHERE rn = 1
        """).fetchall()
    )
    assert got == want


def test_two_table_join_matches_python_reference(spark):
    from kafka_avro_order_processing_spark.operators.fuzzy import (
        fuzzy_join_between,
    )

    master = [(100, "large ring", "ring"), (101, "small bolt", "bolt"),
              (102, "large ringo", "ring")]
    incoming = [(1, "large ring", "ring"),     # exact: 100 (dist 0)
                (2, "small bolts", "bolt"),    # 101 (dist 1)
                (3, "no such thing", "ring"),  # nothing within 4
                (4, "large ring", "bolt")]     # wrong block: no match
    lf = spark.createDataFrame(incoming, "id long, text string, blk string")
    rf = spark.createDataFrame(master, "id long, text string, blk string")
    got = {
        r["id"]: (r["match_id"], r["distance"])
        for r in fuzzy_join_between(
            lf, rf, F.col("blk"), F.col("blk")
        ).collect()
    }
    assert got == {1: (100, 0), 2: (101, 1)}


def test_two_table_join_caps_on_right_block(spark):
    from kafka_avro_order_processing_spark.operators.fuzzy import (
        fuzzy_join_between,
    )

    rf = spark.createDataFrame(
        [(i, f"name {i:03d}", "hot") for i in range(30)]
        + [(99, "abc", "ok")],
        "id long, text string, blk string",
    )
    lf = spark.createDataFrame(
        [(1, "name 000", "hot"), (2, "abd", "ok")],
        "id long, text string, blk string",
    )
    got = {
        r["id"]: r["match_id"]
        for r in fuzzy_join_between(
            lf, rf, F.col("blk"), F.col("blk"), max_block_size=10
        ).collect()
    }
    assert got == {2: 99}  # hot right block skipped entirely


# ---------------------------------------------------------------------------
# Jaro-Winkler variant: pure-Python metric vs DuckDB's builtin, and the
# blocked best-match plan vs a Python reference.
# ---------------------------------------------------------------------------


def _py_best_jw(rows, min_similarity=0.85, max_block=MAX_FUZZY_BLOCK):
    from collections import Counter

    from kafka_avro_order_processing_spark.operators.fuzzy import (
        _jaro_winkler_py,
    )

    sizes = Counter(blk for _, _, blk in rows)
    out = {}
    for rid, text, blk in rows:
        if sizes[blk] > max_block:
            continue
        cands = [
            (-_jaro_winkler_py(text, ct), cid, ct)
            for cid, ct, cb in rows
            if cb == blk and cid != rid
        ]
        cands = [c for c in cands if -c[0] >= min_similarity]
        if cands:
            negs, cid, ct = min(cands)
            out[rid] = (cid, ct, -negs)
    return out


@given(
    st.lists(
        st.tuples(
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=12,
            ),
            st.text(
                alphabet=st.characters(min_codepoint=32, max_codepoint=126),
                max_size=12,
            ),
        ),
        min_size=1,
        max_size=30,
    )
)
@settings(max_examples=60, deadline=None)
def test_jaro_winkler_matches_duckdb(pairs):
    # The Python metric must agree with DuckDB's jaro_winkler_similarity
    # on printable ASCII to float-noise tolerance (same definition:
    # boost threshold 0.7, prefix cap 4, p = 0.1).
    from kafka_avro_order_processing_spark.operators.fuzzy import (
        _jaro_winkler_py,
    )

    con = duckdb.connect()
    for a, b in pairs:
        d = con.execute(
            "select jaro_winkler_similarity(?, ?)", [a, b]
        ).fetchone()[0]
        p = _jaro_winkler_py(a, b)
        assert abs(d - p) < 1e-12, (a, b, d, p)
    con.close()


def test_fuzzy_best_match_jw_agrees_with_reference(spark):
    from kafka_avro_order_processing_spark.operators.fuzzy import (
        fuzzy_best_match_jw,
    )

    rows = [
        (1, "acme turbo widget", "w"),
        (2, "acme turbo widget x", "w"),
        (3, "acme turbo gadget", "w"),
        (4, "zephyr drive", "w"),
        (5, "unrelated thing", "q"),
        (6, "unrelated thang", "q"),
        (7, "lonely", "z"),
    ]
    df = spark.createDataFrame(rows, "id long, text string, blk string")
    got = {
        r["id"]: (r["match_id"], r["match_text"], r["similarity"])
        for r in fuzzy_best_match_jw(
            df, F.col("blk"), min_similarity=0.85
        ).collect()
    }
    want = _py_best_jw([(i, t, b) for i, t, b in rows], 0.85)
    assert set(got) == set(want)
    for rid in want:
        assert got[rid][0] == want[rid][0]
        assert got[rid][1] == want[rid][1]
        assert abs(got[rid][2] - want[rid][2]) < 1e-12


def test_fuzzy_jw_oversized_block_skipped(spark):
    from kafka_avro_order_processing_spark.operators.fuzzy import (
        fuzzy_best_match_jw,
    )

    rows = [(i, "same text", "big") for i in range(30)]
    rows += [(1000, "pair a", "ok"), (1001, "pair b", "ok")]
    df = spark.createDataFrame(rows, "id long, text string, blk string")
    out = fuzzy_best_match_jw(
        df, F.col("blk"), min_similarity=0.5, max_block_size=10
    ).collect()
    ids = {r["id"] for r in out}
    assert ids == {1000, 1001}


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcde", max_size=14),
            st.text(alphabet="abcde", max_size=14),
        ),
        min_size=1,
        max_size=40,
    )
)
@settings(max_examples=80, deadline=None)
def test_jw_length_ratio_prune_is_necessary_condition(pairs):
    # The JVM-side prefilter in fuzzy_best_match_jw must never be able
    # to drop a qualifying pair: JW >= t implies
    # min_len / max_len >= 3 * (t - 0.4) / 0.6 - 2, for every t.
    from kafka_avro_order_processing_spark.operators.fuzzy import (
        _jaro_winkler_py,
    )

    for a, b in pairs:
        jwv = _jaro_winkler_py(a, b)
        if not a or not b:
            continue
        s, g = min(len(a), len(b)), max(len(a), len(b))
        for t in (0.8, 0.85, 0.9, 0.95):
            if jwv >= t:
                assert s / g >= 3.0 * (t - 0.4) / 0.6 - 2.0 - 1e-12, (
                    a,
                    b,
                    jwv,
                    t,
                )
