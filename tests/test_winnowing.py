"""Winnowing fingerprints (operators/substr.winnow_fingerprints):
Python-replica parity (exact rightmost-min selection), the paper's
coverage guarantee, short-doc conventions, and a DuckDB oracle via
the driver's canonicalization (promotion-ready).
"""

from __future__ import annotations

import hashlib
import re

import pytest

from kafka_avro_order_processing_spark.operators.substr import winnow_fingerprints

K, W = 3, 4


def _py_winnow(texts, k=K, w=W):
    out = {}
    for did, text in texts:
        toks = [t for t in re.split(r"\s+", text or "") if t]
        grams = [
            " ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)
        ]
        hs = [
            int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams
        ]
        n = len(hs)
        if n == 0:
            continue
        sel = set()
        if n < w:
            m = min(hs)
            p = max(i for i, x in enumerate(hs) if x == m)
            sel.add((p, m))
        else:
            for e in range(w - 1, n):
                lo = e - w + 1
                m = min(hs[lo : e + 1])
                p = max(i for i in range(lo, e + 1) if hs[i] == m)
                sel.add((p, m))
        out[did] = sel
    return out


DOCS = [
    (1, "a b c d e f g h i j k l m"),
    (2, "x y z a b c d e f g q r"),          # shares 'a b c d e f g' with 1
    (3, "p q"),                              # < k tokens: nothing
    (4, "m n o p"),                          # exactly 2 grams < window
    (5, ""),
    (6, None),
    (7, "w w w w w w w w"),                  # all-equal hashes: tie breaking
]


def _collect(spark, docs, k=K, w=W):
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got: dict = {}
    for r in winnow_fingerprints(df, k=k, window=w).collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["hash"]))
    return got


def test_matches_python_replica(spark):
    assert _collect(spark, DOCS) == _py_winnow(DOCS)


def test_guarantee_shared_run_shares_a_fingerprint(spark):
    """Any shared run of >= window + k - 1 tokens must share at least
    one selected (hash) — the winnowing local guarantee."""
    shared = "s1 s2 s3 s4 s5 s6"  # 6 tokens = W + K - 1
    docs = [
        (1, f"a b c {shared} d e"),
        (2, f"zz {shared} yy xx ww vv"),
    ]
    got = _collect(spark, docs)
    h1 = {h for _, h in got[1]}
    h2 = {h for _, h in got[2]}
    assert h1 & h2, "shared passage produced no shared fingerprint"


def test_short_doc_and_tie_conventions(spark):
    got = _collect(spark, DOCS)
    assert 3 not in got and 5 not in got and 6 not in got
    assert len(got[4]) == 1                      # one fingerprint, short doc
    want4 = _py_winnow([DOCS[3]])[4]
    assert got[4] == want4
    # all-equal hashes: rightmost of each window -> one per position
    # from pos W-1 on; replica agrees exactly
    assert got[7] == _py_winnow([DOCS[6]])[7]


def test_validates_params(spark):
    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    with pytest.raises(ValueError):
        winnow_fingerprints(df, k=0)
    with pytest.raises(ValueError):
        winnow_fingerprints(df, window=0)


def test_duckdb_oracle_parity(spark):
    from test_oracle_parity import SF_DIR, _canon, _duck
    from kafka_avro_order_processing_spark.sources.tables import load_table

    sdf = winnow_fingerprints(load_table(spark, SF_DIR, "documents"), k=K, window=W)

    md5g = "md5(gram)"
    hex_int = " + ".join(
        f"(strpos('0123456789abcdef', substr({md5g}, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
        for i in range(8)
    )
    sql = f"""
    WITH toks AS (
      SELECT doc_id, list_filter(regexp_split_to_array(text, '\\s+'),
                                 t -> t <> '') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, i - 1 AS pos,
             array_to_string(list_slice(toks, i, i + {K - 1}), ' ') AS gram
      FROM (
        SELECT doc_id, toks,
               unnest(generate_series(1, greatest(len(toks) - {K - 1}, 0))) AS i
        FROM toks)
    ),
    h AS (SELECT doc_id, pos, CAST({hex_int} AS BIGINT) AS h FROM g),
    wnd AS (
      SELECT doc_id, pos,
             COUNT(*) OVER (PARTITION BY doc_id) AS n,
             MIN({{'h': h, 'np': -pos}}) OVER (
               PARTITION BY doc_id ORDER BY pos
               ROWS BETWEEN {W - 1} PRECEDING AND CURRENT ROW) AS sel
      FROM h
    )
    SELECT DISTINCT doc_id,
           CAST(-((sel).np) AS INTEGER) AS pos,
           (sel).h AS hash
    FROM wnd WHERE pos >= LEAST({W}, n) - 1
    """
    con = _duck(SF_DIR)
    orows = con.execute(sql).fetchall()
    ocols = [d[0] for d in con.description]
    s_cols, s_data = _canon(sdf.columns, [tuple(r) for r in sdf.collect()])
    o_cols, o_data = _canon(ocols, orows)
    assert s_cols == o_cols
    assert s_data == o_data


def test_candidate_pairs_surface_shared_passage(spark):
    from kafka_avro_order_processing_spark.operators.substr import (
        winnow_candidate_pairs,
    )

    shared = "s1 s2 s3 s4 s5 s6 s7 s8"
    docs = [
        (1, f"a b c {shared} d e"),
        (2, f"zz {shared} yy xx ww vv"),
        (3, "totally different words here only once"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=K, window=W)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["shared_hashes"]
        for r in winnow_candidate_pairs(fps, min_shared=1).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] >= 1
    assert not any(3 in p for p in pairs)


def test_candidate_pairs_min_shared_and_star_cap(spark):
    from kafka_avro_order_processing_spark.operators.substr import (
        winnow_candidate_pairs,
    )

    # 10 docs all containing one boilerplate passage -> one hot hash
    # bucket; cap 4 forces the min-id star with NULL shared_hashes
    passage = "b1 b2 b3 b4 b5 b6"
    docs = [(i, f"u{i} v{i} {passage} w{i}") for i in range(1, 11)]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    fps = winnow_fingerprints(df, k=K, window=W)
    pairs = winnow_candidate_pairs(fps, min_shared=1, max_bucket_size=4).collect()
    stars = [r for r in pairs if r["shared_hashes"] is None]
    assert stars, "hot bucket did not star"
    assert all(r["doc_a"] == 1 for r in stars)  # min-id center
    # every doc stays transitively connected through the star
    touched = {r["doc_a"] for r in pairs} | {r["doc_b"] for r in pairs}
    assert touched == set(range(1, 11))
    # min_shared prunes singleton-overlap pairs when the bar is higher
    few = winnow_candidate_pairs(fps, min_shared=10**6, max_bucket_size=4).collect()
    assert all(r["shared_hashes"] is None for r in few)
