"""Property-based tests for the graph operators: for ANY generated
edge list, the distributed loops must equal their pure-Python mirrors
EXACTLY (integer arithmetic is the determinism contract), and triangle
counts must equal brute-force enumeration.
"""

from __future__ import annotations

import collections
import itertools

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from kafka_avro_order_processing_spark.operators.graph import (
    PAGERANK_SCALE,
    label_propagation,
    pagerank,
    triangle_counts,
)

edges_strategy = st.lists(
    st.tuples(st.integers(0, 25), st.integers(0, 25)),
    min_size=1,
    max_size=60,
).filter(lambda es: any(a != b for a, b in es))

SETTINGS = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _sym(pairs):
    und = {(a, b) for a, b in pairs if a != b}
    return sorted(und | {(b, a) for a, b in und})


def _py_pagerank(edges, iterations):
    base = (3 * PAGERANK_SCALE) // 20
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {n: PAGERANK_SCALE for n in deg}
    for _ in range(iterations):
        sums: dict[int, int] = {}
        for s, d in edges:
            sums[d] = sums.get(d, 0) + ranks[s] // deg[s]
        ranks = {n: base + (17 * sums.get(n, 0)) // 20 for n in deg}
    return ranks


def _py_lpa(edges, iters):
    sym = collections.defaultdict(set)
    for a, b in edges:
        if a != b:
            sym[a].add(b)
            sym[b].add(a)
    labels = {n: n for n in sym}
    for _ in range(iters):
        labels = {
            n: min(
                (cnt := collections.Counter(labels[m] for m in nbrs)),
                key=lambda l: (-cnt[l], l),
            )
            for n, nbrs in sym.items()
        }
    return labels


def _brute_triangles(edges):
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    out = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            out[a] += 1
            out[b] += 1
            out[c] += 1
    return out


@given(edges=edges_strategy)
@SETTINGS
def test_pagerank_matches_mirror_on_any_graph(spark, edges):
    sym = _sym(edges)
    df = spark.createDataFrame(sym, "src long, dst long")
    got = {r["node"]: r["rank_scaled"] for r in pagerank(df, 2).collect()}
    assert got == _py_pagerank(sym, 2)


@given(edges=edges_strategy)
@SETTINGS
def test_lpa_matches_mirror_on_any_graph(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["community"] for r in label_propagation(df, 2).collect()}
    assert got == _py_lpa(edges, 2)


@given(edges=edges_strategy)
@SETTINGS
def test_triangles_match_brute_on_any_graph(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == _brute_triangles(edges)
