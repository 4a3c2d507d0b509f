"""Degree-ordered triangle counting: exact counts on known topologies
and agreement with a brute-force itertools enumeration on a seeded
random graph (the operator's whole contract is exactness).
"""

from __future__ import annotations

import itertools
import random

import pytest

from kafka_avro_order_processing_spark.operators.graph import triangle_counts


def _brute(edges: list[tuple[int, int]]) -> dict[int, int]:
    und = {tuple(sorted(e)) for e in edges if e[0] != e[1]}
    nodes = sorted({n for e in und for n in e})
    out = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(nodes, 3):
        if {(a, b), (a, c), (b, c)} <= und:
            out[a] += 1
            out[b] += 1
            out[c] += 1
    return out


CASES = {
    "single_triangle": [(1, 2), (2, 3), (3, 1)],
    "k4": [(a, b) for a, b in itertools.combinations(range(4), 2)],
    "chain_no_triangles": [(i, i + 1) for i in range(10)],
    "two_triangles_shared_edge": [(1, 2), (2, 3), (3, 1), (2, 4), (3, 4)],
    "hub_star_plus_rim": [(0, i) for i in range(1, 8)] + [(i, i + 1) for i in range(1, 7)],
    "self_loops_and_dups": [(1, 1), (1, 2), (2, 1), (2, 3), (3, 1), (3, 3)],
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_known_topologies(spark, name):
    edges = CASES[name]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == _brute(edges)


def test_random_graph_matches_brute_force(spark):
    r = random.Random(23)
    edges = [(r.randrange(40), r.randrange(40)) for _ in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r_["node"]: r_["n_triangles"] for r_ in triangle_counts(df).collect()}
    assert got == _brute(edges)
    assert sum(got.values()) > 0  # the seed produces a non-degenerate case
