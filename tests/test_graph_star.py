"""large-star/small-star connected components: equivalence with the
min-label implementation on topologies chosen to stress each algorithm
(long chains kill min-label round counts; high-degree stars and skewed
random graphs are the star algorithm's home turf).

Reference behavior target: clustering near-duplicate docs into
canonical groups (the reference engine has no graph op; this is the
M5 dedup endgame — see operators/graph.py docstring for the paper).
"""

from __future__ import annotations

import random

import pytest

from kafka_avro_order_processing_spark.operators.graph import (
    connected_components,
    connected_components_star,
)


def _labels(df):
    return {(r["node"], r["component"]) for r in df.collect()}


TOPOLOGIES = {
    "chain": lambda: [(i, i + 1) for i in range(30)],
    "star_hub": lambda: [(5, i) for i in range(6, 40)],
    "two_cliques_bridge": lambda: (
        [(i, j) for i in range(5) for j in range(i + 1, 5)]
        + [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
        + [(4, 10)]
    ),
    "random_sparse": lambda: [
        (r.randrange(200), r.randrange(200))
        for r in [random.Random(7)]
        for _ in range(150)
    ],
    "self_loops_dups": lambda: [(1, 1), (1, 2), (2, 1), (3, 3)],
}


@pytest.mark.parametrize("name", sorted(TOPOLOGIES))
@pytest.mark.slow
def test_star_matches_min_label(spark, name):
    edges = spark.createDataFrame(TOPOLOGIES[name](), "src long, dst long")
    assert _labels(connected_components_star(edges)) == _labels(
        connected_components(edges, max_iterations=200)
    )


def test_star_components_are_minima(spark):
    # every component label is the minimum node id of its member set
    r = random.Random(42)
    edges = spark.createDataFrame(
        [(r.randrange(300), r.randrange(300)) for _ in range(220)],
        "src long, dst long",
    )
    labels = _labels(connected_components_star(edges))
    by_comp: dict[int, set[int]] = {}
    for node, comp in labels:
        by_comp.setdefault(comp, set()).add(node)
    for comp, members in by_comp.items():
        assert comp == min(members)
