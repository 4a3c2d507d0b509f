"""The round-12 promotion block (plans/promotions_r12.py), driven
END-TO-END the way the grading driver would: the staged ``Query``'s
``fn(spark, SF_DIR)`` against its own ``oracle`` SQL string through
the driver's canonicalization + the arrow integer-dtype gate — so the
round-12 swap is promote() + one _LEAD_ORDER fill name, with nothing
left to prove.  (Round 11 has ZERO slots — its window is exactly the
50 r8-deadline names; see the boundary comment in registry.py.)
"""

from __future__ import annotations

import pytest

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.plans.promotions_r12 import (
    R12_PROMOTIONS,
    promote,
)
from kafka_avro_order_processing_spark.plans.registry import QUERIES

EXPECTED = ("rrf_fuse", "window_funnel")


def test_queue_is_exactly_the_named_block():
    assert tuple(R12_PROMOTIONS) == EXPECTED


def test_staged_not_registered_and_no_collisions():
    """Rounds 10-11 have no slot for it: the block must NOT be live,
    and its future name must be free in the registry."""
    clash = set(R12_PROMOTIONS) & set(QUERIES)
    assert not clash, f"staged names already registered: {sorted(clash)}"


def test_block_is_fully_formed():
    for name, q in R12_PROMOTIONS.items():
        assert q.name == name
        assert callable(q.fn)
        assert q.oracle and "SELECT" in q.oracle.upper(), name
        assert q.doc and q.tags, name


def test_promote_refuses_collisions(monkeypatch):
    name = EXPECTED[0]
    monkeypatch.setitem(QUERIES, name, R12_PROMOTIONS[name])
    with pytest.raises(ValueError, match=name):
        promote()


def test_promote_inserts_the_block(monkeypatch):
    before = dict(QUERIES)
    try:
        promote()
        for name, q in R12_PROMOTIONS.items():
            assert QUERIES[name] is q
    finally:
        QUERIES.clear()
        QUERIES.update(before)


@pytest.mark.parametrize("name", EXPECTED)
def test_block_oracle_parity(spark, name):
    """The driver's exact compare on the staged block at SF_DIR."""
    q = R12_PROMOTIONS[name]
    _assert_parity(q.fn(spark, SF_DIR), q.oracle)


@pytest.mark.parametrize("name", EXPECTED)
def test_block_oracle_parity_sf001(spark, name):
    from test_oracle_parity import _duck

    q = R12_PROMOTIONS[name]
    _assert_parity(
        q.fn(spark, "/root/testdata/sf0.001"),
        q.oracle,
        con=_duck("/root/testdata/sf0.001"),
    )
