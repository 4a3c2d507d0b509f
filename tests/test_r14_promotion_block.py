"""The round-14+ promotion queue (plans/promotions_r14.py), driven
END-TO-END the way the grading driver would: each staged ``Query``'s
``fn(spark, SF_DIR)`` against its own ``oracle`` SQL through the
driver canonicalization + the arrow integer-dtype gate, plus a
second-SF drive (the r12-block convention) so the blocks are proven
at more than one data scale before any slot ever opens."""

from __future__ import annotations

import pytest

from test_oracle_parity import SF_DIR, _duck
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.plans.promotions_r14 import (
    R14_PROMOTIONS,
    promote,
)
from kafka_avro_order_processing_spark.plans.registry import QUERIES

EXPECTED = ("annotator_pair_kappa", "ab_peeking_trajectory")

SF_2 = "/root/testdata/sf0.01"


def test_queue_is_exactly_the_named_blocks():
    assert tuple(R14_PROMOTIONS) == EXPECTED


def test_staged_not_registered_and_no_collisions():
    clash = set(R14_PROMOTIONS) & set(QUERIES)
    assert not clash, f"staged names already registered: {sorted(clash)}"


def test_blocks_are_fully_formed():
    for name, q in R14_PROMOTIONS.items():
        assert q.name == name
        assert callable(q.fn)
        assert q.oracle and "SELECT" in q.oracle.upper(), name
        assert q.doc and q.tags, name


def test_promote_refuses_collisions(monkeypatch):
    name = EXPECTED[0]
    monkeypatch.setitem(QUERIES, name, R14_PROMOTIONS[name])
    with pytest.raises(ValueError, match=name):
        promote()


def test_promote_inserts_the_blocks(monkeypatch):
    before = dict(QUERIES)
    try:
        promote()
        for name, q in R14_PROMOTIONS.items():
            assert QUERIES[name] is q
    finally:
        QUERIES.clear()
        QUERIES.update(before)


@pytest.mark.parametrize("name", EXPECTED)
def test_block_oracle_parity(spark, name):
    """The driver's exact compare on each staged block at SF_DIR."""
    q = R14_PROMOTIONS[name]
    _assert_parity(q.fn(spark, SF_DIR), q.oracle)


@pytest.mark.slow
@pytest.mark.parametrize("name", EXPECTED)
def test_block_oracle_parity_second_sf(spark, name):
    """Same drive at sf0.01 — the scale the grading driver checks."""
    q = R14_PROMOTIONS[name]
    _assert_parity(q.fn(spark, SF_2), q.oracle, con=_duck(SF_2))
