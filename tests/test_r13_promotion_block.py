"""The round-13+ promotion queue (plans/promotions_r13.py), driven
END-TO-END the way the grading driver would: each staged ``Query``'s
``fn(spark, SF_DIR)`` against its own ``oracle`` SQL through the
driver canonicalization + the arrow integer-dtype gate.  The registry
saturates at 150 after the r12 swap, so these promote only behind an
audited retirement — but with this battery green there is nothing
left to prove when a slot opens."""

from __future__ import annotations

import pytest

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.plans.promotions_r13 import (
    R13_PROMOTIONS,
    promote,
)
from kafka_avro_order_processing_spark.plans.registry import QUERIES

EXPECTED = (
    "heavy_hitters_event_type",
    "kmv_distinct_users",
    "priority_sample_events",
    "scd2_user_tiers",
)


def test_queue_is_exactly_the_named_blocks():
    assert tuple(R13_PROMOTIONS) == EXPECTED


def test_staged_not_registered_and_no_collisions():
    clash = set(R13_PROMOTIONS) & set(QUERIES)
    assert not clash, f"staged names already registered: {sorted(clash)}"


def test_blocks_are_fully_formed():
    for name, q in R13_PROMOTIONS.items():
        assert q.name == name
        assert callable(q.fn)
        assert q.oracle and "SELECT" in q.oracle.upper(), name
        assert q.doc and q.tags, name


def test_promote_refuses_collisions(monkeypatch):
    name = EXPECTED[0]
    monkeypatch.setitem(QUERIES, name, R13_PROMOTIONS[name])
    with pytest.raises(ValueError, match=name):
        promote()


def test_promote_inserts_the_blocks(monkeypatch):
    before = dict(QUERIES)
    try:
        promote()
        for name, q in R13_PROMOTIONS.items():
            assert QUERIES[name] is q
    finally:
        QUERIES.clear()
        QUERIES.update(before)


@pytest.mark.parametrize("name", EXPECTED)
def test_block_oracle_parity(spark, name):
    """The driver's exact compare on each staged block at SF_DIR."""
    q = R13_PROMOTIONS[name]
    _assert_parity(q.fn(spark, SF_DIR), q.oracle)
