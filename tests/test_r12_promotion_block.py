"""The round-12 promotion block (plans/promotions_r12.py), driven
END-TO-END the way the grading driver would: the staged ``Query``'s
``fn(spark, SF_DIR)`` against its own ``oracle`` SQL string through
the driver's canonicalization + the arrow integer-dtype gate.

ROUND-12 STATE: the swap EXECUTED — registry.py imports and calls
``promote()`` before ``_apply_order()``, and rrf_fuse/window_funnel
sit at _LEAD_ORDER positions 49/50.  The battery therefore pins the
POST-swap invariants (blocks live in QUERIES, double-promotion
refused), mirroring tests/test_r10_promotion_blocks.py.
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


def test_promoted_blocks_are_live():
    """Round 12 executed the swap: every staged block must be live in
    the registry as the SAME Query object, at window positions 49/50."""
    names = list(QUERIES)
    for name, q in R12_PROMOTIONS.items():
        assert QUERIES.get(name) is q, name
    assert names[48:50] == list(EXPECTED)


def test_block_is_fully_formed():
    for name, q in R12_PROMOTIONS.items():
        assert q.name == name
        assert callable(q.fn)
        assert q.oracle and "SELECT" in q.oracle.upper(), name
        assert q.doc and q.tags, name


def test_promote_refuses_double_registration():
    """promote() already ran at registry import; a second call must
    refuse the collision loudly rather than silently re-insert."""
    with pytest.raises(ValueError, match=EXPECTED[0]):
        promote()


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
