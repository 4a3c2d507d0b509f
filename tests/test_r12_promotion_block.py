"""The round-12 promotion block (plans/promotions_r12.py), driven
END-TO-END the way the grading driver would: the staged ``Query``'s
``fn(spark, SF_DIR)`` against its own ``oracle`` SQL string through
the driver's canonicalization + the arrow integer-dtype gate.

ROUND-12 STATE: the swap EXECUTED — registry.py imports and calls
``promote()`` before ``_apply_order()``.  During round 12 the blocks
sat at _LEAD_ORDER positions 49/50 and earned their first driver rows
(CORRECTNESS_r12: both green); the round-13 rotation then moved the
window on, so the position pin is now "registered and driver-checked",
not a window slot.  The battery pins the POST-swap invariants (blocks
live in QUERIES, double-promotion refused), mirroring
tests/test_r10_promotion_blocks.py.
"""

from __future__ import annotations

import json
from pathlib import Path

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
    the registry as the SAME Query object, and must have earned its
    r12 driver row (green) before the round-13 rotation moved the
    window past it — a block that never got a row would have rotated
    out unchecked."""
    for name, q in R12_PROMOTIONS.items():
        assert QUERIES.get(name) is q, name
    r12 = json.loads(
        (Path(__file__).resolve().parents[1] / "CORRECTNESS_r12.json")
        .read_text()
    )
    for name in EXPECTED:
        row = r12.get(name)
        assert row is not None, f"{name}: no r12 driver row"
        assert row.get("rows_match") and row.get("hash_match"), (name, row)


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
