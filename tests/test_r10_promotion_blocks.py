"""The round-10 promotion blocks (plans/promotions_r10.py), driven
END-TO-END the way the grading driver would: each staged ``Query``'s
``fn(spark, SF_DIR)`` against its own ``oracle`` SQL string through
the driver's canonicalization + the arrow integer-dtype gate — so the
round-10 swap is promote() + five _LEAD_ORDER fill names, with
nothing left to prove.
"""

from __future__ import annotations

import pytest

from test_oracle_parity import SF_DIR
from test_r10_promotion_parity import _assert_parity

from kafka_avro_order_processing_spark.plans.promotions_r10 import (
    R10_PROMOTIONS,
    promote,
)
from kafka_avro_order_processing_spark.plans.registry import QUERIES

EXPECTED = (
    "roc_auc",
    "winnow_fingerprints",
    "mean_retrieval_metrics",
    "profile_table_exact",
    "duplicated_ngram_spans",
)


def test_queue_is_exactly_the_five_named_blocks():
    assert tuple(R10_PROMOTIONS) == EXPECTED


def test_promotion_executed_blocks_are_live():
    """Round 10 executed the swap: every staged block IS registered,
    by identity, and earned its r10 driver check (the window has since
    ROTATED — r11 leads with the 50 r8-aged names per the rotation
    invariant — so window membership is a historical fact checked
    against CORRECTNESS_r10, not the live ordering)."""
    import json
    from pathlib import Path

    checked = json.loads(
        (Path(__file__).resolve().parents[1] / "CORRECTNESS_r10.json")
        .read_text()
    )
    for name, q in R10_PROMOTIONS.items():
        assert QUERIES.get(name) is q, name
        assert name in checked, name
        rec = checked[name]
        assert rec.get("hash_match") or (
            rec.get("rows_match") and rec.get("err") is None
        ), (name, rec)


def test_every_block_is_fully_formed():
    for name, q in R10_PROMOTIONS.items():
        assert q.name == name
        assert callable(q.fn)
        assert q.oracle and "SELECT" in q.oracle.upper(), name
        assert q.doc and q.tags, name


def test_promote_refuses_double_registration():
    """promote() already ran at registry import; a second call must
    fail loudly on every name (the collision safety net)."""
    with pytest.raises(ValueError, match=EXPECTED[0]):
        promote()


@pytest.mark.parametrize("name", EXPECTED)
def test_block_oracle_parity(spark, name):
    """The driver's exact compare on each staged block at SF_DIR."""
    q = R10_PROMOTIONS[name]
    _assert_parity(q.fn(spark, SF_DIR), q.oracle)
