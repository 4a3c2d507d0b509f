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


def test_staged_not_registered_and_no_collisions():
    """Round 9 has zero window headroom: the blocks must NOT be live,
    and their future names must be free in the registry."""
    clash = set(R10_PROMOTIONS) & set(QUERIES)
    assert not clash, f"staged names already registered: {sorted(clash)}"


def test_every_block_is_fully_formed():
    for name, q in R10_PROMOTIONS.items():
        assert q.name == name
        assert callable(q.fn)
        assert q.oracle and "SELECT" in q.oracle.upper(), name
        assert q.doc and q.tags, name


def test_promote_refuses_collisions(monkeypatch):
    """promote() must fail loudly if a name got registered in the
    meantime (the r10 mechanic's first safety net)."""
    name = EXPECTED[0]
    monkeypatch.setitem(QUERIES, name, R10_PROMOTIONS[name])
    with pytest.raises(ValueError, match=name):
        promote()


def test_promote_inserts_all_blocks(monkeypatch):
    before = dict(QUERIES)
    try:
        promote()
        for name, q in R10_PROMOTIONS.items():
            assert QUERIES[name] is q
    finally:
        QUERIES.clear()
        QUERIES.update(before)


@pytest.mark.parametrize("name", EXPECTED)
def test_block_oracle_parity(spark, name):
    """The driver's exact compare on each staged block at SF_DIR."""
    q = R10_PROMOTIONS[name]
    _assert_parity(q.fn(spark, SF_DIR), q.oracle)
