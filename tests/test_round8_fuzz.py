"""Hypothesis fuzz for the round-8 operators: winnowing selection vs
the Python replica over tie-dense tiny alphabets, and the unigram
Viterbi vs EXHAUSTIVE segmentation enumeration under the pinned tie
order.
"""

from __future__ import annotations

import pytest

import math

from hypothesis import given, settings, strategies as st

from kafka_avro_order_processing_spark.operators.unigram import (
    UNK_LOGPROB,
    _viterbi,
)
from test_winnowing import _collect, _py_winnow

# tiny alphabet + short tokens => hash ties and repeated grams
TEXTS = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30),
    min_size=1,
    max_size=6,
)


# durations-driven slow set (r12): pure fuzz re-check sweep —
# the fast gate keeps the exact-law and oracle primaries
pytestmark = pytest.mark.slow


@settings(max_examples=20, deadline=None)
@given(TEXTS)
def test_fuzz_winnowing_matches_replica(spark, texts):
    docs = [(i, t) for i, t in enumerate(texts)]
    assert _collect(spark, docs, k=2, w=3) == _py_winnow(docs, k=2, w=3)


def _enumerate_best(word, scores, max_len):
    """Exhaustive best segmentation under the SAME pinned tie order:
    max total score, then fewest pieces, then the later split at each
    position from the right (mirrors the DP's backpointer
    preference)."""
    best = None

    def rec(i, acc, total):
        nonlocal best
        if i == len(word):
            # key: higher score; fewer pieces; later split points
            # (the DP prefers larger j at each cell, scanning from the
            # end — encode as the tuple of start positions, larger
            # preferred)
            starts = []
            p = 0
            for piece in acc:
                starts.append(p)
                p += len(piece)
            key = (total, -len(acc), tuple(starts[::-1]))
            cand = (key, list(acc))
            if best is None or cand[0] > best[0]:
                best = cand
            return
        for j in range(i + 1, min(len(word), i + max_len) + 1):
            piece = word[i:j]
            s = scores.get(piece)
            if s is None:
                if j - i == 1:
                    s = UNK_LOGPROB
                else:
                    continue
            acc.append(piece)
            rec(j, acc, total + s)
            acc.pop()

    rec(0, [], 0.0)
    return best[1]


@settings(max_examples=200, deadline=None)
@given(
    st.text(alphabet="abc", min_size=1, max_size=7),
    st.dictionaries(
        st.text(alphabet="abc", min_size=1, max_size=3),
        st.sampled_from([-0.5, -1.0, -1.5, -2.0, -2.5]),
        max_size=12,
    ),
)
def test_fuzz_viterbi_equals_exhaustive(word, vocab):
    # single chars of the word always present (coverage), like training
    scores = {c: -2.0 for c in set(word)}
    scores.update(vocab)
    got = _viterbi(word, scores, 3)
    want = _enumerate_best(word, scores, 3)

    def total(seg):
        return sum(scores.get(p, UNK_LOGPROB) for p in seg)

    assert "".join(got) == word
    # the DP must achieve the optimum; where keys tie exactly, the
    # pinned order must agree with the enumerated preference
    assert math.isclose(total(got), total(want), rel_tol=0, abs_tol=0) or (
        total(got) > total(want)
    ), (word, got, want)
    if total(got) == total(want) and len(got) == len(want):
        assert got == want, (word, got, want)
