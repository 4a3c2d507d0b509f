"""Property-based tests (hypothesis) for the pure-Python sketch cores
— the driver-side algorithms whose guarantees everything distributed
rests on: the Misra–Gries mergeable reduction, the KLL compactor, and
the largest-remainder apportionment inside neyman_allocation.  These
run WITHOUT Spark, so hundreds of adversarial examples are cheap."""

from __future__ import annotations

import math
from collections import Counter

from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_avro_order_processing_spark.operators.heavy import _mg_reduce
from kafka_avro_order_processing_spark.operators.kll import _KLL

# ---------------------------------------------------------------------------
# Misra–Gries reduction
# ---------------------------------------------------------------------------

counters_st = st.dictionaries(
    st.integers(0, 50), st.integers(1, 10_000), min_size=0, max_size=40
)


@given(counters_st, st.integers(1, 12))
@settings(max_examples=300, deadline=None)
def test_mg_reduce_invariants(counters, k):
    out = _mg_reduce(dict(counters), k)
    # size bound
    assert len(out) <= max(len(counters), 0) and len(out) <= max(
        k, len([c for c in counters.values() if c > 0])
    )
    if len(counters) <= k:
        assert out == counters
        return
    assert len(out) <= k
    sub = sorted(counters.values(), reverse=True)[k]
    for key, c in out.items():
        # every survivor lost EXACTLY the (k+1)-th largest count
        assert c == counters[key] - sub and c > 0
    # the per-key error bound: nobody lost more than sub, and the
    # dropped keys had counts <= sub
    for key, c in counters.items():
        if key not in out:
            assert c <= sub


@given(
    st.lists(st.integers(0, 30), min_size=0, max_size=2000),
    st.integers(1, 10),
    st.integers(1, 6),
)
@settings(max_examples=120, deadline=None)
def test_mg_stream_fold_error_bound(stream, k, n_chunks):
    """Folding a stream through batched value_counts + reduce keeps the
    classic MG bound: true_count - mg_count <= n/(k+1) for EVERY key —
    the exact property the two-pass heavy hitter relies on."""
    counters: dict = {}
    n = len(stream)
    chunk = max(1, math.ceil(n / n_chunks))
    for i in range(0, n, chunk):
        for key, c in Counter(stream[i : i + chunk]).items():
            counters[key] = counters.get(key, 0) + c
        counters = _mg_reduce(counters, k)
    true = Counter(stream)
    for key, tc in true.items():
        mg = counters.get(key, 0)
        assert 0 <= tc - mg <= n / (k + 1) + 1e-9, (key, tc, mg, n, k)
    # no-false-negative corollary: freq > n/(k+1) => survives
    for key, tc in true.items():
        if tc * (k + 1) > n:
            assert key in counters, (key, tc, n, k)


# ---------------------------------------------------------------------------
# KLL compactor
# ---------------------------------------------------------------------------


@given(
    st.lists(
        st.floats(
            allow_nan=False, allow_infinity=False, width=32
        ),
        min_size=0,
        max_size=3000,
    ),
    st.integers(8, 64),
    st.integers(1, 5),
)
@settings(max_examples=80, deadline=None)
def test_kll_weight_conservation_and_size(values, k, n_batches):
    sk = _KLL(k)
    n = len(values)
    chunk = max(1, math.ceil(n / n_batches))
    for i in range(0, n, chunk):
        sk.add_batch(values[i : i + chunk])
    rows = list(sk.rows())
    assert sum(2 ** lv for lv, _ in rows) == n
    per_level = Counter(lv for lv, _ in rows)
    assert all(c <= k for c in per_level.values()), per_level
    if n:
        assert max(per_level) <= math.ceil(math.log2(max(n / k, 1)) + 2)
    # every retained value is one of the inputs
    vals = set(values)
    assert all(v in vals for _, v in rows)


@given(
    st.lists(st.integers(0, 10_000), min_size=50, max_size=3000),
    st.integers(16, 128),
)
@settings(max_examples=60, deadline=None)
def test_kll_rank_error_within_mrl_budget(values, k):
    """Empirical rank error of the median against the deterministic
    MRL budget n*log2(n/k)/k (+1 slack for discreteness)."""
    sk = _KLL(k)
    sk.add_batch(values)
    rows = sorted(sk.rows(), key=lambda t: (t[1], t[0]))
    n = len(values)
    target = math.ceil(0.5 * n)
    cum = 0
    est = rows[-1][1]
    for lv, v in rows:
        cum += 2**lv
        if cum >= target:
            est = v
            break
    svals = sorted(values)
    import bisect

    lo = bisect.bisect_left(svals, est)
    hi = bisect.bisect_right(svals, est)
    budget = n * math.log2(max(n / k, 2)) / k + 1
    # est occupies the rank interval [lo, hi] (duplicates widen it);
    # the error is the distance from the target to that interval.
    err = 0 if lo <= target <= hi else min(
        abs(lo - target), abs(hi - target)
    )
    assert err <= budget, (err, budget, n, k)


# ---------------------------------------------------------------------------
# Largest-remainder apportionment (the Neyman rounding)
# ---------------------------------------------------------------------------

from test_sampling import _neyman_replica  # noqa: E402


@given(
    st.lists(
        st.tuples(
            st.integers(1, 500),          # N_h
            st.integers(0, 10_000),       # sum of quantized values
            st.integers(0, 10_000_000),   # sum of squares (clamped below)
        ),
        min_size=1,
        max_size=12,
    ),
    st.integers(1, 300),
)
@settings(max_examples=200, deadline=None)
def test_largest_remainder_apportionment(raw, n_total):
    moments = []
    for i, (n_h, s1, s2) in enumerate(raw):
        # Cauchy-Schwarz-consistent moments: n*s2 >= s1^2
        s2 = max(s2, (s1 * s1 + n_h - 1) // n_h)
        moments.append((f"g{i}", n_h, s1, s2))
    alloc = _neyman_replica(moments, n_total)
    total_pop = sum(n_h for _, n_h, _, _ in moments)
    got = sum(kh for _, _, kh in alloc)
    # budget preserved unless capped by the population
    assert got == min(n_total, total_pop) or (
        got <= n_total and all(kh == n_h for (_, n_h, kh) in alloc)
    )
    assert all(0 <= kh <= n_h for _, n_h, kh in alloc)
