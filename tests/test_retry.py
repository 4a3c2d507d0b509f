"""Retry-handler scenarios replicating the reference's smoke blocks
(/root/reference/src/retry/retry_handler.py:229-270; FIXTURES.md §4)."""

from __future__ import annotations

import pytest

from kafka_avro_order_processing_spark.streaming.retry import (
    PermanentError,
    RetryableError,
    RetryHandler,
    classify_exception,
)


def _handler(**kw):
    slept = []
    h = RetryHandler(max_retries=3, initial_delay=1.0, backoff_multiplier=2.0,
                     max_delay=10.0, jitter=False, sleep=slept.append, **kw)
    return h, slept


def test_transient_twice_then_success():
    h, slept = _handler()
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RetryableError("temporary glitch")
        return "ok"

    assert h.execute_with_retry(flaky) == "ok"
    assert calls["n"] == 3
    assert slept == [1.0, 2.0]  # exponential, no jitter


def test_permanent_fails_immediately():
    h, slept = _handler()
    calls = {"n": 0}

    def bad():
        calls["n"] += 1
        raise PermanentError("invalid data")

    with pytest.raises(PermanentError):
        h.execute_with_retry(bad)
    assert calls["n"] == 1 and slept == []


def test_immediate_success():
    h, slept = _handler()
    assert h.execute_with_retry(lambda: 42) == 42
    assert slept == []


def test_retries_exhausted_wraps_permanent():
    h, slept = _handler()
    calls = {"n": 0}

    def always_flaky():
        calls["n"] += 1
        raise RetryableError("network blip")

    with pytest.raises(PermanentError, match="Retries exhausted"):
        h.execute_with_retry(always_flaky)
    assert calls["n"] == 4  # initial + 3 retries
    assert slept == [1.0, 2.0, 4.0]


def test_delay_cap_and_jitter_floor():
    h = RetryHandler(initial_delay=1.0, backoff_multiplier=2.0, max_delay=10.0, jitter=False)
    assert h.calculate_delay(10) == 10.0  # capped
    hj = RetryHandler(initial_delay=0.01, jitter=True)
    assert hj.calculate_delay(0) >= 0.1  # jitter floor


def test_message_pattern_classification():
    assert classify_exception(ValueError("connection reset by peer")) == "retryable"
    assert classify_exception(ValueError("HTTP 504 gateway")) == "retryable"
    assert classify_exception(ValueError("schema mismatch")) == "permanent"
    assert classify_exception(RuntimeError("totally unexpected")) == "permanent"
