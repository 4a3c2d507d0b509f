"""Retry with exponential backoff + jitter, and error classification.

Re-expresses the reference's RetryHandler
(/root/reference/src/retry/retry_handler.py:16-188) for the Spark
execution model (SURVEY.md §2.9 T6): Spark has no per-record retry
primitive, so the mapping is

- transient infra failures -> Spark task retries (spark.task.maxFailures),
- application-level failures -> this handler wrapped around a
  ``foreachBatch`` body (per micro-batch, not per record),
- the classification predicate -> a Column expression
  (functions.scalar.classify_error) usable inside the plan.

Envelope semantics preserved from the reference: max_retries attempts
after the first try; delay = initial * multiplier^attempt, capped, with
+-20% jitter floored at 0.1 s; RetryableError retries, PermanentError
raises immediately, exhausted retries wrap in PermanentError, unexpected
exceptions are classified by message pattern with permanent as default.
"""

from __future__ import annotations

import logging
import random
import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import Any

from ..functions.scalar import RETRYABLE_PATTERNS

logger = logging.getLogger(__name__)


class RetryableError(Exception):
    """Transient failure — worth retrying (retry_handler.py:16-18)."""


class PermanentError(Exception):
    """Non-transient failure — route to DLQ (retry_handler.py:21-23)."""


def classify_exception(exc: BaseException) -> str:
    """'retryable' | 'permanent' (retry_handler.py:152-188): explicit
    types win; otherwise match message patterns; default permanent."""
    if isinstance(exc, RetryableError):
        return "retryable"
    if isinstance(exc, PermanentError):
        return "permanent"
    msg = str(exc).lower()
    if any(p in msg for p in RETRYABLE_PATTERNS):
        return "retryable"
    return "permanent"


@dataclass
class RetryHandler:
    """Exponential-backoff retry (retry_handler.py:36-150).

    Consumer defaults mirror /root/reference/src/consumer/
    avro_order_consumer.py:72-77 (3 retries, 1 s, x2, cap 10 s).
    """

    max_retries: int = 3
    initial_delay: float = 1.0
    backoff_multiplier: float = 2.0
    max_delay: float = 10.0
    jitter: bool = True
    sleep: Callable[[float], None] = time.sleep  # injectable for tests

    def calculate_delay(self, attempt: int) -> float:
        """Delay before retry `attempt` (0-based), capped, +-20% jitter
        floored at 0.1 s (retry_handler.py:60-82)."""
        delay = min(self.initial_delay * (self.backoff_multiplier ** attempt), self.max_delay)
        if self.jitter:
            delay += delay * 0.2 * (2 * random.random() - 1)
        return max(delay, 0.1)

    def execute_with_retry(self, fn: Callable[..., Any], *args: Any, **kwargs: Any) -> Any:
        """Run fn; retry on retryable errors up to max_retries; wrap
        exhaustion in PermanentError (retry_handler.py:84-150)."""
        last_exc: BaseException | None = None
        for attempt in range(self.max_retries + 1):
            try:
                return fn(*args, **kwargs)
            except BaseException as exc:  # noqa: BLE001 — classify everything
                kind = classify_exception(exc)
                if kind == "permanent":
                    if isinstance(exc, PermanentError):
                        raise
                    raise PermanentError(str(exc)) from exc
                last_exc = exc
                if attempt < self.max_retries:
                    delay = self.calculate_delay(attempt)
                    logger.warning(
                        "retryable failure (attempt %d/%d), sleeping %.2fs: %s",
                        attempt + 1, self.max_retries + 1, delay, exc,
                    )
                    self.sleep(delay)
        raise PermanentError(
            f"Retries exhausted after {self.max_retries + 1} attempts: {last_exc}"
        ) from last_exc

    def wrap_foreach_batch(self, batch_fn: Callable[..., None]) -> Callable[..., None]:
        """Wrap a foreachBatch body so each micro-batch epoch gets the
        reference's retry envelope (the Spark-level analogue of the
        per-record loop at avro_order_consumer.py:181-185)."""

        def wrapped(df, epoch_id):  # noqa: ANN001 — Spark callback signature
            self.execute_with_retry(batch_fn, df, epoch_id)

        return wrapped
