"""Scalar expression helpers (SURVEY.md §2.8 F1-F14).

Everything here is a *Column expression* — JVM-side, whole-stage
codegen'd, zero Python in the hot path.  Two cross-cutting concerns:

1. **Determinism across engines.**  Aggregate money columns are summed
   as DECIMAL(18,2) (exact, order-independent) and only cast to double
   at the output edge, so a Spark plan with any shuffle/partition order
   hash-matches a DuckDB oracle bit-for-bit.  Floating sums over
   shuffled partitions would differ in the last ULP.

2. **Portability.**  Hash-based operators (minhash/simhash/fingerprint)
   use md5 — identical bytes in Spark, DuckDB, and Python — rather than
   engine-private hashes (Spark's xxhash64/hash seed differently than
   DuckDB's hash()).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Reference error-classification fallback patterns
# (/root/reference/src/retry/retry_handler.py:169-186): a message
# containing any of these substrings (case-insensitive) is retryable;
# everything else is permanent.
RETRYABLE_PATTERNS = (
    "timeout",
    "connection",
    "unavailable",
    "temporary",
    "network",
    "socket",
    "503",
    "504",
    "429",
)
RETRYABLE_PATTERN = "|".join(RETRYABLE_PATTERNS)


def dec_sum(col: Column | str, scale: int = 2) -> Column:
    """Exact, order-independent sum of a 2-dp money column -> double.

    DECIMAL addition is associative/commutative, so the result is
    independent of partitioning and shuffle order — required for
    hash-stable results at any cluster size.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal(18,{scale})")).cast("double")


def safe_div(num: Column, den: Column, default: float = 0.0) -> Column:
    """num/den with divide-by-zero -> default (reference returns 0.0 for
    empty aggregates, /root/reference/src/aggregator/price_aggregator.py:66-73)."""
    return F.when(den != 0, num / den).otherwise(F.lit(default))


def classify_error(message: Column | str) -> Column:
    """Error classification (T8): 'retryable' | 'permanent'.

    Re-expresses /root/reference/src/retry/retry_handler.py:169-186 as a
    single codegen'd CASE WHEN + rlike over the lowered message.
    """
    c = F.col(message) if isinstance(message, str) else message
    return F.when(
        F.lower(c).rlike(RETRYABLE_PATTERN), F.lit("retryable")
    ).otherwise(F.lit("permanent"))


def format_order_id(seq: Column | str) -> Column:
    """`ORD-%04d` id formatting (F5,
    /root/reference/src/producer/kafka_order_producer.py:102)."""
    c = F.col(seq) if isinstance(seq, str) else seq
    return F.format_string("ORD-%04d", c.cast("int"))


def simulated_failure_flag(col: Column | str, rate: float = 0.05, salt: str = "fail") -> Column:
    """Deterministic stand-in for the reference's injected 5% transient
    failure (`random.random() < 0.05`,
    /root/reference/src/consumer/avro_order_consumer.py:106-108): a row
    is flagged when its id hashes below the rate threshold.  Hash-based
    rather than rand() so tests and retries see the SAME rows fail."""
    c = F.col(col) if isinstance(col, str) else col
    bucket = F.conv(F.substring(F.md5(F.concat(F.lit(salt + ":"), c.cast("string"))), 1, 8), 16, 10)
    return bucket.cast("double") / F.lit(float(16 ** 8)) < F.lit(rate)


def md5_hash_hex(col: Column, salt: str = "") -> Column:
    """Portable deterministic hash: md5 hex digest of (salt || value).

    Fixed-width lowercase hex compares lexicographically exactly like
    the underlying 128-bit integer, so MIN() over these strings is a
    valid minhash in both Spark and ANSI-SQL oracles.
    """
    base = F.concat(F.lit(salt), col) if salt else col
    return F.md5(base.cast("string"))
