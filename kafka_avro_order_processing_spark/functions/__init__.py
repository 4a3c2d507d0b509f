from .scalar import (  # noqa: F401
    dec_sum,
    safe_div,
    classify_error,
    format_order_id,
    md5_hash_hex,
    RETRYABLE_PATTERN,
)
