from .retry import PermanentError, RetryableError, RetryHandler  # noqa: F401
from .pipeline import (  # noqa: F401
    order_pipeline_batch,
    run_streaming_product_stats,
    stream_table,
)
