from .aggregate import product_price_stats, overall_stats, stats_snapshot, error_stats  # noqa: F401
from .validate import split_valid_invalid, dlq_envelope  # noqa: F401
from .windows import running_average, tumbling_window_stats, sessionize  # noqa: F401
from .ranking import top_k_per_group, order_by_count_desc  # noqa: F401
from .graph import (  # noqa: F401
    connected_components,
    connected_components_star,
    label_propagation,
    modularity,
    pagerank,
    pagerank_weighted,
    triangle_counts,
)
from .sketch import (  # noqa: F401
    cms_build,
    cms_estimate,
    histogram_build,
    histogram_quantiles,
    hll_estimate,
    hll_registers,
)
