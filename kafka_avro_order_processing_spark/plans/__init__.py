from .registry import QUERIES, Query, get_queries, get_oracles  # noqa: F401
