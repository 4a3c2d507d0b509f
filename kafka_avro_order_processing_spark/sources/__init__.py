from .tables import TABLES, load_table, register_views  # noqa: F401
from .generator import gen_orders, gen_orders_stream  # noqa: F401
