from .tables import TABLE_NAMES, load_table, load_tables, register_views
from .ktable import latest_per_key

__all__ = [
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
    "latest_per_key",
]
