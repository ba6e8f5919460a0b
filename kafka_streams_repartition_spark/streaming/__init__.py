from .pipelines import (
    read_state_store,
    run_to_memory_available_now,
    stream_latest_per_key,
    stream_pickup_orders,
    stream_product_stats,
)
from .state import migrate_v1_stream

__all__ = [
    "read_state_store",
    "run_to_memory_available_now",
    "stream_latest_per_key",
    "stream_pickup_orders",
    "stream_product_stats",
    "migrate_v1_stream",
]
