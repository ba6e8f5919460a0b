from .pipelines import (
    stream_latest_per_key,
    stream_product_stats,
    run_to_memory_available_now,
)
from .state import migrate_v1_stream

__all__ = [
    "stream_latest_per_key",
    "stream_product_stats",
    "run_to_memory_available_now",
    "migrate_v1_stream",
]
