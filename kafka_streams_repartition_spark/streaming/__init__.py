from .pipelines import (
    read_state_store,
    run_foreach_batch_available_now,
    run_to_memory_available_now,
    stream_dedup_exact,
    stream_event_transitions,
    stream_cms_registers,
    stream_hll_registers,
    stream_interval_join,
    stream_latest_per_key,
    stream_pickup_orders,
    stream_product_stats,
    stream_session_counts,
    stream_windowed_counts,
)
from .state import migrate_v1_stream

__all__ = [
    "read_state_store",
    "run_foreach_batch_available_now",
    "run_to_memory_available_now",
    "stream_dedup_exact",
    "stream_event_transitions",
    "stream_cms_registers",
    "stream_hll_registers",
    "stream_interval_join",
    "stream_latest_per_key",
    "stream_pickup_orders",
    "stream_product_stats",
    "stream_session_counts",
    "stream_windowed_counts",
    "migrate_v1_stream",
]
