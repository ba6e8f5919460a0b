from .checks import (
    explain_str,
    assert_broadcast_join,
    assert_no_cartesian,
    assert_pushed_filters,
    assert_read_schema_pruned,
    count_exchanges,
    count_key_exchanges,
    count_scans,
    count_scans_of,
)

__all__ = [
    "explain_str",
    "assert_broadcast_join",
    "assert_no_cartesian",
    "assert_pushed_filters",
    "assert_read_schema_pruned",
    "count_exchanges",
    "count_key_exchanges",
    "count_scans",
    "count_scans_of",
]
