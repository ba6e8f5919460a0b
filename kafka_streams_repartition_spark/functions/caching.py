"""Session-lifetime memoization of persisted DataFrames.

Several operators memoize one ``.cache()``d derived frame per input
frame in a ``weakref.WeakKeyDictionary`` (one grams frame per documents
frame, one trained-classifier scored frame per documents frame) so
re-entrant queries never recompute or leak a copy per invocation.

The eviction discipline: a WeakKeyDictionary drops its ENTRY when the
key frame is garbage-collected, but the persisted blocks would stay
pinned in executor storage for the rest of the session — many distinct
input frames (test suites, multi-sf sessions) would accumulate storage
pressure on a default-heap driver.  :func:`memo_cached` therefore
attaches a ``weakref.finalize`` callback to the key that unpersists the
cached frame the moment the key is collected, so executor storage
follows the cache entry's lifetime exactly.
"""

from __future__ import annotations

import weakref
from collections.abc import Callable

from pyspark.sql import DataFrame


def _unpersist_quietly(df: DataFrame) -> None:
    # blocking=False: eviction must never stall a GC pause; a stopped
    # session raises here, and its blocks are already gone with the JVM
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass


def memo_cached(
    cache: weakref.WeakKeyDictionary[DataFrame, DataFrame],
    key: DataFrame,
    build: Callable[[], DataFrame],
) -> DataFrame:
    """Return ``cache[key]``, building + ``.cache()``-ing it on first
    use and registering an unpersist finalizer on the key so the
    persisted blocks are released when the key frame is collected."""
    got = cache.get(key)
    if got is None:
        got = build().cache()
        cache[key] = got
        weakref.finalize(key, _unpersist_quietly, got)
    return got
