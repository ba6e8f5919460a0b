"""Session-lifetime memoization of persisted DataFrames.

Several operators memoize one ``.cache()``d derived frame per input
frame (one grams frame per documents frame, one trained-classifier
scored frame per documents frame) so re-entrant queries never recompute
or leak a copy per invocation.

Eviction discipline (round-9 advisor finding): the earlier
``WeakKeyDictionary`` dropped its ENTRY when the key frame was
garbage-collected but left the persisted blocks pinned for the rest of
the session — many distinct input frames (test suites, multi-sf
sessions) accumulated storage pressure on a default-heap driver.  A
finalizer that unpersists on key COLLECTION is not the fix either: a
consumer's derived plan can outlive the key object (``pretrain_pipeline``
builds its grams over a transient gated frame and returns a plan that
still references the cached relation — unpersisting at key GC forced
the downstream plan to re-derive, doubling its scans).

:class:`MemoSlots` therefore bounds storage the other way round: a
small fixed-capacity LRU whose RESIDENT keys are strongly referenced
(an entry can never vanish while it is current, so downstream plans
keep their ``InMemoryRelation``), and whose EVICTED frames are
unpersisted at replacement time — total persisted storage per cache is
≤ capacity copies, regardless of how many distinct input frames a
session touches.
"""

from __future__ import annotations

import logging
from collections import OrderedDict
from collections.abc import Callable

from pyspark.sql import DataFrame

_log = logging.getLogger(__name__)

# release failures are logged ONCE per process (the release runs per CC
# round in a loop — a broken private surface would otherwise spam), but
# counted unconditionally so tests can assert the failure is visible
_release_failures = 0

# process-lifetime shared-frame memo traffic (every MemoSlots instance
# bumps these): bench.py records per-query DELTAS so a committed bench
# artifact shows which queries rode a warm shared frame and which paid
# the build — the mechanism behind order-dependent suite timings
# (BENCHNOTES.md), now measured instead of inferred
_memo_hits = 0
_memo_misses = 0


def memo_counters() -> tuple[int, int]:
    """(hits, misses) across every :class:`MemoSlots` in the process."""
    return (_memo_hits, _memo_misses)


def count_memo(hit: bool) -> None:
    """Manual bump for the bespoke identity-keyed memos that don't go
    through :class:`MemoSlots` (``_KCENTER_MEMO``/``_MMR_MEMO``/
    ``_NVEC_MEMO``) so :func:`memo_counters` sees ALL shared-frame
    traffic."""
    global _memo_hits, _memo_misses
    if hit:
        _memo_hits += 1
    else:
        _memo_misses += 1


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the executor blocks of a frame returned by
    ``localCheckpoint()`` — deterministic storage release for loop
    frames a later round has superseded, instead of waiting on driver
    GC (the iterative CC kernel's round ladder peaked one retained
    frame PER ROUND at the 100× decade probe, the margin that OOMed
    one r10 probe execution at the 8 GiB bench heap).

    The frame must NEVER be evaluated again: a local checkpoint
    replaces lineage with the stored blocks, so releasing them makes
    recompute impossible (Spark raises
    ``CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND``).  Only call on frames whose
    every consumer has already materialized.

    Internal-API note: the handle walks
    ``queryExecution().analyzed().rdd()`` — the ``LogicalRDD`` a
    checkpoint returns — because the public surface has no release
    verb for checkpoints (``DataFrame.unpersist`` only touches
    ``cache()`` relations).  Failure is swallowed for the CALLER (an
    unreleased frame is a GC-eventual leak, never a correctness
    problem) but never silent: a Spark upgrade that changes the
    analyzed-plan shape would otherwise turn the measured OOM fix back
    into a per-round leak with no signal anywhere (r10 advisor
    finding), so the first failure logs at debug and every failure
    bumps ``_release_failures`` — and
    ``tests/test_scale_utils.py::test_release_local_checkpoint_drops_blocks``
    pins against the JVM's actual storage status that the release
    still drops the checkpointed blocks on this Spark version.
    """
    global _release_failures
    try:
        df._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        if _release_failures == 0:
            _log.debug(
                "release_local_checkpoint: private-surface walk failed; "
                "checkpoint blocks will only release at driver GC",
                exc_info=True,
            )
        _release_failures += 1


def _unpersist_quietly(df: DataFrame) -> None:
    # blocking=False: eviction must never stall the caller; a stopped
    # session raises here, and its blocks are already gone with the JVM
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass


class MemoSlots:
    """Capacity-bounded identity-keyed memo of persisted frames.

    ``get_or_build(key, build)`` returns the cached frame for ``key``
    (identity semantics — DataFrames hash by id), building and
    ``.cache()``-ing it on first use; the least-recently-used entry is
    unpersisted and dropped when capacity is exceeded.
    """

    def __init__(self, capacity: int = 2) -> None:
        self._capacity = capacity
        # key: (id(frame), *shaping-constant parts)
        self._slots: OrderedDict[tuple, tuple[DataFrame, DataFrame]] = (
            OrderedDict()
        )

    def get_or_build(
        self,
        key: DataFrame,
        build: Callable[[], DataFrame],
        parts: tuple = (),
    ) -> DataFrame:
        """``parts``: optional plan-shaping constants (gram order,
        band counts, caps) folded into the slot key next to the frame
        identity, so a runtime override of a shaping constant can
        never serve a frame built under the old value (the
        ``_bf_truth`` key discipline, available to every MemoSlots
        user)."""
        global _memo_hits, _memo_misses
        k = (id(key), *parts)
        hit = self._slots.get(k)
        if hit is not None:
            _memo_hits += 1
            self._slots.move_to_end(k)
            return hit[1]
        _memo_misses += 1
        val = build().cache()
        # the stored key reference keeps `key` alive while resident, so
        # its id cannot be reused by a different frame
        self._slots[k] = (key, val)
        while len(self._slots) > self._capacity:
            _, (_, old) = self._slots.popitem(last=False)
            _unpersist_quietly(old)
        return val

    def __len__(self) -> int:
        return len(self._slots)
