"""Deterministic, engine-portable hashing helpers.

Correctness-gated operators hash with ``md5`` because its hex output is
bit-identical across Spark, DuckDB and Python ``hashlib`` — the DuckDB
oracle can reproduce every signature. The lexicographic minimum of
``md5(seed || ':' || shingle)`` over a document's shingles is a valid
MinHash draw (the hex string is a uniform permutation of shingle space).

For a pure-throughput deployment, swap ``md5_minhash`` for
``xxhash64``-based signatures (``F.xxhash64``) — same plan shape, ~3×
cheaper hash — at the cost of oracle portability.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_minhash(shingle: Column, seed: int) -> Column:
    """Portable MinHash component: md5 hex of a seeded shingle."""
    return F.md5(F.concat(F.lit(f"{seed}:"), shingle))


def hex_sign(key: str) -> int:
    """Deterministic ±1 from the md5 high nibble of ``key``.

    Computed driver-side with hashlib (identical to SQL ``md5``), used to
    build random-hyperplane sign vectors shared by Spark plan and oracle.
    """
    import hashlib

    return 1 if hashlib.md5(key.encode()).hexdigest()[0] >= "8" else -1
