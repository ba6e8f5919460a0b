"""Distinct-count sketching as pure relational algebra.

``hll_distinct_users`` is a HyperLogLog (Flajolet et al. 2007) built
entirely from portable column expressions — md5 as the hash, one hex
digit as the register index (b=4, m=16), the leading-zero rank from
``length(bin(...))`` — so the DuckDB oracle reproduces the registers
AND the estimate bit-for-bit. Spark ships a DataSketches-based
``hll_sketch_agg``, but its binary sketches cannot be replayed by
another engine; this formulation keeps the cross-engine correctness
gate that every other operator in this repo has, while demonstrating
the same scale story.

Scale story (the reason sketches exist at 100 TB): the raw event
stream collapses map-side into at most ``m`` rows per group — the
groupBy(group, bucket).max partial-aggregates before the exchange, so
the shuffle carries registers, not users. An exact countDistinct
shuffles every distinct user id; the sketch shuffles ≤16 longs per
group no matter how many billions of users pass through. Registers
also merge associatively (max), which is what makes the sketch
streamable and re-aggregatable across partitions/days.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

HLL_B = 4  # register-index bits (1 hex digit)
HLL_M = 16  # 2**HLL_B registers
HLL_ALPHA = 0.673  # alpha_16 from the HLL paper
_W_BITS = 60  # rank field: 15 hex digits, keeps the long positive


def _hll_parts(ev: DataFrame, *dims: str) -> DataFrame:
    """(dims..., bucket, v60): hash-derived register index + rank field."""
    h = F.md5(F.col("user_id").cast("string"))
    return ev.select(
        *dims,
        F.conv(F.substring(h, 1, 1), 16, 10).cast("long").alias("bucket"),
        F.conv(F.substring(h, 2, _W_BITS // 4), 16, 10).cast("long").alias("v60"),
    )


def _rho() -> F.Column:
    return F.when(F.col("v60") == 0, _W_BITS + 1).otherwise(
        _W_BITS + 1 - F.length(F.bin("v60"))
    )


def _hll_estimate(regs: DataFrame, *dims: str) -> DataFrame:
    """(dims..., hll_estimate) from a (dims..., bucket, m_j) register
    table: exact-decimal harmonic sum + linear-counting correction."""
    agg = regs.groupBy(*dims).agg(
        F.sum(
            F.expr(f"cast(pow(2.0, {_W_BITS + 1} - m_j) as decimal(24,0))")
        ).alias("s_present"),
        F.count(F.lit(1)).alias("n_regs"),
    )
    est = agg.select(
        *dims,
        (
            F.col("s_present")
            + (HLL_M - F.col("n_regs"))
            * F.expr(f"cast(pow(2.0, {_W_BITS + 1}) as decimal(24,0))")
        )
        .cast("double")
        .alias("s"),
        (HLL_M - F.col("n_regs")).alias("v"),
    )
    e_raw = (
        F.lit(HLL_ALPHA)
        * (HLL_M * HLL_M)
        * F.pow(F.lit(2.0), _W_BITS + 1)
        / F.col("s")
    )
    corrected = F.when(
        (e_raw <= 2.5 * HLL_M) & (F.col("v") > 0),
        F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v")),
    ).otherwise(e_raw)
    return est.select(*dims, F.round(corrected, 4).alias("hll_estimate"))


def hll_distinct_users(t: dict[str, DataFrame]) -> DataFrame:
    """Per-event-type distinct-user estimate: 16-register HLL with the
    small-range (linear counting) correction, next to the exact count
    so the oracle (and the reader) can see the sketch error.

    Duplicates need no pre-distinct: ``max(rho)`` is idempotent, so the
    register build is a single scan + one tiny keyed shuffle
    ((type, bucket) ≤ 16 rows per type, pre-combined map-side).
    """
    ev = t["events"]
    # Z = sum(2^-M_j) inside _hll_estimate is computed exactly: scaled
    # by 2^61 so every term is an integer (DECIMAL), making the sum
    # order-independent — a plain double sum would round differently
    # under Spark's shuffle order than under the oracle's sequential
    # scan.
    regs = _hll_parts(ev, "event_type").groupBy("event_type", "bucket").agg(
        F.max(_rho()).alias("m_j")
    )
    exact = ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        _hll_estimate(regs, "event_type")
        .join(exact, "event_type")
        .select("event_type", "n_exact", "hll_estimate")
    )


def hll_union_daily(t: dict[str, DataFrame]) -> DataFrame:
    """The property that makes sketches a storage format, not just a
    query trick: registers merge associatively (``max``), so per-day
    sketches persisted once can answer any-range distinct questions
    without re-touching raw events. Here: build a register set per
    DAY, then merge all daily sketches into one global estimate and
    compare with the exact global distinct.

    Scale shape: raw events collapse to ≤16 registers per day
    map-side; the merge aggregates (days × 16) tiny rows — at 100 TB
    the second pass never sees an event, which is the entire point.
    """
    ev = t["events"]
    day = F.expr("unix_millis(ts) div 86400000").alias("day")
    daily = (
        _hll_parts(ev.select("user_id", day), "day")
        .groupBy("day", "bucket")
        .agg(F.max(_rho()).alias("m_j"))
    )
    merged = daily.groupBy("bucket").agg(F.max("m_j").alias("m_j"))
    n_days = daily.select("day").distinct().agg(
        F.count(F.lit(1)).alias("n_days")
    )
    exact = ev.agg(F.countDistinct("user_id").alias("n_exact"))
    return (
        _hll_estimate(merged)
        .crossJoin(F.broadcast(n_days))
        .crossJoin(F.broadcast(exact))
        .select("n_days", "n_exact", "hll_estimate")
    )


HLL_UNION_DAILY_ORACLE = f"""
WITH parts AS (
    SELECT epoch_ms(ts) // 86400000 AS day,
           CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                AS BIGINT) AS bucket,
           CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 2,
                                  {_W_BITS // 4}) AS BIGINT) AS v60
    FROM events
),
daily AS (
    SELECT day, bucket,
           max(CASE WHEN v60 = 0 THEN {_W_BITS + 1}
                    ELSE {_W_BITS + 1} - length(bin(v60)) END) AS m_j
    FROM parts GROUP BY 1, 2
),
merged AS (SELECT bucket, max(m_j) AS m_j FROM daily GROUP BY 1),
agg AS (
    SELECT sum(CAST(pow(2.0, {_W_BITS + 1} - m_j) AS DECIMAL(24,0)))
               AS s_present,
           count(*) AS n_regs
    FROM merged
),
est AS (
    SELECT CAST(s_present + ({HLL_M} - n_regs)
                * CAST(pow(2.0, {_W_BITS + 1}) AS DECIMAL(24,0))
                AS DOUBLE) AS s,
           {HLL_M} - n_regs AS v
    FROM agg
)
SELECT (SELECT CAST(count(DISTINCT day) AS BIGINT) FROM daily) AS n_days,
       (SELECT CAST(count(DISTINCT user_id) AS BIGINT) FROM events) AS n_exact,
       round(CASE WHEN {HLL_ALPHA} * {HLL_M * HLL_M} * pow(2.0, {_W_BITS + 1}) / s
                       <= {2.5 * HLL_M} AND v > 0
                  THEN {float(HLL_M)} * ln({float(HLL_M)} / v)
                  ELSE {HLL_ALPHA} * {HLL_M * HLL_M}
                       * pow(2.0, {_W_BITS + 1}) / s END, 4) AS hll_estimate
FROM est
"""


HLL_DISTINCT_USERS_ORACLE = f"""
WITH parts AS (
    SELECT event_type,
           CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 1)
                AS BIGINT) AS bucket,
           CAST('0x' || substring(md5(CAST(user_id AS VARCHAR)), 2,
                                  {_W_BITS // 4}) AS BIGINT) AS v60
    FROM events
),
regs AS (
    SELECT event_type, bucket,
           max(CASE WHEN v60 = 0 THEN {_W_BITS + 1}
                    ELSE {_W_BITS + 1} - length(bin(v60)) END) AS m_j
    FROM parts GROUP BY 1, 2
),
agg AS (
    SELECT event_type,
           sum(CAST(pow(2.0, {_W_BITS + 1} - m_j) AS DECIMAL(24,0)))
               AS s_present,
           count(*) AS n_regs
    FROM regs GROUP BY 1
),
est AS (
    SELECT event_type,
           CAST(s_present + ({HLL_M} - n_regs)
                * CAST(pow(2.0, {_W_BITS + 1}) AS DECIMAL(24,0))
                AS DOUBLE) AS s,
           {HLL_M} - n_regs AS v
    FROM agg
),
ex AS (SELECT event_type, count(DISTINCT user_id) AS n_exact
       FROM events GROUP BY 1)
SELECT e.event_type,
       CAST(ex.n_exact AS BIGINT) AS n_exact,
       round(CASE WHEN {HLL_ALPHA} * {HLL_M * HLL_M} * pow(2.0, {_W_BITS + 1}) / s
                       <= {2.5 * HLL_M} AND v > 0
                  THEN {float(HLL_M)} * ln({float(HLL_M)} / v)
                  ELSE {HLL_ALPHA} * {HLL_M * HLL_M}
                       * pow(2.0, {_W_BITS + 1}) / s END, 4) AS hll_estimate
FROM est e JOIN ex USING (event_type)
"""
