"""Relational operators Spark lacks as built-ins: as-of join, range
join, exact quantiles (north-star ops; no analog in the reference —
the prompt-level pipeline surface a training-data engine needs).

Scale design (100 TB):

- **as-of join**: implemented as the *union-merge* formulation — tag
  both sides, one shuffle on the join key, one per-key sort, then
  ``last(..., ignorenulls)`` carries the most recent right-side row
  forward. This is O(n log n_partition) with a single exchange, versus
  the naive inequality join (cartesian per key, pruned late). It is the
  same plan shape pandas ``merge_asof`` / kdb ``aj`` use, expressed
  declaratively so Catalyst still prunes columns into the scan.
- **range join**: banded equi-join — bucket timestamps by the range
  width, probe (bin, bin+1) per anchor, then apply the exact range
  predicate. The equi-join on (key, bin) gives Spark a hash/sort-merge
  strategy with bounded fan-out (each candidate row lands in exactly
  one probe bin), avoiding the BroadcastNestedLoopJoin a raw interval
  predicate degenerates to.
- **quantiles**: exact ``percentile`` here (oracle-comparable);
  at 100 TB swap to ``approx_percentile(.., accuracy)`` — same plan
  shape, sketch-mergeable partials, documented loss of exactness.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

FIVE_MIN_MS = 300_000


def _events_ms(events: DataFrame) -> DataFrame:
    return events.withColumn("ms", F.unix_millis("ts"))


# --- as-of join ------------------------------------------------------------


def asof_join_events(t: dict[str, DataFrame]) -> DataFrame:
    """Attribute every non-signup event to the same user's most recent
    signup at-or-before it (inclusive as-of, NULL when none precedes).

    Union-merge as-of: signup rows sort before payload rows at an equal
    timestamp (``side`` 0 < 1 ⇒ ``ts >= signup_ts`` inclusive), and the
    right side is pre-reduced to one row per (user, ts) — max event_id
    wins — so the carry-forward is deterministic.
    """
    ev = _events_ms(t["events"])
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id", "ms")
        .agg(F.max("event_id").alias("signup_event_id"))
        .select(
            "user_id",
            "ms",
            F.lit(0).alias("side"),
            F.lit(None).cast("long").alias("event_id"),
            "signup_event_id",
        )
    )
    payload = ev.filter(F.col("event_type") != "signup").select(
        "user_id",
        "ms",
        F.lit(1).alias("side"),
        "event_id",
        F.lit(None).cast("long").alias("signup_event_id"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = signups.unionByName(payload).select(
        "user_id",
        "ms",
        "side",
        "event_id",
        F.last("signup_event_id", ignorenulls=True).over(w).alias("asof_signup_id"),
        F.last(
            F.when(F.col("side") == 0, F.col("ms")), ignorenulls=True
        ).over(w).alias("asof_signup_ms"),
    )
    return merged.filter(F.col("side") == 1).select(
        "event_id",
        "user_id",
        F.col("asof_signup_id").alias("signup_event_id"),
        (F.col("ms") - F.col("asof_signup_ms")).alias("ms_since_signup"),
    )


ASOF_JOIN_EVENTS_ORACLE = """
WITH signups AS (
    SELECT user_id, epoch_ms(ts) AS sms, max(event_id) AS signup_event_id
    FROM events
    WHERE event_type = 'signup'
    GROUP BY 1, 2
),
payload AS (
    SELECT event_id, user_id, epoch_ms(ts) AS ms
    FROM events
    WHERE event_type != 'signup'
)
SELECT l.event_id,
       l.user_id,
       r.signup_event_id,
       l.ms - r.sms AS ms_since_signup
FROM payload l
ASOF LEFT JOIN signups r
  ON l.user_id = r.user_id AND l.ms >= r.sms
"""


# --- range join ------------------------------------------------------------


def range_join_events(t: dict[str, DataFrame]) -> DataFrame:
    """Per error event: how many events the same user produced in the
    following 5 minutes (exclusive of the anchor instant, inclusive of
    the bound; the anchor row itself never counts).

    Banded: candidates carry one bin (``ms div width``); each anchor
    probes bins {b, b+1}, which cover the whole (ts, ts+width] range,
    and each candidate matches at most one probe row — no double count,
    no cartesian. Left semantics keep zero-activity anchors.
    """
    ev = _events_ms(t["events"])
    anchors = (
        ev.filter(F.col("event_type") == "error")
        .select("event_id", "user_id", "ms")
        .withColumn("probe_bin", F.explode(F.array(F.lit(0), F.lit(1))))
        .withColumn(
            "probe_bin", F.expr(f"ms div {FIVE_MIN_MS}") + F.col("probe_bin")
        )
    )
    cands = ev.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("c_event"),
        F.col("ms").alias("c_ms"),
        F.expr(f"ms div {FIVE_MIN_MS}").alias("c_bin"),
    )
    in_range = (
        (F.col("c_ms") > F.col("ms"))
        & (F.col("c_ms") <= F.col("ms") + FIVE_MIN_MS)
        & (F.col("c_event") != F.col("event_id"))
    )
    joined = anchors.join(
        cands,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("probe_bin") == F.col("c_bin")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count(F.when(in_range, F.lit(1))).alias("n_following"),
        F.round(
            F.sum(F.when(in_range, F.col("c_ms") - F.col("ms"))) / 1000.0, 3
        ).alias("sum_lag_s"),
    )


RANGE_JOIN_EVENTS_ORACLE = f"""
WITH anchors AS (
    SELECT event_id, user_id, epoch_ms(ts) AS ms
    FROM events WHERE event_type = 'error'
),
cands AS (SELECT event_id AS c_event, user_id AS c_user, epoch_ms(ts) AS c_ms FROM events)
SELECT a.event_id,
       a.user_id,
       CAST(count(c.c_event) AS BIGINT) AS n_following,
       round(sum(c.c_ms - a.ms) / 1000.0, 3) AS sum_lag_s
FROM anchors a
LEFT JOIN cands c
  ON a.user_id = c.c_user
 AND c.c_ms > a.ms
 AND c.c_ms <= a.ms + {FIVE_MIN_MS}
 AND c.c_event != a.event_id
GROUP BY 1, 2
"""


# --- exact quantiles -------------------------------------------------------


def quantile_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Per event type: exact p50/p95 of ``value`` (linear interpolation
    — Spark ``percentile`` ≡ DuckDB ``quantile_cont``) plus count.

    Exact percentile holds all values per group; at 100 TB use
    ``approx_percentile(value, ..., 10000)`` — mergeable KLL-style
    sketch, same single-shuffle plan.
    """
    return (
        t["events"]
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.expr("percentile(value, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(value, 0.95)"), 4).alias("p95"),
            F.round(F.avg("value"), 4).alias("mean"),
        )
    )


QUANTILE_STATS_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(value, 0.5), 4) AS p50,
       round(quantile_cont(value, 0.95), 4) AS p95,
       round(avg(value), 4) AS mean
FROM events
GROUP BY 1
"""


# --- skew-salted aggregation ----------------------------------------------

SALT_BUCKETS = 16


def salted_event_counts(t: dict[str, DataFrame]) -> DataFrame:
    """Per-event-type totals via an explicit two-stage SALTED aggregate.

    ``events.event_type`` has ~5 values — the canonical hot-key shape: a
    plain groupBy sends every row of a type to ONE reducer, so the
    busiest key bounds the stage at any cluster size. Salting splits
    each key into SALT_BUCKETS sub-keys for the wide partial stage (all
    parallelism), then re-aggregates the tiny partial frame on the real
    key. AQE's skew handling covers sort-merge JOINS, not group-bys —
    aggregation salting must be written into the plan like this.

    Parity note: ``value`` is summed as DECIMAL(28, 10), not DOUBLE —
    decimal addition is exact and order-independent, so the two-stage
    regroup cannot drift from the oracle's single-stage sum.
    """
    ev = t["events"]
    partial = ev.groupBy(
        "event_type", (F.col("event_id") % SALT_BUCKETS).alias("salt")
    ).agg(
        F.count(F.lit(1)).alias("pn"),
        F.sum(F.col("value").cast("decimal(28,10)")).alias("pv"),
        F.min("value").alias("pmin"),
        F.max("value").alias("pmax"),
    )
    return partial.groupBy("event_type").agg(
        F.sum("pn").alias("n"),
        F.round(F.sum("pv").cast("double"), 4).alias("sum_value"),
        F.round(F.min("pmin"), 4).alias("min_value"),
        F.round(F.max("pmax"), 4).alias("max_value"),
    )


SALTED_EVENT_COUNTS_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 4) AS sum_value,
       round(min(value), 4) AS min_value,
       round(max(value), 4) AS max_value
FROM events
GROUP BY 1
"""


# --- window frames ----------------------------------------------------------

ROLLING_ROWS = 2  # current row + 2 preceding
ROLLING_RANGE_MS = 3_600_000  # 1 hour


def rolling_user_value(t: dict[str, DataFrame]) -> DataFrame:
    """Per-event rolling statistics over each user's history: a
    row-frame average (current + 2 preceding events) and a time-range
    sum (events within the trailing hour).

    The ROWS/RANGE window-frame surface the reference's DSL lacks
    entirely (its windows are fixed aggregation buckets, SURVEY §2.5).
    Both frames share ONE user-keyed exchange + per-partition sort —
    Catalyst collapses same-spec windows into a single Window operator,
    so the second frame is free.  At 100 TB this is the shape a
    feature-engineering pass wants: state bounded by the frame, no
    self-join (the naive trailing-window formulation is a range
    self-join that explodes quadratically on hot users).
    """
    ev = _events_ms(t["events"]).select("user_id", "event_id", "ms", "value")
    order = [F.col("ms").asc(), F.col("event_id").asc()]
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy(*order)
        .rowsBetween(-ROLLING_ROWS, Window.currentRow)
    )
    # RANGE frames allow exactly one ordering column; ms ties are summed
    # together on both sides, so the frame stays deterministic.
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ms").asc())
        .rangeBetween(-ROLLING_RANGE_MS, Window.currentRow)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg("value").over(w_rows), 4).alias("roll_avg"),
        F.round(F.sum("value").over(w_range), 4).alias("hour_sum"),
    )


ROLLING_USER_VALUE_ORACLE = f"""
SELECT user_id,
       event_id,
       round(avg(value) OVER (
           PARTITION BY user_id
           ORDER BY epoch_ms(ts), event_id
           ROWS BETWEEN {ROLLING_ROWS} PRECEDING AND CURRENT ROW
       ), 4) AS roll_avg,
       round(sum(value) OVER (
           PARTITION BY user_id
           ORDER BY epoch_ms(ts)
           RANGE BETWEEN {ROLLING_RANGE_MS} PRECEDING AND CURRENT ROW
       ), 4) AS hour_sum
FROM events
"""


NTILE_BUCKETS = 4


def user_percentiles(t: dict[str, DataFrame]) -> DataFrame:
    """Rank every user by total event value: ``percent_rank`` plus an
    ``ntile`` quartile bucket (the global-ranking analytic surface).

    Two stages: a user-keyed partial-combine aggregate, then a single
    global sort over the ALREADY-AGGREGATED frame (one row per user —
    at 100 TB that is |users|, not |events|, so the unpartitioned
    window is safe; the raw-event equivalent would not be).
    """
    per_user = (
        t["events"]
        .select("user_id", "value")
        .groupBy("user_id")
        .agg(F.round(F.sum("value"), 4).alias("total_value"))
    )
    w = Window.orderBy(F.col("total_value").asc(), F.col("user_id").asc())
    return per_user.select(
        "user_id",
        "total_value",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.ntile(NTILE_BUCKETS).over(w).cast("long").alias("quartile"),
    )


USER_PERCENTILES_ORACLE = f"""
WITH per_user AS (
    SELECT user_id, round(sum(value), 4) AS total_value
    FROM events
    GROUP BY 1
)
SELECT user_id,
       total_value,
       round(percent_rank() OVER (ORDER BY total_value, user_id), 6) AS pct_rank,
       CAST(ntile({NTILE_BUCKETS}) OVER (ORDER BY total_value, user_id) AS BIGINT)
           AS quartile
FROM per_user
"""


# --- CDC changelog merge (the MERGE INTO / Delta-upsert shape) --------------

CDC_SINCE = "1998-01-01"


def cdc_apply(t: dict[str, DataFrame]) -> DataFrame:
    """Apply a CDC changelog batch to a snapshot — the lakehouse
    ``MERGE INTO`` (and the batch form of the reference's compacted-
    topic materialization: a KTable IS a snapshot + changelog,
    ``sources/ktable.latest_per_key`` is the stream side of this op).

    Semantics: per key, the changelog's LATEST operation (by sequence
    number) wins — ``upsert`` replaces the snapshot value (or inserts a
    new key), ``delete`` removes the key, untouched keys retain their
    snapshot row.  Here: customers are the snapshot (value =
    ``c_acctbal``), this year's orders are the changelog (seq =
    ``o_orderkey``; finished orders act as deletes, open ones as
    upserts of ``o_totalprice``) — synthetic op mapping, real merge
    mechanics.

    Scale shape: the changelog collapses to latest-per-key with ONE
    whole-struct ``max_by`` aggregate (no ordered window over raw
    rows, partial-combines map-side), then ONE co-keyed full-outer
    join against the snapshot; the date filter pushes to the scan.  In
    a lakehouse the delta is usually tiny — Spark broadcasts it and
    the snapshot never shuffles (AQE decides from stats); both sides
    here are comparable so the plan is an SMJ, which is also correct.
    """
    snap = t["customer"].select(
        F.col("c_custkey").alias("cust_key"),
        F.round("c_acctbal", 2).alias("value"),
    )
    delta = (
        t["orders"]
        .filter(F.col("o_orderdate") >= CDC_SINCE)
        .select(
            F.col("o_custkey").alias("cust_key"),
            F.col("o_orderkey").alias("seq"),
            F.when(F.col("o_orderstatus") == "F", F.lit("delete"))
            .otherwise(F.lit("upsert"))
            .alias("op"),
            F.round("o_totalprice", 2).alias("value"),
        )
    )
    return apply_changelog(snap, delta, key="cust_key")


CDC_APPLY_ORACLE = f"""
WITH delta AS (
    SELECT o_custkey AS cust_key, o_orderkey AS seq,
           CASE WHEN o_orderstatus = 'F' THEN 'delete'
                ELSE 'upsert' END AS op,
           round(o_totalprice, 2) AS value
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '{CDC_SINCE}'
),
latest AS (
    SELECT cust_key, op, value FROM (
        SELECT *, row_number() OVER (
            PARTITION BY cust_key ORDER BY seq DESC
        ) AS rn
        FROM delta
    )
    WHERE rn = 1
)
SELECT COALESCE(s.c_custkey, l.cust_key) AS cust_key,
       CASE WHEN l.cust_key IS NOT NULL THEN l.value
            ELSE round(s.c_acctbal, 2) END AS value,
       CASE WHEN l.cust_key IS NOT NULL THEN 'upserted'
            ELSE 'retained' END AS src
FROM customer s
FULL OUTER JOIN latest l ON s.c_custkey = l.cust_key
WHERE l.op IS NULL OR l.op = 'upsert'
"""


def apply_changelog(
    snapshot: DataFrame, delta: DataFrame, key: str = "key"
) -> DataFrame:
    """The reusable CDC merge core behind :func:`cdc_apply` and the
    streaming snapshot maintainer (``streaming/snapshot.py``):
    ``snapshot(key, value) ⊕ delta(key, seq, op, value)`` →
    ``(key, value, src)`` where the delta's latest op per key (by
    ``seq``) wins — ``upsert`` replaces/inserts, ``delete`` removes,
    untouched keys retain (``src`` ∈ upserted/retained).

    Incremental-apply identity: ``apply(apply(S, D1), D2) ==
    apply(S, D1 ∪ D2)`` whenever the batch cut respects per-key ``seq``
    order — which a changelog does by construction (a key's later ops
    land in later batches).  That identity is what lets micro-batches
    maintain the snapshot continuously.
    """
    latest = (
        delta.groupBy(key)
        .agg(F.expr("max_by(struct(op, value), seq)").alias("r"))
        .select(
            key,
            F.col("r.op").alias("__op"),
            F.col("r.value").alias("__dv"),
        )
    )
    snap = snapshot.select(key, F.col("value").alias("__sv"))
    merged = snap.join(latest, key, "full_outer")
    return (
        merged.filter(F.col("__op").isNull() | (F.col("__op") == "upsert"))
        .select(
            key,
            F.when(F.col("__op").isNotNull(), F.col("__dv"))
            .otherwise(F.col("__sv"))
            .alias("value"),
            F.when(F.col("__op").isNotNull(), F.lit("upserted"))
            .otherwise(F.lit("retained"))
            .alias("src"),
        )
    )
