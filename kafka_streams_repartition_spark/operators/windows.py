"""Event-stream operators over the ``events`` table.

``ktable_latest_event`` is the reference's latest-wins materialization
(KTable source S2/S3 and the restore tool's reduce A3,
``restore/.../Streams.java:125-132``).

The windowed aggregations realize the reference's ``WindowType`` enum
{TUMBLING, HOPPING, SLIDING, SESSION} (``OptionsUtilTest.java:15``) —
declared but never used in any reference topology; here they are
first-class. All window boundaries are computed on epoch-milliseconds
BIGINTs so the DuckDB oracle hashes identically (timestamp rendering
never enters the comparison).

Scale notes: tumbling/hopping are single-shuffle groupBys on
(window, key) — AQE coalesces the tail. Hopping materializes
size/hop copies of each row (here 2×) *after* column pruning, which is
the standard Spark formulation and is linear, not quadratic. Session
and sliding use per-user window functions: one shuffle on user_id, sort
within partition; skewed users would need salting (README §scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..sources.ktable import latest_per_key

HOUR_MS = 3_600_000
HALF_HOUR_MS = 1_800_000
SESSION_GAP_MS = 1_800_000
SLIDE_RANGE_MS = 600_000


def _with_ms(events: DataFrame) -> DataFrame:
    return events.withColumn("ms", F.unix_millis("ts"))


def ktable_latest_event(t: dict[str, DataFrame]) -> DataFrame:
    """Latest event per user — dedup-to-latest (S2/A3 semantics).

    Ordering is (epoch_ms, event_id): ms precision on both engines so
    sub-millisecond timestamp noise can't flip the winner.
    """
    ev = _with_ms(t["events"])
    latest = latest_per_key(ev, ["user_id"], ["ms", "event_id"])
    return latest.select(
        "user_id",
        F.col("event_id").alias("latest_event_id"),
        "event_type",
        F.round("value", 2).alias("value"),
        F.col("ms").alias("ts_ms"),
    )


KTABLE_LATEST_EVENT_ORACLE = """
SELECT user_id,
       event_id AS latest_event_id,
       event_type,
       round(value, 2) AS value,
       epoch_ms(ts) AS ts_ms
FROM (
    SELECT *, row_number() OVER (
        PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC
    ) AS rn
    FROM events
)
WHERE rn = 1
"""


def tumbling_events(t: dict[str, DataFrame]) -> DataFrame:
    """1-hour tumbling windows per event_type (idiomatic F.window)."""
    ev = t["events"]
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.unix_millis("w.start").alias("window_start_ms"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


TUMBLING_EVENTS_ORACLE = f"""
SELECT epoch_ms(ts)
           - ((epoch_ms(ts) % {HOUR_MS} + {HOUR_MS}) % {HOUR_MS})
           AS window_start_ms,
       event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
"""


def hopping_events(t: dict[str, DataFrame]) -> DataFrame:
    """1-hour windows hopping every 30 min: each event lands in 2.

    Window starts are FLOOR-aligned via a positive modulus
    (``x - pmod(x, slide)``), matching ``F.window``'s hopping for ALL
    epochs — including pre-1970 negatives, where the earlier
    truncating-division form diverged (the r3–r5 carried cosmetic,
    closed with a negative-epoch regression test).  For positive
    epochs the two forms are identical, so every historical green row
    still holds.
    """
    ev = _with_ms(t["events"]).select("ms", "value")
    return (
        ev.select(
            "ms", "value", F.explode(F.array(F.lit(0), F.lit(1))).alias("k")
        )
        .select(
            F.expr(
                f"(ms - k * {HALF_HOUR_MS})"
                f" - pmod(ms - k * {HALF_HOUR_MS}, {HOUR_MS})"
                f" + k * {HALF_HOUR_MS}"
            ).alias("window_start_ms"),
            "value",
        )
        .groupBy("window_start_ms")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
    )


HOPPING_EVENTS_ORACLE = f"""
SELECT (epoch_ms(ts) - k * {HALF_HOUR_MS})
           - (((epoch_ms(ts) - k * {HALF_HOUR_MS}) % {HOUR_MS} + {HOUR_MS})
              % {HOUR_MS})
           + k * {HALF_HOUR_MS} AS window_start_ms,
       CAST(count(*) AS BIGINT) AS n_events,
       round(sum(value), 2) AS total_value
FROM events, unnest([0, 1]) AS u(k)
GROUP BY 1
"""


def session_events(t: dict[str, DataFrame]) -> DataFrame:
    """Sessionization: a >30-min silence per user starts a new session."""
    ev = _with_ms(t["events"]).select("user_id", "event_id", "ms", "value")
    order = Window.partitionBy("user_id").orderBy("ms", "event_id")
    sessions = (
        ev.withColumn("prev_ms", F.lag("ms").over(order))
        .withColumn(
            "new_session",
            F.when(
                F.col("prev_ms").isNull()
                | ((F.col("ms") - F.col("prev_ms")) > SESSION_GAP_MS),
                1,
            ).otherwise(0),
        )
        .withColumn("session_seq", F.sum("new_session").over(order))
    )
    return sessions.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ms").alias("start_ms"),
        F.max("ms").alias("end_ms"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


SESSION_EVENTS_ORACLE = f"""
WITH lagged AS (
    SELECT user_id, event_id, epoch_ms(ts) AS ms, value,
           lag(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
           ) AS prev_ms
    FROM events
),
flagged AS (
    SELECT *,
           CASE WHEN prev_ms IS NULL OR ms - prev_ms > {SESSION_GAP_MS}
                THEN 1 ELSE 0 END AS new_session
    FROM lagged
),
numbered AS (
    SELECT *,
           CAST(sum(new_session) OVER (
               PARTITION BY user_id ORDER BY ms, event_id
           ) AS BIGINT) AS session_seq
    FROM flagged
)
SELECT user_id, session_seq,
       CAST(count(*) AS BIGINT) AS n_events,
       min(ms) AS start_ms,
       max(ms) AS end_ms,
       round(sum(value), 2) AS total_value
FROM numbered
GROUP BY 1, 2
"""


def sliding_events(t: dict[str, DataFrame]) -> DataFrame:
    """Per-event trailing 10-min window per user (true sliding)."""
    ev = _with_ms(t["events"]).select("user_id", "event_id", "ms", "value")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms")
        .rangeBetween(-SLIDE_RANGE_MS, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("trailing_count"),
        F.round(F.sum("value").over(w), 2).alias("trailing_value"),
    )


SLIDING_EVENTS_ORACLE = f"""
SELECT event_id, user_id,
       CAST(count(*) OVER w AS BIGINT) AS trailing_count,
       round(sum(value) OVER w, 2) AS trailing_value
FROM events
WINDOW w AS (
    PARTITION BY user_id ORDER BY epoch_ms(ts)
    RANGE BETWEEN {SLIDE_RANGE_MS} PRECEDING AND CURRENT ROW
)
"""


def event_props_stats(t: dict[str, DataFrame]) -> DataFrame:
    """JSON payload decode over the events stream: the reference's whole
    wire format is JSON blobs (``JsonDeserializer.java:38-53``); here the
    semi-structured ``props`` column is parsed in-plan (JsonToStructs —
    codegen-adjacent, no Python) and aggregated per event type.

    Scale: a narrow parse on the scan + one partially-aggregated
    shuffle; malformed JSON yields nulls (log-and-continue semantics,
    SURVEY §2.10) counted in ``n_bad``.
    """
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        t["events"]
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("k").isNull(), 1)).cast("long").alias("n_bad"),
            F.min("k").alias("k_min"),
            F.max("k").alias("k_max"),
            F.round(F.avg("k"), 4).alias("k_avg"),
        )
    )


EVENT_PROPS_STATS_ORACLE = """
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(count(CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT)
                       IS NULL THEN 1 END) AS BIGINT) AS n_bad,
       min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_min,
       max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS k_max,
       round(avg(CAST(json_extract_string(props, '$.k') AS BIGINT)), 4) AS k_avg
FROM events
GROUP BY 1
"""


# --- funnel analysis -------------------------------------------------------


def event_funnel(t: dict[str, DataFrame]) -> DataFrame:
    """Per-user 3-step funnel view → click → purchase: earliest view,
    earliest click at-or-after it, earliest purchase at-or-after that
    click; ``stage`` = how deep the user got (0–3).

    Scale shape: ONE exchange on user_id; the three conditional-min
    windows share the same partitioning/ordering spec so Catalyst plans
    them in a single Window operator chain without re-shuffling, and the
    final per-user dedup (groupBy user) rides the same partitioning.
    Chained windows express "first B after first A" without self-joins —
    the naive formulation is three scans and two joins.
    """
    w = Window.partitionBy("user_id")
    ev = _with_ms(t["events"]).select("user_id", "event_type", "ms")
    v = F.min(F.when(F.col("event_type") == "view", F.col("ms"))).over(w)
    staged = ev.withColumn("v_ms", v)
    c = F.min(
        F.when(
            (F.col("event_type") == "click") & (F.col("ms") >= F.col("v_ms")),
            F.col("ms"),
        )
    ).over(w)
    staged = staged.withColumn("c_ms", c)
    p = F.min(
        F.when(
            (F.col("event_type") == "purchase")
            & (F.col("ms") >= F.col("c_ms")),
            F.col("ms"),
        )
    ).over(w)
    staged = staged.withColumn("p_ms", p)
    per_user = staged.groupBy("user_id").agg(
        F.first("v_ms").alias("view_ms"),
        F.first("c_ms").alias("click_ms"),
        F.first("p_ms").alias("purchase_ms"),
    )
    stage = (
        F.when(F.col("purchase_ms").isNotNull(), 3)
        .when(F.col("click_ms").isNotNull(), 2)
        .when(F.col("view_ms").isNotNull(), 1)
        .otherwise(0)
    )
    return per_user.select(
        "user_id",
        "view_ms",
        "click_ms",
        "purchase_ms",
        stage.cast("long").alias("stage"),
        (F.col("purchase_ms") - F.col("view_ms")).alias("conversion_ms"),
    )


EVENT_FUNNEL_ORACLE = """
WITH v AS (
    SELECT user_id, min(CASE WHEN event_type = 'view' THEN epoch_ms(ts) END) AS view_ms
    FROM events GROUP BY 1
),
c AS (
    SELECT e.user_id,
           min(CASE WHEN e.event_type = 'click'
                     AND epoch_ms(e.ts) >= v.view_ms THEN epoch_ms(e.ts) END) AS click_ms
    FROM events e JOIN v ON e.user_id = v.user_id
    GROUP BY 1
),
p AS (
    SELECT e.user_id,
           min(CASE WHEN e.event_type = 'purchase'
                     AND epoch_ms(e.ts) >= c.click_ms THEN epoch_ms(e.ts) END) AS purchase_ms
    FROM events e JOIN c ON e.user_id = c.user_id
    GROUP BY 1
)
SELECT v.user_id,
       v.view_ms,
       c.click_ms,
       p.purchase_ms,
       CAST(CASE WHEN p.purchase_ms IS NOT NULL THEN 3
                 WHEN c.click_ms IS NOT NULL THEN 2
                 WHEN v.view_ms IS NOT NULL THEN 1
                 ELSE 0 END AS BIGINT) AS stage,
       p.purchase_ms - v.view_ms AS conversion_ms
FROM v JOIN c USING (user_id) JOIN p USING (user_id)
"""


SCD2_END_MS = 253402300799000  # 9999-12-31: the open-interval sentinel


def scd2_history(t: dict[str, DataFrame]) -> DataFrame:
    """Type-2 slowly-changing history of each user's event_type state:
    consecutive runs of the same type collapse to one validity
    interval [valid_from_ms, valid_to_ms). ``ktable_latest_event`` is
    the type-1 (latest-wins) materialization of the changelog; this is
    the type-2 — the full history a warehouse keeps when the
    reference's compacted topic would have discarded it.

    Gaps-and-islands, fully declarative: a null-safe lag() marks state
    changes, a running sum over the SAME window numbers the runs, one
    aggregation per (user, run) takes the interval start, and lead()
    closes each interval with the next run's start (open intervals get
    the 9999-12-31 sentinel — no nullable column for the hash gate).

    Scale shape: ONE shuffle — every window partitions by user_id, so
    lag, the running sum, and lead all reuse a single exchange+sort
    (check: one Exchange in the plan), and the per-user partition is
    bounded by that user's history, never corpus-hot. The per-run
    aggregation partial-combines map-side within the same
    partitioning.
    """
    ev = _with_ms(t["events"]).select("user_id", "ms", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    prev = F.lag("event_type").over(w)
    chg = F.when(~prev.eqNullSafe(F.col("event_type")), 1).otherwise(0)
    runs = ev.withColumn(
        "run_id",
        F.sum(chg).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    hist = runs.groupBy("user_id", "run_id", "event_type").agg(
        F.min("ms").alias("valid_from_ms"),
        F.count(F.lit(1)).alias("n_events"),
    )
    nxt = Window.partitionBy("user_id").orderBy("valid_from_ms")
    return hist.select(
        "user_id",
        "event_type",
        "valid_from_ms",
        F.coalesce(
            F.lead("valid_from_ms").over(nxt), F.lit(SCD2_END_MS)
        ).alias("valid_to_ms"),
        "n_events",
    )


SCD2_HISTORY_ORACLE = f"""
WITH ev AS (
    SELECT user_id, epoch_ms(ts) AS ms, event_id, event_type FROM events
),
chg AS (
    -- DuckDB forbids nesting window calls in one expression: lag here,
    -- the running sum in the next level
    SELECT user_id, ms, event_id, event_type,
           CASE WHEN lag(event_type)
                         OVER (PARTITION BY user_id ORDER BY ms, event_id)
                     IS DISTINCT FROM event_type
                THEN 1 ELSE 0 END AS is_chg
    FROM ev
),
runs AS (
    SELECT user_id, ms, event_type,
           sum(is_chg) OVER (PARTITION BY user_id ORDER BY ms, event_id
                             ROWS UNBOUNDED PRECEDING) AS run_id
    FROM chg
),
hist AS (
    SELECT user_id, run_id, event_type,
           min(ms) AS valid_from_ms, count(*) AS n_events
    FROM runs GROUP BY 1, 2, 3
)
SELECT user_id, event_type, valid_from_ms,
       coalesce(lead(valid_from_ms)
                    OVER (PARTITION BY user_id ORDER BY valid_from_ms),
                {SCD2_END_MS}) AS valid_to_ms,
       n_events
FROM hist
"""


def event_transitions(t: dict[str, DataFrame]) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: for every consecutive (prev → next) event-type pair, the
    transition count and row-normalized probability — the sequence-
    mining summary behind funnel design and next-event prediction.

    One user-keyed exchange carries everything: the ``lag`` window and
    the per-user ordering ride it, the pair counts partial-aggregate
    map-side into a ≤|types|² frame, and the probability normalization
    is a window over that tiny matrix — raw events never shuffle twice.
    """
    ev = _with_ms(t["events"]).select("user_id", "ms", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    pairs = (
        ev.withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", F.col("event_type").alias("to_type"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_from = Window.partitionBy("from_type")
    return pairs.select(
        "from_type",
        "to_type",
        F.col("n").cast("long").alias("n"),
        F.round(F.col("n") / F.sum("n").over(w_from), 6).alias("prob"),
    )


EVENT_TRANSITIONS_ORACLE = """
WITH ordered AS (
    SELECT user_id, event_type,
           lag(event_type) OVER (PARTITION BY user_id
                                 ORDER BY epoch_ms(ts), event_id)
               AS from_type
    FROM events
),
pairs AS (
    SELECT from_type, event_type AS to_type, count(*) AS n
    FROM ordered WHERE from_type IS NOT NULL
    GROUP BY 1, 2
)
SELECT from_type, to_type, CAST(n AS BIGINT) AS n,
       round(n / sum(n) OVER (PARTITION BY from_type), 6) AS prob
FROM pairs
"""


def daily_value_locf(t: dict[str, DataFrame]) -> DataFrame:
    """Time-series gap fill: one row per (user, calendar day) over the
    observed range, with missing days carrying the last observed daily
    average forward (LOCF) — the resample-and-fill operator relational
    engines lack as a built-in and every metrics pipeline re-invents.

    Scale shape: the scaffold is |users| × |days| rows built by a
    map-side ``sequence``/``explode`` against a 1-row broadcast range —
    never a shuffled cartesian; the daily averages partial-aggregate
    into ≤|users|·|days| rows before their one keyed exchange; and the
    carry-forward is ``last(ignorenulls)`` on the user-keyed window the
    scaffold join already established.  Observed values are rounded
    BEFORE the carry so both engines propagate identical doubles.
    """
    ev = _with_ms(t["events"]).select(
        "user_id", (F.col("ms") / F.lit(86400000)).cast("long").alias("day"), "value"
    )
    rng = ev.agg(
        F.min("day").alias("day_lo"), F.max("day").alias("day_hi")
    )
    daily = ev.groupBy("user_id", "day").agg(
        F.round(F.avg("value"), 4).alias("day_avg")
    )
    scaffold = (
        ev.select("user_id")
        .distinct()
        .crossJoin(F.broadcast(rng))
        .select(
            "user_id",
            F.explode(F.sequence(F.col("day_lo"), F.col("day_hi"))).alias("day"),
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        scaffold.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id",
            "day",
            F.col("day_avg").isNotNull().alias("observed"),
            F.last("day_avg", ignorenulls=True).over(w).alias("filled"),
        )
    )


DAILY_VALUE_LOCF_ORACLE = """
WITH ev AS (
    SELECT user_id,
           CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
           value
    FROM events
),
rng AS (SELECT min(day) AS day_lo, max(day) AS day_hi FROM ev),
daily AS (
    SELECT user_id, day, round(avg(value), 4) AS day_avg
    FROM ev GROUP BY 1, 2
),
scaffold AS (
    SELECT u.user_id, CAST(g.d AS BIGINT) AS day
    FROM (SELECT DISTINCT user_id FROM ev) u
    CROSS JOIN rng r
    CROSS JOIN LATERAL unnest(generate_series(r.day_lo, r.day_hi)) g(d)
)
SELECT s.user_id, s.day,
       d.day_avg IS NOT NULL AS observed,
       last_value(d.day_avg IGNORE NULLS) OVER (
           PARTITION BY s.user_id ORDER BY s.day
           ROWS UNBOUNDED PRECEDING
       ) AS filled
FROM scaffold s
LEFT JOIN daily d ON s.user_id = d.user_id AND s.day = d.day
"""


def weekly_value_trend(t: dict[str, DataFrame]) -> DataFrame:
    """Week-over-week trend per event type: weekly value totals with
    the previous week's total and the percent change — the lag-over-
    aggregated-series reporting shape (the window runs on the tiny
    (type × week) frame, never on raw events).

    Weeks are epoch-day buckets (``day div 7``), not calendar ISO
    weeks, so the bucketing is pure integer arithmetic — identical in
    every engine and timezone-free.  Totals are decimal-summed before
    the cast so the one wide aggregation is order-independent.
    """
    ev = _with_ms(t["events"]).select(
        "event_type",
        (F.col("ms") / F.lit(86400000 * 7)).cast("long").alias("week"),
        "value",
    )
    weekly = ev.groupBy("event_type", "week").agg(
        F.round(F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 4).alias(
            "total"
        )
    )
    w = Window.partitionBy("event_type").orderBy("week")
    prev = F.lag("total").over(w)
    return weekly.select(
        "event_type",
        "week",
        "total",
        prev.alias("prev_total"),
        F.round(
            F.when(prev > 0, (F.col("total") - prev) / prev), 4
        ).alias("pct_change"),
    )


WEEKLY_VALUE_TREND_ORACLE = """
WITH weekly AS (
    SELECT event_type,
           CAST(epoch_ms(ts) // 604800000 AS BIGINT) AS week,
           round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 4)
               AS total
    FROM events GROUP BY 1, 2
)
SELECT event_type, week, total,
       lag(total) OVER (PARTITION BY event_type ORDER BY week) AS prev_total,
       round(CASE WHEN lag(total) OVER (PARTITION BY event_type ORDER BY week) > 0
                  THEN (total - lag(total) OVER (PARTITION BY event_type
                                                 ORDER BY week))
                       / lag(total) OVER (PARTITION BY event_type ORDER BY week)
             END, 4) AS pct_change
FROM weekly
"""


def interarrival_stats(t: dict[str, DataFrame]) -> DataFrame:
    """Per-user inter-event gap distribution: count, mean, exact
    p50/p95 of the milliseconds between consecutive events — the
    arrival-process profile behind session-gap tuning (pick the session
    timeout where the gap distribution's tail breaks) and rate
    anomaly detection.

    One user-keyed exchange carries both stages: the ``lag`` diff rides
    the per-user sort, and the per-user percentile aggregates the ≤|user
    events| gap list in the same partitioning — no second shuffle.  At
    100 TB swap ``percentile`` for ``approx_percentile`` (mergeable
    sketch, same plan) exactly as ``quantile_stats`` documents.
    """
    ev = _with_ms(t["events"]).select("user_id", "ms", "event_id")
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    gaps = ev.withColumn("gap", F.col("ms") - F.lag("ms").over(w)).filter(
        F.col("gap").isNotNull()
    )
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_gaps"),
        F.round(F.avg("gap"), 2).alias("mean_gap_ms"),
        F.round(F.expr("percentile(gap, 0.5)"), 2).alias("p50_gap_ms"),
        F.round(F.expr("percentile(gap, 0.95)"), 2).alias("p95_gap_ms"),
    )


INTERARRIVAL_STATS_ORACLE = """
WITH gaps AS (
    SELECT user_id,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER (
               PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
           ) AS gap
    FROM events
)
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_gaps,
       round(avg(gap), 2) AS mean_gap_ms,
       round(quantile_cont(gap, 0.5), 2) AS p50_gap_ms,
       round(quantile_cont(gap, 0.95), 2) AS p95_gap_ms
FROM gaps WHERE gap IS NOT NULL
GROUP BY 1
"""


def modal_event_type(t: dict[str, DataFrame]) -> DataFrame:
    """Each user's modal (most frequent) event type and its share — the
    statistical-mode surface, expressed as a lexicographic struct-min
    AGGREGATE (ties → alphabetically first type) rather than a window,
    so hot users partial-combine map-side instead of sorting full
    groups."""
    counts = (
        t["events"]
        .select("user_id", "event_type")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pick = F.min(
        F.struct((-F.col("n")).alias("negn"), F.col("event_type").alias("et"))
    ).alias("b")
    return (
        counts.groupBy("user_id")
        .agg(pick, F.sum("n").alias("total"))
        .select(
            "user_id",
            F.col("b.et").alias("modal_type"),
            (-F.col("b.negn")).cast("long").alias("n_modal"),
            F.round((-F.col("b.negn")) / F.col("total"), 4).alias("modal_share"),
        )
    )


MODAL_EVENT_TYPE_ORACLE = """
WITH counts AS (
    SELECT user_id, event_type, count(*) AS n
    FROM events GROUP BY 1, 2
),
ranked AS (
    SELECT user_id, event_type, n,
           sum(n) OVER (PARTITION BY user_id) AS total,
           row_number() OVER (
               PARTITION BY user_id ORDER BY n DESC, event_type ASC
           ) AS rn
    FROM counts
)
SELECT user_id,
       event_type AS modal_type,
       CAST(n AS BIGINT) AS n_modal,
       round(CAST(n AS DOUBLE) / total, 4) AS modal_share
FROM ranked WHERE rn = 1
"""


def seasonal_naive_backtest(t: dict[str, DataFrame]) -> DataFrame:
    """Backtest of the seasonal-naive forecaster on daily event totals:
    predict each day's total per event type as the expanding average of
    all PRIOR same-weekday totals, and report MAE and mean bias — the
    honest-baseline evaluation every forecasting pipeline needs before
    anything fancier ships.

    Shapes: raw events collapse to one decimal-summed row per
    (type, day) first; the expanding-average window runs over the tiny
    (type, weekday) frames with a ROWS … 1 PRECEDING frame, so no
    prediction ever sees its own day (no leakage by construction); the
    error aggregate reduces ≤|types|·|days| rows.
    """
    ev = _with_ms(t["events"]).select(
        "event_type",
        (F.col("ms") / F.lit(86400000)).cast("long").alias("day"),
        "value",
    )
    daily = ev.groupBy("event_type", "day").agg(
        F.round(
            F.sum(F.col("value").cast("decimal(28,10)")).cast("double"), 4
        ).alias("total")
    )
    w = (
        Window.partitionBy("event_type", (F.col("day") % 7).alias("weekday"))
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    scored = daily.withColumn("pred", F.round(F.avg("total").over(w), 4)).filter(
        F.col("pred").isNotNull()
    )
    return scored.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.avg(F.abs(F.col("total") - F.col("pred"))), 4).alias("mae"),
        F.round(F.avg(F.col("total") - F.col("pred")), 4).alias("mean_bias"),
    )


SEASONAL_NAIVE_BACKTEST_ORACLE = """
WITH daily AS (
    SELECT event_type,
           CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
           round(CAST(sum(CAST(value AS DECIMAL(28,10))) AS DOUBLE), 4)
               AS total
    FROM events GROUP BY 1, 2
),
scored AS (
    SELECT event_type, day, total,
           round(avg(total) OVER (
               PARTITION BY event_type, day % 7 ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
           ), 4) AS pred
    FROM daily
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_days,
       round(avg(abs(total - pred)), 4) AS mae,
       round(avg(total - pred), 4) AS mean_bias
FROM scored WHERE pred IS NOT NULL
GROUP BY 1
"""


# --- exponentially-weighted smoothing --------------------------------------

EWMA_DECAY = 0.5  # power of two: decay^k is EXACT in IEEE doubles, so the
# per-engine weight computation cannot differ in the last ulp
EWMA_USERS_TOP = 50


def ewma_user_value(t: dict[str, DataFrame]) -> DataFrame:
    """Exponentially-weighted mean of each user's event values (latest
    events weigh most) — the classic smoothed per-entity health score.

    The recurrence ewma_i = d·ewma_{i-1} + (1-d)·v_i is inherently
    sequential, which is exactly what a distributed engine must NOT
    compute iteratively.  The closed form ewma_N = Σ w_i·v_i / Σ w_i
    with w_i = d^(N-i) turns it into ONE grouped aggregate over
    window-ranked rows: shuffle on user_id once, no recursion, no
    driver loop.  With d = 0.5 every weight is a power of two, so the
    weights are bit-identical across engines (the remaining float sums
    agree after round()).

    The rank window and the aggregate share the same user_id
    partitioning — Catalyst plans one exchange, the sort feeds both.
    """
    ranked = t["events"].select(
        "user_id",
        "value",
        F.row_number()
        .over(Window.partitionBy("user_id").orderBy(F.col("ts").desc(), "event_id"))
        .alias("rn"),
    )
    w = F.pow(F.lit(EWMA_DECAY), F.col("rn") - 1)
    return (
        ranked.groupBy("user_id")
        .agg(
            F.round(F.sum(w * F.col("value")) / F.sum(w), 4).alias("ewma_value"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )
        .orderBy(F.col("ewma_value").desc(), "user_id")
        .limit(EWMA_USERS_TOP)
    )


EWMA_USER_VALUE_ORACLE = f"""
WITH ranked AS (
    SELECT user_id, value,
           row_number() OVER (
               PARTITION BY user_id ORDER BY ts DESC, event_id
           ) AS rn
    FROM events
)
SELECT user_id,
       round(sum(pow({EWMA_DECAY}, rn - 1) * value)
             / sum(pow({EWMA_DECAY}, rn - 1)), 4) AS ewma_value,
       CAST(count(*) AS BIGINT) AS n_events
FROM ranked
GROUP BY 1
ORDER BY ewma_value DESC, user_id
LIMIT {EWMA_USERS_TOP}
"""


# --- CUSUM changepoint scan -------------------------------------------------


def cusum_changepoint(t: dict[str, DataFrame]) -> DataFrame:
    """Per-event-type CUSUM scan over the daily mean-value series: the
    day where the cumulative deviation from the type's overall mean
    peaks — the standard "when did this metric shift" detector.

    Everything after the daily rollup runs on a |types|×|days| frame
    (bounded domain), so the ordered windows are cheap; the raw events
    shuffle exactly once into the rollup.  Statistic and argmax are
    deterministic: ties on |cusum| break toward the earliest day in
    both engines.
    """
    daily = (
        t["events"]
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.avg("value").alias("day_avg"))
    )
    overall = Window.partitionBy("event_type")
    cum = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    # Two window steps (a window can't nest inside another's aggregate):
    # same partitioning for both, so Catalyst plans ONE exchange+sort.
    dev = daily.select(
        "event_type",
        "day",
        (F.col("day_avg") - F.avg("day_avg").over(overall)).alias("dev"),
    )
    scanned = dev.select(
        "event_type", "day", F.sum("dev").over(cum).alias("cusum")
    )
    pick = Window.partitionBy("event_type").orderBy(
        F.abs(F.round("cusum", 6)).desc(), "day"
    )
    return (
        scanned.withColumn("rk", F.row_number().over(pick))
        .filter(F.col("rk") == 1)
        .select(
            "event_type",
            F.date_format("day", "yyyy-MM-dd").alias("peak_day"),
            F.round("cusum", 4).alias("peak_cusum"),
        )
        .orderBy("event_type")
    )


CUSUM_CHANGEPOINT_ORACLE = """
WITH daily AS (
    SELECT event_type, CAST(ts AS DATE) AS day, avg(value) AS day_avg
    FROM events
    GROUP BY 1, 2
),
dev AS (
    SELECT event_type, day,
           day_avg - avg(day_avg) OVER (PARTITION BY event_type) AS dev
    FROM daily
),
scanned AS (
    SELECT event_type, day,
           sum(dev) OVER (PARTITION BY event_type ORDER BY day
                          ROWS UNBOUNDED PRECEDING) AS cusum
    FROM dev
),
picked AS (
    SELECT *, row_number() OVER (
        PARTITION BY event_type
        ORDER BY abs(round(cusum, 6)) DESC, day
    ) AS rk
    FROM scanned
)
SELECT event_type,
       strftime(day, '%Y-%m-%d') AS peak_day,
       round(cusum, 4) AS peak_cusum
FROM picked
WHERE rk = 1
ORDER BY 1
"""


def hourly_seasonality(t: dict[str, DataFrame]) -> DataFrame:
    """Hour-of-day × day-of-week activity/value profile — the seasonal
    fingerprint consumed by anomaly baselines and capacity planning
    (and the time-feature table a training pipeline joins onto events).

    One scan, two tiny derived keys, one partial-combined aggregate
    into a ≤168-row result: the canonical bounded-domain rollup.
    """
    return (
        t["events"]
        .select(
            F.hour("ts").cast("long").alias("hour_of_day"),
            F.dayofweek("ts").cast("long").alias("day_of_week"),
            "value",
        )
        .groupBy("hour_of_day", "day_of_week")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.avg("value"), 4).alias("avg_value"),
        )
        .orderBy("hour_of_day", "day_of_week")
    )


HOURLY_SEASONALITY_ORACLE = """
SELECT CAST(hour(ts) AS BIGINT) AS hour_of_day,
       CAST(dayofweek(ts) + 1 AS BIGINT) AS day_of_week,
       CAST(count(*) AS BIGINT) AS n_events,
       round(avg(value), 4) AS avg_value
FROM events
GROUP BY 1, 2
ORDER BY 1, 2
"""


# --------------------------------------------------------------------------
# First-touch attribution: purchase -> most recent prior click.
# --------------------------------------------------------------------------

ATTRIBUTION_WINDOW_MS = 7 * 24 * 3_600_000  # 7 days


def first_touch_attribution(t: dict[str, DataFrame]) -> DataFrame:
    """Attribute each ``purchase`` event to the user's most recent
    STRICTLY PRIOR ``click`` within a 7-day lookback — the marketing
    attribution join, and the within-one-table form of an as-of join
    (cf. :func:`...relational.asof_join_events` for the two-table form).

    A naive formulation is a range self-join (click × purchase per
    user) — quadratic in events-per-user.  The scalable form used here
    is one pass: per user, ordered by (ms, event_id), carry the last
    non-null click id/ts with ``last(..., ignorenulls=True)`` over a
    ROWS frame ending at 1 PRECEDING (strictness: a click at the exact
    same ms attributes only if it sorts earlier by event_id — both
    engines use the identical frame, so ties agree).

    Scale shape: one shuffle on user_id, one sort within partitions
    bounded by per-user event counts; no self-join, no row explosion.
    At 100 TB this is the difference between a linear pass and an
    O(n²/users) blowup on power users.
    """
    ev = _with_ms(t["events"]).select("event_id", "user_id", "event_type", "ms")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ms", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    click_id = F.when(F.col("event_type") == "click", F.col("event_id"))
    click_ms = F.when(F.col("event_type") == "click", F.col("ms"))
    return (
        # one select, not chained withColumn: both carries land in a
        # SINGLE Window node (CollapseWindow can't merge across the
        # intermediate Project a second withColumn introduces)
        ev.select(
            "*",
            F.last(click_id, ignorenulls=True).over(w).alias("click_event_id"),
            F.last(click_ms, ignorenulls=True).over(w).alias("click_ms"),
        )
        .filter(
            (F.col("event_type") == "purchase")
            & F.col("click_event_id").isNotNull()
            & (F.col("ms") - F.col("click_ms") <= ATTRIBUTION_WINDOW_MS)
        )
        .select(
            F.col("event_id").alias("purchase_event_id"),
            "user_id",
            "click_event_id",
            (F.col("ms") - F.col("click_ms")).alias("gap_ms"),
        )
    )


FIRST_TOUCH_ATTRIBUTION_ORACLE = f"""
WITH ev AS (
    SELECT event_id, user_id, event_type, epoch_ms(ts) AS ms FROM events
),
carried AS (
    SELECT event_id, user_id, event_type, ms,
           last_value(CASE WHEN event_type = 'click' THEN event_id END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS click_event_id,
           last_value(CASE WHEN event_type = 'click' THEN ms END
                      IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS click_ms
    FROM ev
)
SELECT event_id AS purchase_event_id,
       user_id,
       click_event_id,
       ms - click_ms AS gap_ms
FROM carried
WHERE event_type = 'purchase'
  AND click_event_id IS NOT NULL
  AND ms - click_ms <= {ATTRIBUTION_WINDOW_MS}
"""


# --------------------------------------------------------------------------
# Out-of-order arrival audit — the watermark-sizing query.
# --------------------------------------------------------------------------


def out_of_order_stats(t: dict[str, DataFrame]) -> DataFrame:
    """How disordered is the stream?  Per user, replay events in ingest
    order (``event_id`` stands in for arrival sequence — the generator
    assigns ids in emission order) and measure each event's lateness
    against the running max event-time; report the late fraction and
    the lateness quantiles.

    This is the query that SIZES A WATERMARK: Structured Streaming's
    ``withWatermark(delay)`` drops events later than ``delay``, so you
    set it from the p99/max lateness observed here (e.g. the tumbling/
    hopping/session queries in this module and the streaming pipelines
    in ``streaming/pipelines.py``).  Guessing the delay either drops
    data (too small) or bloats state (too large); this audit replaces
    the guess with a measurement.

    Scale shape: one shuffle on user_id + per-user sort for the running
    max (partitions bounded by per-user counts), then a single global
    aggregate over scalar lateness values.  The quantiles are exact
    interpolated percentiles — at 100 TB swap in
    ``approx_percentile`` (the documented sketch path, cf.
    ``histogram_quantiles``).
    """
    ev = _with_ms(t["events"]).select("user_id", "event_id", "ms")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # coalesce handles the first row per user (empty frame -> null max):
    # identical formulation to the oracle so null semantics can't diverge.
    late = ev.withColumn(
        "late_ms",
        F.greatest(
            F.lit(0).cast("long"),
            F.coalesce(F.max("ms").over(w), F.col("ms")) - F.col("ms"),
        ),
    )
    return late.agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.sum(F.when(F.col("late_ms") > 0, 1).otherwise(0))
        .cast("long")
        .alias("n_late"),
        F.round(
            F.sum(F.when(F.col("late_ms") > 0, 1).otherwise(0))
            / F.count(F.lit(1)),
            6,
        ).alias("late_frac"),
        F.round(F.expr("percentile(late_ms, 0.5)"), 3).alias("p50_late_ms"),
        F.round(F.expr("percentile(late_ms, 0.95)"), 3).alias("p95_late_ms"),
        F.round(F.expr("percentile(late_ms, 0.99)"), 3).alias("p99_late_ms"),
        F.max("late_ms").alias("max_late_ms"),
    )


OUT_OF_ORDER_STATS_ORACLE = """
WITH ev AS (
    SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
),
late AS (
    SELECT greatest(0, coalesce(max(ms) OVER (
               PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), ms) - ms)
           AS late_ms
    FROM ev
)
SELECT CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_late,
       round(sum(CASE WHEN late_ms > 0 THEN 1 ELSE 0 END) / count(*), 6)
           AS late_frac,
       round(quantile_cont(late_ms, 0.5), 3) AS p50_late_ms,
       round(quantile_cont(late_ms, 0.95), 3) AS p95_late_ms,
       round(quantile_cont(late_ms, 0.99), 3) AS p99_late_ms,
       max(late_ms) AS max_late_ms
FROM late
"""
