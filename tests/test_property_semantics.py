"""Property-based semantics checks for the custom relational
primitives: the Spark implementations must agree with an independent
pandas reference on ARBITRARY generated inputs, not just the fixture
tables. (Hypothesis drives the generation; the DuckDB oracle gate
covers the fixture shapes.)"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from kafka_streams_repartition_spark.operators.relational import asof_join_events
from kafka_streams_repartition_spark.sources.ktable import latest_per_key

_SETTINGS = dict(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.too_slow]
)

# events rows: (event_id, user_id, event_type, ms). Tiny key/time domains
# force collisions: equal timestamps, multiple signups per user, users
# with no signup at all.
_EVENT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**6),  # event_id
        st.integers(min_value=1, max_value=4),  # user_id
        st.sampled_from(["signup", "click", "view"]),
        st.integers(min_value=0, max_value=9),  # ms
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[0],  # event ids unique, everything else collides
)


def _asof_reference(rows: list[tuple]) -> dict[int, tuple]:
    """Independent per-event scan: most recent signup at-or-before,
    max event_id winning among equal-timestamp signups."""
    signups = {}
    for eid, uid, typ, ms in rows:
        if typ == "signup":
            key = (uid, ms)
            signups[key] = max(signups.get(key, 0), eid)
    out = {}
    for eid, uid, typ, ms in rows:
        if typ == "signup":
            continue
        best = None  # (ms, signup_event_id)
        for (suid, sms), sid in signups.items():
            if suid == uid and sms <= ms and (best is None or sms > best[0]):
                best = (sms, sid)
        out[eid] = (uid, best[1] if best else None, ms - best[0] if best else None)
    return out


def test_asof_join_matches_reference_scan(spark):
    @settings(**_SETTINGS)
    @given(rows=_EVENT_ROWS)
    def check(rows):
        df = spark.createDataFrame(
            [(eid, uid, typ, ms) for eid, uid, typ, ms in rows],
            "event_id long, user_id long, event_type string, ms long",
        ).withColumn("ts", F.timestamp_millis("ms")).drop("ms")
        got = {
            r["event_id"]: (r["user_id"], r["signup_event_id"], r["ms_since_signup"])
            for r in asof_join_events({"events": df}).collect()
        }
        assert got == _asof_reference(rows)

    check()


def test_asof_join_matches_pandas_merge_asof(spark):
    """Cross-check against pandas' own asof join on inputs without the
    tie/dup edge cases merge_asof leaves unspecified (unique signup
    timestamps per user)."""

    @settings(**_SETTINGS)
    @given(rows=_EVENT_ROWS)
    def check(rows):
        seen = set()
        cleaned = []
        for eid, uid, typ, ms in rows:
            if typ == "signup":
                if (uid, ms) in seen:
                    continue
                seen.add((uid, ms))
            cleaned.append((eid, uid, typ, ms))
        left = pd.DataFrame(
            [(e, u, m) for e, u, t, m in cleaned if t != "signup"],
            columns=["event_id", "user_id", "ms"],
        ).sort_values("ms", kind="stable")
        right = pd.DataFrame(
            [(e, u, m) for e, u, t, m in cleaned if t == "signup"],
            columns=["signup_event_id", "user_id", "sms"],
        ).sort_values("sms", kind="stable")
        if left.empty or right.empty:
            return
        ref = pd.merge_asof(
            left,
            right,
            left_on="ms",
            right_on="sms",
            by="user_id",
            direction="backward",
        )
        want = {
            int(r.event_id): (
                None if pd.isna(r.signup_event_id) else int(r.signup_event_id)
            )
            for r in ref.itertuples()
        }
        df = spark.createDataFrame(
            cleaned, "event_id long, user_id long, event_type string, ms long"
        ).withColumn("ts", F.timestamp_millis("ms")).drop("ms")
        got = {
            r["event_id"]: r["signup_event_id"]
            for r in asof_join_events({"events": df}).collect()
        }
        assert got == want

    check()


def test_latest_per_key_matches_pandas(spark):
    """latest_per_key == pandas sort + groupby.last, tombstones applied
    afterward, for arbitrary (key, version, value) rows."""
    rows_strategy = st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),  # key
            st.integers(min_value=0, max_value=10**4),  # version
            st.one_of(st.none(), st.text(alphabet="xyz", max_size=2)),
        ),
        min_size=1,
        max_size=30,
        unique_by=lambda r: (r[0], r[1]),  # total order within key
    )

    @settings(**_SETTINGS)
    @given(rows=rows_strategy)
    def check(rows):
        pdf = pd.DataFrame(rows, columns=["k", "ver", "v"])
        # literal last ROW per key (groupby.last() would skip nulls and
        # break tombstone semantics)
        last = pdf.sort_values(["k", "ver"], kind="stable").drop_duplicates(
            subset="k", keep="last"
        )
        want = {
            int(r.k): r.v for r in last.itertuples() if r.v is not None
        }
        df = spark.createDataFrame(rows, "k long, ver long, v string")
        got = {
            r["k"]: r["v"]
            for r in latest_per_key(df, ["k"], ["ver"], tombstone_col="v").collect()
        }
        assert got == want

    check()
