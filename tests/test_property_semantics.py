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


# --- winnowing fingerprints vs an independent reference ---------------------

_DOC_TEXTS = st.lists(
    st.lists(
        st.sampled_from(["a", "b", "c"]), min_size=0, max_size=20
    ).map(" ".join),
    min_size=1,
    max_size=8,
)


def _winnow_ref(text: str) -> set[int]:
    """Pure-Python winnowing (Schleimer et al. 2003): same k, w, and
    md5-prefix hash as the Spark implementation, written independently."""
    import hashlib

    from kafka_streams_repartition_spark.operators.text_analysis import (
        WINNOW_K,
        WINNOW_W,
    )

    arr = text.split(" ")
    n = len(arr) - WINNOW_K + 1
    grams = [" ".join(arr[i : i + WINNOW_K]) for i in range(max(n, 0))]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:8], 16) for g in grams]
    ng = len(hs)
    sel: set[int] = set()
    for p in range(ng):
        if p >= min(WINNOW_W - 1, ng - 1):
            sel.add(min(hs[max(0, p - WINNOW_W + 1) : p + 1]))
    return sel


@given(texts=_DOC_TEXTS)
@settings(**_SETTINGS)
def test_winnow_fingerprints_match_reference(spark, texts):
    import hashlib

    from kafka_streams_repartition_spark.operators.text_analysis import (
        winnow_fingerprints,
    )

    docs = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_fp"], r["fp_md5"])
        for r in winnow_fingerprints({"documents": docs}).collect()
    }
    want = {}
    for i, t in enumerate(texts):
        sel = _winnow_ref(t)
        if sel:
            joined = ",".join(str(h) for h in sorted(sel))
            want[i] = (len(sel), hashlib.md5(joined.encode()).hexdigest())
    assert got == want


# --- skyline vs the quadratic dominance definition --------------------------

_POINTS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**6),  # part id
        st.integers(min_value=0, max_value=5),  # price (small domain: ties)
        st.integers(min_value=0, max_value=5),  # size
    ),
    min_size=1,
    max_size=30,
    unique_by=lambda r: r[0],
)


@given(points=_POINTS)
@settings(**_SETTINGS)
def test_skyline_matches_quadratic_definition(spark, points):
    from kafka_streams_repartition_spark.operators.analytics import skyline_parts

    df = spark.createDataFrame(
        [(pid, f"part{pid}", "B", "T", sz, float(pr)) for pid, pr, sz in points],
        "p_partkey long, p_name string, p_brand string, p_type string, "
        "p_size int, p_retailprice double",
    )
    got = {r["p_partkey"] for r in skyline_parts({"part": df}).collect()}
    want = {
        pid
        for pid, pr, sz in points
        if not any(
            (qp <= pr and qs <= sz and (qp < pr or qs < sz))
            for qid, qp, qs in points
            if qid != pid
        )
    }
    assert got == want


# --- LOCF gap fill vs an independent reference ------------------------------

_LOCF_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=0, max_value=4),  # day
        st.integers(min_value=0, max_value=10),  # value
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_LOCF_ROWS)
@settings(**_SETTINGS)
def test_daily_value_locf_matches_reference(spark, rows):
    from datetime import datetime, timezone
    from decimal import ROUND_HALF_UP, Decimal

    from kafka_streams_repartition_spark.operators.windows import daily_value_locf

    ev = spark.createDataFrame(
        [
            (
                i,
                datetime.fromtimestamp(d * 86400 + 3600, tz=timezone.utc),
                u,
                "click",
                float(v),
                "{}",
            )
            for i, (u, d, v) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {
        (r["user_id"], r["day"]): (r["observed"], r["filled"])
        for r in daily_value_locf({"events": ev}).collect()
    }

    def r4(x: float) -> float:
        return float(Decimal(str(x)).quantize(Decimal("0.0001"), ROUND_HALF_UP))

    days = [d for _, d, _ in rows]
    lo, hi = min(days), max(days)
    users = sorted({u for u, _, _ in rows})
    daily: dict[tuple[int, int], list[int]] = {}
    for u, d, v in rows:
        daily.setdefault((u, d), []).append(v)
    want = {}
    for u in users:
        carried = None
        for d in range(lo, hi + 1):
            vals = daily.get((u, d))
            if vals is not None:
                carried = r4(sum(vals) / len(vals))
                want[(u, d)] = (True, carried)
            else:
                want[(u, d)] = (False, carried)
    assert got == want


# --- first-touch attribution ----------------------------------------------

_ATTR_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**6),  # event_id
        st.integers(min_value=1, max_value=4),  # user_id
        st.sampled_from(["click", "purchase", "view"]),
        st.integers(min_value=0, max_value=9),  # ms (tiny: forces ties)
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[0],
)


def _attribution_reference(rows: list[tuple], window_ms: int) -> dict[int, tuple]:
    """Brute force: for each purchase, the click with max (ms, event_id)
    strictly earlier in (ms, event_id) order, within the window."""
    out = {}
    for pid, puid, ptyp, pms in rows:
        if ptyp != "purchase":
            continue
        best = None  # (ms, event_id)
        for cid, cuid, ctyp, cms in rows:
            if ctyp != "click" or cuid != puid:
                continue
            if (cms, cid) < (pms, pid) and (best is None or (cms, cid) > best):
                best = (cms, cid)
        if best is not None and pms - best[0] <= window_ms:
            out[pid] = (puid, best[1], pms - best[0])
    return out


def test_first_touch_attribution_matches_reference(spark):
    from kafka_streams_repartition_spark.operators.windows import (
        ATTRIBUTION_WINDOW_MS,
        first_touch_attribution,
    )

    @settings(**_SETTINGS)
    @given(rows=_ATTR_ROWS)
    def check(rows):
        df = spark.createDataFrame(
            rows,
            "event_id long, user_id long, event_type string, ms long",
        ).withColumn("ts", F.timestamp_millis("ms")).drop("ms")
        got = {
            r["purchase_event_id"]: (
                r["user_id"],
                r["click_event_id"],
                r["gap_ms"],
            )
            for r in first_touch_attribution({"events": df}).collect()
        }
        assert got == _attribution_reference(rows, ATTRIBUTION_WINDOW_MS)

    check()


# --- Q21 waiting suppliers -------------------------------------------------

_Q21_LINES = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # orderkey
        st.integers(min_value=1, max_value=4),  # suppkey
        st.booleans(),  # late?
    ),
    min_size=1,
    max_size=30,
)
_Q21_STATUS = st.lists(
    st.sampled_from(["F", "O", "P"]), min_size=5, max_size=5
)


def _q21_reference(lines, statuses):
    """Correlated EXISTS / NOT EXISTS, executed literally."""
    fset = {ok for ok, _, _ in lines if statuses[ok - 1] == "F"}
    pairs = {(ok, sk) for ok, sk, _ in lines if ok in fset}
    late = {(ok, sk) for ok, sk, is_late in lines if ok in fset and is_late}
    counts = {}
    for ok, sk in sorted(late):
        exists_other = any(o == ok and s != sk for o, s in pairs)
        other_late = any(o == ok and s != sk for o, s in late)
        if exists_other and not other_late:
            counts[sk] = counts.get(sk, 0) + 1
    return counts


def test_waiting_suppliers_matches_correlated_reference(spark):
    from kafka_streams_repartition_spark.operators.tpch import (
        Q21_LATE_DAYS,
        waiting_suppliers,
    )

    @settings(**_SETTINGS)
    @given(lines=_Q21_LINES, statuses=_Q21_STATUS)
    def check(lines, statuses):
        day_ms = 86_400_000
        base = 10 * day_ms
        lineitem = spark.createDataFrame(
            [
                (ok, sk, base + (Q21_LATE_DAYS + (1 if is_late else -1)) * day_ms)
                for ok, sk, is_late in lines
            ],
            "l_orderkey long, l_suppkey long, ship_ms long",
        ).withColumn("l_shipdate", F.timestamp_millis("ship_ms")).drop("ship_ms")
        orders = spark.createDataFrame(
            [(ok + 1, st_) for ok, st_ in enumerate(statuses)],
            "o_orderkey long, o_orderstatus string",
        ).withColumn("o_orderdate", F.timestamp_millis(F.lit(base)))
        supplier = spark.createDataFrame(
            [(sk, f"S#{sk}") for sk in range(1, 5)],
            "s_suppkey long, s_name string",
        )
        got = {
            int(r["s_name"].removeprefix("S#")): r["numwait"]
            for r in waiting_suppliers(
                {"lineitem": lineitem, "orders": orders, "supplier": supplier}
            ).collect()
        }
        assert got == _q21_reference(lines, statuses)

    check()


# --- MAD outliers ----------------------------------------------------------

_MAD_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**6),  # event_id
        st.integers(min_value=1, max_value=3),  # user_id
        st.integers(min_value=-50, max_value=50),  # value (ints: exact)
    ),
    min_size=1,
    max_size=40,
    unique_by=lambda r: r[0],
)


def _round_half_up(x: float, digits: int) -> float:
    """Spark/DuckDB double rounding: HALF_UP on the SHORTEST DECIMAL
    REPR of the double (BigDecimal.valueOf semantics) — e.g.
    round(10.1175, 3) = 10.118, where Python's round() yields 10.117
    from the binary value 10.11749999…."""
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal(1).scaleb(-digits)
    return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))


def _mad_reference(rows):
    import statistics

    from kafka_streams_repartition_spark.operators.analytics import (
        MAD_CONSISTENCY,
        MAD_THRESH,
    )

    by_user: dict[int, list[tuple[int, float]]] = {}
    for eid, uid, v in rows:
        by_user.setdefault(uid, []).append((eid, float(v)))
    out = {}
    for uid, evs in by_user.items():
        med = statistics.median([v for _, v in evs])
        mad = statistics.median([abs(v - med) for _, v in evs])
        if mad <= 0:
            continue
        for eid, v in evs:
            rz = _round_half_up(MAD_CONSISTENCY * (v - med) / mad, 3)
            if abs(rz) >= MAD_THRESH:
                out[eid] = (uid, v, rz)
    return out


def test_mad_outliers_matches_reference(spark):
    from kafka_streams_repartition_spark.operators.analytics import mad_outliers

    @settings(**_SETTINGS)
    @given(rows=_MAD_ROWS)
    def check(rows):
        df = spark.createDataFrame(
            [(eid, uid, float(v)) for eid, uid, v in rows],
            "event_id long, user_id long, value double",
        )
        got = {
            r["event_id"]: (r["user_id"], r["value"], r["rz"])
            for r in mad_outliers({"events": df}).collect()
        }
        assert got == _mad_reference(rows)

    check()


# --- cdc_apply: merge semantics vs an independent pure-Python replay -------

_SNAP_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=5),  # c_custkey (collides)
        st.integers(min_value=-400, max_value=400),  # acctbal quarters
    ),
    min_size=0,
    max_size=6,
    unique_by=lambda r: r[0],
)
# (o_orderkey, o_custkey, status, totalprice quarters, in_window)
_CDC_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=10**6),
        st.integers(min_value=1, max_value=8),  # keys beyond the snapshot
        st.sampled_from(["F", "O", "P"]),
        st.integers(min_value=0, max_value=4000),
        st.booleans(),
    ),
    min_size=0,
    max_size=40,
    unique_by=lambda r: r[0],
)


def _cdc_reference(snap, rows):
    """Independent replay of the merge contract: latest in-window op
    per key wins; delete removes, upsert replaces/inserts, untouched
    keys retain."""
    latest: dict[int, tuple] = {}
    for seq, key, status, price_q, in_window in rows:
        if not in_window:
            continue
        cur = latest.get(key)
        if cur is None or seq > cur[0]:
            op = "delete" if status == "F" else "upsert"
            latest[key] = (seq, op, price_q * 0.25)
    out = {}
    for key, bal_q in snap:
        if key in latest:
            _, op, value = latest[key]
            if op == "upsert":
                out[key] = (value, "upserted")
        else:
            out[key] = (bal_q * 0.25, "retained")
    for key, (_, op, value) in latest.items():
        if op == "upsert" and not any(k == key for k, _ in snap):
            out[key] = (value, "upserted")
    return out


def test_cdc_apply_matches_reference_replay(spark):
    from kafka_streams_repartition_spark.operators.relational import (
        CDC_SINCE,
        cdc_apply,
    )

    in_day = f"{CDC_SINCE[:3]}9-01-01"  # one year inside the window
    out_day = "1997-01-01"

    @settings(**_SETTINGS)
    @given(snap=_SNAP_ROWS, rows=_CDC_ROWS)
    def check(snap, rows):
        cust = spark.createDataFrame(
            [(k, q * 0.25) for k, q in snap] or [(None, None)],
            "c_custkey long, c_acctbal double",
        ).filter(F.col("c_custkey").isNotNull())
        orders = spark.createDataFrame(
            [
                (seq, key, status, q * 0.25, in_day if inw else out_day)
                for seq, key, status, q, inw in rows
            ]
            or [(None, None, None, None, None)],
            "o_orderkey long, o_custkey long, o_orderstatus string, "
            "o_totalprice double, d string",
        ).filter(F.col("o_orderkey").isNotNull()).select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            "o_totalprice",
            F.to_timestamp("d").alias("o_orderdate"),
        )
        got = {
            r["cust_key"]: (r["value"], r["src"])
            for r in cdc_apply({"customer": cust, "orders": orders}).collect()
        }
        assert got == _cdc_reference(snap, rows)

    check()


# --- UniMax water-fill -------------------------------------------------------

_SOURCE_TOKENS = st.lists(
    st.integers(min_value=1, max_value=400),  # tokens per source
    min_size=1,
    max_size=8,
)


@given(_SOURCE_TOKENS)
@settings(**_SETTINGS)
def test_token_budget_waterfill_property(spark, sizes):
    """On ARBITRARY source-size profiles the closed-form window
    allocation equals the sequential UniMax fill, exhausts the budget,
    and never exceeds the epoch cap."""
    from kafka_streams_repartition_spark.operators import selection as sel

    rows = [
        (i, " ".join(f"s{i}w{j}" for j in range(n)), f"src{i:02d}")
        for i, n in enumerate(sizes)
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, source string"
    )
    got = {
        r["source"]: r
        for r in sel.token_budget({"documents": docs}).collect()
    }
    avail = {f"src{i:02d}": n for i, n in enumerate(sizes)}
    budget = (sum(sizes) * sel.TB_BUDGET_FRAC_PCT) // 100
    order = sorted(avail, key=lambda s: (avail[s] * sel.TB_EPOCH_CAP, s))
    remaining, want = float(budget), {}
    for i, src in enumerate(order):
        share = remaining / (len(order) - i)
        want[src] = min(float(avail[src] * sel.TB_EPOCH_CAP), share)
        remaining -= want[src]
    assert set(got) == set(avail)
    for src in avail:
        assert abs(got[src]["alloc_tokens"] - want[src]) < 0.02, (src, sizes)
        assert got[src]["epochs"] <= sel.TB_EPOCH_CAP + 1e-9
    assert (
        abs(sum(r["alloc_tokens"] for r in got.values()) - budget)
        < 0.01 * len(avail) + 1e-9
    )


# --- int8 scalar quantization -------------------------------------------------

_SQ_SEED = st.integers(min_value=0, max_value=2**31 - 1)


@given(_SQ_SEED, st.integers(min_value=2, max_value=12))
@settings(**_SETTINGS)
def test_sq_codes_property(spark, seed, n_vecs):
    """On ARBITRARY 64-dim float corpora the per-vector error profile
    matches the numpy replica and every error is within half a
    quantization step of its dimension."""
    import numpy as np

    from kafka_streams_repartition_spark.operators import similarity as sim

    rng = np.random.default_rng(seed)
    X = rng.normal(scale=rng.uniform(0.01, 10.0), size=(n_vecs, sim.DIM))
    X = X.astype(np.float32)
    emb = spark.createDataFrame(
        [(i, X[i].tolist(), int(i % 3)) for i in range(n_vecs)],
        "vec_id long, embedding array<float>, label int",
    )
    got = {
        r["vec_id"]: r
        for r in sim.sq_codes({"embeddings": emb}).collect()
    }
    Xd = X.astype(np.float64)
    lo, hi = Xd.min(axis=0), Xd.max(axis=0)
    scale = np.where(hi == lo, 0.0, (hi - lo) / sim.SQ_LEVELS)
    safe = np.where(scale == 0.0, 1.0, scale)
    code = np.where(
        scale == 0.0, 0.0, np.clip(np.floor((Xd - lo) / safe + 0.5), 0, 255)
    )
    err = Xd - (lo + code * scale)
    assert set(got) == set(range(n_vecs))
    for i in range(n_vecs):
        assert abs(got[i]["mse"] - (err[i] ** 2).mean()) < 1e-9, (seed, i)
        assert abs(got[i]["max_abs_err"] - np.abs(err[i]).max()) < 1e-7
        assert got[i]["max_abs_err"] <= scale.max() / 2 + 1e-9
        assert got[i]["n_saturated"] == int(
            ((code[i] == 0) | (code[i] == 255)).sum()
        )


@given(texts=_DOC_TEXTS, seed=st.integers(0, 2**16))
@settings(**_SETTINGS)
def test_simhash64_codes_are_token_set_semantics(spark, texts, seed):
    """The 64-bit SimHash is a pure function of the DISTINCT token
    set: shuffling word order and duplicating words must leave every
    chunk unchanged (votes come from array_distinct'd tokens), and a
    doc with no tokens emits no code row — the properties the MIH
    index relies on when it treats a re-ordered repost as Hamming-0."""
    import random

    from kafka_streams_repartition_spark.operators import dedup as dd

    rng = random.Random(seed)
    scrambled = []
    for text in texts:
        toks = text.split()
        rng.shuffle(toks)
        toks = toks + [rng.choice(toks)] if toks else toks  # dup one
        scrambled.append(" ".join(toks))
    base = spark.createDataFrame(
        list(enumerate(texts)), "doc_id long, text string"
    )
    scr = spark.createDataFrame(
        list(enumerate(scrambled)), "doc_id long, text string"
    )
    a = {
        r["doc_id"]: (r["c0"], r["c1"], r["c2"], r["c3"])
        for r in dd._simhash64_codes(base).collect()
    }
    b = {
        r["doc_id"]: (r["c0"], r["c1"], r["c2"], r["c3"])
        for r in dd._simhash64_codes(scr).collect()
    }
    assert a == b
    empty = {i for i, t in enumerate(texts) if not t.split()}
    assert empty.isdisjoint(a)
