"""Property-based checks (SURVEY.md §5.2-4) with hypothesis: arbitrary
payloads through the derive path and arbitrary event streams through
batch sessionization must uphold the reference's invariants.

Each example builds a whole batch (one DataFrame per example, bounded
example count) so JVM round-trips stay tolerable.
"""

from __future__ import annotations

import pytest

import json

from hypothesis import HealthCheck, given, settings, strategies as st

from kafka_flink_harshevents_spark.operators.sessions import sessionize_batch
from kafka_flink_harshevents_spark.operators.violations import (
    ALLOWED_VIOLATION_TYPES,
    device_status_from_telemetry,
    violations_from_telemetry,
)
from kafka_flink_harshevents_spark.functions.json_lenient import parse_telemetry

_SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)

# -- arbitrary telemetry payloads ------------------------------------------

_vio_element = st.fixed_dictionaries(
    {},
    optional={
        "type": st.sampled_from(
            ["harsh_brake", "harsh_accel", "speeding", "tailgating", "", "HARSH_BRAKE"]
        ),
        "timestamp": st.integers(min_value=-5, max_value=2_000_000_000),
        "accel_y": st.floats(-10, 10, allow_nan=False),
        "speed_kph": st.floats(0, 200, allow_nan=False),
        "delta_speed": st.floats(-50, 50, allow_nan=False),
    },
)

_payload = st.fixed_dictionaries(
    {},
    optional={
        "device_uuid": st.sampled_from(["d1", "d2", "", None]),
        "timestamp": st.integers(min_value=-5, max_value=2_000_000_000),
        "violations": st.lists(_vio_element, max_size=4),
        "dashcam_power_source": st.sampled_from(
            ["battery", "BATTERY", "Battery", "cable", "", None]
        ),
        "mqtt_sent_at_ms": st.integers(min_value=0, max_value=2 * 10**12),
        "junk_field": st.text(max_size=8),
    },
)


@given(st.lists(_payload, max_size=12))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_derive_path_invariants(spark, payloads):
    """For ANY payload batch: every emitted violation's type is in the
    allowlist; event timestamp follows the coalesce rule (element ts when
    > 0 else payload ts, defaulting 0); details carry exactly the three
    fields; every status touch is battery-powered with timestamp > 0."""
    raw = spark.createDataFrame(
        [(json.dumps(p),) for p in payloads] or [("",)], ["value"]
    )
    telemetry = parse_telemetry(raw)

    vio = violations_from_telemetry(telemetry).collect()
    for r in vio:
        assert r["violation_type"] in ALLOWED_VIOLATION_TYPES
        assert set(r["details"].asDict()) == {"accel_y", "speed_kph", "delta_speed"}

    # P4 coalesce exactly as the reference computes it (vts > 0 ? vts :
    # payload ts), with absent modeled as null (Jackson's 0 equivalent —
    # every downstream guard treats them identically, json_lenient.py)
    expected = []
    for p in payloads:
        pts = p.get("timestamp")  # may be None or negative — carried as-is
        for v in p.get("violations") or []:
            if isinstance(v, dict) and v.get("type") in ALLOWED_VIOLATION_TYPES:
                vts = v.get("timestamp")
                expected.append(
                    (v["type"], vts if (vts is not None and vts > 0) else pts)
                )
    none_last = lambda t: (t[0], t[1] is not None, t[1] or 0)
    got = sorted(((r["violation_type"], r["timestamp"]) for r in vio), key=none_last)
    assert got == sorted(expected, key=none_last)

    # F2 gate is the Java null-check, NOT truthiness: empty-string uuid
    # passes here (the CONSUMER's truthiness validation drops it later —
    # streaming/consumer.py reproduces that stage separately)
    status = device_status_from_telemetry(telemetry).collect()
    for r in status:
        assert r["status_type"] == "cable-unplugged" and r["action"] == "touch"
        assert r["device_uuid"] is not None
        assert r["timestamp"] > 0
    n_battery = sum(
        1
        for p in payloads
        if (p.get("dashcam_power_source") or "").lower() == "battery"
        and p.get("device_uuid") is not None
        and (p.get("timestamp") or 0) > 0
    )
    assert len(status) == n_battery


# -- arbitrary event streams through sessionization ------------------------

_events = st.lists(
    st.tuples(
        st.sampled_from(["d1", "d2", "d3"]),
        st.integers(min_value=0, max_value=5_000),
    ),
    min_size=1,
    max_size=40,
)


@given(_events, st.sampled_from([100, 300]))
@settings(**_SETTINGS)
def test_sessionize_invariants(spark, events, gap):
    """For ANY event stream: start <= end; session touch counts sum to
    the input count per key; sessions of one key are disjoint and
    separated by more than the gap; every intra-session step <= gap."""
    df = spark.createDataFrame(events, ["k", "ts"])
    out = sessionize_batch(df, key_col="k", ts_col="ts", gap=gap).collect()

    per_key_in: dict[str, list[int]] = {}
    for k, ts in events:
        per_key_in.setdefault(k, []).append(ts)

    per_key_sessions: dict[str, list] = {}
    for r in out:
        assert r["start_timestamp"] <= r["end_timestamp"]
        per_key_sessions.setdefault(r["k"], []).append(r)

    assert set(per_key_sessions) == set(per_key_in)
    for k, sessions in per_key_sessions.items():
        sessions.sort(key=lambda r: r["start_timestamp"])
        assert sum(s["n_touches"] for s in sessions) == len(per_key_in[k])
        for a, b in zip(sessions, sessions[1:]):
            assert b["start_timestamp"] - a["end_timestamp"] > gap  # true session break
        # replay the gap rule on the sorted input: boundaries must match
        ts_sorted = sorted(per_key_in[k])
        starts = [ts_sorted[0]] + [
            b for a, b in zip(ts_sorted, ts_sorted[1:]) if b - a > gap
        ]
        assert sorted(s["start_timestamp"] for s in sessions) == starts


# -- CEP pattern match vs brute force --------------------------------------

_cep_event = st.tuples(
    st.integers(min_value=0, max_value=3),      # user_id
    st.sampled_from(["click", "purchase", "view"]),
    st.integers(min_value=0, max_value=5_000),  # tms
)


@given(st.lists(_cep_event, min_size=0, max_size=40))
@settings(**_SETTINGS)
def test_pattern_match_equals_brute_force(spark, events):
    """For arbitrary event sets (including tms ties), the windowed CEP
    query must equal the brute-force definition: for each click, the min
    purchase tms among STRICTLY LATER rows in (tms, event_id) order,
    kept if within the window."""
    from kafka_flink_harshevents_spark.queries.analytics import (
        pattern_match_frame,
    )

    within = 1_000
    rows = [
        (user, eid, etype, tms)
        for eid, (user, etype, tms) in enumerate(events)
    ]
    expected = set()
    by_user: dict[int, list] = {}
    for user, eid, etype, tms in rows:
        by_user.setdefault(user, []).append((tms, eid, etype))
    for user, evs in by_user.items():
        evs.sort()
        for i, (tms, eid, etype) in enumerate(evs):
            if etype != "click":
                continue
            later_purchases = [t for t, _, ty in evs[i + 1 :] if ty == "purchase"]
            if later_purchases and min(later_purchases) <= tms + within:
                p = min(later_purchases)
                expected.add((user, eid, tms, p, p - tms))
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, event_type string, tms long"
    )
    got = {
        tuple(r)
        for r in pattern_match_frame(df, within_ms=within).collect()
    }
    assert got == expected


# -- streaming state machines, driven without a JVM ------------------------
# The LOCF and tombstone processors are pure Python over pandas batches;
# hypothesis drives them with arbitrary event sequences and batch splits
# and checks them against simple sequential references.


class _FakeGroupState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


@given(
    ts_vals=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=20 * 3_600_000),  # ts_ms
            st.floats(-100, 100, allow_nan=False),
        ),
        min_size=1,
        max_size=40,
    ),
    splits=st.lists(st.integers(min_value=1, max_value=39), max_size=4),
)
@settings(max_examples=60, deadline=None)
def test_locf_state_machine_properties(ts_vals, splits):
    """For ANY event sequence and ANY micro-batch split:
    1. the final grid (latest revision per hour) equals the sequential
       reference: max-ts pick per emitted hour, gaps carried forward;
    2. events accepted + n_late_dropped == events ingested;
    3. grid hours are contiguous from the first hour to the max emitted.
    """
    import pandas as pd

    from kafka_flink_harshevents_spark.streaming.locf import HOUR_MS, _locf_update

    # deterministic batch split points
    cuts = sorted({s for s in splits if s < len(ts_vals)})
    batches, prev = [], 0
    for c in cuts + [len(ts_vals)]:
        if c > prev:
            batches.append(ts_vals[prev:c])
            prev = c

    st_obj = _FakeGroupState()
    emitted = []
    for b in batches:
        out = list(
            _locf_update(
                (1,),
                iter([pd.DataFrame(b, columns=["ts_ms", "value"])]),
                st_obj,
            )
        )
        for pdf in out:
            emitted.extend(pdf.to_dict("records"))

    # sequential reference: same contract, one event at a time
    last_hr = last_val = last_ts = None
    ref_grid = {}
    dropped = 0
    accepted = 0
    # replay the BATCHED order exactly as the processor sees it: the
    # processor's sort_values("ts_ms") is STABLE, so ties keep arrival
    # order — sort by ts only (Python sort is stable too)
    for b in batches:
        for ts, val in sorted(b, key=lambda x: x[0]):
            hr = (ts // HOUR_MS) * HOUR_MS
            if last_hr is None:
                ref_grid[hr] = (val, ts); accepted += 1
                last_hr, last_val, last_ts = hr, val, ts
            elif hr == last_hr:
                if ts >= last_ts:
                    ref_grid[hr] = (val, ts); accepted += 1
                    last_val, last_ts = val, ts
                else:
                    dropped += 1
            elif hr > last_hr:
                g = last_hr + HOUR_MS
                while g < hr:
                    ref_grid.setdefault(g, (last_val, last_ts))
                    g += HOUR_MS
                ref_grid[hr] = (val, ts); accepted += 1
                last_hr, last_val, last_ts = hr, val, ts
            else:
                dropped += 1

    # latest revision per hour from the emitted update stream
    got_grid = {}
    n_observed = 0
    for r in emitted:
        hr = r["hour_ms"]
        if r["observed"]:
            n_observed += 1
        cur = got_grid.get(hr)
        if cur is None or r["src_ts_ms"] >= cur[1]:
            got_grid[hr] = (r["value_locf"], r["src_ts_ms"])
    assert got_grid == ref_grid
    assert n_observed == accepted
    assert st_obj.get[3] == dropped
    if got_grid:
        hours = sorted(got_grid)
        assert hours == list(range(hours[0], hours[-1] + HOUR_MS, HOUR_MS))


@given(
    actions=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=30),  # doc_id
            st.sampled_from(["seed", "ingest", "delete"]),
        ),
        min_size=1,
        max_size=30,
    ),
    splits=st.lists(st.integers(min_value=1, max_value=29), max_size=4),
)
@settings(max_examples=60, deadline=None)
def test_tombstone_state_machine_properties(actions, splits):
    """For ANY action sequence over one content hash and ANY batch
    split: (1) at most ONE delete verdict ever reports
    present_before=1 — audits can never double-count a propagation;
    (2) once any delete has been absorbed, every later-batch ingest
    reports tombstoned_before=1; (3) seeds emit nothing."""
    import pandas as pd

    from kafka_flink_harshevents_spark.streaming.dedup import _tombstone_check

    cuts = sorted({s for s in splits if s < len(actions)})
    batches, prev = [], 0
    for c in cuts + [len(actions)]:
        if c > prev:
            batches.append(actions[prev:c])
            prev = c

    st_obj = _FakeGroupState()
    rows = []
    deleted_before_batch = []
    tomb = False
    for b in batches:
        deleted_before_batch.append(tomb)
        out = list(
            _tombstone_check(
                ("fp-x",),
                iter([pd.DataFrame(b, columns=["doc_id", "action"])]),
                st_obj,
            )
        )
        for pdf in out:
            for r in pdf.to_dict("records"):
                r["batch_tomb_before"] = tomb
                rows.append(r)
        if any(a == "delete" for _, a in b):
            tomb = True

    assert all(r["action"] != "seed" for r in rows)
    deletes = [r for r in rows if r["action"] == "delete"]
    assert sum(r["present_before"] for r in deletes) <= 1
    # ingests in batches strictly after a delete was absorbed see the stone
    for r in rows:
        if r["action"] == "ingest" and r["batch_tomb_before"]:
            assert r["tombstoned_before"] == 1


# -- deterministic-aggregation helpers: cross-engine + partitioning ---------

_doubles = st.lists(
    st.floats(
        min_value=-1e6,
        max_value=1e6,
        allow_nan=False,
        allow_infinity=False,
        width=64,
    ),
    min_size=1,
    max_size=40,
)


@given(_doubles, st.integers(min_value=1, max_value=7))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_det_helpers_cross_engine_and_partitioning(spark, xs, parts):
    """The det_sum/det_avg/det_total trees (hi/lo long quantization,
    decimal recombination) must produce BIT-IDENTICAL emitted values
    (a) between Spark and DuckDB running the *_sql twins, and (b) under
    any partitioning of the input — the two properties every catalog
    oracle hash depends on."""
    import duckdb

    from kafka_flink_harshevents_spark.queries._util import (
        det_avg,
        det_avg_sql,
        det_sum,
        det_sum_sql,
        det_total,
        det_total_sql,
    )
    from pyspark.sql import functions as F

    rows = [(float(x),) for x in xs]

    def spark_vals(n_parts):
        df = spark.createDataFrame(rows, "v double").repartition(n_parts)
        r = df.agg(
            det_sum("v", 2).alias("s"),
            det_avg("v", 4).alias("a"),
            det_total("v", 6).cast("string").alias("t"),
        ).collect()[0]
        return (repr(r["s"]), repr(r["a"]), r["t"])

    one = spark_vals(1)
    many = spark_vals(parts)
    assert one == many  # partitioning-invariant, bit-exact

    con = duckdb.connect()
    con.execute("CREATE TABLE tt (v DOUBLE)")
    con.executemany("INSERT INTO tt VALUES (?)", rows)
    ds, da, dt = con.execute(
        f"SELECT {det_sum_sql('v', 2)}, {det_avg_sql('v', 4)}, "
        f"CAST({det_total_sql('v', 6)} AS VARCHAR) FROM tt"
    ).fetchone()
    assert (repr(float(ds)), repr(float(da)), str(dt)) == one
