"""asof_join operator semantics: inclusive match, no-match nulls,
same-ts right dedup via tie_break."""

from __future__ import annotations

from kafka_flink_harshevents_spark.operators.joins import asof_join


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("u1", 100, "e1"), ("u1", 205, "e2"), ("u2", 50, "e3"), ("u3", 10, "e4")],
        ["k", "t", "eid"],
    )
    right = spark.createDataFrame(
        [
            ("u1", 100, 1, 10.0),  # equal ts -> inclusive match for e1
            ("u1", 200, 2, 20.0),
            ("u1", 200, 3, 30.0),  # same (k, ts): tie_break picks rid=3
            ("u1", 300, 4, 40.0),  # after every left row
            ("u2", 40, 5, 50.0),
        ],
        ["k", "rt", "rid", "amount"],
    )
    out = asof_join(
        left,
        right,
        on="k",
        left_ts="t",
        right_ts="rt",
        payload_cols=["rid", "amount"],
        tie_break="rid",
    )
    rows = {r["eid"]: (r["rid"], r["amount"]) for r in out.collect()}
    assert rows == {
        "e1": (1, 10.0),  # inclusive at equal ts
        "e2": (3, 30.0),  # latest <= 205 is ts=200, tie broken to rid 3
        "e3": (5, 50.0),
        "e4": (None, None),  # u3 has no right rows at all
    }
    assert out.count() == left.count()  # exactly one output row per left row
