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


def test_salted_join_matches_plain_join(spark):
    """Salted inner/left joins are row-for-row identical to the plain
    join on a deliberately skewed key (90% of left rows on one key)."""
    from kafka_flink_harshevents_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [("hot", i, f"p{i}") for i in range(900)]
        + [(f"k{i}", i, f"q{i}") for i in range(100)]
        + [("orphan", -1, "no-right-match")],
        ["k", "seq", "payload"],
    )
    right = spark.createDataFrame(
        [("hot", "dim-hot"), ("k3", "dim-3"), ("k7", "dim-7"), ("unused", "dim-u")],
        ["k", "dim"],
    )

    def key(rows):
        return sorted(map(tuple, rows))

    for how in ("inner", "left"):
        plain = left.join(right, "k", how).select("k", "seq", "payload", "dim")
        salted = salted_join(left, right, on="k", how=how, salt=8)
        assert key(salted.collect()) == key(plain.collect()), how


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows land on multiple salt values (the whole point)."""
    from pyspark.sql import functions as F
    from kafka_flink_harshevents_spark.operators.joins import salted_join

    left = spark.createDataFrame(
        [("hot", i) for i in range(512)], ["k", "seq"]
    )
    right = spark.createDataFrame([("hot", "d")], ["k", "dim"])
    out = salted_join(left, right, on="k", salt=8)
    assert out.count() == 512
    n_salts = (
        left.withColumn("_s", F.pmod(F.xxhash64("seq"), F.lit(8)))
        .select("_s").distinct().count()
    )
    assert n_salts >= 6  # 512 hashed payloads cover nearly all 8 buckets


def test_range_join_semantics(spark):
    """[lo, hi) match, overlapping intervals multi-match, boundary
    exclusivity, left-outer null fill — identical to the naive theta
    join it replaces."""
    from kafka_flink_harshevents_spark.operators.joins import range_join

    points = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 15.0), (4, 99.0), (5, -3.0)], ["pid", "v"]
    )
    iv = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 5.0, 20.0), ("c", -10.0, 0.0)],
        ["label", "lo", "hi"],
    )
    out = range_join(points, iv, "v", "lo", "hi", bucket_width=4.0)
    got = sorted((r["pid"], r["label"]) for r in out.collect())
    # v=10 is excluded from [0,10) but included in [5,20); v=99 matches nothing
    assert got == [(1, "a"), (1, "b"), (2, "b"), (3, "b"), (5, "c")]

    naive = points.join(iv, (points["v"] >= iv["lo"]) & (points["v"] < iv["hi"]))
    assert got == sorted((r["pid"], r["label"]) for r in naive.collect())

    left = range_join(points, iv, "v", "lo", "hi", bucket_width=4.0, how="left")
    by_pid = {}
    for r in left.collect():
        by_pid.setdefault(r["pid"], []).append(r["label"])
    assert by_pid[4] == [None]  # unmatched point survives with null payload
    assert sorted(by_pid[1]) == ["a", "b"]


def test_bucketed_join_eliminates_shuffle(spark, tmp_path):
    """Co-located (bucketed) joins — the 100 TB answer to repeatedly
    joining the same fact tables: both sides bucketed by the join key
    sort-merge-join with NO Exchange in the plan, while the plain
    parquet join of the same data must shuffle both sides."""
    import uuid
    from pyspark.sql import functions as F

    n = 1000
    left = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("lv")
    )
    right = spark.range(n).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("rv")
    )
    ta, tb = f"bl_{uuid.uuid4().hex[:8]}", f"br_{uuid.uuid4().hex[:8]}"
    left.write.bucketBy(8, "k").sortBy("k").option(
        "path", str(tmp_path / ta)
    ).saveAsTable(ta)
    right.write.bucketBy(8, "k").sortBy("k").option(
        "path", str(tmp_path / tb)
    ).saveAsTable(tb)
    try:
        # disable broadcast so the co-location (not size) decides the plan
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        bucketed = spark.table(ta).join(spark.table(tb), "k")
        plan = bucketed._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert bucketed.count() == n

        plain = left.join(right, "k")
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" in plain_plan
        assert plain.count() == n
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql(f"DROP TABLE IF EXISTS {ta}")
        spark.sql(f"DROP TABLE IF EXISTS {tb}")


def test_asof_join_tolerance(spark):
    """pandas merge_asof parity: with a tolerance, matches older than
    the bound detach (payload nulls), matches inside it survive, and
    the no-tolerance behavior is unchanged."""
    left = spark.createDataFrame(
        [("k1", 100), ("k1", 200), ("k2", 50)], ["k", "lt"]
    )
    right = spark.createDataFrame(
        [("k1", 95, "a"), ("k1", 110, "b"), ("k2", 10, "c")], ["k", "rt", "pl"]
    )
    out = {
        (r["k"], r["lt"]): r["pl"]
        for r in asof_join(
            left, right, "k", "lt", "rt", ["pl"], tolerance=30
        ).collect()
    }
    # k1@100: match rt=95 (gap 5 <= 30) -> 'a'
    # k1@200: latest rt=110 but gap 90 > 30 -> null
    # k2@50: rt=10, gap 40 > 30 -> null
    assert out == {("k1", 100): "a", ("k1", 200): None, ("k2", 50): None}
    no_tol = {
        (r["k"], r["lt"]): r["pl"]
        for r in asof_join(left, right, "k", "lt", "rt", ["pl"]).collect()
    }
    assert no_tol == {("k1", 100): "a", ("k1", 200): "b", ("k2", 50): "c"}


def test_interval_overlap_join_matches_naive(spark):
    """The bucketed interval-overlap join equals the naive theta join on
    an adversarial interval zoo — zero-length-ish, bucket-straddling,
    nested, identical, disjoint-but-bucket-sharing and far-apart
    pairs — and every pair appears EXACTLY once (the canonical-bucket
    dedup predicate, not a distinct)."""
    from kafka_flink_harshevents_spark.operators.joins import (
        interval_overlap_join,
    )

    # deterministic pseudo-random intervals spanning many buckets
    lrows = []
    for i in range(60):
        lo = (i * 37) % 500
        lrows.append((i, lo, lo + 1 + (i * 13) % 90))
    rrows = []
    for j in range(40):
        lo = (j * 53) % 480
        rrows.append((j, lo, lo + 1 + (j * 29) % 120))
    # hand-picked edges: unit interval, exact-boundary touch, full nest
    lrows += [(100, 10, 11), (101, 0, 1000), (102, 200, 210)]
    rrows += [(200, 11, 12), (201, 205, 206), (202, 999, 1400)]
    left = spark.createDataFrame(lrows, ["lid", "l_lo", "l_hi"])
    right = spark.createDataFrame(rrows, ["rid", "r_lo", "r_hi"])

    for width in (7.0, 50.0, 1000.0):
        got = [
            (r["lid"], r["rid"])
            for r in interval_overlap_join(
                left, right, "l_lo", "l_hi", "r_lo", "r_hi", width
            ).collect()
        ]
        want = {
            (li, ri)
            for (li, llo, lhi) in lrows
            for (ri, rlo, rhi) in rrows
            if llo < rhi and rlo < lhi
        }
        assert set(got) == want, f"width={width}"
        assert len(got) == len(want), f"width={width}: duplicates emitted"
    # half-open semantics: touching intervals [10,11) and [11,12) do NOT join
    assert (100, 200) not in want
    # sanity: the zoo is non-trivial
    assert len(want) > 100
