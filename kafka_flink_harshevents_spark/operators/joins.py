"""Join operators Spark lacks natively: as-of join, salted skew join.

``asof_join(left, right, ...)`` attaches, to every left row, the columns
of the *latest* right row with ``right_ts <= left_ts`` for the same key
(the classic enrich-events-with-most-recent-dimension-state pattern;
DuckDB/kdb call it ASOF JOIN).

Implementation is the union-sort trick, NOT a range join:

    union(left, right) → window by key ordered by (ts, side) →
    last(right payload, ignorenulls) → keep left rows

so the cost is ONE shuffle on the key and a linear scan per partition —
no (left × matching-right-rows) intermediate blowup, which is what makes
it survive 100 TB with many right rows per key. Right rows sort before
left rows at equal timestamps (inclusive match).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tie_break: str | None = None,
    tolerance: int | None = None,
) -> DataFrame:
    """Left as-of join.

    ``payload_cols`` — right columns to attach (null when no right row is
    at-or-before the left timestamp). ``tie_break`` — right column that
    picks a deterministic winner among right rows sharing (key, ts);
    highest wins. ``tolerance`` — pandas ``merge_asof`` parity: a match
    older than ``tolerance`` (in the ts columns' own units) is discarded,
    i.e. only right rows in ``[left_ts - tolerance, left_ts]`` attach.
    Same single union-sort plan either way — the bound is a post-carry
    predicate, not an extra join.
    """
    # deduplicate right to one row per (key, ts) so the result is unique
    if tie_break is not None:
        w_dedup = Window.partitionBy(on, right_ts).orderBy(F.col(tie_break).desc())
        right = (
            right.withColumn("_rdup", F.row_number().over(w_dedup))
            .filter(F.col("_rdup") == 1)
            .drop("_rdup")
        )

    l_tagged = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1).alias("_side"),
        F.struct(*left.columns).alias("_l"),
        F.lit(None).cast(
            right.select(F.struct(*payload_cols).alias("s")).schema["s"].dataType
        ).alias("_r"),
    )
    r_tagged = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_t"),
        F.lit(0).alias("_side"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("_l"),
        F.struct(*payload_cols).alias("_r"),
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right (side=0) sorts before left (side=1) at equal ts → inclusive
    w = (
        Window.partitionBy("_k")
        .orderBy("_t", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_match", F.last("_r", ignorenulls=True).over(w))
    if tolerance is not None:
        carried = carried.withColumn(
            "_match_ts",
            F.last(
                F.when(F.col("_side") == 0, F.col("_t")), ignorenulls=True
            ).over(w),
        ).withColumn(
            "_match",
            F.when(
                F.col("_t") - F.col("_match_ts") <= F.lit(tolerance), F.col("_match")
            ),
        )
    return (
        carried.filter(F.col("_side") == 1)
        .select("_l.*", *[F.col(f"_match.{c}").alias(c) for c in payload_cols])
    )


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
) -> DataFrame:
    """Equi-join that survives a pathologically skewed LEFT key.

    AQE's skew-join split only fires on sort-merge joins and only when a
    partition exceeds ``skewJoinThreshold`` at runtime; when a single hot
    key dominates (one device spamming telemetry, one doc shingle in 40%
    of the corpus) an explicit salt is the predictable fix:

        left:  key → (key, salt_i)  with salt_i = hash(payload) % salt
        right: key → (key, 0..salt-1)   (replicated ``salt`` ×)

    The hot key's rows now spread over ``salt`` reducers instead of one.
    Cost: the right side is replicated ``salt``× through its shuffle, so
    use this when right ≪ left (dimension-ish) but too big / too skewed
    to broadcast outright. Supports ``inner`` and ``left`` joins (the
    semantics replication preserves verbatim).

    The salt is derived from a hash of the left row's payload — not
    ``F.rand``, which is partition-layout-dependent and desynchronizes
    under retries (see sources/synthetic.py::_u for the same rule).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    payload = [c for c in left.columns if c not in keys] or keys
    l_salted = left.withColumn(
        "_salt", F.pmod(F.xxhash64(*payload), F.lit(salt)).cast("int")
    )
    r_salted = right.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    cond = [l_salted[k] == r_salted[k] for k in keys] + [
        l_salted["_salt"] == r_salted["_salt"]
    ]
    joined = l_salted.join(r_salted, cond, how)
    keep = [l_salted[c] for c in left.columns] + [
        r_salted[c] for c in right.columns if c not in keys
    ]
    return joined.select(*keep)


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_val: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Point-in-interval join ([lo, hi) match) without the theta-join
    blowup.

    Naive ``l.val >= r.lo AND l.val < r.hi`` plans as a
    BroadcastNestedLoopJoin — every left row tested against every
    interval, O(|L|·|R|). Bucket decomposition turns it into an
    equi-join: each interval explodes into the fixed-width buckets it
    covers, each point computes its bucket, the join runs on the bucket
    key, and the exact range predicate filters the residual. Cost is
    O(|L| · avg-intervals-overlapping-a-bucket) — linear when intervals
    are short relative to ``bucket_width``.

    Pick ``bucket_width`` near the median interval length: too small
    replicates intervals across many buckets, too large packs many
    intervals per bucket and pushes work into the residual filter.
    Overlapping intervals are supported (a point matches every interval
    containing it).
    """
    if how not in ("inner", "left", "left_outer"):
        raise ValueError(f"range_join supports inner/left, got {how!r}")
    w = float(bucket_width)
    r_bucketed = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / w).cast("long"),
                F.floor(F.col(right_hi) / w).cast("long"),
            )
        ),
    )
    l_bucketed = left.withColumn(
        "_bkt", F.floor(F.col(left_val) / w).cast("long")
    )
    cond = (
        (l_bucketed["_bkt"] == r_bucketed["_bkt"])
        & (l_bucketed[left_val] >= r_bucketed[right_lo])
        & (l_bucketed[left_val] < r_bucketed[right_hi])
    )
    joined = l_bucketed.join(r_bucketed, cond, how)
    keep = [l_bucketed[c] for c in left.columns] + [
        r_bucketed[c] for c in right.columns
    ]
    return joined.select(*keep)


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_lo: str,
    left_hi: str,
    right_lo: str,
    right_hi: str,
    bucket_width: float,
) -> DataFrame:
    """Interval × interval OVERLAP join (``l.lo < r.hi AND r.lo < l.hi``,
    half-open semantics) without the theta-join blowup — the missing
    family next to :func:`asof_join` (nearest-at-or-before) and
    :func:`range_join` (point-in-interval); Flink ships it as the
    interval join, SQL engines as ``a OVERLAPS b``.

    Both sides explode into the fixed-width buckets they cover and the
    join runs on the bucket key with the exact overlap predicate as the
    residual. An overlapping pair shares EVERY bucket in the
    intersection of its spans, so instead of a post-join ``distinct``
    (a second full shuffle of the pair stream) each pair is kept only
    in its CANONICAL bucket — the later of the two start buckets:
    ``_bkt == greatest(floor(l.lo/w), floor(r.lo/w))``. That bucket is
    always inside both spans for a genuinely overlapping pair, so
    recall is exact and each pair survives exactly once — dedup as a
    row-local predicate, zero extra shuffle.

    Cost: O(avg-span/width) replication per row + one equi-join whose
    width ∝ co-bucketed interval pairs. Pick ``bucket_width`` near the
    typical interval length, as with :func:`range_join`.
    """
    w = float(bucket_width)
    r_b = right.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(right_lo) / w).cast("long"),
                F.floor(F.col(right_hi) / w).cast("long"),
            )
        ),
    )
    l_b = left.withColumn(
        "_bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(left_lo) / w).cast("long"),
                F.floor(F.col(left_hi) / w).cast("long"),
            )
        ),
    )
    canonical = F.greatest(
        F.floor(l_b[left_lo] / w).cast("long"),
        F.floor(r_b[right_lo] / w).cast("long"),
    )
    cond = (
        (l_b["_bkt"] == r_b["_bkt"])
        & (l_b[left_lo] < r_b[right_hi])
        & (r_b[right_lo] < l_b[left_hi])
        & (l_b["_bkt"] == canonical)
    )
    joined = l_b.join(r_b, cond, "inner")
    keep = [l_b[c] for c in left.columns] + [r_b[c] for c in right.columns]
    return joined.select(*keep)
