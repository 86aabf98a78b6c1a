"""As-of (point-in-time) join — an operator Spark lacks natively.

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
) -> DataFrame:
    """Left as-of join.

    ``payload_cols`` — right columns to attach (null when no right row is
    at-or-before the left timestamp). ``tie_break`` — right column that
    picks a deterministic winner among right rows sharing (key, ts);
    highest wins.
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
    return (
        carried.filter(F.col("_side") == 1)
        .select("_l.*", *[F.col(f"_match.{c}").alias(c) for c in payload_cols])
    )
