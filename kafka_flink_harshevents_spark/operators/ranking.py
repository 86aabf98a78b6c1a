"""Distributed exact global ranking — the engine's replacement for
``Window.orderBy`` with no partition spec (which collapses the whole
table into ONE partition; Spark itself warns about it).

Used by the exact-percentile queries (the reference's inverse-CDF pick,
mqtt_publish.js:84-97) and by the vocabulary ranking of the PPJoin/
bitset near-dup operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

RANK_BUCKETS = 1024  # value-range buckets for the distributed exact rank


def with_exact_rank(df: DataFrame, value_col: str, id_col: str) -> DataFrame:
    """Attach the exact global 1-based rank ``rn`` by (value, id) and the
    total count ``n`` WITHOUT an unpartitioned Window:

    1. one scalar aggregate gives min/max/count (broadcast, 1 row);
    2. each row gets a deterministic value-range bucket — deterministic
       (pure function of the data) so re-evaluations of this subtree
       always agree, unlike repartitionByRange's sampled boundaries;
    3. per-bucket counts → prefix offsets via a tiny triangular self-join
       over ≤ RANK_BUCKETS rows (no Window at all on the small side);
    4. rn = row_number PARTITIONED BY bucket + bucket offset.

    Every shuffle is keyed (bucket); the plan survives any table size.
    Skew caveat: degenerate value distributions (all-equal) fall into one
    bucket — correctness holds via the id tie-break, only parallelism
    degrades, and that case is exactly a constant column."""
    mm = df.agg(
        F.min(value_col).alias("__vmin"),
        F.max(value_col).alias("__vmax"),
        F.count(F.lit(1)).alias("n"),
    )
    r = df.crossJoin(F.broadcast(mm))
    span = F.col("__vmax") - F.col("__vmin")
    bkt = (
        F.when(
            span > 0,
            F.least(
                F.lit(RANK_BUCKETS - 1),
                F.floor((F.col(value_col) - F.col("__vmin")) / span * RANK_BUCKETS),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    r = r.withColumn("__bkt", bkt)
    pc = r.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__pc"))
    offs = (
        pc.alias("x")
        .join(
            F.broadcast(pc.select(F.col("__bkt").alias("__b2"), F.col("__pc").alias("__pc2"))),
            F.col("__b2") < F.col("x.__bkt"),
            "left",
        )
        .groupBy(F.col("x.__bkt").alias("__bkt"))
        .agg(F.coalesce(F.sum("__pc2"), F.lit(0)).cast("long").alias("__off"))
    )
    w = Window.partitionBy("__bkt").orderBy(value_col, id_col)
    return (
        r.join(F.broadcast(offs), "__bkt")
        .withColumn("rn", F.row_number().over(w).cast("long") + F.col("__off"))
        .drop("__bkt", "__off", "__vmin", "__vmax")
    )


def with_exact_rank_grouped(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """Per-group exact rank ``rn`` and group count ``n`` — the grouped
    twin of ``with_exact_rank``, for when the group key's cardinality is
    far below the data size (an enum column): ``Window.partitionBy(group)``
    alone would concentrate each group into ONE partition (5 groups at
    100 TB = 20 TB partitions), so ranks are computed per
    (group, value-range-bucket) instead — every shuffle keys on the
    composite, parallelism ∝ groups × buckets.
    """
    mm = df.groupBy(group_col).agg(
        F.min(value_col).alias("__vmin"),
        F.max(value_col).alias("__vmax"),
        F.count(F.lit(1)).alias("n"),
    )
    r = df.join(F.broadcast(mm), group_col)
    span = F.col("__vmax") - F.col("__vmin")
    bkt = (
        F.when(
            span > 0,
            F.least(
                F.lit(RANK_BUCKETS - 1),
                F.floor((F.col(value_col) - F.col("__vmin")) / span * RANK_BUCKETS),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    r = r.withColumn("__bkt", bkt)
    pc = r.groupBy(group_col, "__bkt").agg(F.count(F.lit(1)).alias("__pc"))
    offs = (
        pc.alias("x")
        .join(
            F.broadcast(
                pc.select(
                    F.col(group_col).alias("__g2"),
                    F.col("__bkt").alias("__b2"),
                    F.col("__pc").alias("__pc2"),
                )
            ),
            (F.col("__g2") == F.col(f"x.{group_col}"))
            & (F.col("__b2") < F.col("x.__bkt")),
            "left",
        )
        .groupBy(F.col(f"x.{group_col}").alias(group_col), F.col("x.__bkt").alias("__bkt"))
        .agg(F.coalesce(F.sum("__pc2"), F.lit(0)).cast("long").alias("__off"))
    )
    w = Window.partitionBy(group_col, "__bkt").orderBy(value_col, id_col)
    return (
        r.join(F.broadcast(offs), [group_col, "__bkt"])
        .withColumn("rn", F.row_number().over(w).cast("long") + F.col("__off"))
        .drop("__bkt", "__off", "__vmin", "__vmax")
    )
