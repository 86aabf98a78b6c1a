"""Distributed exact global ranking — the engine's replacement for
``Window.orderBy`` with no partition spec (which collapses the whole
table into ONE partition; Spark itself warns about it).

Used by the exact-percentile queries (the reference's inverse-CDF pick,
mqtt_publish.js:84-97) and by the vocabulary ranking of the PPJoin/
bitset near-dup operators.

Pass structure (guide §1.2 — compute things once): the two bounded
summaries the rank needs (global/per-group min/max/count, then the
per-bucket counts) are COLLECTED — 1 row, then ≤ RANK_BUCKETS rows
(× groups for the grouped twin) — and the prefix offsets come back as
a literal local relation. The previous declarative spelling evaluated
the input FOUR times per call (the min/max aggregate, both sides of a
triangular prefix-sum self-join over the bucket counts, and the final
ranked pass); the collected form evaluates it exactly three times —
two bounded aggregate jobs plus the ranked pass — and the offset join
is a broadcast of driver-built rows that can never re-run the input
lineage. Bucket/offset/rank arithmetic is unchanged expression for
expression (literal operands instead of a 1-row cross join), so ranks
are bit-identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

RANK_BUCKETS = 1024  # value-range buckets for the distributed exact rank

# The grouped twin collects (group × bucket) count rows; its contract is
# enum-cardinality groups (the docstring below), but a guard keeps the
# driver safe if a caller ever violates it: above this many groups the
# original fully-distributed plan is built instead.
GROUPED_COLLECT_MAX_GROUPS = 1024


def _bucket_expr(value_col: str, vmin, vmax, vtype) -> F.Column:
    """The value-range bucket of ``value_col`` for collected bounds —
    the same expression the distributed form evaluates, with the 1-row
    min/max aggregate inlined as literals (same types, so the
    subtract/divide/floor chain is bit-identical)."""
    if vmin is None or vmax is None or not (vmax - vmin > 0):
        # empty input, all-null values, or a constant column: one bucket
        return F.lit(0).cast("long")
    lo = F.lit(vmin).cast(vtype)
    span = F.lit(vmax).cast(vtype) - lo
    return (
        F.least(
            F.lit(RANK_BUCKETS - 1),
            F.floor((F.col(value_col) - lo) / span * RANK_BUCKETS),
        )
    ).cast("long")


def with_exact_rank(df: DataFrame, value_col: str, id_col: str) -> DataFrame:
    """Attach the exact global 1-based rank ``rn`` by (value, id) and the
    total count ``n`` WITHOUT an unpartitioned Window:

    1. one scalar aggregate gives min/max/count (collected — 1 row);
    2. each row gets a deterministic value-range bucket — deterministic
       (pure function of the data) so re-evaluations of this subtree
       always agree, unlike repartitionByRange's sampled boundaries;
    3. per-bucket counts are collected (≤ RANK_BUCKETS rows) and turned
       into exact prefix offsets on the driver;
    4. rn = row_number PARTITIONED BY bucket + bucket offset.

    Every shuffle is keyed (bucket); the plan survives any table size.
    Skew caveat: degenerate value distributions (all-equal) fall into one
    bucket — correctness holds via the id tie-break, only parallelism
    degrades, and that case is exactly a constant column."""
    spark = df.sparkSession
    vtype = df.schema[value_col].dataType
    mm = df.agg(
        F.min(value_col).alias("__vmin"),
        F.max(value_col).alias("__vmax"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    bkt = _bucket_expr(value_col, mm["__vmin"], mm["__vmax"], vtype)
    r = df.withColumn("__bkt", bkt)
    pc = sorted(
        (row["__bkt"], row["__pc"])
        for row in r.groupBy("__bkt").agg(F.count(F.lit(1)).alias("__pc")).collect()
    )
    offs_rows, acc = [], 0
    for b, c in pc:
        offs_rows.append((b, acc))
        acc += c
    # non-nullable fields, matching the aggregate-derived originals so
    # downstream schemas (rn = row_number + __off) keep their nullability
    offs = spark.createDataFrame(
        offs_rows,
        StructType(
            [
                StructField("__bkt", LongType(), False),
                StructField("__off", LongType(), False),
            ]
        ),
    )
    w = Window.partitionBy("__bkt").orderBy(value_col, id_col)
    return (
        r.join(F.broadcast(offs), "__bkt")
        .withColumn("n", F.lit(int(mm["n"])).cast("long"))
        .withColumn("rn", F.row_number().over(w).cast("long") + F.col("__off"))
        .drop("__bkt", "__off")
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
    spark = df.sparkSession
    mm_rows = (
        df.groupBy(group_col)
        .agg(
            F.min(value_col).alias("__vmin"),
            F.max(value_col).alias("__vmax"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    if len(mm_rows) > GROUPED_COLLECT_MAX_GROUPS:
        return _grouped_distributed(df, group_col, value_col, id_col)
    vtype = df.schema[value_col].dataType
    gfield = df.select(group_col).schema.fields[0]
    # nullability mirrors the aggregate the rows came from: min/max are
    # nullable, count is not — so joined schemas stay bit-identical
    mm = spark.createDataFrame(
        mm_rows,
        StructType(
            [
                gfield,
                StructField("__vmin", vtype, True),
                StructField("__vmax", vtype, True),
                StructField("n", LongType(), False),
            ]
        ),
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
    pc_rows = (
        r.groupBy(group_col, "__bkt")
        .agg(F.count(F.lit(1)).alias("__pc"))
        .collect()
    )
    offs_rows = []
    by_group: dict = {}
    for row in pc_rows:
        by_group.setdefault(row[group_col], []).append((row["__bkt"], row["__pc"]))
    for g, bcs in by_group.items():
        acc = 0
        for b, c in sorted(bcs):
            offs_rows.append((g, b, acc))
            acc += c
    offs = spark.createDataFrame(
        offs_rows,
        StructType(
            [
                gfield,
                StructField("__bkt", LongType(), False),
                StructField("__off", LongType(), False),
            ]
        ),
    )
    w = Window.partitionBy(group_col, "__bkt").orderBy(value_col, id_col)
    return (
        r.join(F.broadcast(offs), [group_col, "__bkt"])
        .withColumn("rn", F.row_number().over(w).cast("long") + F.col("__off"))
        .drop("__bkt", "__off", "__vmin", "__vmax")
    )


def _grouped_distributed(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """The fully-distributed grouped plan (no driver collect) — the
    fallback when the group cardinality exceeds the collect guard."""
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
