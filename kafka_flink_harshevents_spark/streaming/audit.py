"""Streaming data-quality constraint monitor — the continuous form of
the batch ``q_constraint_audit`` catalog entry.

A production fact stream (the reference's violation events landing in
Mongo; here the lineitem shape) is audited AS IT ARRIVES instead of by
a nightly batch: every micro-batch's rows are checked against the same
constraint battery and folded into cumulative per-check counters, so a
dashboard reads (check_name, n_checked, n_violations) at any moment
and an alert fires the instant a violation count moves.

Drift-proofing: the row-level conditions come from
``queries.relational_ext.lineitem_row_checks()`` — the ONE shared
definition the batch entry aggregates — and the FK check uses the same
left-join-null-count formulation. Stream/batch parity is therefore
structural, and `tests/test_streaming.py` pins it: draining the full
table through the stream yields exactly the batch entry's rows for the
stream-covered checks.

Scale shape: the per-row check projection is stateless and scan-local;
the FK probe is a STREAM-STATIC left join (the static dim side is
re-planned per micro-batch, broadcast when small — no stream state);
the only stateful operator is the final 4-group running aggregate,
whose state is one (count, violations) pair per check — constant
regardless of stream volume. The check explosion multiplies rows by
the (fixed) number of checks BEFORE a partial aggregate collapses them
map-side, so the shuffle carries ≤ checks × partitions rows per batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.queries.relational_ext import lineitem_row_checks

FK_CHECK_NAME = "lineitem_fk_orders"


def constraint_audit_stream(lineitem: DataFrame, orders_static: DataFrame) -> DataFrame:
    """``lineitem`` micro-batches → cumulative per-check audit counters.

    ``orders_static`` is the batch-side dim (the FK target). Output —
    one row per check, updated every micro-batch::

        check_name, n_checked, n_violations

    Run with ``outputMode("complete")`` (4-row result) — the aggregate
    has no watermark because its group domain is the fixed check list,
    not time.
    """
    joined = lineitem.join(
        orders_static.select(F.col("o_orderkey").alias("__pk")),
        lineitem["l_orderkey"] == F.col("__pk"),
        "left",
    )
    checks = [
        F.struct(F.lit(name).alias("check_name"), cond.cast("int").alias("violated"))
        for name, cond in lineitem_row_checks()
    ] + [
        F.struct(
            F.lit(FK_CHECK_NAME).alias("check_name"),
            F.col("__pk").isNull().cast("int").alias("violated"),
        )
    ]
    exploded = joined.select(F.explode(F.array(*checks)).alias("c"))
    return (
        exploded.groupBy("c.check_name")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_checked"),
            F.sum("c.violated").cast("long").alias("n_violations"),
        )
    )
