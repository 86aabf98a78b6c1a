"""Dynamic rule evaluation over a stream — Flink's broadcast-state
pattern re-expressed Spark-first.

The reference derives threshold classifications from CONSTANTS compiled
into the job (F10, mqtt_publish.js:193-208): changing a threshold means
redeploying. The Flink idiom for live rules is a control stream feeding
broadcast state; Structured Streaming has no broadcast state, and its
stream-static joins resolve the static side ONCE at plan time — a plain
join against a rules table would never see an update.

The Spark-first equivalent is ``foreachBatch`` + an ACID rules table:
every micro-batch re-reads the CURRENT committed snapshot of a
:class:`~kafka_flink_harshevents_spark.sources.txlog.TxTable` (atomic by
the commit-log construction — a half-written rule update is invisible)
and joins the batch against it. Semantics match Flink broadcast state
exactly where it matters: a rule update applies to every element
processed AFTER it commits, each output row records the rule version
that judged it, and rule changes never require a stream restart.

Scale shape: the rules table is dimension-sized (one row per event
type / device class), so the per-batch join is a broadcast hash join;
re-reading it costs one driver-side log replay + a metadata-sized scan
per micro-batch — the price Flink pays as control-stream state updates,
paid here as a snapshot read. The event side is never shuffled.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.sources.txlog import TxTable


def classify_with_rules(events: DataFrame, rules: DataFrame) -> DataFrame:
    """One batch of events against one rules snapshot: left-join on
    event_type (a type with no rule passes through unclassified —
    NULL verdict, never dropped) and apply the threshold rule.
    Shared by the streaming sink below and its batch twin in the
    parity test, so both paths classify with one expression tree."""
    r = rules.select(
        "event_type",
        F.col("threshold").alias("_thr"),
        F.col("rule_ver").alias("rule_ver"),
    )
    return events.join(F.broadcast(r), "event_type", "left").select(
        *events.columns,
        "rule_ver",
        F.when(F.col("_thr").isNull(), F.lit(None).cast("string"))
        .when(F.col("value") >= F.col("_thr"), F.lit("VIOLATION"))
        .otherwise(F.lit("OK"))
        .alias("verdict"),
    )


def dynamic_classify_sink(rules: TxTable, out_dir: str):
    """``foreachBatch`` function: classify each micro-batch under the
    rules snapshot committed at batch time, appending to ``out_dir``
    with the rules-table VERSION stamped on every row — the audit trail
    that says which rule judged which event (and the hook the parity
    test replays: batch-classifying each wave under its recorded
    version must reproduce the stream's output exactly)."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        # Pin the snapshot to the stamped version: latest_version() and
        # read() are two separate log replays, and a rule commit landing
        # between them would stamp rows with a version that disagrees
        # with the snapshot that classified them — breaking the replay
        # contract the parity test depends on.
        v = rules.latest_version()
        out = classify_with_rules(
            batch_df, rules.read(version=v)
        ).withColumn("rules_version", F.lit(v).cast("long"))
        out.write.mode("append").parquet(out_dir)

    return apply
