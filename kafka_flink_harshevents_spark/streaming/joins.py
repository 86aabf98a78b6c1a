"""Stream-stream joins (SURVEY §2.7 taken to streaming).

The reference keeps its two event streams separate and correlates them
only implicitly (the consumer's latency log spans both topics,
kafkaConsumer.js:201-211). A real deployment asks the join question
directly — "which violations happened while the dashcam was on
battery?" — which in Spark is an event-time interval join with
watermarks on BOTH sides so join state is bounded and expired by the
engine, not by an external TTL.

Scale shape: the join shuffles both streams once on ``device_uuid``
(the same key Kafka already partitions by), and state per key is
bounded by watermark + interval — this survives any stream volume.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def followed_by_stream(
    events: DataFrame,
    first_type: str = "click",
    second_type: str = "purchase",
    within_seconds: int = 1800,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming CEP ``A followedBy B within(t)`` — the streaming twin of
    the batch ``ev_pattern_match`` catalog query, built from TWO chained
    stateful operators (Spark 3.4+ multi-stateful append mode):

    1. an event-time interval self-join pairs every A with every same-key
       B in ``[t_A, t_A + within]`` — join state bounded by watermark +
       interval on both sides — then a stateless event_id tie-break
       keeps same-timestamp Bs only when they sort after A, matching
       the batch twin's ``(tms, event_id)`` order bit-for-bit;
    2. a min-aggregation keyed on the A instance collapses the pairs to
       the FIRST B (skip-till-next-match), emitted once the watermark
       passes the match window — exactly a CEP engine's timeout flush.

    Input: a streaming DataFrame with ``user_id``, ``event_id``,
    ``event_type`` and an event-time ``ts`` timestamp column. Output per
    matched A: (user_id, click_event_id, click_ms, purchase_ms, gap_ms),
    the batch query's schema.

    Scale shape: both legs shuffle once on ``user_id`` (the stream's
    natural key), the join's per-key state is bounded by the interval,
    and the aggregation state is one row per in-flight A — dropped at
    watermark. No state grows with stream lifetime.
    """
    firsts = (
        events.filter(F.col("event_type") == first_type)
        .select(
            "user_id",
            F.col("event_id").alias("click_event_id"),
            F.col("ts").alias("a_ts"),
        )
        .withWatermark("a_ts", watermark)
    )
    seconds = (
        events.filter(F.col("event_type") == second_type)
        .select(
            F.col("user_id").alias("b_user"),
            F.col("event_id").alias("b_event_id"),
            F.col("ts").alias("b_ts"),
        )
        .withWatermark("b_ts", watermark)
    )
    # The event-time range condition (state bound) admits b_ts == a_ts;
    # the stateless tie-break filter below then reproduces the batch
    # twin's (tms, event_id) total order EXACTLY: a B sharing A's
    # timestamp matches iff its event_id sorts after A's (gap 0), so
    # stream and batch agree on same-millisecond pairs too.
    cond = (
        (F.col("user_id") == F.col("b_user"))
        & (F.col("b_ts") >= F.col("a_ts"))
        & (F.col("b_ts") <= F.col("a_ts") + F.expr(f"INTERVAL {within_seconds} SECONDS"))
    )
    pairs = firsts.join(seconds, cond).filter(
        (F.col("b_ts") > F.col("a_ts"))
        | (F.col("b_event_id") > F.col("click_event_id"))
    )
    return (
        pairs.groupBy("user_id", "click_event_id", "a_ts")
        .agg(F.min("b_ts").alias("first_b_ts"))
        .select(
            "user_id",
            "click_event_id",
            F.unix_millis(F.col("a_ts").cast("timestamp")).alias("click_ms"),
            F.unix_millis(F.col("first_b_ts").cast("timestamp")).alias("purchase_ms"),
            (
                F.unix_millis(F.col("first_b_ts").cast("timestamp"))
                - F.unix_millis(F.col("a_ts").cast("timestamp"))
            ).alias("gap_ms"),
        )
    )


def violations_during_status(
    violations: DataFrame,
    status: DataFrame,
    window_seconds: int = 300,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time interval join: each violation matched to the
    device-status touch that precedes it by < ``window_seconds`` on the
    same device. Inner join; both sides watermarked so the engine can
    drop expired state (late rows beyond the watermark are discarded,
    matching the reference's best-effort correlation).

    Inputs are the validated route_* shapes (epoch-second ``timestamp``).
    Output: the violation columns plus the matched status action/time.
    """
    v = violations.select(
        F.col("device_uuid"),
        F.col("violation_type"),
        F.col("timestamp").alias("v_epoch"),
        F.timestamp_seconds(F.col("timestamp")).alias("v_ts"),
    ).withWatermark("v_ts", watermark)
    s = status.select(
        F.col("device_uuid").alias("s_device"),
        F.col("action"),
        F.col("timestamp").alias("s_epoch"),
        F.timestamp_seconds(F.col("timestamp")).alias("s_ts"),
    ).withWatermark("s_ts", watermark)
    cond = (
        (F.col("device_uuid") == F.col("s_device"))
        & (F.col("v_ts") >= F.col("s_ts"))
        & (F.col("v_ts") < F.col("s_ts") + F.expr(f"INTERVAL {window_seconds} SECONDS"))
    )
    return v.join(s, cond).select(
        "device_uuid",
        "violation_type",
        F.col("v_epoch").alias("violation_timestamp"),
        F.col("action").alias("status_action"),
        F.col("s_epoch").alias("status_timestamp"),
        (F.col("v_epoch") - F.col("s_epoch")).alias("seconds_after_status"),
    )


def attributed_purchases_stream(
    events: DataFrame,
    lookback_seconds: int = 86400,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming last-touch attribution — the continuous twin of the
    batch ``ev_attribution_last_touch`` catalog query: each purchase is
    credited to the same user's LATEST click in
    ``[t_purchase − lookback, t_purchase]``.

    Same two-stage multi-stateful shape as `followed_by_stream`, with
    the aggregation inverted (max instead of min): the interval join's
    state is bounded by watermark + lookback on both sides, and the
    per-purchase aggregate emits once the watermark passes the
    purchase — a single ``max(struct(click_ts, click_id))`` reproduces
    the batch as-of join's winner exactly (latest timestamp, highest
    event id on same-timestamp ties). INNER semantics: unattributed
    purchases don't emit — the batch query is the left-complete view.

    Scale shape: one shuffle on user_id for both legs; join state per
    key is the lookback span; aggregation state is one row per pending
    purchase, dropped at watermark.
    """
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_event_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("purchase_event_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    cond = (
        (F.col("user_id") == F.col("c_user"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (
            F.col("c_ts")
            >= F.col("p_ts") - F.expr(f"INTERVAL {lookback_seconds} SECONDS")
        )
    )
    pairs = purchases.join(clicks, cond)
    winner = F.max(
        F.struct(F.col("c_ts").alias("cts"), F.col("click_event_id").alias("cid"))
    ).alias("m")
    return (
        pairs.groupBy("user_id", "purchase_event_id", "p_ts")
        .agg(winner)
        .select(
            "user_id",
            "purchase_event_id",
            F.unix_millis(F.col("p_ts").cast("timestamp")).alias("purchase_ms"),
            F.col("m.cid").alias("click_event_id"),
            F.unix_millis(F.col("m.cts").cast("timestamp")).alias("click_ms"),
            (
                F.unix_millis(F.col("p_ts").cast("timestamp"))
                - F.unix_millis(F.col("m.cts").cast("timestamp"))
            ).alias("gap_ms"),
        )
    )
