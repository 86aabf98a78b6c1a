"""Streaming bottom-k quantile sketch — the order-statistics member of
the continuous sketch family (KMV distinct `streaming/kmv.py`,
Count-Min `streaming/countmin.py`, Misra-Gries heavy hitters), and the
live twin of the batch ``ev_quantile_sketch_rollup`` entry.

The sketch keeps, per group, the K rows with the smallest
deterministic row hash — a uniform sample under ``xxhash64`` (the KMV
construction repurposed for sampling). The micro-batch update is the
sketch's own merge ("union, keep K smallest by hash"), so state after
ANY ingest batching equals the batch sketch over the same rows:
stream/batch parity is a theorem of the construction, pinned in
`test_streaming_bottomk_quantiles_match_batch`.

Scale shape: state is ≤ K (hash, value) pairs per group; one shuffle
on the group key; the stateless projection (hash tagging) is JVM-side
whole-stage codegen; the stateful stage merges bounded arrays
Arrow-batched. Update-mode emissions carry ``emit_seq`` so sinks keep
the latest snapshot per group (the family convention).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from kafka_flink_harshevents_spark.queries.analytics import QSK_K, QSK_QS

_OUT_SCHEMA = (
    "event_type string, n_in_sketch long, "
    + ", ".join(f"q{str(q).replace('0.', '')} double" for q in QSK_QS)
    + ", emit_seq long"
)
_STATE_SCHEMA = "hs array<long>, vs array<double>, emit_seq long"


def _pick(sorted_vals: list, q: float) -> float | None:
    """The batch entry's pick rule: sorted[min(floor(q*n)+1, n)] in
    1-based terms — shared here so the snapshots agree by code path."""
    if not sorted_vals:
        return None
    n = len(sorted_vals)
    idx = min(int(q * n), n - 1)
    return float(sorted_vals[idx])


def _bq_update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    hs, vs, seq = state.get if state.exists else ([], [], 0)
    pairs = list(zip(hs, vs))
    for pdf in pdfs:
        pairs.extend(zip(pdf["_h"].tolist(), pdf["_v"].tolist()))
    # merge = keep the K smallest hashes (value tie-breaks make the
    # kept SET deterministic even under hash collisions)
    pairs.sort()
    pairs = pairs[:QSK_K]
    seq += 1
    state.update(
        ([int(h) for h, _ in pairs], [float(v) for _, v in pairs], seq)
    )
    sample = sorted(v for _, v in pairs)
    row = (
        str(key[0]),
        len(pairs),
        *[_pick(sample, q) for q in QSK_QS],
        seq,
    )
    yield pd.DataFrame(
        [row],
        columns=["event_type", "n_in_sketch"]
        + [f"q{str(q).replace('0.', '')}" for q in QSK_QS]
        + ["emit_seq"],
    )


def bottomk_quantile_stream(
    events: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    hash_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """``events`` stream → update stream of per-group quantile-sketch
    snapshots. ``hash_cols`` names the row-identity columns to tag
    with ``xxhash64`` (default: every input column — the batch
    entry's whole-row convention); pass a precomputed ``_h`` column
    via ``hash_cols=("_h",)`` when the source already carries one."""
    if hash_cols == ("_h",) and "_h" in events.columns:
        tagged = events.select(
            F.col(key_col).alias("event_type"),
            F.col(val_col).cast("double").alias("_v"),
            F.col("_h"),
        )
    else:
        cols = hash_cols if hash_cols is not None else tuple(events.columns)
        tagged = events.select(
            F.col(key_col).alias("event_type"),
            F.col(val_col).cast("double").alias("_v"),
            F.xxhash64(*[F.col(c) for c in cols]).alias("_h"),
        )
    return tagged.groupBy("event_type").applyInPandasWithState(
        _bq_update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def bottomk_quantile_batch(
    df: DataFrame,
    key_col: str = "event_type",
    val_col: str = "value",
    hash_col: str = "_h",
) -> DataFrame:
    """Batch twin over the same (key, value, hash) rows — per group,
    bottom-K by hash then the shared pick rule; what any stream
    snapshot must equal after ingesting the same data."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(hash_col, val_col)
    kept = (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= QSK_K)
        .groupBy(F.col(key_col).alias("event_type"))
        .agg(
            F.sort_array(
                F.collect_list(F.col(val_col).cast("double"))
            ).alias("vs")
        )
    )
    picks = [
        F.element_at(
            "vs",
            F.least(
                F.floor(F.lit(q) * F.size("vs")) + 1,
                F.size("vs").cast("long"),
            ).cast("int"),
        ).alias(f"q{str(q).replace('0.', '')}")
        for q in QSK_QS
    ]
    return kept.select(
        "event_type", F.size("vs").cast("long").alias("n_in_sketch"), *picks
    )
