"""Streaming heavy hitters — Misra–Gries frequent-item summaries over
an unbounded event stream.

The reference consumer keeps exact per-type counters in Redis
(kafkaConsumer.js:229-233) — fine for a handful of event types, a
memory bomb for an open-ended key domain (URLs, user ids, tokens). The
scale answer is the Misra–Gries summary (Misra & Gries 1982, the
frequent-items algorithm of Cormode & Hadjieleftheriou's survey):
``k`` counters per shard, with the deterministic guarantees

- every item whose true shard frequency exceeds ``n_shard / k`` is IN
  the summary (no false negatives above the threshold), and
- each reported estimate undercounts by at most ``n_shard / k``
  (``est ≤ true ≤ est + n_shard/k``).

Distribution shape: items are hash-sharded, so each distinct item
lives in exactly ONE shard's summary — the per-shard guarantees then
apply to each item's full stream. State per shard is a bounded
(items[], counts[], n_seen) triple: ``k`` counters regardless of how
many distinct keys the stream ever carries, the property that lets a
1000-executor topology track hot keys over a 100 TB/day firehose with
constant memory. One shuffle (on the shard key), Arrow-batched
stateful processing — the same execution shape as the session and
anomaly operators.

Emission: ``update`` mode; each micro-batch emits the shard's current
summary stamped with a per-shard ``emit_seq`` so a sink (or test)
keeps the latest snapshot per shard.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

MG_K = 8  # counters per shard
N_SHARDS = 4

_OUT_SCHEMA = (
    "shard long, item string, est_count long, n_seen long, emit_seq long"
)
_STATE_SCHEMA = (
    "items array<string>, counts array<long>, n_seen long, emit_seq long"
)


def _mg_update(counters: dict[str, int], k: int, item: str) -> None:
    """One Misra–Gries step: increment / insert / global decrement."""
    if item in counters:
        counters[item] += 1
    elif len(counters) < k:
        counters[item] = 1
    else:
        for key in list(counters):
            counters[key] -= 1
            if counters[key] == 0:
                del counters[key]


def heavy_hitters_stream(
    events: DataFrame,
    key_col: str = "event_type",
    n_shards: int = N_SHARDS,
    k: int = MG_K,
) -> DataFrame:
    """``events`` stream → update stream of per-shard Misra–Gries
    summaries ``(shard, item, est_count, n_seen, emit_seq)``.

    ``n_seen`` is the shard's total item count so far — consumers apply
    the deterministic filter ``est_count > n_seen / k`` (or add
    ``n_seen / k`` for an upper bound) without any extra state.
    """
    sharded = events.select(
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).alias("shard"),
        F.col(key_col).alias("item"),
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            items, counts, n_seen, emit_seq = state.get
            counters = dict(zip(items, counts))
        else:
            counters, n_seen, emit_seq = {}, 0, 0
        for pdf in pdfs:
            for item in pdf["item"]:
                _mg_update(counters, k, str(item))
                n_seen += 1
        emit_seq += 1
        state.update(
            (list(counters), [int(c) for c in counters.values()], n_seen, emit_seq)
        )
        yield pd.DataFrame(
            {
                "shard": [int(key[0])] * len(counters),
                "item": list(counters),
                "est_count": [int(c) for c in counters.values()],
                "n_seen": [n_seen] * len(counters),
                "emit_seq": [emit_seq] * len(counters),
            }
        )

    return sharded.groupBy("shard").applyInPandasWithState(
        update,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def heavy_hitters_batch(
    events: DataFrame, key_col: str = "event_type", n_shards: int = N_SHARDS
) -> DataFrame:
    """Exact per-shard item counts — the batch twin the parity test
    checks the Misra–Gries guarantees against."""
    return (
        events.select(
            F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_shards)).alias("shard"),
            F.col(key_col).alias("item"),
        )
        .groupBy("shard", "item")
        .agg(F.count(F.lit(1)).alias("true_count"))
    )
