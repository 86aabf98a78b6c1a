"""Gap-based sessionization, batch form (O9's SQL twin, SURVEY.md §2.10).

The reference consolidates cable-unplugged touches into sessions with a
300 s inactivity TTL (``kafkaConsumer.js:43,278-347``). In batch the same
semantics are the classic lag/gap/cumulative-sum rewrite — one shuffle on
the key, then both window passes and the final groupBy reuse that
partitioning (verified: a single Exchange in the physical plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

SESSION_TTL_SECONDS = 300  # kafkaConsumer.js:43


def sessionize_rows(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Per-ROW sessionization: the input frame plus a ``session_id``
    column (1-based per key), leaving every other column intact — the
    building block for path/sequence analyses that need the events
    inside each session, not just its envelope. Same lag/gap/cumsum
    rewrite as :func:`sessionize_batch` (which now delegates here):
    both window passes share ONE key exchange.
    """
    by_key = Window.partitionBy(key_col).orderBy(ts_col, *order_cols)
    prev = F.lag(ts_col).over(by_key)
    gapped = df.withColumn(
        "_new_session",
        F.when(prev.isNull() | ((F.col(ts_col) - prev) > gap), F.lit(1)).otherwise(
            F.lit(0)
        ),
    )
    return gapped.withColumn(
        "session_id",
        F.sum("_new_session").over(by_key.rowsBetween(Window.unboundedPreceding, 0)),
    ).drop("_new_session")


def sessionize_batch(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    gap: int,
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """One row per (key, session): gap > ``gap`` (same time unit as
    ``ts_col``) starts a new session.

    ``order_cols`` break ordering ties (needed for engine-vs-oracle
    determinism when timestamps collide).
    """
    sessioned = sessionize_rows(df, key_col, ts_col, gap, order_cols)
    return sessioned.groupBy(key_col, "session_id").agg(
        F.min(ts_col).alias("start_timestamp"),
        F.max(ts_col).alias("end_timestamp"),
        F.count(F.lit(1)).alias("n_touches"),
    )
