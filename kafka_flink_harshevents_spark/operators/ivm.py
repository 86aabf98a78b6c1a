"""Incremental view maintenance driven by the transaction log's change
feed — the three-component composition that keeps a materialized
aggregate exact while its base table mutates:

    TxTable commits (sources/txlog.py)
        → table_changes(v)  (Delta-CDF pre/post-image rows)
        → signed partial-state delta (queries.relational.q1_partial_state)
        → state ⊕ delta      (q1_merge_states — associative integer adds)

Insert and update_postimage rows ADD their contribution; delete and
update_preimage rows RETRACT it (sign −1). Because the view state is
det-sum hi/lo integer partials, addition and retraction are EXACT —
maintaining through any commit sequence lands on bit-identical state to
recomputing from the table snapshot (pinned in tests/test_txlog.py).

Scale shape: per commit the cost is |feed| (the touched buckets' diff)
plus a |groups|-sized merge — never a base-table scan. This is the
steady-state refresh loop `q1_incremental_refresh` models with a
synthetic split, now fed by real commits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kafka_flink_harshevents_spark.queries.relational import (
    q1_merge_states,
    q1_partial_state,
)

_ADDS = ("insert", "update_postimage")


def q1_delta_from_changes(changes: DataFrame) -> DataFrame:
    """One commit's CDF rows → a signed Q1 partial-state delta."""
    sign = F.when(F.col("_change_type").isin(*_ADDS), F.lit(1)).otherwise(
        F.lit(-1)
    )
    return q1_partial_state(changes, sign=sign)


def q1_apply_changes(state: DataFrame | None, changes: DataFrame) -> DataFrame:
    """Fold one commit into the maintained state (None = empty view)."""
    delta = q1_delta_from_changes(changes)
    if state is None:
        return delta
    return q1_merge_states(state, delta)
