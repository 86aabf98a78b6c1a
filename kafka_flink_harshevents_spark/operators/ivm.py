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


# -- delta-join view maintenance -------------------------------------

def join_view_delta(
    changes: DataFrame, other: DataFrame, on: list[str]
) -> DataFrame:
    """Signed multiset delta of the JOIN view A ⋈ B from ONE side's
    CDF rows — the classic incremental join-maintenance identity
    ΔM = ΔA ⋈ B (resp. A ⋈ ΔB), with inserts/postimages contributing
    +1 and deletes/preimages −1 per matched pair.

    Exactly-once pairing contract (what makes the interleaved fold
    land on the recomputed join): when applying one table's commit,
    ``other`` must be the OTHER side's snapshot with exactly the
    commits applied so far — then every (δa, δb) pair is counted once:
    in δa ⋈ B if b was applied first, else in A ⋈ δb. Pin snapshots
    with ``TxTable.read(version=...)`` when replaying a history.

    Output: the join's user columns plus ``_mult`` (signed exact
    multiplicity — duplicates are counts, never dropped). Cost per
    commit ∝ |feed| ⋈ other — never |A| ⋈ |B|."""
    sign = F.when(
        F.col("_change_type").isin(*_ADDS), F.lit(1)
    ).otherwise(F.lit(-1))
    meta = [c for c in changes.columns if c.startswith("_")]
    left = changes.withColumn("_sign", sign.cast("long")).drop(*meta)
    joined = left.join(other, on)
    cols = [c for c in joined.columns if c != "_sign"]
    return (
        joined.groupBy(*cols)
        .agg(F.sum("_sign").alias("_mult"))
        .filter(F.col("_mult") != 0)
    )


def aggregate_view_delta(
    delta: DataFrame, group_cols: list[str], sum_cols: list[str]
) -> DataFrame:
    """Signed GROUP BY delta over a join-view delta — composing the
    two maintenance layers gives a maintained AGGREGATE-over-JOIN
    materialized view (the full IVM story): each joined row
    contributes ``_mult`` to the group's count and ``_mult · value``
    to its sums, so retractions subtract exactly. Values must be
    integer-exact (longs / pre-quantized cents — the repo's det-sum
    convention), which is what makes add/retract land bit-identical
    to recomputation. Fold the resulting deltas into state with
    :func:`merge_aggregate_states` (columns ADD per group — not the
    multiset merge of :func:`apply_view_delta`)."""
    aggs = [F.sum("_mult").cast("long").alias("n_rows")] + [
        F.sum(F.col(c) * F.col("_mult")).cast("long").alias(f"sum_{c}")
        for c in sum_cols
    ]
    return delta.groupBy(*group_cols).agg(*aggs)


def merge_aggregate_states(
    state: DataFrame | None, delta: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Fold an aggregate delta into the maintained aggregate state:
    group keys align, every other (integer) column adds; groups whose
    row count reaches zero vanish. Associative/commutative — replay
    order never changes the result."""
    if state is None:
        return delta.filter(F.col("n_rows") != 0)
    val_cols = [c for c in delta.columns if c not in group_cols]
    merged = (
        state.unionByName(delta)
        .groupBy(*group_cols)
        .agg(*[F.sum(c).cast("long").alias(c) for c in val_cols])
    )
    return merged.filter(F.col("n_rows") != 0)


def apply_view_delta(
    view: DataFrame | None, delta: DataFrame
) -> DataFrame:
    """Fold a signed multiset delta into the maintained view state
    (None = empty view): rows group on every user column, signed
    multiplicities add, zero-multiplicity rows vanish. Associative and
    commutative over deltas with integer-exact counts, so any replay
    order of the SAME delta sequence converges to identical state.
    Cost ∝ |view groups| + |delta| (keyed aggregate — no base scan)."""
    if view is None:
        return delta
    cols = [c for c in delta.columns if c != "_mult"]
    return (
        view.unionByName(delta)
        .groupBy(*cols)
        .agg(F.sum("_mult").cast("long").alias("_mult"))
        .filter(F.col("_mult") != 0)
    )
