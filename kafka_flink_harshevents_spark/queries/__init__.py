"""Query catalog: every operator from SURVEY.md §2 plus the
training-data-pipeline extensions, each as a ``(spark, sf_dir) ->
DataFrame`` callable paired (where SQL-expressible) with a DuckDB oracle.

Cross-engine comparability conventions (the driver hash-compares values):
- integer outputs are always 64-bit (`cast("long")` / ``CAST(... AS BIGINT)``);
- float aggregates are rounded (sums 2dp, ratios/avgs 4dp, cosines 6dp) in
  BOTH engines, AND every grouped sum/avg over doubles is made
  addition-order independent by summing exact DECIMAL quantizations
  (`_util.det_sum` / `_util.det_avg` and their `_sql` twins, or integer
  cents summed as BIGINT). Rounding alone is NOT enough: with 32-way
  partial aggregation the combine order can flip the last ULP across a
  round() boundary run-to-run (the CORRECTNESS_r02 `ev_props_variant`
  flake). New emissions must use the det_* helpers or a per-row
  integer/decimal quantization — never `round(sum(double))` /
  `round(avg(double))` directly;
- timestamps leave the engine as epoch-ms longs or formatted strings,
  never raw timestamp columns;
- every top-k has a total-order tie-break on a unique key;
- operators whose VALUES are engine-specific or training-dependent
  (HLL estimates, PQ shortlists, k-means assignments) emit a
  driver-hashable GATE instead: exact-integer/boolean properties
  (recall floor, accuracy bound, coverage, inertia decrease) whose
  oracle states the expected row — the property is machine-checked per
  round even where the raw values cannot be (`ev_approx_distinct`,
  `emb_knn_pq_recall`, `emb_kmeans`).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from kafka_flink_harshevents_spark.queries import (
    analytics,
    documents,
    embeddings,
    events,
    multimodal,
    pipeline_tp,
    relational,
    relational_ext,
)

QueryFn = Callable[[SparkSession, str], DataFrame]

_MODULES = (
    relational,
    relational_ext,
    events,
    analytics,
    documents,
    embeddings,
    multimodal,
    pipeline_tp,
)


def all_queries() -> dict[str, QueryFn]:
    out: dict[str, QueryFn] = {}
    for m in _MODULES:
        out.update(m.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for m in _MODULES:
        out.update(m.ORACLES)
    return out
