"""Probe: fingerprint-store semi-join — shuffle vs storage-partitioned.

r09 verdict item 6: `corpus_ingest`'s default presence check ships the
store's key column through an Exchange every batch (narrow but
store-row-count-sized). The bucketed prototype
(`plans/ingest.py::_bucketed_store_hits`) reads each bucket's store
files executor-side instead — zero store rows in the Spark plan.

Method: store with N fingerprint rows (16 buckets), a 5k-part batch,
min-of-3 wall for each path plus the plan-shape facts (store-side scan
and Exchange present?).

Usage: python tools/probe_bucketed_store.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from kafka_flink_harshevents_spark.plans.ingest import (  # noqa: E402
    _bucketed_store_hits,
    create_fingerprint_table,
)
from kafka_flink_harshevents_spark.session import get_spark  # noqa: E402


def run(spark, n_store: int, n_batch: int = 5_000) -> dict:
    fps = create_fingerprint_table(
        spark, tempfile.mkdtemp(prefix="bstore-"), n_buckets=16
    )
    fps.append(
        spark.range(n_store).select(
            (F.col("id") % 3).alias("kind"),
            F.md5(F.col("id").cast("string")).alias("fp"),
            F.lit(1).cast("long").alias("ver"),
        )
    )
    # half the batch hits, half misses
    parts = spark.range(n_batch).select(
        (F.col("id") % 100).alias("doc_id"),
        (F.col("id") % 3).alias("kind"),
        F.md5(
            F.when(
                F.col("id") % 2 == 0, F.col("id").cast("string")
            ).otherwise(F.concat(F.lit("miss|"), F.col("id").cast("string")))
        ).alias("fp"),
    ).localCheckpoint(eager=True)
    store = fps.read().select("kind", "fp")

    def shuffle_hits():
        return parts.join(store, ["kind", "fp"], "left_semi")

    def bucketed_hits():
        return _bucketed_store_hits(fps, parts)

    out = {"store_rows": n_store, "batch_rows": n_batch}
    for name, mk in (("shuffle", shuffle_hits), ("bucketed", bucketed_hits)):
        counts, walls = [], []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            counts.append(mk().count())
            walls.append(time.perf_counter() - t0)
        assert len(set(counts)) == 1
        out[f"{name}_wall_s"] = round(min(walls), 3)
        out[f"{name}_hits"] = counts[0]
    plan_sh = shuffle_hits()._jdf.queryExecution().executedPlan().toString()
    plan_bk = bucketed_hits()._jdf.queryExecution().executedPlan().toString()
    out["shuffle_plan_scans_store"] = "parquet" in plan_sh.lower()
    out["bucketed_plan_scans_store"] = "parquet" in plan_bk.lower()
    out["shuffle_plan_exchanges"] = plan_sh.count("Exchange")
    out["bucketed_plan_exchanges"] = plan_bk.count("Exchange")
    assert out["shuffle_hits"] == out["bucketed_hits"]
    return out


if __name__ == "__main__":
    spark = get_spark(app_name="probe-bucketed-store")
    for n in (100_000, 1_000_000, 4_000_000):
        print(json.dumps(run(spark, n)))
