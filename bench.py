#!/usr/bin/env python
"""Benchmark harness (driver contract): run the full query catalog at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and print ONE JSON line.

Each query materializes fully through the `noop` sink — full executor
work, no driver-side collect cost distorting the numbers.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from kafka_flink_harshevents_spark.queries import all_queries  # noqa: E402
from kafka_flink_harshevents_spark.session import get_spark  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark(app_name="bench")
    # JVM/codegen warm-up + one scan of every table, so the first query of
    # each family isn't paying startup/footer first-touch costs; reported
    # separately so round-over-round per-query deltas are signal.
    from kafka_flink_harshevents_spark.queries._util import TABLES, load

    t0 = time.perf_counter()
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        load(spark, sf_dir, t).write.format("noop").mode("overwrite").save()
    # spin up the Arrow/pandas worker pool once so the first pandas-backed
    # query doesn't carry the interpreter fork cost
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, schema="id long"
    ).write.format("noop").mode("overwrite").save()
    warmup = round(time.perf_counter() - t0, 3)

    def calibration() -> float:
        """Fixed-cost host sentinel: a data-independent program (pure
        whole-stage-codegen sum + one tiny fixed shuffle) timed
        min-of-5. Identical bytes every round, so when the HOST is
        slow (the multi-second stall windows PLANS.md documents) this
        number inflates with it — per-query walls divide by the
        round-over-round calibration ratio to separate plan
        regressions from host noise (normalization rule in
        PLANS.md §Round 10)."""
        return round(
            min(_one_calibration_run() for _ in range(5)), 4
        )

    def _one_calibration_run() -> float:
        t0 = time.perf_counter()
        spark.range(50_000_000).selectExpr(
            "sum(id * 2 + 1)"
        ).collect()
        spark.range(100_000).selectExpr(
            "id % 97 AS g", "id"
        ).groupBy("g").count().write.format("noop").mode(
            "overwrite"
        ).save()
        return time.perf_counter() - t0

    # Quiet-window gate (round-12 defense): this host shows multi-
    # second stall windows that can swallow a whole sweep (round 11's
    # driver run calibrated 0.59 vs the 0.33 quiet floor and read as a
    # uniform fake 0.67x regression). The sentinel is data-independent,
    # so a start reading far above the recorded quiet floor means the
    # HOST is stalled — wait briefly and re-measure (bounded: the
    # driver's window is finite) instead of timing a sweep that can
    # only produce noise. CAL_FLOOR is the minimum start calibration
    # observed across committed sweeps on this hardware — at full
    # cores and at the driver's low-core scaling run (the sentinel's
    # 50M-row sum parallelizes, so fewer cores raise the quiet floor).
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32") or 32)
    CAL_FLOOR = 0.33 if cpus >= 16 else 0.43
    calibration_attempts = 1
    calibration_wall = calibration()
    while calibration_wall > 1.25 * CAL_FLOOR and calibration_attempts < 6:
        time.sleep(20)
        calibration_attempts += 1
        calibration_wall = calibration()

    # Three passes per query: this host shows multi-second stall windows
    # (95% idle, not CPU-steal) that can inflate a single run 2-10x and
    # occasionally span two back-to-back runs (see PLANS.md), so the
    # headline number is the per-query MIN (steady-state plan cost);
    # the first-pass wall is kept alongside for cold-cost visibility.
    timings: dict[str, float] = {}
    cold: dict[str, float] = {}
    # mid-sweep sentinel samples (cheap: one ~0.3 s reading every 40
    # entries) — post-hoc evidence of WHICH part of a sweep a host
    # stall hit, so per-query round-over-round comparisons can discard
    # readings from stalled segments instead of raw-diffing them
    calibration_samples: list[float] = []
    for qi, (name, fn) in enumerate(all_queries().items()):
        if qi and qi % 40 == 0:
            calibration_samples.append(
                round(
                    min(
                        _one_calibration_run()
                        for _ in range(2)
                    ),
                    4,
                )
            )
        runs = []
        for _ in range(3):
            # queries that cache guard-bounded intermediates must not get
            # a free second run off the first run's cache
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.perf_counter() - t0, 3))
        # stall guard: when a host stall window swallows the whole
        # triple (observed: identical plans at 0.8 s and 70 s minutes
        # apart), the min is still inflated — two extra runs recover
        # the steady-state number at bounded cost
        if min(runs) > 2.0 and max(runs) / min(runs) > 3.0:
            for _ in range(2):
                spark.catalog.clearCache()
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
                runs.append(round(time.perf_counter() - t0, 3))
        cold[name] = runs[0]
        timings[name] = min(runs)

    # second sentinel reading after the sweep: a drifting host shows a
    # start/end spread; a clean one shows two near-identical numbers
    calibration_end = calibration()

    total = round(sum(timings.values()), 3)
    # Split the headline: lakehouse ACID gates run a CONSTANT-size
    # commit program at every SF (they verify transaction semantics,
    # not scan throughput — queries/lakehouse.py), so their wall is
    # scale-invariant overhead. Keeping the scan-proportional subtotal
    # separate preserves the s/query signal as the gate count grows.
    gate_names = {n for n in timings if n.startswith("q_txlog_")}
    gates_total = round(sum(timings[n] for n in gate_names), 3)
    scan_total = round(total - gates_total, 3)
    scan_n = len(timings) - len(gate_names)
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "cold_runs": cold,
                "warmup": warmup,
                "calibration_wall": calibration_wall,
                "calibration_wall_end": calibration_end,
                "calibration_floor": CAL_FLOOR,
                "calibration_attempts": calibration_attempts,
                "calibration_samples": calibration_samples,
                "sf": sf,
            }
        )
    )
    # Compact summary LAST: the driver keeps the tail of stdout, and the
    # full line above can be truncated from the front by its capture
    # window (BENCH_r02 lost the totals that way).
    print(
        json.dumps(
            {
                "metric": "catalog_total_wall",
                "value": total,
                "unit": "sec",
                "sf": sf,
                "n_queries": len(timings),
                "scan_subtotal": scan_total,
                "n_scan_queries": scan_n,
                "acid_gate_subtotal": gates_total,
                "n_acid_gates": len(gate_names),
                "calibration_wall": calibration_wall,
                "calibration_wall_end": calibration_end,
                "calibration_floor": CAL_FLOOR,
                "calibration_attempts": calibration_attempts,
                "calibration_samples": calibration_samples,
            }
        )
    )


if __name__ == "__main__":
    main()
