#!/usr/bin/env python
"""Per-query profiler: wall clock, Spark job/stage counts, and
(optionally) the formatted physical plan for each named catalog entry.

Usage:
    python tools/profile_query.py [--sf DIR] [--runs N] [--plan OUTDIR] name...
    python tools/profile_query.py --top N          # N slowest from BENCH_LOCAL_r11b.json

Job/stage counts come from the status tracker via a per-query job
group, so multi-action entries (the lakehouse gates, the ingest
recipes) report the TOTAL number of scheduled jobs — the fixed-cost
driver of constant-size commit programs (guide §1).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from kafka_flink_harshevents_spark.queries import all_queries  # noqa: E402
from kafka_flink_harshevents_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--plan", default=None, help="write explain('formatted') to DIR/<name>_<suffix>.txt")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--top", type=int, default=0)
    args = ap.parse_args()

    qs = all_queries()
    names = args.names
    if args.top:
        b = json.load(open(Path(__file__).resolve().parent.parent / "BENCH_LOCAL_r11b.json"))
        names = [k for k, _ in sorted(b["queries"].items(), key=lambda kv: -kv[1])[: args.top]]
    spark = get_spark(app_name="profile")
    sc = spark.sparkContext
    # warm up like bench.py so first-touch costs don't pollute
    from kafka_flink_harshevents_spark.queries._util import TABLES, load

    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for t in TABLES:
        load(spark, args.sf, t).write.format("noop").mode("overwrite").save()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, schema="id long").write.format(
        "noop"
    ).mode("overwrite").save()

    print(f"{'query':35s} {'best':>7s} {'runs':>22s} {'jobs':>5s} {'stages':>7s}")
    for name in names:
        fn = qs[name]
        if args.plan:
            df = fn(spark, args.sf)
            Path(args.plan).mkdir(parents=True, exist_ok=True)
            out = Path(args.plan) / f"{name}_{args.suffix}.txt"
            out.write_text(df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted"))
        walls = []
        jobs = stages = 0
        for i in range(args.runs):
            spark.catalog.clearCache()
            group = f"prof-{name}-{i}"
            sc.setJobGroup(group, name)
            t0 = time.perf_counter()
            fn(spark, args.sf).write.format("noop").mode("overwrite").save()
            walls.append(time.perf_counter() - t0)
            if i == args.runs - 1:
                st = sc.statusTracker()
                ids = st.getJobIdsForGroup(group)
                jobs = len(ids)
                stages = sum(
                    len(st.getJobInfo(j).stageIds) for j in ids if st.getJobInfo(j)
                )
            sc.setJobGroup("idle", "idle")
        print(
            f"{name:35s} {min(walls):7.3f} "
            f"{'/'.join(f'{w:.2f}' for w in walls):>22s} {jobs:5d} {stages:7d}"
        )


if __name__ == "__main__":
    main()
