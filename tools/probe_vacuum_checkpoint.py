"""Probe: vacuum × log-checkpoint interplay at 10⁴ commits.

r09 verdict item 8: prove retention + log checkpoints compose at high
commit counts — snapshot replay stays O(commits since the last
checkpoint) however long the history, and VACUUM never reclaims a
file the live checkpoint references.

Method: no Spark — commits, checkpoints, replay, and vacuum are pure
log metadata here. Synthesize N append-and-supersede commits (each
adds one real staged file and removes the previous — the rewrite
churn a long-lived table accumulates), checkpoint every 10 commits
(the default checkpoint_interval), then measure replay wall WITH the
checkpoints vs with them hidden, and run the vacuum disjointness
check.

Usage: python tools/probe_vacuum_checkpoint.py
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_flink_harshevents_spark.sources.txlog import (  # noqa: E402
    _LOG_DIR,
    _PAD,
    TxTable,
    _latest_checkpoint,
    _replay_log,
)


def _write_record(table_dir: str, v: int, rec: dict) -> None:
    rec.setdefault("ts", time.time())
    with open(
        os.path.join(table_dir, _LOG_DIR, f"{v:0{_PAD}d}.json"), "w"
    ) as f:
        json.dump(rec, f)


def run(n_commits: int = 10_000, chk_every: int = 10) -> dict:
    d = tempfile.mkdtemp(prefix="vcprobe-")
    os.makedirs(os.path.join(d, _LOG_DIR))
    staged = os.path.join(d, "_staged-p")
    os.makedirs(staged)
    _write_record(d, 1, {
        "version": 1, "op": "create", "add": [], "remove": [],
        "meta": {
            "key_cols": ["k"], "order_col": "ver", "n_buckets": 2,
            "cdf": False, "bloom_cols": [], "generated_cols": {},
            "checkpoint_interval": 0,
        },
    })
    t = TxTable.__new__(TxTable)
    t.spark = None
    t.table_dir = d

    prev_path = None
    chk_wall = 0.0
    n_chk = 0
    for v in range(2, n_commits + 2):
        rel = os.path.join("_staged-p", f"part-{v:08d}.parquet")
        with open(os.path.join(d, rel), "wb") as f:
            f.write(b"x" * 64)
        entry = {
            "path": rel, "bucket": 0,
            "stats": {"rows": 10}, "bytes": 64,
        }
        _write_record(d, v, {
            "version": v, "op": "append", "add": [entry],
            "remove": [prev_path] if prev_path else [],
        })
        prev_path = rel
        if v % chk_every == 0:
            t0 = time.perf_counter()
            t.checkpoint()
            chk_wall += time.perf_counter() - t0
            n_chk += 1

    head = n_commits + 1
    # replay WITH checkpoints: O(commits since last checkpoint)
    t0 = time.perf_counter()
    _, live, _, _ = _replay_log(d, head)
    with_chk = time.perf_counter() - t0
    assert len(live) == 1
    # replay with checkpoints HIDDEN: O(total history)
    chks = sorted(glob.glob(os.path.join(d, _LOG_DIR, "chk-*.json")))
    for p in chks:
        os.rename(p, p + ".hide")
    t0 = time.perf_counter()
    _, live2, _, _ = _replay_log(d, head)
    without_chk = time.perf_counter() - t0
    assert live2.keys() == live.keys()
    for p in chks:
        os.rename(p + ".hide", p)

    # vacuum disjointness: the reclaim set never touches a file the
    # live checkpoint references; after the real vacuum the head
    # snapshot still replays and its file still exists
    would = set(t.vacuum(retain_versions=5, dry_run=True))
    chk = _latest_checkpoint(d, head)
    live_paths = {e["path"] for e in chk["live"]}
    assert not (would & live_paths), "vacuum would reclaim a live file"
    reclaimed = t.vacuum(retain_versions=5)
    _, live3, _, _ = _replay_log(d, head)
    assert live3.keys() == live.keys()
    assert all(
        os.path.exists(os.path.join(d, p)) for p in live3
    )
    return {
        "commits": n_commits,
        "checkpoints": n_chk,
        "avg_chk_ms": round(chk_wall / n_chk * 1e3, 2),
        "replay_with_chk_ms": round(with_chk * 1e3, 2),
        "replay_without_chk_ms": round(without_chk * 1e3, 2),
        "replay_speedup": round(without_chk / with_chk, 1),
        "vacuum_reclaimed": len(reclaimed),
        "live_disjoint_from_reclaim": True,
    }


if __name__ == "__main__":
    print(json.dumps(run()))
