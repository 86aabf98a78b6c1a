"""Probe: checkpoint wall time vs total-files-ever-copied.

The round-9 verdict's item 3: the copied-set used to be embedded in
every checkpoint (O(total files ever copied) re-serialized per
write). With the delta-segment side structure a steady-state
checkpoint is O(paths copied since the last segment) — flat in
history size — and only the periodic fold (1 in _COPIED_FOLD_EVERY)
touches the full set.

Method: no Spark needed — the copied set is pure log metadata. Seed
a fold segment holding N historical paths (the compacted state a
long-lived table carries), add one batch of 10 fresh copy-commit
records, and time (a) the delta checkpoint, (b) a copied_files()
read, and (c) one full fold, at increasing N.

Usage: python tools/probe_copied_checkpoint.py
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from kafka_flink_harshevents_spark.sources.txlog import (  # noqa: E402
    _LOG_DIR,
    _PAD,
    _copied_segments,
    _copied_write_segment,
)


class _FakeTable:
    """Just enough of TxTable to drive _checkpoint_copied and
    copied_files against a synthetic log (no Spark session)."""

    def __init__(self, table_dir: str):
        self.table_dir = table_dir

    from kafka_flink_harshevents_spark.sources.txlog import TxTable

    _checkpoint_copied = TxTable._checkpoint_copied
    copied_files = TxTable.copied_files


def _write_record(table_dir: str, v: int, path: str | None) -> None:
    rec = {"ts": time.time(), "op": "copy", "add": []}
    if path is not None:
        rec["copied_files"] = [
            {"path": path, "bytes": 1, "mtime_ms": 0}
        ]
    os.makedirs(os.path.join(table_dir, _LOG_DIR), exist_ok=True)
    with open(
        os.path.join(table_dir, _LOG_DIR, f"{v:0{_PAD}d}.json"), "w"
    ) as f:
        json.dump(rec, f)


def run(n_files: int, batch: int = 10) -> dict:
    d = tempfile.mkdtemp(prefix="copiedprobe-")
    t = _FakeTable(d)
    # compacted history: one fold segment with N paths at version N
    # (the log itself only needs records past the fold — a real
    # table's earlier records sit below the replay floor)
    hist = {f"/landing/part-{i:08d}.parquet" for i in range(n_files)}
    _write_record(d, n_files, None)
    _copied_write_segment(d, n_files, 0, hist)
    # one fresh batch of copy commits, then the checkpoint under test
    v = n_files
    for i in range(batch):
        v += 1
        _write_record(d, v, f"/landing/new-{i:08d}.parquet")
    t0 = time.perf_counter()
    t._checkpoint_copied(v)
    chk_wall = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_seen = len(t.copied_files())
    read_wall = time.perf_counter() - t0
    assert n_seen == n_files + batch, (n_seen, n_files)
    segs = _copied_segments(d)
    delta_bytes = os.path.getsize(segs[-1][1])
    # one full fold for reference (the 1-in-FOLD_EVERY amortized cost)
    from kafka_flink_harshevents_spark.sources.txlog import _copied_base

    t0 = time.perf_counter()
    floor, full = _copied_base(d, v)
    _copied_write_segment(d, v + 1, 0, full)
    fold_wall = time.perf_counter() - t0
    return {
        "files": n_files,
        "delta_chk_ms": round(chk_wall * 1e3, 2),
        "read_ms": round(read_wall * 1e3, 2),
        "fold_ms": round(fold_wall * 1e3, 2),
        "delta_seg_bytes": delta_bytes,
    }


if __name__ == "__main__":
    for n in (1_000, 10_000, 100_000, 1_000_000):
        print(json.dumps(run(n)))
