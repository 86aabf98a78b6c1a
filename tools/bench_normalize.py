"""Normalized round-over-round bench comparison (PLANS.md §Round 10
rule, made machine-checkable): per-query ratio ÷ calibration ratio.

The bench JSON carries `calibration_wall` / `calibration_wall_end` —
a data-independent fixed-cost program timed at sweep start and end.
Dividing each query's round-over-round ratio by the runs' calibration
ratio cancels host noise (CPU contention, thermal state), so what's
left is plan/code change: a NORMALIZED ratio > 1.25 is a real
regression candidate, not a noisy host.

The driver's BENCH_r{N}.json truncates the per-query tail, so the
full JSON line from each round's local `bench.py` run is kept in the
repo as `BENCH_LOCAL_r{N}.json` — this tool compares any two such
files.

Usage: python tools/bench_normalize.py OLD.json NEW.json [flag_ratio]
"""

from __future__ import annotations

import json
import sys

SKIP = {"calibration_wall", "calibration_wall_end", "warmup_wall"}


def _cal(d: dict) -> float:
    """One calibration number per run: mean of start and end sentinel
    (each min-of-5), so a run whose host degraded mid-sweep is
    represented by its average state. The sentinels live at the top
    level of bench.py's detail line (beside "queries")."""
    src = d if "calibration_wall" in d else d.get("queries", {})
    vals = [
        src[k]
        for k in ("calibration_wall", "calibration_wall_end")
        if k in src
    ]
    if not vals:
        raise SystemExit("bench json lacks calibration_wall — rerun bench.py")
    return sum(vals) / len(vals)


def main() -> None:
    old_p, new_p = sys.argv[1], sys.argv[2]
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 1.25
    old = json.load(open(old_p))
    new = json.load(open(new_p))
    co, cn = _cal(old), _cal(new)
    cal_ratio = cn / co
    qo = {k: v for k, v in old["queries"].items() if k not in SKIP}
    qn = {k: v for k, v in new["queries"].items() if k not in SKIP}
    shared = sorted(set(qo) & set(qn))
    rows = []
    for k in shared:
        raw = qn[k] / qo[k] if qo[k] else float("inf")
        rows.append((k, qo[k], qn[k], raw, raw / cal_ratio))
    rows.sort(key=lambda r: -r[4])
    flagged = [r for r in rows if r[4] > flag]
    print(
        f"# calibration {co:.4f} -> {cn:.4f} (ratio {cal_ratio:.3f}); "
        f"{len(shared)} shared queries; flag > {flag}x normalized"
    )
    print(f"{'entry':34s} {'old':>7s} {'new':>7s} {'raw':>6s} {'norm':>6s}")
    for k, o, n, raw, norm in rows[:15]:
        mark = "  <-- FLAG" if norm > flag else ""
        print(f"{k:34s} {o:7.3f} {n:7.3f} {raw:6.2f} {norm:6.2f}{mark}")
    med = sorted(r[4] for r in rows)[len(rows) // 2]
    print(f"# median normalized ratio: {med:.3f}; flagged: {len(flagged)}")
    print(
        json.dumps(
            {
                "cal_ratio": round(cal_ratio, 4),
                "median_normalized": round(med, 4),
                "flagged": [
                    {"q": k, "old": o, "new": n, "norm": round(norm, 3)}
                    for k, o, n, _raw, norm in flagged
                ],
            }
        )
    )


if __name__ == "__main__":
    main()
