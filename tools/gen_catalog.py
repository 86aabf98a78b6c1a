"""Regenerate CATALOG.md from the query modules' docstrings.

Usage: python tools/gen_catalog.py   (from the repo root)

Kept as a checked-in tool so the index never drifts from the code:
every wave of catalog additions ends with one run of this script.
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from kafka_flink_harshevents_spark import queries  # noqa: E402
from kafka_flink_harshevents_spark.queries import _MODULES  # noqa: E402

# Entries whose oracle is a constant-row INVARIANT (gate) rather than a
# row-for-row value twin.
GATES = {
    "doc_bpe_train", "doc_bpe_encode", "emb_knn_pq_recall", "emb_kmeans",
    "pipeline_derive_gate", "ev_approx_distinct", "ev_approx_quantile",
    "ev_heavy_hitters", "q_txlog_zorder_gate",
}

MAX = 155


def first_sentence(doc: str | None) -> str:
    if not doc:
        return ""
    text = " ".join(doc.split())
    # first sentence = up to the first ". " (keeping abbreviations is
    # not worth the complexity for an index line)
    m = re.search(r"\.\s", text)
    s = text[: m.start() + 1] if m else text
    if len(s) > MAX:
        s = s[:MAX].rstrip() + "..."
    return s.replace("|", "\\|")


def main() -> None:
    oracles = queries.all_oracles()
    n_total = len(queries.all_queries())
    out = [
        f"# CATALOG — the {n_total}-query driver-facing surface",
        "",
        "Generated from the `queries/` modules' docstrings (first sentence).",
        "`oracle` = the driver hash-compares rows against the DuckDB twin each",
        "round; `gate` = oracled constant-row invariant entry; `rows-only` =",
        "value is engine-specific by nature (covered by parity tests instead).",
        "",
    ]
    for m in _MODULES:
        name = m.__name__.rsplit(".", 1)[-1]
        out += [f"## {name}", "", "| query | check | summary |", "|---|---|---|"]
        for q, fn in m.QUERIES.items():
            check = (
                "gate" if q in GATES
                else ("oracle" if q in oracles else "rows-only")
            )
            out.append(f"| `{q}` | {check} | {first_sentence(fn.__doc__)} |")
        out.append("")
    with open("CATALOG.md", "w") as f:
        f.write("\n".join(out))
    print(f"CATALOG.md regenerated: {n_total} entries")


if __name__ == "__main__":
    main()
