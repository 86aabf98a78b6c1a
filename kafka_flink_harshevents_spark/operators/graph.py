"""Connected components by min-label propagation — the iterative
operator every dedup pipeline ends with (canonicalizing near-dup pair
graphs), shared by the document and embedding paths.

Spark-idiomatic iteration: ``localCheckpoint`` truncates the growing
lineage each round, and the only driver value is the scalar
changed-count deciding convergence.

Two execution paths, picked ONCE by probing the (checkpointed) edge
count — the same size-guard discipline as `_jaccard_dense_blocked` /
`emb_neardup_pairs`:
- under ``CC_BROADCAST_MAX_EDGES`` the edge list and previous-round
  label mapping are broadcast into the per-round joins (zero shuffle
  of the loop tables);
- above it (a 100 TB corpus at a 1% near-dup rate has a pair graph far
  past broadcast limits) both loop joins run as shuffled equi-joins,
  with the edge list hash-partitioned on its join key once, outside
  the loop, so each round shuffles only the label table.

The loop's wall-clock on a cluster is job count x scheduler overhead,
not data volume (loop tables are tiny next to the corpus), so the
design minimizes JOBS:
- each round fuses the neighbor-min step with a POINTER JUMP
  (``label := label(label)`` via the previous round's materialized
  mapping) into ONE checkpoint job — the jump shortcuts long label
  chains, cutting rounds on path-shaped components (near-dup graphs at
  a tight threshold are chains more often than cliques: measured 17 →
  12 rounds on the sf0.1 embedding pair graph);
- convergence is checked every CC_CHECK_EVERY rounds instead of every
  round, halving the count jobs; an extra converged round is one cheap
  no-op job, far less than a count job per round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CC_ROUNDS = 40  # safety bound (checks are sparse; rounds are cheap)
CC_CHECK_EVERY = 2
# ~32 bytes/edge row → ≈128 MB at the cap, inside Spark's broadcast comfort
# zone; above it the loop switches to shuffled equi-joins instead of OOMing
# the driver/executors with an unbounded broadcast.
CC_BROADCAST_MAX_EDGES = 4_000_000


def min_label_components(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    max_rounds: int = MAX_CC_ROUNDS,
    max_broadcast_edges: int = CC_BROADCAST_MAX_EDGES,
) -> DataFrame:
    """``(a, b)`` undirected pair list → ``(node, component)`` where
    ``component`` is the minimum node id in the connected component.

    Only nodes that appear in a pair come back — the caller left-joins
    the full population and coalesces singletons to themselves, keeping
    every loop table ∝ the pair graph, never the corpus.
    """
    pairs = pairs.select(F.col(a_col).alias("da"), F.col(b_col).alias("db"))
    edges = pairs.union(
        pairs.select(F.col("db").alias("da"), F.col("da").alias("db"))
    ).localCheckpoint(eager=True)
    # ONE cheap probe of the already-materialized checkpoint picks the path.
    small_graph = edges.count() <= max_broadcast_edges
    if not small_graph:
        # Pre-partition the static edge side on its join key once; every
        # round's neighbor-min join then shuffles only the label table.
        edges = edges.repartition("da").localCheckpoint(eager=True)
    labels = (
        edges.select(F.col("da").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    for rnd in range(1, max_rounds + 1):
        neighbor_min = (
            (F.broadcast(edges) if small_graph else edges)
            .join(labels, F.col("da") == F.col("node"))
            .groupBy(F.col("db").alias("nid"))
            .agg(F.min("component").alias("nmin"))
        )
        stepped = labels.join(
            neighbor_min, F.col("node") == F.col("nid"), "left"
        ).select(
            "node",
            F.least(
                F.col("component"),
                F.coalesce(F.col("nmin"), F.col("component")),
            ).alias("c1"),
            "component",
        )
        # pointer jump through the PREVIOUS round's materialized mapping
        # (under the guard, broadcasting it is free of recompute — it's
        # checkpointed); jumping via the in-flight mapping would
        # re-execute its plan.
        ptr = labels.select(
            F.col("node").alias("pn"), F.col("component").alias("pc")
        )
        updated = (
            stepped.join(
                F.broadcast(ptr) if small_graph else ptr,
                F.col("c1") == F.col("pn"),
                "left",
            )
            .select(
                "node",
                F.least(F.col("c1"), F.coalesce(F.col("pc"), F.col("c1"))).alias(
                    "new_component"
                ),
                "component",
            )
            .localCheckpoint(eager=True)
        )
        labels = updated.select("node", F.col("new_component").alias("component"))
        if rnd % CC_CHECK_EVERY == 0 or rnd == max_rounds:
            changed = updated.filter(
                F.col("new_component") != F.col("component")
            ).count()
            if changed == 0:
                break
    return labels
