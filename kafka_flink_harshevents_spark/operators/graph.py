"""Connected components by min-label propagation — the iterative
operator every dedup pipeline ends with (canonicalizing near-dup pair
graphs), shared by the document and embedding paths.

THREE execution paths, picked ONCE by probing the (checkpointed) edge
count — the same size-guard discipline as `_jaccard_dense_blocked` /
`emb_neardup_pairs`:

- ≤ ``CC_DRIVER_MAX_EDGES`` (~16 MB of Arrow rows): union-find on the
  driver. A distributed iteration on a tiny graph is pure scheduler
  overhead — every round pays broadcast exchanges and a checkpoint job
  to move labels a few thousand rows wide; path-compressed union-find
  does the same work in microseconds. The collect is bounded by
  construction (the guard), the same rule that blesses the 128-row PQ
  codebook; union-by-min keeps each tree's root equal to the
  component's min node id, so the result is IDENTICAL to the
  distributed fixpoint.
- ≤ ``CC_BROADCAST_MAX_EDGES``: the distributed min-label loop with
  the edge list and label mappings broadcast into the loop joins (zero
  shuffle of loop tables). ``localCheckpoint`` truncates lineage each
  round; each round fuses the neighbor-min step with a POINTER JUMP
  (``label := label(label)``) so label chains halve per round; the
  only driver value is the scalar changed-count.
- above it (a 100 TB corpus at a 1% near-dup rate has a pair graph far
  past broadcast limits): the same loop with shuffled equi-joins, the
  edge list hash-partitioned on its join key once outside the loop, so
  each round shuffles only the label table.

All three paths compute the same labeling — asserted by the
three-way equality test (`test_cc_shuffled_path_matches_broadcast`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CC_ROUNDS = 40  # safety bound (checks are sparse; rounds are cheap)
CC_CHECK_EVERY = 2
# ≤ ~16 MB of (long, long) Arrow rows — a bounded driver collect that
# replaces whole rounds of scheduler-bound distributed iteration.
CC_DRIVER_MAX_EDGES = 500_000
# ~32 bytes/edge row → ≈128 MB at the cap, inside Spark's broadcast comfort
# zone; above it the loop switches to shuffled equi-joins instead of OOMing
# the driver/executors with an unbounded broadcast.
CC_BROADCAST_MAX_EDGES = 4_000_000


def _driver_union_find(spark, pairs: DataFrame) -> DataFrame:
    """Bounded-size path: Arrow-collect the (da, db) pair list, run
    path-compressed union-find with union-by-MIN (the tree root is
    always the component's smallest node id — the exact invariant the
    distributed loop converges to), return (node, component)."""
    pdf = pairs.toPandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    nodes: set[int] = set()
    for a, b in zip(pdf["da"], pdf["db"]):
        a, b = int(a), int(b)
        nodes.add(a)
        nodes.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in sorted(nodes)]
    schema = f"node {dict(pairs.dtypes)['da']}, component {dict(pairs.dtypes)['da']}"
    # bounded by the driver guard (≤ 2·max_driver_edges nodes), so the
    # caller's corpus←labels join should broadcast instead of shuffling
    # the corpus side
    return F.broadcast(spark.createDataFrame(rows, schema))


def min_label_components(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    max_rounds: int = MAX_CC_ROUNDS,
    max_broadcast_edges: int = CC_BROADCAST_MAX_EDGES,
    max_driver_edges: int = CC_DRIVER_MAX_EDGES,
) -> DataFrame:
    """``(a, b)`` undirected pair list → ``(node, component)`` where
    ``component`` is the minimum node id in the connected component.

    Only nodes that appear in a pair come back — the caller left-joins
    the full population and coalesces singletons to themselves, keeping
    every loop table ∝ the pair graph, never the corpus.
    """
    pairs = pairs.select(F.col(a_col).alias("da"), F.col(b_col).alias("db"))
    pairs = pairs.localCheckpoint(eager=True)
    # ONE cheap probe of the already-materialized checkpoint picks the path.
    n_pairs = pairs.count()
    if n_pairs <= max_driver_edges:
        return _driver_union_find(pairs.sparkSession, pairs)

    edges = pairs.union(
        pairs.select(F.col("db").alias("da"), F.col("da").alias("db"))
    ).localCheckpoint(eager=True)
    small_graph = 2 * n_pairs <= max_broadcast_edges
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
