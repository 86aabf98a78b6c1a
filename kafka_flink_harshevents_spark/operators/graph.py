"""Connected components by min-label propagation — the iterative
operator every dedup pipeline ends with (canonicalizing near-dup pair
graphs), shared by the document and embedding paths.

Spark-idiomatic iteration: ``localCheckpoint`` truncates the growing
lineage each round, the edge list (∝ near-dup pairs, tiny relative to
the corpus) is broadcast into the per-round join, and the only driver
value per round is the scalar changed-count deciding convergence.
Near-dup components are near-cliques, so convergence takes 2-4 rounds
regardless of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_CC_ROUNDS = 20  # safety bound; near-dup graphs converge in 2-4


def min_label_components(
    pairs: DataFrame,
    a_col: str,
    b_col: str,
    max_rounds: int = MAX_CC_ROUNDS,
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
    labels = (
        edges.select(F.col("da").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_rounds):
        neighbor_min = (
            F.broadcast(edges)
            .join(labels, F.col("da") == F.col("node"))
            .groupBy(F.col("db").alias("nid"))
            .agg(F.min("component").alias("nmin"))
        )
        updated = (
            labels.join(neighbor_min, F.col("node") == F.col("nid"), "left")
            .select(
                "node",
                F.least(
                    F.col("component"),
                    F.coalesce(F.col("nmin"), F.col("component")),
                ).alias("new_component"),
                "component",
            )
            .localCheckpoint(eager=True)
        )
        changed = updated.filter(F.col("new_component") != F.col("component")).count()
        labels = updated.select("node", F.col("new_component").alias("component"))
        if changed == 0:
            break
    return labels
