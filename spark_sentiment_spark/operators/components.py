"""Connected components over an edge DataFrame — the iterative-algorithm
operator family (SURVEY §7.4 extension; the reference has no iterative
operator at all).

The motivating pipeline: near-duplicate PAIRS (``dedup_jaccard_pairs``,
``dedup_minhash_lsh``) are only half of dedup — keeping one copy per
duplicate *group* requires the transitive closure of the pair graph.
That closure is a fixpoint computation no single SQL statement expresses
in Spark, so it runs as min-label propagation driven from the driver:

  label(n) := min(label(n), min over neighbors m of label(m))

repeated until no label changes. Scale posture:

* Each round is one shuffle-partitionable join + hash aggregation on the
  node id — no collect of nodes or edges; the driver sees only the
  per-round changed-count (control plane, O(1) per round).
* ``localCheckpoint(eager=True)`` truncates lineage every round;
  without it the plan doubles per iteration and Catalyst analysis time
  explodes by round ~10.
* Rounds needed = graph diameter. Near-dup graphs are overwhelmingly
  tiny cliques (diameter 1-2), so 3-4 rounds in practice. For adversarial
  long-chain graphs the classic fix is alternating large-star/small-star
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14), which squares path lengths per round; not needed for dedup
  workloads and omitted deliberately.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame, src: str, dst: str, max_iter: int = 50,
) -> DataFrame:
    """Return ``(node, component)`` for every node appearing in ``edges``,
    where ``component`` is the smallest node id in its connected component
    (deterministic). Undirected: each edge is symmetrized."""
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    e = e.unionByName(
        e.select(F.col("d").alias("s"), F.col("s").alias("d"))
    ).distinct().persist()

    labels = (
        e.select(F.col("s").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neigh = (
            e.join(labels, e["s"] == labels["node"])
            .groupBy(F.col("d").alias("node"))
            .agg(F.min("comp").alias("ncomp"))
        )
        new_labels = (
            labels.alias("o")
            .join(neigh.alias("n"), "node", "left")
            .select(
                "node",
                F.least(
                    F.col("o.comp"),
                    F.coalesce(F.col("n.ncomp"), F.col("o.comp")),
                ).alias("comp"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    e.unpersist()
    return labels
