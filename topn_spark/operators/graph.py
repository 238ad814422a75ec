"""Iterative graph operators over edge-list DataFrames.

Companions to :func:`topn_spark.operators.dedup.connected_components`
(the dedup-clustering fixpoint): the same driver-drives-iterations /
data-stays-on-executors shape, used where a corpus has link structure
(citation graphs, near-dup graphs, user-interaction graphs).

Iterative float algorithms are NOT hash-matchable cross-engine
(SURVEY.md §2.4 rule 3 — accumulation order changes low bits), so
these ship with property tests (mass conservation, convergence,
known-graph fixtures) instead of SQL oracles — the driver records the
weaker rows-only check by design.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    max_iter: int = 10,
    tol: float | None = 1e-6,
) -> DataFrame:
    """PageRank over a directed edge list → ``(id, rank)``.

    Standard power iteration: each round every node keeps
    ``(1-d)/N`` and receives ``d × Σ rank(in-neighbor)/out-degree``;
    dangling-node mass is redistributed uniformly so ranks always sum
    to 1. Stops after ``max_iter`` rounds or when the L1 delta drops
    below ``tol``.

    Scale shape: per round, one join (ranks ⋈ edges, both hash-
    partitioned on the node id — AQE reuses the partitioning) and one
    aggregation; ranks are checkpointed each round to truncate
    lineage. State is O(nodes + edges) on executors; the driver only
    sees the scalar delta. This is the canonical Spark iterative-
    algorithm formulation (same skeleton as connected_components).
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("id"))
        .union(e.select(F.col("dst").alias("id")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # edges with per-source degree, reused every round
    contrib_edges = e.join(out_deg, "src").localCheckpoint(eager=True)
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(max_iter):
        inbound = (
            contrib_edges.join(
                ranks.withColumnRenamed("id", "src"), "src"
            )
            .groupBy("dst")
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("m"))
        )
        # dangling mass = 1 - mass that flowed along edges
        flowed = inbound.agg(F.sum("m")).collect()[0][0] or 0.0
        dangling = 1.0 - flowed
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            nodes.join(
                inbound.withColumnRenamed("dst", "id"), "id", "left"
            )
            .select(
                "id",
                (
                    F.lit(base) + F.lit(damping) * F.coalesce("m", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        if tol is not None:
            delta = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "id")
                .agg(
                    F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))).alias("d")
                )
                .collect()[0][0]
            )
            ranks = new_ranks
            if delta is not None and delta < tol:
                break
        else:
            ranks = new_ranks
    return ranks
