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


def triangle_count(
    edges: DataFrame, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """Exact triangle count over an undirected edge list → one row
    ``(n_nodes, n_edges, n_triangles)``.

    Compact-forward algorithm: rank nodes by (degree, id), orient
    every edge from lower to higher rank, build wedges by self-joining
    oriented edges on their source, and close each wedge with a semi
    join back to the edge set — each triangle is counted exactly once,
    from its lowest-ranked corner.

    The degree orientation is the scale lever: wedge volume is
    Σ out_deg², and orienting toward higher degree caps out-degree at
    O(√m) for any graph, making the join O(m^1.5) instead of
    Σ deg² ≈ (max degree)·m of a naive orientation — the difference
    between feasible and not on a power-law 100 TB edge list. Three
    shuffles total (degree agg, wedge join, closing semi join); no
    iteration, no driver-side state.
    """
    # canonical undirected edge set: (lo, hi), dedup'd, self-loops out
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .union(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    # orient a→b iff rank(a) < rank(b), rank = (deg, id)
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    ranked = e.join(da, "a").join(db, "b")
    fwd = ranked.select(
        F.when(
            (F.col("da") < F.col("db"))
            | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
            F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
        )
        .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
        .alias("e")
    ).select("e.u", "e.v")
    # wedges from each lowest-ranked corner u: (v, w) with v != w
    w1 = fwd.select(F.col("u"), F.col("v").alias("x"))
    w2 = fwd.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").where(F.col("x") < F.col("y"))
    # close the wedge: wedges are canonical (x < y by id), so the
    # closing edge is present iff (x, y) is in the canonical edge set
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tris = wedges.join(closing, ["x", "y"], "left_semi")
    n_nodes = deg.count()
    n_edges = e.count()
    n_tris = tris.count()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_tris)],
        "n_nodes bigint, n_edges bigint, n_triangles bigint",
    )
