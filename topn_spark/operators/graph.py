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
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    broadcast_edge_limit: int = 1_000_000,
    broadcast_node_limit: int = 1_000_000,
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
    between feasible and not on a power-law 100 TB edge list.

    Shuffle-width control: the wedge stream (Σ out_deg² rows, the
    biggest intermediate by far) must not shuffle. The edge count is
    computed anyway, so the closing join picks its physical strategy
    on EXACT size: when the canonical edge set has at most
    ``broadcast_edge_limit`` rows it is broadcast and the semi join
    probes wedges map-side in the same stage that builds them — zero
    wedge shuffle, count aggregated to a scalar per task. These hints
    bypass ``autoBroadcastJoinThreshold``, so the limits are sized on
    the MATERIALIZED ``BroadcastHashedRelation``, not raw bytes: a
    hashed (long, long) row costs ~60–100 B (row object + hash-map
    slot + pointer overhead), so the 1M default is ~60–100 MB hashed —
    safe on default 1–4 GB executors. Callers on fat executors should
    opt UP explicitly (a 5M-row relation is ~300–500 MB hashed, fine
    at ≥8 GB heap, an OOM risk below). Above the limit it falls back
    to a shuffled semi join (wedges and edges hash-partitioned on the
    candidate pair, measured ~18% slower at sf1) — the 100 TB-safe path,
    since a graph too big to broadcast is exactly the one whose wedge
    stream must go through a real exchange. A wedge-multiplicity
    pre-aggregation (groupBy (x, y) before the close) was measured
    WORSE here: real graphs have wedge multiplicity ≈ 1, so the
    partial combine builds a wedge-sized hash table for no shuffle
    reduction. No iteration, no driver-side state; the canonical and
    oriented edge sets are persisted across their multiple consumers.
    """
    # canonical undirected edge set: (lo, hi), dedup'd, self-loops out.
    # Persisted: consumed by the degree agg, the orientation join, the
    # closing join, and the edge count.
    e = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    deg = (
        e.select(F.col("a").alias("id"))
        .union(e.select(F.col("b").alias("id")))
        .groupBy("id")
        .agg(F.count(F.lit(1)).alias("deg"))
        .persist()
    )
    # n_nodes is part of the result anyway; knowing it exactly lets
    # the orientation joins go map-side (degree table broadcast: one
    # (id, count) row per node) instead of shuffling the edge set
    # twice. Past the limit, shuffled equi-joins — the scale path.
    n_nodes = deg.count()
    # orient a→b iff rank(a) < rank(b), rank = (deg, id)
    da = deg.select(F.col("id").alias("a"), F.col("deg").alias("da"))
    db = deg.select(F.col("id").alias("b"), F.col("deg").alias("db"))
    if n_nodes <= broadcast_node_limit:
        da, db = F.broadcast(da), F.broadcast(db)
    ranked = e.join(da, "a").join(db, "b")
    fwd = (
        ranked.select(
            F.when(
                (F.col("da") < F.col("db"))
                | ((F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))),
                F.struct(F.col("a").alias("u"), F.col("b").alias("v")),
            )
            .otherwise(F.struct(F.col("b").alias("u"), F.col("a").alias("v")))
            .alias("e")
        )
        .select("e.u", "e.v")
        .persist()  # both sides of the wedge self-join
    )
    # wedges from each lowest-ranked corner u: (x, y) with x < y; u is
    # projected out before the close — only the candidate pair matters.
    w1 = fwd.select(F.col("u"), F.col("v").alias("x"))
    w2 = fwd.select(F.col("u"), F.col("v").alias("y"))
    wedges = w1.join(w2, "u").where(F.col("x") < F.col("y"))
    # close the wedges: pairs are canonical (x < y by id), so a wedge
    # is a triangle iff (x, y) is in the canonical edge set. n_edges
    # is known exactly (counted off the persisted set), so choose the
    # physical join on real size, not an optimizer estimate.
    n_edges = e.count()
    closing = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    if n_edges <= broadcast_edge_limit:
        closing = F.broadcast(closing)
    n_tris = wedges.join(closing, ["x", "y"], "left_semi").count()
    e.unpersist()
    fwd.unpersist()
    deg.unpersist()
    spark = edges.sparkSession
    return spark.createDataFrame(
        [(n_nodes, n_edges, n_tris)],
        "n_nodes bigint, n_edges bigint, n_triangles bigint",
    )
