"""Graph operator tests: PageRank properties + known-graph fixture."""

from __future__ import annotations

import pytest

from topn_spark.operators.graph import pagerank


def _ranks(df):
    return {r.id: r.rank for r in df.collect()}


def test_pagerank_mass_conserved_and_positive(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 1), (5, 1)],
        "src long, dst long",
    )
    r = _ranks(pagerank(edges, max_iter=20))
    assert r.keys() == {1, 2, 3, 4, 5}
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    assert all(v > 0 for v in r.values())
    # node 1 has the most in-links (from 3, 4, 5) -> highest rank
    assert max(r, key=r.get) == 1


def test_pagerank_two_cycle_uniform(spark):
    # a <-> b: symmetric graph converges to the uniform distribution
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    r = _ranks(pagerank(edges, max_iter=30))
    assert r[1] == pytest.approx(0.5, abs=1e-6)
    assert r[2] == pytest.approx(0.5, abs=1e-6)


def test_pagerank_dangling_mass_redistributed(spark):
    # 2 is a sink; without dangling handling, total mass leaks
    edges = spark.createDataFrame([(1, 2), (3, 2)], "src long, dst long")
    r = _ranks(pagerank(edges, max_iter=25))
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    assert r[2] > r[1] == pytest.approx(r[3], abs=1e-9)


class TestBfsHops:
    def test_known_graph_and_unreachable(self, spark):
        from topn_spark.operators.graph import bfs_hops

        # path 1-2-3-4-5 plus isolated edge 8-9
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5), (8, 9)],
            "src long, dst long",
        )
        got = {
            r.id: r.hops for r in bfs_hops(edges, [1], max_hops=3).collect()
        }
        assert got == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 beyond cap, 8/9 off
        # undirected by default: reachable backwards too
        back = {
            r.id: r.hops for r in bfs_hops(edges, [3], max_hops=1).collect()
        }
        assert back == {3: 0, 2: 1, 4: 1}

    def test_directed_multi_seed_and_early_stop(self, spark):
        from topn_spark.operators.graph import bfs_hops

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 1)], "src long, dst long"
        )
        got = {
            r.id: r.hops
            for r in bfs_hops(
                edges, [1, 5], max_hops=10, directed=True
            ).collect()
        }
        # seeds at 0; 5->1 edge is redundant (1 already a seed);
        # frontier empties after hop 2 long before the cap
        assert got == {1: 0, 5: 0, 2: 1, 3: 2}
