"""Connected components (large-star/small-star) vs a union-find oracle."""

from __future__ import annotations

import random

import pytest

from ella_spark.operators.graph import connected_components


def _uf_components(n_nodes: list[int], edges: list[tuple[int, int]]) -> dict[int, int]:
    parent = {u: u for u in n_nodes}

    def find(u):
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # normalize to component min
    out = {}
    for u in n_nodes:
        out[u] = find(u)
    # find() roots are already the min id: union always parents max under min
    return out


def _run(spark, nodes, edges, small_graph_edges):
    ndf = spark.createDataFrame([(int(u),) for u in nodes], "id long")
    if edges:
        edf = spark.createDataFrame([(int(a), int(b)) for a, b in edges], "src long, dst long")
    else:
        edf = spark.createDataFrame([], "src long, dst long")
    got = {
        r["id"]: r["component"]
        for r in connected_components(
            ndf, edf, small_graph_edges=small_graph_edges
        ).collect()
    }
    assert got == _uf_components(nodes, edges)


@pytest.mark.parametrize("sge", [0, 10**6], ids=["distributed", "unionfind"])
def test_chain_pathological(spark, sge):
    # A 60-node path: naive min-flooding needs 60 rounds; star
    # contraction must finish inside the max_iter budget.
    nodes = list(range(100, 160))
    edges = [(i, i + 1) for i in nodes[:-1]]
    _run(spark, nodes, edges, sge)


@pytest.mark.parametrize("sge", [0, 10**6], ids=["distributed", "unionfind"])
def test_isolated_and_cliques(spark, sge):
    nodes = list(range(20))
    edges = [(0, 1), (1, 2), (2, 0), (5, 6), (6, 7), (10, 11)]
    _run(spark, nodes, edges, sge)


@pytest.mark.parametrize("sge", [0, 10**6], ids=["distributed", "unionfind"])
def test_duplicate_and_reversed_edges(spark, sge):
    nodes = [1, 2, 3, 4]
    edges = [(2, 1), (1, 2), (2, 1), (3, 4), (4, 3)]
    _run(spark, nodes, edges, sge)


@pytest.mark.parametrize("seed", [7, 42])
@pytest.mark.parametrize("sge", [0, 10**6], ids=["distributed", "unionfind"])
def test_random_graph(spark, seed, sge):
    rng = random.Random(seed)
    nodes = list(range(200))
    edges = [
        (rng.randrange(200), rng.randrange(200)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    _run(spark, nodes, edges, sge)
