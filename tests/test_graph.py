"""PageRank + co-purchase graph: numpy power-iteration parity on a
hand-built graph, mass conservation, and edge-construction semantics.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from py_etl_pipeline_woocommerce_spark.operators.graph import (
    copurchase_edges,
    pagerank,
)


def _numpy_pagerank(edge_list, damping=0.85, n_iter=15):
    nodes = sorted({u for e in edge_list for u in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    adj = np.zeros((n, n))
    for u, v in edge_list:
        adj[idx[u], idx[v]] = 1.0
        adj[idx[v], idx[u]] = 1.0
    deg = adj.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        r = (1 - damping) / n + damping * (adj.T @ (r / deg))
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy_power_iteration(spark):
    # path 1-2-3-4 plus a separate triangle 10-11-12
    edge_list = [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12)]
    edges = spark.createDataFrame(
        [(u, v, 1) for u, v in edge_list], "src long, dst long, weight long"
    )
    got = {r.node: r.rank for r in pagerank(edges).collect()}
    want = _numpy_pagerank(edge_list)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9
    # total rank mass is conserved
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the path's inner nodes outrank its endpoints
    assert got[2] > got[1] and got[3] > got[4]
    # triangle nodes are symmetric
    assert abs(got[10] - got[11]) < 1e-12


def test_copurchase_edges_counts_shared_orders(spark):
    li = spark.createDataFrame(
        [
            (1, 100), (1, 200),          # order 1: {100, 200}
            (2, 100), (2, 200), (2, 300),
            (3, 100), (3, 300),
            (3, 100),                    # duplicate line: still one order
        ],
        "l_orderkey long, l_partkey long",
    )
    got = {
        (r.src, r.dst): r.weight
        for r in copurchase_edges(li, min_orders=2).collect()
    }
    # (100,200) in orders 1,2; (100,300) in orders 2,3; (200,300) only order 2
    assert got == {(100, 200): 2, (100, 300): 2}
