"""operators/graph.pagerank_micro — integer-exact PageRank."""

import pytest
from pyspark.sql import functions as F

from cassandra_diff_spark.operators.graph import pagerank_micro


def _reference(edges, iters=3, num=85, den=100):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    outdeg = {}
    for u, _ in edges:
        outdeg[u] = outdeg.get(u, 0) + 1
    r = {n: 1_000_000 for n in nodes}
    teleport = (1_000_000 * (den - num)) // den
    for _ in range(iters):
        m = {n: 0 for n in nodes}
        for u, v in edges:
            m[v] += r[u] // outdeg[u]
        r = {n: teleport + (num * m[n]) // den for n in nodes}
    return r


class TestPagerankMicro:
    EDGES = [
        (1, 2), (1, 3), (2, 3), (3, 1), (4, 3),  # 4 is never a target
        (2, 3),  # parallel edge: counts twice
        (5, 1),  # feeds the cycle
    ]

    def test_matches_integer_reference(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        got = {r.node: r.rank_u for r in pagerank_micro(df, iters=3).collect()}
        assert got == _reference(self.EDGES)
        # authority ordering: 3 receives from 1,2,2,4 and must dominate
        assert got[3] == max(got.values())

    def test_dangling_node_keeps_teleport_only(self, spark):
        # 2 has no out-edges: it still receives teleport + inflow, but
        # its own mass is dropped (documented ranking simplification)
        edges = [(1, 2)]
        df = spark.createDataFrame(edges, "src long, dst long")
        got = {r.node: r.rank_u for r in pagerank_micro(df, iters=2).collect()}
        assert got == _reference(edges, iters=2)
        assert got[1] == 150_000  # nothing points at 1 after iter 1

    def test_null_edges_dropped_and_validation(self, spark):
        df = spark.createDataFrame(
            [(1, 2), (None, 3), (4, None)], "src long, dst long"
        )
        got = {r.node for r in pagerank_micro(df, iters=1).collect()}
        assert got == {1, 2}
        with pytest.raises(ValueError):
            pagerank_micro(df, damping_num=100, damping_den=100)
        with pytest.raises(ValueError):
            pagerank_micro(df, iters=0)

    def test_partitioning_invariance(self, spark):
        df = spark.createDataFrame(self.EDGES, "src long, dst long")
        a = sorted(map(tuple, pagerank_micro(df.repartition(7), iters=3).collect()))
        b = sorted(map(tuple, pagerank_micro(df.coalesce(1), iters=3).collect()))
        assert a == b
