"""Distributed BFS reachability (followNextEOG, Extensions.kt:139-165)
as iterative frontier joins — cycles terminate, depths are minimal."""

from __future__ import annotations

from pyspark.sql import functions as F

from cpg_spark.operators.cc import bfs_reachable


def test_bfs_min_depth_and_cycle(spark):
    # 1 -> 2 -> 3 -> 1 (cycle), 2 -> 4, 5 isolated, 1 -> 4 (shortcut)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (2, 4), (1, 4), (5, 6)], "src long, dst long")
    sources = spark.createDataFrame([(1,)], "node long")
    got = {(r["node"], r["min_depth"])
           for r in bfs_reachable(edges, sources).collect()}
    assert got == {(1, 0), (2, 1), (4, 1), (3, 2)}


def test_bfs_multi_source(spark):
    edges = spark.createDataFrame([(1, 2), (3, 4)], "src long, dst long")
    sources = spark.createDataFrame([(1,), (3,)], "node long")
    got = {(r["node"], r["min_depth"])
           for r in bfs_reachable(edges, sources).collect()}
    assert got == {(1, 0), (3, 0), (2, 1), (4, 1)}
