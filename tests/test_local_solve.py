"""Adaptive single-task graph solve: the local numpy path must be
BIT-IDENTICAL to the distributed join+agg loop (both operators are
order-free by design — BIGINT fixed-point PageRank, min-label majority
LPA — so any divergence is a bug, not a tolerance)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _random_graph(seed: int, n_nodes: int, n_edges: int) -> list[tuple[str, str]]:
    """Random directed multigraph: duplicate edges (PageRank multiset
    semantics), self-loops, dangling nodes (only ever dst), and mixed-
    length ids (lexicographic tie-break coverage) all occur."""
    rng = random.Random(seed)
    names = [f"e{i}" for i in range(n_nodes)] + [f"ent_{i:03d}" for i in range(n_nodes // 3)]
    # non-ASCII ids pin that numpy's code-point string order matches
    # Spark's binary UTF-8 order in the min-label tie-break (UTF-8 is
    # code-point-order-preserving, so they must agree)
    names += ["éntity_α", "实体_1", "entity_\U0001f600"]
    edges = []
    for _ in range(n_edges):
        s, d = rng.choice(names), rng.choice(names)
        edges.append((s, d))
        if rng.random() < 0.15:  # duplicate edge
            edges.append((s, d))
    # guaranteed dangling node: appears only as a destination
    edges.append((rng.choice(names), "zz_dangling_only"))
    return edges


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_pagerank_local_matches_distributed(spark, seed):
    from semstreams_spark.graph import pagerank_exact

    e = spark.createDataFrame(_random_graph(seed, 40, 160), "src string, dst string")
    local = {(r["entity"], r["rank"]) for r in pagerank_exact(e, max_iter=6).collect()}
    dist = {
        (r["entity"], r["rank"])
        for r in pagerank_exact(e, max_iter=6, local_max_edges=0).collect()
    }
    assert local == dist and len(local) > 0


@pytest.mark.parametrize("seed", [11, 12, 13])
def test_lpa_local_matches_distributed(spark, seed):
    from semstreams_spark.graph import lpa_communities

    e = spark.createDataFrame(_random_graph(seed, 30, 90), "src string, dst string")
    local = {(r["entity"], r["community"]) for r in lpa_communities(e, max_iter=8).collect()}
    dist = {
        (r["entity"], r["community"])
        for r in lpa_communities(e, max_iter=8, local_max_edges=0).collect()
    }
    assert local == dist and len(local) > 0


def test_local_solve_runs_in_executor_not_driver(spark):
    """The local path is an applyInPandas over a constant group — a
    FlatMapGroupsInPandas in the executed plan, never a driver collect."""
    from semstreams_spark.graph import pagerank_exact

    e = spark.createDataFrame([("a", "b"), ("b", "a"), ("b", "c")], "src string, dst string")
    pr = pagerank_exact(e, max_iter=4)
    # result came from a localCheckpoint of the solve's output; re-derive
    # the lazy plan to inspect it
    from semstreams_spark.graph.local_solve import pagerank_local

    plan = pagerank_local(e, 4, 10**12, 85, 100)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" in plan
    ranks = {r["entity"]: r["rank"] for r in pr.collect()}
    assert abs(sum(ranks.values()) - 10**12) < 100  # mass conserved to ulp


def test_lpa_local_two_triangles_bridge(spark):
    """Known topology through the LOCAL path: two triangles joined by a
    bridge still resolve to min-id communities (mirrors the distributed
    test in test_dedup_similarity)."""
    from semstreams_spark.graph import lpa_communities

    e = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"), ("x", "y"), ("y", "z"), ("z", "x")],
        "src string, dst string",
    )
    out = {r["entity"]: r["community"] for r in lpa_communities(e, max_iter=8).collect()}
    assert out == {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x", "z": "x"}


def test_dispatch_threshold_env_override(spark, monkeypatch):
    from semstreams_spark.graph.local_solve import local_max_edges

    monkeypatch.setenv("SPARK_GRAFT_LOCAL_GRAPH_MAX_EDGES", "7")
    assert local_max_edges() == 7
    assert local_max_edges(123) == 7  # env wins over the caller default
    monkeypatch.delenv("SPARK_GRAFT_LOCAL_GRAPH_MAX_EDGES")
    assert local_max_edges() == 2_000_000
    assert local_max_edges(0) == 0
