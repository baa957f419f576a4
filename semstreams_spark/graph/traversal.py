"""Bounded path traversal (PathRAG-style, G1).

Reference: DFS with MaxDepth/MaxNodes/EdgeFilter/DecayFactor and cycle
avoidance (``graph/query/client.go:456-726``). Spark re-expression:
level-synchronous frontier BFS — each hop is one join against the edge
table; relevance decays per hop; a node keeps its best (max) score over
all paths; cycle avoidance falls out of keeping min-depth-first-win.

At scale the edge table is hash-partitioned by src so each hop is a
shuffle-free (co-partitioned) join after the first; locally Catalyst
broadcast-joins the frontier (tiny) against edges — exactly what a
1000-executor cluster would do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def bounded_traversal(
    edges: DataFrame,
    start: str,
    max_depth: int = 3,
    decay: float = 0.85,
    edge_filter: list[str] | None = None,
    max_nodes: int | None = None,
    bidirectional: bool = True,
) -> DataFrame:
    """BFS from `start` to max_depth. Returns (entity, depth, score):
    depth = first-reach hop count, score = decay^depth (relevance,
    ``client.go`` DecayFactor semantics), deterministic.

    edges: (src, dst, edge_type). bidirectional follows both directions
    (the reference enriches incoming + outgoing, J5).
    """
    spark: SparkSession = edges.sparkSession
    e = edges.select("src", "dst", "edge_type")
    if edge_filter:
        e = e.filter(F.col("edge_type").isin(edge_filter))
    if bidirectional:
        e = e.select("src", "dst").unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
    else:
        e = e.select("src", "dst")
    e = e.distinct()

    visited = spark.createDataFrame(
        [(start, 0, 1.0)], "entity string, depth int, score double"
    )
    frontier = visited
    for d in range(1, max_depth + 1):
        nxt = (
            frontier.join(e, frontier["entity"] == e["src"])
            .select(
                F.col("dst").alias("entity"),
                F.lit(d).alias("depth"),
                (F.col("score") * F.lit(decay)).alias("score"),
            )
            .distinct()
            .join(visited.select("entity"), "entity", "left_anti")
        )
        if max_nodes is not None:
            remaining = max_nodes - visited.count()
            if remaining <= 0:
                break
            nxt = nxt.orderBy(F.desc("score"), F.asc("entity")).limit(remaining)
        nxt = nxt.localCheckpoint(eager=True)  # cut lineage per hop
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt
    return visited
