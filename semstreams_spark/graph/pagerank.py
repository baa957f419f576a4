"""PageRank + degree centrality (G3/G4).

Reference: damped iteration with tolerance convergence
(``pkg/graphclustering/pagerank.go:50-219``, defaults damping 0.85,
tolerance 1e-6, max 100 iters at ``pagerank.go:25-33``); degree fallback
(``pagerank.go:280-326``).

Spark form: classic iterative join+agg over (src, dst) edges with
dangling-mass redistribution; localCheckpoint per iteration cuts
lineage. Deterministic: no sampling, fixed iteration order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def degree_centrality(edges: DataFrame) -> DataFrame:
    """(entity, out_degree, in_degree, degree)."""
    out_d = edges.groupBy(F.col("src").alias("entity")).agg(F.count(F.lit(1)).alias("out_degree"))
    in_d = edges.groupBy(F.col("dst").alias("entity")).agg(F.count(F.lit(1)).alias("in_degree"))
    return (
        out_d.join(in_d, "entity", "full_outer")
        .fillna(0, ["out_degree", "in_degree"])
        .withColumn("degree", F.col("out_degree") + F.col("in_degree"))
    )


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    max_iter: int = 20,
    tol: float = 1e-6,
) -> DataFrame:
    """(entity, rank), Σrank = 1. Converges when Σ|Δ| < tol."""
    nodes = (
        edges.select(F.col("src").alias("entity"))
        .unionByName(edges.select(F.col("dst").alias("entity")))
        .distinct()
        .cache()
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn("rank", F.lit(0.0))

    out_deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    links = edges.join(out_deg, "src").select("src", "dst", "deg").cache()

    ranks = nodes.withColumn("rank", F.lit(1.0 / n))
    for _ in range(max_iter):
        contribs = (
            links.join(ranks, links["src"] == ranks["entity"])
            .select(F.col("dst").alias("entity"), (F.col("rank") / F.col("deg")).alias("c"))
            .groupBy("entity")
            .agg(F.sum("c").alias("inflow"))
        )
        # dangling mass: nodes with no out-edges leak rank; redistribute
        dangling = (
            ranks.join(out_deg, ranks["entity"] == out_deg["src"], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)))
            .collect()[0][0]
        )
        base = (1.0 - damping) / n + damping * dangling / n
        new_ranks = (
            nodes.join(contribs, "entity", "left")
            .select(
                "entity",
                (F.lit(base) + F.lit(damping) * F.coalesce(F.col("inflow"), F.lit(0.0))).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
        delta = (
            new_ranks.alias("n")
            .join(ranks.alias("o"), "entity")
            .agg(F.sum(F.abs(F.col("n.rank") - F.col("o.rank"))))
            .collect()[0][0]
        )
        ranks = new_ranks
        if delta is not None and delta < tol:
            break
    nodes.unpersist()
    links.unpersist()
    return ranks
