"""Label-propagation community detection (G2).

Reference: async LPA with RANDOM node order and random tie-breaks
(``pkg/graphclustering/lpa.go:99-233``, shuffle at ``lpa.go:173-178``) —
non-deterministic by construction. Our engine deliberately fixes that
(SURVEY §4.2.4): synchronous label propagation, majority vote with
min-label tie-break — bit-reproducible on any cluster size.

Each iteration: one join (labels→edges) + one two-level agg (count votes,
argmax with min-label tie-break). localCheckpoint cuts lineage.

Synchronous LPA with pure neighbor votes oscillates on bipartite
structures (a 2-node component flips labels forever); each node therefore
also votes its OWN current label once — the classic convergence fix,
deterministic, and equivalent on non-oscillating graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ._width import iteration_shuffle_width


def lpa_communities(
    edges: DataFrame, max_iter: int = 10, local_max_edges: int | None = None
) -> DataFrame:
    """(entity, community) — community = min entity id of the cluster's
    converged label. Undirected propagation.

    Adaptive execution (same dispatch as pagerank_exact): under
    ``local_max_edges`` (default 2M, env
    ``SPARK_GRAFT_LOCAL_GRAPH_MAX_EDGES``) the vote loop runs vectorized
    in ONE executor task — bit-identical (min-label votes are
    order-free; parity-tested) without max_iter join+agg rounds of
    fixed cost. Larger graphs take the distributed loop."""
    from .local_solve import local_max_edges as _lme, lpa_local

    # pin the (possibly expensively derived) edge input before the
    # dispatch count — it feeds either path exactly once more. Only
    # take ownership if the caller hasn't already cached this plan
    # (lpa_hierarchy has): unpersisting a borrowed cache would evict it
    # mid-flight for the caller.
    e = edges.select("src", "dst")
    # storageLevel plan-matches against the cache manager (is_cached
    # does not): a projection of a cached plan reports the cached level
    lvl = e.storageLevel
    owned = not (lvl.useMemory or lvl.useDisk)
    if owned:
        e = e.cache()
    if e.count() <= _lme(local_max_edges):
        out = lpa_local(e, max_iter).localCheckpoint(eager=True)
        if owned:
            e.unpersist()
        return out
    bidir = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # self-loop per node = one self-vote (see module docstring)
    und = (
        bidir.unionByName(bidir.select("src", F.col("src").alias("dst")))
        .distinct()
        .cache()
    )
    labels = (
        und.select(F.col("src").alias("entity"))
        .distinct()
        .withColumn("label", F.col("entity"))
    )
    n = labels.count()  # materializes und's cache; e no longer needed
    if owned:
        e.unpersist()
    # label votes are min_by-deterministic regardless of partitioning, so
    # the graph-sized shuffle width changes only per-iteration fixed cost
    with iteration_shuffle_width(edges.sparkSession, n):
        for it in range(max_iter):
            votes = (
                und.join(labels, und["dst"] == labels["entity"])
                .groupBy(F.col("src"), F.col("label"))
                .agg(F.count(F.lit(1)).alias("n"))
            )
            # majority label; ties -> lexicographically smallest label:
            # minimize (-n, label)
            best = votes.groupBy("src").agg(
                F.expr("min_by(label, struct(-n, label))").alias("new_label")
            )
            new_labels = best.select(F.col("src").alias("entity"), F.col("new_label").alias("label"))
            new_labels = new_labels.localCheckpoint(eager=True)
            prev, labels = labels, new_labels
            # convergence test costs a driver action — sample every 3rd
            # iteration (matches the pagerank pattern); extra iterations after
            # convergence are idempotent, so sampling never changes the result
            if it % 3 == 2 or it == max_iter - 1:
                changed = (
                    labels.alias("n")
                    .join(prev.alias("o"), "entity")
                    .filter(F.col("n.label") != F.col("o.label"))
                    .count()
                )
                if changed == 0:
                    break
    und.unpersist()
    return labels.select("entity", F.col("label").alias("community"))


def lpa_hierarchy(edges: DataFrame, levels: int = 3, max_iter: int = 8) -> DataFrame:
    """Hierarchical LPA (reference default 3 levels, max 10:
    ``pkg/graphclustering/lpa.go:20-23,39,73-79``): level 0 = LPA over the
    raw graph; level k+1 = LPA over the COMMUNITY graph of level k (one
    super-node per community, an edge wherever any cross-community edge
    exists). Communities with no cross-community edges keep their own id.

    Returns (entity, level, community) long-form — GraphRAG local/global
    search binds its `level` parameter by filtering this table
    (``querymanager/graphrag_search.go:43-106``).

    Scale shape: the community graph shrinks geometrically per level, so
    upper levels cost a fraction of level 0; each level is the same
    join+agg LPA loop.
    """
    if levels < 1:
        raise ValueError("levels must be >= 1")
    # cache the (possibly expensively derived) edge input once: it feeds
    # level-0 LPA and every level's community-graph build, each a separate
    # action chain
    e = edges.select("src", "dst").cache()
    members = lpa_communities(e, max_iter).localCheckpoint(eager=True)
    out = members.withColumn("level", F.lit(0))
    for lvl in range(1, levels):
        ms = members.select(F.col("entity").alias("src"), F.col("community").alias("c_src"))
        md = members.select(F.col("entity").alias("dst"), F.col("community").alias("c_dst"))
        ce = (
            e.join(ms, "src")
            .join(md, "dst")
            .filter(F.col("c_src") != F.col("c_dst"))
            .select(F.col("c_src").alias("src"), F.col("c_dst").alias("dst"))
            .distinct()
        )
        if ce.isEmpty():
            break
        sup = lpa_communities(ce, max_iter).toDF("community", "up")
        members = (
            members.join(sup, "community", "left")
            .select(
                "entity",
                F.coalesce(F.col("up"), F.col("community")).alias("community"),
            )
            .localCheckpoint(eager=True)
        )
        out = out.unionByName(members.withColumn("level", F.lit(lvl)))
    e.unpersist()
    return out.select("entity", "level", "community")
