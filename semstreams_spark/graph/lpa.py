"""Label-propagation community detection (G2).

Reference: async LPA with RANDOM node order and random tie-breaks
(``pkg/graphclustering/lpa.go:99-233``, shuffle at ``lpa.go:173-178``) —
non-deterministic by construction. Our engine deliberately fixes that
(SURVEY §4.2.4): synchronous label propagation, majority vote with
min-label tie-break — bit-reproducible on any cluster size.

Each iteration: one join (labels→edges) + one two-level agg (count votes,
argmax with min-label tie-break). localCheckpoint cuts lineage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def lpa_communities(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """(entity, community) — community = min entity id of the cluster's
    converged label. Undirected propagation."""
    und = (
        edges.select("src", "dst")
        .unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .cache()
    )
    labels = (
        und.select(F.col("src").alias("entity"))
        .distinct()
        .withColumn("label", F.col("entity"))
    )
    for _ in range(max_iter):
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
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "entity")
            .filter(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    und.unpersist()
    return labels.select("entity", F.col("label").alias("community"))
