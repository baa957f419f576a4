"""Context flags (R8): bounded path query from an entity + rule
evaluation over the connected neighborhood → boolean flags.

Reference: ``processor/context/processor.go:409-533`` — walk a bounded
path from the subject entity, evaluate edge/property/status rules over
the nodes on the path, publish a flags map with a context-ready event.

Spark shape: graph.traversal bounded BFS supplies the neighborhood;
rules.engine evaluates over the neighborhood's entity states; the flag
for a rule is "any entity in the neighborhood matches".
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..graph.traversal import bounded_traversal
from .engine import Rule, evaluate_rules


def context_flags(
    edges: DataFrame,
    entity_states: DataFrame,  # (subject, predicate, object, ts)
    start_entity: str,
    rules: list[Rule],
    max_depth: int = 2,
    edge_filter: list[str] | None = None,
) -> dict[str, bool]:
    """Evaluate rules over the ≤max_depth neighborhood of start_entity.

    Returns {rule_id: bool} — True iff any neighborhood entity matches.
    Driver-side dict by design: this is the point-query API shape (the
    reference replies a flags map over NATS); the set-oriented form is
    ``evaluate_rules(states.join(neighborhood, ...))`` for batch scoring
    of many entities at once.
    """
    hood = bounded_traversal(
        edges, start_entity, max_depth=max_depth, edge_filter=edge_filter
    ).select(F.col("entity").alias("subject"))
    local_states = entity_states.join(F.broadcast(hood), "subject", "left_semi")
    fired = {
        r["rule_id"]
        for r in evaluate_rules(local_states, rules).select("rule_id").distinct().collect()
    }
    return {rule.id: rule.id in fired for rule in rules if rule.enabled}
