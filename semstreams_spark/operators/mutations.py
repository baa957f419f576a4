"""Entity delete / tombstone mutations.

Reference: entity delete and edge removal in the graph processor
(``processor/graph/mutations.go:169`` DeleteEntity, ``:354`` edge
cleanup), and the rule processor reacting to DELETED state changes
(``processor/rule/entity_watcher.go:60-109``).

Model: a **deletes table** ``(entity_id, ts)`` of tombstone events,
merged with entity state by event-time LWW:

- a tombstone at ``ts_d`` kills all state with ``ts <= ts_d``
  (delete wins ties — deterministic contract, SURVEY §4.2.4);
- a later update RECREATES the entity (status back to active, version
  keeps counting — the reference bumps Version on every mutation);
- edges touching a dead entity are dropped unless observed after the
  tombstone.

All pure Catalyst: the tombstone dimension is tiny relative to state, so
every join below broadcasts; at 10^12 rows the state side never
shuffles for these operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def latest_deletes(deletes: DataFrame) -> DataFrame:
    """(entity_id, deleted_at, n_deletes): last tombstone per entity."""
    return deletes.groupBy("entity_id").agg(
        F.max("ts").alias("deleted_at"), F.count(F.lit(1)).alias("n_deletes")
    )


def apply_deletes(states: DataFrame, deletes: DataFrame, subject_col: str = "subject") -> DataFrame:
    """Flat state table minus tombstoned rows: a property row survives iff
    it is strictly newer than its subject's last tombstone (recreate
    semantics — ``mutations.go:169`` removes state, later upserts
    re-add it)."""
    d = latest_deletes(deletes).select("entity_id", "deleted_at")
    out = states.join(
        F.broadcast(d), states[subject_col] == d["entity_id"], "left"
    )
    return out.filter(
        F.col("deleted_at").isNull() | (F.col("ts") > F.col("deleted_at"))
    ).drop("entity_id", "deleted_at")


def nodes_with_status(nodes: DataFrame, deletes: DataFrame) -> DataFrame:
    """Node table with tombstone status: ``deleted`` when the last
    tombstone is >= the node's last update (delete wins ties), ``active``
    otherwise (including recreated entities); version bumps by the number
    of tombstones (reference CAS version bump per mutation,
    ``datamanager/manager.go:693-743``). Adds ``deleted_at`` (null when
    never tombstoned)."""
    d = latest_deletes(deletes)
    out = nodes.join(F.broadcast(d), nodes["id"] == d["entity_id"], "left")
    dead = F.col("deleted_at").isNotNull() & (F.col("deleted_at") >= F.col("updated_at"))
    return out.select(
        "id",
        "type",
        F.when(dead, F.lit("deleted")).otherwise(F.lit("active")).alias("status"),
        (F.col("version") + F.coalesce(F.col("n_deletes"), F.lit(0))).alias("version"),
        "updated_at",
        "deleted_at",
    )


def edges_after_deletes(edges: DataFrame, deletes: DataFrame) -> DataFrame:
    """Edge cleanup (``mutations.go:354``): drop edges whose src OR dst
    entity is tombstoned at-or-after the edge's last observation; an edge
    observed after the tombstone (recreated entity) survives."""
    d = latest_deletes(deletes).select("entity_id", "deleted_at")
    out = edges
    for side in ("src", "dst"):
        dd = d.select(
            F.col("entity_id").alias(f"_{side}_id"), F.col("deleted_at").alias(f"_{side}_del")
        )
        out = out.join(F.broadcast(dd), out[side] == dd[f"_{side}_id"], "left").filter(
            F.col(f"_{side}_del").isNull() | (F.col("updated_at") > F.col(f"_{side}_del"))
        ).drop(f"_{side}_id", f"_{side}_del")
    return out


def deletion_events(deletes: DataFrame, rule_id: str = "entity_deleted") -> DataFrame:
    """DELETED-trigger rule path (``entity_watcher.go:60-109``): one rule
    event per tombstone, same (rule_id, entity_id, ts) shape as
    rules.evaluate_rules output so it unions into the event stream."""
    return deletes.select(
        F.lit(rule_id).alias("rule_id"), F.col("entity_id"), F.col("ts")
    )
