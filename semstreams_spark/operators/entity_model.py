"""Entity class / role / status model with validation.

Reference enums and validation: EntityClass {Object, Event, Agent, Place,
Process, Thing} (``message/entity_types.go:13-67``), EntityRole {primary,
observed, component, source, target, context, related}
(``entity_types.go:77-140``), EntityStatus {active, warning, critical,
emergency, inactive, unknown} (``types/graph/types.go:15-42``).

Spark form: the enums are plain tuples, validation/normalization are
Catalyst ``isin`` expressions (codegen), and the transcript domain gets a
deterministic class mapping from the 6-part id's type segment.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ENTITY_CLASSES = ("Object", "Event", "Agent", "Place", "Process", "Thing")
ENTITY_ROLES = ("primary", "observed", "component", "source", "target", "context", "related")
ENTITY_STATUSES = ("active", "warning", "critical", "emergency", "inactive", "unknown")

# transcript-domain type segment -> EntityClass (conversations are ongoing
# activities, turns are time-bounded happenings, tools are operable things,
# kb entities default to Thing per the reference's "generic" guidance)
_TYPE_TO_CLASS = {
    "conversation": "Process",
    "turn": "Event",
    "tool": "Object",
    "entity": "Thing",
}


def is_valid_class(col: Column) -> Column:
    """entity_types.go:60-67 IsValid."""
    return col.isin(list(ENTITY_CLASSES))


def is_valid_role(col: Column) -> Column:
    """entity_types.go:135-142 IsValid."""
    return col.isin(list(ENTITY_ROLES))


def is_valid_status(col: Column) -> Column:
    return col.isin(list(ENTITY_STATUSES))


def normalize_class(col: Column) -> Column:
    """Invalid/unknown classes collapse to 'Thing' (the reference's
    generic fallback class)."""
    return F.when(is_valid_class(col), col).otherwise(F.lit("Thing"))


def normalize_role(col: Column) -> Column:
    """Invalid/unknown roles collapse to 'related'."""
    return F.when(is_valid_role(col), col).otherwise(F.lit("related"))


def normalize_status(col: Column) -> Column:
    """Invalid/unknown statuses collapse to 'unknown'."""
    return F.when(is_valid_status(col), col).otherwise(F.lit("unknown"))


def entity_class_from_id(id_col: Column) -> Column:
    """Deterministic class for a 6-part entity id via its type segment
    (5th dot-part, ``messagemanager/processor.go:517-526``)."""
    t = F.split(id_col, r"\.")[4]
    out = F.lit("Thing")
    for typ, cls in sorted(_TYPE_TO_CLASS.items()):
        out = F.when(t == typ, F.lit(cls)).otherwise(out)
    return out
