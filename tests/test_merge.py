"""LWW merge semantics — mirrors the reference's MergeTriples contract
(graph/helpers.go:101-134): newer wins per (subject, predicate),
non-conflicting old triples kept; edge upsert keyed (src,dst,edge_type)
(types/graph/types.go:125-134). Late rows must NOT overwrite newer state."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from semstreams_spark.operators import edges_table, entity_states, nodes_table

TS = dt.datetime(2025, 1, 1)


def _triples(spark, rows):
    cols = ["subject", "predicate", "object", "object_type", "source", "ts", "confidence", "context", "seq"]
    return spark.createDataFrame(rows, schema=cols)


def base(subj, pred, obj, ts_offset_s, seq, otype="string"):
    return (subj, pred, obj, otype, "x", TS + dt.timedelta(seconds=ts_offset_s), 1.0, "c", seq)


def test_newer_wins(spark):
    t = _triples(
        spark,
        [
            base("a.b.c.d.e.1", "p.q.r", "old", 0, 0),
            base("a.b.c.d.e.1", "p.q.r", "new", 10, 1),
            base("a.b.c.d.e.1", "other.pred", "kept", 0, 0),
        ],
    )
    st = {(r["predicate"]): r["object"] for r in entity_states(t).collect()}
    assert st["p.q.r"] == "new"
    assert st["other.pred"] == "kept"


def test_late_row_does_not_overwrite(spark):
    """A row arriving later (higher seq in a later batch) but with an older
    event time must lose: LWW is event-time ordered, not arrival ordered."""
    t = _triples(
        spark,
        [
            base("a.b.c.d.e.1", "p.q.r", "current", 100, 5),
            base("a.b.c.d.e.1", "p.q.r", "late-straggler", 50, 9),
        ],
    )
    st = entity_states(t).collect()
    assert len(st) == 1 and st[0]["object"] == "current"


def test_tie_break_deterministic(spark):
    """Equal (ts, seq): object desc decides — bit-reproducible output."""
    t = _triples(
        spark,
        [
            base("a.b.c.d.e.1", "p.q.r", "alpha", 0, 0),
            base("a.b.c.d.e.1", "p.q.r", "beta", 0, 0),
        ],
    )
    st = entity_states(t).collect()
    assert len(st) == 1 and st[0]["object"] == "beta"


def test_node_version_counts_update_events(spark):
    t = _triples(
        spark,
        [
            base("a.b.c.d.e.1", "p1", "v1", 0, 0),
            base("a.b.c.d.e.1", "p2", "v2", 0, 0),  # same event (ts, seq)
            base("a.b.c.d.e.1", "p1", "v3", 10, 1),  # second event
        ],
    )
    n = nodes_table(t).collect()
    assert len(n) == 1
    assert n[0]["version"] == 2
    assert n[0]["type"] == "e"
    assert n[0]["updated_at"] == TS + dt.timedelta(seconds=10)


def test_edge_upsert(spark):
    t = _triples(
        spark,
        [
            base("a.b.c.d.e.1", "x.turn.mentions", "f.g.h.i.j.9", 0, 0, "entity_ref"),
            base("a.b.c.d.e.1", "x.turn.mentions", "f.g.h.i.j.9", 20, 1, "entity_ref"),
            base("a.b.c.d.e.1", "x.turn.in", "f.g.h.i.j.9", 5, 0, "entity_ref"),
        ],
    )
    e = {r["edge_type"]: r for r in edges_table(t).collect()}
    assert set(e) == {"mentions_turn", "in_turn"}
    m = e["mentions_turn"]
    assert m["n_obs"] == 2
    assert m["created_at"] == TS
    assert m["updated_at"] == TS + dt.timedelta(seconds=20)


def test_property_triples_excluded_from_edges(spark):
    t = _triples(spark, [base("a.b.c.d.e.1", "p.q.r", "just a string", 0, 0)])
    assert edges_table(t).count() == 0
