"""SQL-facing query surface: §2.11 queries runnable via spark.sql alone
after register_graph_views — results must match the DataFrame API
(plans.api.GraphQueryAPI) on the same derived tables."""

from __future__ import annotations

from pyspark.sql import functions as F

from semstreams_spark.plans.api import GraphQueryAPI
from semstreams_spark.plans.sql_surface import SQL_QUERIES, register_graph_views, sql


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_sql_surface_matches_dataframe_api(spark, transcripts_small):
    views = register_graph_views(spark, transcripts_small, cache_triples=True)
    api = GraphQueryAPI(views["nodes"], views["edges"], views["triples"])

    ent = views["edges"].select("dst").orderBy(F.desc("n_obs"), "dst").first()["dst"]

    # GetEntity
    got = spark.sql(SQL_QUERIES["get_entity"].format(entity_id=ent))
    assert _rows(got) == _rows(api.get_entity(ent))

    # QueryByPredicate
    got = sql(spark, "query_by_predicate", predicate="conv.turn.mentions")
    want = api.query_by_predicate("conv.turn.mentions")
    assert _rows(got) == _rows(want) and got.count() > 0

    # QueryTemporal
    start, end = "2025-01-01 00:00:00", "2025-01-01 02:00:00"
    got = sql(spark, "query_temporal", start=start, end=end)
    want = api.query_temporal(start, end)
    assert got.count() == want.count() > 0

    # Relationships in / both
    got = sql(spark, "relationships_in", entity_id=ent)
    assert _rows(got) == _rows(api.relationships_in(ent)) and got.count() > 0
    got = sql(spark, "relationships_both", entity_id=ent)
    want = api.relationships_both(ent).select("src", "dst", "edge_type")
    assert _rows(got) == _rows(want)

    # incoming_top (J5 reverse lookup as plain SQL)
    top = sql(spark, "incoming_top", k=5).collect()
    assert len(top) == 5 and top[0]["dst"] == ent


def test_sql_surface_analytics_views(spark, transcripts_small):
    """Round-5 worklist #8: the CEP/window family is SQL-reachable —
    sessions, tumbling degree, rule events, and community top-N run via
    spark.sql alone and match their DataFrame-API counterparts
    row-for-row. rule_events' canonical SQL is COMPILED from the same
    DEFAULT_RULES the engine evaluates."""
    from semstreams_spark.plans.sql_surface import rule_events_sql

    views = register_graph_views(spark, transcripts_small, cache_triples=True, analytics=True)

    # sessions: canonical SQL == sessionize()
    got = spark.sql(SQL_QUERIES["sessions"].format(gap_us=30 * 60 * 1_000_000))
    assert _rows(got) == _rows(views["sessions"]) and got.count() > 0

    # tumbling degree: canonical SQL == node_degree_tumbling()
    got = spark.sql(SQL_QUERIES["degree_tumbling"].format(width="5 minutes"))
    assert _rows(got) == _rows(views["degree_5min"]) and got.count() > 0

    # rule events: compiled SQL == evaluate_rules(DEFAULT_RULES)
    got = spark.sql(rule_events_sql())
    assert _rows(got) == _rows(views["rule_events"]) and got.count() > 0

    # community top-N over the registered LPA membership view
    top = spark.sql(SQL_QUERIES["community_top"].format(k=3)).collect()
    want = (
        views["communities"]
        .groupBy("community")
        .count()
        .orderBy(F.desc("count"), "community")
        .limit(3)
        .collect()
    )
    assert [(r["community"], r["n_members"]) for r in top] == [
        (r["community"], r["count"]) for r in want
    ]
    assert len(top) == 3


def test_sql_functions_registered(spark, transcripts_small):
    register_graph_views(spark, transcripts_small)
    row = spark.sql(
        "SELECT predicate_to_edge_type('conv.turn.mentions') AS et, "
        "entity_type_of('test.local.graph.kb.entity.ent_001') AS ty"
    ).first()
    assert row["et"] == "mentions_turn"
    assert row["ty"] == "entity"


def test_sql_surface_prunes_and_pushes_down(spark, transcripts_small):
    """The SQL views are plans, not copies: a predicate filter through
    the view reaches the scan (no full materialization)."""
    register_graph_views(spark, transcripts_small)
    plan = spark.sql(
        SQL_QUERIES["query_by_predicate"].format(predicate="conv.turn.mentions")
    )._jdf.queryExecution().executedPlan().toString()
    assert "Filter" in plan or "PushedFilters" in plan
