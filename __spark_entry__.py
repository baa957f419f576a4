"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship pipeline (transcripts → triples → entity graph)
at sf0.001. ``queries()`` — one entry per implemented operator from
SURVEY.md §2. ``oracle_sql()`` — DuckDB-equivalent SQL per query (the
transcript input is this repo's deterministic synthetic table, generated
on first use; addressed in oracle SQL via read_parquet of an absolute
path since the driver pre-registers only the TPC-H-ish views).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from semstreams_spark import oracles
from semstreams_spark.datagen import ensure_transcripts, sf_from_dir, transcripts_path, aliases_path
from semstreams_spark.extract import extract_triples
from semstreams_spark.operators import entity_states, nodes_table, edges_table, predicate_to_edge_type
from semstreams_spark.operators.joins import tool_invocation_correlation, turn_with_prior
from semstreams_spark.operators.sessions import sessionize
from semstreams_spark.operators.windows import entity_cooccurrence, node_degree_tumbling
from semstreams_spark.rules import DEFAULT_RULES, evaluate_rules

ORACLE_SF = 0.01  # the driver's correctness gate runs at sf0.01


def _transcripts(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf = sf_from_dir(sf_dir)
    ensure_transcripts(sf)
    return spark.read.parquet(transcripts_path(sf))


def _aliases(spark: SparkSession, sf_dir: str) -> DataFrame:
    sf = sf_from_dir(sf_dir)
    ensure_transcripts(sf)
    return spark.read.parquet(aliases_path(sf))


def _tbl(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: full ingest pipeline at sf0.001 — transcripts → triples →
    LWW entity states → edge upsert."""
    t = _transcripts(spark, "/root/testdata/sf0.001")
    return edges_table(extract_triples(t))


# ---------------------------------------------------------------- graph core


def q_triples_extract(spark, sf_dir):
    return extract_triples(_transcripts(spark, sf_dir))


def q_entity_states(spark, sf_dir):
    return entity_states(extract_triples(_transcripts(spark, sf_dir)))


def q_graph_nodes(spark, sf_dir):
    return nodes_table(extract_triples(_transcripts(spark, sf_dir)))


def q_graph_edges(spark, sf_dir):
    return edges_table(extract_triples(_transcripts(spark, sf_dir)))


def q_edges_resolved(spark, sf_dir):
    """Mention edges with dst resolved through the broadcast alias dim (J1)."""
    triples = extract_triples(_transcripts(spark, sf_dir))
    al = _aliases(spark, sf_dir).select(
        F.concat(F.lit("test.local.graph.kb.entity."), F.col("alias")).alias("alias_id"),
        F.concat(F.lit("test.local.graph.kb.entity."), F.col("entity_name")).alias("canonical_id"),
    )
    rel = triples.filter(F.col("object_type") == "entity_ref").select(
        F.col("subject").alias("src"),
        F.col("object").alias("dst"),
        predicate_to_edge_type(F.col("predicate")).alias("edge_type"),
        "ts",
    )
    res = (
        rel.join(F.broadcast(al), rel["dst"] == al["alias_id"], "left")
        .select(
            "src",
            F.coalesce(F.col("canonical_id"), F.col("dst")).alias("dst"),
            "edge_type",
            "ts",
        )
    )
    return res.groupBy("src", "dst", "edge_type").agg(
        F.min("ts").alias("created_at"), F.count(F.lit(1)).alias("n_obs")
    )


def q_turn_prior(spark, sf_dir):
    return turn_with_prior(_transcripts(spark, sf_dir))


def q_tool_corr(spark, sf_dir):
    return tool_invocation_correlation(_transcripts(spark, sf_dir))


def q_sessions(spark, sf_dir):
    return sessionize(_transcripts(spark, sf_dir), gap_minutes=30)


def q_degree_tumbling(spark, sf_dir):
    triples = extract_triples(_transcripts(spark, sf_dir))
    m = triples.filter(F.col("predicate") == "conv.turn.mentions").select(
        F.col("object").alias("src"), F.col("subject").alias("dst"), "ts"
    )
    return node_degree_tumbling(m, "5 minutes")


def q_cooccur_5min(spark, sf_dir):
    triples = extract_triples(_transcripts(spark, sf_dir))
    m = triples.filter(F.col("predicate") == "conv.turn.mentions").select(
        F.col("context").alias("conv_id"),
        F.element_at(F.split(F.col("object"), r"\."), -1).alias("entity"),
        "ts",
    )
    return entity_cooccurrence(m, "5 minutes")


def q_rule_events(spark, sf_dir):
    st = entity_states(extract_triples(_transcripts(spark, sf_dir)))
    return evaluate_rules(st, DEFAULT_RULES)


# ------------------------------------------------------------- relational ops

_D = "decimal(18,6)"


def q_q1_pricing(spark, sf_dir):
    """TPC-H Q1 shape (P1 filter + A aggregates); exact decimal sums cast
    to double for cross-engine determinism."""
    li = _tbl(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
    qty = F.col("l_quantity").cast(_D)
    price = F.col("l_extendedprice").cast(_D)
    disc_price = price * (F.lit(1.0) - F.col("l_discount")).cast(_D)
    charge = disc_price * (F.lit(1.0) + F.col("l_tax")).cast(_D)
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(disc_price).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / F.count(F.lit(1))).alias("avg_qty"),
            (F.sum(price).cast("double") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q_top_customers(spark, sf_dir):
    """Join (orders ⋈ broadcast customer) + group + deterministic top-10."""
    o = _tbl(spark, sf_dir, "orders")
    c = _tbl(spark, sf_dir, "customer")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(F.col("o_totalprice").cast(_D)).cast("double").alias("total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy(F.desc("total_spent"), F.asc("c_custkey"))
        .limit(10)
    )


def q_parts_no_sales(spark, sf_dir):
    """Anti join (J6): parts never shipped."""
    p = _tbl(spark, sf_dir, "part")
    li = _tbl(spark, sf_dir, "lineitem").select("l_partkey")
    return p.join(li, p["p_partkey"] == li["l_partkey"], "left_anti").select(
        "p_partkey", "p_name", "p_brand"
    )


def q_events_hourly(spark, sf_dir):
    """Hourly tumbling aggregate over the events stream table."""
    e = _tbl(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(_D)).cast("double").alias("sum_value"),
        )
    )


# ----------------------------------------------------- training-data pipeline


def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content hash (md5 of raw text): keeper + copy count."""
    d = _tbl(spark, sf_dir, "documents")
    return (
        d.select(F.md5(F.col("text")).alias("content_hash"), "doc_id")
        .groupBy("content_hash")
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def q_text_quality(spark, sf_dir):
    """Text-quality scoring: token count, char stats, punctuation ratio."""
    d = _tbl(spark, sf_dir, "documents")
    n_tokens = F.size(F.split(F.col("text"), " "))
    n_chars = F.length("text")
    non_alnum = F.length(F.regexp_replace(F.col("text"), "[a-z0-9 ]", ""))
    return d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars"),
        (n_chars.cast("double") / n_tokens.cast("double")).alias("avg_token_len"),
        (non_alnum.cast("double") / n_chars.cast("double")).alias("punct_ratio"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "triples_extract": q_triples_extract,
        "entity_states": q_entity_states,
        "graph_nodes": q_graph_nodes,
        "graph_edges": q_graph_edges,
        "edges_resolved": q_edges_resolved,
        "turn_prior": q_turn_prior,
        "tool_corr": q_tool_corr,
        "sessions": q_sessions,
        "degree_tumbling": q_degree_tumbling,
        "cooccur_5min": q_cooccur_5min,
        "rule_events": q_rule_events,
        "q1_pricing": q_q1_pricing,
        "top_customers": q_top_customers,
        "parts_no_sales": q_parts_no_sales,
        "events_hourly": q_events_hourly,
        "dedup_exact": q_dedup_exact,
        "text_quality": q_text_quality,
    }


def oracle_sql() -> dict[str, str]:
    ensure_transcripts(ORACLE_SF)
    sf = ORACLE_SF
    return {
        "triples_extract": oracles.sql_triples_extract(sf),
        "entity_states": oracles.sql_entity_states(sf),
        "graph_nodes": oracles.sql_graph_nodes(sf),
        "graph_edges": oracles.sql_graph_edges(sf),
        "edges_resolved": oracles.sql_edges_resolved(sf),
        "turn_prior": oracles.sql_turn_prior(sf),
        "tool_corr": oracles.sql_tool_corr(sf),
        "sessions": oracles.sql_sessions(sf),
        "degree_tumbling": oracles.sql_degree_tumbling(sf),
        "cooccur_5min": oracles.sql_cooccur(sf),
        "rule_events": oracles.sql_rule_events(sf),
        "q1_pricing": """
            SELECT l_returnflag, l_linestatus,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) AS sum_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) AS sum_base_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6))) AS DOUBLE) AS sum_disc_price,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(18,6)) * CAST(1.0 + l_tax AS DECIMAL(18,6))) AS DOUBLE) AS sum_charge,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
                   CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS avg_price,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "top_customers": """
            SELECT c_custkey, c_name,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) AS total_spent,
                   COUNT(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_custkey, c_name
            ORDER BY total_spent DESC, c_custkey ASC
            LIMIT 10
        """,
        "parts_no_sales": """
            SELECT p_partkey, p_name, p_brand FROM part
            WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "dedup_exact": """
            SELECT md5(text) AS content_hash, MIN(doc_id) AS keeper_doc_id,
                   COUNT(*) AS n_copies
            FROM documents GROUP BY 1
        """,
        "text_quality": """
            SELECT doc_id,
                   len(str_split(text, ' ')) AS n_tokens,
                   length(text) AS n_chars,
                   CAST(length(text) AS DOUBLE) / len(str_split(text, ' ')) AS avg_token_len,
                   CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio
            FROM documents
        """,
    }
