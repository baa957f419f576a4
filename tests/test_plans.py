"""Plan-quality assertions: pushdown, pruning, broadcast, codegen —
the .explain() contracts that make the operators survive a 100x scale-up."""

from __future__ import annotations

from pyspark.sql import functions as F

from semstreams_spark.datagen import ensure_transcripts, transcripts_path
from semstreams_spark.extract import extract_triples
from semstreams_spark.operators.joins import resolve_aliases


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_filter_pushdown_to_parquet(spark):
    ensure_transcripts(0.001)
    df = spark.read.parquet(transcripts_path(0.001))
    q = df.filter(F.col("conv_id") == "conv_0000001").select("turn_idx", "text")
    p = _plan(q)
    assert "PushedFilters" in p and "conv_id" in p.split("PushedFilters")[1][:200]
    # column pruning: role/tool/ts not read
    rs = p.split("ReadSchema:")[-1]
    assert "role" not in rs and "tool" not in rs


def test_alias_resolution_is_broadcast_join(spark):
    df = spark.createDataFrame([("a",), ("b",)], "entity string")
    dim = spark.createDataFrame([("a", "A")], "alias string, canonical string")
    p = _plan(resolve_aliases(df, dim))
    assert "BroadcastHashJoin" in p


def test_extraction_stays_in_codegen(spark, transcripts_small):
    p = _plan(extract_triples(transcripts_small))
    # "*(N)" prefixes mark whole-stage-codegen'd operators in compact plans
    assert "*(" in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_cooccurrence_has_no_cartesian_or_bnlj(spark, transcripts_small):
    from semstreams_spark.operators.windows import entity_cooccurrence

    m = extract_triples(transcripts_small).filter(
        F.col("predicate") == "conv.turn.mentions"
    ).select(
        F.col("context").alias("conv_id"),
        F.element_at(F.split(F.col("object"), r"\."), -1).alias("entity"),
        "ts",
    )
    p = _plan(entity_cooccurrence(m))
    assert "CartesianProduct" not in p and "BroadcastNestedLoopJoin" not in p


def test_geo_bin(spark):
    from semstreams_spark.operators.textops import geo_bin

    df = spark.createDataFrame([(51.5074, -0.1278), (0.0, 0.0)], "lat double, lon double")
    out = [r["g"] for r in df.select(geo_bin(F.col("lat"), F.col("lon"), 7).alias("g")).collect()]
    assert out[0] == "geo_7_42452_53961"  # floor((51.5074+90)*300), floor((-0.1278+180)*300)
    assert out[1] == "geo_7_27000_54000"


def test_tombstone_joins_are_broadcast(spark):
    """mutations: the tiny delete dim must broadcast, never shuffle the
    state side."""
    import datetime as dt

    from semstreams_spark.operators.mutations import apply_deletes

    states = spark.createDataFrame(
        [("e1", "p", "v", dt.datetime(2025, 1, 1))],
        "subject string, predicate string, object string, ts timestamp",
    )
    deletes = spark.createDataFrame(
        [("e1", dt.datetime(2025, 1, 2))], "entity_id string, ts timestamp"
    )
    p = _plan(apply_deletes(states, deletes))
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p


def test_spatial_bbox_predicates_pushed(spark, tmp_path):
    """query_spatial over a parquet node table: lat/lon range predicates
    reach the scan."""
    from semstreams_spark.operators.textops import synthetic_coords
    from semstreams_spark.plans.api import GraphQueryAPI

    ents = spark.createDataFrame([(f"e{i}",) for i in range(50)], "id string")
    out = str(tmp_path / "nodes")
    synthetic_coords(ents, "id").write.parquet(out)
    api = GraphQueryAPI(nodes=spark.read.parquet(out), edges=None, triples=None)
    p = _plan(api.query_spatial(0, 50, 0, 50))
    assert "PushedFilters" in p and "lat" in p.split("PushedFilters")[1][:300]


def test_embedder_stays_jvm_side(spark):
    """The hashed embedder is pure Catalyst — no Python eval in the plan."""
    from semstreams_spark.search.embedder import embed_texts

    docs = spark.createDataFrame([("a", "hello world"), ("b", "graph stream")], "id string, text string")
    p = _plan(embed_texts(docs, id_col="id"))
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_pagerank_exact_no_cartesian_blowup(spark):
    """pagerank_exact: the dmass crossJoin is a 1-row broadcast, and the
    per-iteration link join is a hash join — no nested-loop over ranks."""
    from semstreams_spark.graph import pagerank_exact

    e = spark.createDataFrame([("a", "b"), ("b", "c"), ("c", "a")], "src string, dst string")
    # local_max_edges=0 pins the DISTRIBUTED loop's plan (the adaptive
    # dispatch would otherwise take the single-task path on 3 edges)
    pr = pagerank_exact(e, max_iter=2, local_max_edges=0)
    p = _plan(pr)
    assert "CartesianProduct" not in p
    ranks = {r["entity"]: r["rank"] for r in pr.collect()}
    assert abs(sum(ranks.values()) - 10**12) < 100  # mass conserved to ulp


def test_incoming_top_consolidated_gate_still_works(spark):
    """q_incoming_top was unregistered in the r4 gate consolidation
    (J5 stays value-gated via rels_in_entity); the callable remains part
    of the surface — pin its shape and agreement with the edge table."""
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    rows = entry.q_incoming_top(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 20
    assert rows[0]["n_incoming"] >= rows[-1]["n_incoming"]
    # counts agree with the mention-triple definition
    triples = entry.q_triples_extract(spark, "/root/testdata/sf0.001")
    top_dst = rows[0]["dst"]
    want = triples.filter(
        (F.col("predicate") == "conv.turn.mentions") & (F.col("object") == top_dst)
    ).count()
    assert rows[0]["n_incoming"] == want
