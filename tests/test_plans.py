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
