"""Published graph tables: hour-partitioned, pruning-friendly layout.

The reference's TEMPORAL_INDEX (hourly bucket keys,
``indexmanager/manager.go:1316-1324``) and ObjectStore time-bucketed keys
(``storage/objectstore/store.go:311-340``) become plain partition
columns here — Catalyst partition pruning replaces the hand-built index
scan. At 100 TB the triples table is partitioned by (event hour) so a
temporal query touches only its hour directories, and kind-specific
tables (nodes/edges) are derived views compacted per batch.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def publish_triples(deltas: DataFrame, out_dir: str, mode: str = "append") -> None:
    """Write delta triples hour-partitioned: ``hour=yyyy-MM-dd-HH/``."""
    (
        deltas.filter(F.col("kind") == "triple")
        .withColumn("hour", F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd-HH"))
        .write.mode(mode)
        .partitionBy("hour")
        .parquet(out_dir)
    )


def read_triples_hour_range(spark: SparkSession, dir_: str, start_hour: str, end_hour: str) -> DataFrame:
    """Temporal query that prunes to the hour partitions in range —
    the Spark restatement of the reference's hourly bucket scan."""
    df = spark.read.parquet(dir_)
    return df.filter((F.col("hour") >= start_hour) & (F.col("hour") <= end_hour))


def compact_entity_tables(spark: SparkSession, triples_dir: str, out_root: str) -> None:
    """Periodic compaction: LWW entity states + node/edge tables from the
    accumulated triple log (the Iceberg-MERGE equivalent for plain
    parquet; on a real lakehouse this is a MERGE INTO per batch)."""
    from ..operators.merge import edges_table, entity_states, nodes_table

    t = spark.read.parquet(triples_dir)
    # accept either the delta-row shape (conv_id/turn_idx) or the triple
    # shape (context/seq)
    if "seq" not in t.columns:
        t = t.withColumn("seq", F.col("turn_idx"))
    if "context" not in t.columns:
        t = t.withColumn("context", F.col("conv_id"))
    for col, default in (("source", F.lit("transcript_extractor")), ("confidence", F.lit(1.0))):
        if col not in t.columns:
            t = t.withColumn(col, default)
    entity_states(t).write.mode("overwrite").parquet(os.path.join(out_root, "entity_states"))
    nodes_table(t).write.mode("overwrite").parquet(os.path.join(out_root, "nodes"))
    edges_table(t).write.mode("overwrite").parquet(os.path.join(out_root, "edges"))
