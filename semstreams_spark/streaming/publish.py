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

import datetime as dt
import json
import os
import re
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# per-table retention horizons mirroring the reference's KV bucket TTLs
# (graph/query/client.go:45-80: entity states 24h / history 3,
# spatial index 1h, incoming index 24h) — on disk, TTL eviction becomes
# an hour-partition drop
RETENTION_DEFAULTS: dict[str, dt.timedelta] = {
    "entity_states": dt.timedelta(hours=24),
    "spatial": dt.timedelta(hours=1),
    "incoming": dt.timedelta(hours=24),
}

_HOUR_RE = re.compile(r"^\d{4}-\d{2}-\d{2}-\d{2}$")


def apply_retention(
    table_dir: str, retention: dt.timedelta, now: dt.datetime
) -> dict:
    """W6 on disk (round-5 worklist #7): idempotently drop hour
    partitions of a published table older than ``now - retention``,
    ledger-recorded like a batch commit.

    Reader safety and crash safety come from a two-phase drop:
    1. each expired ``hour=…`` directory is atomically RENAMED into the
       underscore-prefixed ``_trash/`` staging dir — Spark/Hadoop
       readers skip ``_``-paths, so a concurrent reader's directory
       listing never sees a half-deleted partition (POSIX keeps already
       -open files readable regardless);
    2. the run is recorded in ``_retention/<n>.json`` (atomic
       tmp+replace — the analogue of the sink's ledger commit);
    3. only then is trash physically removed. A crash between (1) and
       (3) leaves invisible trash that the NEXT run sweeps, never a
       reader-visible partial state.

    Returns the ledger entry: {run, cutoff_hour, dropped, swept}.
    Re-running with the same ``now`` drops nothing (idempotent).
    """
    cutoff_hour = (now - retention).strftime("%Y-%m-%d-%H")
    trash = os.path.join(table_dir, "_trash")
    ledger_dir = os.path.join(table_dir, "_retention")
    os.makedirs(ledger_dir, exist_ok=True)

    # sweep trash abandoned by a previously crashed run first
    swept = []
    if os.path.isdir(trash):
        for name in sorted(os.listdir(trash)):
            shutil.rmtree(os.path.join(trash, name), ignore_errors=True)
            swept.append(name)

    dropped = []
    for name in sorted(os.listdir(table_dir)):
        if not name.startswith("hour="):
            continue
        hour = name.split("=", 1)[1]
        if not _HOUR_RE.match(hour):
            continue  # foreign dir — never touch what we can't parse
        if hour < cutoff_hour:
            os.makedirs(trash, exist_ok=True)
            os.rename(os.path.join(table_dir, name), os.path.join(trash, name))
            dropped.append(hour)

    n = sum(1 for f in os.listdir(ledger_dir) if f.endswith(".json"))
    entry = {
        "run": n,
        "run_at": now.isoformat(),
        "retention_seconds": int(retention.total_seconds()),
        "cutoff_hour": cutoff_hour,
        "dropped": dropped,
        "swept": swept,
    }
    tmp = os.path.join(ledger_dir, f"{n}.json.tmp")
    with open(tmp, "w") as fh:
        json.dump(entry, fh)
    os.replace(tmp, os.path.join(ledger_dir, f"{n}.json"))

    if os.path.isdir(trash):
        for name in sorted(os.listdir(trash)):
            shutil.rmtree(os.path.join(trash, name), ignore_errors=True)
    return entry


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
