"""Catalog binding for published tables (r4 VERDICT missing #3).

The published hour-partitioned directories become named external tables
in a catalog database; partition pruning flows through catalog
partition metadata; retention drops are reconciled with
``MSCK REPAIR ... SYNC PARTITIONS``.
"""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from semstreams_spark.extract.triples import extract_triples
from semstreams_spark.plans.catalog import (
    bind_published_tables,
    lakehouse_format,
    sync_table,
)
from semstreams_spark.streaming.publish import apply_retention, publish_triples

T0 = dt.datetime(2025, 1, 1, 0, 0, 0)


def _publish_hours(spark, out: str, n_hours: int = 6) -> None:
    rows = [
        ("c1", h, "user", f"msg {h} @entity:ent_a", None, T0 + dt.timedelta(hours=h))
        for h in range(n_hours)
    ]
    df = spark.createDataFrame(
        rows,
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    publish_triples(
        extract_triples(df).withColumn("kind", F.lit("triple")), out, mode="overwrite"
    )


def test_lakehouse_format_detection(spark):
    # this image ships no Iceberg/Delta jars — the probe must say so
    # honestly rather than emitting DDL that fails at first write
    assert lakehouse_format(spark) == "parquet"


def test_bind_and_catalog_pruning(spark, tmp_path):
    out = str(tmp_path / "pub")
    _publish_hours(spark, out)

    info = bind_published_tables(spark, {"triples": out}, database="semstreams_t")
    assert info["triples"]["format"] == "parquet"
    assert info["triples"]["partitions"] == 6

    # name-routed queries resolve and agree with path reads
    by_name = spark.sql("SELECT count(*) AS n FROM semstreams_t.triples").collect()[0]["n"]
    by_path = spark.read.parquet(out).count()
    assert by_name == by_path > 0

    # a partition predicate through the CATALOG touches only that
    # hour's files — the manifest-pruning behavior of a lakehouse table
    one_hour = spark.sql(
        "SELECT * FROM semstreams_t.triples WHERE hour = '2025-01-01-03'"
    )
    files = one_hour.inputFiles()
    assert files and all("hour=2025-01-01-03" in f for f in files)
    assert one_hour.count() == by_path // 6

    # rebinding the same location is a no-op, not an error
    info2 = bind_published_tables(spark, {"triples": out}, database="semstreams_t")
    assert info2["triples"]["partitions"] == 6


def test_sync_after_retention(spark, tmp_path):
    out = str(tmp_path / "pub")
    _publish_hours(spark, out)
    bind_published_tables(spark, {"triples": out}, database="semstreams_t2")
    total = spark.sql("SELECT count(*) AS n FROM semstreams_t2.triples").collect()[0]["n"]

    # drop hours 00/01 on disk, then reconcile the catalog
    entry = apply_retention(out, dt.timedelta(hours=1), T0 + dt.timedelta(hours=3))
    assert entry["dropped"] == ["2025-01-01-00", "2025-01-01-01"]
    live = sync_table(spark, "triples", database="semstreams_t2")
    assert live == 4
    after = spark.sql("SELECT count(*) AS n FROM semstreams_t2.triples").collect()[0]["n"]
    assert after == total * 4 // 6
    hours = [
        r["hour"]
        for r in spark.sql(
            "SELECT DISTINCT hour FROM semstreams_t2.triples ORDER BY hour"
        ).collect()
    ]
    assert hours == [f"2025-01-01-0{h}" for h in (2, 3, 4, 5)]


def test_catalog_table_stream_source_parity(spark, tmp_path):
    """North-star source shape: ingest reads micro-batches from a
    CATALOG TABLE (``readStream.table``) rather than a raw path. The
    table-source pipeline must produce byte-identical triples to the
    path-source pipeline over the same files."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semstreams_spark.streaming import (
        build_ingest_stream,
        read_transcript_stream,
        read_transcript_stream_from_table,
    )

    indir = str(tmp_path / "in")
    os.makedirs(indir)
    for fi in range(3):
        rows = {
            "conv_id": [f"c{fi}"] * 4,
            "turn_idx": pa.array(range(4), type=pa.int32()),
            "role": ["user", "assistant"] * 2,
            "text": [f"msg {i} @entity:ent_{fi}" for i in range(4)],
            "tool": pa.array([None] * 4, type=pa.string()),
            "ts": pa.array(
                [pd.Timestamp(T0 + dt.timedelta(hours=fi, seconds=20 * i)) for i in range(4)],
                type=pa.timestamp("us"),
            ),
        }
        path = os.path.join(indir, f"f{fi}.parquet")
        pq.write_table(pa.table(rows), path)
        os.utime(path, (1_700_000_000 + 10 * fi,) * 2)

    spark.sql("CREATE DATABASE IF NOT EXISTS semstreams_src")
    spark.sql(
        "CREATE TABLE IF NOT EXISTS semstreams_src.transcripts ("
        "conv_id string, turn_idx int, role string, text string, "
        f"tool string, ts timestamp) USING parquet LOCATION '{indir}'"
    )

    key = ["subject", "predicate", "object", "object_type", "ts"]
    outs = []
    for tag, src in (
        ("path", read_transcript_stream(spark, indir, max_files_per_trigger=1)),
        (
            "table",
            read_transcript_stream_from_table(
                spark, "semstreams_src.transcripts", max_files_per_trigger=1
            ),
        ),
    ):
        out, ckpt = str(tmp_path / f"out_{tag}"), str(tmp_path / f"ckpt_{tag}")
        q, sink = build_ingest_stream(src, out, checkpoint_dir=ckpt, watermark="2 days")
        q.awaitTermination()
        triples = sink.read(spark).filter(F.col("kind") == "triple")
        outs.append(sorted(map(tuple, triples.select(*key).collect())))
    assert outs[0] == outs[1] and len(outs[0]) > 0


def test_rebind_new_location(spark, tmp_path):
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    _publish_hours(spark, a, n_hours=2)
    _publish_hours(spark, b, n_hours=4)
    bind_published_tables(spark, {"triples": a}, database="semstreams_t3")
    assert spark.sql("SHOW PARTITIONS semstreams_t3.triples").count() == 2
    # moving the binding to a new published root recreates the external
    # definition without touching either directory's data
    bind_published_tables(spark, {"triples": b}, database="semstreams_t3")
    assert spark.sql("SHOW PARTITIONS semstreams_t3.triples").count() == 4
    assert os.path.isdir(os.path.join(a, "hour=2025-01-01-00"))
