"""Streaming windowed aggregates, session windows, and write-coalescing
parity (reference: 20 rapid updates → <10 writes,
processor_performance_test.go:164 — here: one coalesced sink commit per
micro-batch regardless of per-entity update count)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from semstreams_spark.operators.sessions import session_window_streaming
from semstreams_spark.streaming import build_ingest_stream, read_transcript_stream
from semstreams_spark.streaming.pipeline import windowed_degree_stream
from tests.test_streaming import _mk_rows, _write_file

T0 = dt.datetime(2025, 1, 1)


def _stream(spark, indir, mfpt=10):
    return read_transcript_stream(spark, indir, max_files_per_trigger=mfpt)


def _run_to_memory(df, name):
    q = (
        df.writeStream.outputMode("append")
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def test_windowed_degree_stream(spark, tmp_path):
    indir = str(tmp_path / "in")
    rows = _mk_rows("c1", 6, T0, mention="ent_x") + _mk_rows("c2", 4, T0, mention="ent_y")
    _write_file(indir, "f1.parquet", rows)
    # close the window: a much later row pushes the watermark past it
    _write_file(indir, "f2.parquet", _mk_rows("c3", 2, T0 + dt.timedelta(hours=2)))

    agg = windowed_degree_stream(_stream(spark, indir, mfpt=1), watermark="1 minute", width="5 minutes")
    _run_to_memory(agg, "deg_out")
    out = {(r["entity"], r["window_start"]): r for r in spark.sql("select * from deg_out").collect()}
    ent_x = [v for (e, _), v in out.items() if e == "ent_x"]
    assert ent_x and sum(r["in_degree"] for r in ent_x) == 6
    assert all(r["window_start"].minute % 5 == 0 for r in out.values())


def test_session_window_streaming(spark, tmp_path):
    indir = str(tmp_path / "in")
    rows = _mk_rows("c1", 3, T0) + _mk_rows("c1", 2, T0 + dt.timedelta(hours=1))
    # turn_idx overlap would dedup rows — shift the second session's idx
    rows = rows[:3] + [("c1", i + 10, r, t, tool, ts) for (_, i, r, t, tool, ts) in rows[3:]]
    _write_file(indir, "f1.parquet", rows)
    _write_file(indir, "f2.parquet", _mk_rows("c9", 2, T0 + dt.timedelta(hours=5)))

    sw = session_window_streaming(_stream(spark, indir, mfpt=1), gap="30 minutes", watermark="1 minute")
    _run_to_memory(sw, "sess_out")
    sessions = spark.sql("select * from sess_out where conv_id = 'c1'").collect()
    assert len(sessions) == 2
    assert sorted(r["n_turns"] for r in sessions) == [2, 3]


def test_write_coalescing_one_commit_per_batch(spark, tmp_path):
    """Many updates inside one micro-batch coalesce to exactly one sink
    commit (ledger entry) — the micro-batch IS the reference's 50ms
    flush window (datamanager/config.go:76-99)."""
    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")
    _write_file(indir, "f1.parquet", _mk_rows("hot", 20, T0))  # 20 rapid updates, 1 conv
    stream = read_transcript_stream(spark, indir, max_files_per_trigger=10)
    q, sink = build_ingest_stream(stream, outdir, checkpoint_dir=ckpt, watermark="2 days")
    q.awaitTermination()
    committed = [e for e in sink.ledger() if e["rows"] > 0]
    assert len(committed) == 1  # 20 updates -> 1 write batch
    assert committed[0]["rows"] >= 20 * 4  # all triples present, coalesced
