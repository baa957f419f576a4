"""Streaming core: stateful merge parity vs batch, exactly-once resume
after injected failure, re-delivery dedup, watermark session timeout."""

from __future__ import annotations

import datetime as dt
import os

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from semstreams_spark.extract import extract_triples
from semstreams_spark.streaming import build_ingest_stream, read_transcript_stream

T0 = dt.datetime(2025, 1, 1)


_MTIME_COUNTER = [1_700_000_000]


def _write_file(dirpath: str, name: str, rows: list[tuple]):
    """rows: (conv_id, turn_idx, role, text, tool, ts). Sets strictly
    increasing mtimes: the file stream source orders batches by mtime, and
    two files written in the same clock tick would race."""
    os.makedirs(dirpath, exist_ok=True)
    cols = list(zip(*rows))
    tbl = pa.table(
        {
            "conv_id": pa.array(cols[0]),
            "turn_idx": pa.array(cols[1], type=pa.int32()),
            "role": pa.array(cols[2]),
            "text": pa.array(cols[3]),
            "tool": pa.array(cols[4], type=pa.string()),
            "ts": pa.array([pd.Timestamp(t) for t in cols[5]], type=pa.timestamp("us")),
        }
    )
    path = os.path.join(dirpath, name)
    pq.write_table(tbl, path)
    _MTIME_COUNTER[0] += 10
    os.utime(path, (_MTIME_COUNTER[0], _MTIME_COUNTER[0]))


def _mk_rows(conv, n, start, mention="ent_a"):
    return [
        (conv, i, "user" if i % 2 == 0 else "assistant", f"msg {i} @entity:{mention}", None, start + dt.timedelta(seconds=20 * i))
        for i in range(n)
    ]


def _run(spark, indir, outdir, ckpt, **kw):
    stream = read_transcript_stream(spark, indir, max_files_per_trigger=kw.pop("mfpt", 1))
    q, sink = build_ingest_stream(stream, outdir, checkpoint_dir=ckpt, **kw)
    q.awaitTermination()
    return sink


def test_stream_matches_batch_extraction(spark, tmp_path):
    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(indir, "f1.parquet", _mk_rows("c1", 6, T0) + _mk_rows("c2", 4, T0, "ent_b"))
    _write_file(indir, "f2.parquet", _mk_rows("c3", 5, T0 + dt.timedelta(minutes=5)))

    sink = _run(spark, indir, outdir, ckpt, watermark="2 days", mfpt=1)
    out = sink.read(spark).filter(F.col("kind") == "triple")

    batch = extract_triples(spark.read.parquet(indir))
    key = ["subject", "predicate", "object", "object_type", "ts"]
    got = sorted(map(tuple, out.select(*key).collect()))
    want = sorted(map(tuple, batch.select(*key).collect()))
    assert got == want


def test_precompact_parity(spark, tmp_path):
    """Round-5 worklist #3: the pre-compacted pipeline (pack_transcripts
    ahead of the state exchange) must be row-for-row identical to the
    flat pipeline on the same input — including re-delivery dedup,
    prior-turn linkage, versions, and tool correlation — across
    multi-file micro-batches where a conversation spans packs."""
    indir = str(tmp_path / "in")
    rows = (
        _mk_rows("c1", 8, T0)
        + _mk_rows("c2", 5, T0, "ent_b")
        + [("c1", 3, "tool", "msg 3 @entity:ent_a", "search", T0 + dt.timedelta(seconds=60))]
    )
    _write_file(indir, "f1.parquet", rows[:7])
    _write_file(indir, "f2.parquet", rows[5:])  # re-delivers turns 5,6 of c1
    _write_file(indir, "f3.parquet", _mk_rows("c3", 4, T0 + dt.timedelta(minutes=2)))

    outs = {}
    for label, flag in (("flat", False), ("packed", True)):
        outdir, ckpt = str(tmp_path / f"out_{label}"), str(tmp_path / f"ckpt_{label}")
        sink = _run(spark, indir, outdir, ckpt, watermark="2 days", mfpt=1, precompact=flag)
        outs[label] = sorted(map(tuple, sink.read(spark).collect()))
    assert outs["flat"] == outs["packed"]
    assert len(outs["flat"]) > 0


def test_prior_turn_linkage(spark, tmp_path):
    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(indir, "f1.parquet", _mk_rows("c1", 4, T0))
    sink = _run(spark, indir, outdir, ckpt, watermark="2 days")
    out = (
        sink.read(spark)
        .filter((F.col("kind") == "triple") & (F.col("predicate") == "rdf:type"))
        .select("turn_idx", "prev_turn_idx", "version")
        .collect()
    )
    by_turn = {r["turn_idx"]: r for r in out}
    assert by_turn[0]["prev_turn_idx"] is None
    for i in (1, 2, 3):
        assert by_turn[i]["prev_turn_idx"] == i - 1
    assert [by_turn[i]["version"] for i in range(4)] == [1, 2, 3, 4]


def test_redelivery_dedup(spark, tmp_path):
    """The same turn delivered in two micro-batches is accepted once."""
    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    rows = _mk_rows("c1", 3, T0)
    _write_file(indir, "f1.parquet", rows)
    _write_file(indir, "f2.parquet", rows[:2])  # re-delivery of turns 0,1
    sink = _run(spark, indir, outdir, ckpt, watermark="2 days", mfpt=1)
    out = sink.read(spark).filter(F.col("kind") == "triple")
    n_type_triples = out.filter(F.col("predicate") == "rdf:type").count()
    assert n_type_triples == 3  # not 5


@pytest.mark.parametrize("commit_mode", ["rename", "manifest"])
def test_exactly_once_resume_after_injected_failure(spark, tmp_path, commit_mode):
    """Crash after data write (and manifest PUT, in manifest mode) but
    before ledger commit at batch 2; restart must neither lose nor
    duplicate rows (north-rule W5/W7). Parameterized over both commit
    modes: POSIX rename and the object-store-safe manifest listing."""
    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    for i in range(4):
        _write_file(indir, f"f{i}.parquet", _mk_rows(f"c{i}", 3, T0 + dt.timedelta(minutes=i)))

    stream = read_transcript_stream(spark, indir, max_files_per_trigger=1)
    q, sink = build_ingest_stream(
        stream, outdir, checkpoint_dir=ckpt, watermark="2 days", fail_at_batch=2,
        commit_mode=commit_mode,
    )
    with pytest.raises(Exception):
        q.awaitTermination()

    # the crashed batch's rows are invisible to readers in BOTH modes:
    # its data (and manifest) exist on disk, but the ledger gates reads
    assert sink.read(spark).filter(F.col("conv_id") == "c2").count() == 0
    # restart from checkpoint, no injected failure
    stream2 = read_transcript_stream(spark, indir, max_files_per_trigger=1)
    q2, sink2 = build_ingest_stream(
        stream2, outdir, checkpoint_dir=ckpt, watermark="2 days", commit_mode=commit_mode
    )
    q2.awaitTermination()

    out = sink2.read(spark).filter(F.col("kind") == "triple")
    batch = extract_triples(spark.read.parquet(indir))
    assert out.count() == batch.count()
    key = ["subject", "predicate", "object"]
    assert out.select(*key).distinct().count() == out.count() == batch.select(*key).distinct().count()
    # ledger has per-partition lineage for every committed batch
    for entry in sink2.ledger():
        assert "partitions" in entry and entry["rows"] == sum(p["rows"] for p in entry["partitions"])


def test_session_end_on_watermark_timeout(spark, tmp_path):
    """Idle conversation: state evicted 1h past watermark, session_end emitted."""
    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(indir, "f1.parquet", _mk_rows("early", 3, T0))
    # second file 6h later pushes the watermark far past early+1h
    _write_file(indir, "f2.parquet", _mk_rows("late", 2, T0 + dt.timedelta(hours=6)))
    # third batch gives the timer a chance to fire
    _write_file(indir, "f3.parquet", _mk_rows("late2", 2, T0 + dt.timedelta(hours=7)))

    sink = _run(spark, indir, outdir, ckpt, watermark="1 minute", mfpt=1)
    ends = sink.read(spark).filter(F.col("kind") == "session_end").collect()
    assert any(r["conv_id"] == "early" and r["object"] == "3" for r in ends)


def test_streaming_tool_correlation(spark, tmp_path):
    """J4 in state: tool turns carry the most recent non-tool turn, across
    micro-batch boundaries."""
    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    rows1 = [
        ("c1", 0, "user", "ask", None, T0),
        ("c1", 1, "assistant", "calling", None, T0 + dt.timedelta(seconds=5)),
    ]
    rows2 = [
        ("c1", 2, "tool", "result", "calc", T0 + dt.timedelta(seconds=8)),
        ("c1", 3, "tool", "result2", "search", T0 + dt.timedelta(seconds=9)),
        ("c1", 4, "user", "thanks", None, T0 + dt.timedelta(seconds=12)),
    ]
    _write_file(indir, "f1.parquet", rows1)
    _write_file(indir, "f2.parquet", rows2)
    sink = _run(spark, indir, outdir, ckpt, watermark="2 days", mfpt=1)
    out = (
        sink.read(spark)
        .filter((F.col("predicate") == "conv.turn.tool"))
        .select("turn_idx", "req_turn_idx")
        .collect()
    )
    by_turn = {r["turn_idx"]: r["req_turn_idx"] for r in out}
    # both tool turns attribute to turn 1 (assistant), across the batch boundary
    assert by_turn == {2: 1, 3: 1}


def test_intra_batch_duplicate_dedup(spark, tmp_path):
    """Two copies of the same turn inside ONE micro-batch (one file) must
    be accepted once — the cross-batch seen-set alone misses this."""
    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    rows = _mk_rows("c1", 3, T0)
    _write_file(indir, "f1.parquet", rows + rows[:2])  # dup of turns 0,1 in the same file
    sink = _run(spark, indir, outdir, ckpt, watermark="2 days", mfpt=10)
    out = sink.read(spark).filter(F.col("kind") == "triple")
    n_type_triples = out.filter(F.col("predicate") == "rdf:type").count()
    assert n_type_triples == 3  # not 5


def test_streaming_deletes_create_delete_recreate(spark, tmp_path):
    """Tombstones as their own exactly-once micro-batched stream: a delete
    arriving after the entity's turns marks it deleted; a later recreate
    (newer turn mentioning it) flips it back to active."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semstreams_spark.operators.mutations import nodes_with_status
    from semstreams_spark.streaming.mutations import build_delete_stream, read_delete_stream

    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    ddir, dckpt = str(tmp_path / "dels"), str(tmp_path / "dckpt")
    # turns at T0..T0+40s mentioning ent_a; later turn at +2h re-mentions it
    _write_file(indir, "f1.parquet", _mk_rows("c1", 3, T0))
    _write_file(indir, "f2.parquet", _mk_rows("c2", 2, T0 + dt.timedelta(hours=2)))
    sink = _run(spark, indir, outdir, ckpt, watermark="2 days", mfpt=10)

    # two tombstones for ent_a in two micro-batch files: one between the
    # two mention bursts (recreated), plus one for a never-seen entity
    os.makedirs(ddir, exist_ok=True)
    ent = "test.local.graph.kb.entity.ent_a"
    t_del = T0 + dt.timedelta(hours=1)
    pq.write_table(
        pa.table({"entity_id": [ent], "ts": [t_del]}), os.path.join(ddir, "d1.parquet")
    )
    pq.write_table(
        pa.table({"entity_id": ["test.local.graph.kb.entity.ghost"],
                  "ts": [t_del], }), os.path.join(ddir, "d2.parquet")
    )
    q, dsink = build_delete_stream(read_delete_stream(spark, ddir, 1), str(tmp_path), dckpt)
    q.awaitTermination()
    deletes = dsink.read(spark)
    assert deletes.count() == 2

    triples = sink.read(spark).filter(F.col("kind") == "triple")
    men = triples.filter(F.col("predicate") == "conv.turn.mentions").select(
        F.col("object").alias("id"), "ts"
    )
    nodes = men.groupBy("id").agg(
        F.count(F.lit(1)).alias("version"), F.max("ts").alias("updated_at")
    ).withColumn("type", F.lit("entity"))
    st = {r["id"]: r["status"] for r in nodes_with_status(nodes, deletes).collect()}
    # mentioned again at T0+2h > tombstone at +1h -> recreated
    assert st[ent] == "active"

    # with only the first burst (max mention ts T0+40s < tombstone) the
    # same composition reports deleted
    early = men.filter(F.col("ts") < t_del)
    nodes_early = early.groupBy("id").agg(
        F.count(F.lit(1)).alias("version"), F.max("ts").alias("updated_at")
    ).withColumn("type", F.lit("entity"))
    st_early = {r["id"]: r["status"] for r in nodes_with_status(nodes_early, deletes).collect()}
    assert st_early[ent] == "deleted"


def test_observed_source_metrics_per_batch(spark, tmp_path):
    """Each micro-batch's progress carries observed source metrics (rows,
    event-time bounds) alongside the sink's per-partition lineage."""
    import json as _json

    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    _write_file(indir, "f1.parquet", _mk_rows("c1", 4, T0))
    _write_file(indir, "f2.parquet", _mk_rows("c2", 3, T0 + dt.timedelta(minutes=1)))
    stream = read_transcript_stream(spark, indir, max_files_per_trigger=1)
    q, sink = build_ingest_stream(stream, outdir, checkpoint_dir=ckpt, watermark="2 days")
    q.awaitTermination()
    progresses = [_json.loads(p.json) for p in q.recentProgress]
    observed = [
        p["observedMetrics"]["ingest_source"]
        for p in progresses
        if p.get("observedMetrics", {}).get("ingest_source")
    ]
    data_batches = [m for m in observed if m["rows"] > 0]
    assert sorted(m["rows"] for m in data_batches) == [3, 4]  # both batches reported
    for m in data_batches:
        assert m["min_event_ts"] <= m["max_event_ts"]
        assert m["approx_convs"] >= 1


def test_tws_matches_applyinpandaswithstate(spark, tmp_path):
    """transformWithStateInPandas variant emits the exact same accepted
    turns (dedup, prior links, versions) as the applyInPandasWithState
    operator across micro-batches with redelivery.

    The TWS runtime path needs google.protobuf (Spark's state-server
    protocol), which is absent from this image — skipped here, runs on
    any cluster with protobuf installed."""
    pytest.importorskip(
        "google.protobuf.descriptor",
        reason="transformWithStateInPandas needs protobuf (absent from this runtime)",
    )
    from semstreams_spark.streaming.state_merge import accepted_turns
    from semstreams_spark.streaming.state_merge_tws import accepted_turns_tws

    indir = str(tmp_path / "in")
    rows1 = _mk_rows("c1", 4, T0) + _mk_rows("c2", 2, T0, "ent_b")
    rows2 = _mk_rows("c1", 6, T0)[2:]  # turns 2,3 redelivered + fresh 4,5
    _write_file(indir, "f1.parquet", rows1)
    _write_file(indir, "f2.parquet", rows2)

    def run(fn, name):
        out = str(tmp_path / f"out_{name}")
        ckpt = str(tmp_path / f"ckpt_{name}")
        stream = read_transcript_stream(spark, indir, max_files_per_trigger=1)
        q = (
            fn(stream, watermark="2 days")
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        # full-schema comparison: both engines share _merge_chunk, so
        # every column (kind, req_turn_idx, tool included) must agree
        return sorted(map(tuple, spark.read.parquet(out).collect()))

    aip = run(lambda s, watermark: accepted_turns(s, watermark=watermark, engine="legacy"), "aip")
    tws = run(accepted_turns_tws, "tws")
    assert len(tws) == 8  # 4 + 2 + 2 accepted, redelivery dropped
    assert tws == aip


def test_state_engine_resolution(monkeypatch):
    """TWS is the default engine wherever its protobuf runtime exists;
    legacy is the fallback and the explicit override. Forcing tws on a
    runtime without protobuf fails loudly, not silently."""
    from semstreams_spark.streaming import state_merge, state_merge_tws

    monkeypatch.delenv("SPARK_GRAFT_STATE_ENGINE", raising=False)
    monkeypatch.setattr(state_merge_tws, "tws_supported", lambda: True)
    assert state_merge.resolve_state_engine() == "tws"
    assert state_merge.resolve_state_engine("legacy") == "legacy"
    monkeypatch.setenv("SPARK_GRAFT_STATE_ENGINE", "legacy")
    assert state_merge.resolve_state_engine() == "legacy"
    monkeypatch.delenv("SPARK_GRAFT_STATE_ENGINE")

    monkeypatch.setattr(state_merge_tws, "tws_supported", lambda: False)
    assert state_merge.resolve_state_engine() == "legacy"
    with pytest.raises(RuntimeError, match="protobuf"):
        state_merge.resolve_state_engine("tws")
    with pytest.raises(ValueError, match="unknown state engine"):
        state_merge.resolve_state_engine("bogus")


def test_tws_not_fooled_by_namespace_protobuf(tmp_path):
    """Regression: under spark-submit the JVM jars land on the python
    path and spark-core's Java-side google/protobuf resource directory
    imports as an EMPTY namespace package — `import google.protobuf`
    succeeds with no protobuf runtime behind it. tws_supported() must
    probe a real module (descriptor) so that shape resolves to the
    legacy engine instead of a TWS job that dies in the pre-init
    runner. Run in a subprocess so the phantom package never pollutes
    this process's import state."""
    import subprocess
    import sys

    (tmp_path / "google" / "protobuf").mkdir(parents=True)
    code = (
        "import google.protobuf\n"  # namespace import must succeed...
        "from semstreams_spark.streaming.state_merge import resolve_state_engine\n"
        "from semstreams_spark.streaming.state_merge_tws import tws_supported\n"
        "assert not tws_supported()\n"  # ...but not count as a runtime
        "assert resolve_state_engine() == 'legacy'\n"
        "print('OK')\n"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=f"{tmp_path}{os.pathsep}{repo}")
    env.pop("SPARK_GRAFT_STATE_ENGINE", None)
    out = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    assert out.returncode == 0, out.stderr
    assert "OK" in out.stdout


def test_streaming_rule_stage_kill_resume(spark, tmp_path):
    """R5 end-to-end: rules + cooldown evaluated inside the live delta
    stream's foreachBatch, committed exactly-once; a crash injected after
    the delta commit but before the rule commit must, after restart,
    yield rule events IDENTICAL to the batch engine (evaluate_rules +
    global greedy apply_cooldown) over the same committed deltas —
    the streaming analogue of the rule_events/alert_cooldown gates."""
    from semstreams_spark.rules.engine import Condition, Rule, apply_cooldown, evaluate_rules
    from semstreams_spark.streaming.rules_stage import build_ingest_with_rules, rule_states_view

    rules = [
        Rule(id="calc_used", conditions=(Condition("conv.turn.tool", "eq", "calc"),)),
        Rule(
            id="ent_seen",
            conditions=(Condition("entity.mentioned", "starts_with", "test.local.conv."),),
            cooldown_seconds=50,
        ),
    ]
    indir, outdir, ckpt = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt")
    rows = [
        ("c1", i, "tool" if i == 5 else "user", f"msg {i} @entity:ent_x", "calc" if i == 5 else None,
         T0 + dt.timedelta(seconds=20 * i))
        for i in range(10)
    ]
    # event-time-ordered micro-batches (a log-ordered source) — the
    # incremental-greedy == global-greedy precondition
    _write_file(indir, "f1.parquet", rows[0:4])
    _write_file(indir, "f2.parquet", rows[4:8])
    _write_file(indir, "f3.parquet", rows[8:10])

    stream = read_transcript_stream(spark, indir, max_files_per_trigger=1)
    q, _, _ = build_ingest_with_rules(
        stream, outdir, rules, checkpoint_dir=ckpt, watermark="2 days", fail_rules_at_batch=1
    )
    with pytest.raises(Exception):
        q.awaitTermination()

    stream2 = read_transcript_stream(spark, indir, max_files_per_trigger=1)
    q2, delta_sink, rule_stage = build_ingest_with_rules(
        stream2, outdir, rules, checkpoint_dir=ckpt, watermark="2 days"
    )
    q2.awaitTermination()

    got = sorted(
        map(tuple, rule_stage.sink.read(spark).select("rule_id", "entity_id", "ts").collect())
    )
    deltas = delta_sink.read(spark)
    want_df = apply_cooldown(evaluate_rules(rule_states_view(deltas), rules), rules)
    want = sorted(map(tuple, want_df.select("rule_id", "entity_id", "ts").collect()))
    assert got == want
    # the cooldown actually engaged across batch boundaries: 10 mention
    # events at 20s spacing, 50s mute -> fires at t=0,60,120,180
    ent = [t for t in got if t[0] == "ent_seen"]
    assert [ts.second + 60 * ts.minute for (_, _, ts) in ent] == [0, 60, 120, 180]
    assert [t for t in got if t[0] == "calc_used"]  # the no-cooldown rule fired
    # every committed batch has a ledger row on BOTH tables
    assert {e["batch_id"] for e in rule_stage.sink.ledger()} <= {
        e["batch_id"] for e in delta_sink.ledger()
    }


def test_delete_rule_events_stream(spark, tmp_path):
    """DELETED-change rule events off the live tombstone stream: committed
    events equal deletion_events over all tombstones."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from semstreams_spark.operators.mutations import deletion_events
    from semstreams_spark.streaming.mutations import read_delete_stream
    from semstreams_spark.streaming.rules_stage import build_delete_rule_events

    ddir = str(tmp_path / "dels")
    os.makedirs(ddir, exist_ok=True)
    t1, t2 = T0, T0 + dt.timedelta(minutes=5)
    for i, (ent, t) in enumerate([("e1", t1), ("e2", t2)]):
        p = os.path.join(ddir, f"d{i}.parquet")
        pq.write_table(
            pa.table({"entity_id": [f"test.local.graph.kb.entity.{ent}"], "ts": [t]}), p
        )
        _MTIME_COUNTER[0] += 10
        os.utime(p, (_MTIME_COUNTER[0], _MTIME_COUNTER[0]))

    q, sink = build_delete_rule_events(
        read_delete_stream(spark, ddir, 1), str(tmp_path), str(tmp_path / "ckpt")
    )
    q.awaitTermination()
    got = sorted(map(tuple, sink.read(spark).collect()))
    want = sorted(
        map(tuple, deletion_events(spark.read.parquet(ddir)).collect())
    )
    assert got == want and len(got) == 2
    assert all(r[0] == "entity_deleted" for r in got)


def test_streaming_rule_seed_read_is_bounded(spark, tmp_path):
    """The cooldown seed must read only committed rule-event batches
    within max(cooldown) of the incoming batch's min event time (ledger
    footer-stat pruning) — the read's input size is independent of how
    many batches the stream has ever committed."""
    from semstreams_spark.rules.engine import Condition, Rule
    from semstreams_spark.streaming.rules_stage import StreamingRuleStage

    rules = [
        Rule(
            id="r_cd",
            conditions=(Condition("conv.turn.tool", "eq", "calc"),),
            cooldown_seconds=120,
        )
    ]
    stage = StreamingRuleStage(str(tmp_path), rules)
    # 12 committed batches, one hour apart in event time — an "old" stream
    for b in range(12):
        ts = T0 + dt.timedelta(hours=b)
        df = spark.createDataFrame(
            [("r_cd", f"ent_{b}", ts)], "rule_id string, entity_id string, ts timestamp_ntz"
        )
        stage.sink(df, b)
    assert len(stage.sink.ledger()) == 12

    # a new batch starting at hour 11 + 30s: its 120s cooldown horizon
    # reaches only batch 11 — the other 11 committed batches are pruned
    # from the seed read via ledger metadata alone
    min_ev = T0 + dt.timedelta(hours=11, seconds=30)
    dirs = stage.seed_batch_dirs(min_ev)
    assert len(dirs) == 1 and dirs[0].endswith("batch=11")

    seed = stage.last_fires(spark, min_ev)
    rows = seed.collect()
    assert [(r["rule_id"], r["entity_id"]) for r in rows] == [("r_cd", "ent_11")]

    # grow the history 2x with batches strictly older than the cutoff:
    # the bounded read stays the same size
    for b in range(12, 24):
        ts = T0 + dt.timedelta(hours=(b - 12) % 10, minutes=30)
        df = spark.createDataFrame(
            [("r_cd", f"ent_old_{b}", ts)], "rule_id string, entity_id string, ts timestamp_ntz"
        )
        stage.sink(df, b)
    assert len(stage.sink.ledger()) == 24
    assert len(stage.seed_batch_dirs(min_ev)) == 1


def test_sink_ledger_metadata_reads_are_bounded(spark, tmp_path):
    """Round-5 worklist #1: per-trigger ledger METADATA reads must not
    grow with stream age. The compact checkpoint (written every
    compact_every commits) + per-batch suffix bound file opens to
    O(compact_every) after a restart and ZERO in steady state — the
    ledger analogue of test_streaming_rule_seed_read_is_bounded."""
    from semstreams_spark.streaming.sink import ExactlyOnceParquetSink

    sink = ExactlyOnceParquetSink(str(tmp_path / "t"), compact_every=4)
    for b in range(30):
        ts = T0 + dt.timedelta(hours=b)
        df = spark.createDataFrame(
            [("r", f"e{b}", ts)], "rule_id string, entity_id string, ts timestamp_ntz"
        )
        sink(df, b)
    assert os.path.exists(os.path.join(str(tmp_path / "t"), "_ledger", "_checkpoint.json"))

    # steady state (the live committer): pruning consults the in-memory
    # index only — zero ledger file opens per trigger
    cutoff = T0 + dt.timedelta(hours=28, minutes=30)
    r0 = sink.ledger_file_reads
    dirs = sink.batch_dirs_since(cutoff)
    assert [os.path.basename(d) for d in dirs] == ["batch=29"]
    assert sink.ledger_file_reads == r0

    # restart: a fresh sink loads the O(1) pointer + one immutable
    # segment per compact_every committed batches + the <compact_every
    # per-batch suffix — never the per-batch ledgers of the whole history
    sink2 = ExactlyOnceParquetSink(str(tmp_path / "t"), compact_every=4)
    assert sink2.batch_dirs_since(cutoff) == dirs
    assert sink2.ledger_file_reads <= 1 + (30 // 4) + 4
    assert sorted(sink2._compact_entries()) == list(range(30))
    # read() serves from the same bounded index and sees every batch
    assert sink2.read(spark).count() == 30

    # r6 (round-5 verdict #2): checkpoint bytes WRITTEN per commit window
    # are independent of stream age — each flush writes one immutable
    # segment of ≤ compact_every entries plus a constant-size pointer,
    # never a monolith of every entry ever
    import json as _json

    ledger_dir = os.path.join(str(tmp_path / "t"), "_ledger")
    segs = sorted(f for f in os.listdir(ledger_dir) if f.startswith("_checkpoint.seg."))
    assert len(segs) >= 30 // 4 - 1
    seen = []
    for s in segs:
        with open(os.path.join(ledger_dir, s)) as fh:
            entries = _json.load(fh)
        assert len(entries) <= 4  # bounded bytes per flush
        seen.extend(e["batch_id"] for e in entries)
    # segments are disjoint and cover exactly the checkpointed prefix
    with open(os.path.join(ledger_dir, "_checkpoint.json")) as fh:
        ptr = _json.load(fh)
    assert set(ptr) == {"upto", "n_segments"}  # O(1) pointer, no entry list
    assert sorted(seen) == list(range(ptr["upto"] + 1))


def test_compact_entry_conservative_on_partial_stats():
    """ADVICE r4: a batch with ANY unparseable/missing partition max_ts
    must be included conservatively in pruning (max_ts None), not just
    the all-missing case — the bad partition could hold the true max."""
    from semstreams_spark.streaming.sink import ExactlyOnceParquetSink

    mixed = {
        "batch_id": 5,
        "rows": 10,
        "partitions": [{"max_ts": "2025-01-02T00:00:00"}, {"max_ts": "garbage"}],
    }
    assert ExactlyOnceParquetSink._compact_entry(mixed)["max_ts"] is None
    missing = {
        "batch_id": 6,
        "rows": 10,
        "partitions": [{"max_ts": "2025-01-02T00:00:00"}, {"max_ts": "None"}],
    }
    assert ExactlyOnceParquetSink._compact_entry(missing)["max_ts"] is None
    clean = {
        "batch_id": 7,
        "rows": 10,
        "partitions": [{"max_ts": "2025-01-01T00:00:00"}, {"max_ts": "2025-01-02T00:00:00"}],
    }
    assert ExactlyOnceParquetSink._compact_entry(clean)["max_ts"] == "2025-01-02T00:00:00"
    # an EMPTY part file (0 rows — routine with wide parallelism on small
    # batches) holds no events: its missing stats must NOT disable pruning
    empty_ok = {
        "batch_id": 8,
        "rows": 1,
        "partitions": [
            {"rows": 1, "max_ts": "2025-01-02T00:00:00"},
            {"rows": 0, "max_ts": "None"},
        ],
    }
    assert ExactlyOnceParquetSink._compact_entry(empty_ok)["max_ts"] == "2025-01-02T00:00:00"


def test_streaming_rule_late_event_arrival_order(spark, tmp_path):
    """Ordering-semantics pin: a LATE but in-watermark row finalized in a
    LATER batch with an EARLIER event time follows the reference's
    arrival-order mute semantics (rule_factory.go:24 checks elapsed-
    since-lastFired at arrival): the late event arrives after the seeded
    fire, so it is muted — it does NOT retroactively fire or reorder the
    committed output (which a batch-global event-time rescan would)."""
    from semstreams_spark.rules.engine import Condition, Rule
    from semstreams_spark.streaming.rules_stage import StreamingRuleStage, rule_states_view

    rules = [
        Rule(
            id="seen",
            conditions=(Condition("entity.mentioned", "starts_with", "test."),),
            cooldown_seconds=3600,
        )
    ]
    stage = StreamingRuleStage(str(tmp_path), rules)

    def delta_batch(rows):
        # (subject, object, ts) mention triples in the delta-row shape
        return spark.createDataFrame(
            [("conv_x", 0, s, "conv.turn.mentions", o, "entity_ref", t, "triple") for s, o, t in rows],
            "conv_id string, turn_idx int, subject string, predicate string, "
            "object string, object_type string, ts timestamp_ntz, kind string",
        )

    ent = "test.local.graph.kb.entity.e1"
    # condition matches the OBJECT of the entity-view row (= the original
    # turn subject), so turn subjects must carry the "test." prefix
    turn_a, turn_b = "test.local.conv.x.turn.a", "test.local.conv.x.turn.b"
    t_fire = T0 + dt.timedelta(minutes=30)
    t_late = T0 + dt.timedelta(minutes=10)  # earlier ts, later arrival
    stage(delta_batch([(turn_a, ent, t_fire)]), 0)
    stage(delta_batch([(turn_b, ent, t_late)]), 1)

    got = sorted(map(tuple, stage.sink.read(spark).select("rule_id", "entity_id", "ts").collect()))
    # only the first-arriving event fired; the late one was muted by the
    # seeded fire even though its event time is earlier
    assert got == [("seen", ent, t_fire)]

    # sanity: rule_states_view keyed the mention to the entity
    assert rule_states_view(delta_batch([("turn_a", ent, t_fire)])).filter(
        F.col("subject") == ent
    ).count() == 1


def test_sink_legacy_monolith_checkpoint_migrates(spark, tmp_path):
    """A pre-r6 monolithic _checkpoint.json ({"upto", "entries"}) is read
    correctly and migrated into segment 0 on the next flush."""
    import json as _json

    from semstreams_spark.streaming.sink import ExactlyOnceParquetSink

    table = str(tmp_path / "t")
    sink = ExactlyOnceParquetSink(table, compact_every=4)
    for b in range(8):
        ts = T0 + dt.timedelta(hours=b)
        df = spark.createDataFrame(
            [("r", f"e{b}", ts)], "rule_id string, entity_id string, ts timestamp_ntz"
        )
        sink(df, b)
    ledger_dir = os.path.join(table, "_ledger")
    # rewrite the checkpoint in the legacy monolithic format
    entries = sorted(sink._compact_entries().values(), key=lambda e: e["batch_id"])
    with open(os.path.join(ledger_dir, "_checkpoint.json"), "w") as fh:
        _json.dump({"upto": 7, "entries": entries}, fh)
    for f in os.listdir(ledger_dir):
        if f.startswith("_checkpoint.seg."):
            os.remove(os.path.join(ledger_dir, f))

    sink2 = ExactlyOnceParquetSink(table, compact_every=4)
    assert sorted(sink2._compact_entries()) == list(range(8))  # legacy readable
    for b in range(8, 12):
        ts = T0 + dt.timedelta(hours=b)
        df = spark.createDataFrame(
            [("r", f"e{b}", ts)], "rule_id string, entity_id string, ts timestamp_ntz"
        )
        sink2(df, b)
    with open(os.path.join(ledger_dir, "_checkpoint.json")) as fh:
        ptr = _json.load(fh)
    assert set(ptr) == {"upto", "n_segments"} and ptr["n_segments"] == 1
    sink3 = ExactlyOnceParquetSink(table, compact_every=4)
    assert sorted(sink3._compact_entries()) == list(range(12))
    assert sink3.read(spark).count() == 12


def test_tws_processor_logic_with_mock_handle():
    """Round-5 verdict #3: exercise ConvMergeProcessor's TWS logic layer
    (state round-trip, timer replace, expired-timer session_end) WITHOUT
    the protobuf runtime, against a dict-backed StatefulProcessorHandle —
    output parity with the legacy _accept_turns on the same chunks."""
    import numpy as np

    from semstreams_spark.streaming.state_merge import _accept_turns
    from semstreams_spark.streaming.state_merge_tws import ConvMergeProcessor

    class FakeValueState:
        def __init__(self):
            self._v = None

        def exists(self):
            return self._v is not None

        def get(self):
            return self._v

        def update(self, v):
            self._v = tuple(v)

        def clear(self):
            self._v = None

    class FakeListState(FakeValueState):
        def __init__(self):
            self._rows = []

        def exists(self):
            return bool(self._rows)

        def get(self):
            return iter(list(self._rows))

        def appendList(self, rows):
            self._rows.extend(tuple(r) for r in rows)

        def clear(self):
            self._rows = []

    class FakeHandle:
        def __init__(self):
            self.states, self.timers = {}, []

        def getValueState(self, name, schema):
            return self.states.setdefault(name, FakeValueState())

        def getListState(self, name, schema):
            return self.states.setdefault(name, FakeListState())

        def listTimers(self):
            return list(self.timers)

        def deleteTimer(self, t):
            self.timers.remove(t)

        def registerTimer(self, t):
            self.timers.append(t)

    class FakeTimerValues:
        def __init__(self, wm):
            self._wm = wm

        def getCurrentWatermarkInMs(self):
            return self._wm

    class FakeGroupState:
        def __init__(self, wm):
            self._t, self._wm = None, wm
            self.hasTimedOut = False
            self.timeout = None

        @property
        def exists(self):
            return self._t is not None

        @property
        def get(self):
            return self._t

        def update(self, t):
            self._t = tuple(t)

        def remove(self):
            self._t = None

        def getCurrentWatermarkMs(self):
            return self._wm

        def setTimeoutTimestamp(self, ms):
            self.timeout = ms

    def chunk(rows):
        return pd.DataFrame(
            {
                "conv_id": ["c1"] * len(rows),
                "turn_idx": np.array([r[0] for r in rows], dtype=np.int32),
                "role": [r[1] for r in rows],
                "text": [f"msg {r[0]} @entity:ent_a" for r in rows],
                "tool": [r[2] for r in rows],
                "ts": pd.to_datetime([T0 + dt.timedelta(seconds=20 * r[0]) for r in rows]),
            }
        )

    # two batches: out-of-order rows, a redelivery (turn 1), a tool turn
    batch1 = [chunk([(0, "user", None), (2, "assistant", None), (1, "assistant", None)])]
    batch2 = [chunk([(1, "assistant", None), (3, "tool", "calc"), (4, "user", None)])]

    proc = ConvMergeProcessor()
    handle = FakeHandle()
    proc.init(handle)
    tws_out = []
    for wm, batch in ((0, batch1), (60_000, batch2)):
        tws_out.extend(proc.handleInputRows(("c1",), iter(batch), FakeTimerValues(wm)))
    assert len(handle.timers) == 1  # timers REPLACE, never accumulate
    # batch2: last event time (T0+80s, epoch ms) beats the 60s watermark
    anchor_ms = int(pd.Timestamp(T0 + dt.timedelta(seconds=80)).value // 1_000_000)
    assert handle.timers[0] == anchor_ms + 3_600_000

    gs = FakeGroupState(0)
    leg_out = list(_accept_turns(("c1",), iter(batch1), gs))
    gs._wm = 60_000
    leg_out.extend(_accept_turns(("c1",), iter(batch2), gs))

    t = pd.concat(tws_out, ignore_index=True)
    l = pd.concat(leg_out, ignore_index=True)
    pd.testing.assert_frame_equal(t, l)
    assert list(t["turn_idx"]) == [0, 1, 2, 3, 4]  # redelivery deduped
    assert list(t["version"]) == [1, 2, 3, 4, 5]

    # expired timer: session_end emitted once, state cleared
    ended = list(proc.handleExpiredTimer(("c1",), FakeTimerValues(10**12), object()))
    assert len(ended) == 1 and ended[0]["kind"][0] == "session_end"
    assert ended[0]["text"][0] == "5"  # n_turns summary payload
    assert not proc._scalars.exists() and not proc._seen.exists()
    gs.hasTimedOut = True
    leg_end = list(_accept_turns(("c1",), iter([]), gs))
    pd.testing.assert_frame_equal(ended[0], leg_end[0])
    # a second expiry with no state emits nothing
    assert list(proc.handleExpiredTimer(("c1",), FakeTimerValues(10**12), object())) == []
