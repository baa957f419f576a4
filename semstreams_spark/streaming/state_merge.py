"""Per-conversation stateful graph merge — the streaming heart.

``applyInPandasWithState`` keyed by ``conv_id`` holding per-conversation
graph deltas (north-star A1/J3): the streaming re-expression of the
reference's entity upsert path
(``processor/graph/messagemanager/processor.go:183-298``) where state
lived in NATS JetStream KV; here it lives in Spark's (RocksDB) state
store.

Design for throughput (learned the hard way): the per-group Python
function does the MINIMUM stateful work — re-delivery dedup, prior-turn
linkage, version counters, session tracking — and emits one row per
*accepted turn*. The 5-7x triple fan-out happens DOWNSTREAM in pure
Catalyst expressions (whole-stage codegen), not in Python. Doing the
extraction per group costs ~3ms x n_conversations per batch; doing it
JVM-side costs microseconds per row.

Per-conversation state (bounded — SURVEY §7.2):
- ``seen_turns``: turn_idx array already accepted (binary-packed int32;
  dedup of re-deliveries; evicted with the conversation on timeout)
- ``last_turn``: (turn_idx, ts) of the latest accepted turn — powers the
  turn→prior-turn stateful join without a shuffle join
- ``version``: monotonically incremented per accepted update
  (reference CAS version bump, ``datamanager/manager.go:693-743``)
- ``props_json``: conversation-level LWW properties

Late rows older than already-merged state do NOT overwrite (LWW compares
``(ts, seq)``, not arrival order). Conversations idle past the timeout
emit a ``session_end`` summary row and their state is evicted (W6).

Determinism contract: within a micro-batch, turns are processed in
``(ts, turn_idx)`` order; across batches LWW ordering makes the final
merged state independent of batch boundaries.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pandas.arrays import IntegerArray
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..extract.triples import MENTION_RE

ACCEPTED_SCHEMA = (
    "kind string, conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp, prev_turn_idx int, prev_ts timestamp, "
    "req_turn_idx int, version long"
)

DELTA_SCHEMA = (
    "kind string, conv_id string, turn_idx int, subject string, "
    "predicate string, object string, object_type string, ts timestamp, "
    "prev_turn_idx int, prev_ts timestamp, req_turn_idx int, version long"
)

STATE_SCHEMA = StructType(
    [
        StructField("version", LongType()),
        StructField("last_turn_idx", IntegerType()),
        StructField("last_turn_ts", LongType()),  # µs epoch
        StructField("n_turns", LongType()),
        StructField("seen_turns", BinaryType()),  # packed int32 array
        StructField("conv_props_json", StringType()),
        StructField("last_req_idx", IntegerType()),  # last non-tool turn (J4)
    ]
)

_EMPTY = np.array([], dtype=np.int32)


def _session_end_frame(conv_id, version, last_idx, last_ts, n_turns) -> pd.DataFrame:
    """The session_end summary row emitted on conversation timeout (W6) —
    shared by both stateful operators."""
    return pd.DataFrame(
        {
            "kind": ["session_end"],
            "conv_id": [conv_id],
            "turn_idx": pd.array([last_idx], dtype="Int32"),
            "role": [None],
            "text": [str(n_turns)],  # summary payload
            "tool": [None],
            "ts": [pd.Timestamp(last_ts, unit="us")],
            "prev_turn_idx": pd.array([None], dtype="Int32"),
            "prev_ts": [pd.NaT],
            "req_turn_idx": pd.array([None], dtype="Int32"),
            "version": pd.array([version], dtype="Int64"),
        }
    )


def _chunk_arrays(pdf: pd.DataFrame):
    """One Arrow chunk (flat transcript rows OR pack_transcripts packs)
    → flat (idx, ts_us, roles, texts, tools) numpy arrays. Packed list
    columns arrive as object cells of numpy arrays, so unpacking is
    np.concatenate — vectorized, not per-row Python."""
    if "idx" in pdf.columns:
        idx = np.concatenate(list(pdf["idx"])).astype(np.int32)
        ts_us = np.concatenate(list(pdf["ev_us"])).astype(np.int64)
        roles = np.concatenate(list(pdf["role"]))
        texts = np.concatenate(list(pdf["text"]))
        tools = np.concatenate(list(pdf["tool"]))
    else:
        idx = pdf["turn_idx"].to_numpy(dtype=np.int32, copy=False)
        ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        roles = pdf["role"].to_numpy(copy=False)
        texts = pdf["text"].to_numpy(copy=False)
        tools = pdf["tool"].to_numpy(copy=False)
    return idx, ts_us, roles, texts, tools


def _merge_chunk(conv_id, pdf, new_seen, version, last_idx, last_ts, last_req_idx):
    """Pure per-chunk accept/dedup/linkage core — the SHARED engine of
    both stateful operators (applyInPandasWithState in this module,
    transformWithStateInPandas in state_merge_tws): parity is by
    construction, not by duplicated code. Returns
    (out_frame_or_None, version, last_idx, last_ts, last_req_idx,
    accepted_idx_or_None); mutates nothing (new_seen is read-only here).
    """
    idx, ts_us, roles_raw, texts_raw, tools_raw = _chunk_arrays(pdf)
    order = np.lexsort((idx, ts_us))  # (ts, turn_idx) stable order
    idx, ts_us = idx[order], ts_us[order]
    mask = ~np.isin(idx, np.concatenate(new_seen))
    # intra-chunk redelivery guard: two copies of the same turn_idx in
    # ONE Arrow chunk must accept once (first in (ts, turn_idx) order
    # wins) — np.isin only rejects turns seen in PRIOR chunks/batches
    _, first_i = np.unique(idx, return_index=True)
    first_occ = np.zeros(len(idx), dtype=bool)
    first_occ[first_i] = True
    mask &= first_occ
    k = int(mask.sum())
    if k == 0:
        return None, version, last_idx, last_ts, last_req_idx, None
    sel = order[mask]
    idx_a, ts_a = idx[mask], ts_us[mask]

    # all-numpy column builds (masked IntegerArray instead of object
    # arrays / Series.ffill): per-key fixed cost is the hot number here —
    # a typical micro-batch chunk is 1-2 rows, so construction overhead,
    # not data volume, is what the state stage's wall is made of
    # (measured 2.4 ms/key -> ~1.3 ms/key, BASELINE §G)
    prev_idx = np.empty(k, dtype=np.int32)
    prev_idx[0] = -1 if last_idx is None else last_idx
    prev_idx[1:] = idx_a[:-1]
    prev_mask = np.zeros(k, dtype=bool)
    prev_mask[0] = last_idx is None
    prev_ts = np.empty(k, dtype="datetime64[us]")
    prev_ts[0] = np.datetime64(last_ts, "us") if last_ts is not None else np.datetime64("NaT")
    prev_ts[1:] = ts_a[:-1].astype("datetime64[us]")

    # J4 streaming: requesting turn = most recent preceding non-tool
    # turn (vectorized forward-fill via positional maximum.accumulate,
    # seeded from state; validity carried in a mask, never a value
    # sentinel)
    roles = roles_raw[sel]
    nontool = roles != "tool"
    shifted = np.empty(k, dtype=np.int32)
    shifted[0] = 0 if last_req_idx is None else last_req_idx
    shifted[1:] = idx_a[:-1]
    shifted_valid = np.empty(k, dtype=bool)
    shifted_valid[0] = last_req_idx is not None
    shifted_valid[1:] = nontool[:-1]
    pos = np.where(shifted_valid, np.arange(k), -1)
    ff = np.maximum.accumulate(pos)
    req_vals = shifted[np.maximum(ff, 0)]
    req_mask = ff < 0
    if nontool.any():
        last_req_idx = int(idx_a[nontool][-1])

    out = pd.DataFrame(
        {
            "kind": "turn",
            "conv_id": conv_id,
            "turn_idx": idx_a,
            "role": roles,
            "text": texts_raw[sel],
            "tool": tools_raw[sel],
            "ts": ts_a.astype("datetime64[us]"),
            "prev_turn_idx": IntegerArray(prev_idx, prev_mask),
            "prev_ts": prev_ts,
            "req_turn_idx": IntegerArray(req_vals, req_mask),
            "version": np.arange(version + 1, version + k + 1, dtype=np.int64),
        },
        copy=False,
    )
    return out, version + k, int(idx_a[-1]), int(ts_a[-1]), last_req_idx, idx_a


def _accept_turns(
    key: tuple[str],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key

    if state.hasTimedOut:
        version, last_idx, last_ts, n_turns, _, _, _ = state.get
        state.remove()
        yield _session_end_frame(conv_id, version, last_idx, last_ts, n_turns)
        return

    if state.exists:
        version, last_idx, last_ts, n_turns, seen_blob, props_json, last_req_idx = state.get
        seen = np.frombuffer(seen_blob, dtype=np.int32) if seen_blob else _EMPTY
    else:
        version, last_idx, last_ts, n_turns = 0, None, None, 0
        seen, props_json = _EMPTY, "{}"
        last_req_idx = None

    new_seen = [seen]
    outputs = []
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        out, version, last_idx, last_ts, last_req_idx, idx_a = _merge_chunk(
            conv_id, pdf, new_seen, version, last_idx, last_ts, last_req_idx
        )
        if out is None:
            continue
        outputs.append(out)
        n_turns += len(idx_a)
        new_seen.append(idx_a)

    if len(new_seen) > 1 or not state.exists:
        props = json.loads(props_json)
        if last_ts is not None:
            cur = props.get("conv.last_activity")
            cand = [last_ts, last_idx]
            if cur is None or cand > cur:
                props["conv.last_activity"] = cand
        state.update(
            (
                version,
                last_idx,
                last_ts,
                n_turns,
                np.concatenate(new_seen).tobytes(),
                json.dumps(props),
                last_req_idx,
            )
        )
    # evict idle conversations 1h past max(watermark, last event time) —
    # the watermark can still be 0 in the first micro-batch, so anchor on
    # the group's own event time too or the timer would never be armed
    anchor_ms = max(state.getCurrentWatermarkMs(), (last_ts or 0) // 1000)
    state.setTimeoutTimestamp(anchor_ms + 3_600_000)

    yield from outputs


PACKED_SCHEMA = (
    "conv_id string, ts timestamp, idx array<int>, role array<string>, "
    "text array<string>, tool array<string>, ev_us array<long>"
)


def pack_transcripts(transcripts: DataFrame) -> DataFrame:
    """Intra-batch per-conversation pre-compaction (round-5 worklist #3,
    the lever documented by the r4 skew measurement): a narrow
    ``mapInPandas`` over the SCAN partitions packs each partition's rows
    per conv_id into ONE struct-of-arrays row, so a hot conversation
    ships O(#source partitions) compacted rows — not O(its turn count) —
    through the conv_id state exchange. Pack event time = max turn ts,
    so watermark advancement (driven by batch max) is unchanged; the
    state fn unpacks and re-sorts, so LWW/dedup semantics are
    batch-boundary- and pack-boundary-invariant (parity-tested).

    All numpy: argsort by conv_id, np.unique group bounds, reduceat for
    the per-group max ts, np.split for the arrays — no per-row Python.
    """

    def _pack(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            conv = pdf["conv_id"].to_numpy()
            order = np.argsort(conv, kind="stable")
            conv_s = conv[order]
            idx = pdf["turn_idx"].to_numpy(dtype=np.int32, copy=False)[order]
            ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)[order]
            role = pdf["role"].to_numpy()[order]
            text = pdf["text"].to_numpy()[order]
            tool = pdf["tool"].to_numpy()[order]
            uniq, starts = np.unique(conv_s, return_index=True)
            bounds = starts[1:]
            max_ts = np.maximum.reduceat(ts_us, starts)
            yield pd.DataFrame(
                {
                    "conv_id": uniq,
                    "ts": max_ts.astype("datetime64[us]"),
                    "idx": np.split(idx, bounds),
                    "role": np.split(role, bounds),
                    "text": np.split(text, bounds),
                    "tool": np.split(tool, bounds),
                    "ev_us": np.split(ts_us, bounds),
                }
            )

    return transcripts.mapInPandas(_pack, PACKED_SCHEMA)


def resolve_state_engine(requested: str | None = None) -> str:
    """Which stateful API backs the merge: "tws"
    (transformWithStateInPandas — the maintained Spark 4 API, DEFAULT
    wherever its protobuf runtime exists) or "legacy"
    (applyInPandasWithState — the fallback, and the only option on
    runtimes without protobuf, like this test image).
    SPARK_GRAFT_STATE_ENGINE pins either explicitly."""
    import os

    from .state_merge_tws import tws_supported

    req = requested or os.environ.get("SPARK_GRAFT_STATE_ENGINE", "auto")
    if req == "legacy":
        return "legacy"
    if req == "tws":
        if not tws_supported():
            raise RuntimeError(
                "SPARK_GRAFT_STATE_ENGINE=tws but transformWithStateInPandas "
                "needs google.protobuf, which is not importable here"
            )
        return "tws"
    if req != "auto":
        raise ValueError(f"unknown state engine {req!r} (auto|tws|legacy)")
    return "tws" if tws_supported() else "legacy"


def pin_state_engine(checkpoint_dir: str | None, requested: str | None = None) -> str:
    """Resolve the stateful API and PIN it next to the checkpoint.

    A restart of an existing query must keep the engine recorded at first
    start: if protobuf appears later (image upgrade), auto-selection
    would silently switch applyInPandasWithState →
    transformWithStateInPandas and Spark rejects checkpoint recovery on a
    stateful-operator mismatch (r5 ADVICE). So:

    - fresh checkpoint → resolve (env/auto), write ``_state_engine``;
    - marker present → reuse it; an EXPLICIT conflicting request raises
      (manual intervention, not silent corruption);
    - pre-pinning checkpoint without a marker (offsets/ exists) → default
      to "legacy" under auto (the engine every pre-marker checkpoint in
      this repo ran), honoring an explicit request as the operator's
      statement of what the checkpoint contains.
    """
    import os

    req = requested or os.environ.get("SPARK_GRAFT_STATE_ENGINE", "auto")
    if checkpoint_dir is None:
        return resolve_state_engine(requested)
    marker = os.path.join(checkpoint_dir, "_state_engine")
    if os.path.exists(marker):
        with open(marker) as fh:
            pinned = fh.read().strip()
        if req in ("tws", "legacy") and req != pinned:
            raise RuntimeError(
                f"checkpoint {checkpoint_dir} was started with state engine "
                f"{pinned!r} but {req!r} was requested — restart from a fresh "
                "checkpoint to switch engines"
            )
        # re-validate availability (raises if tws pinned but protobuf gone)
        return resolve_state_engine(pinned)
    if os.path.isdir(os.path.join(checkpoint_dir, "offsets")) and req == "auto":
        engine = "legacy"
    else:
        engine = resolve_state_engine(requested)
    os.makedirs(checkpoint_dir, exist_ok=True)
    tmp = marker + ".tmp"
    with open(tmp, "w") as fh:
        fh.write(engine)
    os.replace(tmp, marker)
    return engine


def accepted_turns(
    transcripts: DataFrame,
    watermark: str = "10 minutes",
    precompact: bool = False,
    engine: str | None = None,
) -> DataFrame:
    """Streaming transform: transcript stream → accepted-turn stream
    (deduped, prior-turn-linked, versioned). precompact routes through
    pack_transcripts ahead of the state exchange; engine selects the
    stateful API (resolve_state_engine — TWS by default where supported,
    both backed by the same _merge_chunk core)."""
    stream = pack_transcripts(transcripts) if precompact else transcripts
    if resolve_state_engine(engine) == "tws":
        from .state_merge_tws import accepted_turns_tws

        return accepted_turns_tws(stream, watermark=watermark)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _accept_turns,
            outputStructType=ACCEPTED_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _turn_triples_array():
    """Catalyst expression: array<struct<predicate,object,object_type>>
    for one accepted row — the standard extraction contract for kind='turn',
    a single summary triple for kind='session_end'."""
    t3 = lambda pred, obj, otype: F.struct(  # noqa: E731
        pred.alias("predicate"), obj.alias("object"), otype.alias("object_type")
    )
    lit = F.lit
    empty = F.array().cast("array<struct<predicate:string,object:string,object_type:string>>")

    base = F.array(
        t3(lit("rdf:type"), lit("conv.turn"), lit("string")),
        t3(lit("conv.turn.role"), F.col("role"), lit("string")),
        t3(lit("conv.turn.text"), F.col("text"), lit("string")),
        t3(
            lit("conv.turn.in"),
            F.concat(lit("test.local.graph.kb.conversation."), F.col("conv_id")),
            lit("entity_ref"),
        ),
    )
    tool_arr = F.when(
        F.col("tool").isNotNull(),
        F.array(t3(lit("conv.turn.tool"), F.col("tool"), lit("string"))),
    ).otherwise(empty)
    mention_arr = F.transform(
        F.regexp_extract_all(F.col("text"), F.lit(MENTION_RE), F.lit(1)),
        lambda m: t3(
            lit("conv.turn.mentions"),
            F.concat(lit("test.local.graph.kb.entity."), m),
            lit("entity_ref"),
        ),
    )
    summary = F.array(
        t3(lit("conv.session.n_turns"), F.col("text"), lit("string"))
    )
    return F.when(F.col("kind") == "session_end", summary).otherwise(
        F.concat(base, tool_arr, mention_arr)
    )


def conversation_graph_deltas(
    transcripts: DataFrame,
    watermark: str = "10 minutes",
    precompact: bool = False,
    engine: str | None = None,
) -> DataFrame:
    """Full streaming transform: transcript stream → graph-delta stream.

    Stateful accept (Python, minimal) → triple fan-out (pure Catalyst,
    whole-stage codegen). State is per conv_id in the RocksDB state store;
    note AQE does not re-plan stateful exchanges — the shuffle-partition
    count fixed at first checkpoint is the scale lever.
    """
    acc = accepted_turns(
        transcripts, watermark=watermark, precompact=precompact, engine=engine
    )
    subj = F.when(
        F.col("kind") == "session_end",
        F.concat(F.lit("test.local.graph.kb.conversation."), F.col("conv_id")),
    ).otherwise(
        F.concat(
            F.lit("test.local.conv."),
            F.col("conv_id"),
            F.lit(".turn."),
            F.col("turn_idx").cast("string"),
        )
    )
    return acc.select(
        F.when(F.col("kind") == "session_end", "session_end").otherwise("triple").alias("kind"),
        "conv_id",
        "turn_idx",
        subj.alias("subject"),
        F.explode(_turn_triples_array()).alias("t"),
        "ts",
        "prev_turn_idx",
        "prev_ts",
        "req_turn_idx",
        "version",
    ).select(
        "kind",
        "conv_id",
        "turn_idx",
        "subject",
        F.col("t.predicate").alias("predicate"),
        F.col("t.object").alias("object"),
        F.col("t.object_type").alias("object_type"),
        "ts",
        "prev_turn_idx",
        "prev_ts",
        "req_turn_idx",
        "version",
    )


def deltas_to_entity_states(deltas: DataFrame) -> DataFrame:
    """Batch view over accumulated delta rows: final LWW entity states
    (used to verify stream output == batch oracle)."""
    from ..operators.merge import entity_states

    t = deltas.filter(F.col("kind") == "triple").select(
        "subject",
        "predicate",
        "object",
        "object_type",
        F.lit("transcript_extractor").alias("source"),
        "ts",
        F.lit(1.0).alias("confidence"),
        F.col("conv_id").alias("context"),
        F.col("turn_idx").alias("seq"),
    )
    return entity_states(t)
