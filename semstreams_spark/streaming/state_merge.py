"""Per-conversation stateful graph merge — the streaming heart.

``applyInPandasWithState`` keyed by ``conv_id`` holding per-conversation
graph deltas (north-star A1/J3): the streaming re-expression of the
reference's entity upsert path
(``processor/graph/messagemanager/processor.go:183-298``) where state
lived in NATS JetStream KV; here it lives in Spark's (RocksDB) state
store and the operator emits graph delta rows consumed by the
exactly-once sink.

Per-conversation state (bounded — SURVEY §7.2):
- ``seen_turns``: turn_idx set already accepted (dedup of re-deliveries;
  at 10^12 scale evicted with the conversation on event-time timeout)
- ``last_turn``: (turn_idx, ts) of the highest turn seen — powers the
  turn→prior-turn stateful join without a shuffle join
- ``conv_props``: predicate → (object, ts, seq) LWW map for the
  *conversation-level* entity (turn-level triples are immutable once
  accepted, so only conversation state needs the LWW map)
- ``version``: monotonically incremented per accepted update
  (reference CAS version bump, ``datamanager/manager.go:693-743``)

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
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ..extract.triples import _extract_pdf

DELTA_SCHEMA = (
    "kind string, conv_id string, turn_idx int, subject string, "
    "predicate string, object string, object_type string, ts timestamp, "
    "prev_turn_idx int, prev_ts timestamp, version long"
)

STATE_SCHEMA = StructType(
    [
        StructField("version", LongType()),
        StructField("last_turn_idx", IntegerType()),
        StructField("last_turn_ts", LongType()),  # µs epoch
        StructField("n_turns", LongType()),
        StructField("seen_turns_json", StringType()),
        StructField("conv_props_json", StringType()),
    ]
)


def _merge_conversation(
    key: tuple[str],
    pdf_iter: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    (conv_id,) = key

    if state.hasTimedOut:
        version, last_idx, last_ts, n_turns, _, _ = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "kind": ["session_end"],
                "conv_id": [conv_id],
                "turn_idx": pd.array([last_idx], dtype="Int32"),
                "subject": [f"test.local.graph.kb.conversation.{conv_id}"],
                "predicate": ["conv.session.n_turns"],
                "object": [str(n_turns)],
                "object_type": ["string"],
                "ts": [pd.Timestamp(last_ts, unit="us")],
                "prev_turn_idx": pd.array([None], dtype="Int32"),
                "prev_ts": [pd.NaT],
                "version": pd.array([version], dtype="Int64"),
            }
        )
        return

    if state.exists:
        version, last_idx, last_ts, n_turns, seen_json, props_json = state.get
        seen: set[int] = set(json.loads(seen_json))
        props: dict[str, Any] = json.loads(props_json)
    else:
        version, last_idx, last_ts, n_turns = 0, None, None, 0
        seen, props = set(), {}

    outputs: list[pd.DataFrame] = []
    for pdf in pdf_iter:
        if not len(pdf):
            continue
        # deterministic processing order within the batch
        pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
        # drop re-delivered turns (idempotence at the operator level)
        fresh = pdf[~pdf["turn_idx"].isin(seen)]
        if not len(fresh):
            continue

        # prior-turn correlation BEFORE updating state: each accepted turn
        # links to the previous accepted turn in (ts, turn_idx) order
        prev_idx_col: list[int | None] = []
        prev_ts_col: list[pd.Timestamp | None] = []
        versions: list[int] = []
        for _, row in fresh.iterrows():
            prev_idx_col.append(last_idx)
            prev_ts_col.append(pd.Timestamp(last_ts, unit="us") if last_ts is not None else None)
            version += 1
            versions.append(version)
            seen.add(int(row["turn_idx"]))
            last_idx = int(row["turn_idx"])
            last_ts = int(row["ts"].value // 1000)  # ns -> µs
            n_turns += 1

        triples = _extract_pdf(fresh.reset_index(drop=True))

        # conversation-level LWW: session activity property
        for _, row in fresh.iterrows():
            ts_us = int(row["ts"].value // 1000)
            cur = props.get("conv.last_activity")
            cand = (ts_us, int(row["turn_idx"]))
            if cur is None or cand > (cur[0], cur[1]):
                props["conv.last_activity"] = [ts_us, int(row["turn_idx"])]

        lookup_idx = dict(zip(fresh["turn_idx"].tolist(), range(len(fresh))))
        tpos = triples["seq"].map(lookup_idx)
        out = pd.DataFrame(
            {
                "kind": "triple",
                "conv_id": conv_id,
                "turn_idx": triples["seq"].astype("Int32"),
                "subject": triples["subject"],
                "predicate": triples["predicate"],
                "object": triples["object"],
                "object_type": triples["object_type"],
                "ts": triples["ts"],
                "prev_turn_idx": pd.array(
                    [prev_idx_col[i] for i in tpos], dtype="Int32"
                ),
                "prev_ts": [prev_ts_col[i] for i in tpos],
                "version": pd.array([versions[i] for i in tpos], dtype="Int64"),
            }
        )
        outputs.append(out)

    state.update(
        (
            version,
            last_idx,
            last_ts,
            n_turns,
            json.dumps(sorted(seen)),
            json.dumps(props),
        )
    )
    # evict idle conversations 1h past max(watermark, last event time) —
    # the watermark can still be 0 in the first micro-batch, so anchor on
    # the group's own event time too or the timer would never be armed
    anchor_ms = max(state.getCurrentWatermarkMs(), (last_ts or 0) // 1000)
    state.setTimeoutTimestamp(anchor_ms + 3_600_000)

    for out in outputs:
        yield out


def conversation_graph_deltas(
    transcripts: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming transform: transcript stream → graph-delta stream.

    Requires a streaming DataFrame. State is per conv_id in the RocksDB
    state store; hot conversations are single-key partitions — Spark
    hashes keys across ``spark.sql.shuffle.partitions`` tasks, and AQE
    does not apply to stateful exchanges, so the shuffle-partition count
    set at first run is the lever for 1000-executor scale.
    """
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _merge_conversation,
            outputStructType=DELTA_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
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
