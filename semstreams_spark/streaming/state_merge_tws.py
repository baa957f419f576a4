"""Conversation merge on Spark 4's transformWithStateInPandas — the
DEFAULT stateful engine when the runtime supports it (round-5 worklist
item: ride the maintained API).

Same per-conversation semantics as ``state_merge.py``'s
``applyInPandasWithState`` operator — (ts, turn_idx)-ordered acceptance,
cross- and intra-batch turn dedup, prior-turn linkage, tool-turn
request correlation (J4), monotone version counter, conv-level LWW
props, session_end on event-time timeout (W6) — because BOTH operators
call the SAME per-chunk core (``state_merge._merge_chunk`` /
``_session_end_frame``): parity is by construction, and
``tests/test_streaming.py::test_tws_matches_applyinpandaswithstate``
pins it end-to-end wherever the TWS runtime exists.

Engine selection (``state_merge.accepted_turns``): TWS when
``tws_supported()`` (protobuf importable — Spark's Python state-server
protocol needs it) and not overridden; ``SPARK_GRAFT_STATE_ENGINE=legacy``
pins applyInPandasWithState, ``=tws`` forces TWS (errors loudly where
unsupported). This image lacks protobuf, so local tests exercise the
legacy path and the TWS parity test env-skips; on a protobuf-equipped
cluster the default flips to TWS automatically.

State layout mirrors the legacy operator field-for-field (scalars +
packed seen set + props JSON) so the two engines stay drop-in
equivalents; timers replace GroupState.setTimeoutTimestamp — one timer
per conversation at max(watermark, last event time) + 1h, replaced on
each update (deleteTimer of the previous expiry, registerTimer of the new).
Reference semantics anchor: entity upsert + session lifecycle,
``processor/graph/messagemanager/processor.go:183-298``.
"""

from __future__ import annotations

import json
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

from .state_merge import (
    ACCEPTED_SCHEMA,
    _merge_chunk,
    _session_end_frame,
)

_SCALARS_SCHEMA = "version long, last_idx int, last_ts long, n_turns long, last_req_idx int"
_EMPTY = np.empty(0, np.int32)


def tws_supported() -> bool:
    """transformWithStateInPandas needs google.protobuf (the Python
    state-server wire protocol); absent → the legacy operator backs the
    pipeline.

    Probes a real protobuf module, not the bare package: under
    spark-submit the JVM jars land on the python path and
    spark-core_*.jar's Java-side ``google/protobuf`` resource directory
    imports as an EMPTY namespace package — ``import google.protobuf``
    succeeds there with no protobuf runtime behind it, which selected
    TWS on a runtime that cannot run it (measured: the job then dies in
    the TWS pre-init runner)."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class ConvMergeProcessor(StatefulProcessor):
    """Per-conversation accept/dedup/linkage on the TWS API — a thin
    stateful shell around the shared ``state_merge._merge_chunk`` core."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._scalars = handle.getValueState("scalars", _SCALARS_SCHEMA)
        self._seen = handle.getListState("seen", "turn_idx int")
        self._props = handle.getValueState("props", "props_json string")

    def _load(self):
        if self._scalars.exists():
            version, last_idx, last_ts, n_turns, last_req_idx = self._scalars.get()
            seen_list = [r[0] for r in self._seen.get()]
            seen = np.asarray(seen_list, dtype=np.int32) if seen_list else _EMPTY
            existed = True
        else:
            version, last_idx, last_ts, n_turns, last_req_idx = 0, None, None, 0, None
            seen = _EMPTY
            existed = False
        return version, last_idx, last_ts, n_turns, last_req_idx, seen, existed

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        version, last_idx, last_ts, n_turns, last_req_idx, seen, existed = self._load()

        new_seen = [seen]
        outputs = []
        for pdf in rows:
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

        if len(new_seen) > 1 or not existed:
            props = json.loads(self._props.get()[0]) if self._props.exists() else {}
            if last_ts is not None:
                cur = props.get("conv.last_activity")
                cand = [last_ts, last_idx]
                if cur is None or cand > cur:
                    props["conv.last_activity"] = cand
            self._scalars.update((version, last_idx, last_ts, n_turns, last_req_idx))
            self._props.update((json.dumps(props),))
            fresh = np.concatenate(new_seen[1:]) if len(new_seen) > 1 else _EMPTY
            if len(fresh):
                self._seen.appendList([(int(i),) for i in fresh])

        # evict idle conversations 1h past max(watermark, last event time)
        # — same anchor rule as the legacy operator (the watermark can be
        # 0 in the first micro-batch); timers REPLACE, so drop the prior
        # one (at most one exists per conversation by this invariant)
        anchor_ms = max(timerValues.getCurrentWatermarkInMs(), (last_ts or 0) // 1000)
        new_expiry = anchor_ms + 3_600_000
        for expiry in list(self._handle.listTimers()):
            if expiry != new_expiry:
                self._handle.deleteTimer(expiry)
        self._handle.registerTimer(new_expiry)

        yield from outputs

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo) -> Iterator[pd.DataFrame]:
        (conv_id,) = key
        if not self._scalars.exists():
            return
        version, last_idx, last_ts, n_turns, _ = self._scalars.get()
        self._scalars.clear()
        self._seen.clear()
        self._props.clear()
        yield _session_end_frame(conv_id, version, last_idx, last_ts, n_turns)

    def close(self) -> None:
        pass


def accepted_turns_tws(transcripts: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming accepted-turn stream on transformWithStateInPandas —
    output-identical to state_merge's legacy operator (shared core)."""
    return (
        transcripts.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .transformWithStateInPandas(
            statefulProcessor=ConvMergeProcessor(),
            outputStructType=ACCEPTED_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
