"""Conversation merge on Spark 4's transformWithStateInPandas.

The production operator (``state_merge.py``) uses
``applyInPandasWithState``; this is the SAME per-conversation semantics —
(ts, turn_idx)-ordered acceptance, cross- and intra-batch turn dedup,
prior-turn linkage, monotone version counter — on the successor API
(StatefulProcessor + typed state variables over the RocksDB store).
``tests/test_streaming.py::test_tws_matches_applyinpandaswithstate``
pins output parity between the two, so either can back the pipeline.

Why both exist: applyInPandasWithState is the stable, widely-deployed
API; transformWithStateInPandas adds typed state (Value/List/Map),
per-key timers, and state TTL natively — the shape Spark is moving to.
The state layout here is deliberately identical (scalars + the seen
turn-idx set), so a migration is a sink swap, not a semantics change.

Runtime requirement: TWS's Python state server speaks protobuf
(``pyspark.sql.streaming.proto``) — ``google.protobuf`` must be
installed on the cluster (it is absent from this test image, so the
parity test skips there; applyInPandasWithState remains the default).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

ACCEPTED_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, prev_turn_idx int, prev_ts timestamp, version long"
)

_SCALARS_SCHEMA = "version long, last_idx int, last_ts long, n_turns long"


class ConvMergeProcessor(StatefulProcessor):
    """Per-conversation accept/dedup/linkage — mirrors the
    applyInPandasWithState function's logic 1:1 (state_merge.py)."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._scalars = handle.getValueState("scalars", _SCALARS_SCHEMA)
        self._seen = handle.getListState("seen", "turn_idx int")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        conv_id = key[0]
        if self._scalars.exists():
            version, last_idx, last_ts, n_turns = self._scalars.get()
            seen_list = [r[0] for r in self._seen.get()]
            seen = np.asarray(seen_list, dtype=np.int32) if seen_list else np.empty(0, np.int32)
        else:
            version, last_idx, last_ts, n_turns = 0, None, None, 0
            seen = np.empty(0, np.int32)

        new_seen = [seen]
        for pdf in rows:
            if not len(pdf):
                continue
            idx = pdf["turn_idx"].to_numpy(dtype=np.int32, copy=False)
            ts_us = pdf["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
            order = np.lexsort((idx, ts_us))
            idx, ts_us = idx[order], ts_us[order]
            mask = ~np.isin(idx, np.concatenate(new_seen))
            _, first_i = np.unique(idx, return_index=True)
            first_occ = np.zeros(len(idx), dtype=bool)
            first_occ[first_i] = True
            mask &= first_occ
            k = int(mask.sum())
            if k == 0:
                continue
            sel = order[mask]
            idx_a, ts_a = idx[mask], ts_us[mask]

            prev_idx = np.empty(k, dtype=object)
            prev_idx[0] = last_idx
            prev_idx[1:] = idx_a[:-1].astype(object)
            prev_ts = np.empty(k, dtype="datetime64[us]")
            prev_ts[0] = np.datetime64(last_ts, "us") if last_ts is not None else np.datetime64("NaT")
            prev_ts[1:] = ts_a[:-1].astype("datetime64[us]")

            yield pd.DataFrame(
                {
                    "conv_id": conv_id,
                    "turn_idx": pd.array(idx_a, dtype="Int32"),
                    "role": pdf["role"].to_numpy(copy=False)[sel],
                    "text": pdf["text"].to_numpy(copy=False)[sel],
                    "tool": pdf["tool"].to_numpy(copy=False)[sel],
                    "ts": ts_a.astype("datetime64[us]"),
                    "prev_turn_idx": pd.array(prev_idx, dtype="Int32"),
                    "prev_ts": prev_ts,
                    "version": np.arange(version + 1, version + k + 1, dtype=np.int64),
                }
            )
            version += k
            n_turns += k
            last_idx = int(idx_a[-1])
            last_ts = int(ts_a[-1])
            new_seen.append(idx_a)

        if len(new_seen) > 1 or not self._scalars.exists():
            self._scalars.update((version, last_idx, last_ts, n_turns))
            fresh = np.concatenate(new_seen[1:]) if len(new_seen) > 1 else np.empty(0, np.int32)
            if len(fresh):
                self._seen.appendList([(int(i),) for i in fresh])

    def close(self) -> None:
        pass


def accepted_turns_tws(transcripts: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Streaming accepted-turn stream on transformWithStateInPandas —
    output-identical to state_merge.accepted_turns' core columns."""
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
