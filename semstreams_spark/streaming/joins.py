"""Watermarked stream-stream joins (J4 as a real interval join).

The keyed-state form of turn→tool correlation lives in
``state_merge.py`` (exact, unbounded lookback per conversation). This
module provides the alternative Spark-native shape: two streams off the
same source joined with an event-time range condition under watermarks —
the form that generalizes to correlating two *different* input streams
(e.g. a separate tool-invocation log), where per-key state would need a
second input anyway.

State bound: the range condition + watermarks let Spark evict join state
older than (watermark - max_lag) automatically — this is what keeps the
join viable at 10^12 turns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tool_request_interval_join(
    transcripts: DataFrame,
    watermark: str = "10 minutes",
    max_lag_seconds: int = 120,
) -> DataFrame:
    """Join each tool turn to candidate requesting turns: same conv_id,
    requester strictly earlier, within max_lag_seconds.

    Returns (conv_id, tool_turn_idx, tool, tool_ts, req_turn_idx, req_ts).
    A tool turn may match several candidates within the window — the
    exact "most recent" pick is the keyed-state operator's job; this join
    is the bounded-lag candidate generator (dedup with a downstream
    groupBy max_by when run in batch).
    """
    tools = (
        transcripts.filter(F.col("role") == "tool")
        .select(
            F.col("conv_id"),
            F.col("turn_idx").alias("tool_turn_idx"),
            F.col("tool"),
            F.col("ts").alias("tool_ts"),
        )
        .withWatermark("tool_ts", watermark)
    )
    reqs = (
        transcripts.filter(F.col("role") != "tool")
        .select(
            F.col("conv_id").alias("req_conv_id"),
            F.col("turn_idx").alias("req_turn_idx"),
            F.col("ts").alias("req_ts"),
        )
        .withWatermark("req_ts", watermark)
    )
    cond = (
        (tools["conv_id"] == reqs["req_conv_id"])
        & (reqs["req_ts"] < tools["tool_ts"])
        & (reqs["req_ts"] >= tools["tool_ts"] - F.expr(f"INTERVAL {max_lag_seconds} SECONDS"))
    )
    return tools.join(reqs, cond, "inner").select(
        "conv_id", "tool_turn_idx", "tool", "tool_ts", "req_turn_idx", "req_ts"
    )
