"""Stream-stream tool-call attachment join.

The HL7v2IO.Read "attach content to notification" analogue (SURVEY §2.1) in
event-time form: tool turns join their conversation's recent assistant turns
under watermarks, so both sides' state is bounded and Spark can age it out.

A watermarked stream-stream join emits ALL assistant turns in the range, not
just the originating one; the as-of "latest prior" pick is a per-tool-turn
argmax done with one more aggregation (still incremental: grouped by the
tool turn's identity). This is the standard Spark decomposition — range
join for candidates + argmax for the winner.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attach_tool_calls_stream(
    transcripts: DataFrame,
    watermark_delay: str = "10 minutes",
    lookback: str = "5 minutes",
) -> DataFrame:
    """tool turn -> candidate originating assistant turns within lookback.

    Returns one row per (tool turn, matching assistant turn); downstream
    picks the max assistant turn_idx per tool turn (see pick_origin)."""
    tool = (
        transcripts.filter(F.col("role") == "tool")
        .withWatermark("ts", watermark_delay)
        .select(
            F.col("conv_id").alias("t_conv_id"),
            F.col("turn_idx").alias("t_turn_idx"),
            F.col("tool"),
            F.col("ts").alias("t_ts"),
        )
    )
    asst = (
        transcripts.filter(F.col("role") == "assistant")
        .withWatermark("ts", watermark_delay)
        .select(
            F.col("conv_id").alias("a_conv_id"),
            F.col("turn_idx").alias("a_turn_idx"),
            F.col("text").alias("a_text"),
            F.col("ts").alias("a_ts"),
        )
    )
    return tool.join(
        asst,
        F.expr(
            f"""
            t_conv_id = a_conv_id
            AND a_turn_idx < t_turn_idx
            AND a_ts BETWEEN t_ts - INTERVAL {lookback} AND t_ts
            """
        ),
        "inner",
    )


def pick_origin(candidates: DataFrame) -> DataFrame:
    """argmax(a_turn_idx) per tool turn — the 'latest prior assistant turn'
    winner. Runs per micro-batch inside foreachBatch (candidates for one
    tool turn always co-arrive once both watermarks pass)."""
    return (
        candidates.groupBy("t_conv_id", "t_turn_idx", "tool")
        .agg(
            F.max_by(F.struct("a_turn_idx", "a_text"), F.col("a_turn_idx")).alias("_o")
        )
        .select(
            F.col("t_conv_id").alias("conv_id"),
            F.col("t_turn_idx").alias("turn_idx"),
            "tool",
            F.col("_o.a_turn_idx").alias("origin_turn_idx"),
            F.col("_o.a_text").alias("origin_text"),
        )
    )
