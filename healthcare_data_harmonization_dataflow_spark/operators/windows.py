"""Windowed aggregation operators.

The reference uses windowing for exactly one thing: chunking error streams
into 5-second processing-time files (Hl7v2ToFhirStreamingRunner.java:168-175).
The north-star engine adds real event-time analytics: tumbling / sliding /
session windows over the transcript stream. All three are single-shuffle
declarative plans (partial aggregation map-side, final after exchange) —
Catalyst emits hash-aggregates with whole-stage codegen; at 100 TB the
shuffle is keyed on (window, key) so AQE can coalesce/split skewed windows.

These operators are batch/streaming agnostic: the same expressions run under
``readStream`` with ``withWatermark`` (see streaming/pipeline.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling(
    df: DataFrame,
    ts_col: str,
    duration: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Tumbling event-time window aggregation."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    grp = [F.window(ts_col, duration).alias("win")] + [F.col(k) for k in (keys or [])]
    out = df.groupBy(*grp).agg(*aggs)
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *[c for c in out.columns if c != "win"],
    )


def sliding(
    df: DataFrame,
    ts_col: str,
    duration: str,
    slide: str,
    keys: list[str] | None = None,
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Sliding event-time window aggregation (each row lands in
    duration/slide windows; Spark expands via its internal window generator,
    still one shuffle)."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    grp = [F.window(ts_col, duration, slide).alias("win")] + [F.col(k) for k in (keys or [])]
    out = df.groupBy(*grp).agg(*aggs)
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *[c for c in out.columns if c != "win"],
    )


def session(
    df: DataFrame,
    ts_col: str,
    gap: str,
    keys: list[str],
    aggs: list[Column] | None = None,
) -> DataFrame:
    """Session windows (gap-based) keyed by ``keys`` — the batch analogue of
    the streaming conversation assembly. Uses the built-in
    ``session_window`` generator: rows within ``gap`` of each other merge
    into one session; a single shuffle on (key, session)."""
    aggs = aggs or [F.count(F.lit(1)).alias("n")]
    out = df.groupBy(F.session_window(ts_col, gap).alias("win"), *[F.col(k) for k in keys]).agg(
        *aggs
    )
    return out.select(
        F.col("win.start").alias("win_start"),
        F.col("win.end").alias("win_end"),
        *[c for c in out.columns if c != "win"],
    )
