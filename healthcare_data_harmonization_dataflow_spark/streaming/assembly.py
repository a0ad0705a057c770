"""Stateful conversation assembly — session windows + turn reordering.

The north-star's core streaming operator (SURVEY §2.5 "ABSENT in the
reference" row): buffer each conversation's turns in keyed state, reorder by
``turn_idx`` regardless of arrival order, and emit one harmonized bundle when
the session times out (no turn for ``gap``, measured in event time against
the watermark).

Implementation: ``applyInPandasWithState`` keyed by ``conv_id`` —
* state = (accumulated turns array, max event-time seen);
* every micro-batch appends the new turns (Arrow-batched, no per-row
  Python over the wire) and re-arms an event-time timeout at
  ``max_ts + gap``;
* on timeout the state is drained: turns sorted by (turn_idx, role, text) —
  NEVER by arrival/shuffle order (SURVEY §7.4 risk 2) — and one bundle row
  is emitted, byte-compatible with the batch ``assemble_bundles`` operator.

Skew: the shuffle into the stateful operator is keyed by conv_id only (state
keys must stay unsalted — BASELINE north_rule). A hot conversation
serializes one task but state updates are O(new turns) and ingestion is
vectorized, so the hot task does not straggle — MEASURED (round 4, 1M turns,
local[32], BENCH.md skew table): one conversation holding 0% / 10% / 30% /
90% of all turns sustains 19.8k / 23.3k / 26.9k / 24.2k turns/s — more skew
is FASTER, because per-key overhead (state-store entries, handler
invocations, timeout bookkeeping) dominates per-turn cost. A salted
pre-combine before the state exchange is therefore measurably unnecessary;
if a future profile disagrees, it belongs UPSTREAM of this operator (state
keys stay unsalted regardless — test_state_keys_are_unsalted_under_skew).
State size for a never-gapping conversation is bounded by the opt-in
``max_open_turns`` frozen-prefix flush.
"""

from __future__ import annotations

import json
from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
import pickle

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

BUNDLE_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("n_turns", LongType()),
        StructField("bundle", StringType()),
        StructField("session_start", TimestampType()),
        StructField("session_end", TimestampType()),
    ]
)

_TURN = StructType(
    [
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("ts_us", LongType()),  # event time, microseconds
    ]
)

STATE_SCHEMA = StructType(
    # Buffered turns travel as ONE pickled binary cell per key instead of
    # array<struct>: the state protocol then moves an opaque blob, skipping
    # per-element Arrow<->Python struct conversion on every micro-batch —
    # the dominant cost for a hot conversation whose open session holds
    # thousands of turns.
    #
    # NOTE this state layout is INCOMPATIBLE with checkpoints written by the
    # array<struct> layout of earlier builds — resume those with the old
    # code or reprocess. The blob carries a leading version byte so a future
    # format change is detected explicitly instead of failing inside
    # pickle.loads.
    [StructField("turns_blob", BinaryType()), StructField("max_ts_us", LongType())]
)

_STATE_VERSION = 1


def _pack_turns(turns: list) -> bytes:
    return bytes([_STATE_VERSION]) + pickle.dumps(
        turns, protocol=pickle.HIGHEST_PROTOCOL
    )


def _unpack_turns(blob: bytes) -> list:
    if not blob or blob[0] != _STATE_VERSION:
        raise ValueError(
            f"incompatible session-state blob (version {blob[0] if blob else 'empty'}, "
            f"expected {_STATE_VERSION}): the checkpoint was written by a "
            "different engine build — resume it with that build or reprocess"
        )
    return pickle.loads(blob[1:])


def _render_bundle(turns: list) -> str:
    turns = sorted(turns, key=lambda t: (t[0], t[1], t[2]))
    return json.dumps(
        [{"turn_idx": int(t[0]), "role": t[1], "text": t[2]} for t in turns],
        ensure_ascii=False,
        separators=(",", ":"),
    )


def _split_sessions(turns: list, gap_us: int) -> list[list]:
    """Event-time session split: sort by (ts, turn_idx) and break where the
    inter-turn gap reaches ``gap`` — the same semantics as
    ``F.session_window`` (strict: diff >= gap starts a new session)."""
    turns = sorted(turns, key=lambda t: (t[3], t[0]))
    sessions, cur = [], [turns[0]]
    for t in turns[1:]:
        if t[3] - cur[-1][3] >= gap_us:
            sessions.append(cur)
            cur = [t]
        else:
            cur.append(t)
    sessions.append(cur)
    return sessions


def _bundle_row(key, session: list, gap_seconds: int) -> dict:
    ts = [t[3] for t in session]
    return {
        "conv_id": key[0],
        "n_turns": len(session),
        "bundle": _render_bundle(session),
        "session_start": pd.Timestamp(min(ts), unit="us"),
        "session_end": pd.Timestamp(max(ts) + gap_seconds * 1_000_000, unit="us"),
    }


def _chunks(session: list, max_turns: int | None) -> list[list]:
    """Bundle-size cap (production knob, mirrors the batch operator's
    max_turns_per_bundle): a giant session emits several bundles instead of
    one enormous JSON render in a single task."""
    if not max_turns or len(session) <= max_turns:
        return [session]
    ordered = sorted(session, key=lambda t: (t[0], t[1], t[2]))
    return [ordered[i : i + max_turns] for i in range(0, len(ordered), max_turns)]


def _assemble(
    key: Tuple[str],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_seconds: int,
    max_turns_per_bundle: int | None = None,
    max_open_turns: int | None = None,
) -> Iterator[pd.DataFrame]:
    gap_us = gap_seconds * 1_000_000

    if state.hasTimedOut:
        (blob, _) = state.get
        turns = _unpack_turns(blob)
        rows = [
            _bundle_row(key, c, gap_seconds)
            for s in _split_sessions(turns, gap_us)
            for c in _chunks(s, max_turns_per_bundle)
        ]
        state.remove()
        yield pd.DataFrame(rows)
        return

    wm_us = state.getCurrentWatermarkMs() * 1000

    turns: list[Any] = []
    if state.exists:
        (blob, _) = state.get
        turns = _unpack_turns(blob)
    for pdf in pdfs:
        # Vectorized ingestion: numpy column extraction + one C-level zip —
        # no per-row Python (input_hint: pandas/Arrow batch fns throughout).
        ts_us_arr = pdf["ts"].to_numpy("datetime64[us]").astype("int64")
        # Spark does NOT pre-filter late input for this operator (verified
        # against 4.1 behavior); enforce the reference's allowedLateness=ZERO
        # ourselves: drop rows behind the watermark.
        live = ts_us_arr >= wm_us
        if not live.all():
            pdf = pdf[live]
            ts_us_arr = ts_us_arr[live]
        turns.extend(
            zip(
                pdf["turn_idx"].to_numpy("int64").tolist(),
                pdf["role"].tolist(),
                pdf["text"].tolist(),
                ts_us_arr.tolist(),
            )
        )
    if not turns:
        if state.exists:
            state.remove()
        return

    # incremental emission: a session whose end+gap is below the watermark can
    # never legally grow (later rows would be dropped as late), so emit it now
    # and shrink state — this is what bounds state size on an endless stream.
    sessions = _split_sessions(turns, gap_us)
    complete = [s for s in sessions if s[-1][3] + gap_us <= wm_us]
    open_sessions = [s for s in sessions if s[-1][3] + gap_us > wm_us]

    # State-size guard: incremental emission bounds state EXCEPT for one
    # never-gapping conversation, whose open session grows without limit
    # (and whose blob is re-pickled O(buffered) every batch). When an open
    # session exceeds ``max_open_turns``, its FROZEN prefix is flushed
    # early: turns with ts < watermark can never be preceded, interleaved,
    # or re-split by a future on-time arrival (late rows are dropped), so
    # flushing them loses nothing — the trade is session FRAGMENTATION
    # (several bundles for one logical session, fragment session_start/
    # session_end local to each fragment), which is why the guard is
    # opt-in. Turns at/after the watermark always stay buffered.
    if max_open_turns:
        kept = []
        for s in open_sessions:
            if len(s) > max_open_turns:
                n_frozen = sum(1 for t in s if t[3] < wm_us)  # ts-sorted prefix
                n_flush = min(n_frozen, len(s) - max_open_turns // 2)
                if n_flush > 0:
                    complete.append(s[:n_flush])
                    s = s[n_flush:]
            if s:
                kept.append(s)
        open_sessions = kept

    if open_sessions:
        remaining = [t for s in open_sessions for t in s]
        max_ts_us = max(t[3] for t in remaining)
        state.update((_pack_turns(remaining), max_ts_us))
        # event-time timeout: final flush when the watermark passes last+gap
        # (must be strictly later than the current watermark in ms)
        state.setTimeoutTimestamp(
            max(max_ts_us // 1000 + gap_seconds * 1000, state.getCurrentWatermarkMs() + 1)
        )
    elif state.exists:
        state.remove()

    if complete:
        yield pd.DataFrame(
            [
                _bundle_row(key, c, gap_seconds)
                for s in complete
                for c in _chunks(s, max_turns_per_bundle)
            ]
        )


def assemble_sessions_stateful(
    transcripts: DataFrame,
    gap: str = "5 minutes",
    watermark_delay: str | None = "10 minutes",
    max_turns_per_bundle: int | None = None,
    max_open_turns: int | None = None,
) -> DataFrame:
    """Streaming session assembly. ``transcripts`` must contain
    conv_id/turn_idx/role/text/ts. Watermark on ts bounds state size and
    drives the event-time session timeout. ``max_turns_per_bundle`` caps
    bundle size (chunked emission for hot conversations);
    ``max_open_turns`` caps OPEN-session state per key (frozen-prefix
    early flush — see _assemble; trades session fragmentation for bounded
    state on a never-gapping conversation).
    ``watermark_delay=None`` means the input stream ALREADY carries a
    watermark on ts (e.g. an upstream dropDuplicatesWithinWatermark) —
    re-defining one is disallowed by Spark."""
    gap_seconds = _parse_seconds(gap)

    def fn(key, pdfs, state):
        return _assemble(
            key, pdfs, state, gap_seconds, max_turns_per_bundle, max_open_turns
        )

    t = transcripts.select("conv_id", "turn_idx", "role", "text", "ts")
    if watermark_delay is not None:
        t = t.withWatermark("ts", watermark_delay)
    return (
        t
        .groupBy("conv_id")
        .applyInPandasWithState(
            fn,
            outputStructType=BUNDLE_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _parse_seconds(s: str) -> int:
    n, unit = s.split()
    mult = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60, "hour": 3600, "hours": 3600}
    return int(n) * mult[unit]


def assemble_sessions_window(
    transcripts,
    gap: str = "5 minutes",
    watermark_delay: str = "10 minutes",
):
    """Pure-JVM streaming session assembly: the built-in ``session_window``
    aggregation instead of Python state — ZERO Python in the hot path, the
    whole operator lives in Tungsten's streaming session aggregation.

    Output-identical to :func:`assemble_sessions_stateful` for the common
    feature set (tests assert byte equality): session split where the
    inter-turn gap reaches ``gap`` (session_window merges windows that
    overlap, i.e. diff < gap), ``session_end`` = last ts + gap (the merged
    window's end), bundle = compact JSON of turns sorted by
    (turn_idx, role, text) — ``to_json`` with ``ignoreNullFields=false``
    renders byte-identically to the state handler's ``json.dumps``.
    Emission when the watermark passes the session end (append mode), the
    same completion rule as the stateful drain; rows behind the watermark
    are dropped (allowedLateness=ZERO).

    Reach for the STATEFUL operator only when its extras are needed:
    ``max_turns_per_bundle`` chunking of giant sessions, or custom per-drain
    instrumentation. Everything else should prefer this plan — Catalyst
    handles partial aggregation, state-store layout and skew, and the
    per-batch Arrow round-trip disappears."""
    from pyspark.sql import functions as F

    t = transcripts.select("conv_id", "turn_idx", "role", "text", "ts")
    if watermark_delay is not None:  # None = already watermarked upstream
        t = t.withWatermark("ts", watermark_delay)
    return (
        t.groupBy("conv_id", F.session_window("ts", gap).alias("_w"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_turns"),
            F.sort_array(
                F.collect_list(F.struct("turn_idx", "role", "text"))
            ).alias("_turns"),
        )
        .select(
            "conv_id",
            "n_turns",
            F.to_json(F.col("_turns"), {"ignoreNullFields": "false"}).alias(
                "bundle"
            ),
            F.col("_w.start").alias("session_start"),
            F.col("_w.end").alias("session_end"),
        )
    )
