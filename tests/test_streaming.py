"""Streaming pipeline tests (SURVEY §5 port, tiers 2-4).

Covers: stateful session assembly under shuffled arrival, dead-letter
branch in streaming, exactly-once replay idempotence, and the
stream-stream tool-call join. Bounded runs use availableNow + a flush
sentinel (a far-future row that pushes the watermark past every real
session's timeout — the bounded-replay analogue of an endless stream).
"""

import json
import os

import pytest
from pyspark.sql import functions as F

from healthcare_data_harmonization_dataflow_spark.operators.bundles import assemble_bundles
from healthcare_data_harmonization_dataflow_spark.sources.transcripts import (
    append_flush_sentinel,
    generate_transcripts,
)
from healthcare_data_harmonization_dataflow_spark.streaming.join import (
    attach_tool_calls_stream,
    pick_origin,
)
from healthcare_data_harmonization_dataflow_spark.streaming.pipeline import (
    HarmonizationPipeline,
)
from healthcare_data_harmonization_dataflow_spark.streaming.sink import (
    ExactlyOnceParquetSink,
)

CFG = "out Output: Proj(root);\ndef Proj(input) { foo: input.bar; }"


def _write_input(spark, path, total_turns=400, with_sentinel=True, **kwargs):
    kwargs.setdefault("late_one_in", 10**9)  # no very-late rows in goldens
    df = generate_transcripts(spark, total_turns=total_turns, num_partitions=8, **kwargs)
    df.write.mode("overwrite").parquet(path)
    if with_sentinel:
        # far-future row appended LAST (later mtime): flushes sessions at EOF
        append_flush_sentinel(spark, path)
    return spark.read.parquet(path).filter(F.col("conv_id") != "conv-sentinel")


def _run_pipeline(spark, tmp, input_path, gap="2 minutes", delay="36 hours"):
    # generator arrival order is globally shuffled (disorder up to a day),
    # so the correctness watermark must cover the full disorder span; the
    # late-data test below uses a tight watermark instead
    pipe = HarmonizationPipeline(
        mapping_config=CFG,
        out_dir=os.path.join(tmp, "out"),
        session_gap=gap,
        watermark_delay=delay,
        trigger={"availableNow": True},
        max_files_per_trigger=4,  # force several micro-batches: exercises
        # watermark progression + mid-stream state, not one giant batch
    )
    q1 = pipe.run_harmonization(spark, input_path, os.path.join(tmp, "ckpt_h"))
    q2 = pipe.run_deadletter(spark, input_path, os.path.join(tmp, "ckpt_d"))
    q1.awaitTermination(300)
    q2.awaitTermination(300)
    return pipe


def test_streaming_harmonization_end_to_end(spark, tmp_path):
    tmp = str(tmp_path)
    inp = os.path.join(tmp, "transcripts")
    src = _write_input(spark, inp)
    pipe = _run_pipeline(spark, tmp, inp)

    bundles = pipe.bundles(spark).filter(F.col("conv_id") != "conv-sentinel")
    dead = pipe.deadletter(spark)

    # --- dead-letter: exactly the malformed rows, step=mapping
    n_bad = src.filter((F.col("text") == "{") & (F.col("conv_id") != "conv-sentinel")).count()
    assert dead.count() == n_bad
    assert set(r["step"] for r in dead.select("step").distinct().collect()) == {"mapping"}

    # --- bundles: one session per conversation (turns 10s apart << 2min gap),
    # byte-identical to the batch assembly of the mapped ok rows
    from healthcare_data_harmonization_dataflow_spark.operators.mapping_op import apply_mapping
    from healthcare_data_harmonization_dataflow_spark.model.errors import ok_rows

    batch_ok = ok_rows(
        apply_mapping(src.filter(F.col("conv_id") != "conv-sentinel"), CFG,
                      id_col="conv_id", data_col="text")
    ).select("conv_id", "turn_idx", "role", F.col("ok").alias("text"))
    expected = {
        r["conv_id"]: (r["n_turns"], r["bundle"]) for r in assemble_bundles(batch_ok).collect()
    }
    got = {r["conv_id"]: (r["n_turns"], r["bundle"]) for r in bundles.collect()}
    assert got == expected

    # --- reordering invariant: every bundle sorted by turn_idx despite
    # shuffled arrival order
    for _, (_, bundle) in got.items():
        idxs = [t["turn_idx"] for t in json.loads(bundle)]
        assert idxs == sorted(idxs)


def test_streaming_exactly_once_replay(spark, tmp_path):
    tmp = str(tmp_path)
    inp = os.path.join(tmp, "transcripts")
    _write_input(spark, inp, total_turns=200)
    pipe = _run_pipeline(spark, tmp, inp)
    first = pipe.bundles(spark).count()
    first_batches = pipe.bundles_sink.committed_batches()
    assert first > 0

    # restart from the SAME checkpoint: no new data -> no new commits, no dupes
    pipe2 = _run_pipeline(spark, tmp, inp)
    assert pipe2.bundles(spark).count() == first
    assert pipe2.bundles_sink.committed_batches() == first_batches

    # simulate a replayed epoch (driver crash after write, before progress):
    # rewriting an already-committed batchId must be a no-op
    some_batch = first_batches[-1]
    sink = pipe.bundles_sink
    dummy = spark.createDataFrame([("x", 1, "b", None, None)], pipe_schema())
    sink.write_batch(dummy, some_batch)
    assert pipe.bundles(spark).count() == first


def pipe_schema():
    from healthcare_data_harmonization_dataflow_spark.streaming.assembly import BUNDLE_SCHEMA

    return BUNDLE_SCHEMA


@pytest.mark.parametrize("commit_mode", ["rename", "put"])
def test_streaming_exactly_once_replay_commit_modes(spark, tmp_path, commit_mode):
    """The FULL streaming replay contract under BOTH marker strategies —
    and for put-mode, against a simulated object store whose rename is
    UNAVAILABLE (write_text_atomic raises): the run can only succeed if
    the commit path genuinely never renames. Restart from the same
    checkpoint and a replayed epoch must both be no-ops either way."""
    from healthcare_data_harmonization_dataflow_spark.streaming.sink import (
        _LocalFs,
    )

    tmp = str(tmp_path)
    inp = os.path.join(tmp, "transcripts")
    _write_input(spark, inp, total_turns=200)

    class _NoRenameFs(_LocalFs):
        """Object-store facade: single-object PUTs only; the atomic-rename
        commit primitive does not exist."""

        def write_text_atomic(self, path, text):
            raise IOError("rename is not available on this store")

    def build():
        pipe = HarmonizationPipeline(
            mapping_config=CFG,
            out_dir=os.path.join(tmp, "out"),
            session_gap="2 minutes",
            watermark_delay="36 hours",
            trigger={"availableNow": True},
            max_files_per_trigger=4,
            commit_mode=commit_mode,
        )
        if commit_mode == "put":
            pipe.bundles_sink._fs_cache = _NoRenameFs()
            pipe.deadletter_sink._fs_cache = _NoRenameFs()
        return pipe

    pipe = build()
    q1 = pipe.run_harmonization(spark, inp, os.path.join(tmp, "ckpt_h"))
    q2 = pipe.run_deadletter(spark, inp, os.path.join(tmp, "ckpt_d"))
    q1.awaitTermination(300)
    q2.awaitTermination(300)
    first = pipe.bundles(spark).count()
    first_batches = pipe.bundles_sink.committed_batches()
    assert first > 0

    # restart from the SAME checkpoint: no new data -> no new commits
    pipe2 = build()
    rq1 = pipe2.run_harmonization(spark, inp, os.path.join(tmp, "ckpt_h"))
    rq2 = pipe2.run_deadletter(spark, inp, os.path.join(tmp, "ckpt_d"))
    rq1.awaitTermination(300)
    rq2.awaitTermination(300)
    assert pipe2.bundles(spark).count() == first
    assert pipe2.bundles_sink.committed_batches() == first_batches

    # replayed epoch (crash after write, before progress): no-op
    sink = pipe2.bundles_sink
    dummy = spark.createDataFrame([("x", 1, "b", None, None)], pipe_schema())
    sink.write_batch(dummy, first_batches[-1])
    assert pipe2.bundles(spark).count() == first


def test_tws_assembly_matches_v1(spark, tmp_path):
    """transformWithState assembly (ListState, O(new) appends) must produce
    byte-identical bundles to the applyInPandasWithState reference path,
    including session-gap splits."""
    from healthcare_data_harmonization_dataflow_spark.streaming.assembly_tws import (
        tws_available,
    )

    if not tws_available():
        pytest.skip("google.protobuf not available in this environment "
                    "(transformWithState state-server protocol dependency)")
    tmp = str(tmp_path)
    inp = os.path.join(tmp, "transcripts")
    _write_input(spark, inp, total_turns=300)

    outs = {}
    for mode in ("state_v1", "tws"):
        pipe = HarmonizationPipeline(
            mapping_config=CFG,
            out_dir=os.path.join(tmp, f"out_{mode}"),
            session_gap="2 minutes",
            watermark_delay="36 hours",
            trigger={"availableNow": True},
            max_files_per_trigger=4,
            assembly=mode,
        )
        q = pipe.run_harmonization(spark, inp, os.path.join(tmp, f"ck_{mode}"))
        q.awaitTermination(300)
        outs[mode] = {
            (r["conv_id"], r["n_turns"], r["bundle"])
            for r in pipe.bundles(spark).filter(F.col("conv_id") != "conv-sentinel").collect()
        }
    assert outs["tws"] == outs["state_v1"]
    assert len(outs["tws"]) > 0


def test_checkpoint_resume_with_new_data(spark, tmp_path):
    """Kill/restart continuation: a restarted query processes ONLY data that
    arrived after the first run, and the union of outputs equals a single
    uninterrupted run (checkpoint-resumable, no dupes, no loss)."""
    import time as _t

    tmp = str(tmp_path)
    inp = os.path.join(tmp, "in")
    os.makedirs(inp)
    t0 = _t.time()
    conv_a = [("A", i, "user", '{"bar":%d}' % i, None, f"2024-01-01 00:00:{i:02d}") for i in range(3)]
    _append_one_file(_turns_df(spark, conv_a), inp, t0)
    _append_one_file(
        _turns_df(spark, [("conv-sentinel", 0, "user", "{}", None, "2024-06-01 00:00:00")]),
        inp, t0 + 100,
    )

    pipe = HarmonizationPipeline(
        mapping_config=CFG, out_dir=os.path.join(tmp, "out"),
        session_gap="2 minutes", watermark_delay="1 minutes",
        trigger={"availableNow": True},
    )
    ck = os.path.join(tmp, "ckpt_h")
    q = pipe.run_harmonization(spark, inp, ck)
    q.awaitTermination(300)
    assert pipe.bundles(spark).filter(F.col("conv_id") == "A").count() == 1

    # stop/"crash", then new conversation B arrives; restart from checkpoint
    conv_b = [("B", i, "user", '{"bar":%d}' % i, None, f"2024-07-01 00:00:{i:02d}") for i in range(2)]
    _append_one_file(_turns_df(spark, conv_b), inp, t0 + 200)
    _append_one_file(
        _turns_df(spark, [("conv-sentinel", 1, "user", "{}", None, "2024-12-01 00:00:00")]),
        inp, t0 + 300,
    )
    q2 = pipe.run_harmonization(spark, inp, ck)
    q2.awaitTermination(300)

    bundles = pipe.bundles(spark).filter(F.col("conv_id").isin("A", "B"))
    got = {(r["conv_id"], r["n_turns"]) for r in bundles.collect()}
    assert got == {("A", 3), ("B", 2)}  # A not duplicated, B picked up


def test_sink_lineage(spark, tmp_path):
    sink = ExactlyOnceParquetSink(str(tmp_path / "s"), "t")
    df = spark.range(100).select(F.col("id").cast("string").alias("conv_id"))
    sink.write_batch(df.repartition(4), 0)
    lin = sink.lineage()
    assert len(lin) == 1 and lin[0]["rows"] == 100
    assert sum(p["rows"] for p in lin[0]["partitions"]) == 100
    assert len(lin[0]["partitions"]) == 4


def test_session_gap_splits_conversation(spark, tmp_path):
    """A conversation dormant for longer than the gap yields two bundles,
    split at the event-time gap (session_window semantics)."""
    tmp = str(tmp_path)
    rows = [
        ("A", 0, "user", '{"bar":1}', None, "2024-01-01 00:00:00"),
        ("A", 1, "assistant", '{"bar":2}', None, "2024-01-01 00:00:30"),
        # > 2 min dormancy -> new session
        ("A", 2, "user", '{"bar":3}', None, "2024-01-01 00:10:00"),
        ("A", 3, "assistant", '{"bar":4}', None, "2024-01-01 00:10:30"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_s string"
    ).select("conv_id", "turn_idx", "role", "text", "tool",
             F.col("ts_s").cast("timestamp").alias("ts"))
    inp = os.path.join(tmp, "in")
    df.write.mode("overwrite").parquet(inp)
    append_flush_sentinel(spark, inp)

    pipe = _run_pipeline(spark, tmp, inp, gap="2 minutes")
    bundles = pipe.bundles(spark).filter(F.col("conv_id") == "A").orderBy("session_start")
    got = [(r["n_turns"], json.loads(r["bundle"])) for r in bundles.collect()]
    assert len(got) == 2
    assert [t["turn_idx"] for t in got[0][1]] == [0, 1]
    assert [t["turn_idx"] for t in got[1][1]] == [2, 3]


def _turns_df(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, tool string, ts_s string"
    ).select(
        "conv_id", "turn_idx", "role", "text", "tool", F.col("ts_s").cast("timestamp").alias("ts")
    )


def _append_one_file(df, inp, mtime):
    before = set(os.listdir(inp)) if os.path.isdir(inp) else set()
    df.coalesce(1).write.mode("append").parquet(inp)
    new = [f for f in os.listdir(inp) if f.endswith(".parquet") and f not in before]
    for f in new:
        os.utime(os.path.join(inp, f), (mtime, mtime))


def test_late_rows_dropped(spark, tmp_path):
    """A row older than the watermark never reaches session state — the
    reference's allowedLateness=ZERO semantics
    (Hl7v2ToFhirStreamingRunner.java:168-175). One file per micro-batch so
    the watermark demonstrably advances between arrivals."""
    import time as _t

    tmp = str(tmp_path)
    inp = os.path.join(tmp, "in")
    os.makedirs(inp)
    t0 = _t.time()
    early = [("A", i, "user", '{"bar":%d}' % i, None, f"2024-01-01 00:00:{i:02d}") for i in range(3)]
    _append_one_file(_turns_df(spark, early), inp, t0)
    _append_one_file(
        _turns_df(spark, [("conv-sentinel", 0, "user", "{}", None, "2024-01-02 00:00:00")]),
        inp, t0 + 100,
    )  # advances watermark to 2024-01-01 23:59
    _append_one_file(
        _turns_df(spark, [("A", 9, "user", '{"bar":9}', None, "2024-01-01 00:00:05")]),
        inp, t0 + 200,
    )  # LATE: far below watermark
    _append_one_file(
        _turns_df(spark, [("conv-sentinel", 1, "user", "{}", None, "2024-01-03 00:00:00")]),
        inp, t0 + 300,
    )  # final flush

    pipe = HarmonizationPipeline(
        mapping_config=CFG,
        out_dir=os.path.join(tmp, "out"),
        session_gap="2 minutes",
        watermark_delay="1 minutes",
        trigger={"availableNow": True},
        max_files_per_trigger=1,
    )
    q = pipe.run_harmonization(spark, inp, os.path.join(tmp, "ckpt_h"))
    q.awaitTermination(300)

    bundles = pipe.bundles(spark).filter(F.col("conv_id") == "A").collect()
    assert len(bundles) == 1, [r["bundle"] for r in bundles]
    idxs = [t["turn_idx"] for t in json.loads(bundles[0]["bundle"])]
    assert idxs == [0, 1, 2]  # late turn 9 dropped, never resurrects a session


def test_stream_stream_tool_join(spark, tmp_path):
    tmp = str(tmp_path)
    rows = [
        # conv A: assistant idx1 @t10, tool idx2 @t20 -> attaches to idx1
        ("A", 0, "user", "u", None, 0),
        ("A", 1, "assistant", "a1", None, 10),
        ("A", 2, "tool", "t", "tool-x", 20),
        # conv A: later assistant idx3 @t30, tool idx4 @t40 -> attaches to idx3
        ("A", 3, "assistant", "a2", None, 30),
        ("A", 4, "tool", "t", "tool-y", 40),
        # conv B: tool with no prior assistant in range -> dropped (inner join)
        ("B", 1, "tool", "t", "tool-z", 50),
        # sentinel to flush watermarks
        ("S", 0, "user", "u", None, 10**6),
    ]
    df = spark.createDataFrame(
        [(c, i, r, x, tl, f"2024-01-01 00:{s//60:02d}:{s%60:02d}" if s < 3600 else "2024-02-01 00:00:00")
         for (c, i, r, x, tl, s) in rows],
        "conv_id string, turn_idx int, role string, text string, tool string, ts_s string",
    ).select("conv_id", "turn_idx", "role", "text", "tool", F.col("ts_s").cast("timestamp").alias("ts"))
    inp = os.path.join(tmp, "in")
    df.write.mode("overwrite").parquet(inp)

    stream = (
        spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        ).parquet(inp)
    )
    candidates = attach_tool_calls_stream(stream, watermark_delay="30 seconds", lookback="1 minutes")

    out = []

    def collect_batch(bdf, bid):
        out.extend(pick_origin(bdf).collect())

    q = (
        candidates.writeStream.foreachBatch(collect_batch)
        .option("checkpointLocation", os.path.join(tmp, "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {(r["conv_id"], r["turn_idx"]): r["origin_turn_idx"] for r in out}
    assert got == {("A", 2): 1, ("A", 4): 3}


def test_time_ordered_stream_conserves_turns(spark, tmp_path):
    """Arrival order must follow event time for a bounded replay: with tied
    file mtimes the source may consume the latest ts range first, advancing
    the watermark past earlier files and mass-dropping them as late
    (observed nondeterministic 25-60% loss). write_time_ordered_stream
    staggers mtimes in ts-range order; every non-late, well-formed turn must
    then reach exactly one bundle even when the hot conversation's span
    exceeds the watermark delay."""
    from healthcare_data_harmonization_dataflow_spark.sources.transcripts import (
        write_time_ordered_stream,
    )

    tmp = str(tmp_path)
    inp = os.path.join(tmp, "in")
    n = 50_000  # hot conv spans ~14h > the 2h watermark below
    t = generate_transcripts(spark, total_turns=n, late_one_in=10**9,
                             malformed_per_mille=0)
    write_time_ordered_stream(t, inp)
    append_flush_sentinel(spark, inp)
    pipe = HarmonizationPipeline(
        mapping_config=CFG,
        out_dir=os.path.join(tmp, "out"),
        trigger={"availableNow": True},
        max_files_per_trigger=3,
        watermark_delay="2 hours",
    )
    q = pipe.run_harmonization(spark, inp, os.path.join(tmp, "ck"))
    q.awaitTermination(600)
    got = pipe.bundles(spark).filter(F.col("conv_id") != "conv-sentinel")
    assert got.selectExpr("sum(n_turns)").first()[0] == n


def test_bundle_size_cap_chunks_hot_conversation(spark, tmp_path):
    """max_turns_per_bundle splits a giant session into several bundles with
    no turn lost and per-bundle turn_idx ordering preserved."""
    from healthcare_data_harmonization_dataflow_spark.sources.transcripts import (
        write_time_ordered_stream,
    )

    tmp = str(tmp_path)
    inp = os.path.join(tmp, "in")
    t = generate_transcripts(spark, total_turns=2000, late_one_in=10**9,
                             malformed_per_mille=0)
    write_time_ordered_stream(t, inp, n_files=4)
    append_flush_sentinel(spark, inp)
    pipe = HarmonizationPipeline(
        mapping_config=CFG,
        out_dir=os.path.join(tmp, "out"),
        trigger={"availableNow": True},
        watermark_delay="36 hours",
        max_turns_per_bundle=50,
    )
    q = pipe.run_harmonization(spark, inp, os.path.join(tmp, "ck"))
    q.awaitTermination(300)
    b = pipe.bundles(spark).filter(F.col("conv_id") != "conv-sentinel")
    rows = b.collect()
    assert sum(r["n_turns"] for r in rows) == 2000
    assert max(r["n_turns"] for r in rows) <= 50
    hot = sorted((r for r in rows if r["conv_id"] == "conv-hot"),
                 key=lambda r: json.loads(r["bundle"])[0]["turn_idx"])
    assert len(hot) == 4  # 200 hot turns / 50
    seen = [t["turn_idx"] for r in hot for t in json.loads(r["bundle"])]
    assert seen == sorted(seen) == list(range(200))


def test_state_keys_are_unsalted_under_skew(spark, tmp_path):
    """north_rule skew contract: the stateful assembly keys its state by
    conv_id ONLY — no salt ever reaches a state key, so a hot conversation
    is one logical key whose bundles carry the ORIGINAL conv_id and cover
    every turn exactly once in turn order. (Bench evidence that the
    unsalted hot task does not straggle — per-key overhead dominates
    per-turn cost — is in BENCH.md's round-4 skew table.)"""
    from healthcare_data_harmonization_dataflow_spark.sources.transcripts import (
        write_time_ordered_stream,
    )

    tmp = str(tmp_path)
    inp = os.path.join(tmp, "in")
    n = 5000  # hot conv = 10% of turns (generator default)
    t = generate_transcripts(spark, total_turns=n, late_one_in=10**9,
                             malformed_per_mille=0)
    in_convs = {r["conv_id"] for r in t.select("conv_id").distinct().collect()}
    write_time_ordered_stream(t, inp, n_files=4)
    append_flush_sentinel(spark, inp)
    pipe = HarmonizationPipeline(
        mapping_config=CFG,
        out_dir=os.path.join(tmp, "out"),
        trigger={"availableNow": True},
        watermark_delay="36 hours",
        max_turns_per_bundle=100,
    )
    q = pipe.run_harmonization(spark, inp, os.path.join(tmp, "ck"))
    q.awaitTermination(300)
    rows = pipe.bundles(spark).filter(
        F.col("conv_id") != "conv-sentinel"
    ).collect()
    out_convs = {r["conv_id"] for r in rows}
    # every emitted key is a pristine input conv_id: salting the state key
    # (suffixes, fragment ids) would fail the subset check
    assert out_convs <= in_convs, out_convs - in_convs
    assert sum(r["n_turns"] for r in rows) == n
    hot_idx = sorted(
        t["turn_idx"]
        for r in rows
        if r["conv_id"] == "conv-hot"
        for t in json.loads(r["bundle"])
    )
    assert hot_idx == list(range(n // 10))  # exactly once each, in order


def test_sink_crash_between_write_and_commit(spark, tmp_path):
    """The documented crash window: batch data fully written but the commit
    marker never landed. Readers must ignore the orphan data; a replay of
    the same batchId must clobber it and commit exactly once."""
    import os as _os

    sink = ExactlyOnceParquetSink(str(tmp_path / "s"), "t")
    df = spark.range(50).select(F.col("id").cast("string").alias("conv_id"))
    sink.write_batch(df, 0)

    # simulate the crash for batch 1: data present, no commit marker
    crash_df = spark.range(50, 80).select(F.col("id").cast("string").alias("conv_id"))
    crash_path = _os.path.join(str(tmp_path / "s"), "data", "batch=1")
    crash_df.write.mode("overwrite").parquet(crash_path)

    assert sink.read_committed(spark).count() == 50  # orphan invisible
    assert sink.committed_batches() == [0]

    # replay batch 1 (streaming redelivers the same epoch after restart)
    replay_df = spark.range(50, 90).select(F.col("id").cast("string").alias("conv_id"))
    sink.write_batch(replay_df, 1)
    got = sink.read_committed(spark)
    assert got.count() == 90
    assert got.select("conv_id").distinct().count() == 90  # no dupes, no loss
    assert sink.committed_batches() == [0, 1]
    assert sink.lineage()[1]["rows"] == 40

    # second replay of a committed batch is a no-op
    sink.write_batch(replay_df, 1)
    assert sink.read_committed(spark).count() == 90


def test_sink_torn_marker_under_lying_rename(spark, tmp_path):
    """Object-store hazard: rename is emulated (copy+delete), so a crash
    mid-copy can leave a TORN commit marker while the checkpoint never
    advanced. A torn marker must count as UNCOMMITTED everywhere — no
    crash on read, no phantom batch — and the replay must self-heal it
    with no loss and no duplication."""
    import os as _os

    base = str(tmp_path / "s")
    sink = ExactlyOnceParquetSink(base, "t")
    df = spark.range(50).select(F.col("id").cast("string").alias("conv_id"))
    sink.write_batch(df, 0)

    class _LyingRenameFs(type(sink._fs())):
        """rename 'succeeds' but lands only a truncated marker — the
        non-atomic copy+delete emulation interrupted mid-copy."""

        def write_text_atomic(self, path, text):
            with open(path, "w", encoding="utf-8") as f:
                f.write(text[: len(text) // 2])  # torn

    lying = _LyingRenameFs()
    sink._fs_cache = lying
    b1 = spark.range(50, 90).select(F.col("id").cast("string").alias("conv_id"))
    sink.write_batch(b1, 1)  # data lands, marker is torn
    assert _os.path.exists(_os.path.join(base, "_commits", "1.json"))

    # fresh reader: the torn marker is invisible, not a crash
    reader = ExactlyOnceParquetSink(base, "t")
    assert reader.committed_batches() == [0]
    assert reader.is_committed(1) is False
    assert reader.read_committed(spark).count() == 50
    assert len(reader.lineage()) == 1

    # replay with an honest FS self-heals: exactly one copy of every row
    sink._fs_cache = None
    sink.write_batch(b1, 1)
    got = reader.read_committed(spark)
    assert got.count() == 90
    assert got.select("conv_id").distinct().count() == 90
    assert reader.committed_batches() == [0, 1]


def test_sink_put_commit_mode(spark, tmp_path):
    """commit_mode='put': the marker is ONE direct object write with a
    read-back verify — no rename anywhere in the commit path — and a
    failed verify raises so the batch replays instead of silently
    vanishing."""
    base = str(tmp_path / "s")
    sink = ExactlyOnceParquetSink(base, "t", commit_mode="put")
    df = spark.range(40).select(F.col("id").cast("string").alias("conv_id"))
    sink.write_batch(df, 0)
    assert sink.committed_batches() == [0]
    assert sink.read_committed(spark).count() == 40
    sink.write_batch(df.limit(1), 0)  # replay guard still holds
    assert sink.read_committed(spark).count() == 40

    class _LostPutFs(type(sink._fs())):
        def write_text_put(self, path, text):
            with open(path, "w", encoding="utf-8") as f:
                f.write(text[:10])  # upload lost mid-flight
            if self.read_text(path) != text:
                raise IOError(f"commit marker verify failed: {path}")

    sink._fs_cache = _LostPutFs()
    b1 = spark.range(40, 60).select(F.col("id").cast("string").alias("conv_id"))
    import pytest as _pytest

    with _pytest.raises(IOError, match="verify failed"):
        sink.write_batch(b1, 1)  # raises -> checkpoint would NOT advance
    sink._fs_cache = None
    assert sink.is_committed(1) is False  # torn marker = uncommitted
    sink.write_batch(b1, 1)  # replay succeeds
    got = sink.read_committed(spark)
    assert got.count() == 60
    assert got.select("conv_id").distinct().count() == 60


def test_sink_on_hadoop_filesystem_uri(spark, tmp_path):
    """The sink must work when out_dir is a Hadoop FileSystem URI, not a
    POSIX path (production: hdfs/s3a/gs). file:// drives the exact same
    FileSystem-API code path: listing, footer row counts, atomic commit
    rename, replay guard."""
    from healthcare_data_harmonization_dataflow_spark.streaming.sink import (
        ExactlyOnceParquetSink,
    )

    base = "file://" + str(tmp_path / "hsink")
    sink = ExactlyOnceParquetSink(base, "t", spark=spark)
    df = spark.range(50).selectExpr("cast(id as string) conv_id", "id n")
    sink.write_batch(df.repartition(4), 0)
    assert sink.committed_batches() == [0]
    lin = sink.lineage()[0]
    assert lin["rows"] == 50
    assert sorted(p["partition_id"] for p in lin["partitions"]) == list(
        range(len(lin["partitions"]))
    )
    # replay guard through the same FS facade
    sink.write_batch(df.limit(1), 0)
    assert sink.read_committed(spark).count() == 50
    # fresh sink object over the same URI sees the committed state
    sink2 = ExactlyOnceParquetSink(base, "t", spark=spark)
    assert sink2.committed_batches() == [0]
    assert sink2.read_committed(spark).count() == 50


def test_fanout_sink_stages_once_without_cache(spark, tmp_path):
    """FanOutSink must not cache the raw batch (W4): the batch is staged to
    parquet once, every route reads the staged copy, staging is removed
    after all routes commit, and a fully-committed replay is a no-op."""
    from healthcare_data_harmonization_dataflow_spark.streaming.sink import (
        ExactlyOnceParquetSink,
        FanOutSink,
    )
    import pyspark.sql.functions as F

    ok_sink = ExactlyOnceParquetSink(str(tmp_path / "ok"), "ok")
    err_sink = ExactlyOnceParquetSink(str(tmp_path / "err"), "err")
    fan = FanOutSink(
        [
            (ok_sink, lambda d: d.filter(F.col("n") % 2 == 0)),
            (err_sink, lambda d: d.filter(F.col("n") % 2 == 1)),
        ],
        staging_dir=str(tmp_path / "staging"),
    )
    df = spark.range(100).selectExpr("cast(id as string) conv_id", "id n")
    fn = fan.foreach_batch()
    fn(df, 0)
    assert ok_sink.read_committed(spark).count() == 50
    assert err_sink.read_committed(spark).count() == 50
    assert not os.path.exists(str(tmp_path / "staging" / "batch=0"))
    # replay: both committed -> no staging write, no change
    fn(spark.range(3).selectExpr("cast(id as string) conv_id", "id n"), 0)
    assert ok_sink.read_committed(spark).count() == 50
    assert not os.path.exists(str(tmp_path / "staging" / "batch=0"))


def test_transform_latency_distribution_in_metrics(spark, tmp_path):
    """enable_performance_metrics must surface the per-element transform
    latency Distribution (min/avg/max + p50/p95/p99) in every batch's
    observed metrics, visible in the listener's JSONL — the MappingFn
    Distribution analogue (MappingFn.java:53-54, 205-210) — without leaking
    the _lat_us column into sinks."""
    from healthcare_data_harmonization_dataflow_spark.streaming.metrics import (
        MetricsListener,
    )

    tmp = str(tmp_path)
    inp = os.path.join(tmp, "transcripts")
    _write_input(spark, inp, total_turns=200)
    jsonl = os.path.join(tmp, "metrics.jsonl")
    listener = MetricsListener(jsonl)
    spark.streams.addListener(listener)
    try:
        pipe = HarmonizationPipeline(
            mapping_config=CFG,
            out_dir=os.path.join(tmp, "out"),
            watermark_delay="36 hours",
            trigger={"availableNow": True},
            enable_performance_metrics=True,
        )
        q = pipe.run_harmonization(spark, inp, os.path.join(tmp, "ckpt"))
        q.awaitTermination(300)
    finally:
        spark.streams.removeListener(listener)

    assert "_lat_us" not in pipe.bundles(spark).columns
    with open(jsonl) as f:
        rows = [json.loads(line) for line in f]
    observed = [
        r["observed"]["mapping_metrics"]
        for r in rows
        if r["num_input_rows"] > 0 and "mapping_metrics" in r["observed"]
    ]
    assert observed, f"no observed mapping metrics in {rows}"
    for m in observed:
        assert m["rows_ok"] > 0
        for k in ("lat_min_us", "lat_avg_us", "lat_max_us",
                  "lat_p50_us", "lat_p95_us", "lat_p99_us"):
            assert m[k] is not None and m[k] >= 0, (k, m)
        assert m["lat_min_us"] <= m["lat_p50_us"] <= m["lat_p99_us"] <= m["lat_max_us"]


def test_state_blob_version_tag():
    """Session-state blobs carry a version byte: a blob from a different
    format fails with an explicit incompatibility error, not inside
    pickle.loads."""
    from healthcare_data_harmonization_dataflow_spark.streaming.assembly import (
        _pack_turns,
        _unpack_turns,
    )

    turns = [(0, "user", "hi", 1_000_000)]
    assert _unpack_turns(_pack_turns(turns)) == turns
    import pickle

    with pytest.raises(ValueError, match="incompatible"):
        _unpack_turns(pickle.dumps(turns))  # un-versioned legacy blob
    with pytest.raises(ValueError, match="incompatible"):
        _unpack_turns(b"")


def test_fanout_partial_failure_reuses_staged_batch(spark, tmp_path):
    """A route failing mid-fanout must leave the staged copy in place, and
    the retry must feed every sink from that SAME staged copy (one
    execution's results across retries) — with a nondeterministic upstream,
    re-staging would let committed and retried sinks disagree. Staging is
    deleted only after all routes commit."""
    from healthcare_data_harmonization_dataflow_spark.streaming.sink import (
        ExactlyOnceParquetSink,
        FanOutSink,
    )
    import pyspark.sql.functions as F

    a = ExactlyOnceParquetSink(str(tmp_path / "a"), "a")
    b = ExactlyOnceParquetSink(str(tmp_path / "b"), "b")
    boom = {"armed": True}

    def b_select(d):
        if boom["armed"]:
            raise RuntimeError("transient route failure")
        return d.filter(F.col("n") % 2 == 1)

    fan = FanOutSink(
        [(a, lambda d: d.filter(F.col("n") % 2 == 0)), (b, b_select)],
        staging_dir=str(tmp_path / "staging"),
    )
    # nondeterministic upstream: rand() would re-roll on re-execution
    df = (
        spark.range(100)
        .selectExpr("cast(id as string) conv_id", "id n")
        .withColumn("r", F.rand(seed=None))
    )
    fn = fan.foreach_batch()
    with pytest.raises(RuntimeError, match="transient"):
        fn(df, 0)
    # first route committed, staged copy retained for the retry
    assert a.committed_batches() == [0]
    staged = str(tmp_path / "staging" / "batch=0")
    assert os.path.exists(os.path.join(staged, "_SUCCESS"))
    a_first = sorted(r["r"] for r in a.read_committed(spark).collect())

    boom["armed"] = False
    fn(df, 0)  # retry: must NOT re-execute the upstream plan
    assert b.committed_batches() == [0]
    assert not os.path.exists(staged)  # cleaned only after full commit
    # the committed route's rows are identical across the retry, and the
    # second route's rows come from the same staged execution
    assert sorted(r["r"] for r in a.read_committed(spark).collect()) == a_first
    all_r = sorted(
        r["r"]
        for sink in (a, b)
        for r in sink.read_committed(spark).collect()
    )
    assert len(all_r) == 100 and len(set(all_r)) == 100


def test_sink_lineage_has_bytes_and_observed_rows(spark, tmp_path):
    """Round-3 lineage: the exact row count comes from an Observation riding
    the write job (no second pass), per-partition entries carry byte sizes
    from ONE directory listing; on the Hadoop-FS path no per-file footer
    reads happen at all."""
    from healthcare_data_harmonization_dataflow_spark.streaming import sink as sink_mod
    from healthcare_data_harmonization_dataflow_spark.streaming.sink import (
        ExactlyOnceParquetSink,
    )

    base = "file://" + str(tmp_path / "hsink")
    s = ExactlyOnceParquetSink(base, "t", spark=spark)
    df = spark.range(75).selectExpr("cast(id as string) conv_id", "id n")
    calls = {"n": 0}
    orig = sink_mod._HadoopFs.parquet_rows

    def counting(self, path):
        calls["n"] += 1
        return orig(self, path)

    sink_mod._HadoopFs.parquet_rows = counting
    try:
        s.write_batch(df.repartition(3), 0)
    finally:
        sink_mod._HadoopFs.parquet_rows = orig
    assert calls["n"] == 0  # zero footer round-trips on the remote path
    lin = s.lineage()[0]
    assert lin["rows"] == 75  # exact, from the Observation
    assert len(lin["partitions"]) == 3
    assert all(p["bytes"] > 0 for p in lin["partitions"])
    # local path still enriches lineage with per-file row counts
    s2 = ExactlyOnceParquetSink(str(tmp_path / "lsink"), "t2")
    s2.write_batch(df.repartition(3), 0)
    lin2 = s2.lineage()[0]
    assert lin2["rows"] == 75
    assert sum(p["rows"] for p in lin2["partitions"]) == 75


def test_tws_handler_logic_with_mocked_state():
    """Round-3 gated-path risk shrink: the transformWithState handler's
    logic (append-only buffering, late-row drop, timer re-arm, watermark
    drain, open-session retention) runs WITHOUT protobuf by driving the
    StatefulProcessor directly against mocked state primitives."""
    import pandas as pd

    from healthcare_data_harmonization_dataflow_spark.streaming.assembly_tws import (
        SessionAssembler,
    )

    class MockListState:
        def __init__(self):
            self.rows = []

        def get(self):
            return iter(self.rows)

        def appendList(self, pdf):
            self.rows.extend(tuple(t) for t in pdf.itertuples(index=False))

        def clear(self):
            self.rows = []

    class MockValueState:
        def __init__(self):
            self.v = None

        def exists(self):
            return self.v is not None

        def get(self):
            return self.v

        def update(self, v):
            self.v = v

        def clear(self):
            self.v = None

    class MockHandle:
        def __init__(self):
            self.states = {}
            self.timers = []

        def getListState(self, name, schema):
            return self.states.setdefault(name, MockListState())

        def getValueState(self, name, schema):
            return self.states.setdefault(name, MockValueState())

        def listTimers(self):
            return list(self.timers)

        def deleteTimer(self, t):
            self.timers.remove(t)

        def registerTimer(self, t):
            self.timers.append(t)

    class TV:
        def __init__(self, wm_ms):
            self.wm_ms = wm_ms

        def getCurrentWatermarkInMs(self):
            return self.wm_ms

    def batch(turn_ts):  # [(turn_idx, role, text, ts_seconds)]
        return iter(
            [
                pd.DataFrame(
                    {
                        "turn_idx": [t[0] for t in turn_ts],
                        "role": [t[1] for t in turn_ts],
                        "text": [t[2] for t in turn_ts],
                        "ts": [pd.Timestamp(t[3], unit="s") for t in turn_ts],
                    }
                )
            ]
        )

    gap = 300  # 5 minutes
    proc = SessionAssembler(gap)
    handle = MockHandle()
    proc.init(handle)
    key = ("conv-1",)

    # batch 1: two sessions' worth of turns + one LATE row (ts < watermark)
    out = list(
        proc.handleInputRows(
            key,
            batch([(0, "user", "a", 1000), (1, "assistant", "b", 1010),
                   (9, "user", "LATE", 10), (2, "user", "c", 2000)]),
            TV(wm_ms=500 * 1000),
        )
    )
    assert out == []  # nothing complete yet
    assert len(handle.states["turns"].rows) == 3  # late row dropped
    assert handle.states["max_ts"].v == (2000 * 1_000_000,)
    # single event-time timer at last-turn + gap
    assert handle.timers == [(2000 + gap) * 1000]

    # timer fires with watermark past session-1's end+gap but NOT session-2's:
    # session 1 (turns 0,1) emits, session 2 (turn 2) is retained + re-armed
    out = list(proc.handleExpiredTimer(key, TV(wm_ms=(1010 + gap + 1) * 1000), None))
    assert len(out) == 1
    row = out[0].to_dict("records")[0]
    assert row["conv_id"] == "conv-1" and row["n_turns"] == 2
    assert "a" in row["bundle"] and "c" not in row["bundle"]
    assert [t[0] for t in handle.states["turns"].rows] == [2]
    assert handle.timers[-1] == (2000 + gap) * 1000

    # watermark passes everything: session 2 emits, state fully cleared
    out = list(proc.handleExpiredTimer(key, TV(wm_ms=(2000 + gap + 1) * 1000), None))
    assert out[0].to_dict("records")[0]["n_turns"] == 1
    assert handle.states["turns"].rows == []
    assert handle.states["max_ts"].v is None


def test_window_assembly_matches_v1(spark, tmp_path):
    """The pure-JVM session_window assembly must produce byte-identical
    bundles (and identical session bounds) to the stateful reference path,
    including session-gap splits — and its streaming plan must contain NO
    Python stage."""
    tmp = str(tmp_path)
    inp = os.path.join(tmp, "transcripts")
    _write_input(spark, inp, total_turns=300)

    outs = {}
    for mode in ("state_v1", "window"):
        pipe = HarmonizationPipeline(
            mapping_config=CFG,
            out_dir=os.path.join(tmp, f"out_{mode}"),
            session_gap="2 minutes",
            watermark_delay="36 hours",
            trigger={"availableNow": True},
            max_files_per_trigger=4,
            assembly=mode,
        )
        q = pipe.run_harmonization(spark, inp, os.path.join(tmp, f"ck_{mode}"))
        q.awaitTermination(300)
        outs[mode] = {
            (
                r["conv_id"],
                r["n_turns"],
                r["bundle"],
                r["session_start"],
                r["session_end"],
            )
            for r in pipe.bundles(spark)
            .filter(F.col("conv_id") != "conv-sentinel")
            .collect()
        }
    assert outs["window"] == outs["state_v1"]
    assert len(outs["window"]) > 0

    # zero Python in the hot path: the batch shape of the same plan
    from healthcare_data_harmonization_dataflow_spark.streaming.assembly import (
        assemble_sessions_window,
    )

    batch_plan = (
        assemble_sessions_window(
            spark.createDataFrame(
                [("c", 0, "user", "t", __import__("datetime").datetime(2024, 1, 1))],
                "conv_id string, turn_idx int, role string, text string, ts timestamp",
            )
        )
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in batch_plan

    # chunking is a stateful-only feature: asking for both fails fast
    with pytest.raises(ValueError, match="chunking"):
        HarmonizationPipeline(
            mapping_config=CFG,
            out_dir=os.path.join(tmp, "out_bad"),
            assembly="window",
            max_turns_per_bundle=10,
        ).run_harmonization(spark, inp, os.path.join(tmp, "ck_bad"))


def test_dedup_turns_absorbs_at_least_once_redelivery(spark, tmp_path):
    """The reference's notification source (Pub/Sub) is at-least-once: the
    same turn can arrive twice. With dedup_turns=True the pipeline drops
    duplicate (conv_id, turn_idx) within the watermark BEFORE mapping, so
    redelivered turns double-count neither in bundles nor dead letters —
    output must equal the clean single-delivery golden run."""
    tmp = str(tmp_path)
    clean = os.path.join(tmp, "clean")
    src = _write_input(spark, clean, total_turns=200)
    golden = _run_pipeline(spark, os.path.join(tmp, "g"), clean)
    want = {
        (r["conv_id"], r["n_turns"], r["bundle"])
        for r in golden.bundles(spark).collect()
    }
    want_dl = golden.deadletter(spark).count()

    # redelivered input: every turn written twice (second copy in separate
    # files, so some duplicates even cross micro-batch boundaries)
    dup = os.path.join(tmp, "dup")
    fresh = spark.read.parquet(clean).where(
        F.col("conv_id") != "conv-sentinel"
    )
    fresh.write.mode("overwrite").parquet(dup)
    fresh.write.mode("append").parquet(dup)
    append_flush_sentinel(spark, dup)

    pipe = HarmonizationPipeline(
        mapping_config=CFG,
        out_dir=os.path.join(tmp, "out2"),
        session_gap="2 minutes",
        watermark_delay="36 hours",
        trigger={"availableNow": True},
        max_files_per_trigger=4,
        dedup_turns=True,
    )
    q1 = pipe.run_harmonization(spark, dup, os.path.join(tmp, "c1"))
    q2 = pipe.run_deadletter(spark, dup, os.path.join(tmp, "c2"))
    q1.awaitTermination(300)
    q2.awaitTermination(300)
    got = {
        (r["conv_id"], r["n_turns"], r["bundle"])
        for r in pipe.bundles(spark).collect()
    }
    assert got == want
    assert pipe.deadletter(spark).count() == want_dl


def test_dedup_turns_with_window_assembly(spark, tmp_path):
    """dedup_turns sets the watermark at the source; the pure-JVM
    session_window assembly must then skip its own (re-definition is
    rejected) and still produce redelivery-clean bundles."""
    tmp = str(tmp_path)
    inp = os.path.join(tmp, "in")
    src = _write_input(spark, inp, total_turns=120, with_sentinel=False)
    src.write.mode("append").parquet(inp)  # everything twice
    append_flush_sentinel(spark, inp)

    pipe = HarmonizationPipeline(
        mapping_config=CFG,
        out_dir=os.path.join(tmp, "out"),
        session_gap="2 minutes",
        watermark_delay="36 hours",
        trigger={"availableNow": True},
        assembly="window",
        dedup_turns=True,
    )
    q = pipe.run_harmonization(spark, inp, os.path.join(tmp, "ck"))
    q.awaitTermination(300)
    total = pipe.bundles(spark).agg(F.sum("n_turns")).collect()[0][0]
    # 120 unique turns delivered twice; only the ok-branch unique ones land
    assert total is not None and total <= 120
    dup_check = pipe.bundles(spark).groupBy("conv_id").count()
    assert dup_check.count() > 0


def test_read_committed_empty_recovers_schema(spark, tmp_path):
    """Review fix: reading a sink whose data dirs are gone (or a fresh one
    with commit history) must yield an EMPTY frame with the REAL schema
    recorded at write time — not a placeholder that breaks select()."""
    base = os.path.join(str(tmp_path), "s")
    sink = ExactlyOnceParquetSink(base, "s")
    df = spark.createDataFrame([("w1", "b1", 3)], "webpath string, bundle string, n int")
    sink.write_batch(df, 0)
    got = sink.read_committed(spark)
    assert got.columns == ["webpath", "bundle", "n"] and got.count() == 1
    # wipe the data dir but keep the commit: empty frame, same columns
    import shutil

    shutil.rmtree(os.path.join(base, "data"))
    empty = sink.read_committed(spark)
    assert empty.columns == ["webpath", "bundle", "n"]
    assert empty.count() == 0
    empty.select("webpath")  # would have been AnalysisException before


def test_fanout_cleans_orphaned_staging_on_replay(spark, tmp_path):
    """Review fix: a crash between the last route commit and the staging
    delete orphans a full batch copy; the fully-committed replay must
    clean it instead of leaking it forever."""
    from healthcare_data_harmonization_dataflow_spark.streaming.sink import FanOutSink

    tmp = str(tmp_path)
    sink = ExactlyOnceParquetSink(os.path.join(tmp, "out"), "out")
    staging = os.path.join(tmp, "staging")
    fan = FanOutSink([(sink, lambda d: d)], staging)
    df = spark.createDataFrame([("a", 1)], "k string, v int")
    fan.foreach_batch()(df, 5)
    assert not os.path.exists(os.path.join(staging, "batch=5"))
    # simulate the crash window: batch committed but staging copy left
    df.write.mode("overwrite").parquet(os.path.join(staging, "batch=5"))
    fan.foreach_batch()(df, 5)  # fully-committed replay
    assert not os.path.exists(os.path.join(staging, "batch=5"))


def test_state_guard_flushes_frozen_prefix_of_never_gapping_session():
    """max_open_turns: a conversation that never gaps would otherwise grow
    state without bound. Driving the _assemble handler directly with a
    mocked GroupState: once the open session exceeds the cap, its FROZEN
    prefix (ts < watermark) flushes early as normal bundle rows; turns at
    or after the watermark stay buffered; nothing is lost or duplicated."""
    import json as _json

    import pandas as pd

    from healthcare_data_harmonization_dataflow_spark.streaming.assembly import (
        _assemble,
        _unpack_turns,
    )

    class MockGroupState:
        def __init__(self):
            self.v = None
            self.wm_ms = 0
            self.hasTimedOut = False
            self.timeout = None

        @property
        def exists(self):
            return self.v is not None

        @property
        def get(self):
            return self.v

        def update(self, v):
            self.v = v

        def remove(self):
            self.v = None

        def getCurrentWatermarkMs(self):
            return self.wm_ms

        def setTimeoutTimestamp(self, ts):
            self.timeout = ts

    def batch(idxs, ts_seconds):
        return iter(
            [
                pd.DataFrame(
                    {
                        "turn_idx": pd.array(idxs, dtype="int64"),
                        "role": ["user"] * len(idxs),
                        "text": [f"t{i}" for i in idxs],
                        "ts": pd.to_datetime(ts_seconds, unit="s"),
                    }
                )
            ]
        )

    state = MockGroupState()
    gap = 60  # never exceeded: consecutive turns 10s apart
    emitted = []

    def drive(idxs, ts_seconds, wm_s):
        state.wm_ms = wm_s * 1000
        for pdf in _assemble(
            ("conv-hot",), batch(idxs, ts_seconds), state, gap,
            max_turns_per_bundle=None, max_open_turns=10,
        ):
            emitted.extend(pdf.to_dict("records"))

    # batch 1: 8 turns, under the cap -> all buffered, nothing emitted
    drive(list(range(8)), [i * 10 for i in range(8)], wm_s=0)
    assert emitted == [] and state.exists
    # batch 2: 8 more ON-TIME turns (ts 80..150 >= wm 80; 16 total > cap
    # 10); the watermark at t=80 freezes the first 8 turns (ts 0..70);
    # flush = min(frozen=8, 16 - 10//2 = 11) = 8
    drive(list(range(8, 16)), [i * 10 for i in range(8, 16)], wm_s=80)
    assert len(emitted) == 1
    frag = emitted[0]
    assert frag["conv_id"] == "conv-hot" and frag["n_turns"] == 8
    assert [t["turn_idx"] for t in _json.loads(frag["bundle"])] == list(range(8))
    buffered = _unpack_turns(state.v[0])
    assert len(buffered) == 8  # 16 - 8 flushed
    assert min(t[0] for t in buffered) == 8  # only the tail remains
    # batch 3: timeout drains the remainder; total coverage exact
    state.hasTimedOut = True
    for pdf in _assemble(("conv-hot",), iter([]), state, gap,
                         max_turns_per_bundle=None, max_open_turns=10):
        emitted.extend(pdf.to_dict("records"))
    all_idx = sorted(
        t["turn_idx"] for r in emitted for t in _json.loads(r["bundle"])
    )
    assert all_idx == list(range(16))  # every turn exactly once
    assert not state.exists


def test_sink_scalar_json_marker_counts_as_uncommitted(spark, tmp_path):
    """A corrupt marker whose bytes still parse as VALID scalar JSON
    ('5', 'null', '"x"') must count as uncommitted like a torn one —
    the old code only caught ValueError, so .get on a non-dict raised
    AttributeError and crashed every reader."""
    import os as _os

    base = str(tmp_path / "s")
    sink = ExactlyOnceParquetSink(base, "t")
    df = spark.range(10).select(F.col("id").cast("string").alias("conv_id"))
    sink.write_batch(df, 0)
    for batch_id, junk in ((1, "5"), (2, "null"), (3, '"x"'), (4, "[1,2]")):
        with open(
            _os.path.join(base, "_commits", f"{batch_id}.json"),
            "w",
            encoding="utf-8",
        ) as f:
            f.write(junk)
        assert sink.is_committed(batch_id) is False
    reader = ExactlyOnceParquetSink(base, "t")
    assert reader.committed_batches() == [0]
    assert reader.lineage()[0]["batch_id"] == 0
    assert reader.read_committed(spark).count() == 10


def test_assembly_auto_never_silently_picks_window(tmp_path):
    """'auto' must resolve to state_v1 in EVERY trigger regime: the
    pure-JVM window variant inherits Spark's lagged two-watermark
    late-row filtering (late events checked against the PREVIOUS batch's
    watermark), so a row arriving within one batch of the watermark
    passing it is admitted — diverging from the reference's
    allowedLateness=ZERO, which test_late_rows_dropped pins. Silent
    selection would change output rows for the same input + watermark.
    An explicit choice always wins (the backfill opt-in)."""
    from healthcare_data_harmonization_dataflow_spark.streaming.pipeline import (
        HarmonizationPipeline,
    )

    def pipe(**kw):
        return HarmonizationPipeline(
            mapping_config=CFG, out_dir=str(tmp_path / "o"), **kw
        )

    assert pipe(trigger={"availableNow": True})._resolve_assembly() == "state_v1"
    assert pipe(trigger={"once": True})._resolve_assembly() == "state_v1"
    assert (
        pipe(trigger={"processingTime": "5 seconds"})._resolve_assembly()
        == "state_v1"
    )
    assert (
        pipe(trigger={"availableNow": True}, assembly="window")
        ._resolve_assembly()
        == "window"
    )


def test_window_assembly_admits_boundary_late_row_documented(spark, tmp_path):
    """Pin the DOCUMENTED divergence that keeps 'window' an explicit
    opt-in: under the built-in session_window agg, a row behind the
    current watermark but ahead of the PREVIOUS batch's watermark is
    admitted and merged (Spark's two-watermark rule for built-in
    stateful operators), where state_v1 drops it (allowedLateness=ZERO).
    If a Spark upgrade ever makes the built-in agg strict, this test
    fails and the auto selector can be revisited."""
    import time as _t

    tmp = str(tmp_path)
    inp = os.path.join(tmp, "in")
    os.makedirs(inp)
    t0 = _t.time()
    early = [
        ("A", i, "user", '{"bar":%d}' % i, None, f"2024-01-01 00:00:{i:02d}")
        for i in range(3)
    ]
    _append_one_file(_turns_df(spark, early), inp, t0)
    _append_one_file(
        _turns_df(
            spark, [("conv-sentinel", 0, "user", "{}", None, "2024-01-02 00:00:00")]
        ),
        inp,
        t0 + 100,
    )
    _append_one_file(
        _turns_df(spark, [("A", 9, "user", '{"bar":9}', None, "2024-01-01 00:00:05")]),
        inp,
        t0 + 200,
    )
    _append_one_file(
        _turns_df(
            spark, [("conv-sentinel", 1, "user", "{}", None, "2024-01-03 00:00:00")]
        ),
        inp,
        t0 + 300,
    )
    pipe = HarmonizationPipeline(
        mapping_config=CFG,
        out_dir=os.path.join(tmp, "out"),
        session_gap="2 minutes",
        watermark_delay="1 minutes",
        trigger={"availableNow": True},
        max_files_per_trigger=1,
        assembly="window",
    )
    q = pipe.run_harmonization(spark, inp, os.path.join(tmp, "ckpt_h"))
    q.awaitTermination(300)
    bundles = pipe.bundles(spark).filter(F.col("conv_id") == "A").collect()
    assert len(bundles) == 1
    idxs = [t["turn_idx"] for t in json.loads(bundles[0]["bundle"])]
    assert idxs == [0, 1, 2, 9]  # the boundary-late row IS admitted here


def test_sink_transient_read_failure_raises_for_readers(spark, tmp_path):
    """A transient FS read failure on a marker that EXISTS must not make
    the committed batch silently vanish from reader-facing output
    (read_committed / lineage / committed_batches) — it retries once,
    then raises. The write path (is_committed) stays lenient: treating
    the marker as uncommitted there only triggers a safe idempotent
    replay. A persistent failure on a VANISHED file is still uncommitted
    everywhere."""
    import pytest as _pytest

    base = str(tmp_path / "s")
    sink = ExactlyOnceParquetSink(base, "t")
    df = spark.range(10).select(F.col("id").cast("string").alias("conv_id"))
    sink.write_batch(df, 0)
    sink.write_batch(
        spark.range(10, 25).select(F.col("id").cast("string").alias("conv_id")), 1
    )

    class _FlakyReadFs(type(sink._fs())):
        """Every read of marker 1 fails (persistent fault, file exists)."""

        def read_text(self, path, *a, **k):
            if path.endswith("1.json"):
                raise IOError("simulated transient storage failure")
            return super().read_text(path, *a, **k)

    flaky = _FlakyReadFs()
    sink._fs_cache = flaky
    # write path: lenient — uncommitted means a safe replay, not a crash
    assert sink.is_committed(1) is False
    # reader paths: the committed batch must NOT silently disappear
    with _pytest.raises(IOError, match="unreadable"):
        sink.committed_batches()
    with _pytest.raises(IOError, match="unreadable"):
        sink.lineage()
    with _pytest.raises(IOError, match="unreadable"):
        sink.read_committed(spark)

    sink._fs_cache = None  # back to the honest _LocalFs base

    class _OneShotFlakyFs(type(sink._fs())):
        """First read of marker 1 fails, the retry succeeds."""

        def __init__(self):
            self.failed = False

        def read_text(self, path, *a, **k):
            if path.endswith("1.json") and not self.failed:
                self.failed = True
                raise IOError("one-shot blip")
            return super().read_text(path, *a, **k)

    sink._fs_cache = _OneShotFlakyFs()
    assert sink.committed_batches() == [0, 1]  # retry healed the blip
    sink._fs_cache = None
    assert sink.read_committed(spark).count() == 25
