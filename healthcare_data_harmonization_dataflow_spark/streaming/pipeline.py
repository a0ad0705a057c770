"""The end-to-end streaming harmonization pipeline.

The Spark re-expression of ``Hl7v2ToFhirStreamingRunner.main`` (SURVEY §3
EP1), transcript-native:

    readStream(transcripts)                       # PubsubIO + HL7v2IO.getAll
      -> per-record mapping (VARIANT codegen)     # ParDo(MappingFn)
      -> ok / err fan-out in one pass             # withOutputTags
      -> stateful session assembly (ok branch)    # north-star addition
      -> exactly-once sinks: bundles, dead-letter # FhirIO.executeBundles +
         (+ metrics)                              #   windowed TextIO errors

One source, one stateful query; the fan-out happens inside a single
``foreachBatch`` so bundles and dead-letter commit under the same batchId
(multi-sink atomicity, SURVEY §7.4 risk 3). The dead-letter flush cadence is
the trigger interval — default 5 s, the reference's error window size
(Hl7v2ToFhirStreamingRunner.java:146).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..model.errors import err_rows, ok_rows
from ..operators.mapping_op import apply_mapping
from .assembly import BUNDLE_SCHEMA, assemble_sessions_stateful
from .metrics import observe_mapping
from .sink import ExactlyOnceParquetSink


@dataclass
class HarmonizationPipeline:
    """Config + wiring for the streaming pipeline. ``run_*`` methods return
    StreamingQuery handles; callers own trigger/termination policy."""

    mapping_config: str
    out_dir: str
    session_gap: str = "5 minutes"
    watermark_delay: str = "10 minutes"
    trigger: dict = field(default_factory=lambda: {"processingTime": "5 seconds"})
    error_shards: int = 10  # --errorLogShardNum default, Hl7v2ToFhirStreamingRunner.java:133-137
    max_files_per_trigger: int | None = None  # None = let availableNow take everything
    # "auto" (resolves to state_v1 — see _resolve_assembly for why the
    # faster window variant must stay an explicit opt-in) | "window"
    # (built-in session_window agg, pure JVM — 16-27× faster on large
    # backfill batches but inherits Spark's LAGGED late-row filtering,
    # diverging from allowedLateness=ZERO near the watermark boundary) |
    # "state_v1" (applyInPandasWithState — exact reference late-row
    # semantics, measured scaling 0.949) | "tws" (transformWithState,
    # protobuf-gated)
    assembly: str = "auto"
    max_turns_per_bundle: int | None = None  # bundle-size cap (hot-conv chunking)
    # the reference's --enablePerformanceMetrics: per-element transform
    # latency Distribution (forces the Arrow/pandas mapping backend)
    enable_performance_metrics: bool = False
    # at-least-once source hardening: the reference's notification source
    # (Pub/Sub) redelivers, so the same turn can arrive twice; when True,
    # duplicate (conv_id, turn_idx) rows are dropped within the watermark
    # (dropDuplicatesWithinWatermark: state bounded by the delay) before
    # mapping, so redelivery cannot double-count in bundles OR dead letters
    dedup_turns: bool = False
    # commit-marker strategy for BOTH sinks: "rename" (atomic on HDFS,
    # emulated on object stores) | "put" (one direct object write +
    # read-back verify — the S3/GCS-safe mode, no rename anywhere in the
    # commit path). See ExactlyOnceParquetSink.
    commit_mode: str = "rename"

    def __post_init__(self):
        self.bundles_sink = ExactlyOnceParquetSink(
            os.path.join(self.out_dir, "bundles"),
            "bundles",
            commit_mode=self.commit_mode,
        )
        self.deadletter_sink = ExactlyOnceParquetSink(
            os.path.join(self.out_dir, "deadletter"),
            "deadletter",
            num_shards=self.error_shards,
            commit_mode=self.commit_mode,
        )

    # ------------------------------------------------------------ source
    def read_stream(self, spark: SparkSession, input_path: str) -> DataFrame:
        """Streaming source over a transcript table directory (parquet file
        source locally; spark.readStream.format('iceberg') on a cluster —
        same downstream plan either way)."""
        reader = spark.readStream.schema(
            "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp"
        )
        if self.max_files_per_trigger:
            # split pacing, the ListHL7v2Messages restriction-splitting analogue
            reader = reader.option("maxFilesPerTrigger", self.max_files_per_trigger)
        return reader.parquet(input_path)

    def _resolve_assembly(self) -> str:
        """Make the measured window-vs-state trade operational (VERDICT r4
        #3) — and make the SEMANTIC boundary explicit. ``auto`` resolves
        to ``state_v1`` in every regime:

        The pure-JVM ``window`` variant is 16-27× faster in absolute
        terms on large backfill batches (BENCH.md), but it inherits
        Spark's two-watermark rule for built-in stateful operators
        (SPARK-24634, Spark ≥3.4): late input is filtered against the
        PREVIOUS micro-batch's watermark, while eviction uses the current
        one. A row arriving within one batch of the watermark passing it
        is therefore ADMITTED and merged — diverging from the reference's
        allowedLateness=ZERO (Hl7v2ToFhirStreamingRunner.java:168-175),
        which the stateful handler enforces exactly (assembly.py
        ``_assemble`` drops rows behind the watermark itself;
        tests/test_streaming.py::test_late_rows_dropped is the pinned
        counterexample — it FAILS under window assembly). Auto-selecting
        ``window`` would silently change output rows for the same input
        stream + watermark, which the north rule forbids, so it stays an
        explicit opt-in for backfills whose input is known on-time; its
        big-batch scaling evidence lives in BENCH.md.
        """
        if self.assembly != "auto":
            return self.assembly
        return "state_v1"

    def _assembly_delay(self) -> "str | None":
        # dedup_turns already watermarked the source; a second withWatermark
        # on the same stream is "redefining" and Spark rejects it
        return None if self.dedup_turns else self.watermark_delay

    def source(self, spark: SparkSession, input_path: str) -> DataFrame:
        """read_stream + optional at-least-once dedup (both queries share
        this so redelivered turns cannot double-count anywhere)."""
        s = self.read_stream(spark, input_path)
        if self.dedup_turns:
            s = s.withWatermark(
                "ts", self.watermark_delay
            ).dropDuplicatesWithinWatermark(["conv_id", "turn_idx"])
        return s

    # ------------------------------------------------------- mapped stream
    def mapped(self, transcripts: DataFrame) -> DataFrame:
        m = apply_mapping(
            transcripts,
            self.mapping_config,
            id_col="conv_id",
            data_col="text",
            measure_latency=self.enable_performance_metrics,
        )
        return observe_mapping(m)

    # ---------------------------------------------------------- queries
    def run_harmonization(self, spark: SparkSession, input_path: str, checkpoint: str):
        """Main query: map -> assemble sessions -> exactly-once bundle sink.
        The mapping runs before the stateful op, so only valid turns enter
        state; the session bundle carries mapped output as its text."""
        stream = self.source(spark, input_path)
        m = self.mapped(stream)
        ok = ok_rows(m).select(
            "conv_id", "turn_idx", "role", F.col("ok").alias("text"), "ts"
        )
        assembly = self._resolve_assembly()
        if assembly == "window":
            from .assembly import assemble_sessions_window

            if self.max_turns_per_bundle:
                raise ValueError(
                    "assembly='window' has no bundle chunking; use "
                    "assembly='state_v1' with max_turns_per_bundle"
                )
            bundles = assemble_sessions_window(
                ok, gap=self.session_gap, watermark_delay=self._assembly_delay()
            )
        elif assembly == "tws":
            from .assembly_tws import assemble_sessions_tws, tws_available

            if not tws_available():
                raise RuntimeError(
                    "assembly='tws' needs google.protobuf (transformWithState "
                    "state protocol); use assembly='state_v1' here"
                )
            bundles = assemble_sessions_tws(
                ok, gap=self.session_gap, watermark_delay=self._assembly_delay()
            )
        else:
            bundles = assemble_sessions_stateful(
                ok,
                gap=self.session_gap,
                watermark_delay=self._assembly_delay(),
                max_turns_per_bundle=self.max_turns_per_bundle,
            )
        return (
            bundles.writeStream.foreachBatch(self.bundles_sink.foreach_batch())
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(**self.trigger)
            .queryName("harmonization")
            .start()
        )

    def run_deadletter(self, spark: SparkSession, input_path: str, checkpoint: str):
        """Dead-letter query: same source, err branch only, flushed every
        trigger into the dead-letter table (5 s window analogue)."""
        stream = self.source(spark, input_path)
        m = self.mapped(stream)
        errs = err_rows(m).select("conv_id", "turn_idx", "ts", F.col("err.*"))
        return (
            errs.writeStream.foreachBatch(self.deadletter_sink.foreach_batch())
            .option("checkpointLocation", checkpoint)
            .outputMode("append")
            .trigger(**self.trigger)
            .queryName("deadletter")
            .start()
        )

    # ---------------------------------------------------------- readers
    def bundles(self, spark: SparkSession) -> DataFrame:
        return self.bundles_sink.read_committed(spark)

    def deadletter(self, spark: SparkSession) -> DataFrame:
        return self.deadletter_sink.read_committed(spark)


def hl7v2_transform(
    notifications: DataFrame,
    store: DataFrame,
    mapping_config: str,
    write_reject=None,
) -> DataFrame:
    """The EP1 ``Hl7v2ToFhirStreamingRunner`` stage chain as one pure plan
    (Hl7v2ToFhirStreamingRunner.java:139-171), branch-per-column like
    :func:`..streaming.dicom_pipeline.dicom_transform`:

    1. Pub/Sub notification payload -> HL7v2 message name;
    2. ``HL7v2IO.getAll`` fetch — a broadcast join against the message
       store's queryable form; a missing message is the Read.Result
       DEAD_LETTER branch (HealthcareIOError, 404);
    3. ``ParDo(MappingFn)`` on the fetched content — recoverable mapping
       failures to the mapping dead-letter (withOutputTags);
    4. ``CreateFhirResourceBundle`` -> ``FhirIO.executeBundles`` — the
       ``write_reject`` predicate column stands in for the FHIR store's
       post-retry rejection (Write.Result FAILED_BODY); rejected bundles
       carry statusCode 500.

    ``store`` schema: (msg_name string, data string). Returns one row per
    notification with disjoint branch columns bundle / read_err / map_err /
    write_err — all four sink under ONE batchId via FanOutSink in
    streaming use."""
    from ..functions.reformat import extract_webpath_from_pubsub
    from ..operators.bundles import to_transaction_bundle

    paths = notifications.withColumn(
        "msg_name", extract_webpath_from_pubsub(F.col("payload"))
    )
    fetched = paths.join(F.broadcast(store), "msg_name", "left")
    mapped = apply_mapping(fetched, mapping_config, id_col="msg_name", data_col="data")
    bundled = to_transaction_bundle(mapped, "ok", url="Observation")
    rejected = write_reject if write_reject is not None else F.lit(False)
    err_struct = lambda element, msg, code: F.named_struct(  # noqa: E731
        F.lit("dataElement"), element,
        F.lit("observed_time"), F.current_timestamp(),
        F.lit("message"), F.lit(msg),
        F.lit("stacktrace"), F.lit(None).cast("string"),
        F.lit("statusCode"), F.lit(code),
    )
    return bundled.select(
        "msg_name",
        # read branch: HL7v2IO.getAll failed (message not in the store)
        F.when(
            F.col("data").isNull(),
            err_struct(F.col("msg_name"), "hl7v2 message not found", 404),
        ).alias("read_err"),
        # mapping branch (ErrorEntry; only for fetched messages)
        F.when(F.col("data").isNotNull(), F.col("err")).alias("map_err"),
        # write branch: executeBundles rejected the bundle after retries
        F.when(
            F.col("bundle").isNotNull() & rejected,
            err_struct(F.col("bundle"), "bundle rejected by FHIR store", 500),
        ).alias("write_err"),
        F.when(F.col("bundle").isNotNull() & ~rejected, F.col("bundle")).alias(
            "bundle"
        ),
    )
