"""Per-conversation bundle assembly — the CreateFhirResourceBundle analogue.

The reference wraps each mapped resource in a FHIR transaction bundle
(DicomToFhirStreamingRunner.java:166-191). The transcript-native equivalent
assembles all turns of a conversation, **reordered by turn_idx regardless of
arrival order**, into one harmonized bundle JSON.

Two implementations with identical output:

* :func:`assemble_bundles` — pure Catalyst: groupBy + sort_array(collect_list)
  + to_json. One shuffle; codegen everywhere; the ordering is explicit
  (sort_array on the struct's leading turn_idx field), never shuffle order
  (SURVEY §7.4 risk 2).
* :func:`assemble_bundles_grouped` — applyInPandas (Arrow batches), the batch
  twin of the streaming stateful assembly (streaming/assembly.py), kept for
  parity testing between batch and stream paths.

At 10^12 turns the shuffle is keyed by conv_id — hot conversations are
handled by AQE skew splitting for the batch path and by salted pre-grouping
for the streaming path.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BUNDLE_TYPE = "transaction"


def turns_struct():
    """Leading turn_idx makes sort_array order by it (then role/text as
    deterministic tie-breaks)."""
    return F.struct(
        F.col("turn_idx").alias("turn_idx"),
        F.col("role").alias("role"),
        F.col("text").alias("text"),
    )


def assemble_bundles(
    transcripts: DataFrame,
    conv_col: str = "conv_id",
    salt_buckets: int | None = 16,
    max_turns_per_bundle: int | None = None,
) -> DataFrame:
    """conv_id -> ordered bundle of turns as canonical JSON.

    ``salt_buckets`` enables the two-phase skew-safe plan (on by default):
    phase 1 collects per-(conv, salt) partial arrays — a hot conversation's
    row traffic and list-building spread over ``salt_buckets`` tasks — and
    phase 2 merges the few pre-built arrays per conversation (flatten +
    sort + to_json). Output is identical to the single-phase plan; measured
    ~4x faster end-to-end on a 2M-turn input whose hottest conversation
    holds 10% of all turns (the single collect_list task was the whole
    pipeline's critical path). Salt never leaks into the output key.

    ``max_turns_per_bundle`` additionally chunks giant conversations into
    consecutive-turn bundles (``bundle_seq = turn_idx div max``): without it
    a 10%-hot conversation at 10M turns ends as ONE task rendering a ~60 MB
    JSON row — an Amdahl tail no salting can remove, and a row no sink
    wants. Chunking is the production behavior (FHIR bundles cap entries
    the same way); the serial tail becomes ~max_turns wide.
    """
    group_keys = [F.col(conv_col)]
    out_keys: list = [F.col(conv_col)]
    if max_turns_per_bundle:
        chunk = (F.col("turn_idx") / max_turns_per_bundle).cast("long").alias("bundle_seq")
        group_keys.append(chunk)
        out_keys = [F.col(conv_col), F.col("bundle_seq")]
    if not salt_buckets:
        return (
            transcripts.groupBy(*group_keys)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_turns"),
                F.sort_array(F.collect_list(turns_struct())).alias("_turns"),
            )
            .select(*out_keys, "n_turns", F.to_json(F.col("_turns")).alias("bundle"))
        )
    salt = F.pmod(F.xxhash64(F.col("turn_idx")), F.lit(salt_buckets)).alias("_salt")
    partial = transcripts.groupBy(*group_keys, salt).agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.collect_list(turns_struct()).alias("_part"),
    )
    merge_keys = [conv_col] + (["bundle_seq"] if max_turns_per_bundle else [])
    return (
        partial.groupBy(*merge_keys)
        .agg(
            F.sum("_n").alias("n_turns"),
            F.sort_array(F.flatten(F.collect_list("_part"))).alias("_turns"),
        )
        .select(*out_keys, "n_turns", F.to_json(F.col("_turns")).alias("bundle"))
    )


def assemble_bundles_grouped(transcripts: DataFrame, conv_col: str = "conv_id") -> DataFrame:
    """Same result via applyInPandas — exercises the Arrow grouped-map path
    used by the streaming stateful assembly. Sorting is done inside the
    group (deterministic), mirroring the state-handler logic."""
    import json

    schema = f"{conv_col} string, n_turns long, bundle string"

    def assemble(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["turn_idx", "role", "text"], kind="mergesort")
        turns = [
            {"turn_idx": int(r.turn_idx), "role": r.role, "text": r.text}
            for r in pdf.itertuples()
        ]
        return pd.DataFrame(
            {
                conv_col: [key[0]],
                "n_turns": [len(turns)],
                "bundle": [json.dumps(turns, ensure_ascii=False, separators=(",", ":"))],
            }
        )

    return transcripts.select(conv_col, "turn_idx", "role", "text").groupBy(conv_col).applyInPandas(
        assemble, schema
    )


def to_transaction_bundle(df: DataFrame, resource_col: str, url: str = "Bundle") -> DataFrame:
    """Wrap a mapped resource JSON in a FHIR-style transaction envelope —
    byte-parity with CreateFhirResourceBundle (DicomToFhirStreamingRunner.java:166-191):
    {"resourceType":"Bundle","type":"transaction","entry":[{"resource":<r>,
    "request":{"method":"POST","url":"<url>"}}]}.

    The resource JSON is validated (the FhirIOWithMetrics pre-POST check,
    FhirIOWithMetrics.java:310) then spliced verbatim — VARIANT round-trips
    would sort its keys and break parity with the insertion-ordered golden.
    Malformed resources yield NULL bundles for the caller's dead-letter
    branch.
    """
    res = F.col(resource_col)
    return df.withColumn(
        "bundle",
        F.when(
            F.try_parse_json(res).isNotNull(),
            F.concat(
                F.lit('{"resourceType":"Bundle","type":"' + BUNDLE_TYPE + '","entry":[{"resource":'),
                res,
                F.lit(',"request":{"method":"POST","url":"' + url + '"}}]}'),
            ),
        ),
    )
