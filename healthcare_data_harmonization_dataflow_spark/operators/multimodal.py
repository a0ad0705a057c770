"""Multimodal column plumbing: image/audio/video as opaque binary + metadata.

The Spark-side machinery is real and tested — schema, partition-friendly
batching, Arrow-batched UDF signatures via ``mapInPandas`` — while the
actual media decode is STUBBED (this container has no image/audio libs):
``decode_fn=None`` uses a deterministic fake "decoder" (content hash +
synthetic dimensions) so plumbing tests are reproducible; production swaps
in a real decoder behind the same signature.

Scale notes: media bytes stay in executor memory only for the lifetime of
one Arrow batch (``maxRecordsPerBatch`` bounds it); feature outputs are
fixed-width, so the shuffle after extraction never carries raw media.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("content", BinaryType()),  # opaque payload
        StructField("width", IntegerType()),  # typed metadata (nullable)
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", StringType()),
        StructField("kind", StringType()),
        StructField("content_sha", StringType()),
        StructField("n_bytes", LongType()),
        StructField("feat_width", IntegerType()),
        StructField("feat_height", IntegerType()),
        StructField("frames_sampled", IntegerType()),
    ]
)


def _fake_decode(content: bytes, kind: str) -> dict:
    """Deterministic decode stub: real decoders (PIL/ffmpeg/torchaudio) are
    not available in this environment — same signature, fake values."""
    h = hashlib.sha256(content or b"").hexdigest()
    seed = int(h[:8], 16)
    return {
        "content_sha": h,
        "n_bytes": len(content or b""),
        "feat_width": 16 + seed % 64,
        "feat_height": 16 + (seed >> 8) % 64,
        "frames_sampled": 1 if kind == "image" else 1 + seed % 8,
    }


def extract_features(
    media: DataFrame, decode_fn: Callable[[bytes, str], dict] | None = None
) -> DataFrame:
    """Decode/feature-extract media via mapInPandas (Arrow batches).

    ``decode_fn(content, kind) -> dict`` is the production hook; raise
    NotImplementedError there for unsupported kinds and the row routes to
    the dead-letter convention upstream.
    """
    decode = decode_fn or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(c, k) for c, k in zip(pdf["content"], pdf["kind"])]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            out.insert(1, "kind", pdf["kind"].values)
            yield out

    # media bytes never survive past this projection: select early, keep the
    # Arrow batches bounded, output fixed-width features only
    return media.select("media_id", "kind", "content").mapInPandas(run, FEATURE_SCHEMA)


def synthetic_media(spark, n: int = 100) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    kinds = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    return spark.range(n).select(
        F.concat(F.lit("m"), F.col("id")).alias("media_id"),
        kinds.alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        F.encode(F.concat(F.lit("payload-"), F.col("id")), "utf-8").alias("content"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
