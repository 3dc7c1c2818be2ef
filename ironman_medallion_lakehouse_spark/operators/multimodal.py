"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Beyond-reference extension (BASELINE.json north star). Pattern: media
(image/audio/video) lives as an opaque ``binary`` column next to typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` stages so the payload never round-trips
through Python row-by-row.

The decode step itself is **stubbed** — image/audio codecs are not in
this container — behind ``decoder=`` hooks: the default
``deterministic_fake_decoder`` produces stable pseudo-features (so the
plumbing is fully testable end-to-end); passing a real decoder (e.g.
PIL/ffmpeg-based) is a drop-in change. Everything Spark-side — schema,
partitioning, batch iteration, UDF signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def deterministic_fake_decoder(payload: bytes) -> dict:
    """Stand-in for a real image decode: derives stable pseudo
    dimensions and an 8-dim feature from the payload bytes. Replace
    with a real codec when available (would raise NotImplementedError
    for formats it can't parse)."""
    digest = hashlib.md5(payload or b"").digest()
    return {
        "width": 64 + digest[0] % 192,
        "height": 64 + digest[1] % 192,
        "feature": [b / 255.0 for b in digest[:8]],
    }


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Build a media table from the documents fixture: the encoded text
    plays the role of an opaque payload (the container has no real
    media), with typed metadata columns alongside — the exact schema a
    real ingest would produce."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        payload.alias("payload"),
        F.lit("image/fake").alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


def extract_features(
    media: DataFrame,
    decoder: Callable[[bytes], dict] = deterministic_fake_decoder,
) -> DataFrame:
    """Decode + feature-extract via Arrow-batched mapInPandas.

    Batches arrive as pandas DataFrames (payloads as bytes); the
    decoder runs per payload inside the batch loop — the Spark↔Python
    boundary is crossed once per ~10k rows, not once per row. At scale,
    repartition upstream so batches are payload-size balanced."""
    from ironman_medallion_lakehouse_spark.session import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decoder(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": pdf["n_bytes"].values,
                    "width": [f["width"] for f in feats],
                    "height": [f["height"] for f in feats],
                    "feature": [f["feature"] for f in feats],
                }
            )

    return media.mapInPandas(_batches, FEATURE_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("payload", BinaryType()),
        StructField("media_type", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]
)


def deterministic_fake_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Stand-in for decode→resize→re-encode: emits a deterministic
    payload whose size scales with the target area (a real resizer
    returns the re-encoded image bytes; this preserves the contract
    that output payload size is a function of target dims + content)."""
    digest = hashlib.md5(payload or b"")
    digest.update(f"{width}x{height}".encode())
    seed = digest.digest()
    out_len = max(16, (width * height) // 64)
    return (seed * (out_len // len(seed) + 1))[:out_len]


def resize_media(
    media: DataFrame,
    width: int = 224,
    height: int = 224,
    resizer: Callable[[bytes, int, int], bytes] = deterministic_fake_resizer,
) -> DataFrame:
    """Batch resize via Arrow-batched mapInPandas — the write-side twin
    of ``extract_features`` (same batching contract: payloads cross the
    Spark↔Python boundary once per batch, never per row). Output rows
    keep MEDIA_SCHEMA plus the target dimensions, so a resized corpus
    can be written back through the TableStore and re-enter any
    downstream stage. Swap ``resizer`` for a real codec-backed
    implementation (PIL/ffmpeg) when available — it would raise
    NotImplementedError on formats it can't parse."""
    from ironman_medallion_lakehouse_spark.session import ensure_package_on_executors

    ensure_package_on_executors(media.sparkSession)

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            resized = [resizer(p, width, height) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "payload": resized,
                    "media_type": pdf["media_type"].values,
                    "n_bytes": [len(p) for p in resized],
                    "width": [width] * len(resized),
                    "height": [height] * len(resized),
                }
            )

    return media.mapInPandas(_batches, RESIZED_SCHEMA)


def frame_sample(
    media: DataFrame, every_n_bytes: int = 1024, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing for video-like payloads: emit one row per
    sampled offset (posexplode over a computed offset sequence — pure
    expressions, no UDF). A real implementation would slice the payload
    at codec keyframes; offsets model that contract."""
    offsets = F.slice(
        F.sequence(F.lit(0), F.greatest(F.col("n_bytes") - 1, F.lit(0)), F.lit(every_n_bytes)),
        1,
        max_frames,
    )
    return media.select(
        "media_id",
        F.posexplode(offsets).alias("frame_idx", "byte_offset"),
    )
