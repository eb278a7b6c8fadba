"""Multimodal (binary media) column plumbing.

Media travel as opaque ``binary`` columns with typed metadata structs; the
decode / feature-extract steps run as Arrow-batched ``mapInPandas`` so a
real decoder (PIL / torchaudio / ffmpeg) slots in per batch without changing
the Spark plan. The image/audio libs are absent in this container, so the
decoder is a clearly-marked deterministic fake — the Spark-side contract
(schema, batch shape, partitioning) is real and tested.

Scale: mapInPandas streams Arrow batches (no per-row Python); binary columns
are never shuffled after decode — extract metadata/features FIRST, then drop
or offload the payload before any wide operation.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    BinaryType, IntegerType, LongType, StringType, StructField, StructType,
)

MEDIA_META_SCHEMA = StructType([
    StructField("doc_id", LongType(), False),
    StructField("media_type", StringType(), True),
    StructField("n_bytes", LongType(), True),
    StructField("width", IntegerType(), True),
    StructField("height", IntegerType(), True),
])


def attach_binary_payload(docs: DataFrame, id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Test/bootstrap helper: materialize an opaque binary column (UTF-8 bytes
    of the text stand in for image/audio payloads)."""
    return docs.select(
        F.col(id_col),
        F.encode(F.col(text_col), "UTF-8").cast(BinaryType()).alias("payload"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """STUB decoder — deterministic fake in place of PIL/ffmpeg (absent in
    this container). Production replaces this one function; everything
    around it (batching, schema, partitioning) is unchanged."""
    n = len(payload)
    return ("image/fake", n % 640, n % 480)


def real_decode(payload: bytes):
    """Where a real decoder would plug in."""
    raise NotImplementedError(
        "media decoding requires PIL/torchaudio/ffmpeg — not available here; "
        "see _fake_decode for the deterministic stand-in used by tests"
    )


def extract_media_meta(media: DataFrame, id_col: str = "doc_id",
                       payload_col: str = "payload") -> DataFrame:
    """(id, media_type, n_bytes, width, height) via Arrow-batched decode."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = pdf[payload_col]
            decoded = [_fake_decode(p) for p in payloads]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": [d[0] for d in decoded],
                "n_bytes": payloads.map(len).astype("int64"),
                "width": pd.Series([d[1] for d in decoded], dtype="int32"),
                "height": pd.Series([d[2] for d in decoded], dtype="int32"),
            })

    return media.mapInPandas(batches, MEDIA_META_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10,
                      id_col: str = "doc_id") -> DataFrame:
    """Deterministic frame-sampling plan for video payloads: one row per
    sampled frame index (the decode of those frames would run in the same
    mapInPandas pattern as extract_media_meta). Pure JVM explode."""
    n_frames = (F.octet_length(F.col("payload")) % 300 + 1).alias("n_frames")
    withn = media.select(F.col(id_col), n_frames)
    return withn.select(
        F.col(id_col),
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
