"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video travel through the engine as `binary` columns with a
metadata struct alongside. The Spark-side machinery here is real and
tested — schema contract, Arrow-batched `mapInPandas`, partition-sized
batches — while the actual media decode is stubbed (`decode_stub`): the
decode libraries (PIL/ffmpeg/librosa) are not in this container, and the
engine's job is the distribution plumbing, not the codec.

At 100 TB: binary payloads dominate partition size, so
`spark.sql.files.maxPartitionBytes` governs batch memory; the mapInPandas
iterator yields per-batch frames and never concatenates a partition.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = ["MEDIA_META_SCHEMA", "attach_binary_payload", "binary_meta", "decode_stub"]

# typed metadata contract accompanying any opaque media column
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Test shim: materialize an opaque binary column from text (the
    container has no real media files). Production datasets would already
    carry the binary column from the ingest format (parquet BYTE_ARRAY)."""
    return df.withColumn("payload", F.encode(F.col(text_col), "UTF-8"))


def decode_stub(payload: bytes) -> dict:
    """Placeholder for the media decode (PIL.Image.open / av.open / …).

    Deterministic fake: derives pseudo 'width'/'height' from the payload
    hash so downstream feature columns are testable. A real deployment
    replaces only this function; the Spark plumbing is unchanged.
    """
    h = hashlib.sha256(payload).digest()
    return {"width": 16 + h[0] % 64, "height": 16 + h[1] % 64}


def binary_meta(df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Extract typed metadata + stub-decoded features from a binary column
    via Arrow-batched mapInPandas (the pattern for any per-media Python
    step: decode, resize, frame-sample, feature-extract).

    Yields one output frame per Arrow batch — bounded memory regardless of
    partition size."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("n_bytes", T.LongType()),
            T.StructField("sha256", T.StringType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            decoded = [decode_stub(p) for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "n_bytes": [len(p) for p in payloads],
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(extract, out_schema)
