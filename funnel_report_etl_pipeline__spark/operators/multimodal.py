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

__all__ = [
    "MEDIA_META_SCHEMA",
    "attach_binary_payload",
    "binary_meta",
    "decode_stub",
    "resize_stub",
    "frame_sample_stub",
    "media_features",
    "media_fingerprints",
    "perceptual_hash_stub",
]

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


def resize_stub(payload: bytes, width: int, height: int) -> bytes:
    """Placeholder for image resize (PIL ``Image.resize``). Deterministic
    fake: re-hash the payload with the target dims so the output is a
    stable function of (payload, w, h) — the batch shape, schema, and
    partitioning of a real resize, without the codec."""
    return hashlib.sha256(payload + f"{width}x{height}".encode()).digest()


def frame_sample_stub(payload: bytes, n_frames: int) -> list[bytes]:
    """Placeholder for video frame sampling (av/ffmpeg). Deterministic
    fake: n pseudo-frames from a sha256 chain — real plumbing would yield
    decoded frames at evenly-spaced timestamps.

    The chain walks hex-digest STRINGS (frame i = digest of previous hex
    digest + "f{i}") so the whole fake is replicable by any engine's
    varchar sha256 — which is what lets the registered query carry a full
    value-hash oracle instead of a rows-only waiver."""
    frames = []
    prev = hashlib.sha256(payload + b"f0").hexdigest()
    frames.append(bytes.fromhex(prev))
    for i in range(1, n_frames):
        prev = hashlib.sha256(prev.encode("ascii") + f"f{i}".encode()).hexdigest()
        frames.append(bytes.fromhex(prev))
    return frames


def media_features(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    resize_to: tuple[int, int] = (224, 224),
    n_frames: int = 4,
) -> DataFrame:
    """Full media feature pass over a binary column: decode → resize →
    frame-sample, one Arrow-batched ``mapInPandas`` (one Python hop for all
    three steps, not three). Output keeps frames as ``array<binary>`` —
    the schema a downstream vision encoder consumes.

    Real deployments swap the three ``*_stub`` functions for PIL/ffmpeg
    calls; nothing else changes."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("width", T.IntegerType()),
            T.StructField("height", T.IntegerType()),
            T.StructField("resized", T.BinaryType()),
            T.StructField("frames", T.ArrayType(T.BinaryType())),
        ]
    )
    rw, rh = resize_to

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            decoded = [decode_stub(p) for p in payloads]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "width": [d["width"] for d in decoded],
                    "height": [d["height"] for d in decoded],
                    "resized": [resize_stub(p, rw, rh) for p in payloads],
                    "frames": [frame_sample_stub(p, n_frames) for p in payloads],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(extract, out_schema)


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


def perceptual_hash_stub(payload: bytes) -> str:
    """Placeholder for a DCT perceptual hash (pHash/aHash). Deterministic
    fake over the STUB-DECODED features: a real pHash downsamples the
    decoded image to a coarse geometry-invariant signature; this stub
    hashes the stub decode's (width, height) "geometry" so assets whose
    decoded dimensions coincide land in one bucket — the candidate-bucket
    shape of real perceptual dedup (bucket join, never pairwise), with
    every byte of the chain replicable by any engine's varchar sha256
    (the frame_sample_stub trick) so the registered query carries a full
    value-hash oracle. A real deployment replaces only this function."""
    d = decode_stub(payload)
    return hashlib.sha256(f"{d['width']}x{d['height']}".encode()).hexdigest()[:8]


def media_fingerprints(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """(id, sha256, phash) per media asset in ONE Arrow-batched
    mapInPandas hop — the fingerprint pass media dedup runs before its
    bucket joins: exact identity (sha256 of the bytes) and perceptual
    bucket (stub pHash over the decoded features). Yields per Arrow
    batch; memory bounded regardless of partition size."""
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType()),
            T.StructField("sha256", T.StringType()),
            T.StructField("phash", T.StringType()),
        ]
    )

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[bin_col]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].values,
                    "sha256": [hashlib.sha256(p).hexdigest() for p in payloads],
                    "phash": [perceptual_hash_stub(p) for p in payloads],
                }
            )

    return df.select(id_col, bin_col).mapInPandas(extract, out_schema)
