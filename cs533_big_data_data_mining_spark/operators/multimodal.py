"""Multimodal (image/audio/video) column plumbing.

Design: media payloads are opaque ``BINARY`` columns plus typed
metadata — the layout that keeps Parquet scans prunable (metadata
queries never touch payload bytes; Parquet column pruning skips
them). Decode / feature-extract / resize / frame-sample run as
Arrow-batched ``mapInPandas`` kernels so payload bytes cross the
JVM->Python boundary exactly once per batch.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so
the decode step is gated: ``decode='stub'`` parses a deterministic
fake header (tests exercise the full Spark plumbing — schema,
batching, partitioning); ``decode='real'`` raises NotImplementedError
at the point where the codec import would happen. The Spark-side
machinery is identical either way.

Stub payload format (used by tests and the synthetic fixture):
``b'FAKE' + uint16 width + uint16 height + uint8 channels + raw``.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),  # image | audio | video | text
        T.StructField("payload", T.BinaryType()),
        T.StructField("source", T.StringType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("modality", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("payload_ok", T.BooleanType()),
    ]
)


def pack_stub_payload(width: int, height: int, channels: int, body: bytes = b"") -> bytes:
    return b"FAKE" + struct.pack("<HHB", width, height, channels) + body


def decode_media(df: DataFrame, decode: str = "stub", batch_rows: int = 1024) -> DataFrame:
    """payload BINARY -> typed metadata frame (DECODED_SCHEMA).

    The kernel sees Arrow batches; per-batch NumPy work, no per-row
    Python. ``batch_rows`` bounds peak memory per worker
    (spark.sql.execution.arrow.maxRecordsPerBatch governs the Arrow
    slice size upstream of this)."""
    if decode == "real":
        raise NotImplementedError(
            "real media codecs (PIL/av) are not available in this environment; "
            "plug the codec into _decode_batch and pass decode='real'"
        )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for lo in range(0, len(pdf), batch_rows):
                chunk = pdf.iloc[lo : lo + batch_rows]
                rows = []
                for mid, mod, payload in zip(chunk["media_id"], chunk["modality"], chunk["payload"]):
                    buf = bytes(payload) if payload is not None else b""
                    ok = len(buf) >= 9 and buf[:4] == b"FAKE"
                    if ok:
                        w, h, c = struct.unpack("<HHB", buf[4:9])
                    else:
                        w = h = c = 0
                    rows.append((mid, mod, w, h, c, len(buf), ok))
                yield pd.DataFrame(
                    rows,
                    columns=["media_id", "modality", "width", "height", "channels", "n_bytes", "payload_ok"],
                )

    return df.mapInPandas(kernel, schema=DECODED_SCHEMA)


def resize_stub(df: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize plumbing: rewrites the stub header to the target size
    (a real codec would transform pixels here). Demonstrates the
    payload-in/payload-out kernel shape."""
    out_schema = df.schema

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            def _rewrite(payload):
                buf = bytes(payload) if payload is not None else b""
                if len(buf) >= 9 and buf[:4] == b"FAKE":
                    ch = buf[8]
                    return pack_stub_payload(target_w, target_h, ch, buf[9:])
                return buf

            pdf = pdf.copy()
            pdf["payload"] = pdf["payload"].map(_rewrite)
            yield pdf

    return df.mapInPandas(kernel, schema=out_schema)


def frame_sample_stub(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame sampling plumbing: emits one row per sampled frame
    index (frame count faked as n_bytes // 1024 + 1). Output:
    (media_id, frame_index)."""
    schema = T.StructType(
        [T.StructField("media_id", T.LongType()), T.StructField("frame_index", T.IntegerType())]
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            mids, frames = [], []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                n_frames = (len(bytes(payload)) if payload is not None else 0) // 1024 + 1
                for fi in range(0, n_frames, every_n):
                    mids.append(mid)
                    frames.append(fi)
            yield pd.DataFrame({"media_id": np.asarray(mids, dtype=np.int64),
                                "frame_index": np.asarray(frames, dtype=np.int32)})

    return df.select("media_id", "payload").mapInPandas(kernel, schema=schema)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter: the testdata ``documents`` table viewed as a media
    frame (text modality, utf-8 payload) — lets the metadata path be
    oracle-checked against octet lengths in SQL."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "utf-8").alias("payload"),
        F.col("source"),
    )


def byte_histogram_features(
    df: DataFrame, bins: int = 64, batch_rows: int = 1024
) -> DataFrame:
    """Feature extraction over opaque payloads — a REAL extractor (no
    codec needed): the L1-normalized byte-value histogram, the
    classic content-signature feature for modality/type detection and
    corruption screening. Output ``(media_id, modality, features
    ARRAY<DOUBLE>[bins])`` plugs straight into
    ``operators/similarity`` (cosine top-k / near-dup) as the
    embedding column.

    256 must divide into ``bins`` evenly-sized buckets.
    """
    if 256 % bins:
        raise ValueError("bins must divide 256")
    shift = (256 // bins).bit_length() - 1  # byte >> shift -> bucket

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            feats = []
            for payload in pdf["payload"]:
                arr = np.frombuffer(bytes(payload), dtype=np.uint8)
                if arr.size:
                    h = np.bincount(arr >> shift, minlength=bins)
                    feats.append((h / arr.size).astype(np.float64))
                else:
                    feats.append(np.zeros(bins, dtype=np.float64))
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "modality": pdf["modality"],
                    "features": feats,
                }
            )

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType()),
            T.StructField("modality", T.StringType()),
            T.StructField("features", T.ArrayType(T.DoubleType())),
        ]
    )
    src = df.select("media_id", "modality", "payload")
    return src.mapInPandas(kernel, schema=out_schema)
