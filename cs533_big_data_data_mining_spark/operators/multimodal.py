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
                bufs = [bytes(p) if p is not None else b"" for p in chunk["payload"]]
                n = len(bufs)
                lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=n)
                # pack the (padded) 9-byte headers into one (n, 9)
                # uint8 matrix; all field decoding is then vectorized
                heads = np.frombuffer(
                    b"".join(b[:9].ljust(9, b"\0") for b in bufs), dtype=np.uint8
                ).reshape(n, 9)
                ok = (lens >= 9) & (heads[:, :4] == np.frombuffer(b"FAKE", dtype=np.uint8)).all(axis=1)
                w = np.where(ok, heads[:, 4].astype(np.int32) | (heads[:, 5].astype(np.int32) << 8), 0)
                h = np.where(ok, heads[:, 6].astype(np.int32) | (heads[:, 7].astype(np.int32) << 8), 0)
                c = np.where(ok, heads[:, 8].astype(np.int32), 0)
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "modality": chunk["modality"].to_numpy(),
                        "width": w,
                        "height": h,
                        "channels": c,
                        "n_bytes": lens,
                        "payload_ok": ok,
                    }
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
            lens = np.fromiter(
                (len(p) if p is not None else 0 for p in pdf["payload"]),
                dtype=np.int64,
                count=len(pdf),
            )
            n_frames = lens // 1024 + 1
            counts = (n_frames + every_n - 1) // every_n  # frames sampled per row
            total = int(counts.sum())
            mids = np.repeat(pdf["media_id"].to_numpy(), counts)
            # per-row ramp 0..counts-1, scaled by the stride
            starts = np.repeat(np.cumsum(counts) - counts, counts)
            frames = ((np.arange(total, dtype=np.int64) - starts) * every_n).astype(np.int32)
            yield pd.DataFrame({"media_id": mids, "frame_index": frames})

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
