"""Multimodal (image/audio/video) column handling over binary payloads.

The engine treats media as opaque BinaryType columns with typed metadata —
the page table's `html` column is the model case (raw bytes, may be invalid
UTF-8, never decoded in the relational layer).  This module provides the
Spark-side plumbing a 100 TB training-data pipeline needs:

  - schema: (payload binary, media_type string, meta struct) columns
  - magic-byte sniffing (native expressions over binary prefixes)
  - decode / feature-extract / resize / frame-sample as mapInPandas batch
    operators with real schemas, batching and partitioning

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container, so the
decode kernels are STUBBED: `decode_stub='error'` raises NotImplementedError
(production wiring point), `decode_stub='fake'` produces a deterministic
fake feature vector derived from the payload bytes so the distributed
plumbing is fully testable end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

_MAGIC = {
    "image/png": b"\x89PNG",
    "image/jpeg": b"\xff\xd8\xff",
    "image/gif": b"GIF8",
    "application/pdf": b"%PDF",
    "text/html": b"<htm",
    "riff": b"RIFF",  # wav/avi container
}


def sniff_media_type(payload: Column) -> Column:
    """Magic-byte media-type detection — pure Catalyst over binary prefix."""
    expr = F.lit("application/octet-stream")
    for mtype, magic in reversed(list(_MAGIC.items())):
        hexs = magic.hex()
        expr = F.when(
            F.hex(F.substring(payload, 1, len(magic))) == F.lit(hexs.upper()), mtype
        ).otherwise(expr)
    return expr


def media_meta(payload: Column) -> Column:
    """Typed metadata struct for a binary payload (all native)."""
    return F.struct(
        sniff_media_type(payload).alias("media_type"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("sha256"),
    )


_FEATURE_DIM = 16

_EXTRACT_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def _fake_feature(payload: bytes, dim: int = _FEATURE_DIM) -> np.ndarray:
    """Deterministic stand-in for a real decode+embed kernel: features from
    the payload digest (stable across partitioning/arrival order)."""
    digest = hashlib.sha256(payload or b"").digest()
    raw = np.frombuffer((digest * ((dim * 4) // len(digest) + 1))[: dim * 4], dtype=np.uint32)
    return (raw % 1000).astype(np.float32) / 1000.0


def extract_features(
    media: DataFrame,
    payload_col: str = "payload",
    url_col: str = "url",
    decode_stub: str = "fake",
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode + feature-extract as a mapInPandas batch operator.

    Real pipelines swap `_fake_feature` for a codec call; the Spark side —
    Arrow batches of binary payloads in, fixed-dim float vectors out,
    schema contract, partition-parallel — is what this function owns.
    """
    if decode_stub not in ("fake", "error"):
        raise ValueError("decode_stub must be 'fake' or 'error'")

    src = media.select(
        F.col(url_col).alias("url"),
        F.col(payload_col).alias("payload"),
        sniff_media_type(F.col(payload_col)).alias("media_type"),
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if decode_stub == "error":
                raise NotImplementedError(
                    "media decode requires codec libraries not present in "
                    "this container (PIL/ffmpeg/librosa); wire the real "
                    "kernel here"
                )
            feats = [_fake_feature(p).tolist() for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf["media_type"],
                    "feature": feats,
                }
            )

    return src.mapInPandas(run, schema=_EXTRACT_SCHEMA)


_RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("resized", T.BinaryType()),
    ]
)


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    url_col: str = "url",
    decode_stub: str = "fake",
) -> DataFrame:
    """Resize as a mapInPandas batch operator — same ownership split as
    extract_features: the Spark side (Arrow binary batches in, fixed-dims
    binary out, schema contract, partition-parallel) is real; the pixel
    kernel is the wiring point.  decode_stub='fake' emits a deterministic
    width*height-byte payload derived from the source digest (stable
    across partitioning, so downstream exact-dedup of resized media is
    testable); 'error' raises at the codec wiring point."""
    if decode_stub not in ("fake", "error"):
        raise ValueError("decode_stub must be 'fake' or 'error'")
    if width <= 0 or height <= 0:
        raise ValueError("width and height must be positive")

    src = media.select(
        F.col(url_col).alias("url"),
        F.col(payload_col).alias("payload"),
        sniff_media_type(F.col(payload_col)).alias("media_type"),
    )
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            if decode_stub == "error":
                raise NotImplementedError(
                    "media resize requires codec libraries not present in "
                    "this container (PIL/ffmpeg); wire the real kernel here"
                )
            out = []
            for p in pdf["payload"]:
                digest = hashlib.sha256(p or b"").digest()
                out.append((digest * (n_out // len(digest) + 1))[:n_out])
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "media_type": pdf["media_type"],
                    "width": np.full(len(pdf), width, dtype=np.int32),
                    "height": np.full(len(pdf), height, dtype=np.int32),
                    "resized": out,
                }
            )

    return src.mapInPandas(run, schema=_RESIZE_SCHEMA)


def frame_sample_plan(
    media: DataFrame,
    every_n_bytes: int = 1 << 16,
    payload_col: str = "payload",
    url_col: str = "url",
) -> DataFrame:
    """Frame/window sampling plumbing: emit (url, frame_idx, offset) rows for
    a byte-offset sampling grid — the real decoder would read frames at these
    offsets.  Native explode; no Python."""
    n = F.length(F.col(payload_col))
    offsets = F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(0), F.floor((n - 1) / every_n_bytes).cast("int")),
            lambda i: i * every_n_bytes,
        ),
    ).otherwise(F.array())
    return media.select(
        F.col(url_col).alias("url"), F.posexplode(offsets).alias("frame_idx", "offset")
    )
