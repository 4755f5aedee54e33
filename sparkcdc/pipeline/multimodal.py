"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched pandas UDFs via
``mapInPandas``.

The actual decode libraries (PIL/ffmpeg/torchaudio) are NOT in this
container, so the decode step is a clearly-marked deterministic stand-in
(``_fake_decode``) behind the same batch interface a real decoder would
use — schema, partitioning, UDF signature and batch shapes are real and
tested. Swap ``_fake_decode`` for the real library call in production; the
Spark plan does not change.

Scale notes: mapInPandas streams Arrow batches — memory is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition size, which
is what makes 100 MB+ media blobs safe; binary payloads stay columnar and
are never routed through Python object pickling.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("content_sha", T.StringType()),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_sha", T.StringType()),
    ]
)


def binary_metadata(df: DataFrame, bin_col: str = "payload") -> DataFrame:
    """Pure-Catalyst metadata over a binary column (no Python at all):
    byte length + sha256 — the cheap pre-filter stage before any decode."""
    return df.withColumn("n_bytes", F.octet_length(F.col(bin_col))).withColumn(
        "payload_sha", F.sha2(F.col(bin_col), 256)
    )


def _fake_decode(payload: bytes) -> tuple[int, int, str]:
    """Deterministic decode stand-in: derives (width, height, format) from
    the payload sha256. A real implementation would be::

        from PIL import Image; img = Image.open(io.BytesIO(payload))
        return img.width, img.height, img.format

    raising NotImplementedError is the other documented option; the fake
    keeps the pipeline testable end-to-end.
    """
    h = hashlib.sha256(payload).hexdigest()
    hv = int(h[:15], 16)
    width = 64 + hv % 1856  # 64..1919
    height = 64 + (hv // 1856) % 1016  # 64..1079
    fmt = ["png", "jpeg", "webp"][hv % 3]
    return width, height, fmt


def decode_image_stub(
    df: DataFrame, bin_col: str = "payload", id_col: str = "doc_id"
) -> DataFrame:
    """mapInPandas decode stage: Arrow batches in, metadata rows out."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload)
                width, height, fmt = _fake_decode(b)
                rows.append(
                    (
                        int(doc_id),
                        len(b),
                        width,
                        height,
                        fmt,
                        hashlib.sha256(b).hexdigest(),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in DECODE_SCHEMA.fields]
            )

    return df.select(id_col, bin_col).mapInPandas(decode, DECODE_SCHEMA)


def frame_sample(
    df: DataFrame,
    bin_col: str = "payload",
    id_col: str = "doc_id",
    *,
    frame_bytes: int = 16,
    every_k: int = 4,
) -> DataFrame:
    """Treat the binary payload as a frame stream (``frame_bytes`` per
    frame) and sample every ``every_k``-th frame — the video-frame-sampling
    access pattern with a byte-slice stand-in for the codec."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf[id_col], pdf[bin_col]):
                b = bytes(payload)
                n_frames = len(b) // frame_bytes
                for idx in range(0, n_frames, every_k):
                    frame = b[idx * frame_bytes : (idx + 1) * frame_bytes]
                    rows.append(
                        (int(doc_id), idx, hashlib.sha256(frame).hexdigest())
                    )
            yield pd.DataFrame(
                rows, columns=[f.name for f in FRAME_SCHEMA.fields]
            )

    return df.select(id_col, bin_col).mapInPandas(sample, FRAME_SCHEMA)
