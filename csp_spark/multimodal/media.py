"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, processed via Arrow-batched mapInPandas.

The Spark-side plumbing (schemas, batch iteration, partition sizing)
is real and tested; the actual codecs are STUBBED — this container has
no image/audio libraries — behind `_decode_image`/`_decode_audio`,
which produce a deterministic fake so the pipeline shape is verifiable
end-to-end. Swap the stub body for PIL/torchaudio/ffmpeg in a real
deployment; nothing else changes.

Design notes for 100 TB:
- binary payloads ride in their own column so column pruning skips
  them unless a stage touches media bytes;
- decode/feature steps are mapInPandas (streaming Arrow batches, no
  group shuffle needed — unlike applyInPandas);
- `spark.sql.execution.arrow.maxRecordsPerBatch` bounds batch memory
  (media rows are big — size it down for video).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
    ]
)


def _decode_image(payload: bytes) -> np.ndarray:
    """STUB: real impl = PIL.Image.open(io.BytesIO(payload)).
    Deterministic fake: 4x4 gray image derived from the payload hash,
    so tests can assert exact feature values."""
    if payload is None:
        raise ValueError("null image payload")
    h = hashlib.sha256(payload).digest()
    level = h[0]
    return np.full((4, 4, 3), level, dtype=np.uint8)


def _decode_audio(payload: bytes, sample_rate: int = 16000) -> np.ndarray:
    """STUB: real impl = soundfile/torchaudio decode. Deterministic
    fake: 1 s sine wave with frequency from the payload hash."""
    h = hashlib.sha256(payload).digest()
    freq = 100 + h[0]
    t = np.arange(sample_rate, dtype=np.float64) / sample_rate
    return np.sin(2 * np.pi * freq * t)


def image_features(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Decode + cheap visual features (mean/std per channel). Output
    schema: (media_id, mean_r, mean_g, mean_b, std_gray)."""
    schema = (
        f"{id_col} long, mean_r double, mean_g double, mean_b double, std_gray double"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _decode_image(bytes(payload)).astype(np.float64)
                rows.append(
                    (
                        mid,
                        float(img[..., 0].mean()),
                        float(img[..., 1].mean()),
                        float(img[..., 2].mean()),
                        float(img.mean(axis=2).std()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "mean_r", "mean_g", "mean_b", "std_gray"]
            )

    return media.select(id_col, payload_col).mapInPandas(run, schema)


def image_resize(
    media: DataFrame,
    width: int,
    height: int,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """Resize pipeline stage: binary in → binary out (stub resamples the
    fake decode; real impl swaps in PIL). Shape: (media_id, payload)."""
    schema = f"{id_col} long, payload binary"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                img = _decode_image(bytes(payload))
                # nearest-neighbor resample of the fake image
                out = np.resize(img, (height, width, 3))
                rows.append((mid, out.tobytes()))
            yield pd.DataFrame(rows, columns=[id_col, "payload"])

    return media.select(id_col, payload_col).mapInPandas(run, schema)


def audio_features(
    media: DataFrame, payload_col: str = "payload", id_col: str = "media_id"
) -> DataFrame:
    """Decode + RMS/zero-crossing-rate. Schema: (media_id, rms, zcr)."""
    schema = f"{id_col} long, rms double, zcr double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                wav = _decode_audio(bytes(payload))
                rms = float(np.sqrt((wav**2).mean()))
                zcr = float((np.diff(np.signbit(wav)) != 0).mean())
                rows.append((mid, rms, zcr))
            yield pd.DataFrame(rows, columns=[id_col, "rms", "zcr"])

    return media.select(id_col, payload_col).mapInPandas(run, schema)


def frame_sample(
    media: DataFrame,
    every_n: int = 10,
    n_frames_col: str = "n_frames",
    id_col: str = "media_id",
) -> DataFrame:
    """Video frame sampling *plan*: expand (media_id, n_frames) to one
    row per sampled frame index — pure JVM (sequence+explode); the
    actual frame decode would be a follow-up mapInPandas keyed by
    (media_id, frame_idx)."""
    return media.select(
        id_col,
        F.explode(
            F.sequence(F.lit(0), F.col(n_frames_col) - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
