"""Multimodal columns: images/audio/video as opaque ``binary`` payloads
with typed metadata, processed by Arrow-batched pandas UDFs.

Spark-side design (all real and tested): the payload is a ``binary``
column; metadata (width/height/channels, sample rate, frame count)
travels in plain typed columns so Catalyst can prune/filter on it
without touching bytes. Decode/feature/resize/frame-sample run inside
``mapInPandas``/``pandas_udf`` — one Python roundtrip per Arrow batch,
never per row.

Codecs: this container has no image/audio libraries, so *format*
decoding is stubbed: ``RAW8`` (uint8 row-major, a real codec for raw
bitmaps, implemented here with numpy) decodes for real; JPEG/PNG/FLAC
raise ``NotImplementedError`` unless PIL/soundfile happen to be
importable. Everything after decode — bilinear resize, channel stats,
PCM frame energy / zero-crossing rate, frame sampling — is real numpy.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (ArrayType, BinaryType, DoubleType,
                               IntegerType, LongType, StringType,
                               StructField, StructType)

__all__ = [
    "IMAGE_META_FIELDS", "AUDIO_META_FIELDS", "decode_raw8",
    "encode_raw8", "resize_bilinear", "image_features_schema",
    "image_features", "audio_features_schema", "audio_features",
    "sample_frames", "frame_sample_udf",
]

IMAGE_META_FIELDS = [
    StructField("width", IntegerType()),
    StructField("height", IntegerType()),
    StructField("channels", IntegerType()),
    StructField("format", StringType()),
]
AUDIO_META_FIELDS = [
    StructField("sample_rate", IntegerType()),
    StructField("n_samples", LongType()),
    StructField("format", StringType()),
]


# ----------------------------------------------------------------------
# codecs (driver/executor-side numpy; RAW8 is real, compressed formats
# are gated behind optional libraries)
# ----------------------------------------------------------------------
def decode_raw8(data: bytes, width: int, height: int,
                channels: int = 1) -> np.ndarray:
    """Decode a RAW8 payload → float64 (height, width, channels) in
    [0, 1]. Truncates/zero-pads to the declared shape (defensive
    against short payloads)."""
    need = width * height * channels
    buf = np.frombuffer(data, dtype=np.uint8)
    if buf.size < need:
        buf = np.pad(buf, (0, need - buf.size))
    return buf[:need].reshape(height, width, channels) / 255.0


def encode_raw8(img: np.ndarray) -> bytes:
    """Inverse of decode_raw8 (for tests/fixture construction)."""
    return (np.clip(img, 0, 1) * 255).astype(np.uint8).tobytes()


def _decode(data: bytes, width: int, height: int, channels: int,
            fmt: str) -> np.ndarray:
    if fmt == "RAW8":
        return decode_raw8(data, width, height, channels)
    try:  # pragma: no cover - libs absent in this environment
        from PIL import Image
        import io
        return np.asarray(Image.open(io.BytesIO(data)),
                          dtype=np.float64) / 255.0
    except ImportError:
        raise NotImplementedError(
            f"format {fmt!r}: no image codec available in this "
            f"environment (RAW8 is supported natively)")


def resize_bilinear(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Pure-numpy bilinear resize, (H, W, C) → (out_h, out_w, C)."""
    h, w, c = img.shape
    ys = (np.arange(out_h) + 0.5) * h / out_h - 0.5
    xs = (np.arange(out_w) + 0.5) * w / out_w - 0.5
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y1, x1 = np.minimum(y0 + 1, h - 1), np.minimum(x0 + 1, w - 1)
    wy = np.clip(ys - y0, 0, 1)[:, None, None]
    wx = np.clip(xs - x0, 0, 1)[None, :, None]
    top = img[y0][:, x0] * (1 - wx) + img[y0][:, x1] * wx
    bot = img[y1][:, x0] * (1 - wx) + img[y1][:, x1] * wx
    return top * (1 - wy) + bot * wy


# ----------------------------------------------------------------------
# image features via mapInPandas
# ----------------------------------------------------------------------
def image_features_schema(id_field: StructField) -> StructType:
    return StructType([
        id_field,
        StructField("mean_lum", DoubleType()),
        StructField("std_lum", DoubleType()),
        StructField("resized", ArrayType(DoubleType())),
    ])


def image_features(df: DataFrame, id_col: str, out_w: int = 4,
                   out_h: int = 4,
                   payload_col: str = "payload") -> DataFrame:
    """Decode → stats + bilinear thumbnail, one Arrow batch at a time.

    Expects columns: payload (binary), width, height, channels, format.
    Output: (id, mean_lum, std_lum, resized[out_h·out_w] row-major
    luminance thumbnail).
    """
    schema = image_features_schema(df.schema[id_col])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, means, stds, thumbs = [], [], [], []
            for r in pdf.itertuples(index=False):
                img = _decode(r.payload, r.width, r.height, r.channels,
                              r.format)
                lum = img.mean(axis=2)
                ids.append(getattr(r, id_col))
                means.append(float(lum.mean()))
                stds.append(float(lum.std()))
                thumbs.append(resize_bilinear(
                    img, out_w, out_h).mean(axis=2).ravel())
            yield pd.DataFrame({id_col: ids, "mean_lum": means,
                                "std_lum": stds, "resized": thumbs})

    cols = [id_col, payload_col, "width", "height", "channels", "format"]
    sel = df.select(*cols).withColumnRenamed(payload_col, "payload")
    return sel.mapInPandas(run, schema)


# ----------------------------------------------------------------------
# audio features (int16 little-endian PCM payloads)
# ----------------------------------------------------------------------
def audio_features_schema(id_field: StructField) -> StructType:
    return StructType([
        id_field,
        StructField("rms", DoubleType()),
        StructField("zcr", DoubleType()),
        StructField("frame_energy", ArrayType(DoubleType())),
    ])


def audio_features(df: DataFrame, id_col: str, frame_samples: int = 256,
                   payload_col: str = "payload") -> DataFrame:
    """PCM16 payload → RMS, zero-crossing rate, per-frame energy.

    Real numpy DSP on the raw bytes — no codec needed for PCM. The
    trailing partial frame is dropped (rechunk semantics).
    """
    schema = audio_features_schema(df.schema[id_col])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, rmss, zcrs, energies = [], [], [], []
            for r in pdf.itertuples(index=False):
                buf = r.payload[:len(r.payload) & ~1]  # drop odd tail byte
                x = np.frombuffer(buf, dtype="<i2") / 32768.0
                ids.append(getattr(r, id_col))
                rmss.append(float(np.sqrt(np.mean(x ** 2))) if x.size
                            else 0.0)
                zcrs.append(float(np.mean(np.signbit(x[1:])
                                          != np.signbit(x[:-1])))
                            if x.size > 1 else 0.0)
                nf = x.size // frame_samples
                fr = x[:nf * frame_samples].reshape(nf, frame_samples)
                energies.append((fr ** 2).sum(axis=1))
            yield pd.DataFrame({id_col: ids, "rms": rmss, "zcr": zcrs,
                                "frame_energy": energies})

    sel = df.select(id_col, payload_col) \
            .withColumnRenamed(payload_col, "payload")
    return sel.mapInPandas(run, schema)


# ----------------------------------------------------------------------
# video frame sampling (video = concatenated RAW8 frames)
# ----------------------------------------------------------------------
def sample_frames(data: bytes, frame_bytes: int, every: int) -> list[bytes]:
    """Every-Nth frame from a concatenated-frame payload; trailing
    partial frame dropped."""
    n = len(data) // frame_bytes
    return [data[i * frame_bytes:(i + 1) * frame_bytes]
            for i in range(0, n, every)]


def frame_sample_udf(frame_bytes: int, every: int):
    """pandas UDF: payload → array of sampled frame payloads."""
    @F.pandas_udf(ArrayType(BinaryType()))
    def _sample(payloads: pd.Series) -> pd.Series:
        return payloads.map(
            lambda d: sample_frames(d, frame_bytes, every))
    return _sample
