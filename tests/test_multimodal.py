"""Multimodal binary-column plumbing vs numpy oracles. Payloads are
deterministic RAW8 images / PCM16 audio built in-test (no codec libs
in this environment; the Spark-side schema/UDF/batch plumbing is
real)."""

import numpy as np
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (BinaryType, IntegerType, LongType,
                               StringType, StructField, StructType)

from detanalysis_spark.llm import multimodal as M


@pytest.fixture(scope="module")
def images(spark):
    rng = np.random.default_rng(13)
    rows, raw = [], {}
    for i in range(12):
        w, h, c = 8 + i % 3, 6 + i % 2, 3
        img = rng.random((h, w, c))
        img = np.round(img * 255) / 255.0          # exact RAW8 round-trip
        raw[i] = img
        rows.append((i, bytearray(M.encode_raw8(img)), w, h, c, "RAW8"))
    schema = StructType([StructField("img_id", LongType()),
                         StructField("payload", BinaryType()),
                         StructField("width", IntegerType()),
                         StructField("height", IntegerType()),
                         StructField("channels", IntegerType()),
                         StructField("format", StringType())])
    return spark.createDataFrame(rows, schema), raw


def test_raw8_roundtrip():
    img = np.round(np.random.default_rng(0).random((4, 5, 3)) * 255) / 255
    got = M.decode_raw8(M.encode_raw8(img), 5, 4, 3)
    np.testing.assert_allclose(got, img, atol=1e-12)
    short = M.decode_raw8(b"\xff", 2, 2, 1)        # zero-padded
    assert short.shape == (2, 2, 1) and short[0, 0, 0] == 1.0


def test_resize_bilinear_identity_and_mean():
    img = np.random.default_rng(1).random((6, 8, 3))
    same = M.resize_bilinear(img, 8, 6)
    np.testing.assert_allclose(same, img, atol=1e-12)  # identity resize
    one = M.resize_bilinear(img, 1, 1)
    # 1×1 bilinear sample hits the image center region
    assert abs(one.mean() - img.mean()) < 0.2


def test_image_features_vs_numpy(images):
    df, raw = images
    got = {r.img_id: r for r in
           M.image_features(df, "img_id", out_w=4, out_h=4).collect()}
    assert len(got) == 12
    for i, img in raw.items():
        lum = img.mean(axis=2)
        assert got[i].mean_lum == pytest.approx(lum.mean(), rel=1e-9)
        assert got[i].std_lum == pytest.approx(lum.std(), rel=1e-9)
        want = M.resize_bilinear(img, 4, 4).mean(axis=2).ravel()
        np.testing.assert_allclose(got[i].resized, want, rtol=1e-9)


def test_unknown_format_raises(spark, images):
    df, _ = images
    bad = df.withColumn("format", F.lit("JPEG"))
    with pytest.raises(Exception, match="no image codec|JPEG"):
        M.image_features(bad, "img_id").collect()


@pytest.fixture(scope="module")
def audio(spark):
    rng = np.random.default_rng(17)
    rows, raw = [], {}
    for i in range(6):
        n = 1000 + 130 * i                         # not a frame multiple
        x = (rng.standard_normal(n) * 3000).astype("<i2")
        raw[i] = x
        rows.append((i, bytearray(x.tobytes()), 16000, n, "PCM16"))
    schema = StructType([StructField("audio_id", LongType()),
                         StructField("payload", BinaryType()),
                         StructField("sample_rate", IntegerType()),
                         StructField("n_samples", LongType()),
                         StructField("format", StringType())])
    return spark.createDataFrame(rows, schema), raw


def test_audio_features_vs_numpy(audio):
    df, raw = audio
    got = {r.audio_id: r for r in
           M.audio_features(df, "audio_id", frame_samples=256).collect()}
    for i, xi in raw.items():
        x = xi / 32768.0
        assert got[i].rms == pytest.approx(np.sqrt((x ** 2).mean()),
                                           rel=1e-9)
        zcr = np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))
        assert got[i].zcr == pytest.approx(zcr, rel=1e-9)
        nf = x.size // 256
        want = (x[:nf * 256].reshape(nf, 256) ** 2).sum(axis=1)
        np.testing.assert_allclose(got[i].frame_energy, want, rtol=1e-9)


def test_frame_sampling(spark):
    frame_bytes = 16
    payload = bytes(range(16)) * 7 + b"\x01\x02"   # 7 frames + partial
    df = spark.createDataFrame([(0, bytearray(payload))], ["vid", "payload"])
    got = df.select(M.frame_sample_udf(frame_bytes, 3)(
        F.col("payload")).alias("frames")).first().frames
    assert len(got) == 3                           # frames 0, 3, 6
    assert all(bytes(f) == bytes(range(16)) for f in got)
    assert M.sample_frames(b"", frame_bytes, 2) == []
