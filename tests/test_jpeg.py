"""jpeg.py: baseline JPEG codec round-trips without PIL.

The encoder writes standard baseline JFIF (Annex K tables, 4:4:4);
the decoder parses tables from the stream, so a round-trip exercises
marker parsing, DHT/DQT handling, the entropy coder both ways, the
DCT pair, and the YCbCr<->RGB conversions."""

import numpy as np
import pytest

from dataframe_pipeline_spark.jpeg import decode_jpeg, encode_jpeg


def _gradient(h, w):
    x = np.linspace(0, 255, w)
    y = np.linspace(0, 255, h)
    gx, gy = np.meshgrid(x, y)
    return np.stack([gx, gy, (gx + gy) / 2], axis=-1).astype(np.uint8)


def test_roundtrip_rgb_gradient():
    img = _gradient(64, 64)
    b = encode_jpeg(img, quality=90)
    assert b[:2] == b"\xff\xd8" and b[-2:] == b"\xff\xd9"
    out = decode_jpeg(b)
    assert out.shape == (64, 64, 3) and out.dtype == np.uint8
    err = np.abs(out.astype(int) - img.astype(int))
    assert err.max() <= 8 and err.mean() < 2.0


def test_roundtrip_grayscale_odd_dims():
    g = np.outer(np.linspace(0, 255, 37), np.ones(53)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(g, quality=85))
    assert out.shape == (37, 53, 1)
    assert np.abs(out[..., 0].astype(int) - g.astype(int)).max() <= 8


def test_roundtrip_noise_quality95():
    rng = np.random.RandomState(0)
    n = rng.randint(0, 256, (24, 40, 3)).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(n, quality=95))
    assert out.shape == n.shape
    # noise is the worst case for DCT quantization; mean error stays
    # small at q95 even though per-pixel excursions exist
    assert np.abs(out.astype(int) - n.astype(int)).mean() < 8


def test_quality_monotone():
    img = _gradient(32, 32)
    lo = decode_jpeg(encode_jpeg(img, quality=20))
    hi = decode_jpeg(encode_jpeg(img, quality=95))
    err_lo = np.abs(lo.astype(int) - img.astype(int)).mean()
    err_hi = np.abs(hi.astype(int) - img.astype(int)).mean()
    assert err_hi <= err_lo
    assert len(encode_jpeg(img, quality=20)) < len(encode_jpeg(img, 95))


def test_flat_color_exact():
    img = np.full((16, 16, 3), 128, np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=75))
    assert np.abs(out.astype(int) - 128).max() <= 2


def test_progressive_raises_not_implemented():
    # minimal stream up to an SOF2 marker
    b = (b"\xff\xd8"
         + b"\xff\xc2" + (17).to_bytes(2, "big")
         + bytes([8]) + (8).to_bytes(2, "big") + (8).to_bytes(2, "big")
         + bytes([3]) + bytes([1, 0x11, 0, 2, 0x11, 1, 3, 0x11, 1]))
    with pytest.raises(NotImplementedError, match="progressive"):
        decode_jpeg(b)


def test_corrupt_raises_value_error():
    with pytest.raises(ValueError):
        decode_jpeg(b"\xff\xd8\xff\xe0 truncated")
    with pytest.raises(NotImplementedError):
        decode_jpeg(b"NOTAJPEG")


def test_multimodal_dispatch_decodes_jpeg():
    """The magic-byte dispatch flips from stub to real for \\xff\\xd8."""
    from dataframe_pipeline_spark import multimodal as mm

    img = _gradient(16, 24)
    w, h, mean = mm.decode_image(encode_jpeg(img, quality=90))
    assert (w, h) == (24, 16)
    assert abs(mean - img.mean()) < 3


def test_decode_stage_handles_jpeg_payloads(spark):
    """End-to-end through the Arrow-batched mapInPandas decode stage."""
    from dataframe_pipeline_spark import multimodal as mm

    from pyspark.sql import functions as F

    img = _gradient(8, 8)
    rows = [(0, bytearray(encode_jpeg(img, quality=90))),
            (1, bytearray(b"\xff\xd8\xff\xe0 corrupt"))]
    df = (spark.createDataFrame(rows, "doc_id long, payload binary")
          .withColumn("n_bytes", F.octet_length("payload").cast("long"))
          .withColumn("digest", F.md5("payload")))
    out = {r.doc_id: r for r in
           mm.ImageDecoder(on_error="null").transform(df).collect()}
    assert out[0].width == 8 and out[0].height == 8
    assert out[1].width is None  # corrupt -> NULL row, not job failure
