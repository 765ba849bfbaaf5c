"""avi.py + VideoFrameSampler: real AVI/MJPEG frame sampling without
ffmpeg — round-trip through our own standard-AVI writer, per-frame
JPEG decode via jpeg.py."""

import numpy as np
import pytest

from dataframe_pipeline_spark.avi import encode_avi_mjpeg, iter_mjpeg_frames
from dataframe_pipeline_spark.jpeg import decode_jpeg, encode_jpeg


def _video_bytes(n_frames=6, w=16, h=12, seed=0):
    rng = np.random.RandomState(seed)
    frames = []
    for k in range(n_frames):
        img = np.full((h, w, 3), 20 * k, np.uint8)
        img[:, :, 0] = rng.randint(0, 256)
        frames.append(encode_jpeg(img, quality=90))
    return encode_avi_mjpeg(frames, w, h), frames


def test_container_roundtrip_exact():
    avi, frames = _video_bytes()
    got = list(iter_mjpeg_frames(avi))
    assert got == frames                   # chunk payloads are bit-exact


def test_frames_decode_as_jpeg():
    avi, _ = _video_bytes(n_frames=3)
    for jb in iter_mjpeg_frames(avi):
        px = decode_jpeg(jb)
        assert px.shape == (12, 16, 3)


def test_error_contract():
    with pytest.raises(NotImplementedError):
        list(iter_mjpeg_frames(b"not a riff"))
    with pytest.raises(ValueError):
        avi, _ = _video_bytes(n_frames=2)
        list(iter_mjpeg_frames(avi[:60]))   # truncated inside headers
    with pytest.raises(ValueError):
        # valid RIFF/AVI magic but no movi list
        import struct
        body = b"AVI " + b"JUNK" + struct.pack("<I", 4) + b"xxxx"
        list(iter_mjpeg_frames(b"RIFF" + struct.pack("<I", len(body)) + body))


def test_video_frame_sampler_stage(spark):
    """1 payload -> N frame rows; stride + max_frames; corrupt -> NULL
    row; frames decodable by ImageDecoder after rename."""
    from pyspark.sql import functions as F

    from dataframe_pipeline_spark import multimodal as mm

    avi, frames = _video_bytes(n_frames=7)
    rows = [(0, bytearray(avi)), (1, bytearray(b"garbage not video"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    out = mm.VideoFrameSampler(stride=2, on_error="null").transform(df)
    pdf = out.toPandas()
    good = pdf[pdf.doc_id == 0]
    assert list(good.frame_no) == [0, 2, 4, 6]
    assert bytes(good.iloc[0].frame) == frames[0]
    bad = pdf[pdf.doc_id == 1]
    assert len(bad) == 1 and bad.iloc[0].frame is None

    # max_frames cap
    capped = mm.VideoFrameSampler(stride=1, max_frames=3).transform(
        spark.createDataFrame([(0, bytearray(avi))],
                              "doc_id long, payload binary"))
    assert capped.count() == 3

    # compose with the real image decoder: frame -> payload (frame_no
    # rides as the decoder's id column)
    feats = (out.filter(F.col("frame").isNotNull())
             .select(F.col("frame_no").cast("long").alias("doc_id"),
                     F.col("frame").alias("payload"))
             .withColumn("n_bytes", F.octet_length("payload").cast("long"))
             .withColumn("digest", F.md5("payload")))
    got = mm.ImageDecoder().transform(feats).toPandas()
    assert (got.width == 16).all() and (got.height == 12).all()
