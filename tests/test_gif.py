"""gif.py: LZW GIF codec — LOSSLESS round-trips without PIL (the
encoder emits literal-only LZW with decoder-synchronized code widths,
so equality is exact, unlike JPEG's quantization tolerance)."""

import numpy as np
import pytest

from dataframe_pipeline_spark.gif import decode_gif, encode_gif


def test_roundtrip_small_palette_lossless():
    rng = np.random.RandomState(1)
    pal = rng.randint(0, 256, (7, 3), dtype=np.uint8)
    img = pal[rng.randint(0, 7, (33, 47))]
    b = encode_gif(img)
    assert b[:6] == b"GIF89a" and b[-1:] == b"\x3b"
    assert np.array_equal(decode_gif(b), img)


def test_roundtrip_256_colors_lossless():
    rng = np.random.RandomState(2)
    pal = np.array([[i, (i * 7) % 256, (i * 13) % 256]
                    for i in range(256)], dtype=np.uint8)
    img = pal[rng.randint(0, 256, (90, 120))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_forces_midstream_clear():
    """300x300 = 90k pixel codes > the 4096-entry dictionary: the
    encoder must emit CLEAR resets and stay width-synchronized."""
    rng = np.random.RandomState(3)
    pal = np.array([[i, 255 - i, (i * 3) % 256]
                    for i in range(256)], dtype=np.uint8)
    img = pal[rng.randint(0, 256, (300, 300))]
    assert np.array_equal(decode_gif(encode_gif(img)), img)


def test_roundtrip_grayscale_and_two_color():
    g = (np.arange(64).reshape(8, 8) * 4).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(g)),
                          np.stack([g] * 3, axis=-1))
    rng = np.random.RandomState(4)
    bw = np.where(rng.rand(20, 20) > .5, 255, 0).astype(np.uint8)
    assert np.array_equal(decode_gif(encode_gif(bw)),
                          np.stack([bw] * 3, axis=-1))


def test_too_many_colors_rejected():
    rng = np.random.RandomState(5)
    with pytest.raises(ValueError, match="256"):
        encode_gif(rng.randint(0, 256, (40, 40, 3), dtype=np.uint8))


def test_error_contract():
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a")                     # truncated header
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a" + b"\x00" * 20)      # no image data
    with pytest.raises(ValueError):
        decode_gif(b"GIF89a corrupt stream!!")    # garbage body
    with pytest.raises(NotImplementedError):
        decode_gif(b"notgif")


def test_multimodal_dispatch_decodes_gif():
    from dataframe_pipeline_spark import multimodal as mm

    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    rng = np.random.RandomState(6)
    img = pal[rng.randint(0, 3, (12, 18))]
    w, h, mean = mm.decode_image(encode_gif(img))
    assert (w, h) == (18, 12)
    assert mean == pytest.approx(float(img.mean()))


def test_interlaced_gif_decodes():
    """Hand-build an interlaced GIF: encode the image with its rows
    pre-permuted into GIF pass order, then flip the interlace flag in
    the image descriptor — the decoder must de-interlace it back."""
    rng = np.random.RandomState(7)
    pal = np.array([[0, 0, 0], [80, 160, 240], [255, 128, 0],
                    [10, 200, 90]], dtype=np.uint8)
    h, w = 13, 9                         # odd height exercises pass math
    img = pal[rng.randint(0, 4, (h, w))]
    passes = [list(range(0, h, 8)), list(range(4, h, 8)),
              list(range(2, h, 4)), list(range(1, h, 2))]
    order = [r for p in passes for r in p]
    b = bytearray(encode_gif(img[order]))
    # image descriptor: header(13) + GCT(3 * 2^bits) + 0x2C + 8 bytes,
    # packed byte follows; set its interlace bit (0x40)
    gct_bytes = 3 * (2 << (b[10] & 0x7))
    packed_at = 13 + gct_bytes + 9
    assert b[13 + gct_bytes] == 0x2C
    b[packed_at] |= 0x40
    out = decode_gif(bytes(b))
    assert np.array_equal(out, img)


def test_animated_roundtrip_lossless():
    """encode_gif_animated -> iter_gif_frames yields every frame
    exactly (disposal=1, full-canvas frames, shared global palette)."""
    from dataframe_pipeline_spark.gif import (encode_gif_animated,
                                              iter_gif_frames)

    rng = np.random.RandomState(6)
    pal = rng.randint(0, 256, (5, 3), dtype=np.uint8)
    frames = [pal[rng.randint(0, 5, (11, 13))] for _ in range(4)]
    b = encode_gif_animated(frames, delay_cs=7)
    assert b[:6] == b"GIF89a" and b"NETSCAPE2.0" in b
    got = list(iter_gif_frames(b))
    assert len(got) == 4
    for want, have in zip(frames, got):
        assert np.array_equal(want, have)
    # decode_gif still returns the FIRST frame of an animation
    assert np.array_equal(decode_gif(b), frames[0])
    with pytest.raises(ValueError, match="at least one frame"):
        encode_gif_animated([])
    with pytest.raises(ValueError, match="one shape"):
        encode_gif_animated([frames[0], frames[0][:5]])


def _gce(disposal, tidx=None):
    packed = (disposal << 2) | (1 if tidx is not None else 0)
    return (b"\x21\xf9\x04" + bytes([packed]) + b"\x00\x00"
            + bytes([tidx or 0]) + b"\x00")


def _img(indices, left=0, top=0, w=2, h=2):
    import struct

    from dataframe_pipeline_spark.gif import _lzw_literal_blocks

    return (b"\x2c" + struct.pack("<HHHH", left, top, w, h) + b"\x00"
            + bytes([2]) + _lzw_literal_blocks(np.array(indices), 2))


_HDR22 = (b"GIF89a" + b"\x02\x00\x02\x00" + bytes([0x81, 3, 0])
          + bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 255, 255, 255]))


def test_disposal_restore_previous_and_transparency():
    """disposal=3 restores the pre-frame canvas; transparent pixels
    composite (leave the canvas) rather than painting palette color."""
    from dataframe_pipeline_spark.gif import iter_gif_frames

    b = (_HDR22
         + _gce(1) + _img([0, 0, 0, 0])                 # all red
         + _gce(3) + _img([1], 0, 0, 1, 1)              # green top-left
         + _gce(0, tidx=3) + _img([3, 3, 3, 2])         # blue bottom-right
         + b"\x3b")
    f = list(iter_gif_frames(b))
    assert len(f) == 3
    assert (f[0] == [255, 0, 0]).all()
    assert tuple(f[1][0, 0]) == (0, 255, 0)
    assert tuple(f[1][1, 1]) == (255, 0, 0)
    # frame 2: disposal=3 reverted the green; transparency shows red
    assert tuple(f[2][0, 0]) == (255, 0, 0)
    assert tuple(f[2][1, 1]) == (0, 0, 255)


def test_disposal_restore_background():
    """disposal=2 clears the frame's region to the background color
    before the next frame composites."""
    from dataframe_pipeline_spark.gif import iter_gif_frames

    b = (_HDR22
         + _gce(2) + _img([0, 0, 0, 0])                 # red, then wiped
         + _gce(0, tidx=3) + _img([3, 3, 3, 1])         # green br only
         + b"\x3b")
    f = list(iter_gif_frames(b))
    assert tuple(f[1][0, 0]) == (255, 255, 255)   # background (idx 3)
    assert tuple(f[1][1, 1]) == (0, 255, 0)


def test_video_frame_sampler_dispatches_gif(spark):
    """VideoFrameSampler samples animated-GIF frames through the same
    1->N contract as AVI — frames re-emitted as lossless BMP that
    ImageDecoder round-trips exactly."""
    import pandas as pd

    import dataframe_pipeline_spark.multimodal as mm
    from dataframe_pipeline_spark.gif import encode_gif_animated

    rng = np.random.RandomState(9)
    frames = [rng.randint(0, 4, (5, 6), dtype=np.uint8) * 80
              for _ in range(5)]
    gif = encode_gif_animated(frames)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "payload": [gif]}))
    out = mm.VideoFrameSampler(stride=2).transform(df).toPandas()
    assert list(out["frame_no"]) == [0, 2, 4]
    dec = mm.ImageDecoder(keep=["frame_no"]).transform(
        mm.VideoFrameSampler(stride=2, max_frames=2).transform(df)
        .withColumnRenamed("frame", "payload")
        .selectExpr("doc_id", "frame_no", "payload",
                    "CAST(octet_length(payload) AS LONG) AS n_bytes",
                    "md5(payload) AS digest")).toPandas()
    assert list(dec["frame_no"]) == [0, 2]
    for fno, mean in zip(dec["frame_no"], dec["mean_pixel"]):
        gray = np.stack([frames[fno]] * 3, -1)
        assert mean == pytest.approx(gray.mean(), abs=1e-9)
    # non-video payload: null row under on_error='null'
    bad = spark.createDataFrame(
        pd.DataFrame({"doc_id": [7], "payload": [b"not a video"]}))
    nul = (mm.VideoFrameSampler(on_error="null").transform(bad)
           .collect())
    assert len(nul) == 1 and nul[0]["frame"] is None
