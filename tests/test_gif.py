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
