"""Multimodal plumbing: binary payload metadata + Arrow-batched decode."""

import hashlib

import pytest

from dataframe_pipeline_spark import multimodal as mm


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(0, "hello world"), (1, "abc")], "doc_id long, text string")


def test_payload_metadata(docs):
    out = {r.doc_id: r for r in mm.with_payload_metadata(docs).collect()}
    assert bytes(out[0].payload) == b"hello world"
    assert out[0].n_bytes == 11
    assert out[0].digest == hashlib.sha256(b"hello world").hexdigest()[:16]


def test_fake_decoder_schema_and_values(docs):
    out = mm.FakeImageDecoder().transform(docs)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_bytes", "digest", "width", "height", "mean_pixel"]
    r = {x.doc_id: x for x in out.collect()}
    assert r[1].width == 1 + ord("a") % 64
    assert r[1].height == 1 + ord("c") % 64
    assert r[1].mean_pixel == pytest.approx(sum(b"abc") / 3)


def test_decode_image_rejects_lib_dependent_formats():
    # JPEG and GIF are REAL codecs since r5 (jpeg.py, gif.py): truncated
    # streams are corrupt recognized formats (ValueError); WebP remains
    # the honest capability gap (NotImplementedError)
    with pytest.raises(ValueError):
        mm.decode_image(b"\xff\xd8\xff\xe0jpeg-truncated-stream")
    with pytest.raises(ValueError):
        mm.decode_image(b"GIF89a" + b"\x00" * 16)
    with pytest.raises(NotImplementedError):
        mm.decode_image(b"RIFF....WEBP needs a real codec")


def test_fake_resizer_shape(spark):
    from dataframe_pipeline_spark import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "hello world this is long"), (1, "x")], "doc_id long, text string")
    out = mm.FakeResizer(width=4, height=2).transform(docs).collect()
    by_id = {r.doc_id: r for r in out}
    assert all(r.out_bytes == 8 for r in out)
    assert bytes(by_id[0].resized) == b"hello wo"
    assert bytes(by_id[1].resized) == b"x" + b"\0" * 7


def test_fake_frame_sampler_explodes(spark):
    from dataframe_pipeline_spark import multimodal as mm

    docs = spark.createDataFrame(
        [(0, "a" * 64)], "doc_id long, text string")   # 64 bytes / 16 = 4 chunks
    out = mm.FakeFrameSampler(chunk=16, stride=2).transform(docs).collect()
    assert [(r.frame_no, len(bytes(r.frame))) for r in out] == [(0, 16), (2, 16)]


def test_decode_stubs_raise():
    import pytest as _pytest
    from dataframe_pipeline_spark import multimodal as mm

    with _pytest.raises(NotImplementedError):
        mm.decode_image(b"\x00")
    with _pytest.raises(NotImplementedError):
        mm.resize_image(b"\x00", 2, 2)


def test_bmp_roundtrip_decode():
    """Generated 24-bit BMP decodes to exact width/height/mean."""
    import numpy as np
    from dataframe_pipeline_spark.multimodal import decode_image, encode_bmp

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8)  # odd W: padding
    w, h, mean = decode_image(encode_bmp(img))
    assert (w, h) == (7, 5)
    assert mean == float(img.mean())


def test_ppm_roundtrip_decode():
    import numpy as np
    from dataframe_pipeline_spark.multimodal import decode_image, encode_ppm

    img = np.arange(4 * 3 * 3, dtype=np.uint8).reshape(4, 3, 3)
    w, h, mean = decode_image(encode_ppm(img))
    assert (w, h) == (3, 4)
    assert mean == float(img.mean())


def test_decode_image_rejects_unknown_and_corrupt():
    import pytest as pt
    from dataframe_pipeline_spark.multimodal import decode_image

    with pt.raises(NotImplementedError):       # unknown magic
        decode_image(b"WEBP needs a real codec")
    with pt.raises(ValueError):                # GIF magic, corrupt stream
        decode_image(b"GIF89a corrupt stream")
    with pt.raises(ValueError):                # PNG sig but no chunks
        decode_image(b"\x89PNG\r\n\x1a\nrest")


def test_png_roundtrip_all_filters():
    """The PNG decoder reverses every scanline filter type: the same
    pixel array encoded with filters 0-4 decodes to the same exact
    width/height/mean (gray and RGB)."""
    import numpy as np
    from dataframe_pipeline_spark.multimodal import decode_image, encode_png

    rng = np.random.RandomState(11)
    rgb = rng.randint(0, 256, size=(6, 5, 3), dtype=np.uint8)
    gray = rng.randint(0, 256, size=(4, 9), dtype=np.uint8)
    for ft in range(5):
        w, h, mean = decode_image(encode_png(rgb, filter_type=ft))
        assert (w, h) == (5, 6), f"filter {ft}"
        assert mean == float(rgb.mean()), f"filter {ft}"
        w, h, mean = decode_image(encode_png(gray, filter_type=ft))
        assert (w, h) == (9, 4), f"filter {ft}"
        assert mean == float(gray.mean()), f"filter {ft}"


def test_png_16bit_rejected():
    import struct
    import zlib

    import pytest as pt
    from dataframe_pipeline_spark.multimodal import PNG_SIG, decode_image

    ihdr = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)  # 16-bit depth
    chunk = (struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr
             + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr)))
    with pt.raises(NotImplementedError):
        decode_image(PNG_SIG + chunk)


def test_real_image_decoder_stage(spark):
    """ImageDecoder decodes real BMP payloads distributed via
    mapInPandas; on_error='null' nulls out undecodable rows."""
    import numpy as np
    from pyspark.sql import functions as F
    from dataframe_pipeline_spark import multimodal as mm

    imgs = {i: np.full((2 + i, 3, 3), i * 10, dtype=np.uint8)
            for i in range(3)}
    rows = [(i, bytearray(mm.encode_bmp(img))) for i, img in imgs.items()]
    rows.append((99, bytearray(b"not-an-image")))
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    df = df.select(
        "doc_id", "payload",
        F.octet_length("payload").cast("long").alias("n_bytes"),
        F.substring(F.sha2("payload", 256), 1, 16).alias("digest"))

    out = {r.doc_id: r for r in
           mm.ImageDecoder(on_error="null").transform(df).collect()}
    for i, img in imgs.items():
        assert (out[i].width, out[i].height) == (3, 2 + i)
        assert out[i].mean_pixel == float(img.mean())
    assert out[99].width is None and out[99].mean_pixel is None

    import pytest as pt
    with pt.raises(Exception):
        mm.ImageDecoder(on_error="raise").transform(df).collect()


def test_png_rgba_mean_excludes_alpha():
    """Hand-built RGBA (color type 6) PNG: the mean covers RGB samples
    only, alpha is excluded (same convention as 32-bit BMP)."""
    import struct
    import zlib

    import numpy as np
    from dataframe_pipeline_spark.multimodal import PNG_SIG, decode_image

    rgba = np.array([[[10, 20, 30, 255], [40, 50, 60, 0]],
                     [[70, 80, 90, 128], [100, 110, 120, 7]]], dtype=np.uint8)
    h, w = rgba.shape[:2]
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(h))

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    png = (PNG_SIG
           + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 6, 0, 0, 0))
           + chunk(b"IDAT", zlib.compress(raw))
           + chunk(b"IEND", b""))
    gw, gh, mean = decode_image(png)
    assert (gw, gh) == (w, h)
    assert mean == float(rgba[..., :3].mean())


def test_resize_image_real():
    """Nearest-neighbor resize: exact pixel selection, round-trips
    through the PNG codec, works for every decodable input format."""
    import numpy as np
    from dataframe_pipeline_spark.multimodal import (
        decode_image_array, encode_bmp, encode_png, encode_ppm,
        resize_image)

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(8, 6, 3), dtype=np.uint8)
    # expected nearest-neighbor index math
    yi = (np.arange(4) * 8) // 4
    xi = (np.arange(3) * 6) // 3
    exp = img[yi][:, xi]

    out = decode_image_array(resize_image(encode_png(img), 3, 4))
    assert out.shape == (4, 3, 3)
    assert (out == exp).all()
    # PPM input → PPM output path
    out2 = decode_image_array(resize_image(encode_ppm(img), 3, 4, fmt="ppm"))
    assert (out2 == exp).all()
    # BMP storage is BGR but decode normalizes to RGB, so a BMP input
    # resizes to the same RGB output as the PNG/PPM paths
    out3 = decode_image_array(resize_image(encode_bmp(img), 3, 4))
    assert (out3 == exp).all()
    # upscale: every output pixel still an exact source pixel
    up = decode_image_array(resize_image(encode_png(img), 12, 16))
    assert up.shape == (16, 12, 3)
    assert set(np.unique(up)) <= set(np.unique(img))


def test_resizer_stage(spark):
    import numpy as np
    from pyspark.sql import functions as F
    from dataframe_pipeline_spark import multimodal as mm

    img = np.arange(5 * 4 * 3, dtype=np.uint8).reshape(5, 4, 3)
    rows = [(0, bytearray(mm.encode_png(img))),
            (1, bytearray(b"not-an-image"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    df = df.withColumn("n_bytes", F.octet_length("payload").cast("long"))
    out = {r.doc_id: r for r in
           mm.Resizer(width=2, height=2, on_error="null")
           .transform(df).collect()}
    dec = mm.decode_image_array(bytes(out[0].resized))
    assert dec.shape == (2, 2, 3)
    assert out[0].out_bytes == len(bytes(out[0].resized))
    assert out[1].resized is None and out[1].out_bytes is None


def test_wav_roundtrip_decode():
    import numpy as np
    from dataframe_pipeline_spark.multimodal import decode_audio, encode_wav

    t = np.arange(8000, dtype=np.float64) / 8000.0
    sine = (np.sin(2 * np.pi * 440 * t) * 16384).astype(np.int16)
    nch, sr, nf, dur, rms = decode_audio(encode_wav(sine, sample_rate=8000))
    assert (nch, sr, nf) == (1, 8000, 8000)
    assert dur == 1.0
    # rms of a full-period sine at half amplitude ≈ 0.5/sqrt(2)
    assert abs(rms - 0.5 / np.sqrt(2)) < 1e-3
    # stereo: frames = samples / channels
    stereo = np.stack([sine, sine], axis=1).reshape(-1)
    nch, sr, nf, dur, _ = decode_audio(
        encode_wav(stereo, sample_rate=8000, n_channels=2))
    assert (nch, nf, dur) == (2, 8000, 1.0)


def test_audio_stage_and_rejects(spark):
    import numpy as np
    import pytest as pt
    from pyspark.sql import functions as F
    from dataframe_pipeline_spark import multimodal as mm

    with pt.raises(NotImplementedError):
        mm.decode_audio(b"ID3\x03mp3-needs-a-real-codec")

    sine = (np.sin(np.arange(800) / 10.0) * 1000).astype(np.int16)
    rows = [(0, bytearray(mm.encode_wav(sine, sample_rate=4000))),
            (1, bytearray(b"not-audio"))]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    df = df.withColumn("n_bytes", F.octet_length("payload").cast("long"))
    out = {r.doc_id: r for r in
           mm.AudioFeatureExtractor(on_error="null").transform(df).collect()}
    assert out[0].sample_rate == 4000 and out[0].n_frames == 800
    assert out[0].duration_s == 0.2
    assert out[1].rms is None and out[1].n_channels is None


def test_bmp_topdown_negative_height():
    """BMPs with negative height store rows top-down — the decoder must
    not flip them (hand-built header, same pixel payload)."""
    import numpy as np
    from dataframe_pipeline_spark.multimodal import (
        decode_image_array, encode_bmp)

    img = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    b = bytearray(encode_bmp(img))
    # encode_bmp wrote bottom-up rows with height=+2; flip the sign and
    # the row order to express the same image top-down
    h = -2
    b[22:26] = h.to_bytes(4, "little", signed=True)
    row = ((2 * 3 + 3) // 4) * 4
    body = bytes(b[54:])
    b[54:] = body[row:] + body[:row]        # swap the two rows
    out = decode_image_array(bytes(b))
    assert (out == img).all()


def test_corrupt_payloads_raise_value_error():
    """Corrupt payloads of a *recognized* format raise ValueError — the
    exact class the on_error='null' stages catch — never a codec
    internal (zlib.error / EOFError / struct.error)."""
    import struct
    import zlib

    import numpy as np
    import pytest as pt
    from dataframe_pipeline_spark.multimodal import (
        PNG_SIG, decode_audio, decode_image, encode_wav)

    # PNG with a garbage (non-deflate) IDAT → zlib.error internally
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    bad_png = (PNG_SIG + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", b"\xff\xfe\x00garbage")
               + chunk(b"IEND", b""))
    with pt.raises(ValueError):
        decode_image(bad_png)

    # WAV truncated mid-header → EOFError/struct.error internally
    wav = encode_wav(np.zeros(64, dtype=np.int16))
    with pt.raises(ValueError):
        decode_audio(wav[:20])


def test_null_stages_survive_corrupt_recognized_payloads(spark):
    """on_error='null' must null corrupt-but-recognized payloads (the
    bulk-ingest contract), not fail the job."""
    import struct
    import zlib

    import numpy as np
    from pyspark.sql import functions as F
    from dataframe_pipeline_spark import multimodal as mm

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)

    def chunk(typ, data):
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    bad_png = (mm.PNG_SIG + chunk(b"IHDR", ihdr)
               + chunk(b"IDAT", b"\xff\xfe\x00garbage")
               + chunk(b"IEND", b""))
    good = mm.encode_png(np.arange(12, dtype=np.uint8).reshape(2, 2, 3))
    df = spark.createDataFrame(
        [(0, bytearray(good)), (1, bytearray(bad_png))],
        "doc_id long, payload binary").withColumn(
            "n_bytes", F.octet_length("payload").cast("long"))
    out = {r.doc_id: r for r in
           mm.Resizer(width=2, height=2, on_error="null")
           .transform(df).collect()}
    assert out[0].resized is not None
    assert out[1].resized is None

    wav = mm.encode_wav(np.zeros(64, dtype=np.int16))
    dfa = spark.createDataFrame(
        [(0, bytearray(wav)), (1, bytearray(wav[:20]))],
        "doc_id long, payload binary").withColumn(
            "n_bytes", F.octet_length("payload").cast("long"))
    outa = {r.doc_id: r for r in
            mm.AudioFeatureExtractor(on_error="null")
            .transform(dfa).collect()}
    assert outa[0].n_frames == 64
    assert outa[1].n_frames is None


def test_decode_dispatch_order():
    """Pins the magic-byte dispatch contract documented in MULTIMODAL.md:
    BM -> BMP, P6 -> PPM, PNG signature -> PNG, else NotImplementedError
    — so a PIL-backed extension slots in at a known position."""
    import inspect

    import numpy as np
    import pytest as pt
    from dataframe_pipeline_spark import multimodal as mm

    # behavior: each prefix routes to its decoder (distinguishable by
    # the format-specific rejection message on a truncated payload)
    with pt.raises(ValueError, match="BMP"):
        mm.decode_image_array(mm.encode_bmp(
            np.zeros((2, 2, 3), np.uint8))[:56])
    with pt.raises(ValueError, match="PPM"):
        mm.decode_image_array(b"P6\n4 4\n255\nxx")
    with pt.raises(ValueError, match="PNG"):
        mm.decode_image_array(mm.PNG_SIG + b"trailing-garbage")
    with pt.raises(ValueError, match="JPEG"):
        mm.decode_image_array(b"\xff\xd8\xff\xe0 jpeg")   # corrupt, real codec
    with pt.raises(ValueError, match="GIF"):
        mm.decode_image_array(b"GIF89a")                  # corrupt, real codec
    with pt.raises(NotImplementedError):
        mm.decode_image_array(b"RIFF0000WEBP")

    # order: the source checks BM before P6 before the PNG signature
    src = inspect.getsource(mm.decode_image_array)
    assert (src.index('b"BM"') < src.index('b"P6"')
            < src.index("PNG_SIG"))
