"""Multimodal (image/audio/video) column plumbing.

Beyond-reference surface: media are opaque ``binary`` payload columns +
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.
Everything expressible with the stdlib is REAL, pure stdlib+numpy:

* image decode — uncompressed BMP, binary PPM, non-interlaced 8-bit
  PNG (zlib inflate + all five scanline filters);
* image resize — decode → nearest-neighbor resample → re-encode;
* audio decode — PCM WAV (``wave``) → channels/rate/duration/RMS.

Formats whose codecs genuinely need external libs (JPEG/GIF/WebP,
mp3/ogg, video — PIL/librosa/ffmpeg are NOT in this container) raise
``NotImplementedError``; the ``Fake*`` classes are their deterministic
doubles (``FakeFrameSampler`` models the ffmpeg row-expansion shape).
Everything Spark-side — schema contract, partitioning, Arrow batch
shape, UDF signature — is real and tested either way.

Scale design: payloads never pass through a Python row loop — they move
as Arrow record batches into ``mapInPandas``; per-batch vectorized
feature extraction; metadata-only queries (length/digest filters) stay
JVM-side so Catalyst can prune the binary column entirely when it isn't
referenced.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import spread

#: Output schema of the decode stage (what a real image decoder yields).
DECODE_SCHEMA = (
    "doc_id bigint, n_bytes long, digest string, "
    "width int, height int, mean_pixel double"
)


def with_payload_metadata(df: DataFrame, src_col: str = "text",
                          id_col: str = "doc_id") -> DataFrame:
    """Attach the binary payload + JVM-side metadata columns.

    In production the payload arrives from parquet/object storage as
    ``binary``; here it is synthesized by casting a string column so
    the downstream plumbing is exercised with real bytes.
    """
    payload = F.col(src_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.octet_length(payload).cast("long").alias("n_bytes"),
        F.substring(F.sha2(payload, 256), 1, 16).alias("digest"),
    )


def _decode_bmp(b: bytes):
    """Uncompressed (BI_RGB) 24/32-bit BMP → (H, W, 3) uint8 **RGB**
    array (storage is B,G,R — the channel axis is reversed on decode so
    every format this module decodes yields the same RGB convention;
    alpha and row padding stripped).

    Pure stdlib+numpy: header fields per the public BITMAPINFOHEADER
    layout; rows are 4-byte aligned, bottom-up (or top-down when height
    is negative)."""
    import numpy as np

    if len(b) < 54 or b[:2] != b"BM":
        raise NotImplementedError("not a BMP payload")
    off = int.from_bytes(b[10:14], "little")
    w = int.from_bytes(b[18:22], "little", signed=True)
    h = int.from_bytes(b[22:26], "little", signed=True)
    bpp = int.from_bytes(b[28:30], "little")
    comp = int.from_bytes(b[30:34], "little")
    if comp != 0 or bpp not in (24, 32) or w <= 0 or h == 0:
        raise NotImplementedError(
            f"only uncompressed 24/32-bit BMP supported (bpp={bpp}, "
            f"compression={comp})")
    height, bypp = abs(h), bpp // 8
    row = ((w * bypp + 3) // 4) * 4
    if off + row * height > len(b):
        raise ValueError("truncated BMP pixel array")
    px = np.frombuffer(b, dtype=np.uint8, count=row * height, offset=off)
    px = px.reshape(height, row)[:, :w * bypp].reshape(height, w, bypp)[..., :3]
    if h > 0:                           # bottom-up storage → top-down array
        px = px[::-1]
    return np.ascontiguousarray(px[..., ::-1])   # stored BGR → RGB


def _decode_ppm(b: bytes):
    """Binary PPM (P6) → (H, W, 3) uint8 RGB array.  Header tokens may
    be separated by any whitespace and '#' comments; exactly one
    whitespace byte separates maxval from the pixel array."""
    import numpy as np

    if b[:2] != b"P6":
        raise NotImplementedError("not a P6 PPM payload")
    toks, i = [], 2
    while len(toks) < 3:
        while i < len(b) and b[i:i + 1].isspace():
            i += 1
        if b[i:i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j:j + 1].isspace():
            j += 1
        toks.append(int(b[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, height, maxval = toks
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    n = w * height * 3
    if i + n > len(b):
        raise ValueError("truncated PPM pixel array")
    data = np.frombuffer(b, dtype=np.uint8, count=n, offset=i)
    return data.reshape(height, w, 3)


PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: color type → samples per pixel; which leading samples are color
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_PNG_COLOR_CH = {0: 1, 2: 3, 4: 1, 6: 3}   # alpha excluded from the mean


def _png_unfilter(raw, height: int, stride: int, bpp: int):
    """Reverse the per-scanline PNG filters (0 none, 1 sub, 2 up,
    3 average, 4 paeth).  none/up/sub are vectorized (sub is a cumsum
    per byte-phase); average/paeth are inherently sequential along the
    row — fine for a feature-extraction kernel, and the swap-in point
    for a PIL-backed decoder in a full container."""
    import numpy as np

    out = np.zeros((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ft = raw[y * (stride + 1)]
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride,
            offset=y * (stride + 1) + 1).astype(np.int32)
        if ft == 0:
            cur = row
        elif ft == 1:                        # sub: out[i] = raw[i]+out[i-bpp]
            cur = row.copy()
            for r in range(bpp):
                cur[r::bpp] = np.cumsum(cur[r::bpp]) % 256
        elif ft == 2:                        # up
            cur = (row + prev) % 256
        elif ft == 3:                        # average
            cur = row.copy()
            p = prev.astype(np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                cur[i] = (cur[i] + (a + p[i]) // 2) % 256
        elif ft == 4:                        # paeth
            cur = row.copy()
            p = prev.astype(np.int32)
            for i in range(stride):
                a = int(cur[i - bpp]) if i >= bpp else 0
                b_ = int(p[i])
                c = int(p[i - bpp]) if i >= bpp else 0
                pa, pb, pc = abs(b_ - c), abs(a - c), abs(a + b_ - 2 * c)
                pred = a if pa <= pb and pa <= pc else (b_ if pb <= pc else c)
                cur[i] = (cur[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {ft}")
        out[y] = cur.astype(np.uint8)
        prev = out[y]
    return out


def _decode_png(b: bytes):
    """Non-interlaced 8-bit PNG (gray / RGB / gray+alpha / RGBA) →
    (H, W, color_channels) uint8 array — pure stdlib (zlib) + numpy:
    walk the chunk stream, inflate the concatenated IDATs, reverse the
    scanline filters.  Alpha is stripped (color samples only, same
    convention as the BMP path).  Interlaced, paletted, or 16-bit PNGs
    raise NotImplementedError."""
    import zlib

    import numpy as np

    if b[:8] != PNG_SIG:
        raise NotImplementedError("not a PNG payload")
    i, w = 8, None
    idat = bytearray()
    while i + 8 <= len(b):
        ln = int.from_bytes(b[i:i + 4], "big")
        typ = b[i + 4:i + 8]
        data = b[i + 8:i + 8 + ln]
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            height = int.from_bytes(data[4:8], "big")
            depth, ctype, _comp, _filt, interlace = data[8:13]
            if depth != 8 or ctype not in _PNG_CHANNELS or interlace != 0:
                raise NotImplementedError(
                    f"only non-interlaced 8-bit gray/RGB(A) PNG supported "
                    f"(depth={depth}, color={ctype}, interlace={interlace})")
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        i += 12 + ln                      # len + type + data + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    ch = _PNG_CHANNELS[ctype]
    stride = w * ch
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:                 # corrupt deflate stream
        raise ValueError(f"corrupt PNG IDAT: {e}") from None
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    px = _png_unfilter(raw, height, stride, bpp=ch)
    return np.ascontiguousarray(
        px.reshape(height, w, ch)[..., :_PNG_COLOR_CH[ctype]])


def decode_image_array(payload: bytes):
    """Decode a container-decodable payload to its (H, W, C) uint8
    pixel array, **always RGB** (or single-channel gray) regardless of
    the container's storage order — uncompressed BMP (24/32-bit BI_RGB,
    stored BGR, reversed on decode), binary PPM (P6), non-interlaced
    8-bit PNG (gray/RGB; alpha stripped) — all pure stdlib+numpy.
    Formats whose codecs genuinely need external libs (JPEG/GIF/WebP/…)
    raise NotImplementedError; corrupt payloads of a recognized format
    raise ValueError (the ``on_error='null'`` stages catch exactly
    these two).  ``FakeImageDecoder`` remains the deterministic double
    for the stubbed formats."""
    b = bytes(payload)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:2] == b"P6":
        return _decode_ppm(b)
    if b[:8] == PNG_SIG:
        return _decode_png(b)
    if b[:2] == b"\xff\xd8":
        from .jpeg import decode_jpeg  # baseline sequential JFIF

        return decode_jpeg(b)
    if b[:6] in (b"GIF87a", b"GIF89a"):
        from .gif import decode_gif    # first frame, full LZW

        return decode_gif(b)
    raise NotImplementedError(
        "only BMP/PPM/PNG/baseline-JPEG/GIF decodable without PIL/opencv "
        "— FakeImageDecoder provides the deterministic test double")


def decode_image(payload: bytes):
    """(width, height, mean_pixel) features of a decodable payload —
    see :func:`decode_image_array` for the formats and conventions
    (mean is over color samples, alpha excluded)."""
    import numpy as np

    px = decode_image_array(payload)
    return px.shape[1], px.shape[0], float(
        np.asarray(px, dtype=np.float64).mean())


def encode_bmp(pixels) -> bytes:
    """Minimal 24-bit BI_RGB BMP writer (test fixture / synth-data
    generator): ``pixels`` is an (H, W, 3) uint8 RGB array; rows are
    written bottom-up, 4-byte padded, channels as BGR."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    height, w, _ = a.shape
    row = ((w * 3 + 3) // 4) * 4
    body = bytearray()
    for y in range(height - 1, -1, -1):
        line = a[y, :, ::-1].tobytes()          # RGB → BGR
        body += line + b"\0" * (row - len(line))
    off, size = 54, 54 + len(body)
    return (b"BM" + size.to_bytes(4, "little") + b"\0\0\0\0"
            + off.to_bytes(4, "little") + (40).to_bytes(4, "little")
            + w.to_bytes(4, "little", signed=True)
            + height.to_bytes(4, "little", signed=True)
            + (1).to_bytes(2, "little") + (24).to_bytes(2, "little")
            + (0).to_bytes(4, "little") + len(body).to_bytes(4, "little")
            + (2835).to_bytes(4, "little") * 2
            + (0).to_bytes(4, "little") * 2 + bytes(body))


def encode_png(pixels, filter_type: int = 0) -> bytes:
    """Minimal non-interlaced 8-bit PNG writer (test fixture): RGB
    (H, W, 3) or grayscale (H, W) uint8 array.  ``filter_type`` applies
    that forward scanline filter (0-4) to every row, so tests can
    exercise each unfilter path of the decoder."""
    import struct
    import zlib

    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    gray = a.ndim == 2
    height, w = a.shape[:2]
    ch = 1 if gray else a.shape[2]
    assert ch in (1, 3)
    flat = a.reshape(height, w * ch).astype(np.int32)
    bpp = ch
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(height):
        cur = flat[y]
        left = np.concatenate([np.zeros(bpp, dtype=np.int32), cur[:-bpp]])
        ul = np.concatenate([np.zeros(bpp, dtype=np.int32), prev[:-bpp]])
        if filter_type == 0:
            f = cur
        elif filter_type == 1:
            f = cur - left
        elif filter_type == 2:
            f = cur - prev
        elif filter_type == 3:
            f = cur - (left + prev) // 2
        elif filter_type == 4:
            pa = np.abs(prev - ul)
            pb = np.abs(left - ul)
            pc = np.abs(left + prev - 2 * ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            f = cur - pred
        else:
            raise ValueError(f"bad filter type {filter_type}")
        raw += bytes([filter_type]) + bytes((f % 256).astype(np.uint8))
        prev = cur

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + typ + data
                + struct.pack(">I", zlib.crc32(typ + data)))

    ihdr = struct.pack(">IIBBBBB", w, height, 8, 0 if gray else 2, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def encode_ppm(pixels) -> bytes:
    """Minimal binary PPM (P6) writer: (H, W, 3) uint8 RGB array."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    height, w, _ = a.shape
    return f"P6\n{w} {height}\n255\n".encode() + a.tobytes()


def resize_image(payload: bytes, width: int, height: int,
                 fmt: str = "png") -> bytes:
    """REAL resize for the decodable formats: decode → nearest-neighbor
    resample (pure numpy index arithmetic, deterministic) → re-encode
    as PNG (default) or PPM.  All decoded arrays are RGB (see
    :func:`decode_image_array`), so the re-encoded output is a correct
    RGB image for any input format.  Undecodable payloads raise like
    :func:`decode_image_array`; a PIL/opencv-backed kernel (bilinear,
    JPEG I/O) drops into the same signature in a full container."""
    import numpy as np

    px = decode_image_array(payload)
    ih, iw = px.shape[:2]
    yi = (np.arange(height) * ih) // height
    xi = (np.arange(width) * iw) // width
    out = px[yi][:, xi]
    if fmt == "png":
        return encode_png(out[..., 0] if out.shape[2] == 1 else out)
    if fmt == "ppm":
        if out.shape[2] == 1:
            out = np.repeat(out, 3, axis=2)
        return encode_ppm(out)
    raise ValueError(f"unknown target format {fmt!r}")


#: Output schema of the audio feature stage.
AUDIO_SCHEMA = ("doc_id bigint, n_channels int, sample_rate int, "
                "n_frames long, duration_s double, rms double")


def decode_audio(payload: bytes):
    """REAL audio decode for PCM WAV (the stdlib-decodable audio
    format, via ``wave``): returns (n_channels, sample_rate, n_frames,
    duration_s, rms) with rms over samples normalized to [-1, 1).
    Compressed audio (mp3/ogg/flac) needs external codecs →
    NotImplementedError; corrupt/truncated RIFF containers raise
    ValueError (so ``on_error='null'`` stages null them, not fail)."""
    import io
    import struct
    import wave

    import numpy as np

    b = bytes(payload)
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise NotImplementedError("not a RIFF/WAVE payload")
    try:
        with wave.open(io.BytesIO(b)) as wf:
            nch = wf.getnchannels()
            sw = wf.getsampwidth()
            sr = wf.getframerate()
            nf = wf.getnframes()
            raw = wf.readframes(nf)
    except wave.Error as e:                 # non-PCM encodings
        raise NotImplementedError(f"non-PCM WAV: {e}") from None
    except (EOFError, struct.error) as e:   # truncated/corrupt container
        raise ValueError(f"corrupt WAV: {e}") from None
    if sw == 1:                             # 8-bit WAV is unsigned
        x = (np.frombuffer(raw, np.uint8).astype(np.float64) - 128.0) / 128.0
    elif sw == 2:
        x = np.frombuffer(raw, "<i2").astype(np.float64) / 32768.0
    elif sw == 4:
        x = np.frombuffer(raw, "<i4").astype(np.float64) / 2147483648.0
    else:
        raise NotImplementedError(f"{sw * 8}-bit WAV unsupported")
    rms = float(np.sqrt((x * x).mean())) if x.size else 0.0
    return nch, sr, nf, (nf / sr if sr else 0.0), rms


def encode_wav(samples, sample_rate: int = 8000,
               n_channels: int = 1) -> bytes:
    """Minimal 16-bit PCM WAV writer (test fixture): ``samples`` is an
    int16 array, interleaved when ``n_channels`` > 1."""
    import io
    import wave

    import numpy as np

    a = np.asarray(samples, dtype="<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(n_channels)
        wf.setsampwidth(2)
        wf.setframerate(sample_rate)
        wf.writeframes(a.tobytes())
    return buf.getvalue()


class Resizer:
    """REAL batch image-resize stage for the decodable formats:
    decode → nearest-neighbor resample → re-encode, per Arrow batch
    (see :func:`resize_image`).  ``on_error='null'`` nulls undecodable
    rows — the robust bulk-ingest setting."""

    def __init__(self, width: int = 8, height: int = 8,
                 fmt: str = "png", id_col: str = "doc_id",
                 on_error: str = "raise"):
        assert on_error in ("raise", "null")
        self.width = width
        self.height = height
        self.fmt = fmt
        self.id_col = id_col
        self.on_error = on_error

    def transform(self, df: DataFrame) -> DataFrame:
        id_col, w, h = self.id_col, self.width, self.height
        fmt, on_error = self.fmt, self.on_error
        schema = f"{id_col} bigint, resized binary, out_bytes long"

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for b in pdf["payload"]:
                    try:
                        out.append(resize_image(bytes(b), w, h, fmt))
                    except (NotImplementedError, ValueError):
                        if on_error == "raise":
                            raise
                        out.append(None)
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "resized": out,
                    "out_bytes": [len(x) if x is not None else None
                                  for x in out],
                })

        cols = df if "payload" in df.columns else with_payload_metadata(
            df, id_col=id_col)
        # spread: the Python codec kernel is the whole cost; a few-split
        # file would serialize it on 1-2 cores (no-op at real scale)
        return spread(cols).mapInPandas(kernel, schema=schema)


class AudioFeatureExtractor:
    """REAL audio feature stage for PCM WAV payloads (see
    :func:`decode_audio`), Arrow-batched like the image stages."""

    def __init__(self, id_col: str = "doc_id", on_error: str = "raise"):
        assert on_error in ("raise", "null")
        self.id_col = id_col
        self.on_error = on_error

    def transform(self, df: DataFrame) -> DataFrame:
        id_col, on_error = self.id_col, self.on_error

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for b in pdf["payload"]:
                    try:
                        rows.append(decode_audio(bytes(b)))
                    except (NotImplementedError, ValueError):
                        if on_error == "raise":
                            raise
                        rows.append((None,) * 5)
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "n_channels": pd.array([r[0] for r in rows], dtype="Int32"),
                    "sample_rate": pd.array([r[1] for r in rows], dtype="Int32"),
                    "n_frames": pd.array([r[2] for r in rows], dtype="Int64"),
                    "duration_s": pd.array([r[3] for r in rows], dtype="Float64"),
                    "rms": pd.array([r[4] for r in rows], dtype="Float64"),
                })

        cols = df if "payload" in df.columns else with_payload_metadata(
            df, id_col=id_col)
        # spread: the Python codec kernel is the whole cost; a few-split
        # file would serialize it on 1-2 cores (no-op at real scale)
        return spread(cols).mapInPandas(kernel, schema=AUDIO_SCHEMA)


class FakeResizer:
    """Deterministic stand-in for a batch image-resize stage.

    Real implementation would decode → resample → re-encode per Arrow
    batch; the double truncates/pads the payload to ``w*h`` bytes so the
    output schema, batch shape, and size contract are exercised.
    """

    def __init__(self, width: int = 8, height: int = 8, id_col: str = "doc_id"):
        self.width = width
        self.height = height
        self.id_col = id_col

    def transform(self, df: DataFrame) -> DataFrame:
        id_col, n = self.id_col, self.width * self.height
        schema = f"{id_col} bigint, resized binary, out_bytes long"

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                resized = pdf["payload"].map(
                    lambda b: bytes(b[:n]).ljust(n, b"\0"))
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "resized": resized,
                    "out_bytes": resized.map(len),
                })

        cols = df if "payload" in df.columns else with_payload_metadata(df, id_col=id_col)
        # spread: the Python codec kernel is the whole cost; a few-split
        # file would serialize it on 1-2 cores (no-op at real scale)
        return spread(cols).mapInPandas(kernel, schema=schema)


class FakeFrameSampler:
    """Deterministic stand-in for video frame sampling: every ``stride``-th
    ``chunk``-byte slice of the payload becomes one output row (a
    'frame'), exploding 1 payload → N frames inside the Arrow batch —
    the exact row-expansion shape a real ffmpeg sampler produces.
    """

    def __init__(self, chunk: int = 16, stride: int = 4, id_col: str = "doc_id"):
        self.chunk = chunk
        self.stride = stride
        self.id_col = id_col

    def transform(self, df: DataFrame) -> DataFrame:
        id_col, chunk, stride = self.id_col, self.chunk, self.stride
        schema = f"{id_col} bigint, frame_no int, frame binary"

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, nos, frames = [], [], []
                for i, b in zip(pdf[id_col], pdf["payload"]):
                    bb = bytes(b)
                    n_chunks = max(1, len(bb) // chunk)
                    for fno in range(0, n_chunks, stride):
                        ids.append(i)
                        nos.append(fno)
                        frames.append(bb[fno * chunk:(fno + 1) * chunk])
                yield pd.DataFrame({id_col: ids, "frame_no": nos,
                                    "frame": frames})

        cols = df if "payload" in df.columns else with_payload_metadata(df, id_col=id_col)
        # spread: the Python codec kernel is the whole cost; a few-split
        # file would serialize it on 1-2 cores (no-op at real scale)
        return spread(cols).mapInPandas(kernel, schema=schema)


class VideoFrameSampler:
    """REAL video frame sampling for AVI/MJPEG **and animated GIF**
    payloads: every ``stride``-th frame becomes one output row — the
    same 1→N row-expansion contract as ``FakeFrameSampler``
    (``frame_no``, ``frame binary``), so downstream stages compose
    identically.  AVI frames are the container's JPEG bytes (avi.py);
    GIF frames are the fully COMPOSITED canvases (gif.py
    ``iter_gif_frames`` — transparency + disposal applied) re-encoded
    as lossless BMP.  Either way the emitted frames are real images an
    ``ImageDecoder`` (after renaming ``frame``→``payload``) decodes.

    ``on_error='null'`` yields a single NULL-frame row for payloads
    that are neither AVI nor GIF / are corrupt (robust bulk ingest);
    ``on_error='raise'`` propagates.
    """

    def __init__(self, stride: int = 1, max_frames: int | None = None,
                 id_col: str = "doc_id", on_error: str = "raise"):
        assert on_error in ("raise", "null")
        if stride < 1:
            raise ValueError("stride must be >= 1")
        self.stride = stride
        self.max_frames = max_frames
        self.id_col = id_col
        self.on_error = on_error

    def transform(self, df: DataFrame) -> DataFrame:
        from .avi import iter_mjpeg_frames
        from .gif import iter_gif_frames

        id_col, stride = self.id_col, self.stride
        max_frames, on_error = self.max_frames, self.on_error
        schema = f"{id_col} bigint, frame_no int, frame binary"

        def frame_bytes(b: bytes):
            """Per-frame encoded image bytes, lazily, by container."""
            if b[:6] in (b"GIF87a", b"GIF89a"):
                return (encode_bmp(fr) for fr in iter_gif_frames(b))
            return iter_mjpeg_frames(b)

        def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ids, nos, frames = [], [], []
                for i, b in zip(pdf[id_col], pdf["payload"]):
                    try:
                        taken = 0
                        for fno, jb in enumerate(frame_bytes(bytes(b))):
                            if fno % stride:
                                continue
                            ids.append(i)
                            nos.append(fno)
                            frames.append(jb)
                            taken += 1
                            if max_frames is not None and taken >= max_frames:
                                break
                    except (NotImplementedError, ValueError):
                        if on_error == "raise":
                            raise
                        ids.append(i)
                        nos.append(None)
                        frames.append(None)
                yield pd.DataFrame({
                    id_col: pd.array(ids, dtype="Int64"),
                    "frame_no": pd.array(nos, dtype="Int32"),
                    "frame": frames})

        cols = df if "payload" in df.columns else with_payload_metadata(df, id_col=id_col)
        # spread: the Python codec kernel is the whole cost; a few-split
        # file would serialize it on 1-2 cores (no-op at real scale)
        return spread(cols).mapInPandas(kernel, schema=schema)


class FakeImageDecoder:
    """Deterministic stand-in for an image decode + feature extraction
    stage: width/height from leading payload bytes, mean_pixel from a
    byte-sum — vectorized per Arrow batch, same signature a real
    decoder would have.
    """

    def __init__(self, id_col: str = "doc_id"):
        self.id_col = id_col

    def transform(self, df: DataFrame) -> DataFrame:
        id_col = self.id_col

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                raw = pdf["payload"]
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "n_bytes": pdf["n_bytes"],
                    "digest": pdf["digest"],
                    "width": raw.map(lambda b: 1 + b[0] % 64).astype("int32"),
                    "height": raw.map(lambda b: 1 + b[-1] % 64).astype("int32"),
                    "mean_pixel": raw.map(lambda b: sum(b) / len(b)),
                })

        cols = with_payload_metadata(df, id_col=id_col) if "payload" not in df.columns else df
        # spread: the Python codec kernel is the whole cost; a few-split
        # file would serialize it on 1-2 cores (no-op at real scale)
        return spread(cols).mapInPandas(decode, schema=DECODE_SCHEMA)


class ImageDecoder:
    """REAL image decode + feature extraction over Arrow batches for the
    formats decodable without external libs (uncompressed BMP, binary
    PPM, non-interlaced 8-bit PNG — see :func:`decode_image`).  Same
    schema/partitioning/batch
    shape as ``FakeImageDecoder``, so swapping a PIL-backed kernel in a
    full container is a one-function change.

    ``on_error='raise'`` propagates undecodable payloads;
    ``on_error='null'`` yields NULL width/height/mean for them (the
    robust bulk-ingest setting).

    ``keep`` lists extra input columns to carry through unchanged (e.g.
    ``frame_no`` when decoding ``VideoFrameSampler`` output) — the
    Arrow batch already holds them, so passthrough is free.
    """

    def __init__(self, id_col: str = "doc_id", on_error: str = "raise",
                 keep: list[str] | None = None):
        assert on_error in ("raise", "null")
        self.id_col = id_col
        self.on_error = on_error
        self.keep = list(keep or [])

    def transform(self, df: DataFrame) -> DataFrame:
        id_col, on_error, keep = self.id_col, self.on_error, self.keep

        def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                ws, hs, ms = [], [], []
                for b in pdf["payload"]:
                    try:
                        w, h, m = decode_image(bytes(b))
                    except (NotImplementedError, ValueError):
                        if on_error == "raise":
                            raise
                        w = h = m = None
                    ws.append(w)
                    hs.append(h)
                    ms.append(m)
                out = {id_col: pdf[id_col]}
                for k in keep:
                    out[k] = pdf[k]
                out.update({
                    "n_bytes": pdf["n_bytes"],
                    "digest": pdf["digest"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "mean_pixel": pd.array(ms, dtype="Float64"),
                })
                yield pd.DataFrame(out)

        cols = with_payload_metadata(df, id_col=id_col) if "payload" not in df.columns else df
        kept = ", ".join(
            f"{n} {cols.schema[n].dataType.simpleString()}"
            for n in self.keep)
        schema = DECODE_SCHEMA if not kept else (
            f"{self.id_col} bigint, {kept}, n_bytes bigint, digest string, "
            "width int, height int, mean_pixel double")
        # spread: the Python codec kernel is the whole cost; a few-split
        # file would serialize it on 1-2 cores (no-op at real scale)
        return spread(cols).mapInPandas(decode, schema=schema)
