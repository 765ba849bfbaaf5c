"""Multimodal (image/audio/video) column plumbing.

Beyond-reference surface: media are opaque ``binary`` payload columns +
typed metadata, processed by Arrow-batched ``mapInPandas`` stages.  The
actual codec work (PIL/librosa/ffmpeg) is NOT available in this
container, so the decode kernel is stubbed — ``FakeImageDecoder``
derives deterministic pseudo-features from the payload bytes, and
``decode_image`` raises ``NotImplementedError`` where a real decoder
would plug in.  Everything Spark-side — schema contract, partitioning,
Arrow batch shape, UDF signature — is real and tested.

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
    """Uncompressed (BI_RGB) 24/32-bit BMP → (width, height, mean_pixel).

    Pure stdlib+numpy: header fields per the public BITMAPINFOHEADER
    layout; rows are 4-byte aligned, bottom-up (or top-down when height
    is negative); mean is over the B,G,R channel bytes (alpha and row
    padding excluded)."""
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
    return w, height, float(px.mean())


def _decode_ppm(b: bytes):
    """Binary PPM (P6) → (width, height, mean_pixel).  Header tokens may
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
    return w, height, float(data.mean())


def decode_image(payload: bytes):
    """Real decode for the container-decodable formats — uncompressed
    BMP (24/32-bit BI_RGB) and binary PPM (P6), both pure
    stdlib+numpy.  Returns (width, height, mean_pixel).  Compressed
    formats (JPEG/PNG/...) need PIL/opencv, which this container lacks
    → NotImplementedError; ``FakeImageDecoder`` remains the
    deterministic double for those."""
    b = bytes(payload)
    if b[:2] == b"BM":
        return _decode_bmp(b)
    if b[:2] == b"P6":
        return _decode_ppm(b)
    raise NotImplementedError(
        "only uncompressed BMP/PPM decodable without PIL/opencv — "
        "FakeImageDecoder provides the deterministic test double")


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


def encode_ppm(pixels) -> bytes:
    """Minimal binary PPM (P6) writer: (H, W, 3) uint8 RGB array."""
    import numpy as np

    a = np.asarray(pixels, dtype=np.uint8)
    height, w, _ = a.shape
    return f"P6\n{w} {height}\n255\n".encode() + a.tobytes()


def resize_image(payload: bytes, width: int, height: int):
    """Real resize hook — image libs are not in this container."""
    raise NotImplementedError(
        "image resize requires PIL/opencv; not available here — "
        "FakeResizer provides the deterministic test double")


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
        return cols.mapInPandas(kernel, schema=schema)


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
        return cols.mapInPandas(kernel, schema=schema)


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
        return cols.mapInPandas(decode, schema=DECODE_SCHEMA)


class ImageDecoder:
    """REAL image decode + feature extraction over Arrow batches for the
    formats decodable without external libs (uncompressed BMP, binary
    PPM — see :func:`decode_image`).  Same schema/partitioning/batch
    shape as ``FakeImageDecoder``, so swapping a PIL-backed kernel in a
    full container is a one-function change.

    ``on_error='raise'`` propagates undecodable payloads;
    ``on_error='null'`` yields NULL width/height/mean for them (the
    robust bulk-ingest setting).
    """

    def __init__(self, id_col: str = "doc_id", on_error: str = "raise"):
        assert on_error in ("raise", "null")
        self.id_col = id_col
        self.on_error = on_error

    def transform(self, df: DataFrame) -> DataFrame:
        id_col, on_error = self.id_col, self.on_error

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
                yield pd.DataFrame({
                    id_col: pdf[id_col],
                    "n_bytes": pdf["n_bytes"],
                    "digest": pdf["digest"],
                    "width": pd.array(ws, dtype="Int32"),
                    "height": pd.array(hs, dtype="Int32"),
                    "mean_pixel": pd.array(ms, dtype="Float64"),
                })

        cols = with_payload_metadata(df, id_col=id_col) if "payload" not in df.columns else df
        return cols.mapInPandas(decode, schema=DECODE_SCHEMA)
