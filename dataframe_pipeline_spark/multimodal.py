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


def decode_image(payload: bytes):
    """Real decoder hook — image libs are not in this container."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv; not available here — "
        "FakeImageDecoder provides the deterministic test double")


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
