"""AVI/MJPEG container codec — pure stdlib, no ffmpeg.

Makes video frame sampling REAL for the one video format decodable
without external libraries: Motion-JPEG in an AVI (RIFF) container,
where every frame is a standalone baseline JPEG that ``jpeg.py``
decodes.  ``iter_mjpeg_frames`` walks the RIFF chunk tree to the
``movi`` list and yields each video chunk's JPEG bytes;
``encode_avi_mjpeg`` writes a standard single-stream MJPEG AVI
(valid ``avih``/``strh``/``strf`` headers + ``movi`` + ``idx1``) so
the parse path is round-trip verifiable in this container — and the
output plays in any player.

Non-AVI payloads raise NotImplementedError; corrupt RIFF structure
raises ValueError (the multimodal on_error contract).  Compressed
codecs other than MJPEG raise NotImplementedError at frame-decode
time (the sampler yields raw chunk bytes; ``jpeg.decode_jpeg`` is the
per-frame gate).
"""

from __future__ import annotations

import struct
from collections.abc import Iterator


def iter_mjpeg_frames(b: bytes) -> Iterator[bytes]:
    """Yield the video-frame payloads (``##dc`` / ``##db`` chunks) of
    an AVI's ``movi`` list, in stream order."""
    if b[:4] != b"RIFF" or b[8:12] != b"AVI ":
        raise NotImplementedError("not an AVI payload")
    try:
        yield from _walk_movi(b)
    except (struct.error, IndexError) as e:
        raise ValueError(f"corrupt AVI stream: {e}") from None


def _walk_movi(b: bytes) -> Iterator[bytes]:
    i, end = 12, min(len(b), 8 + struct.unpack("<I", b[4:8])[0])
    found = False
    while i + 8 <= end:
        fcc = b[i:i + 4]
        size = struct.unpack("<I", b[i + 4:i + 8])[0]
        if i + 8 + size > len(b):
            raise ValueError("AVI chunk overruns payload")
        if fcc == b"LIST" and b[i + 8:i + 12] == b"movi":
            found = True
            j = i + 12
            chunk_end = i + 8 + size
            while j + 8 <= chunk_end:
                cfcc = b[j:j + 4]
                csz = struct.unpack("<I", b[j + 4:j + 8])[0]
                if j + 8 + csz > len(b):
                    raise ValueError("AVI movi chunk overruns payload")
                if cfcc[2:4] in (b"dc", b"db"):
                    yield b[j + 8:j + 8 + csz]
                j += 8 + csz + (csz & 1)
        i += 8 + size + (size & 1)
    if not found:
        raise ValueError("AVI has no movi list")


def encode_avi_mjpeg(frames: list[bytes], width: int, height: int,
                     fps: int = 10) -> bytes:
    """Standard single-stream MJPEG AVI from per-frame JPEG bytes."""
    if not frames:
        raise ValueError("encode_avi_mjpeg needs at least one frame")

    def chunk(fcc: bytes, data: bytes) -> bytes:
        pad = b"\x00" if len(data) & 1 else b""
        return fcc + struct.pack("<I", len(data)) + data + pad

    def lst(kind: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", kind + data)

    max_sz = max(len(f) for f in frames)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, max_sz * fps, 0, 0x10,   # us/frame, rate, pad, HASINDEX
        len(frames), 0, 1, max_sz, width, height, 0, 0, 0, 0)
    strh = (b"vids" + b"MJPG"
            + struct.pack("<IHHIIIIIIIIhhhh", 0, 0, 0, 0, 1, fps, 0,
                          len(frames), max_sz, 10_000, 0,
                          0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih)
               + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_chunks = b"".join(chunk(b"00dc", f) for f in frames)
    movi = lst(b"movi", movi_chunks)
    # idx1: one entry per frame (offset relative to 'movi' fourcc)
    idx, off = b"", 4
    for f in frames:
        idx += b"00dc" + struct.pack("<III", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body
