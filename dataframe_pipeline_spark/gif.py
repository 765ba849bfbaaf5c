"""GIF codec — pure stdlib + numpy, no PIL.

``iter_gif_frames`` reads GIF87a/GIF89a: logical screen descriptor,
global and local color tables, interlacing, variable-width LZW
decompression, and ANIMATION — Graphic Control Extensions drive
per-frame transparency compositing and disposal (none / keep /
restore-to-background / restore-to-previous), so each yielded frame
is the fully composited (H, W, 3) uint8 RGB canvas exactly as a
player would show it.  ``decode_gif`` returns the first frame (the
still-image ingest contract).  Transparent pixels reveal whatever the
canvas holds underneath (background color on the first frame — color
samples only, the same alpha-stripping convention as the PNG path).
Corrupt streams raise ValueError; non-GIF payloads raise
NotImplementedError (multimodal error contract).

``encode_gif`` writes a valid single-frame GIF89a for any image with
at most 256 distinct colors, using literal-only LZW (the classic
"uncompressed GIF" writer: every pixel is emitted as its palette code,
with the code width tracked in lockstep with the decoder's dictionary
growth and CLEAR codes before overflow).  Output is standard — any
decoder reads it — and the round-trip is LOSSLESS, which makes the
decode path exactly verifiable in this container (unlike JPEG's
quantization-tolerance round-trip).
"""

from __future__ import annotations

import struct

import numpy as np


def _color_table(b: bytes, i: int, packed: int, flag_bit: int):
    """(table, new_index): read a color table if its flag is set."""
    if not (packed >> flag_bit) & 1:
        return None, i
    n = 2 << (packed & 0x7)
    tbl = np.frombuffer(b[i:i + 3 * n], dtype=np.uint8).reshape(n, 3)
    if tbl.shape[0] != n:
        raise ValueError("GIF color table truncated")
    return tbl, i + 3 * n


def _sub_blocks(b: bytes, i: int):
    """Concatenate data sub-blocks; returns (bytes, index after block)."""
    out = bytearray()
    while True:
        if i >= len(b):
            raise ValueError("GIF sub-blocks truncated")
        n = b[i]
        i += 1
        if n == 0:
            return bytes(out), i
        if i + n > len(b):
            raise ValueError("GIF sub-blocks truncated")
        out += b[i:i + n]
        i += n


def _lzw_decode(data: bytes, min_code: int, npix: int) -> np.ndarray:
    """GIF variable-width LZW -> palette indices (length npix)."""
    clear = 1 << min_code
    eoi = clear + 1
    width = min_code + 1
    dict_: list[bytes] = []

    def reset():
        nonlocal width, dict_
        width = min_code + 1
        dict_ = [bytes([c]) for c in range(clear)] + [b"", b""]

    reset()
    out = bytearray()
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits          # LSB-first bit packing
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)
            if prev is None:
                if code >= len(dict_):
                    raise ValueError("GIF LZW: first code out of range")
                entry = dict_[code]
            elif code < len(dict_):
                entry = dict_[code]
                dict_.append(prev + entry[:1])
            elif code == len(dict_):
                entry = prev + prev[:1]
                dict_.append(entry)
            else:
                raise ValueError("GIF LZW: code out of range")
            out += entry
            prev = entry
            if len(dict_) == (1 << width) and width < 12:
                width += 1
            if len(out) >= npix:
                return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)
    if len(out) < npix:
        raise ValueError("GIF LZW stream ended early")
    return np.frombuffer(bytes(out[:npix]), dtype=np.uint8)


_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def decode_gif(b: bytes) -> np.ndarray:
    """GIF87a/89a -> first frame as (H, W, 3) uint8 RGB.  Truncated or
    malformed streams surface as ValueError (the multimodal on_error
    contract), never struct.error / IndexError."""
    return next(iter_gif_frames(b))


def iter_gif_frames(b: bytes):
    """Yield every frame of a (possibly animated) GIF as the composited
    (H, W, 3) uint8 RGB canvas, honoring Graphic Control Extension
    transparency and disposal methods — the video-sampler ingest shape
    (same 1→N contract as AVI's ``iter_mjpeg_frames``).  Lazy: decoding
    stops when the consumer stops (``VideoFrameSampler`` with
    ``max_frames`` never pays for the tail)."""
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise NotImplementedError("not a GIF payload")

    def frames():
        try:
            yield from _iter_gif_frames(b)
        except (struct.error, IndexError) as e:
            raise ValueError(f"corrupt GIF stream: {e}") from None

    return frames()


def _iter_gif_frames(b: bytes):
    if len(b) < 13:
        raise ValueError("GIF header truncated")
    sw, sh = struct.unpack("<HH", b[6:10])
    packed = b[10]
    gct, i = _color_table(b, 13, packed, 7)
    bg = b[11]
    bg_color = (gct[min(bg, len(gct) - 1)] if gct is not None
                else np.zeros(3, dtype=np.uint8))
    canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
    canvas[:] = bg_color
    disposal, tidx = 0, None                   # per-frame GCE state
    yielded = False
    while i < len(b):
        block = b[i]
        if block == 0x3B:                      # trailer
            if not yielded:
                raise ValueError("GIF has no image data")
            return
        if block == 0x21:                      # extension
            label = b[i + 1]
            i += 2
            data, i = _sub_blocks(b, i)
            if label == 0xF9 and len(data) >= 4:   # Graphic Control Ext
                disposal = (data[0] >> 2) & 0x7
                tidx = data[3] if data[0] & 1 else None
            continue
        if block != 0x2C:
            raise ValueError(f"bad GIF block 0x{block:02x}")
        left, top, w, h = struct.unpack("<HHHH", b[i + 1:i + 9])
        ipacked = b[i + 9]
        lct, i = _color_table(b, i + 10, ipacked, 7)
        palette = lct if lct is not None else gct
        if palette is None:
            raise ValueError("GIF image without color table")
        interlaced = (ipacked >> 6) & 1
        min_code = b[i]
        data, i = _sub_blocks(b, i + 1)
        idx = _lzw_decode(data, min_code, w * h)
        if idx.max(initial=0) >= len(palette):
            raise ValueError("GIF pixel index outside color table")
        idx = idx.reshape(h, w)
        if interlaced:
            de = np.empty_like(idx)
            r = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, h, step)
                de[list(rows)] = idx[r:r + len(rows)]
                r += len(rows)
            idx = de
        if top + h > sh or left + w > sw:
            raise ValueError("GIF frame outside logical screen")
        snapshot = canvas.copy() if disposal == 3 else None
        region = canvas[top:top + h, left:left + w]
        if tidx is None:
            region[:] = palette[idx]
        else:                                  # composite: skip transparent
            mask = idx != tidx
            region[mask] = palette[idx[mask]]
        yield canvas.copy()
        yielded = True
        if disposal == 2:                      # restore to background
            canvas[top:top + h, left:left + w] = bg_color
        elif disposal == 3 and snapshot is not None:   # restore previous
            canvas = snapshot
        disposal, tidx = 0, None
    raise ValueError("GIF stream ended before image data"
                     if not yielded else "GIF stream missing trailer")


def _palette(flat: np.ndarray):
    """(color table padded to a power of two, per-pixel indices,
    table-size bits) for <= 256 distinct RGB colors."""
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"encode_gif needs <= 256 distinct colors, got {len(colors)}")
    # color table size: power of two >= max(2, ncolors)
    bits = max(1, int(len(colors) - 1).bit_length())
    tbl = np.zeros((1 << bits, 3), dtype=np.uint8)
    tbl[:len(colors)] = colors
    return tbl, idx, bits


def _lzw_literal_blocks(idx, min_code: int) -> bytes:
    """Literal-only LZW code stream for palette indices, sub-blocked —
    the classic "uncompressed GIF" writer: every pixel is emitted as
    its palette code, with the code width tracked in lockstep with the
    decoder's dictionary growth and CLEAR codes before overflow."""
    clear = 1 << min_code
    eoi = clear + 1
    codes = bytearray()
    acc = nbits = 0

    def emit(code: int, width: int):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            codes.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code + 1
    count = 0          # pixel codes emitted since the last CLEAR
    emit(clear, width)
    for v in idx:
        emit(int(v), width)
        count += 1
        # the decoder adds one dictionary entry per code EXCEPT the
        # first after a clear; mirror its growth exactly so our code
        # width changes in lockstep: initial dict size is clear+2, so
        # after pixel code j (j >= 2) it is clear + 1 + j
        if count >= 2 and clear + 1 + count == (1 << width):
            if width < 12:
                width += 1
            else:
                emit(clear, width)
                width = min_code + 1
                count = 0
    emit(eoi, width)
    if nbits:
        codes.append(acc & 0xFF)
    out = bytearray()
    for j in range(0, len(codes), 255):
        chunk = codes[j:j + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00"
    return bytes(out)


def _as_rgb(pixels) -> np.ndarray:
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = np.stack([px] * 3, axis=-1)
    return px


def encode_gif(pixels) -> bytes:
    """(H, W, 3) RGB or (H, W) palette-friendly uint8 -> single-frame
    GIF89a.  Requires <= 256 distinct colors (ValueError otherwise);
    round-trip through ``decode_gif`` is lossless."""
    px = _as_rgb(pixels)
    h, w, _ = px.shape
    tbl, idx, bits = _palette(px.reshape(-1, 3))
    min_code = max(2, bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])    # GCT flag + size, bg, aspect
    out += tbl.tobytes()
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
    out += bytes([min_code])
    out += _lzw_literal_blocks(idx, min_code)
    out += b"\x3b"
    return bytes(out)


def encode_gif_animated(frames, delay_cs: int = 10) -> bytes:
    """List of same-shape (H, W, 3) RGB / (H, W) uint8 frames -> an
    animated GIF89a: one GLOBAL color table over the union of frame
    colors (<= 256 total, ValueError otherwise), a NETSCAPE2.0 loop
    block, and per-frame Graphic Control Extensions (disposal=1 "keep",
    no transparency) over full-canvas image descriptors — so
    ``iter_gif_frames`` round-trips every frame LOSSLESSLY, and any
    player loops it.  ``delay_cs`` is the per-frame delay in 1/100 s."""
    if not frames:
        raise ValueError("encode_gif_animated needs at least one frame")
    pxs = [_as_rgb(f) for f in frames]
    h, w, _ = pxs[0].shape
    if any(p.shape != (h, w, 3) for p in pxs):
        raise ValueError("all frames must share one shape")
    flat = np.concatenate([p.reshape(-1, 3) for p in pxs])
    tbl, idx_all, bits = _palette(flat)
    min_code = max(2, bits)

    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", w, h)
    out += bytes([0x80 | (bits - 1), 0, 0])    # GCT flag + size, bg, aspect
    out += tbl.tobytes()
    # NETSCAPE2.0 application extension: loop forever
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    npix = h * w
    for f, _px in enumerate(pxs):
        # GCE: disposal=1 (leave in place), delay, no transparency
        out += b"\x21\xf9\x04" + bytes([0x04]) \
            + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, w, h) + b"\x00"
        out += bytes([min_code])
        out += _lzw_literal_blocks(idx_all[f * npix:(f + 1) * npix],
                                   min_code)
    out += b"\x3b"
    return bytes(out)
