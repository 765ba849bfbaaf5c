"""Baseline JPEG codec — pure stdlib + numpy, no PIL/libjpeg.

Closes the one multimodal stub a real corpus hits first (VERDICT r4
"Next round" #8): ``decode_jpeg`` handles baseline sequential DCT JFIF
(SOF0/SOF1) — Huffman tables and quantization tables parsed from the
stream, arbitrary 1/2 sampling factors (4:4:4 / 4:2:2 / 4:2:0),
restart markers, byte unstuffing.  Progressive (SOF2), arithmetic
coding, and 12-bit precision raise ``NotImplementedError`` (same
error contract as the other codecs in multimodal.py: NotImplemented
for honest capability gaps, ValueError for corrupt payloads of a
recognized format).

``encode_jpeg`` writes baseline 4:4:4 (or grayscale) with the standard
ITU T.81 Annex K quantization/Huffman tables — a real, standard JPEG
any decoder reads.  It exists so the decode path is round-trip
verifiable in this container (no PIL to make fixtures): encode known
pixels → decode → compare within quantization tolerance.

Performance note: the entropy decode is a Python bit loop — fine for
the Arrow-batched ``mapInPandas`` stages these codecs run in (each
task decodes its own batch; the parallelism is Spark's), and the IDCT
is a batched numpy einsum.  A production deployment would swap
PIL/libjpeg-turbo into the same ``decode_image_array`` dispatch
(MULTIMODAL.md contract) — this codec makes the plumbing real and the
contract testable, not a throughput claim.
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag scan order: index i of the stream -> (row, col) in the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU T.81 Annex K quantization tables (quality 50 reference)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# Annex K Huffman specs: (bit-length counts[1..16], symbols)
DC_LUMA_SPEC = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
                list(range(12)))
DC_CHROMA_SPEC = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
                  list(range(12)))
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
     0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
     0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
     0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
     0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
     0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
     0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
     0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
     0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
     0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
     0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
     0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
     0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
     0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
     0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
     0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
     0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
     0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
     0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
     0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
     0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
     0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
     0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
     0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
     0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
     0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
     0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])

# 8x8 DCT-II basis: idct2(B) = A.T @ B @ A ; fdct2(X) = A @ X @ A.T
_A = np.zeros((8, 8))
for _k in range(8):
    _c = np.sqrt(0.125) if _k == 0 else 0.5
    for _n in range(8):
        _A[_k, _n] = _c * np.cos((2 * _n + 1) * _k * np.pi / 16)


def _canonical_codes(counts, symbols):
    """(length, code) per symbol in canonical (T.81 C.2) order."""
    codes, code = [], 0
    it = iter(symbols)
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            codes.append((next(it), ln, code))
            code += 1
        code <<= 1
    return codes


def _decode_table(counts, symbols):
    """dict (length, code) -> symbol for the bit-reader."""
    return {(ln, code): sym for sym, ln, code in
            _canonical_codes(counts, symbols)}


def _encode_table(counts, symbols):
    """dict symbol -> (length, code) for the bit-writer."""
    return {sym: (ln, code) for sym, ln, code in
            _canonical_codes(counts, symbols)}


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    restart markers are consumed by the caller via ``sync_restart``."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bits = 0
        self.nbits = 0

    def _fill(self):
        while self.nbits <= 24:
            if self.pos >= len(self.data):
                # pad with 1s past the end (T.81 F.2.2.5 allows the
                # final code to be completed with 1-bits)
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = (self.data[self.pos + 1]
                       if self.pos + 1 < len(self.data) else 0)
                if nxt == 0x00:
                    self.pos += 2          # stuffed 0xFF
                elif 0xD0 <= nxt <= 0xD7:
                    break                  # restart marker: stop filling
                else:
                    break                  # EOI or other marker
            else:
                self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_huff(self, table) -> int:
        ln, code = 0, 0
        for _ in range(16):
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def sync_restart(self) -> None:
        """Drop partial bits and consume an RSTn marker."""
        self.bits = 0
        self.nbits = 0
        while (self.pos + 1 < len(self.data)
               and not (self.data[self.pos] == 0xFF
                        and 0xD0 <= self.data[self.pos + 1] <= 0xD7)):
            self.pos += 1
        self.pos += 2


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s-bit received value to signed."""
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def decode_jpeg(b: bytes) -> np.ndarray:
    """Baseline sequential JFIF -> (H, W, 3) uint8 RGB (or (H, W, 1)
    grayscale).  NotImplementedError for progressive/arithmetic/12-bit;
    ValueError for corrupt streams."""
    if b[:2] != b"\xff\xd8":
        raise NotImplementedError("not a JPEG payload")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}
    comps = None
    h = w = 0
    restart_interval = 0
    i = 2
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError(f"bad JPEG marker sync at {i}")
        marker = b[i + 1]
        if marker == 0xD8:
            i += 2
            continue
        if marker == 0xD9:
            break
        seg_len = struct.unpack(">H", b[i + 2:i + 4])[0]
        seg = b[i + 4:i + 2 + seg_len]
        if marker == 0xDB:                         # DQT
            j = 0
            while j < len(seg):
                prec, tid = seg[j] >> 4, seg[j] & 0xF
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                qt[tid] = np.frombuffer(
                    seg[j + 1:j + 65], dtype=np.uint8).astype(np.int64)
                j += 65
        elif marker == 0xC4:                       # DHT
            j = 0
            while j < len(seg):
                cls, tid = seg[j] >> 4, seg[j] & 0xF
                counts = list(seg[j + 1:j + 17])
                n = sum(counts)
                syms = list(seg[j + 17:j + 17 + n])
                huff[(cls, tid)] = _decode_table(counts, syms)
                j += 17 + n
        elif marker in (0xC0, 0xC1):               # SOF0/1 baseline
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                f"JPEG SOF{marker - 0xC0} coding not supported")
        elif marker == 0xDD:                       # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:                       # SOS -> entropy data
            if comps is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in comps if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0xF))
            data = b[i + 2 + seg_len:]
            return _decode_scan(data, scan, qt, huff, h, w,
                                restart_interval)
        i += 2 + seg_len
    raise ValueError("JPEG stream ended before SOS")


def _decode_scan(data, scan, qt, huff, h, w, restart_interval):
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    # per-component coefficient planes (in blocks)
    for c, _, _ in scan:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        c["blocks"] = np.zeros((bh * bw, 64), dtype=np.int64)
        c["bw"] = bw
        c["pred"] = 0
    rdr = _BitReader(data)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                rdr.sync_restart()
                for c, _, _ in scan:
                    c["pred"] = 0
            for c, td, ta in scan:
                dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        s = rdr.decode_huff(dc_tab)
                        diff = _extend(rdr.receive(s), s) if s else 0
                        c["pred"] += diff
                        blk[0] = c["pred"]
                        k = 1
                        while k < 64:
                            rs = rdr.decode_huff(ac_tab)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16      # ZRL
                                    continue
                                break            # EOB
                            k += r
                            if k > 63:
                                raise ValueError("JPEG AC index overflow")
                            blk[k] = _extend(rdr.receive(s), s)
                            k += 1
                        by = my * c["v"] + v
                        bx = mx * c["h"] + hh
                        c["blocks"][by * c["bw"] + bx] = blk
            mcu_count += 1
    # dequantize + un-zigzag + batched IDCT per component
    planes = []
    for c, _, _ in scan:
        q = qt[c["tq"]]
        coeff = np.zeros((c["blocks"].shape[0], 64), dtype=np.float64)
        coeff[:, ZIGZAG] = c["blocks"] * q
        blocks = coeff.reshape(-1, 8, 8)
        px = np.einsum("kj,njl,lm->nkm", _A.T, blocks, _A) + 128.0
        bh = c["blocks"].shape[0] // c["bw"]
        plane = (px.reshape(bh, c["bw"], 8, 8)
                 .transpose(0, 2, 1, 3).reshape(bh * 8, c["bw"] * 8))
        # upsample to full resolution and crop
        plane = np.repeat(np.repeat(plane, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)[:h, :w]
        planes.append(plane)
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return y.astype(np.uint8)[..., None]
    if len(planes) != 3:
        raise NotImplementedError(f"{len(planes)}-component JPEG")
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


# -------------------------------------------------------------------------
# Encoder: baseline 4:4:4 / grayscale, Annex K tables
# -------------------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, ln: int, code: int):
        for k in range(ln - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> k) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)   # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)                # pad with 1-bits


def _quality_scale(tbl: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    s = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((tbl * s + 50) // 100, 1, 255)


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def encode_jpeg(pixels, quality: int = 85) -> bytes:
    """(H, W, 3) RGB or (H, W)/(H, W, 1) gray uint8 -> baseline JFIF
    bytes (4:4:4, Annex K tables scaled by ``quality``)."""
    px = np.asarray(pixels, dtype=np.float64)
    if px.ndim == 2:
        px = px[..., None]
    h, w, nc = px.shape
    if nc == 3:
        r, g, bl = px[..., 0], px[..., 1], px[..., 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * bl,
                  -0.168736 * r - 0.331264 * g + 0.5 * bl + 128.0,
                  0.5 * r - 0.418688 * g - 0.081312 * bl + 128.0]
        qts = [0, 1, 1]
        hts = [0, 1, 1]
    elif nc == 1:
        planes, qts, hts = [px[..., 0]], [0], [0]
    else:
        raise ValueError(f"encode_jpeg needs 1 or 3 channels, got {nc}")
    q_tabs = [_quality_scale(QT_LUMA, quality),
              _quality_scale(QT_CHROMA, quality)]
    dc_specs = [DC_LUMA_SPEC, DC_CHROMA_SPEC]
    ac_specs = [AC_LUMA_SPEC, AC_CHROMA_SPEC]
    dc_enc = [_encode_table(*s) for s in dc_specs]
    ac_enc = [_encode_table(*s) for s in ac_specs]

    out = bytearray(b"\xff\xd8")                       # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01" \
        + b"\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00"
    for tid in range({1: 1, 3: 2}[nc]):                # DQT
        zz = np.zeros(64, dtype=np.uint8)
        zz = q_tabs[tid][ZIGZAG].astype(np.uint8)      # natural->zigzag
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(zz)
    out += b"\xff\xc0" + struct.pack(">H", 8 + 3 * nc) + bytes([8]) \
        + struct.pack(">HH", h, w) + bytes([nc])       # SOF0
    for c in range(nc):
        out += bytes([c + 1, 0x11, qts[c]])            # 1x1 sampling
    for cls, specs in ((0, dc_specs), (1, ac_specs)):  # DHT
        for tid in range({1: 1, 3: 2}[nc]):
            counts, syms = specs[tid]
            out += b"\xff\xc4" + struct.pack(">H", 19 + len(syms)) \
                + bytes([(cls << 4) | tid]) + bytes(counts) + bytes(syms)
    out += b"\xff\xda" + struct.pack(">H", 6 + 2 * nc) + bytes([nc])
    for c in range(nc):
        out += bytes([c + 1, (hts[c] << 4) | hts[c]])
    out += b"\x00\x3f\x00"                             # Ss/Se/Ah/Al

    bw_ = _BitWriter()
    hb, wb = -(-h // 8), -(-w // 8)
    preds = [0] * nc
    for by in range(hb):
        for bx in range(wb):
            for ci, plane in enumerate(planes):
                blk = np.full((8, 8), 0.0)
                ys, xs = by * 8, bx * 8
                tile = plane[ys:min(ys + 8, h), xs:min(xs + 8, w)]
                # edge replication padding
                blk[:tile.shape[0], :tile.shape[1]] = tile
                if tile.shape[0] < 8:
                    blk[tile.shape[0]:, :] = blk[tile.shape[0] - 1, :]
                if tile.shape[1] < 8:
                    blk[:, tile.shape[1]:] = blk[:, tile.shape[1] - 1:tile.shape[1]]
                coeff = _A @ (blk - 128.0) @ _A.T
                q = q_tabs[qts[ci]].reshape(8, 8)
                qc = np.round(coeff / q).astype(np.int64)
                zz = qc.reshape(64)[ZIGZAG]
                # DC
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                s = _category(diff)
                ln, code = dc_enc[hts[ci]][s]
                bw_.write(ln, code)
                if s:
                    v = diff if diff > 0 else diff + (1 << s) - 1
                    bw_.write(s, v)
                # AC
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        ln, code = ac_enc[hts[ci]][0xF0]   # ZRL
                        bw_.write(ln, code)
                        run -= 16
                    s = _category(v)
                    ln, code = ac_enc[hts[ci]][(run << 4) | s]
                    bw_.write(ln, code)
                    bits = v if v > 0 else v + (1 << s) - 1
                    bw_.write(s, bits)
                    run = 0
                if run:
                    ln, code = ac_enc[hts[ci]][0x00]       # EOB
                    bw_.write(ln, code)
    bw_.flush()
    out += bw_.out
    out += b"\xff\xd9"                                 # EOI
    return bytes(out)
