"""Pure stdlib/numpy baseline JPEG codec (ITU-T T.81).

Retires the last big image-codec stub honestly: :func:`encode_jpeg`
writes a spec-conformant baseline JFIF (8-bit, 4:4:4 — no chroma
subsampling — standard Annex K quantization and Huffman tables), and
:func:`decode_jpeg` parses SOI/APP/DQT/SOF0/DHT/SOS streams back to
RGB: canonical Huffman decode, DPCM DC + RLE AC, dequantize, inverse
zigzag, IDCT, YCbCr→RGB. Grayscale (1 component) and 4:4:4 color are
supported; progressive (SOF2), subsampled, 12-bit and arithmetic-coded
streams raise ``ValueError`` — curation callers quarantine, the same
contract as the PNG/GIF/BMP/PPM codecs next door.

JPEG is lossy: round-trip tests assert bounded error (quality 90 keeps
max channel error small on smooth content), plus analytical checks —
a solid-color image must decode exactly (DC-only blocks), and the
DCT/IDCT pair is verified orthonormal in isolation.

No Spark here: pure functions, wired into the multimodal mapInPandas
path by operators/multimodal.py exactly like the other codecs.
"""

from __future__ import annotations

import struct

import numpy as np

# ---- constants (ITU-T T.81 Annex K) -----------------------------------

ZIGZAG = np.array([
     0,  1,  8, 16,  9,  2,  3, 10,
    17, 24, 32, 25, 18, 11,  4,  5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13,  6,  7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
])

Q_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.float64).reshape(8, 8)

Q_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.float64).reshape(8, 8)

# (bits[1..16], values) — Annex K.3
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# DCT-II basis, orthonormal with JPEG's C(u) scaling: one 8×8 matrix
# applied as D @ block @ D.T (forward) / D.T @ coeff @ D (inverse).
_D = np.array([
    [
        (np.sqrt(1 / 8) if u == 0 else np.sqrt(2 / 8))
        * np.cos((2 * x + 1) * u * np.pi / 16)
        for x in range(8)
    ]
    for u in range(8)
])


def dct2(block: np.ndarray) -> np.ndarray:
    return _D @ block @ _D.T


def idct2(coeff: np.ndarray) -> np.ndarray:
    return _D.T @ coeff @ _D


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol → (code, length) per T.81 Annex C code assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            b = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for DPCM/AC coefficient coding."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _scaled_q(q: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of a base table (1..100)."""
    quality = min(100, max(1, quality))
    s = 5000 // quality if quality < 50 else 200 - quality * 2
    out = np.floor((q * s + 50) / 100)
    return np.clip(out, 1, 255)


def encode_jpeg(pixels: np.ndarray, quality: int = 90) -> bytes:
    """RGB uint8 (H, W, 3) → baseline JFIF bytes (4:4:4, Annex K
    Huffman tables, IJG-scaled Annex K quant tables)."""
    h, w, _ = pixels.shape
    rgb = pixels.astype(np.float64)
    y = 0.299 * rgb[:, :, 0] + 0.587 * rgb[:, :, 1] + 0.114 * rgb[:, :, 2]
    cb = -0.168736 * rgb[:, :, 0] - 0.331264 * rgb[:, :, 1] + 0.5 * rgb[:, :, 2] + 128
    cr = 0.5 * rgb[:, :, 0] - 0.418688 * rgb[:, :, 1] - 0.081312 * rgb[:, :, 2] + 128
    planes = [y, cb, cr]
    qt = [_scaled_q(Q_LUMA, quality), _scaled_q(Q_CHROMA, quality)]

    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    padded = []
    for p in planes:
        pp = np.empty((ph, pw))
        pp[:h, :w] = p
        pp[h:, :w] = p[-1:, :]  # edge replicate
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)

    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    bw = _BitWriter()
    prev_dc = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci in range(3):
                t = 0 if ci == 0 else 1
                block = padded[ci][by : by + 8, bx : bx + 8] - 128.0
                coeff = np.round(dct2(block) / qt[t]).astype(np.int64)
                zz = coeff.ravel()[ZIGZAG]
                # DC
                diff = int(zz[0]) - prev_dc[ci]
                prev_dc[ci] = int(zz[0])
                size, bits = _magnitude(diff)
                code, ln = dc_codes[t][size]
                bw.put(code, ln)
                if size:
                    bw.put(bits, size)
                # AC: run-length of zeros + size
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if k > last_nz:
                        break
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = ac_codes[t][0xF0]  # ZRL
                        bw.put(code, ln)
                        run -= 16
                    size, bits = _magnitude(v)
                    code, ln = ac_codes[t][(run << 4) | size]
                    bw.put(code, ln)
                    bw.put(bits, size)
                    run = 0
                if last_nz < 63:
                    code, ln = ac_codes[t][0x00]  # EOB
                    bw.put(code, ln)
    scan = bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return struct.pack(">HH", marker, len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for i, q in enumerate(qt):
        out += seg(0xFFDB, bytes([i]) + bytes(int(x) for x in q.ravel()[ZIGZAG]))
    sof = struct.pack(">BHHB", 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        sof += bytes([cid, 0x11, tq])  # h=v=1: 4:4:4
    out += seg(0xFFC0, sof)
    for tc_th, bits, vals in (
        ((0 << 4) | 0, DC_LUMA_BITS, DC_LUMA_VALS),
        ((1 << 4) | 0, AC_LUMA_BITS, AC_LUMA_VALS),
        ((0 << 4) | 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        ((1 << 4) | 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += seg(0xFFC4, bytes([tc_th]) + bytes(bits) + bytes(vals))
    sos = bytes([3]) + bytes([1, 0x00, 2, 0x11, 3, 0x11]) + bytes([0, 63, 0])
    out += seg(0xFFDA, sos)
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.n = 0

    def bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG scan truncated")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG scan truncated at marker")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    raise ValueError(f"unexpected marker 0xFF{nxt:02x} mid-scan")
            self.acc = b
            self.n = 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v


def _decode_tree(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) → symbol for canonical decode."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, tree: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = tree.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → RGB uint8 (H, W, 3). Grayscale streams
    return their luma replicated across RGB. Parse-guarded like every
    sibling decoder: any structural failure is ValueError
    (quarantine), never struct.error/IndexError."""
    from novlake_spark.operators.multimodal import _parse_guard

    return _parse_guard(_decode_jpeg_inner)(data)


def _decode_jpeg_inner(data: bytes) -> np.ndarray:
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htrees: dict[tuple[int, int], dict] = {}
    frame = None
    scan_comps = None
    scan_start = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at {pos}")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01, *range(0xD0, 0xD8)):  # standalone
            continue
        (ln,) = struct.unpack_from(">H", data, pos)
        body = data[pos + 2 : pos + ln]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            b = 0
            while b < len(body):
                pq, tq = body[b] >> 4, body[b] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64)
                tbl[ZIGZAG] = np.frombuffer(body, np.uint8, 64, b + 1)
                qtabs[tq] = tbl.reshape(8, 8)
                b += 65
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                tc, th = body[b] >> 4, body[b] & 0xF
                bits = list(body[b + 1 : b + 17])
                n = sum(bits)
                vals = list(body[b + 17 : b + 17 + n])
                htrees[(tc, th)] = _decode_tree(bits, vals)
                b += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            prec, fh, fw, nc = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError("only 8-bit baseline supported")
            comps = []
            for i in range(nc):
                cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                if hv != 0x11:
                    raise ValueError("subsampled JPEG unsupported (4:4:4 only)")
                comps.append((cid, tq))
            frame = (fh, fw, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError(f"non-baseline JPEG (SOF 0x{marker:02x}) unsupported")
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scan_comps = [(body[1 + 2 * i], body[2 + 2 * i]) for i in range(ns)]
            scan_start = pos + ln
            break
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        pos += ln
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame
    ph, pw = -(-fh // 8) * 8, -(-fw // 8) * 8
    br = _BitReader(data[scan_start:])
    planes = [np.zeros((ph, pw)) for _ in comps]
    prev_dc = [0] * len(comps)
    comp_q = {cid: tq for cid, tq in comps}
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, (cid, tables) in enumerate(scan_comps):
                td, ta = tables >> 4, tables & 0xF
                size = _read_symbol(br, htrees[(0, td)])
                diff = _extend(br.bits(size), size)
                prev_dc[ci] += diff
                zz = np.zeros(64)
                zz[0] = prev_dc[ci]
                k = 1
                while k < 64:
                    rs = _read_symbol(br, htrees[(1, ta)])
                    if rs == 0x00:  # EOB
                        break
                    run, size = rs >> 4, rs & 0xF
                    if rs == 0xF0:
                        k += 16
                        continue
                    k += run
                    if k > 63:
                        raise ValueError("AC index out of range")
                    zz[k] = _extend(br.bits(size), size)
                    k += 1
                coeff = np.zeros(64)
                coeff[ZIGZAG] = zz
                block = idct2(coeff.reshape(8, 8) * qtabs[comp_q[cid]]) + 128.0
                planes[ci][by : by + 8, bx : bx + 8] = block
    planes = [p[:fh, :fw] for p in planes]
    if len(planes) == 1:
        y = np.clip(planes[0], 0, 255)
        return np.repeat(y[:, :, None], 3, axis=2).astype(np.uint8)
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2), 0, 255).round().astype(np.uint8)
