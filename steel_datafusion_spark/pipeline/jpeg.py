"""Pure-Python baseline JPEG codec (ITU T.81 sequential DCT, Huffman).

Real multimodal corpora are JPEG-first, so the codec table in
pipeline/codecs.py needs JPEG even without Pillow.  This module implements

- **decode_jpeg**: baseline/extended-sequential Huffman JPEG (SOF0/SOF1),
  grayscale or YCbCr, any sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0
  all covered by the generic h/v replication upsampler), restart markers
  (DRI/RSTn).  Huffman and quantization tables are read from the stream's
  DHT/DQT segments — nothing is assumed about the encoder.  Progressive
  (SOF2) and arithmetic-coded JPEGs raise ``ValueError`` (Pillow handles
  them when installed; see codecs.decode_image_bytes).
- **encode_jpeg**: baseline 4:4:4 (or single-component grayscale) writer
  using the Annex K example quantization + Huffman tables with IJG quality
  scaling — enough to round-trip real lossy payloads in tests and to
  generate fixtures in environments without any imaging library.

All DCT math runs through an orthonormal DCT-II matrix in numpy (a few
matmuls per 8x8 block); the bit-level entropy coding is plain Python.
This is a correctness-first codec for the Arrow-batched decode path in
pipeline/multimodal.py, not a throughput contender — swap in Pillow (auto
-detected) for production decoding speed.

Tables below are from the public JPEG specification (ITU T.81 Annex K).
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["decode_jpeg", "encode_jpeg"]

JPEG_MAGIC = b"\xff\xd8\xff"

ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63,
]

# Annex K.1 example quantization tables (zigzag-ordered at emit time)
QUANT_LUM = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int32)

QUANT_CHROM = np.array([
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
], dtype=np.int32)

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL)
DC_LUM_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUM_VALS = list(range(12))
DC_CHROM_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROM_VALS = list(range(12))
AC_LUM_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUM_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROM_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROM_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix C: dct2(f) = C @ f @ C.T."""
    x = np.arange(8)
    c = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    c *= np.sqrt(2.0 / 8.0)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


_C = _dct_matrix()


def _build_huffman_decode(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, canonical JPEG Huffman assignment."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_huffman_encode(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length)."""
    return {sym: (code, length)
            for (length, code), sym in _build_huffman_decode(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            self._nbits -= 8
            byte = (self._acc >> self._nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:          # byte stuffing
                self.out.append(0x00)
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> None:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._nbits = 0
        self.marker: int | None = None  # pending marker (e.g. RSTn, EOI)

    def _fill(self) -> bool:
        if self.pos >= len(self.data):
            return False
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                return False           # real marker: stop feeding bits
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._nbits += 8
        return True

    def read_bit(self) -> int:
        if self._nbits == 0 and not self._fill():
            raise ValueError("JPEG entropy data exhausted")
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")

    def align_and_consume_rst(self) -> None:
        """Byte-align and swallow an RSTn marker (restart interval)."""
        self._acc = 0
        self._nbits = 0
        if self.marker is not None and 0xD0 <= self.marker <= 0xD7:
            self.pos += 2  # skip FF Dn
            self.marker = None


def _extend(v: int, s: int) -> int:
    """Sign-extend an s-bit magnitude value (T.81 F.2.2.1)."""
    return v - (1 << s) + 1 if s and v < (1 << (s - 1)) else v


def _category(v: int) -> int:
    """Number of bits needed for DC/AC magnitude coding."""
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

def decode_jpeg(payload: bytes) -> tuple[int, int, str, bytes]:
    """Decode a baseline JPEG; returns (width, height, mode, pixels) with
    mode 'L' or 'RGB' (same shape as codecs.DecodedImage)."""
    if not payload.startswith(JPEG_MAGIC[:2]):
        raise ValueError("not a JPEG payload")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad JPEG marker alignment at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        length = struct.unpack(">H", payload[pos + 2:pos + 4])[0]
        seg = payload[pos + 4:pos + 2 + length]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = np.frombuffer(seg[p:p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    vals = np.frombuffer(seg[p:p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                tbl = np.zeros(64, dtype=np.int32)
                tbl[ZIGZAG] = vals
                qt[tq] = tbl.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1:p + 17])
                n = sum(bits)
                vals = list(seg[p + 17:p + 17 + n])
                (huff_ac if tc else huff_dc)[th] = _build_huffman_decode(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 (sequential Huffman)
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            comps = []
            for i in range(nc):
                cid, hv, tq = seg[6 + 3 * i:9 + 3 * i]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker == 0xC2:
            raise ValueError("progressive JPEG (SOF2) needs Pillow")
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG frame type SOF marker "
                             f"0x{marker:02x}")
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                comp = next(c for c in frame["comps"] if c["id"] == cs)
                scan.append((comp, tt >> 4, tt & 0x0F))
            return _decode_scan(payload, pos + 2 + length, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        # else: APPn/COM — skip
        pos += 2 + length
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(data, pos, frame, scan, qt, huff_dc, huff_ac, dri):
    w, h, comps = frame["w"], frame["h"], frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8),
                                dtype=np.float64) for c in comps}
    reader = _BitReader(data, pos)
    preds = {c["id"]: 0 for c, _, _ in scan}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if dri and mcu_count and mcu_count % dri == 0:
                reader.align_and_consume_rst()
                for k in preds:
                    preds[k] = 0
            for comp, tdc, tac in scan:
                q = qt[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        blk = _decode_block(reader, huff_dc[tdc],
                                            huff_ac[tac], preds, comp["id"])
                        px = _C.T @ (blk * q) @ _C + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0:y0 + 8, x0:x0 + 8] = px
            mcu_count += 1
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        # replication upsample to full resolution
        if c["h"] != hmax or c["v"] != vmax:
            p = np.repeat(np.repeat(p, vmax // c["v"], axis=0),
                          hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        pix = np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
        return w, h, "L", pix.tobytes()
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    pix = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return w, h, "RGB", pix.tobytes()


def _decode_block(reader, dc_table, ac_table, preds, cid) -> np.ndarray:
    coef = np.zeros(64, dtype=np.int32)
    s = reader.read_symbol(dc_table)
    diff = _extend(reader.read_bits(s), s) if s else 0
    preds[cid] += diff
    coef[0] = preds[cid]
    k = 1
    while k < 64:
        rs = reader.read_symbol(ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:   # ZRL: 16 zeros
                k += 16
                continue
            break           # EOB
        k += run
        if k > 63:
            raise ValueError("JPEG AC coefficient index out of range")
        coef[ZIGZAG[k]] = _extend(reader.read_bits(size), size)
        k += 1
    blk = np.zeros((8, 8), dtype=np.float64)
    blk.flat = coef
    return blk


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(width: int, height: int, mode: str, pixels: bytes,
                quality: int = 85, subsampling: str = "4:4:4") -> bytes:
    """Baseline JFIF writer: grayscale 1-component, or YCbCr at 4:4:4 or
    4:2:0 (``subsampling``; 4:2:0 averages 2x2 chroma and emits 2x2/1x1
    sampling factors — the layout dominant in real corpora, and the path
    that exercises the decoder's upsampler).  LA/RGBA inputs drop alpha
    first (JPEG has no alpha channel)."""
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError(f"unsupported subsampling {subsampling!r}")
    nch = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}[mode]
    arr = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, nch)
    if mode in ("LA", "RGBA"):
        arr = arr[:, :, :-1]
        mode = "L" if mode == "LA" else "RGB"
    grey = mode == "L"
    sub420 = (not grey) and subsampling == "4:2:0"
    ql = _scaled_quant(QUANT_LUM, quality)
    qc = _scaled_quant(QUANT_CHROM, quality)
    if grey:
        planes = [arr[:, :, 0].astype(np.float64)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[:, :, 0], rgb[:, :, 1], rgb[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    # pad to MCU multiples by edge replication (16 for 4:2:0 luma, else 8)
    m = 16 if sub420 else 8
    ph, pw = (height + m - 1) & ~(m - 1), (width + m - 1) & ~(m - 1)
    planes = [np.pad(p, ((0, ph - height), (0, pw - width)), mode="edge")
              for p in planes]
    if sub420:
        # average 2x2 chroma; padded dims are 16-multiples so halves are 8-multiples
        planes[1:] = [p.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
                      for p in planes[1:]]

    dc_lum_e = _build_huffman_encode(DC_LUM_BITS, DC_LUM_VALS)
    ac_lum_e = _build_huffman_encode(AC_LUM_BITS, AC_LUM_VALS)
    dc_chr_e = _build_huffman_encode(DC_CHROM_BITS, DC_CHROM_VALS)
    ac_chr_e = _build_huffman_encode(AC_CHROM_BITS, AC_CHROM_VALS)

    def emit(plane: np.ndarray, y0: int, x0: int, ci: int) -> None:
        q = ql if ci == 0 else qc
        dct = _C @ (plane[y0:y0 + 8, x0:x0 + 8] - 128.0) @ _C.T
        coef = np.round(dct / q).astype(np.int32)
        zz = coef.flatten()[ZIGZAG]
        dc_t = dc_lum_e if ci == 0 else dc_chr_e
        ac_t = ac_lum_e if ci == 0 else ac_chr_e
        _encode_block(writer, zz, preds, ci, dc_t, ac_t)

    writer = _BitWriter()
    preds = [0] * len(planes)
    if sub420:
        for my in range(ph // 16):
            for mx in range(pw // 16):
                for by in range(2):
                    for bx in range(2):
                        emit(planes[0], my * 16 + by * 8, mx * 16 + bx * 8, 0)
                emit(planes[1], my * 8, mx * 8, 1)
                emit(planes[2], my * 8, mx * 8, 2)
    else:
        for by in range(ph // 8):
            for bx in range(pw // 8):
                for ci, plane in enumerate(planes):
                    emit(plane, by * 8, bx * 8, ci)
    writer.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes((0xFF, marker)) + struct.pack(">H", len(body) + 2) + body

    def dqt(tq: int, tbl: np.ndarray) -> bytes:
        return seg(0xDB, bytes([tq]) + bytes(int(tbl.flatten()[z])
                                             for z in ZIGZAG))

    def dht(tc: int, th: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([tc << 4 | th]) + bytes(bits) + bytes(vals))

    ncomp = 1 if grey else 3
    y_hv = 0x22 if sub420 else 0x11
    sof_comps = b"".join(
        bytes((i + 1, y_hv if i == 0 else 0x11, 0 if i == 0 else 1))
        for i in range(ncomp))
    sos_comps = b"".join(
        bytes((i + 1, 0x00 if i == 0 else 0x11)) for i in range(ncomp))
    out = bytearray()
    out += b"\xff\xd8"                                       # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += dqt(0, ql)
    out += dht(0, 0, DC_LUM_BITS, DC_LUM_VALS)
    out += dht(1, 0, AC_LUM_BITS, AC_LUM_VALS)
    if not grey:
        out += dqt(1, qc)
        out += dht(0, 1, DC_CHROM_BITS, DC_CHROM_VALS)
        out += dht(1, 1, AC_CHROM_BITS, AC_CHROM_VALS)
    out += seg(0xC0, struct.pack(">BHHB", 8, height, width, ncomp) + sof_comps)
    out += seg(0xDA, bytes([ncomp]) + sos_comps + b"\x00\x3f\x00")
    out += writer.out
    out += b"\xff\xd9"                                       # EOI
    return bytes(out)


def _encode_block(writer, zz, preds, ci, dc_table, ac_table) -> None:
    diff = int(zz[0]) - preds[ci]
    preds[ci] = int(zz[0])
    s = _category(diff)
    code, length = dc_table[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(1, 64):
        if zz[k]:
            last_nz = k
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_table[0xF0]   # ZRL
            writer.write(code, length)
            run -= 16
        s = _category(v)
        code, length = ac_table[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz != 63:
        code, length = ac_table[0x00]       # EOB
        writer.write(code, length)
