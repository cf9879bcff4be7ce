"""Pure-Python image codecs for the multimodal pipeline.

The container ships no native codec libraries, but real decode need not be
stubbed: PNG inflates with stdlib ``zlib``, and BMP/PPM are plain headers
over raw pixels.  This module provides genuine decoders for those three
formats (Pillow is preferred when importable, covering everything else),
plus matching encoders so tests can round-trip real payloads without any
third-party dependency.

Decoders run inside Arrow-batched ``mapInPandas`` workers
(pipeline/multimodal.py) — pure CPU per row, no shuffle, no driver state —
so the same code path scales to a 1000-executor cluster unchanged.

Supported without Pillow:

- **PNG**: 8-bit depth, color types 0 (grey), 2 (RGB), 4 (grey+alpha),
  6 (RGBA); all five scanline filters; non-interlaced.
- **BMP**: uncompressed (BI_RGB) 24/32-bit, bottom-up or top-down.
- **PPM/PGM**: binary ``P6``/``P5`` and ASCII ``P3``/``P2``, maxval ≤ 255.
- **JPEG**: baseline/extended sequential Huffman (SOF0/SOF1), grayscale
  and YCbCr, sampling up to 2x2 (4:4:4/4:2:2/4:2:0), restart markers —
  pipeline/jpeg.py; progressive JPEGs need Pillow.
- **WAV**: RIFF/WAVE integer PCM (8/16/24/32-bit) and IEEE float32/64,
  any channel count — real audio decode (duration, channels, sample
  rate, per-channel interleaved samples) with no third-party library.
- **AVI**: RIFF/AVI container walk (hdrl/strh/strf/movi/idx1) with
  raw-DIB (``00db``, bottom-up padded BGR) and MJPEG (``00dc``, each
  frame through the baseline JPEG codec) streams — real video decode
  (dimensions, fps as rate/scale, frame count, sampled frame pixels).
"""

from __future__ import annotations

import struct
import zlib
from typing import NamedTuple

from .jpeg import JPEG_MAGIC, decode_jpeg, encode_jpeg

__all__ = ["DecodedImage", "decode_image_bytes", "sniff_format",
           "encode_png", "encode_bmp", "encode_ppm", "encode_jpeg",
           "DecodedAudio", "decode_wav", "encode_wav",
           "DecodedVideo", "decode_avi", "encode_avi",
           "Mp4Track", "Mp4Meta", "probe_mp4", "encode_mp4",
           "Mp3Meta", "probe_mp3", "encode_mp3",
           "WebmTrack", "WebmMeta", "probe_webm", "encode_webm",
           "FlacMeta", "probe_flac", "encode_flac",
           "OggMeta", "probe_ogg", "encode_ogg",
           "TsTrack", "TsMeta", "probe_mpegts", "encode_mpegts"]


class DecodedImage(NamedTuple):
    width: int
    height: int
    mode: str       # "L" | "LA" | "RGB" | "RGBA"
    pixels: bytes   # row-major, len == width * height * len(mode)


_CHANNELS = {"L": 1, "LA": 2, "RGB": 3, "RGBA": 4}

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def sniff_format(payload: bytes) -> str | None:
    """Best-effort container sniff by magic bytes; None if unrecognized."""
    if payload.startswith(PNG_MAGIC):
        return "png"
    if payload.startswith(JPEG_MAGIC[:2]) and len(payload) >= 4:
        return "jpeg"
    if payload.startswith(b"BM") and len(payload) >= 54:
        return "bmp"
    if payload[:2] in (b"P6", b"P5", b"P3", b"P2") and \
            (len(payload) > 2 and payload[2:3].isspace()):
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    if payload[:4] == b"RIFF" and payload[8:12] == b"AVI ":
        return "avi"
    if len(payload) >= 12 and payload[4:8] == b"ftyp":
        return "mp4"
    if payload[:4] == b"\x1a\x45\xdf\xa3":
        return "webm"
    if payload[:4] == b"fLaC":
        return "flac"
    if payload[:4] == b"OggS":
        return "ogg"
    if len(payload) >= 376 and len(payload) % 188 == 0 \
            and payload[0] == 0x47 and payload[188] == 0x47:
        return "mpegts"
    if payload[:3] == b"ID3" or (
            len(payload) >= 4 and payload[0] == 0xFF
            and (payload[1] & 0xE0) == 0xE0):
        return "mp3"
    return None


def decode_image_bytes(payload: bytes) -> DecodedImage:
    """Decode an encoded image payload to raw pixels.

    Pillow handles any format it knows when installed; otherwise the
    pure-Python PNG/BMP/PPM parsers below do the work.  Raises
    ``ValueError`` for unrecognized or malformed payloads."""
    try:
        import io

        import PIL.Image  # type: ignore

        img = PIL.Image.open(io.BytesIO(payload))
        if img.mode not in _CHANNELS:
            img = img.convert("RGBA" if "A" in img.mode else "RGB")
        return DecodedImage(img.width, img.height, img.mode, img.tobytes())
    except ImportError:
        pass

    fmt = sniff_format(payload)
    if fmt == "png":
        return _decode_png(payload)
    if fmt == "jpeg":
        return DecodedImage(*decode_jpeg(payload))
    if fmt == "bmp":
        return _decode_bmp(payload)
    if fmt == "ppm":
        return _decode_ppm(payload)
    raise ValueError(
        "unrecognized image payload (supported without Pillow: PNG, JPEG, "
        "BMP, PPM/PGM); first bytes: %r" % payload[:8])


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_MODES = {0: "L", 2: "RGB", 4: "LA", 6: "RGBA"}


def _decode_png(payload: bytes) -> DecodedImage:
    if not payload.startswith(PNG_MAGIC):
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = len(PNG_MAGIC), [], None
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos:pos + 4]), \
            payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        if len(data) != length:
            raise ValueError("truncated PNG chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
        pos += 12 + length  # len + type + data + crc
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    width, height, depth, ctype_n, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0:
        raise ValueError(f"unsupported PNG (depth={depth}, comp={comp})")
    if interlace != 0:
        raise ValueError("interlaced PNG not supported")
    mode = _PNG_MODES.get(ctype_n)
    if mode is None:
        raise ValueError(f"unsupported PNG color type {ctype_n} "
                         "(palette images need Pillow)")
    nch = _CHANNELS[mode]
    raw = zlib.decompress(b"".join(idat))
    stride = width * nch
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data size mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1:(y + 1) * (stride + 1)])
        if ftype == 1:    # Sub
            for i in range(nch, stride):
                line[i] = (line[i] + line[i - nch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - nch] if i >= nch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - nch] if i >= nch else 0
                b = prev[i]
                c = prev[i - nch] if i >= nch else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        out[y * stride:(y + 1) * stride] = line
        prev = line
    return DecodedImage(width, height, mode, bytes(out))


def encode_png(img: DecodedImage) -> bytes:
    """Minimal, valid PNG writer (filter 0 scanlines, one IDAT)."""
    ctype = {v: k for k, v in _PNG_MODES.items()}[img.mode]
    nch = _CHANNELS[img.mode]
    stride = img.width * nch

    def chunk(tag: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(tag + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + tag + data + \
            struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", img.width, img.height, 8, ctype, 0, 0, 0)
    raw = b"".join(
        b"\x00" + img.pixels[y * stride:(y + 1) * stride]
        for y in range(img.height))
    return (PNG_MAGIC + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP
# ---------------------------------------------------------------------------

def _decode_bmp(payload: bytes) -> DecodedImage:
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    data_off, = struct.unpack_from("<I", payload, 10)
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp, = struct.unpack_from("<H", payload, 28)
    compression, = struct.unpack_from("<I", payload, 30)
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(
            f"unsupported BMP (bpp={bpp}, compression={compression}); "
            "only uncompressed 24/32-bit supported without Pillow")
    top_down = height < 0
    height = abs(height)
    nch_in = bpp // 8
    row_in = (width * nch_in + 3) & ~3  # rows padded to 4 bytes
    mode = "RGBA" if bpp == 32 else "RGB"
    nch = _CHANNELS[mode]
    out = bytearray(width * height * nch)
    for y in range(height):
        src_y = y if top_down else height - 1 - y
        base = data_off + src_y * row_in
        row = payload[base:base + width * nch_in]
        if len(row) < width * nch_in:
            raise ValueError("truncated BMP pixel data")
        for x in range(width):
            b, g, r = row[x * nch_in], row[x * nch_in + 1], row[x * nch_in + 2]
            o = (y * width + x) * nch
            out[o], out[o + 1], out[o + 2] = r, g, b
            if nch == 4:
                out[o + 3] = row[x * nch_in + 3]
    return DecodedImage(width, height, mode, bytes(out))


def encode_bmp(img: DecodedImage) -> bytes:
    """Uncompressed bottom-up BMP writer (24-bit from RGB, 32-bit from
    RGBA; L/LA are expanded to RGB/RGBA first)."""
    px, mode = img.pixels, img.mode
    if mode in ("L", "LA"):  # expand grey to RGB(+A)
        nch_in = _CHANNELS[mode]
        expanded = bytearray()
        for i in range(0, len(px), nch_in):
            expanded += bytes((px[i], px[i], px[i]))
            if nch_in == 2:
                expanded += px[i + 1:i + 2]
        px, mode = bytes(expanded), "RGBA" if mode == "LA" else "RGB"
    nch = _CHANNELS[mode]
    bpp = nch * 8
    row_out = (img.width * nch + 3) & ~3
    body = bytearray()
    for y in range(img.height - 1, -1, -1):  # bottom-up
        row = bytearray()
        for x in range(img.width):
            o = (y * img.width + x) * nch
            row += bytes((px[o + 2], px[o + 1], px[o]))  # BGR
            if nch == 4:
                row.append(px[o + 3])
        row += b"\x00" * (row_out - len(row))
        body += row
    dib = struct.pack("<IiiHHIIiiII", 40, img.width, img.height, 1, bpp,
                      0, len(body), 2835, 2835, 0, 0)
    header = b"BM" + struct.pack("<IHHI", 54 + len(body), 0, 0, 54)
    return header + dib + bytes(body)


# ---------------------------------------------------------------------------
# PPM / PGM
# ---------------------------------------------------------------------------

def _ppm_tokens(payload: bytes, n: int, pos: int) -> tuple[list[int], int]:
    """Read n whitespace-separated ASCII integers, skipping '#' comments."""
    toks: list[int] = []
    cur = b""
    while len(toks) < n and pos < len(payload):
        c = payload[pos:pos + 1]
        if c == b"#":
            while pos < len(payload) and payload[pos:pos + 1] != b"\n":
                pos += 1
        elif c.isspace():
            if cur:
                toks.append(int(cur))
                cur = b""
            pos += 1
        else:
            cur += c
            pos += 1
    if cur and len(toks) < n:
        toks.append(int(cur))
    if len(toks) < n:
        raise ValueError("truncated PPM header/data")
    return toks, pos


def _decode_ppm(payload: bytes) -> DecodedImage:
    magic = payload[:2]
    mode = "RGB" if magic in (b"P6", b"P3") else "L"
    nch = _CHANNELS[mode]
    (width, height, maxval), pos = _ppm_tokens(payload, 3, 2)
    if maxval > 255:
        raise ValueError("16-bit PPM not supported")
    n_px = width * height * nch
    if magic in (b"P6", b"P5"):
        # _ppm_tokens already consumed the single whitespace after maxval
        raw = payload[pos:pos + n_px]
        if len(raw) < n_px:
            raise ValueError("truncated PPM pixel data")
    else:
        vals, _ = _ppm_tokens(payload, n_px, pos)
        raw = bytes(vals)
    if maxval != 255:
        raw = bytes(v * 255 // maxval for v in raw)
    return DecodedImage(width, height, mode, raw)


def encode_ppm(img: DecodedImage) -> bytes:
    """Binary PPM (P6) / PGM (P5) writer; LA/RGBA drop alpha."""
    px, mode = img.pixels, img.mode
    if mode in ("LA", "RGBA"):  # strip alpha
        nch_in = _CHANNELS[mode]
        px = bytes(b for i, b in enumerate(px) if i % nch_in != nch_in - 1)
        mode = "L" if mode == "LA" else "RGB"
    magic = b"P6" if mode == "RGB" else b"P5"
    return magic + b"\n%d %d\n255\n" % (img.width, img.height) + px


# ---------------------------------------------------------------------------
# WAV (RIFF/WAVE PCM)
# ---------------------------------------------------------------------------

class DecodedAudio(NamedTuple):
    n_channels: int
    sample_rate: int
    bits: int              # bits per sample as stored
    n_frames: int          # samples per channel
    samples: list[float]   # interleaved, normalized to [-1, 1]

    @property
    def duration_ms(self) -> int:
        return (self.n_frames * 1000) // self.sample_rate

    def rms(self) -> float:
        """Root-mean-square of the normalized interleaved samples."""
        if not self.samples:
            return 0.0
        return (sum(s * s for s in self.samples) / len(self.samples)) ** 0.5


_WAVE_FORMAT_PCM = 1
_WAVE_FORMAT_IEEE_FLOAT = 3
_WAVE_FORMAT_EXTENSIBLE = 0xFFFE


def decode_wav(payload: bytes) -> DecodedAudio:
    """Real RIFF/WAVE decode: walks the chunk list (fmt / data, skipping
    LIST/fact/cue), supports integer PCM at 8 (unsigned), 16, 24, 32 bits
    and IEEE float32/64, any channel count; WAVE_FORMAT_EXTENSIBLE resolves
    through its SubFormat tag.  Samples normalize to [-1, 1] doubles.
    Raises ``ValueError`` on malformed or compressed (ADPCM/µ-law) files."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size, = struct.unpack_from("<I", payload, pos + 4)
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            fmt = struct.unpack_from("<HHIIHH", body, 0)
            if fmt[0] == _WAVE_FORMAT_EXTENSIBLE:
                if size < 40:
                    raise ValueError("truncated WAVE_FORMAT_EXTENSIBLE fmt")
                sub, = struct.unpack_from("<H", body, 24)  # SubFormat GUID head
                fmt = (sub,) + fmt[1:]
        elif cid == b"data":
            if len(body) < size:
                raise ValueError("truncated data chunk")
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    tag, n_ch, rate, _brate, _align, bits = fmt
    if n_ch < 1 or rate < 1:
        raise ValueError(f"bad WAV fmt (channels={n_ch}, rate={rate})")
    if tag == _WAVE_FORMAT_PCM:
        if bits == 8:       # unsigned
            vals = [(b - 128) / 128.0 for b in data]
        elif bits == 16:
            vals = [v / 32768.0 for v, in struct.iter_unpack("<h", data)]
        elif bits == 24:
            vals = []
            for i in range(0, len(data) - 2, 3):
                v = int.from_bytes(data[i:i + 3], "little", signed=True)
                vals.append(v / 8388608.0)
        elif bits == 32:
            vals = [v / 2147483648.0
                    for v, in struct.iter_unpack("<i", data)]
        else:
            raise ValueError(f"unsupported PCM bit depth {bits}")
    elif tag == _WAVE_FORMAT_IEEE_FLOAT:
        if bits == 32:
            vals = [v for v, in struct.iter_unpack("<f", data)]
        elif bits == 64:
            vals = [v for v, in struct.iter_unpack("<d", data)]
        else:
            raise ValueError(f"unsupported float bit depth {bits}")
    else:
        raise ValueError(f"unsupported WAV format tag {tag} "
                         "(only PCM and IEEE float)")
    n_frames = len(vals) // n_ch
    return DecodedAudio(n_ch, rate, bits, n_frames, vals)


def encode_wav(samples: list[float], sample_rate: int = 16000,
               n_channels: int = 1, bits: int = 16) -> bytes:
    """Minimal valid RIFF/WAVE writer (integer PCM 8/16/24/32) from
    normalized [-1, 1] interleaved samples — the fixture generator for
    codec round-trip tests."""
    if bits == 8:
        body = bytes(max(0, min(255, int(round(s * 128)) + 128))
                     for s in samples)
    elif bits in (16, 24, 32):
        full = 1 << (bits - 1)
        nbytes = bits // 8
        out = bytearray()
        for s in samples:
            v = max(-full, min(full - 1, int(round(s * full))))
            out += v.to_bytes(nbytes, "little", signed=True)
        body = bytes(out)
    else:
        raise ValueError(f"unsupported bit depth {bits}")
    align = n_channels * bits // 8
    fmt = struct.pack("<HHIIHH", _WAVE_FORMAT_PCM, n_channels, sample_rate,
                      sample_rate * align, align, bits)
    chunks = (b"WAVE"
              + b"fmt " + struct.pack("<I", len(fmt)) + fmt
              + b"data" + struct.pack("<I", len(body)) + body
              + (b"\x00" if len(body) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


# ---------------------------------------------------------------------------
# AVI (RIFF video container: raw-DIB and MJPEG streams)
# ---------------------------------------------------------------------------

class DecodedVideo(NamedTuple):
    width: int
    height: int
    rate: int               # strh dwRate   (frames = rate/scale per second)
    scale: int              # strh dwScale
    n_frames: int           # total frames in the stream
    codec: str              # "DIB " | "MJPG"
    frames: list            # decoded DecodedImage for each *sampled* frame
    frame_indices: list     # stream index of each entry in ``frames``

    @property
    def fps(self) -> float:
        return self.rate / self.scale

    @property
    def duration_ms(self) -> int:
        return (self.n_frames * 1000 * self.scale) // self.rate


def _avi_row_stride(width: int) -> int:
    return (width * 3 + 3) & ~3          # BGR rows pad to 4 bytes (BI_RGB)


def _dib_to_rgb(body: bytes, width: int, height: int) -> DecodedImage:
    """Bottom-up BGR rows (the BI_RGB convention) -> row-major RGB."""
    stride = _avi_row_stride(width)
    if len(body) < stride * height:
        raise ValueError("truncated DIB frame")
    out = bytearray(width * height * 3)
    for y in range(height):
        src = (height - 1 - y) * stride
        dst = y * width * 3
        row = body[src:src + width * 3]
        out[dst:dst + width * 3:3] = row[2::3]
        out[dst + 1:dst + width * 3:3] = row[1::3]
        out[dst + 2:dst + width * 3:3] = row[0::3]
    return DecodedImage(width, height, "RGB", bytes(out))


def _rgb_to_dib(img: "DecodedImage") -> bytes:
    """Row-major RGB (or L, replicated) -> bottom-up padded BGR rows."""
    px = img.pixels
    if img.mode == "L":
        px = bytes(b for v in px for b in (v, v, v))
    elif img.mode != "RGB":
        raise ValueError(f"AVI DIB frames need RGB or L, got {img.mode}")
    stride = _avi_row_stride(img.width)
    pad = b"\x00" * (stride - img.width * 3)
    rows = []
    for y in range(img.height - 1, -1, -1):
        row = px[y * img.width * 3:(y + 1) * img.width * 3]
        bgr = bytearray(len(row))
        bgr[0::3] = row[2::3]
        bgr[1::3] = row[1::3]
        bgr[2::3] = row[0::3]
        rows.append(bytes(bgr) + pad)
    return b"".join(rows)


def decode_avi(payload: bytes, frame_step: int = 1,
               max_frames: int | None = None) -> DecodedVideo:
    """Real AVI decode: walks the RIFF chunk tree (hdrl -> avih + the first
    ``vids`` strh/strf, then the movi LIST), decoding ``00db`` raw-DIB
    frames directly and ``00dc`` MJPEG frames through the baseline JPEG
    decoder (pipeline/jpeg.py; Pillow when installed).  ``frame_step``/
    ``max_frames`` sample every k-th frame without decoding the rest —
    the container is still walked chunk-by-chunk, so sampling skips the
    pixel work (the expensive part), which is what a frame-sampling
    pipeline stage needs.  Raises ``ValueError`` on malformed containers
    or unsupported stream codecs."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    if frame_step < 1:
        raise ValueError("frame_step must be >= 1")

    width = height = 0
    rate, scale, n_stream_frames = 0, 1, 0
    codec = None
    frames: list[DecodedImage] = []
    indices: list[int] = []
    seen = 0

    def walk(pos: int, end: int) -> None:
        nonlocal width, height, rate, scale, n_stream_frames, codec, seen
        while pos + 8 <= end:
            cid = payload[pos:pos + 4]
            size, = struct.unpack_from("<I", payload, pos + 4)
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + size)   # skip the list type tag
            elif cid == b"strh":
                fcc_type = payload[body_at:body_at + 4]
                if fcc_type == b"vids" and rate == 0:
                    handler = payload[body_at + 4:body_at + 8]
                    scale_, rate_, _start, length = struct.unpack_from(
                        "<IIII", payload, body_at + 20)
                    scale, rate = max(1, scale_), max(1, rate_)
                    n_stream_frames = length
                    if handler in (b"MJPG", b"mjpg"):
                        codec = "MJPG"
                    elif handler in (b"DIB ", b"\x00\x00\x00\x00", b"RGB "):
                        codec = "DIB "
                    else:
                        raise ValueError(
                            f"unsupported AVI stream codec {handler!r}")
            elif cid == b"strf" and width == 0:
                if size >= 24:
                    w, h = struct.unpack_from("<ii", payload, body_at + 4)
                    width, height = abs(w), abs(h)
            elif cid in (b"00db", b"00dc"):
                take = (seen % frame_step == 0 and
                        (max_frames is None or len(frames) < max_frames))
                if take:
                    body = payload[body_at:body_at + size]
                    if cid == b"00dc" and codec == "MJPG":
                        img = decode_image_bytes(bytes(body))
                    else:
                        img = _dib_to_rgb(body, width, height)
                    frames.append(img)
                    indices.append(seen)
                seen += 1
            pos = body_at + size + (size & 1)       # chunks are word-aligned

    walk(12, len(payload))
    if codec is None or width == 0:
        raise ValueError("AVI missing vids strh/strf headers")
    n = n_stream_frames or seen
    return DecodedVideo(width, height, rate, scale, n, codec, frames, indices)


def encode_avi(frames: list, rate: int = 10, scale: int = 1,
               codec: str = "DIB ", quality: int = 85) -> bytes:
    """Minimal valid AVI writer from ``DecodedImage`` frames (all one
    size): raw bottom-up BGR DIB frames (``codec='DIB '``) or MJPEG
    (``codec='MJPG'``, each frame through the baseline JPEG encoder) —
    the fixture generator for video round-trip tests."""
    if not frames:
        raise ValueError("need at least one frame")
    if codec not in ("DIB ", "MJPG"):
        raise ValueError(f"unsupported codec {codec!r}")
    w, h = frames[0].width, frames[0].height
    if any(f.width != w or f.height != h for f in frames):
        raise ValueError("all frames must share one size")

    bodies = []
    for f in frames:
        if codec == "MJPG":
            px = f if f.mode in ("RGB", "L") else \
                DecodedImage(f.width, f.height, "RGB", f.pixels)
            bodies.append(encode_jpeg(px.width, px.height, px.mode,
                                      px.pixels, quality=quality))
        else:
            bodies.append(_rgb_to_dib(f))
    buf_size = max(len(b) for b in bodies)

    def chunk(tag: bytes, data: bytes) -> bytes:
        return tag + struct.pack("<I", len(data)) + data + \
            (b"\x00" if len(data) & 1 else b"")

    def lst(tag: bytes, data: bytes) -> bytes:
        return chunk(b"LIST", tag + data)

    us_per_frame = (1_000_000 * scale) // rate
    avih = struct.pack("<IIIIIIIIII", us_per_frame, buf_size * rate // scale,
                       0, 0x10, len(frames), 0, 1, buf_size, w, h) + b"\x00" * 16
    handler = b"MJPG" if codec == "MJPG" else b"DIB "
    strh = (b"vids" + handler +
            struct.pack("<IHHIIIIIIIi", 0, 0, 0, 0, scale, rate, 0,
                        len(frames), buf_size, 0, 0) +
            struct.pack("<hhhh", 0, 0, w, h))
    compression = struct.unpack("<I", b"MJPG")[0] if codec == "MJPG" else 0
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, compression,
                       _avi_row_stride(w) * h, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    tag = b"00dc" if codec == "MJPG" else b"00db"
    movi_items = [chunk(tag, b) for b in bodies]
    movi = lst(b"movi", b"".join(movi_items))
    idx, off = [], 4
    for body, item in zip(bodies, movi_items):
        idx.append(tag + struct.pack("<III", 0x10, off, len(body)))
        off += len(item)
    idx1 = chunk(b"idx1", b"".join(idx))
    return chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


# ---------------------------------------------------------------------------
# MP4 / ISO BMFF (container metadata walk — no codec payload decode)
# ---------------------------------------------------------------------------
# Real crawls are mostly MP4; decoding H.264/AAC payloads needs codec
# libraries this container doesn't ship, but the CONTAINER metadata —
# duration, track layout, codec fourccs, video dimensions — lives in the
# moov box tree (ISO/IEC 14496-12) and walks in pure Python at
# footer-read cost.  That covers the curation decisions a 100 TB video
# pipeline actually makes per asset (keep/drop by duration, resolution,
# codec, track shape) without touching a single coded sample.

class Mp4Track(NamedTuple):
    kind: str          # "video" | "audio" | other hdlr fourcc, stripped
    codec: str         # stsd entry fourcc, e.g. "avc1", "mp4a"
    width: int         # tkhd 16.16 fixed -> int (0 for non-video)
    height: int
    duration_ms: int   # mdhd duration / mdhd timescale


class Mp4Meta(NamedTuple):
    brand: str         # ftyp major brand
    duration_ms: int   # mvhd duration / mvhd timescale
    tracks: list       # list[Mp4Track]

    @property
    def n_tracks(self) -> int:
        return len(self.tracks)


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _mp4_boxes(buf: bytes, start: int, end: int):
    """Yield (type, body_start, box_end) for each box in [start, end) —
    the one traversal primitive the whole ISO BMFF tree needs.  Handles
    32-bit, 64-bit (size==1) and to-end-of-file (size==0) box sizes."""
    off = start
    while off + 8 <= end:
        size = int.from_bytes(buf[off:off + 4], "big")
        btype = buf[off + 4:off + 8]
        hdr = 8
        if size == 1:
            if off + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            size = int.from_bytes(buf[off + 8:off + 16], "big")
            hdr = 16
        elif size == 0:
            size = end - off
        if size < hdr or off + size > end:
            raise ValueError("malformed MP4 box size")
        yield btype, off + hdr, off + size
        off += size


def _mp4_find(buf: bytes, start: int, end: int, btype: bytes):
    for t, b, e in _mp4_boxes(buf, start, end):
        if t == btype:
            return b, e
    return None


def _mp4_fullbox_fields(buf: bytes, body: int, v0_fields: int,
                        v1_fields: int) -> tuple[int, list[int]]:
    """Parse a full box's version byte and the leading
    creation/modification(+timescale/duration) block, which is 32-bit in
    version 0 and (mostly) 64-bit in version 1.  Returns (next_offset,
    [field values])."""
    version = buf[body]
    if version not in (0, 1):
        # ISO-BMFF reserves version bytes >= 2; a corrupt/adversarial file
        # must hit the probed=false fallback, not a TypeError mid-task
        raise ValueError(f"reserved fullbox version {version}")
    off = body + 4
    widths = ([4] * v0_fields) if version == 0 else None
    if version == 1:
        # v1 widens times and durations to 64-bit but keeps timescale 32
        widths = []
        for i in range(v1_fields):
            widths.append(4 if i == 2 else 8)
    vals = []
    for w_ in widths:
        vals.append(int.from_bytes(buf[off:off + w_], "big"))
        off += w_
    return off, vals


def probe_mp4(payload: bytes) -> Mp4Meta:
    """Walk an MP4/ISO-BMFF container's moov tree: ftyp brand, mvhd
    duration, and per-trak handler kind (hdlr), sample-entry codec
    fourcc (stsd) and video dimensions (tkhd 16.16 fixed point).  Pure
    metadata — coded samples (mdat) are never touched, so cost is
    O(moov bytes), the same envelope as a parquet footer read.  Raises
    ValueError on anything that is not a well-formed MP4."""
    if sniff_format(payload) != "mp4":
        raise ValueError("not an MP4 (ftyp) payload")
    end = len(payload)
    brand = payload[8:12].decode("ascii", "replace").strip()
    moov = _mp4_find(payload, 0, end, b"moov")
    if moov is None:
        raise ValueError("MP4 missing moov box")
    ms, me = moov
    mvhd = _mp4_find(payload, ms, me, b"mvhd")
    if mvhd is None:
        raise ValueError("MP4 moov missing mvhd")
    _, vals = _mp4_fullbox_fields(payload, mvhd[0], 4, 4)
    timescale, duration = vals[2], vals[3]
    duration_ms = (duration * 1000) // timescale if timescale else 0

    tracks = []
    for t, b, e in _mp4_boxes(payload, ms, me):
        if t != b"trak":
            continue
        width = height = 0
        kind = codec = ""
        tk_ms = 0
        tkhd = _mp4_find(payload, b, e, b"tkhd")
        if tkhd is not None:
            tb = tkhd[0]
            version = payload[tb]
            # v0: cre4 mod4 id4 res4 dur4 ; v1: cre8 mod8 id4 res4 dur8
            fixed = tb + 4 + (20 if version == 0 else 32)
            # reserved8 layer2 alt2 volume2 reserved2 matrix36 -> w/h
            wh = fixed + 8 + 2 + 2 + 2 + 2 + 36
            width = int.from_bytes(payload[wh:wh + 4], "big") >> 16
            height = int.from_bytes(payload[wh + 4:wh + 8], "big") >> 16
        mdia = _mp4_find(payload, b, e, b"mdia")
        if mdia is not None:
            mb, me2 = mdia
            mdhd = _mp4_find(payload, mb, me2, b"mdhd")
            if mdhd is not None:
                _, mv = _mp4_fullbox_fields(payload, mdhd[0], 4, 4)
                tk_ms = (mv[3] * 1000) // mv[2] if mv[2] else 0
            hdlr = _mp4_find(payload, mb, me2, b"hdlr")
            if hdlr is not None:
                handler = payload[hdlr[0] + 8:hdlr[0] + 12]
                kind = {b"vide": "video", b"soun": "audio"}.get(
                    handler, handler.decode("ascii", "replace").strip())
            minf = _mp4_find(payload, mb, me2, b"minf")
            if minf is not None:
                stbl = _mp4_find(payload, minf[0], minf[1], b"stbl")
                if stbl is not None:
                    stsd = _mp4_find(payload, stbl[0], stbl[1], b"stsd")
                    if stsd is not None:
                        sb = stsd[0]
                        n_entries = int.from_bytes(payload[sb + 4:sb + 8],
                                                   "big")
                        if n_entries >= 1:
                            codec = payload[sb + 12:sb + 16].decode(
                                "ascii", "replace").strip()
        tracks.append(Mp4Track(kind, codec, width, height, tk_ms))
    return Mp4Meta(brand, duration_ms, tracks)


def _mp4_box(btype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + btype + payload


_MP4_UNITY_MATRIX = struct.pack(">9i", 0x00010000, 0, 0,
                                0, 0x00010000, 0,
                                0, 0, 0x40000000)


def encode_mp4(duration_ms: int, tracks: list, timescale: int = 1000,
               brand: str = "isom") -> bytes:
    """Minimal valid MP4 writer: ftyp + moov (mvhd + one trak per entry
    with tkhd/mdia/mdhd/hdlr/minf/stbl/stsd) + an empty mdat.  ``tracks``
    entries are dicts with kind ("video"|"audio"), codec (fourcc str),
    width, height, duration_ms.  Metadata-only by design (no coded
    samples — the honest envelope probe_mp4 reads); fixture builder for
    the container-walk tests and gate."""
    duration = (duration_ms * timescale) // 1000
    mvhd = _mp4_box(b"mvhd", struct.pack(
        ">B3xIIII", 0, 0, 0, timescale, duration)
        + struct.pack(">i", 0x00010000)      # rate 1.0
        + struct.pack(">h", 0x0100)          # volume 1.0
        + b"\x00" * 10                        # reserved
        + _MP4_UNITY_MATRIX
        + b"\x00" * 24                        # pre_defined
        + struct.pack(">I", len(tracks) + 1))
    traks = b""
    for i, t in enumerate(tracks):
        tk_dur = (int(t["duration_ms"]) * timescale) // 1000
        handler = {"video": b"vide", "audio": b"soun"}.get(
            t["kind"], t["kind"].encode("ascii")[:4].ljust(4))
        fourcc = t["codec"].encode("ascii")[:4].ljust(4)
        tkhd = _mp4_box(
            b"tkhd",
            struct.pack(">B", 0) + b"\x00\x00\x07"   # v0, flags=enabled
            + struct.pack(">IIIII", 0, 0, i + 1, 0, tk_dur)
            + b"\x00" * 8                             # reserved
            + struct.pack(">hhhh", 0, 0, 0, 0)        # layer/alt/vol/res
            + _MP4_UNITY_MATRIX
            + struct.pack(">II", int(t["width"]) << 16,
                          int(t["height"]) << 16))
        # mdhd track timescale mirrors the movie's for simplicity
        mdhd = _mp4_box(b"mdhd", struct.pack(
            ">B3xIIIIHH", 0, 0, 0, timescale,
            (int(t["duration_ms"]) * timescale) // 1000, 0x55C4, 0))
        hdlr = _mp4_box(b"hdlr", struct.pack(">B3xI", 0, 0) + handler
                        + b"\x00" * 12 + b"steel\x00")
        entry = struct.pack(">I", 16) + fourcc + b"\x00" * 6 \
            + struct.pack(">H", 1)
        stsd = _mp4_box(b"stsd", struct.pack(">B3xI", 0, 1) + entry)
        stbl = _mp4_box(b"stbl", stsd)
        minf = _mp4_box(b"minf", stbl)
        mdia = _mp4_box(b"mdia", mdhd + hdlr + minf)
        traks += _mp4_box(b"trak", tkhd + mdia)
    moov = _mp4_box(b"moov", mvhd + traks)
    ftyp = _mp4_box(b"ftyp", brand.encode("ascii")[:4].ljust(4)
                    + struct.pack(">I", 0)
                    + brand.encode("ascii")[:4].ljust(4) + b"mp42")
    return ftyp + moov + _mp4_box(b"mdat", b"")


# ---------------------------------------------------------------------------
# MP3 (MPEG audio frame-header walk — no sample decode)
# ---------------------------------------------------------------------------
# The other big crawl format.  Like MP4, the curation fields (duration,
# bitrate, sample rate, channel mode, CBR/VBR) live in headers: an
# optional ID3v2 tag, then MPEG audio frames whose 4-byte headers carry
# the codec parameters, with VBR files declaring their exact frame count
# in a Xing/Info tag inside the first frame.  Sample (audio) decode needs
# codec libs this container doesn't ship — header walk only, same honest
# envelope as probe_mp4.

class Mp3Meta(NamedTuple):
    version: str        # "1" | "2" | "2.5"
    layer: int          # 1..3
    bitrate_kbps: int   # first frame's (CBR: the file's)
    sample_rate: int
    channels: int       # 1 (mono) or 2
    vbr: bool           # Xing/Info frame-count tag present
    n_frames: int       # exact for VBR (Xing), estimated for CBR
    duration_ms: int


_MP3_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192,
                      224, 256, 320, 0]
_MP3_BITRATES_V2L3 = [0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                      144, 160, 0]
# Layer I / Layer II bitrate tables (ISO/IEC 11172-3 table B.1 and the
# MPEG-2 LSF annex): MPEG-2/2.5 share one table for layers II and III.
_MP3_BITRATES_V1L1 = [0, 32, 64, 96, 128, 160, 192, 224, 256, 288, 320,
                      352, 384, 416, 448, 0]
_MP3_BITRATES_V1L2 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
                      256, 320, 384, 0]
_MP3_BITRATES_V2L1 = [0, 32, 48, 56, 64, 80, 96, 112, 128, 144, 160, 176,
                      192, 224, 256, 0]


def _mp3_bitrate_table(version: str, layer: int) -> list[int]:
    if version == "1":
        return {1: _MP3_BITRATES_V1L1, 2: _MP3_BITRATES_V1L2,
                3: _MP3_BITRATES_V1L3}[layer]
    return _MP3_BITRATES_V2L1 if layer == 1 else _MP3_BITRATES_V2L3
_MP3_RATES = {"1": [44100, 48000, 32000, 0],
              "2": [22050, 24000, 16000, 0],
              "2.5": [11025, 12000, 8000, 0]}


def _id3v2_size(payload: bytes) -> int:
    """Bytes to skip for a leading ID3v2 tag (0 if none): 'ID3' + ver(2)
    + flags(1) + 4-byte SYNCSAFE size (7 bits per byte) + that many
    bytes of tag body."""
    if payload[:3] != b"ID3" or len(payload) < 10:
        return 0
    size = ((payload[6] & 0x7F) << 21) | ((payload[7] & 0x7F) << 14) \
        | ((payload[8] & 0x7F) << 7) | (payload[9] & 0x7F)
    return 10 + size


def probe_mp3(payload: bytes) -> Mp3Meta:
    """Walk an MPEG-audio stream's headers: skip ID3v2, sync on the first
    frame (11 set bits), decode version/layer/bitrate/samplerate/channel
    mode from its 4-byte header, and read the Xing/Info VBR tag if
    present (exact frame count → exact duration); CBR duration estimates
    from audio bytes x 8 / bitrate.  Never touches coded samples.
    Raises ValueError for anything that is not MPEG audio."""
    start = _id3v2_size(payload)
    n = len(payload)
    off = start
    # scan (bounded) for the frame sync — real files can carry junk
    # between the tag and the first frame
    limit = min(n - 4, start + 4096)
    while off <= limit:
        if payload[off] == 0xFF and (payload[off + 1] & 0xE0) == 0xE0:
            break
        off += 1
    else:
        raise ValueError("no MPEG audio frame sync found")
    h = payload[off:off + 4]
    ver_bits = (h[1] >> 3) & 0x3
    version = {0: "2.5", 2: "2", 3: "1"}.get(ver_bits)
    if version is None:
        raise ValueError("reserved MPEG version")
    layer = {1: 3, 2: 2, 3: 1}.get((h[1] >> 1) & 0x3)
    if layer is None:
        raise ValueError("reserved MPEG layer")
    br_idx = (h[2] >> 4) & 0xF
    sr_idx = (h[2] >> 2) & 0x3
    bitrate = _mp3_bitrate_table(version, layer)[br_idx]
    sample_rate = _MP3_RATES[version][sr_idx]
    if not bitrate or not sample_rate:
        raise ValueError("free/reserved bitrate or sample rate")
    mode = (h[3] >> 6) & 0x3
    channels = 1 if mode == 3 else 2
    # samples/frame: Layer I 384, Layer II 1152, Layer III 1152 (MPEG-1)
    # or 576 (MPEG-2/2.5 LSF) — per-layer per 11172-3 / 13818-3
    if layer == 1:
        spf = 384
        # Layer I slots are 4 bytes: frame = floor(12*br/sr) * 4
        frame_len = (12 * bitrate * 1000 // sample_rate) * 4
    else:
        spf = 1152 if (layer == 2 or version == "1") else 576
        frame_len = (spf // 8) * bitrate * 1000 // sample_rate

    # Xing/Info VBR tag sits after the Layer-III side info inside the
    # first frame — it is a Layer-III convention only; Layer I/II files
    # are treated as CBR (frame count estimated from stream length)
    vbr = False
    if layer == 3:
        side = (17 if channels == 1 else 32) if version == "1" \
            else (9 if channels == 1 else 17)
        tag_off = off + 4 + side
        vbr = payload[tag_off:tag_off + 4] in (b"Xing", b"Info")
    if vbr and (payload[tag_off + 7] & 0x1):  # frames field present
        n_frames = int.from_bytes(payload[tag_off + 8:tag_off + 12], "big")
    else:
        vbr = False
        n_frames = max(0, (n - off)) // max(frame_len, 1)
    duration_ms = n_frames * spf * 1000 // sample_rate
    return Mp3Meta(version, layer, bitrate, sample_rate, channels, vbr,
                   n_frames, duration_ms)


def encode_mp3(n_frames: int, bitrate_kbps: int = 128,
               sample_rate: int = 44100, channels: int = 2,
               id3_bytes: int = 0) -> bytes:
    """Minimal valid MPEG-1 layer III CBR stream: optional ID3v2 shell +
    ``n_frames`` frames with correct headers and zero-filled payloads —
    the headers are what probe_mp3 reads; coded samples are zeros by
    design (metadata-only fixture builder, same honesty as encode_mp4)."""
    table = _MP3_BITRATES_V1L3
    if bitrate_kbps not in table:
        raise ValueError(f"unsupported CBR bitrate {bitrate_kbps}")
    rates = _MP3_RATES["1"]
    if sample_rate not in rates:
        raise ValueError(f"unsupported MPEG-1 sample rate {sample_rate}")
    br_idx = table.index(bitrate_kbps)
    sr_idx = rates.index(sample_rate)
    mode = 3 if channels == 1 else 0
    hdr = bytes([0xFF,
                 0xE0 | (3 << 3) | (1 << 1) | 1,   # v1, layer III, no CRC
                 (br_idx << 4) | (sr_idx << 2),
                 mode << 6])
    frame_len = 144 * bitrate_kbps * 1000 // sample_rate
    frame = hdr + b"\x00" * (frame_len - 4)
    id3 = b""
    if id3_bytes:
        body = id3_bytes
        size = bytes([(body >> 21) & 0x7F, (body >> 14) & 0x7F,
                      (body >> 7) & 0x7F, body & 0x7F])
        id3 = b"ID3\x04\x00\x00" + size + b"\x00" * body
    return id3 + frame * n_frames


# ---------------------------------------------------------------------------
# WebM / Matroska (EBML element walk — no codec decode)
# ---------------------------------------------------------------------------
# The third big crawl container.  EBML is a TLV tree: variable-length
# element IDs (leading-zeros-coded, marker bit KEPT) and sizes (marker
# bit STRIPPED); the curation fields live under Segment > Info
# (TimestampScale, Duration) and Segment > Tracks > TrackEntry
# (TrackType, CodecID, Video > PixelWidth/PixelHeight).  Clusters (the
# coded media) are skipped by size — the same footer-read envelope as
# probe_mp4/probe_mp3.

class WebmTrack(NamedTuple):
    kind: str          # "video" | "audio" | other TrackType
    codec: str         # CodecID, e.g. "V_VP9", "A_OPUS"
    width: int
    height: int


class WebmMeta(NamedTuple):
    doctype: str       # "webm" | "matroska"
    duration_ms: int
    tracks: list       # list[WebmTrack]

    @property
    def n_tracks(self) -> int:
        return len(self.tracks)


_EBML_MAGIC = b"\x1a\x45\xdf\xa3"


def _ebml_vint(buf: bytes, off: int, keep_marker: bool) -> tuple[int, int]:
    """(value, next_offset) for one EBML variable-length integer."""
    if off >= len(buf):
        raise ValueError("truncated EBML vint")
    first = buf[off]
    if first == 0:
        raise ValueError("invalid EBML vint (zero lead byte)")
    length = 8 - first.bit_length() + 1
    if off + length > len(buf):
        raise ValueError("truncated EBML vint body")
    val = first if keep_marker else first & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        val = (val << 8) | buf[off + i]
    return val, off + length


def _ebml_children(buf: bytes, start: int, end: int):
    """Yield (element_id, body_start, body_end) for each child element."""
    off = start
    while off < end:
        eid, off = _ebml_vint(buf, off, keep_marker=True)
        size, off = _ebml_vint(buf, off, keep_marker=False)
        if off + size > end:
            raise ValueError("EBML element overruns its parent")
        yield eid, off, off + size
        off += size


def _ebml_find(buf: bytes, start: int, end: int, eid: int):
    for i, b, e in _ebml_children(buf, start, end):
        if i == eid:
            return b, e
    return None


_ID_SEGMENT = 0x18538067
_ID_INFO = 0x1549A966
_ID_TS_SCALE = 0x2AD7B1
_ID_DURATION = 0x4489
_ID_TRACKS = 0x1654AE6B
_ID_TRACK_ENTRY = 0xAE
_ID_TRACK_TYPE = 0x83
_ID_CODEC_ID = 0x86
_ID_VIDEO = 0xE0
_ID_PIXEL_W = 0xB0
_ID_PIXEL_H = 0xBA
_ID_DOCTYPE = 0x4282


def _ebml_uint(buf: bytes, b: int, e: int) -> int:
    return int.from_bytes(buf[b:e], "big")


def probe_webm(payload: bytes) -> WebmMeta:
    """Walk a WebM/Matroska file's EBML tree: DocType from the EBML
    header, Duration x TimestampScale from Segment>Info, and per-track
    type / CodecID / video dimensions from Segment>Tracks.  Cluster
    payloads are skipped wholesale.  Raises ValueError for non-EBML or
    malformed input."""
    if payload[:4] != _EBML_MAGIC:
        raise ValueError("not an EBML (WebM/Matroska) payload")
    end = len(payload)
    doctype = "matroska"
    it = _ebml_children(payload, 0, end)
    header = next(it, None)
    if header is None:
        raise ValueError("empty EBML stream")
    _hid, hb, he = header
    dt = _ebml_find(payload, hb, he, _ID_DOCTYPE)
    if dt is not None:
        doctype = payload[dt[0]:dt[1]].decode("ascii", "replace")
    seg = None
    for eid, b, e in it:
        if eid == _ID_SEGMENT:
            seg = (b, e)
            break
    if seg is None:
        raise ValueError("EBML missing Segment")
    sb, se = seg
    ts_scale, dur = 1_000_000, 0.0
    info = _ebml_find(payload, sb, se, _ID_INFO)
    if info is not None:
        t = _ebml_find(payload, info[0], info[1], _ID_TS_SCALE)
        if t is not None:
            ts_scale = _ebml_uint(payload, *t)
        d = _ebml_find(payload, info[0], info[1], _ID_DURATION)
        if d is not None:
            raw = payload[d[0]:d[1]]
            dur = struct.unpack(">f" if len(raw) == 4 else ">d", raw)[0]
    duration_ms = int(dur * ts_scale / 1e6)
    tracks = []
    tr = _ebml_find(payload, sb, se, _ID_TRACKS)
    if tr is not None:
        for eid, b, e in _ebml_children(payload, tr[0], tr[1]):
            if eid != _ID_TRACK_ENTRY:
                continue
            kind, codec, w, h = "", "", 0, 0
            tt = _ebml_find(payload, b, e, _ID_TRACK_TYPE)
            if tt is not None:
                kind = {1: "video", 2: "audio"}.get(
                    _ebml_uint(payload, *tt),
                    str(_ebml_uint(payload, *tt)))
            c = _ebml_find(payload, b, e, _ID_CODEC_ID)
            if c is not None:
                codec = payload[c[0]:c[1]].decode("ascii", "replace")
            v = _ebml_find(payload, b, e, _ID_VIDEO)
            if v is not None:
                pw = _ebml_find(payload, v[0], v[1], _ID_PIXEL_W)
                ph = _ebml_find(payload, v[0], v[1], _ID_PIXEL_H)
                w = _ebml_uint(payload, *pw) if pw else 0
                h = _ebml_uint(payload, *ph) if ph else 0
            tracks.append(WebmTrack(kind, codec, w, h))
    return WebmMeta(doctype, duration_ms, tracks)


def _ebml_encode_vint(val: int, keep_marker: bool) -> bytes:
    """Encode an EBML id (already marker-carrying) or size."""
    if keep_marker:
        length = (val.bit_length() + 7) // 8
        return val.to_bytes(length, "big")
    for length in range(1, 9):
        if val < (1 << (7 * length)) - 1:
            return ((1 << (7 * length)) | val).to_bytes(length, "big")
    raise ValueError("EBML size too large")


def _ebml_el(eid: int, body: bytes) -> bytes:
    return _ebml_encode_vint(eid, True) + \
        _ebml_encode_vint(len(body), False) + body


def encode_webm(duration_ms: int, tracks: list,
                doctype: str = "webm",
                timestamp_scale: int = 1_000_000) -> bytes:
    """Minimal valid WebM/Matroska writer: EBML header (DocType) +
    Segment(Info(TimestampScale, Duration) + Tracks(TrackEntry...)).
    ``tracks`` entries are dicts with kind ("video"|"audio"), codec,
    width, height.  Metadata-only fixture builder (no Clusters), the
    probe_webm counterpart."""
    header = _ebml_el(0x1A45DFA3,
                      _ebml_el(_ID_DOCTYPE, doctype.encode("ascii")))
    dur = duration_ms * 1e6 / timestamp_scale
    info = _ebml_el(_ID_INFO,
                    _ebml_el(_ID_TS_SCALE,
                             timestamp_scale.to_bytes(4, "big"))
                    + _ebml_el(_ID_DURATION, struct.pack(">d", dur)))
    entries = b""
    for t in tracks:
        body = _ebml_el(_ID_TRACK_TYPE,
                        bytes([{"video": 1, "audio": 2}.get(t["kind"], 3)]))
        body += _ebml_el(_ID_CODEC_ID, t["codec"].encode("ascii"))
        if t["kind"] == "video":
            body += _ebml_el(_ID_VIDEO,
                             _ebml_el(_ID_PIXEL_W,
                                      int(t["width"]).to_bytes(2, "big"))
                             + _ebml_el(_ID_PIXEL_H,
                                        int(t["height"]).to_bytes(2, "big")))
        entries += _ebml_el(_ID_TRACK_ENTRY, body)
    seg = _ebml_el(_ID_SEGMENT, info + _ebml_el(_ID_TRACKS, entries))
    return header + seg


# ---------------------------------------------------------------------------
# FLAC (STREAMINFO metadata-block walk — no frame decode)
# ---------------------------------------------------------------------------
# Free audio crawls carry FLAC alongside MP3/Ogg.  The curation fields all
# live in the mandatory first metadata block (STREAMINFO, 34 bytes after a
# 4-byte block header): sample rate (20 bits), channels (3+1), bits per
# sample (5+1), total samples (36 bits) — duration is a division, no coded
# frame is touched.  Public spec: RFC 9639 / xiph.org FLAC format.

class FlacMeta(NamedTuple):
    sample_rate: int
    channels: int
    bits_per_sample: int
    total_samples: int      # 0 = unknown per spec
    duration_ms: int


def probe_flac(payload: bytes) -> FlacMeta:
    """Parse the fLaC marker + STREAMINFO block.  Raises ValueError for
    anything that is not a well-formed FLAC stream head."""
    if payload[:4] != b"fLaC" or len(payload) < 4 + 4 + 34:
        raise ValueError("not a FLAC (fLaC) payload")
    btype = payload[4] & 0x7F
    blen = int.from_bytes(payload[5:8], "big")
    if btype != 0 or blen < 34:
        raise ValueError("FLAC missing mandatory STREAMINFO first block")
    si = payload[8:8 + 34]
    # bits 80..: sample_rate(20) channels(3)+1 bps(5)+1 total_samples(36)
    packed = int.from_bytes(si[10:18], "big")
    sample_rate = packed >> 44
    channels = ((packed >> 41) & 0x7) + 1
    bps = ((packed >> 36) & 0x1F) + 1
    total = packed & ((1 << 36) - 1)
    if sample_rate == 0:
        raise ValueError("FLAC reserved sample rate 0")
    return FlacMeta(sample_rate, channels, bps, total,
                    total * 1000 // sample_rate)


def encode_flac(total_samples: int, sample_rate: int = 44100,
                channels: int = 2, bits_per_sample: int = 16,
                padding: int = 0) -> bytes:
    """Minimal valid FLAC stream head: fLaC + STREAMINFO (+ optional
    PADDING block) — the headers probe_flac reads; coded frames are
    omitted by design (metadata-only fixture builder, the same honesty
    as encode_mp4/encode_mp3)."""
    if not 1 <= channels <= 8 or not 4 <= bits_per_sample <= 32:
        raise ValueError("channels 1-8, bits 4-32")
    packed = (sample_rate << 44) | ((channels - 1) << 41) \
        | ((bits_per_sample - 1) << 36) | (total_samples & ((1 << 36) - 1))
    si = (b"\x10\x00\x10\x00"      # min/max blocksize 4096
          + b"\x00\x00\x00" * 2    # min/max framesize unknown
          + packed.to_bytes(8, "big")
          + b"\x00" * 16)          # md5 of unencoded audio: zeros
    last = 0x00 if padding else 0x80
    out = b"fLaC" + bytes([last]) + len(si).to_bytes(3, "big") + si
    if padding:
        out += bytes([0x81]) + int(padding).to_bytes(3, "big") \
            + b"\x00" * padding
    return out


# ---------------------------------------------------------------------------
# Ogg Vorbis (page walk — no packet decode)
# ---------------------------------------------------------------------------
# The identification header (first packet of the first page) carries
# channels + sample rate; the LAST page's granule position is the total
# PCM sample count, so duration = granule / rate — both at footer-read
# cost (one seek to each end).  Public spec: RFC 3533 (Ogg) + the Vorbis I
# specification (xiph.org).

class OggMeta(NamedTuple):
    codec: str              # "vorbis" (other codecs probe as unsupported)
    channels: int
    sample_rate: int
    granule_end: int        # last page's granule position (PCM samples)
    duration_ms: int


def probe_ogg(payload: bytes) -> OggMeta:
    """Walk the first Ogg page for the Vorbis identification header and
    the last page for the ending granule position.  Raises ValueError for
    non-Ogg payloads or non-Vorbis streams (honest fallback upstream)."""
    if payload[:4] != b"OggS" or len(payload) < 28:
        raise ValueError("not an Ogg (OggS) payload")
    if payload[4] != 0:
        raise ValueError("reserved Ogg version")
    n_seg = payload[26]
    body = 27 + n_seg
    first = payload[body:body + 7 + 23]
    if first[:7] != b"\x01vorbis":
        raise ValueError("first Ogg packet is not a Vorbis id header")
    channels = first[11]
    sample_rate = int.from_bytes(first[12:16], "little")
    if not channels or not sample_rate:
        raise ValueError("Vorbis id header with zero channels/rate")
    last = payload.rfind(b"OggS")
    if last + 14 > len(payload):
        raise ValueError("truncated final Ogg page header")
    granule = int.from_bytes(payload[last + 6:last + 14], "little")
    if granule == 0xFFFFFFFFFFFFFFFF:  # -1 = no packet ends on this page
        granule = 0
    return OggMeta("vorbis", channels, sample_rate, granule,
                   granule * 1000 // sample_rate)


def encode_ogg(total_samples: int, sample_rate: int = 44100,
               channels: int = 2, serial: int = 1) -> bytes:
    """Minimal valid Ogg Vorbis shell: a BOS page carrying the Vorbis
    identification header and an EOS page whose granule position is
    ``total_samples`` — exactly the two structures probe_ogg reads; audio
    packets are omitted by design (metadata-only fixture builder).  Page
    CRCs are zero: the probe (like many tail-seek duration scanners)
    does not checksum pages."""
    ident = (b"\x01vorbis" + (0).to_bytes(4, "little")
             + bytes([channels]) + sample_rate.to_bytes(4, "little")
             + (0).to_bytes(12, "little")     # max/nominal/min bitrate
             + b"\xb8"                         # blocksizes 2^8 / 2^11
             + b"\x01")                        # framing bit
    def page(header_type: int, granule: int, seq: int, body: bytes) -> bytes:
        segs = []
        n = len(body)
        while n >= 255:
            segs.append(255)
            n -= 255
        segs.append(n)
        return (b"OggS\x00" + bytes([header_type])
                + granule.to_bytes(8, "little", signed=False)
                + serial.to_bytes(4, "little")
                + seq.to_bytes(4, "little")
                + (0).to_bytes(4, "little")    # CRC zero (see docstring)
                + bytes([len(segs)]) + bytes(segs) + body)
    return page(0x02, 0, 0, ident) + page(0x04, total_samples, 1, b"")


# ---------------------------------------------------------------------------
# MPEG-TS (transport-stream packet walk — no PES/codec decode)
# ---------------------------------------------------------------------------
# The broadcast/HLS container.  Curation fields come from three structures,
# all at header cost: the PAT (PID 0) names the program map PID, the PMT
# lists per-elementary-stream types (codec ids), and PCR timestamps in
# adaptation fields bound the duration ((last-first)/27 MHz).  Coded PES
# payloads are never touched.  Public spec: ISO/IEC 13818-1.

_TS_PACKET = 188
_TS_STREAM_KINDS = {
    0x01: ("video", "mpeg1"), 0x02: ("video", "mpeg2"),
    0x10: ("video", "mpeg4"), 0x1B: ("video", "h264"),
    0x24: ("video", "hevc"),
    0x03: ("audio", "mp3"), 0x04: ("audio", "mp3"),
    0x0F: ("audio", "aac"), 0x11: ("audio", "aac_latm"),
    0x81: ("audio", "ac3"),
}


class TsTrack(NamedTuple):
    kind: str           # "video" | "audio" | "other"
    codec: str          # decoded stream-type name or hex id
    pid: int


class TsMeta(NamedTuple):
    n_packets: int
    program_number: int
    duration_ms: int    # (last PCR - first PCR) / 27 MHz; 0 if < 2 PCRs
    tracks: list        # list[TsTrack]

    @property
    def n_tracks(self) -> int:
        return len(self.tracks)


def _ts_payload(pkt: bytes) -> bytes:
    afc = (pkt[3] >> 4) & 0x3
    off = 4
    if afc & 0x2:                      # adaptation field present
        off += 1 + pkt[4]
    return pkt[off:] if afc & 0x1 else b""


def _ts_pcr(pkt: bytes) -> int | None:
    """27 MHz PCR from the adaptation field, or None."""
    afc = (pkt[3] >> 4) & 0x3
    if not (afc & 0x2) or pkt[4] < 7 or not (pkt[5] & 0x10):
        return None
    b = pkt[6:12]
    base = (int.from_bytes(b[:5], "big") >> 7)          # 33 bits
    ext = ((b[4] & 0x1) << 8) | b[5]                    # 9 bits
    return base * 300 + ext


def probe_mpegts(payload: bytes) -> TsMeta:
    """Walk TS packets: PAT → PMT → per-stream types, PCR span → duration.
    Raises ValueError for anything that is not sync-aligned MPEG-TS or
    lacks the PAT/PMT tables (honest fallback upstream)."""
    n = len(payload)
    if n < 2 * _TS_PACKET or n % _TS_PACKET:
        raise ValueError("not packet-aligned MPEG-TS")
    pkts = [payload[i:i + _TS_PACKET] for i in range(0, n, _TS_PACKET)]
    if any(p[0] != 0x47 for p in pkts):
        raise ValueError("lost MPEG-TS sync byte")
    pmt_pid = prog = None
    for p in pkts:                                       # PAT on PID 0
        pid = ((p[1] & 0x1F) << 8) | p[2]
        if pid == 0 and (p[1] & 0x40):                   # PUSI set
            sec = _ts_payload(p)
            sec = sec[1 + sec[0]:]                       # pointer_field skip
            if not sec or sec[0] != 0x00:
                continue
            slen = ((sec[1] & 0x0F) << 8) | sec[2]
            loop = sec[8:3 + slen - 4]                   # minus CRC32
            for i in range(0, len(loop) - 3, 4):
                pn = int.from_bytes(loop[i:i + 2], "big")
                if pn != 0:                              # 0 = network PID
                    prog = pn
                    pmt_pid = ((loop[i + 2] & 0x1F) << 8) | loop[i + 3]
                    break
            break
    if pmt_pid is None:
        raise ValueError("MPEG-TS without a PAT program entry")
    tracks: list[TsTrack] = []
    pcr_first = pcr_last = None
    for p in pkts:
        pid = ((p[1] & 0x1F) << 8) | p[2]
        pcr = _ts_pcr(p)
        if pcr is not None:
            pcr_first = pcr if pcr_first is None else pcr_first
            pcr_last = pcr
        if pid == pmt_pid and (p[1] & 0x40) and not tracks:
            sec = _ts_payload(p)
            sec = sec[1 + sec[0]:]
            if not sec or sec[0] != 0x02:
                continue
            slen = ((sec[1] & 0x0F) << 8) | sec[2]
            pil = ((sec[10] & 0x0F) << 8) | sec[11]
            loop = sec[12 + pil:3 + slen - 4]
            i = 0
            while i + 5 <= len(loop):
                stype = loop[i]
                epid = ((loop[i + 1] & 0x1F) << 8) | loop[i + 2]
                esl = ((loop[i + 3] & 0x0F) << 8) | loop[i + 4]
                kind, codec = _TS_STREAM_KINDS.get(
                    stype, ("other", f"0x{stype:02x}"))
                tracks.append(TsTrack(kind, codec, epid))
                i += 5 + esl
    if not tracks:
        raise ValueError("MPEG-TS without a parsable PMT")
    dur = 0
    if pcr_first is not None and pcr_last is not None \
            and pcr_last >= pcr_first:
        dur = (pcr_last - pcr_first) * 1000 // 27_000_000
    return TsMeta(len(pkts), prog or 0, dur, tracks)


def _ts_packet(pid: int, payload: bytes = b"", pusi: bool = False,
               cc: int = 0, pcr: int | None = None) -> bytes:
    hdr = bytes([0x47, (0x40 if pusi else 0) | (pid >> 8), pid & 0xFF, 0])
    af = b""
    if pcr is not None:
        base, ext = divmod(pcr, 300)
        six = (base << 15) | (0x3F << 9) | ext
        af_body = bytes([0x10]) + six.to_bytes(6, "big")
    else:
        af_body = b""
    room = _TS_PACKET - 4 - len(payload)
    if af_body or room > 0:
        if not af_body and room > 1:
            af_body = b"\x00"   # flags byte: stuffing must NOT look like PCR
        stuff = room - 1 - len(af_body)
        af = bytes([len(af_body) + max(stuff, 0)]) + af_body \
            + b"\xff" * max(stuff, 0)
    afc = (0x2 if af else 0) | (0x1 if payload else 0)
    out = bytearray(hdr + af + payload)
    out[3] = (afc << 4) | (cc & 0xF)
    return bytes(out.ljust(_TS_PACKET, b"\xff"))


def _ts_section(table_id: int, body: bytes) -> bytes:
    """pointer_field + section header + body + placeholder CRC32 (the
    probe never checksums sections — same leniency as encode_ogg)."""
    slen = len(body) + 5 + 4   # after section_length: 5 fixed + body + crc
    sec = bytes([table_id, 0xB0 | (slen >> 8), slen & 0xFF]) \
        + (1).to_bytes(2, "big") + bytes([0xC1, 0, 0]) + body \
        + b"\x00\x00\x00\x00"
    return b"\x00" + sec


def encode_mpegts(duration_ms: int, streams: list,
                  program_number: int = 1) -> bytes:
    """Minimal valid MPEG-TS shell: PAT + PMT + two PCR-bearing packets
    spanning ``duration_ms`` — exactly the structures probe_mpegts reads;
    PES payloads are omitted by design (metadata-only fixture builder).
    ``streams`` entries are (kind, codec) pairs from _TS_STREAM_KINDS
    values, e.g. [("video", "h264"), ("audio", "aac")]."""
    by_name = {v: k for k, v in _TS_STREAM_KINDS.items()}
    pmt_pid, pcr_pid = 0x100, 0x101
    pat_body = program_number.to_bytes(2, "big") \
        + bytes([0xE0 | (pmt_pid >> 8), pmt_pid & 0xFF])
    es = b""
    for i, (kind, codec) in enumerate(streams):
        stype = by_name.get((kind, codec))
        if stype is None:
            raise ValueError(f"unsupported TS stream {(kind, codec)!r}")
        epid = 0x101 + i
        es += bytes([stype, 0xE0 | (epid >> 8), epid & 0xFF, 0xF0, 0x00])
    pmt_body = bytes([0xE0 | (pcr_pid >> 8), pcr_pid & 0xFF, 0xF0, 0x00]) + es
    pcr_end = duration_ms * 27_000
    return (_ts_packet(0, _ts_section(0x00, pat_body), pusi=True)
            + _ts_packet(pmt_pid, _ts_section(0x02, pmt_body), pusi=True)
            + _ts_packet(pcr_pid, pcr=0)
            + _ts_packet(pcr_pid, pcr=pcr_end, cc=1))
