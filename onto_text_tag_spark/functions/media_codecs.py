"""Real media codecs, stdlib-only: PNG (full encode + pixel decode),
JPEG / GIF header parse, WAV (encode + parse), minimal MP4 box parse.

The multimodal operators (operators/multimodal.py) treat payloads as
opaque ``binary`` columns and run decode / feature-extract / resize as
Arrow-batched kernels.  This container has no Pillow/ffmpeg, but the
formats below are decodable with ``zlib`` + ``struct`` alone, so these
kernels are GENUINE codecs over genuine file bytes, not structural
fakes:

* PNG — full spec subset: chunk walk + CRC verify, IHDR metadata,
  IDAT zlib inflate, scanline unfiltering (all five filter types:
  None/Sub/Up/Average/Paeth), and the encode twin (filter-0 scanlines,
  correct CRCs) used to synthesize deterministic test corpora.  8-bit
  gray / RGB / RGBA pixel decode; metadata parse for every color type.
* JPEG — marker walk to the first SOF0/1/2 frame header for
  (width, height, channels); full BASELINE (SOF0) pixel decode
  (canonical huffman + FF00 unstuffing + DRI/RSTn, dequantize, float64
  IDCT, 4:2:0/4:2:2 nearest chroma upsampling, JFIF YCbCr→RGB) and the
  encode twin (4:4:4 or 4:2:0, Annex K tables under the libjpeg
  quality rule).  Progressive/extended-sequential streams raise — the
  explicit scope line.
* GIF — logical screen descriptor (87a/89a).
* WAV — RIFF chunk walk: fmt (channels, sample rate, bit depth) +
  data size → duration; plus the PCM encode twin.
* MP4 — ISO BMFF box walk to ``moov/mvhd`` (version 0 and 1) for
  timescale + duration; plus a minimal valid ``ftyp+moov`` encoder for
  metadata-only video rows.
* AVI — full RIFF video container (hdrl/avih/strl/strh/strf + movi +
  idx1): encode + FRAME-PIXEL decode for uncompressed BI_RGB DIB
  ('00db', lossless bit-exact roundtrip) and Motion-JPEG ('00dc',
  via the baseline JPEG codec above) streams.

Everything is row-local and driver-free: the functions take/return
plain ``bytes``/numpy arrays and are called from ``mapInPandas``
batches, so the kernels scale exactly like the HTML extractor.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an 8-bit image array as a real PNG.

    ``pixels``: (h, w) gray, (h, w, 3) RGB, or (h, w, 4) RGBA, dtype
    uint8.  Scanlines use filter type 0; output round-trips through any
    PNG reader (and ``decode_png``)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        color_type, channels = 0, 1
        px = px[:, :, None]
    elif px.ndim == 3 and px.shape[2] == 3:
        color_type, channels = 2, 3
    elif px.ndim == 3 and px.shape[2] == 4:
        color_type, channels = 6, 4
    else:
        raise ValueError(f"unsupported pixel shape {px.shape}")
    h, w = px.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(
        b"\x00" + px[y].tobytes() for y in range(h)
    )  # filter byte 0 per scanline
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw, 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_chunks(payload: bytes, verify_crc: bool = True):
    if not payload.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG: bad signature")
    pos = len(PNG_SIGNATURE)
    while pos + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated PNG chunk {tag!r}")
        if verify_crc:
            (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
            if crc != zlib.crc32(tag + body) & 0xFFFFFFFF:
                raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        yield tag, body
        pos += 12 + length
        if tag == b"IEND":
            return


def png_info(payload: bytes) -> dict:
    """IHDR metadata: width, height, bit_depth, color_type, channels,
    interlace.  Works for every PNG color type."""
    for tag, body in _png_chunks(payload, verify_crc=False):
        if tag == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            return {
                "width": w,
                "height": h,
                "bit_depth": depth,
                "color_type": color,
                "channels": _PNG_CHANNELS.get(color),
                "interlace": interlace,
            }
    raise ValueError("PNG without IHDR")


def decode_png(payload: bytes) -> np.ndarray:
    """Full pixel decode for 8-bit non-interlaced gray/RGB/RGBA PNGs:
    inflate the IDAT stream and reverse the per-scanline filters
    (types 0-4 per the spec).  Returns (h, w) or (h, w, c) uint8."""
    info = png_info(payload)
    if info["bit_depth"] != 8 or info["interlace"] != 0:
        raise NotImplementedError(
            "pixel decode supports 8-bit non-interlaced PNGs "
            f"(got depth={info['bit_depth']}, "
            f"interlace={info['interlace']})"
        )
    if info["color_type"] not in (0, 2, 6):
        raise NotImplementedError(
            f"pixel decode supports gray/RGB/RGBA (color type "
            f"{info['color_type']} not implemented)"
        )
    w, h, c = info["width"], info["height"], info["channels"]
    raw = zlib.decompress(
        b"".join(body for tag, body in _png_chunks(payload)
                 if tag == b"IDAT")
    )
    stride = w * c
    if len(raw) != h * (1 + stride):
        raise ValueError("PNG pixel data size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.intp)
    for y in range(h):
        ftype = raw[y * (1 + stride)]
        line = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (1 + stride) + 1
        ).astype(np.intp)
        if ftype == 0:  # None
            cur = line
        elif ftype == 1:  # Sub
            cur = line.copy()
            for x in range(c, stride):
                cur[x] = (cur[x] + cur[x - c]) & 0xFF
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 3:  # Average
            cur = line.copy()
            for x in range(stride):
                left = cur[x - c] if x >= c else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line.copy()
            for x in range(stride):
                a = cur[x - c] if x >= c else 0
                b = prev[x]
                cc = prev[x - c] if x >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = cc
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, c)
    return px[:, :, 0] if c == 1 else px


def resize_nearest(pixels: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w[, c]) uint8 array — the
    codec-free image op the resize stage runs between decode and
    re-encode."""
    px = np.asarray(pixels)
    h, w = px.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return px[ys][:, xs]


# ---------------------------------------------------------------------------
# JPEG — header parse + BASELINE (SOF0) pixel decode + encode twin
# ---------------------------------------------------------------------------

_JPEG_SOF = {0xC0, 0xC1, 0xC2}  # baseline, extended sequential, progressive

# ITU-T T.81 Annex K reference tables (public spec constants): the
# quantization matrices every quality scale derives from and the
# "typical" huffman tables virtually all baseline encoders ship.
_JPEG_QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
_JPEG_QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)
# (BITS counts per code length 1..16, then the symbol values)
_DC_LUMA = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
            list(range(12)))
_DC_CHROMA = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
              list(range(12)))
_AC_LUMA = (
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)
_AC_CHROMA = (
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
     0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA],
)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

_IDCT_M = None


def _dct_matrix() -> np.ndarray:
    global _IDCT_M
    if _IDCT_M is None:
        u, x = np.mgrid[0:8, 0:8]
        m = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
        m[0, :] /= np.sqrt(2.0)
        _IDCT_M = m
    return _IDCT_M


def _huff_canonical(bits: list[int], vals: list[int]):
    """(code, length) per symbol in canonical order — the shared core of
    the encode map and the decode map."""
    out = []
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out.append((vals[k], code, length))
            k += 1
            code += 1
        code <<= 1
    return out


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment with FF00
    byte-unstuffing and RSTn awareness."""

    def __init__(self, buf: bytes, pos: int):
        self.buf = buf
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self):
        b = self.buf[self.pos]
        if b == 0xFF:
            nxt = self.buf[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt - 0xD0)
            else:
                raise ValueError(
                    f"unexpected marker 0xFF{nxt:02X} inside scan"
                )
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        """Drop pad bits and consume an expected RSTn marker."""
        self.acc = 0
        self.nbits = 0
        if (self.buf[self.pos] == 0xFF
                and 0xD0 <= self.buf[self.pos + 1] <= 0xD7):
            self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, n: int):
        self.n = n


def _receive_extend(reader: _BitReader, t: int) -> int:
    if t == 0:
        return 0
    v = reader.bits(t)
    if v < (1 << (t - 1)):
        v -= (1 << t) - 1
    return v


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a BASELINE (SOF0) JFIF/JPEG to uint8 pixels — (h, w) for
    grayscale, (h, w, 3) RGB otherwise.  Pure stdlib+numpy: marker
    walk, canonical huffman decode (with FF00 unstuffing and DRI/RSTn
    restart intervals), dequantize, float64 IDCT, nearest-neighbor
    chroma upsampling for subsampled scans, JFIF YCbCr→RGB.

    Progressive (SOF2) and extended-sequential (SOF1) streams raise
    ``ValueError`` — the honest scope line; baseline covers the
    overwhelming majority of web image payloads this engine's
    multimodal stages see."""
    if payload[:2] != b"\xFF\xD8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker desync at {pos}")
        marker = payload[pos + 1]
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        body = payload[pos + 4:pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(body):
                pq, tq = body[i] >> 4, body[i] & 0x0F
                i += 1
                if pq == 0:
                    tab = np.frombuffer(
                        body, dtype=np.uint8, count=64, offset=i
                    ).astype(np.int64)
                    i += 64
                else:
                    tab = np.frombuffer(
                        body[i:i + 128], dtype=">u2"
                    ).astype(np.int64)
                    i += 128
                qtabs[tq] = tab
        elif marker in (0xC1, 0xC2):
            kind = "progressive" if marker == 0xC2 else "extended"
            raise ValueError(
                f"unsupported JPEG ({kind} DCT): only baseline SOF0 "
                "pixel decode is implemented"
            )
        elif marker == 0xC0:  # SOF0
            _prec, h, w, nc = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(nc):
                cid, hv, tq = struct.unpack_from(
                    ">BBB", body, 6 + c * 3)
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 0x0F, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                tc, th = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1:i + 17])
                n = sum(bits)
                vals = list(body[i + 17:i + 17 + n])
                htabs[(tc, th)] = {
                    (length, code): sym
                    for sym, code, length in _huff_canonical(bits, vals)
                }
                i += 17 + n
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS
            ns = body[0]
            scomps = []
            for c in range(ns):
                cs, tdta = struct.unpack_from(">BB", body, 1 + c * 2)
                scomps.append(
                    {"id": cs, "td": tdta >> 4, "ta": tdta & 0x0F})
            data_start = pos + 2 + seglen
            return _decode_scan(
                payload, data_start, frame, scomps, qtabs, htabs,
                restart_interval,
            )
        pos += 2 + seglen
    raise ValueError("JPEG without SOS scan")


def _huff_decode(reader: _BitReader, table: dict) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in JPEG scan")


def _decode_scan(buf, pos, frame, scomps, qtabs, htabs, restart_interval):
    if frame is None:
        raise ValueError("JPEG SOS before SOF0")
    h, w, comps = frame["h"], frame["w"], frame["comps"]
    by_id = {c["id"]: c for c in comps}
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    m = _dct_matrix()
    planes = {}
    for c in comps:
        planes[c["id"]] = np.zeros(
            (mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
    pred = {c["id"]: 0 for c in comps}
    reader = _BitReader(buf, pos)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and \
                    mcu_count % restart_interval == 0:
                reader.align_to_marker()
                pred = {c["id"]: 0 for c in comps}
            for sc in scomps:
                comp = by_id[sc["id"]]
                dc_tab = htabs[(0, sc["td"])]
                ac_tab = htabs[(1, sc["ta"])]
                q = qtabs[comp["tq"]]
                for by in range(comp["v"]):
                    for bx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _huff_decode(reader, dc_tab)
                        diff = _receive_extend(reader, t)
                        pred[comp["id"]] += diff
                        zz[0] = pred[comp["id"]]
                        k = 1
                        while k < 64:
                            rs = _huff_decode(reader, ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError(
                                    "JPEG AC coefficient overrun")
                            zz[k] = _receive_extend(reader, s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZIGZAG] = zz * q
                        block = m.T @ coef.reshape(8, 8) @ m + 128.0
                        y0 = (my * comp["v"] + by) * 8
                        x0 = (mx * comp["h"] + bx) * 8
                        planes[comp["id"]][y0:y0 + 8, x0:x0 + 8] = block
            mcu_count += 1
    out_planes = []
    for c in comps:
        p = planes[c["id"]]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    # the libjpeg quality→scale mapping (public, in every JPEG text)
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_JPEG_QUANT_LUMA, _JPEG_QUANT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255))
    return out[0], out[1]


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.nbits += nbits
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self):
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)


def _mag_cat(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw, block, q, dc_map, ac_map, pred, ci, m):
    coef = m @ block @ m.T
    zz = np.round(coef / q).astype(np.int64).reshape(64)[_ZIGZAG]
    diff = int(zz[0]) - pred[ci]
    pred[ci] = int(zz[0])
    t = _mag_cat(diff)
    code, length = dc_map[t]
    bw.write(code, length)
    if t:
        bw.write(diff if diff >= 0 else diff + (1 << t) - 1, t)
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
            code, length = ac_map[0xF0]
            bw.write(code, length)
            run -= 16
        s = _mag_cat(v)
        code, length = ac_map[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        code, length = ac_map[0x00]
        bw.write(code, length)


def _pad_replicate(p: np.ndarray, hh: int, ww: int) -> np.ndarray:
    h, w = p.shape
    pp = np.zeros((hh, ww), dtype=np.float64)
    pp[:h, :w] = p
    if h < hh:
        pp[h:, :w] = p[h - 1:h, :]
    if w < ww:
        pp[:, w:] = pp[:, w - 1:w]
    return pp


def encode_jpeg(
    pixels: np.ndarray, quality: int = 90, subsample: bool = False,
) -> bytes:
    """Encode uint8 pixels as a real baseline JFIF/JPEG (Annex K tables
    scaled by the libjpeg quality rule, typical huffman tables).
    (h, w) → single-component grayscale; (h, w, 3) → YCbCr at 4:4:4,
    or 4:2:0 with ``subsample=True`` (2×2-averaged chroma, the layout
    most web JPEGs use — this is what exercises ``decode_jpeg``'s
    upsampling path).  The encode twin of ``decode_jpeg`` — used to
    synthesize deterministic lossy-image fixtures without Pillow."""
    pixels = np.asarray(pixels)
    gray = pixels.ndim == 2
    h, w = pixels.shape[:2]
    ql, qc = _quality_tables(quality)
    m = _dct_matrix()

    # comps: (plane, natural-order qtable, table-select, h-factor, v-factor)
    if gray:
        comps = [(pixels.astype(np.float64) - 128.0, ql, 0, 1, 1)]
    else:
        px = pixels.astype(np.float64)
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def half(p):
                hh, ww = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
                pp = _pad_replicate(p, hh, ww)
                return (pp[0::2, 0::2] + pp[0::2, 1::2]
                        + pp[1::2, 0::2] + pp[1::2, 1::2]) / 4.0
            comps = [
                (y - 128.0, ql, 0, 2, 2),
                (half(cb) - 128.0, qc, 1, 1, 1),
                (half(cr) - 128.0, qc, 1, 1, 1),
            ]
        else:
            comps = [
                (y - 128.0, ql, 0, 1, 1),
                (cb - 128.0, qc, 1, 1, 1),
                (cr - 128.0, qc, 1, 1, 1),
            ]

    enc_tabs = {}
    for key, (bits, vals) in (((0, 0), _DC_LUMA), ((1, 0), _AC_LUMA),
                              ((0, 1), _DC_CHROMA), ((1, 1), _AC_CHROMA)):
        enc_tabs[key] = {
            sym: (code, length)
            for sym, code, length in _huff_canonical(bits, vals)
        }

    hmax = max(c[3] for c in comps)
    vmax = max(c[4] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = [
        _pad_replicate(p, mcuy * cv * 8, mcux * ch * 8)
        for p, _q, _t, ch, cv in comps
    ]
    bw = _BitWriter()
    pred = [0] * len(comps)
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (p, q, tsel, ch, cv) in enumerate(comps):
                dc_map = enc_tabs[(0, tsel)]
                ac_map = enc_tabs[(1, tsel)]
                qn = q.reshape(8, 8)
                for byy in range(cv):
                    for bxx in range(ch):
                        y0 = (my * cv + byy) * 8
                        x0 = (mx * ch + bxx) * 8
                        _encode_block(
                            bw, padded[ci][y0:y0 + 8, x0:x0 + 8],
                            qn, dc_map, ac_map, pred, ci, m,
                        )
    bw.flush()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xFF\xD8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    zl = ql.reshape(64)[_ZIGZAG]
    out += seg(0xDB, bytes([0x00]) + bytes(int(x) for x in zl))
    if not gray:
        zc = qc.reshape(64)[_ZIGZAG]
        out += seg(0xDB, bytes([0x01]) + bytes(int(x) for x in zc))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for ci, (_p, _q, tsel, ch, cv) in enumerate(comps):
        sof += struct.pack(">BBB", ci + 1, (ch << 4) | cv, tsel)
    out += seg(0xC0, sof)
    dhts = [(0x00, _DC_LUMA), (0x10, _AC_LUMA)]
    if not gray:
        dhts += [(0x01, _DC_CHROMA), (0x11, _AC_CHROMA)]
    for tid, (bits, vals) in dhts:
        out += seg(0xC4, bytes([tid]) + bytes(bits) + bytes(vals))
    sos = bytes([len(comps)])
    for ci, (_p, _q, tsel, _ch, _cv) in enumerate(comps):
        sos += bytes([ci + 1, (tsel << 4) | tsel])
    sos += b"\x00\x3F\x00"
    out += seg(0xDA, sos)
    out += bw.out
    out += b"\xFF\xD9"
    return bytes(out)


def decode_image(payload: bytes) -> np.ndarray:
    """Sniff-and-decode: PNG or baseline JPEG payload → uint8 pixel
    array — the single entry point the multimodal pixel kernels use."""
    if payload[:8] == PNG_SIGNATURE:
        return decode_png(payload)
    if payload[:2] == b"\xFF\xD8":
        return decode_jpeg(payload)
    raise ValueError("unknown image format (not PNG or JPEG)")


def jpeg_info(payload: bytes) -> dict:
    """Walk JFIF markers to the first SOF frame header for
    (width, height, channels)."""
    if len(payload) < 4 or payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI")
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"JPEG marker desync at {pos}")
        marker = payload[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2  # standalone markers
            continue
        (seglen,) = struct.unpack_from(">H", payload, pos + 2)
        if marker in _JPEG_SOF:
            _depth, h, w, ncomp = struct.unpack_from(
                ">BHHB", payload, pos + 4)
            return {"width": w, "height": h, "channels": ncomp}
        if marker == 0xDA:  # start of scan: no SOF seen
            break
        pos += 2 + seglen
    raise ValueError("JPEG without SOF frame header")


def gif_info(payload: bytes) -> dict:
    """GIF87a/89a logical screen descriptor."""
    if len(payload) < 13 or payload[:3] != b"GIF" or \
            payload[3:6] not in (b"87a", b"89a"):
        raise ValueError("not a GIF")
    w, h = struct.unpack_from("<HH", payload, 6)
    return {"width": w, "height": h,
            "version": payload[3:6].decode("ascii")}


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """PCM 16-bit mono WAV from an int16 sample array — a real RIFF
    container any audio reader opens."""
    data = np.asarray(samples, dtype="<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_info(payload: bytes) -> dict:
    """RIFF chunk walk: channels, sample_rate, bit depth, and duration
    derived from the data chunk size."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or \
            payload[8:12] != b"WAVE":
        raise ValueError("not a WAV: bad RIFF header")
    pos, channels, rate, bits, data_len = 12, None, None, None, None
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        if tag == b"fmt ":
            _fmt, channels, rate, _bps, _align, bits = struct.unpack_from(
                "<HHIIHH", payload, pos + 8)
        elif tag == b"data":
            data_len = length
        pos += 8 + length + (length & 1)  # chunks are word-aligned
    if channels is None or data_len is None:
        raise ValueError("WAV without fmt/data chunks")
    # the decode contract rejects corrupt bytes with ValueError — a
    # zeroed fmt chunk must not surface as ZeroDivisionError
    if channels < 1 or bits < 8:
        raise ValueError("bad WAV fmt chunk")
    n_frames = data_len // (channels * (bits // 8))
    return {
        "channels": channels,
        "sample_rate": rate,
        "bit_depth": bits,
        "n_frames": n_frames,
        "duration_ms": int(n_frames * 1000 // rate) if rate else None,
    }


def decode_wav_samples(payload: bytes) -> "np.ndarray":
    """PCM samples from a 16-bit WAV payload as an int16 array (first
    channel of interleaved multi-channel audio) — the sample-level twin
    of ``wav_info``'s metadata walk, for fingerprinting stages."""
    info = wav_info(payload)
    if info["bit_depth"] != 16:
        raise ValueError(
            f"decode_wav_samples: only 16-bit PCM supported, got "
            f"{info['bit_depth']}-bit")
    pos = 12
    while pos + 8 <= len(payload):
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        if tag == b"data":
            data = payload[pos + 8:pos + 8 + length]
            samples = np.frombuffer(data, dtype="<i2")
            if info["channels"] > 1:
                samples = samples[::info["channels"]]
            return samples.astype(np.int16)
        pos += 8 + length + (length & 1)
    raise ValueError("WAV without data chunk")


# ---------------------------------------------------------------------------
# MP4 (ISO BMFF)
# ---------------------------------------------------------------------------


def encode_mp4_stub(duration_ms: int, timescale: int = 1000) -> bytes:
    """Minimal valid ISO BMFF file: ``ftyp`` + ``moov`` containing a
    version-0 ``mvhd`` with the given timescale/duration.  Metadata-only
    (no media tracks) — the shape a metadata-extraction stage sees after
    an object-store range read of the moov box."""

    def box(tag: bytes, body: bytes) -> bytes:
        return struct.pack(">I", 8 + len(body)) + tag + body

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2")
    mvhd = box(
        b"mvhd",
        struct.pack(">B3x", 0)  # version 0 + flags
        + struct.pack(">II", 0, 0)  # creation/modification time
        + struct.pack(">II", timescale,
                      int(duration_ms * timescale // 1000))
        + struct.pack(">i", 0x00010000)  # rate 1.0
        + struct.pack(">h", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + struct.pack(">9i", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0,
                      0x40000000)  # unity matrix
        + b"\x00" * 24  # pre-defined
        + struct.pack(">I", 2),  # next track id
    )
    return ftyp + box(b"moov", mvhd)


def _mp4_boxes(payload: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (length,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4:pos + 8]
        header = 8
        if length == 1:  # 64-bit largesize
            (length,) = struct.unpack_from(">Q", payload, pos + 8)
            header = 16
        elif length == 0:  # box extends to EOF
            length = end - pos
        if length < header or pos + length > end:
            raise ValueError(f"bad MP4 box {tag!r} at {pos}")
        yield tag, pos + header, pos + length
        pos += length


def mp4_info(payload: bytes) -> dict:
    """Box walk to ``moov/mvhd`` (version 0 or 1): timescale + duration.
    Requires a leading ``ftyp`` box (the file-type gate a real demuxer
    applies)."""
    boxes = list(_mp4_boxes(payload, 0, len(payload)))
    if not boxes or boxes[0][0] != b"ftyp":
        raise ValueError("not an MP4: missing ftyp")
    for tag, body_start, body_end in boxes:
        if tag != b"moov":
            continue
        for t2, s2, _e2 in _mp4_boxes(payload, body_start, body_end):
            if t2 != b"mvhd":
                continue
            version = payload[s2]
            if version == 1:
                timescale, duration = struct.unpack_from(
                    ">IQ", payload, s2 + 4 + 16)
            else:
                _c, _m, timescale, duration = struct.unpack_from(
                    ">IIII", payload, s2 + 4)
            return {
                "timescale": timescale,
                "duration_ms": int(duration * 1000 // timescale)
                if timescale else None,
            }
    raise ValueError("MP4 without moov/mvhd")


# ---------------------------------------------------------------------------
# AVI (RIFF video): uncompressed DIB frames + MJPG frames
# ---------------------------------------------------------------------------
#
# AVI 1.0 is the RIFF sibling of WAV: LIST hdrl (avih + LIST strl with
# strh/strf) followed by LIST movi whose '00db'/'00dc' chunks carry the
# frames, then the idx1 index.  Two real codecs are supported:
#   * 'dib'  — uncompressed BI_RGB device-independent bitmaps ('00db'
#     chunks): bottom-up rows, BGR byte order, rows padded to 4 bytes.
#     Lossless, so encode→decode roundtrips bit-exactly — the form the
#     deterministic oracle corpora use.
#   * 'mjpg' — Motion-JPEG ('00dc' chunks): each frame is a baseline
#     JFIF produced/consumed by encode_jpeg/decode_jpeg above — the
#     form a real crawl payload takes.

_AVIIF_KEYFRAME = 0x00000010


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) & 1 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def encode_avi(frames: np.ndarray, fps: int = 10,
               codec: str = "dib") -> bytes:
    """Real AVI container from an ``(n_frames, h, w, 3)`` uint8 RGB
    array.  ``codec='dib'`` writes lossless uncompressed frames;
    ``codec='mjpg'`` JPEG-compresses each frame (baseline, 4:4:4)."""
    frames = np.asarray(frames, dtype=np.uint8)
    if frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("encode_avi expects (n, h, w, 3) RGB frames")
    n, h, w = frames.shape[0], frames.shape[1], frames.shape[2]
    if codec == "dib":
        handler, compression, ckid = b"DIB ", 0, b"00db"
        row_pad = (-(w * 3)) % 4
        payloads = []
        for f in range(n):
            bgr = frames[f, ::-1, :, ::-1]  # bottom-up rows, BGR
            if row_pad:
                rows = [bgr[y].tobytes() + b"\x00" * row_pad
                        for y in range(h)]
                payloads.append(b"".join(rows))
            else:
                payloads.append(bgr.tobytes())
    elif codec == "mjpg":
        handler, ckid = b"MJPG", b"00dc"
        compression = struct.unpack("<I", b"MJPG")[0]
        payloads = [encode_jpeg(frames[f]) for f in range(n)]
    else:
        raise ValueError(f"encode_avi: unknown codec {codec!r}")
    buf_size = max(len(p) for p in payloads) if payloads else 0

    avih = struct.pack(
        "<14I",
        int(1_000_000 // fps),  # dwMicroSecPerFrame
        0, 0,                   # dwMaxBytesPerSec, dwPaddingGranularity
        0x10,                   # dwFlags: AVIF_HASINDEX
        n, 0, 1, buf_size,      # frames, initial, streams, sugg. buffer
        w, h, 0, 0, 0, 0,       # width, height, reserved[4]
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", handler, 0, 0, 0, 0,
        1, fps,                 # dwScale, dwRate → fps frames/sec
        0, n, buf_size,
        0xFFFFFFFF, 0,          # dwQuality (default), dwSampleSize
        0, 0, w, h,             # rcFrame
    )
    strf = struct.pack(
        "<IiiHHIIiiII",
        40, w, h, 1, 24, compression,
        len(payloads[0]) if payloads else 0, 0, 0, 0, 0,
    )
    strl = _riff_chunk(
        b"LIST",
        b"strl" + _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf),
    )
    hdrl = _riff_chunk(b"LIST",
                       b"hdrl" + _riff_chunk(b"avih", avih) + strl)
    movi_body = b"movi"
    idx_entries = []
    for p in payloads:
        # idx1 offsets point at the chunk header, relative to the
        # 'movi' fourcc (offset 4 == first chunk) — the convention
        # every AVI-1.0 demuxer expects
        idx_entries.append((len(movi_body), len(p)))
        movi_body += _riff_chunk(ckid, p)
    movi = _riff_chunk(b"LIST", movi_body)
    idx1 = _riff_chunk(
        b"idx1",
        b"".join(
            ckid + struct.pack("<III", _AVIIF_KEYFRAME, off, size)
            for off, size in idx_entries
        ),
    )
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_riff_chunks(payload: bytes, start: int, end: int):
    """Yield (tag, body_start, body_end) over a RIFF chunk run; LIST
    chunks are yielded as (list_type, ...) spanning their contents."""
    pos = start
    while pos + 8 <= end:
        tag = payload[pos:pos + 4]
        (length,) = struct.unpack_from("<I", payload, pos + 4)
        body_start, body_end = pos + 8, pos + 8 + length
        if body_end > end:
            raise ValueError(f"bad AVI chunk {tag!r} at {pos}")
        if tag == b"LIST":
            yield payload[body_start:body_start + 4], body_start + 4, \
                body_end
        else:
            yield tag, body_start, body_end
        pos = body_end + (length & 1)  # word-aligned like WAV


def avi_info(payload: bytes) -> dict:
    """Header walk: width/height/frame-count/fps/codec from
    ``hdrl/avih`` + ``strl/strh`` + the BITMAPINFOHEADER in ``strf``."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or \
            payload[8:12] != b"AVI ":
        raise ValueError("not an AVI: bad RIFF header")
    info: dict = {}
    for tag, s, e in _avi_riff_chunks(payload, 12, len(payload)):
        if tag != b"hdrl":
            continue
        for t2, s2, e2 in _avi_riff_chunks(payload, s, e):
            if t2 == b"avih":
                vals = struct.unpack_from("<14I", payload, s2)
                info["n_frames"] = vals[4]
                info["width"], info["height"] = vals[8], vals[9]
            elif t2 == b"strl":
                for t3, s3, _e3 in _avi_riff_chunks(payload, s2, e2):
                    if t3 == b"strh":
                        (fcc, handler, _fl, _pr, _la, _init, scale,
                         rate) = struct.unpack_from(
                            "<4s4sIHHIII", payload, s3)
                        if fcc == b"vids":
                            info["codec"] = (
                                handler.strip().lower().decode(
                                    "ascii", "replace"))
                            info["fps"] = (rate // scale) if scale else 0
    if "n_frames" not in info:
        raise ValueError("AVI without hdrl/avih")
    fps = info.get("fps") or 0
    info["duration_ms"] = (
        int(info["n_frames"] * 1000 // fps) if fps else None)
    return info


def decode_avi_frames(payload: bytes) -> np.ndarray:
    """Frame pixels from an AVI payload as an ``(n, h, w, 3)`` uint8
    RGB array — '00db' uncompressed DIB chunks (bottom-up BGR, 4-byte
    row padding) and '00dc' MJPG chunks (via ``decode_jpeg``) both
    decode; anything else refuses with the explicit scope error."""
    info = avi_info(payload)
    w, h = info["width"], info["height"]
    row_bytes = w * 3 + ((-(w * 3)) % 4)
    frames = []
    for tag, s, e in _avi_riff_chunks(payload, 12, len(payload)):
        if tag != b"movi":
            continue
        for t2, s2, e2 in _avi_riff_chunks(payload, s, e):
            if t2.endswith(b"db"):
                body = payload[s2:e2]
                if len(body) != row_bytes * h:
                    raise ValueError(
                        f"bad DIB frame: {len(body)} bytes for "
                        f"{w}x{h}x24 (+pad)")
                rows = np.frombuffer(body, dtype=np.uint8)
                rows = rows.reshape(h, row_bytes)[:, :w * 3]
                bgr = rows.reshape(h, w, 3)
                frames.append(bgr[::-1, :, ::-1])  # top-down, RGB
            elif t2.endswith(b"dc"):
                px = decode_jpeg(payload[s2:e2])
                if px.ndim == 2:
                    px = np.stack([px] * 3, axis=2)
                if px.shape[0] != h or px.shape[1] != w:
                    raise ValueError(
                        f"MJPG frame {px.shape[1]}x{px.shape[0]} != "
                        f"container {w}x{h}")
                frames.append(px)
    if not frames:
        raise ValueError("AVI without decodable movi frames")
    return np.stack(frames, axis=0)
