"""Pure-python PNG codec — stdlib ``zlib`` + numpy unfiltering.

Companion to functions/jpeg.py: PNG was the remaining common image
format behind the multimodal stub, and it needs no external codec —
DEFLATE is in the standard library and the scanline filters are byte
arithmetic.

- :func:`decode_png`: 8-bit greyscale / RGB / RGBA / greyscale+alpha
  (color types 0/2/4/6), all five scanline filters (None/Sub/Up/
  Average/Paeth), CRC-checked chunks. Palette (3), 16-bit and
  interlaced images raise ``ValueError`` — honestly unsupported.
- :func:`encode_png`: the test twin — filter-0 scanlines, zlib,
  correct CRCs — so decode is provable by LOSSLESS round-trip (PNG is
  lossless, so encode->decode must be bit-exact on every pixel, a
  stronger oracle than JPEG's quantization bound).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def decode_png(payload: bytes) -> dict:
    """Decode to ``{width, height, n_channels, pixels}`` (uint8 ndarray
    of shape (h, w) or (h, w, c))."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    i = 8
    ihdr = None
    idat = bytearray()
    while i < len(payload):
        length, ctype = struct.unpack_from(">I4s", payload, i)
        data = payload[i + 8: i + 8 + length]
        crc = struct.unpack_from(">I", payload, i + 8 + length)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"bad CRC in {ctype!r} chunk")
        i += 12 + length
        if ctype == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data)
            if depth != 8:
                raise ValueError("only 8-bit depth supported")
            if color not in _CHANNELS:
                raise ValueError(f"color type {color} not supported "
                                 "(palette needs PLTE handling)")
            if interlace:
                raise ValueError("interlaced PNG not supported")
            if comp or filt:
                raise ValueError("unknown compression/filter method")
            ihdr = (w, h, _CHANNELS[color])
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, nc = ihdr
    raw = zlib.decompress(bytes(idat))
    stride = w * nc
    if len(raw) != h * (stride + 1):
        raise ValueError("decompressed size mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        ftype = raw[y * (stride + 1)]
        line = np.frombuffer(
            raw, np.uint8, stride, y * (stride + 1) + 1).astype(np.int64)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need a scan
            cur = np.zeros(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - nc] if x >= nc else 0
                b = prev[x]
                if ftype == 1:
                    cur[x] = (line[x] + a) & 0xFF
                elif ftype == 3:
                    cur[x] = (line[x] + (a + b) // 2) & 0xFF
                else:
                    c = prev[x - nc] if x >= nc else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else b if pb <= pc else c
                    cur[x] = (line[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown scanline filter {ftype}")
        out[y] = cur.astype(np.uint8)
        prev = cur
    px = out.reshape(h, w, nc) if nc > 1 else out.reshape(h, w)
    return {"width": w, "height": h, "n_channels": nc, "pixels": px}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode uint8 pixels — (h, w), (h, w, 2|3|4) — losslessly
    (filter 0 scanlines)."""
    px = np.asarray(pixels, dtype=np.uint8)
    h, w = px.shape[:2]
    nc = 1 if px.ndim == 2 else px.shape[2]
    color = {1: 0, 2: 4, 3: 2, 4: 6}[nc]
    flat = px.reshape(h, w * nc)
    raw = b"".join(b"\x00" + flat[y].tobytes() for y in range(h))
    return (_SIG
            + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0))
            + _chunk(b"IDAT", zlib.compress(raw, 6))
            + _chunk(b"IEND", b""))
