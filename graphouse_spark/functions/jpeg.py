"""Pure-python baseline JPEG codec — no external libraries.

The multimodal surface (functions/multimodal.py) decodes WAV/BMP/PPM
with stdlib+numpy byte math; JPEG was the last honestly-stubbed image
format. This module closes it for BASELINE sequential-DCT JPEGs (SOF0,
8-bit, huffman — the overwhelming majority of real-world JPEGs):

- :func:`decode_baseline_jpeg`: full marker parse (DQT/SOF0/DHT/DRI/
  SOS, APPn/COM skipped), bit-stuffed huffman entropy decode with
  restart-marker support, dequant + zigzag + separable float IDCT,
  arbitrary sampling-factor upsample (4:4:4 / 4:2:2 / 4:2:0 / ...),
  JFIF YCbCr->RGB, edge crop. Progressive (SOF2) and arithmetic
  coding raise ``ValueError`` — honestly unsupported, not wrong.
- :func:`encode_baseline_jpeg`: the test twin — grayscale / 4:4:4 /
  4:2:0 encoder with fixed-length canonical huffman tables (every
  (run,size) symbol encodable; compression is not the point) — so the
  decoder is provable by ROUND-TRIP against images we build pixel by
  pixel, the same oracle posture as the BMP/PPM writers. A flat-gray
  image with the default DC quantum of 8 round-trips EXACTLY (DC-only
  blocks: 8*(v-128) is divisible by 8), which is what lets the driver
  oracle predict decoded values from arithmetic alone.

Everything is numpy-vectorized per 8x8 block; the per-bit huffman loop
is python but runs over kilobyte fixtures — batch inference at scale
would hand real assets to a real codec via the same mapInPandas
plumbing (multimodal.decode_assets).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag order: index z -> (row, col) position in the 8x8 block
_ZZ = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])

# orthonormal DCT-II matrix: A @ block @ A.T = coefficients
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(0.5) if _u == 0 else 1.0
    for _x in range(8):
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)

#: default quantization table: flat 8 everywhere. DC=8 makes flat-color
#: blocks exact (see module docstring); AC=8 keeps round-trip error
#: small without claiming visual tuning.
DEFAULT_QUANT = np.full(64, 8, dtype=np.int32)


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker (caller handles RSTn)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.bits = 0
        self.acc = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                raise _MarkerHit()
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.bits += 8

    def read_bit(self) -> int:
        if self.bits == 0:
            self._fill()
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.bits = 0
        self.acc = 0


class _MarkerHit(Exception):
    pass


def _receive_extend(r: _BitReader, s: int) -> int:
    if s == 0:
        return 0
    v = r.read_bits(s)
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_huff(r: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | r.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code")


def _build_decode_table(counts: list[int], symbols: list[int]) -> dict:
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def decode_baseline_jpeg(payload: bytes) -> dict:
    """Decode a baseline JPEG to
    ``{width, height, n_channels, pixels}`` (pixels: uint8 ndarray of
    shape (h, w) or (h, w, 3), RGB)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (no SOI)")
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) -> decode table
    frame = None
    restart_interval = 0
    i = 2
    while i < len(payload):
        if payload[i] != 0xFF:
            raise ValueError(f"marker expected at {i}")
        m = payload[i + 1]
        i += 2
        if m in (0xD8, 0x01) or 0xD0 <= m <= 0xD7:
            continue
        if m == 0xD9:  # EOI
            break
        seg_len = struct.unpack_from(">H", payload, i)[0]
        seg = payload[i + 2: i + seg_len]
        if m == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq:
                    quant[tq] = np.frombuffer(
                        seg[j:j + 128], dtype=">u2").astype(np.int32)
                    j += 128
                else:
                    quant[tq] = np.frombuffer(
                        seg[j:j + 64], dtype=np.uint8).astype(np.int32)
                    j += 64
        elif m == 0xC0 or m == 0xC1:  # SOF0/1 (baseline / ext sequential)
            prec, h, w, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c], seg[7 + 3 * c], seg[8 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
            frame = {"h": h, "w": w, "comps": comps}
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                   0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential DCT supported")
        elif m == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1: j + 17])
                n = sum(counts)
                symbols = list(seg[j + 17: j + 17 + n])
                huff[(tc, th)] = _build_decode_table(counts, symbols)
                j += 17 + n
        elif m == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif m == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next(x for x in frame["comps"] if x["id"] == cs)
                scan.append((comp, tt >> 4, tt & 15))
            pixels = _decode_scan(payload, i + seg_len, frame, scan, quant,
                                  huff, restart_interval)
            return pixels
        i += seg_len
    raise ValueError("no SOS segment found")


def _decode_scan(data, pos, frame, scan, quant, huff, restart_interval):
    h, w = frame["h"], frame["w"]
    hmax = max(c["h"] for c, _, _ in scan)
    vmax = max(c["v"] for c, _, _ in scan)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    planes = {}
    for comp, _, _ in scan:
        pw, ph = mcus_x * 8 * comp["h"], mcus_y * 8 * comp["v"]
        planes[comp["id"]] = np.zeros((ph, pw), dtype=np.float64)
    pred = {comp["id"]: 0 for comp, _, _ in scan}
    r = _BitReader(data, pos)
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                r.align()
                # RSTn sits between the intervals: consume it
                if r.data[r.pos] == 0xFF and 0xD0 <= r.data[r.pos + 1] <= 0xD7:
                    r.pos += 2
                for k in pred:
                    pred[k] = 0
            try:
                for comp, tdc, tac in scan:
                    q = quant[comp["tq"]]
                    for by in range(comp["v"]):
                        for bx in range(comp["h"]):
                            block = _decode_block(
                                r, huff[(0, tdc)], huff[(1, tac)], q, comp,
                                pred)
                            y0 = (my * comp["v"] + by) * 8
                            x0 = (mx * comp["h"] + bx) * 8
                            planes[comp["id"]][y0:y0 + 8, x0:x0 + 8] = block
            except _MarkerHit:
                raise ValueError("entropy data ended early "
                                 f"(marker 0x{r.marker:02x} inside scan)")
            mcu += 1
    # upsample each plane to full MCU-grid resolution, crop, color-convert
    out = []
    for comp, _, _ in scan:
        p = planes[comp["id"]]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        gray = np.clip(np.round(out[0] + 128), 0, 255).astype(np.uint8)
        return {"width": w, "height": h, "n_channels": 1, "pixels": gray}
    y, cb, cr = out[0] + 128, out[1], out[2]
    rgb = np.stack([
        y + 1.402 * cr,
        y - 0.344136 * cb - 0.714136 * cr,
        y + 1.772 * cb,
    ], axis=-1)
    rgb = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    return {"width": w, "height": h, "n_channels": 3, "pixels": rgb}


def _decode_block(r, dc_table, ac_table, q, comp, pred):
    coef = np.zeros(64, dtype=np.float64)
    s = _decode_huff(r, dc_table)
    diff = _receive_extend(r, s)
    pred[comp["id"]] += diff
    coef[0] = pred[comp["id"]]
    k = 1
    while k < 64:
        rs = _decode_huff(r, ac_table)
        rr, ss = rs >> 4, rs & 15
        if ss == 0:
            if rr == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += rr
        if k > 63:
            raise ValueError("AC run past end of block")
        coef[k] = _receive_extend(r, ss)
        k += 1
    dq = coef * q
    block = np.zeros((8, 8))
    block.flat[_ZZ] = dq
    return _A.T @ block @ _A


# ---------------------------------------------------------------------------
# encoder twin (tests / fixtures)
# ---------------------------------------------------------------------------

# fixed-length canonical tables: every symbol encodable, trivially valid
# (no all-ones codeword in use). DC: 16 symbols at 5 bits; AC: all 256
# (run,size) bytes — 255 at 9 bits plus one at 10 (a DHT count is a
# single byte, so 256 cannot share one length).
_ENC_DC_COUNTS = [0, 0, 0, 0, 16] + [0] * 11
_ENC_DC_SYMBOLS = list(range(16))
_ENC_AC_COUNTS = [0] * 8 + [255, 1] + [0] * 6
_ENC_AC_SYMBOLS = list(range(256))


def _build_encode_table(counts, symbols):
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


_ENC_DC = _build_encode_table(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
_ENC_AC = _build_encode_table(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.bits = 0

    def write(self, length: int, value: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.bits += length
        while self.bits >= 8:
            self.bits -= 8
            b = (self.acc >> self.bits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing

    def flush(self) -> None:
        if self.bits:
            pad = 8 - self.bits
            self.write(pad, (1 << pad) - 1)


def _size_of(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_block(wtr, block, q, pred_holder, key):
    coef = _A @ (block - 128.0) @ _A.T
    zz = coef.flat[_ZZ]
    qz = np.round(zz / q).astype(np.int64)
    diff = int(qz[0]) - pred_holder[key]
    pred_holder[key] = int(qz[0])
    s = _size_of(diff)
    wtr.write(*_ENC_DC[s])
    if s:
        wtr.write(s, diff if diff >= 0 else diff + (1 << s) - 1)
    run = 0
    for k in range(1, 64):
        v = int(qz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            wtr.write(*_ENC_AC[0xF0])  # ZRL
            run -= 16
        s = _size_of(v)
        wtr.write(*_ENC_AC[(run << 4) | s])
        wtr.write(s, v if v >= 0 else v + (1 << s) - 1)
        run = 0
    if run:
        wtr.write(*_ENC_AC[0x00])  # EOB


def encode_baseline_jpeg(pixels: np.ndarray, quant: np.ndarray | None = None,
                         subsample=False,
                         restart_interval: int = 0) -> bytes:
    """Encode uint8 pixels — (h, w) grayscale or (h, w, 3) RGB — as a
    baseline JPEG. ``subsample``: False/"444" (no chroma subsampling),
    True/"420" (2x2), or "422" (horizontal only) — covering the three
    sampling layouts real encoders emit, so each decoder upsample path
    is provable by round-trip. ``restart_interval`` > 0 emits a DRI
    segment and RSTn markers every N MCUs (what real camera encoders
    do for error resilience) — proving the decoder's resync path."""
    quant = DEFAULT_QUANT if quant is None else np.asarray(quant, np.int32)
    px = np.asarray(pixels)
    h, w = px.shape[:2]
    gray = px.ndim == 2
    if gray:
        comps = [("Y", px.astype(np.float64), 1, 1)]
    else:
        rgb = px.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        mode = {False: "444", True: "420"}.get(subsample, subsample)
        if mode == "420":
            cb, cr = _box2(cb), _box2(cr)
            comps = [("Y", y, 2, 2), ("Cb", cb, 1, 1), ("Cr", cr, 1, 1)]
        elif mode == "422":
            cb, cr = _box2h(cb), _box2h(cr)
            comps = [("Y", y, 2, 1), ("Cb", cb, 1, 1), ("Cr", cr, 1, 1)]
        elif mode == "444":
            comps = [("Y", y, 1, 1), ("Cb", cb, 1, 1), ("Cr", cr, 1, 1)]
        else:
            raise ValueError(f"unknown subsampling mode {subsample!r}")

    hmax = max(c[2] for c in comps)
    vmax = max(c[3] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x, mcus_y = -(-w // mcu_w), -(-h // mcu_h)

    padded = []
    for name, plane, ch, cv in comps:
        pw, ph = mcus_x * 8 * ch, mcus_y * 8 * cv
        p = np.empty((ph, pw))
        sh, sw = plane.shape
        p[:sh, :sw] = plane
        p[sh:, :sw] = plane[-1:, :]          # edge-replicate padding
        p[:, sw:] = p[:, sw - 1: sw]
        padded.append((name, p, ch, cv))

    wtr = _BitWriter()
    pred = {name: 0 for name, _, _, _ in padded}
    mcu = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu and mcu % restart_interval == 0:
                wtr.flush()  # pad to byte boundary with 1-bits
                wtr.out += bytes([0xFF, 0xD0 + (mcu // restart_interval - 1) % 8])
                for k in pred:
                    pred[k] = 0
            for name, plane, ch, cv in padded:
                for by in range(cv):
                    for bx in range(ch):
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        _encode_block(wtr, plane[y0:y0 + 8, x0:x0 + 8],
                                      quant, pred, name)
            mcu += 1
    wtr.flush()

    out = bytearray(b"\xff\xd8")
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" \
        + bytes(int(v) for v in quant)
    nc = len(comps)
    sof = struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for idx, (_, _, ch, cv) in enumerate(padded):
        sof += bytes([idx + 1, (ch << 4) | cv, 0])
    out += b"\xff\xc0" + sof
    for tc, counts, symbols in ((0, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS),
                                (1, _ENC_AC_COUNTS, _ENC_AC_SYMBOLS)):
        seg = bytes([tc << 4]) + bytes(counts) + bytes(symbols)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(seg)) + seg
    sos = struct.pack(">HB", 6 + 2 * nc, nc)
    for idx in range(nc):
        sos += bytes([idx + 1, 0x00])  # dc table 0, ac table 0
    sos += b"\x00\x3f\x00"
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + sos
    out += wtr.out
    out += b"\xff\xd9"
    return bytes(out)


def _box2h(plane: np.ndarray) -> np.ndarray:
    """2x1 horizontal box downsample (4:2:2 chroma)."""
    h, w = plane.shape
    if w % 2:
        plane = np.hstack([plane, plane[:, -1:]])
    return (plane[:, 0::2] + plane[:, 1::2]) / 2.0


def _box2(plane: np.ndarray) -> np.ndarray:
    """2x2 box downsample with edge replication for odd sizes."""
    h, w = plane.shape
    if h % 2:
        plane = np.vstack([plane, plane[-1:, :]])
    if w % 2:
        plane = np.hstack([plane, plane[:, -1:]])
    return (plane[0::2, 0::2] + plane[1::2, 0::2]
            + plane[0::2, 1::2] + plane[1::2, 1::2]) / 4.0
