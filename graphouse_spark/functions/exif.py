"""EXIF / ICC / text metadata extraction for image columns.

LLM-pipeline extension (no reference analog — the reference is a
metrics engine): training-data curation wants camera metadata,
orientation, timestamps and color-profile identity WITHOUT decoding
pixels — the metadata lives in the first few KB of each asset, so a
metadata pass reads container headers only, orders of magnitude
cheaper than the decode stage in functions/multimodal.py.

All parsers are TOTAL on hostile bytes: truncated/corrupt structures
yield partial (possibly empty) maps, never an exception — one bad
asset must not poison a 100 TB scan. Writers (build_tiff / build_icc)
exist so tests and the oracle-gated entry query can round-trip real
bytes without external fixtures.

Formats:
- TIFF/EXIF IFDs (the APP1 ``Exif\\0\\0`` payload in JPEG, the
  ``eXIf`` chunk in PNG): both byte orders, IFD0 + the EXIF sub-IFD,
  ASCII/SHORT/LONG/RATIONAL values rendered as strings.
- ICC profiles (APP2 ``ICC_PROFILE\\0`` in JPEG — multi-chunk
  reassembly — and the zlib-compressed ``iCCP`` chunk in PNG):
  header identity fields + the ``desc`` description tag.
- PNG ``tEXt`` key/value pairs.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: F401  (spark-side helpers)

# the curated tag set (EXIF 2.3 tag ids); everything else is ignored
_TAG_NAMES = {
    0x010F: "Make",
    0x0110: "Model",
    0x0112: "Orientation",
    0x011A: "XResolution",
    0x011B: "YResolution",
    0x0131: "Software",
    0x0132: "DateTime",
    0x8769: "ExifIFDPointer",
    0x829A: "ExposureTime",
    0x829D: "FNumber",
    0x8827: "ISOSpeedRatings",
    0x9003: "DateTimeOriginal",
    0x920A: "FocalLength",
    0xA002: "PixelXDimension",
    0xA003: "PixelYDimension",
}

_EXIF_IFD_TAG = 0x8769


def parse_tiff(data: bytes) -> dict[str, str]:
    """TIFF/EXIF blob -> {tag_name: value_string}. Total on garbage."""
    out: dict[str, str] = {}
    try:
        if len(data) < 8:
            return out
        if data[:2] == b"II":
            e = "<"
        elif data[:2] == b"MM":
            e = ">"
        else:
            return out
        if struct.unpack(e + "H", data[2:4])[0] != 42:
            return out
        ifd0 = struct.unpack(e + "I", data[4:8])[0]
        _parse_ifd(data, ifd0, e, out, depth=0)
        out.pop("ExifIFDPointer", None)
    except Exception:
        pass  # keep whatever parsed before the corruption
    return out


def _parse_ifd(data: bytes, off: int, e: str, out: dict, depth: int) -> None:
    if depth > 2 or off + 2 > len(data):
        return
    (n,) = struct.unpack_from(e + "H", data, off)
    n = min(n, 512)  # hostile counts can't force a long loop
    for i in range(n):
        base = off + 2 + 12 * i
        if base + 12 > len(data):
            return
        tag, typ, cnt = struct.unpack_from(e + "HHI", data, base)
        name = _TAG_NAMES.get(tag)
        val = _read_value(data, base + 8, typ, cnt, e)
        if tag == _EXIF_IFD_TAG and val is not None:
            _parse_ifd(data, int(val), e, out, depth + 1)
            continue
        if name is not None and val is not None:
            out[name] = str(val)


def _read_value(data: bytes, vpos: int, typ: int, cnt: int, e: str):
    sizes = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 7: 1, 9: 4, 10: 8}
    if typ not in sizes or cnt > 1 << 20:
        return None
    total = sizes[typ] * cnt
    if total <= 4:
        pos = vpos
    else:
        (pos,) = struct.unpack_from(e + "I", data, vpos)
    if pos + total > len(data):
        return None
    if typ == 2:  # ASCII, NUL-terminated
        return data[pos:pos + cnt].split(b"\x00")[0].decode(
            "ascii", "replace")
    if typ in (3, 4, 9):  # SHORT / LONG / SLONG (first value)
        fmt = {3: "H", 4: "I", 9: "i"}[typ]
        return struct.unpack_from(e + fmt, data, pos)[0]
    if typ in (5, 10):  # (S)RATIONAL -> "num/den"
        fmt = "II" if typ == 5 else "ii"
        num, den = struct.unpack_from(e + fmt, data, pos)
        return f"{num}/{den}"
    if typ in (1, 7):
        return data[pos:pos + min(cnt, 64)].hex()
    return None


def build_tiff(ifd0: dict[int, object], exif: dict[int, object] | None = None) -> bytes:
    """Little-endian TIFF writer for tests/synthetic assets. Values:
    str -> ASCII, int -> SHORT/LONG by range, (num, den) -> RATIONAL."""
    entries0 = dict(ifd0)
    if exif:
        entries0[_EXIF_IFD_TAG] = None  # patched below
    heap = bytearray()
    heap_base_holder: list[int] = []

    def encode_ifd(entries: dict, ifd_off: int) -> bytearray:
        body = bytearray(struct.pack("<H", len(entries)))
        for tag in sorted(entries):
            v = entries[tag]
            if tag == _EXIF_IFD_TAG:
                body += struct.pack("<HHI4s", tag, 4, 1, b"\x00\x00\x00\x00")
                continue
            if isinstance(v, str):
                raw = v.encode("ascii") + b"\x00"
                typ, cnt = 2, len(raw)
            elif isinstance(v, tuple):
                raw = struct.pack("<II", *v)
                typ, cnt = 5, 1
            elif isinstance(v, int) and v < 0x10000:
                raw = struct.pack("<H", v)
                typ, cnt = 3, 1
            else:
                raw = struct.pack("<I", int(v))
                typ, cnt = 4, 1
            if len(raw) <= 4:
                body += struct.pack("<HHI", tag, typ, cnt) + raw.ljust(4, b"\x00")
            else:
                heap_base_holder.append((len(body), len(heap)))
                body += struct.pack("<HHII", tag, typ, cnt, 0)  # patched
                heap.extend(raw)
        body += struct.pack("<I", 0)  # no next IFD
        return body

    ifd0_body = encode_ifd(entries0, 8)
    exif_off = 8 + len(ifd0_body)
    exif_body = encode_ifd(exif, exif_off) if exif else bytearray()
    heap_off = exif_off + len(exif_body)
    blob = bytearray(b"II*\x00" + struct.pack("<I", 8))
    blob += ifd0_body + exif_body
    blob += heap
    # patch heap offsets (two passes kept the writer simple)
    hi = 0
    for entries, base in ((entries0, 8), (exif or {}, exif_off)):
        body_pos = base + 2
        for tag in sorted(entries):
            v = entries[tag]
            if tag == _EXIF_IFD_TAG:
                struct.pack_into("<I", blob, body_pos + 8, exif_off)
            else:
                raw_len = (len(str(v)) + 1 if isinstance(v, str)
                           else 8 if isinstance(v, tuple) else 2)
                if raw_len > 4:
                    struct.pack_into("<I", blob, body_pos + 8,
                                     heap_off + heap_base_holder[hi][1])
                    hi += 1
            body_pos += 12
    return bytes(blob)


# -- ICC --

def parse_icc(data: bytes) -> dict[str, str]:
    """ICC profile header identity + the ``desc`` tag. Total."""
    out: dict[str, str] = {}
    try:
        if len(data) < 132:
            return out
        out["profile_size"] = str(struct.unpack_from(">I", data, 0)[0])
        ver = data[8]
        out["version"] = f"{ver >> 4}.{ver & 0xF}"
        out["device_class"] = data[12:16].decode("ascii", "replace").strip()
        out["color_space"] = data[16:20].decode("ascii", "replace").strip()
        out["pcs"] = data[20:24].decode("ascii", "replace").strip()
        (n_tags,) = struct.unpack_from(">I", data, 128)
        for i in range(min(n_tags, 128)):
            sig, off, size = struct.unpack_from(">4sII", data, 132 + 12 * i)
            if sig == b"desc" and off + 12 <= len(data):
                if data[off:off + 4] == b"desc":
                    (cnt,) = struct.unpack_from(">I", data, off + 8)
                    end = min(off + 12 + cnt, len(data))
                    out["description"] = data[off + 12:end].split(b"\x00")[0] \
                        .decode("ascii", "replace")
    except Exception:
        pass
    return out


def build_icc(description: str, color_space: str = "RGB ",
              device_class: str = "mntr") -> bytes:
    """Minimal valid-enough ICC profile for round-trip tests."""
    desc_raw = description.encode("ascii") + b"\x00"
    desc_tag = b"desc" + b"\x00" * 4 + struct.pack(">I", len(desc_raw)) + desc_raw
    tag_table = struct.pack(">I", 1) + struct.pack(
        ">4sII", b"desc", 132 + 12, len(desc_tag))
    header = bytearray(128)
    body_off = 132 + 12
    size = body_off + len(desc_tag)
    struct.pack_into(">I", header, 0, size)
    header[8] = 0x42  # version 4.2
    header[12:16] = device_class.encode("ascii")[:4].ljust(4)
    header[16:20] = color_space.encode("ascii")[:4].ljust(4)
    header[20:24] = b"XYZ "
    header[36:40] = b"acsp"
    return bytes(header) + tag_table + desc_tag


# -- container walks --

def jpeg_metadata(payload: bytes) -> dict:
    """Marker walk: SOF dims + APP1 EXIF + APP2 ICC (multi-chunk
    reassembly, ordered by sequence byte). Stops at SOS — metadata
    lives before the entropy stream, so cost is O(header), not
    O(payload)."""
    exif: dict[str, str] = {}
    icc_chunks: dict[int, bytes] = {}
    w = h = None
    try:
        pos = 2  # past SOI
        n = len(payload)
        while pos + 4 <= n:
            if payload[pos] != 0xFF:
                break
            marker = payload[pos + 1]
            if marker == 0xD9 or marker == 0xDA:  # EOI / SOS
                break
            (seglen,) = struct.unpack_from(">H", payload, pos + 2)
            seg = payload[pos + 4:pos + 2 + seglen]
            if marker == 0xE1 and seg[:6] == b"Exif\x00\x00":
                exif = parse_tiff(seg[6:])
            elif marker == 0xE2 and seg[:12] == b"ICC_PROFILE\x00":
                icc_chunks[seg[12]] = seg[14:]
            elif marker in (0xC0, 0xC1, 0xC2):
                h, w = struct.unpack_from(">HH", seg, 1)
            pos += 2 + seglen
    except Exception:
        pass
    icc = parse_icc(b"".join(icc_chunks[k] for k in sorted(icc_chunks))) \
        if icc_chunks else {}
    return {"format": "jpeg", "width": w, "height": h,
            "exif": exif, "icc": icc, "text": {}}


def png_metadata(payload: bytes) -> dict:
    """Chunk walk: IHDR dims + eXIf + iCCP (zlib) + tEXt pairs."""
    exif: dict[str, str] = {}
    icc: dict[str, str] = {}
    text: dict[str, str] = {}
    w = h = None
    try:
        pos = 8  # past signature
        n = len(payload)
        while pos + 8 <= n:
            (length,) = struct.unpack_from(">I", payload, pos)
            ctype = payload[pos + 4:pos + 8]
            data = payload[pos + 8:pos + 8 + length]
            if ctype == b"IHDR":
                w, h = struct.unpack_from(">II", data, 0)
            elif ctype == b"eXIf":
                exif = parse_tiff(data)
            elif ctype == b"iCCP":
                name, _, rest = data.partition(b"\x00")
                # Bounded inflate: a small hostile chunk can expand to
                # gigabytes (zip bomb) and OOM the executor, violating
                # the total-on-hostile-bytes contract. parse_icc only
                # reads the 128-byte header, the tag table, and the
                # desc tag — 64 KiB is orders of magnitude more than
                # that needs; overflow (unconsumed input left) or a
                # corrupt stream skips the profile and the walk goes on.
                try:
                    _d = zlib.decompressobj()
                    _out = _d.decompress(rest[1:], 65536)
                    if not _d.unconsumed_tail:
                        icc = parse_icc(_out)
                        icc["profile_name"] = name.decode(
                            "latin-1", "replace")
                except Exception:
                    pass
            elif ctype == b"tEXt":
                k, _, v = data.partition(b"\x00")
                text[k.decode("latin-1", "replace")] = v.decode(
                    "latin-1", "replace")
            elif ctype == b"IEND":
                break
            pos += 12 + length  # len + type + data + crc
    except Exception:
        pass
    return {"format": "png", "width": w, "height": h,
            "exif": exif, "icc": icc, "text": text}


def image_metadata(payload: bytes) -> dict:
    """Route on magic bytes; unknown formats come back empty but
    typed (total on arbitrary binary)."""
    if payload[:2] == b"\xff\xd8":
        return jpeg_metadata(payload)
    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        return png_metadata(payload)
    return {"format": None, "width": None, "height": None,
            "exif": {}, "icc": {}, "text": {}}


#: output schema for the Spark metadata pass
METADATA_SCHEMA = (
    "asset_id bigint, format string, width int, height int, "
    "exif map<string,string>, icc map<string,string>, "
    "text map<string,string>"
)


def metadata_assets(assets: DataFrame, payload_col: str = "payload",
                    id_col: str = "asset_id") -> DataFrame:
    """Header-only metadata pass over an image column: mapInPandas,
    embarrassingly parallel, reads container headers (a few KB per
    asset) — the cheap pre-filter a curation pipeline runs before any
    pixel decode."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            rows = []
            for aid, b in zip(pdf[id_col], pdf[payload_col]):
                m = (image_metadata(bytes(b)) if b is not None else
                     {"format": None, "width": None, "height": None,
                      "exif": {}, "icc": {}, "text": {}})
                rows.append({
                    "asset_id": int(aid), "format": m["format"],
                    "width": m["width"], "height": m["height"],
                    "exif": m["exif"], "icc": m["icc"], "text": m["text"],
                })
            yield pd.DataFrame(rows)

    return assets.mapInPandas(run, METADATA_SCHEMA)
