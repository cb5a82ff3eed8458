"""Multimodal column plumbing: binary payloads + typed metadata.

Images/audio/video ride as opaque ``binary`` columns next to a typed
metadata struct. The Spark-side machinery — schema, Arrow batching via
``mapInPandas``, partition sizing — is real and tested. Decoding is
REAL for PCM WAV, 24-bit BMP, binary PPM (stdlib+numpy byte math),
baseline JPEG (functions/jpeg.py, pure-python huffman+IDCT), 8-bit PNG
(functions/png.py, stdlib zlib + unfiltering) and MP4 container
metadata (ISO-BMFF box walk — duration/dimensions). Only video SAMPLE
decode and the feature-extraction models stay stubbed (no codec/model
libs in this container): those paths produce deterministic fake
features derived from the bytes, and raise ``NotImplementedError``
when the real kernel is requested.

At scale the pattern matters more than the codec: binary columns make
Parquet row groups large, so pipelines should ``repartition`` by a
size-aware key before heavy decode stages, and decode inside
``mapInPandas`` so one Python worker processes whole Arrow batches.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: a multimodal asset row: payload + typed metadata
ASSET_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), True),
        StructField("mime", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("content_md5", StringType(), True),
        StructField("features", ArrayType(DoubleType()), True),
    ]
)


def _fake_features(payload: bytes, n: int = 8) -> list[float]:
    """Deterministic stand-in for a decoded feature vector."""
    digest = hashlib.sha1(payload).digest()
    return [digest[i] / 255.0 for i in range(n)]


def extract_features(assets: DataFrame, real_codec: bool = False, n_features: int = 8) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    ``real_codec=True`` decodes with the in-repo codecs (JPEG/PNG/BMP/
    PPM/WAV — functions/jpeg.py, functions/png.py, the byte-math
    decoders below) and emits REAL content statistics as the feature
    vector: [width, height, channels, mean, std, per-channel means...]
    for images, [rate, channels, duration, mean, rms, ...] for audio —
    the deterministic, model-free analog of an embedding stage. A
    payload no in-repo codec can decode raises ``NotImplementedError``
    (a neural encoder is genuinely unavailable here). The default stub
    path derives fake features from the bytes so the distributed
    plumbing is exercisable on arbitrary payloads.
    """

    def real_features(b: bytes) -> list[float] | None:
        import numpy as np

        meta = decode_payload(b)
        fmt = meta.get("format")
        if fmt in ("jpeg", "png", "bmp", "ppm"):
            if fmt == "jpeg":
                from graphouse_spark.functions.jpeg import decode_baseline_jpeg

                px = decode_baseline_jpeg(b)["pixels"].astype(np.float64)
            elif fmt == "png":
                from graphouse_spark.functions.png import decode_png

                px = decode_png(b)["pixels"].astype(np.float64)
            else:
                # bmp/ppm byte-math decoders report stats; re-derive px
                px = _pixels_of(b, fmt)
            if px.ndim == 2:
                px = px[:, :, None]
            chan = [float(px[..., c].mean()) for c in range(px.shape[2])]
            out = [float(px.shape[1]), float(px.shape[0]),
                   float(px.shape[2]), float(px.mean()), float(px.std())]
            return (out + chan + [0.0] * n_features)[:n_features]
        if fmt == "wav":
            out = [float(meta.get("sample_rate") or 0),
                   float(meta.get("n_channels") or 0),
                   float(meta.get("duration_ms") or 0),
                   float(meta.get("mean_value") or 0.0),
                   float(meta.get("rms") or 0.0)]
            return (out + [0.0] * n_features)[:n_features]
        raise NotImplementedError(
            f"no in-repo codec for payload format {fmt!r}")

    feat = real_features if real_codec else (
        lambda b: _fake_features(b, n_features))

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "modality": pdf["modality"],
                    "n_bytes": payloads.map(lambda b: len(b) if b is not None else 0).astype("int64"),
                    # md5 so a SQL oracle can replay the metadata columns
                    "content_md5": payloads.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "features": payloads.map(
                        lambda b: feat(bytes(b)) if b is not None else None
                    ),
                }
            )

    return assets.mapInPandas(run, FEATURE_SCHEMA)


def _pixels_of(payload: bytes, fmt: str):
    """Pixel array for the byte-math formats (24-bit BMP / binary P6)."""
    import struct as _st

    import numpy as np

    if fmt == "bmp":
        data_off = _st.unpack_from("<I", payload, 10)[0]
        w, h = _st.unpack_from("<ii", payload, 18)
        row_bytes = (w * 3 + 3) & ~3
        px = np.frombuffer(payload, dtype=np.uint8, offset=data_off,
                           count=row_bytes * abs(h))
        return px.reshape(abs(h), row_bytes)[:, : w * 3]             .reshape(abs(h), w, 3)[::-1].astype(np.float64)
    meta = _decode_ppm(payload)
    w, h = meta["width"], meta["height"]
    # P6 pixel data is the trailing w*h*3 bytes
    return np.frombuffer(payload, dtype=np.uint8, offset=len(payload) - w * h * 3,
                         count=w * h * 3).reshape(h, w, 3).astype(np.float64)


def frame_sample_plan(assets: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Planned frame-sample points for video assets (plumbing only).

    Emits one row per (asset, sample_ts_ms) — the decode itself is the
    stubbed stage above. Demonstrates explode-based fan-out sized by
    metadata rather than by payload bytes.
    """
    videos = assets.filter(F.col("modality") == "video")
    samples = F.sequence(F.lit(0).cast("long"), F.col("duration_ms"), F.lit(every_ms).cast("long"))
    return videos.select(
        "asset_id", F.explode(samples).alias("sample_ts_ms")
    )


def synthetic_assets(spark, docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic fake asset table derived from the documents table.

    Lets the multimodal path run against driver-provided test data:
    payload = utf8 bytes of the text, modality round-robins by id.
    """
    modality = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("asset_id"),
        modality.alias("modality"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col(id_col) % 10 * 1000).cast("long").alias("duration_ms"),
    )


RESIZE_SCHEMA = (
    "asset_id long, modality string, payload binary, "
    "width int, height int, n_bytes long"
)


def resize_images(assets: DataFrame, width: int = 224, height: int = 224,
                  real_codec: bool = False) -> DataFrame:
    """Arrow-batched image resize (plumbing real, codec stubbed).

    ``real_codec=True`` REALLY resizes: decodable image payloads
    (JPEG/PNG/BMP/PPM via the in-repo codecs) are decoded,
    nearest-neighbor resampled in numpy, and re-encoded as lossless
    PNG; an image payload no in-repo codec handles raises
    ``NotImplementedError``. The default stub keeps every contract the
    real kernel has — images only (other modalities pass through
    untouched), payload replaced by a deterministically-derived
    "resized" buffer sized ``width*height*3``, metadata updated — so
    the plumbing runs on arbitrary payloads. Runs per Arrow batch; no
    per-row Python round trips through the driver.
    """
    target_len = width * height * 3

    def real_resize(b: bytes) -> bytes:
        import numpy as np

        from graphouse_spark.functions.jpeg import decode_baseline_jpeg
        from graphouse_spark.functions.png import decode_png, encode_png

        fmt = decode_payload(b).get("format")
        if fmt == "jpeg":
            px = decode_baseline_jpeg(b)["pixels"]
        elif fmt == "png":
            px = decode_png(b)["pixels"]
        elif fmt in ("bmp", "ppm"):
            px = _pixels_of(b, fmt).astype(np.uint8)
        else:
            raise NotImplementedError(
                f"no in-repo codec for payload format {fmt!r}")
        sh, sw = px.shape[:2]
        ys = (np.arange(height) * sh // height).clip(0, sh - 1)
        xs = (np.arange(width) * sw // width).clip(0, sw - 1)
        return encode_png(px[ys][:, xs])

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                payload = row["payload"]
                if row["modality"] == "image" and payload is not None:
                    if real_codec:
                        payload = real_resize(bytes(payload))
                    else:
                        # stub "resample": tile the source bytes to the
                        # target buffer size (deterministic, size-correct)
                        reps = -(-target_len // max(len(payload), 1))
                        payload = (bytes(payload) * reps)[:target_len]
                    w, h = width, height
                else:
                    w, h = None, None
                out.append((row["asset_id"], row["modality"], payload, w, h,
                            len(payload) if payload is not None else 0))
            yield pd.DataFrame(out, columns=["asset_id", "modality", "payload",
                                             "width", "height", "n_bytes"])

    return assets.mapInPandas(run, RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# REAL decoders. The container has no image/audio libraries, but PCM
# WAV, BMP and PPM need none (stdlib `wave` + numpy byte math),
# baseline JPEG decodes via functions/jpeg.py, PNG via functions/png.py
# (stdlib zlib), and MP4 metadata via a plain box walk. Only video
# SAMPLE decode remains honestly stubbed.
# ---------------------------------------------------------------------------

DECODE_SCHEMA = StructType(
    [
        StructField("asset_id", LongType(), False),
        StructField("modality", StringType(), False),
        StructField("format", StringType(), True),   # wav|bmp|ppm|unknown
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_channels", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("duration_ms", LongType(), True),
        StructField("mean_value", DoubleType(), True),  # mean pixel / sample
        StructField("rms", DoubleType(), True),         # audio energy
    ]
)


def _decode_wav(payload: bytes) -> dict:
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_ch, sw, rate, n_frames = w.getnchannels(), w.getsampwidth(), w.getframerate(), w.getnframes()
        raw = w.readframes(n_frames)
    dtype = {1: np.uint8, 2: np.int16, 4: np.int32}.get(sw)
    if dtype is None:
        raise ValueError(f"unsupported PCM sample width {sw}")
    samples = np.frombuffer(raw, dtype=dtype).astype(np.float64)
    if sw == 1:
        samples -= 128.0  # 8-bit WAV is unsigned
    return {
        "format": "wav", "n_channels": n_ch, "sample_rate": rate,
        "duration_ms": int(n_frames * 1000 / rate) if rate else None,
        "mean_value": float(samples.mean()) if samples.size else None,
        "rms": float(np.sqrt((samples ** 2).mean())) if samples.size else None,
    }


def _decode_bmp(payload: bytes) -> dict:
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or comp != 0:
        raise ValueError(f"only uncompressed 24-bit BMP supported (bpp={bpp})")
    row_bytes = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    px = np.frombuffer(payload, dtype=np.uint8, offset=data_off,
                       count=row_bytes * abs(h))
    px = px.reshape(abs(h), row_bytes)[:, : w * 3].astype(np.float64)
    return {
        "format": "bmp", "width": int(w), "height": int(abs(h)),
        "mean_value": float(px.mean()) if px.size else None,
    }


def _decode_ppm(payload: bytes) -> dict:
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a binary PPM")
    # header: P6 <w> <h> <maxval> then one whitespace byte, then pixels
    fields, i = [], 2
    while len(fields) < 3:
        while i < len(payload) and payload[i : i + 1].isspace():
            i += 1
        if payload[i : i + 1] == b"#":  # comment to end of line
            while i < len(payload) and payload[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(payload) and not payload[j : j + 1].isspace():
            j += 1
        fields.append(int(payload[i:j]))
        i = j
    i += 1  # the single whitespace after maxval
    w, h, _maxval = fields
    px = np.frombuffer(payload, dtype=np.uint8, offset=i, count=w * h * 3)
    return {
        "format": "ppm", "width": w, "height": h,
        "mean_value": float(px.astype(np.float64).mean()) if px.size else None,
    }


def _decode_jpeg(payload: bytes) -> dict:
    """Baseline JPEG via the pure-python codec (functions/jpeg.py) —
    the former honest stub, now a real huffman+IDCT decode."""
    import numpy as np

    from graphouse_spark.functions.jpeg import decode_baseline_jpeg

    d = decode_baseline_jpeg(payload)
    px = d["pixels"].astype(np.float64)
    return {
        "format": "jpeg", "width": d["width"], "height": d["height"],
        "n_channels": d["n_channels"],
        "mean_value": float(px.mean()) if px.size else None,
    }


def _decode_png_meta(payload: bytes) -> dict:
    """PNG via the pure-python zlib+unfilter codec (functions/png.py)."""
    import numpy as np

    from graphouse_spark.functions.png import decode_png

    d = decode_png(payload)
    px = d["pixels"].astype(np.float64)
    return {
        "format": "png", "width": d["width"], "height": d["height"],
        "n_channels": d["n_channels"],
        "mean_value": float(px.mean()) if px.size else None,
    }


def _decode_mp4_meta(payload: bytes) -> dict:
    """ISO-BMFF (MP4/MOV) METADATA parse — real box walking, no codec:
    ``moov/mvhd`` gives duration (duration/timescale), ``moov/trak/
    tkhd`` the presentation width/height (16.16 fixed point). Sample
    decode stays honestly stubbed; a training pipeline's
    filter-by-duration / filter-by-resolution stages only need this."""
    import struct as _st

    def walk(lo: int, hi: int, path: tuple[str, ...], out: dict) -> None:
        i = lo
        while i + 8 <= hi:
            size, btype = _st.unpack_from(">I4s", payload, i)
            body = i + 8
            if size == 1:  # 64-bit largesize
                size = _st.unpack_from(">Q", payload, i + 8)[0]
                body = i + 16
            if size < 8 or i + size > hi:
                raise ValueError("malformed box")
            name = btype.decode("latin1")
            p = path + (name,)
            if p == ("moov", "mvhd"):
                ver = payload[body]
                if ver == 1:
                    ts, dur = _st.unpack_from(">IQ", payload, body + 20)
                else:
                    ts, dur = _st.unpack_from(">II", payload, body + 12)
                out["duration_ms"] = int(dur * 1000 / ts) if ts else None
            elif p == ("moov", "trak", "tkhd"):
                ver = payload[body]
                # width/height: 16.16 fixed, after version-dependent
                # times + track id + duration + layout fields + matrix
                off = body + (76 if ver == 0 else 88)
                w, h = _st.unpack_from(">II", payload, off)
                out.setdefault("width", int(w >> 16) or None)
                out.setdefault("height", int(h >> 16) or None)
            if name in ("moov", "trak"):
                walk(body, i + size, p, out)
            i += size

    out: dict = {"format": "mp4"}
    walk(0, len(payload), (), out)
    return out


def decode_payload(payload: bytes) -> dict:
    """Sniff + decode one payload. Real for RIFF/WAVE, BM (24-bit), P6,
    baseline JPEG, 8-bit PNG and MP4 container METADATA (box walk —
    duration/dimensions; sample decode stays stubbed);
    ``{"format": "unknown"}`` otherwise (the caller decides whether to
    fall back to the stub features or fail)."""
    try:
        if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            return _decode_wav(payload)
        if payload[:2] == b"BM":
            return _decode_bmp(payload)
        if payload[:2] == b"P6":
            return _decode_ppm(payload)
        if payload[:3] == b"\xff\xd8\xff":
            return _decode_jpeg(payload)
        if payload[:8] == b"\x89PNG\r\n\x1a\n":
            return _decode_png_meta(payload)
        if len(payload) >= 12 and payload[4:8] == b"ftyp":
            return _decode_mp4_meta(payload)
    except Exception:
        return {"format": "unknown"}
    return {"format": "unknown"}


def decode_assets(assets: DataFrame) -> DataFrame:
    """Arrow-batched REAL decode for codec-free formats (PCM WAV,
    24-bit BMP, binary PPM); other payloads pass through with
    format='unknown'. Same mapInPandas shape as the stubbed
    feature extractor — swap-in proof that the plumbing carries a true
    codec when one is available."""

    cols = [f.name for f in DECODE_SCHEMA.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                meta = decode_payload(bytes(r["payload"])) if r["payload"] is not None \
                    else {"format": None}
                rows.append((
                    r["asset_id"], r["modality"], meta.get("format"),
                    meta.get("width"), meta.get("height"),
                    meta.get("n_channels"), meta.get("sample_rate"),
                    meta.get("duration_ms"), meta.get("mean_value"),
                    meta.get("rms"),
                ))
            yield pd.DataFrame(rows, columns=cols)

    return assets.mapInPandas(run, DECODE_SCHEMA)
