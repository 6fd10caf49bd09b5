"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video are ``binary`` columns with a metadata struct; decode /
feature-extraction run as Arrow-batched ``mapInPandas`` stages. The decode
kernels themselves are STUBBED (image/audio libraries are not in this
environment — see ``DecodeImage``) but the Spark-side plumbing — schema,
batch iteration, partition sizing — is real and tested.

At 100 TB: binary payloads dominate row size, so operators here always
project metadata-only where possible (``with_binary_meta`` reads bytes
once, scan-side) and repartition by size class before Python stages so
Arrow batches stay within executor memory.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("kind", T.StringType(), True),
    ]
)


def with_binary_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Attach typed metadata computed scan-side (no Python)."""
    b = F.col(binary_col)
    return df.withColumn(
        "media_meta",
        F.struct(
            F.length(b).cast("long").alias("n_bytes"),
            F.md5(b).alias("content_hash"),
            F.lit(None).cast("string").alias("kind"),
        ),
    )


try:  # optional dependency: real pixel decode when Pillow is installed
    from PIL import Image as _PILImage  # type: ignore
except ImportError:  # env without Pillow -> deterministic stub kernel
    _PILImage = None


def decode_image_batch(payload: bytes) -> dict:
    """Image decode kernel. Decode order: Pillow when importable (any
    format), then the built-in pure-Python gray-8 PNG pixel decoder
    (``decode_png_gray`` — REAL decode, stdlib zlib only), then a
    deterministic fake derived from the bytes so the mapInPandas
    pipeline stays testable end-to-end on arbitrary payloads in minimal
    envs. The registered ``mm_*`` gates that hash-compare are
    byte-parser based (PNG/WAV/MP4 headers) or use ``decode_png_gray``
    directly (``mm_png_pixel_roundtrip``), not this kernel, so
    installing Pillow does not perturb any exact oracle."""
    if _PILImage is not None and payload:
        import io

        try:
            with _PILImage.open(io.BytesIO(payload)) as img:
                return {
                    "width": int(img.width),
                    "height": int(img.height),
                    "n_channels": len(img.getbands()),
                }
        except Exception:
            pass  # undecodable bytes -> same deterministic fallback
    if payload:
        real = decode_png_gray(payload)
        if real is not None:
            return {"width": real[0], "height": real[1], "n_channels": 1}
    h = sum(payload[:64]) if payload else 0
    return {
        "width": 64 + h % 64,
        "height": 64 + (h // 64) % 64,
        "n_channels": 3,
    }


def decode_images(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Decode stage: mapInPandas over binary payloads -> image features.

    Batch shape: one Arrow batch in, one pandas frame out with id +
    feature columns; payload column is dropped on output so downstream
    stages shuffle features, not bytes.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("n_channels", T.IntegerType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image_batch(p) for p in pdf[binary_col]]
            out = pd.DataFrame(feats)
            out.insert(0, "doc_id", pdf["doc_id"].values)
            out["width"] = out["width"].astype("int32")
            out["height"] = out["height"].astype("int32")
            out["n_channels"] = out["n_channels"].astype("int32")
            yield out

    return df.select("doc_id", binary_col).mapInPandas(run, out_schema)


def sample_frames(df: DataFrame, every_n: int = 10, frame_col: str = "frame_idx") -> DataFrame:
    """Frame sampling for video-like rows: keep every n-th frame.
    Pure filter — pushed to the scan."""
    return df.filter(F.col(frame_col) % every_n == 0)


def extract_frames(
    df: DataFrame,
    binary_col: str = "payload",
    n_frames_hint: int = 4,
) -> DataFrame:
    """Video frame extraction (1 -> N): each payload yields one row per
    sampled frame with per-frame metadata. The frame decoder is STUBBED
    (deterministic fake derived from the bytes; a real deployment plugs
    pyav/ffmpeg) but the batch shape — mapInPandas fan-out with the
    payload dropped from the output — is the real contract: downstream
    shuffles frame features, never video bytes.
    """
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("frame_idx", T.IntegerType(), False),
            T.StructField("frame_ts_ms", T.LongType(), False),
            T.StructField("luma_mean", T.DoubleType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, tss, lumas = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf[binary_col]):
                n = n_frames_hint if payload else 0
                for i in range(n):
                    ids.append(doc_id)
                    idxs.append(i)
                    tss.append(i * 40)  # 25 fps stub timeline
                    byte = payload[i % len(payload)]
                    lumas.append(round(byte / 255.0, 6))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int32"),
                    "frame_ts_ms": pd.Series(tss, dtype="int64"),
                    "luma_mean": pd.Series(lumas, dtype="float64"),
                }
            )

    return df.select("doc_id", binary_col).mapInPandas(run, out_schema)


# -- audio: REAL RIFF/WAV header codec (no external libs needed) -------------


def encode_wav_header(n_samples: int, sample_rate: int, n_channels: int = 1,
                      bits: int = 16) -> bytes:
    """Minimal canonical RIFF/WAVE header (PCM). Byte-exact per the public
    WAVE spec; used to synthesize test fixtures and as the write side of
    the audio path."""
    import struct

    block_align = n_channels * bits // 8
    byte_rate = sample_rate * block_align
    data_size = n_samples * block_align
    return b"".join(
        [
            b"RIFF", struct.pack("<I", 36 + data_size), b"WAVE",
            b"fmt ", struct.pack("<IHHIIHH", 16, 1, n_channels, sample_rate,
                                 byte_rate, block_align, bits),
            b"data", struct.pack("<I", data_size),
        ]
    )


def parse_wav_meta(payload: bytes) -> dict | None:
    """Parse sample rate / channels / bit depth / frame count from a
    RIFF/WAVE header — a REAL decoder (unlike the stubbed image kernels):
    pure byte arithmetic, no audio library."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos = 12
    fmt = None
    data_size = None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", payload, pos + 4)
        if chunk_id == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif chunk_id == b"data":
            data_size = chunk_size
        pos += 8 + chunk_size + (chunk_size & 1)
        if fmt is not None and data_size is not None:
            break
    if fmt is None or data_size is None:
        return None
    _, n_channels, sample_rate, _, block_align, bits = fmt
    n_frames = data_size // block_align if block_align else 0
    return {
        "sample_rate": sample_rate,
        "n_channels": n_channels,
        "bits": bits,
        "n_frames": n_frames,
        "duration_ms": round(n_frames * 1000.0 / sample_rate, 6) if sample_rate else 0.0,
    }


def wav_pcm_sumsq(payload: bytes) -> tuple[int, int] | None:
    """REAL sample-level PCM decode: locate the ``data`` chunk, unpack
    16-bit little-endian samples, and return ``(n_samples, sum_sq)``
    with ``sum_sq`` an EXACT integer sum of squared sample values —
    integer output makes the result bit-reproducible across engines
    (float RMS summation order would not be). RMS = sqrt(sum_sq/n)."""
    import struct

    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, bits, data = 12, None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", payload, pos + 4)
        if chunk_id == b"fmt ":
            bits = struct.unpack_from("<HHIIHH", payload, pos + 8)[5]
        elif chunk_id == b"data":
            data = payload[pos + 8 : pos + 8 + chunk_size]
        pos += 8 + chunk_size + (chunk_size & 1)
    if bits != 16 or data is None:
        return None
    n = len(data) // 2
    samples = struct.unpack_from(f"<{n}h", data)
    return n, sum(s * s for s in samples)


def audio_pcm_stats(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Sample-level audio statistics: mapInPandas over WAV payloads,
    decoding actual PCM data (not just headers). Emits exact integer
    ``(n_samples, sum_sq)`` per doc; bytes never leave the stage."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("n_samples", T.LongType(), True),
            T.StructField("sum_sq", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            stats = [wav_pcm_sumsq(bytes(p)) for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_samples": pd.array(
                        [s[0] if s else None for s in stats], dtype="Int64"
                    ),
                    "sum_sq": pd.array(
                        [s[1] if s else None for s in stats], dtype="Int64"
                    ),
                }
            )

    return df.select("doc_id", binary_col).mapInPandas(run, out_schema)


def audio_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Audio metadata extraction: mapInPandas over WAV payloads. The
    header parse reads ~44 bytes/row; the payload never leaves the stage
    (downstream shuffles metadata only)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("n_channels", T.IntegerType(), True),
            T.StructField("bits", T.IntegerType(), True),
            T.StructField("n_frames", T.LongType(), True),
            T.StructField("duration_ms", T.DoubleType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_wav_meta(bytes(p)) or {} for p in pdf[binary_col]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "sample_rate": pd.array(
                        [m.get("sample_rate") for m in metas], dtype="Int32"
                    ),
                    "n_channels": pd.array(
                        [m.get("n_channels") for m in metas], dtype="Int32"
                    ),
                    "bits": pd.array([m.get("bits") for m in metas], dtype="Int32"),
                    "n_frames": pd.array(
                        [m.get("n_frames") for m in metas], dtype="Int64"
                    ),
                    "duration_ms": [m.get("duration_ms") for m in metas],
                }
            )
            yield out

    return df.select("doc_id", binary_col).mapInPandas(run, out_schema)


# -- image: REAL PNG header codec (pure bytes, no image libs) ----------------


def encode_png_header(width: int, height: int, bit_depth: int = 8,
                      color_type: int = 2) -> bytes:
    """Minimal byte-exact PNG signature + IHDR chunk (public PNG spec):
    8-byte signature, then length/type/payload/CRC32. Synthesizes test
    fixtures and the write side of the image-metadata path."""
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", width, height, bit_depth, color_type, 0, 0, 0)
    chunk = b"IHDR" + ihdr
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", len(ihdr))
        + chunk
        + struct.pack(">I", zlib.crc32(chunk) & 0xFFFFFFFF)
    )


def parse_png_meta(payload: bytes) -> dict | None:
    """Parse (width, height, bit_depth, color_type) from a PNG IHDR —
    REAL decoder: signature check, chunk walk, CRC32 verification."""
    import struct
    import zlib

    if len(payload) < 33 or payload[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    (length,) = struct.unpack_from(">I", payload, 8)
    if payload[12:16] != b"IHDR" or length != 13:
        return None
    chunk = payload[12 : 16 + 13]
    (crc,) = struct.unpack_from(">I", payload, 16 + 13)
    if zlib.crc32(chunk) & 0xFFFFFFFF != crc:
        return None
    width, height, bit_depth, color_type = struct.unpack_from(">IIBB", payload, 16)
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type)
    return {
        "width": width,
        "height": height,
        "bit_depth": bit_depth,
        "color_type": color_type,
        "n_channels": channels,
    }


def encode_png_gray(pixels: bytes, width: int, height: int) -> bytes:
    """Complete, standards-valid 8-bit grayscale PNG (public PNG spec;
    stdlib zlib only): signature + IHDR + one filter-0 IDAT + IEND, all
    chunks CRC32'd. Pairs with ``decode_png_gray`` for a byte-real
    encode->decode round trip with no image library."""
    import struct
    import zlib

    if len(pixels) != width * height:
        raise ValueError("pixels must be width*height bytes")

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
    raw = b"".join(
        b"\x00" + pixels[y * width : (y + 1) * width] for y in range(height)
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def decode_png_gray(payload: bytes) -> tuple[int, int, bytes] | None:
    """REAL pixel decode for 8-bit grayscale PNGs (stdlib zlib only):
    signature + chunk walk with CRC32 verify, multi-IDAT concat +
    inflate, and per-scanline un-filtering for all five PNG filter
    types (None/Sub/Up/Average/Paeth). Returns (width, height, pixels)
    or None for anything that is not a valid gray-8 PNG."""
    import struct
    import zlib

    meta = parse_png_meta(payload)
    if meta is None or meta["color_type"] != 0 or meta["bit_depth"] != 8:
        return None
    w, h = meta["width"], meta["height"]
    pos, idat = 8, []
    while pos + 12 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, pos)
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        if len(data) != length:
            return None
        (crc,) = struct.unpack_from(">I", payload, pos + 8 + length)
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            return None
        if typ == b"IDAT":
            idat.append(data)
        pos += 12 + length
        if typ == b"IEND":
            break
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error:
        return None
    if len(raw) != h * (w + 1):
        return None
    out = bytearray()
    prev = bytearray(w)
    for y in range(h):
        line = raw[y * (w + 1) : (y + 1) * (w + 1)]
        ftype, cur = line[0], bytearray(line[1:])
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for x in range(1, w):
                cur[x] = (cur[x] + cur[x - 1]) & 0xFF
        elif ftype == 2:  # Up
            for x in range(w):
                cur[x] = (cur[x] + prev[x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(w):
                left = cur[x - 1] if x else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(w):
                a = cur[x - 1] if x else 0
                b, c = prev[x], (prev[x - 1] if x else 0)
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            return None
        out += cur
        prev = cur
    return w, h, bytes(out)


def decode_png_pixels(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Pixel-level decode stage: mapInPandas over gray-8 PNG payloads ->
    (doc_id, width, height, pixel_sum). The decoded pixel buffer never
    leaves the Python worker — only the 28-byte feature row shuffles, so
    at 100 TB the payload bytes are read exactly once, scan-side."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("pixel_sum", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [decode_png_gray(bytes(p)) for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "width": pd.array(
                        [d[0] if d else None for d in decoded], dtype="Int32"
                    ),
                    "height": pd.array(
                        [d[1] if d else None for d in decoded], dtype="Int32"
                    ),
                    "pixel_sum": pd.array(
                        [sum(d[2]) if d else None for d in decoded], dtype="Int64"
                    ),
                }
            )

    return df.select("doc_id", binary_col).mapInPandas(run, out_schema)


def image_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Image metadata extraction over PNG payloads (mapInPandas; ~33
    bytes read per row, payloads never shuffle)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("bit_depth", T.IntegerType(), True),
            T.StructField("color_type", T.IntegerType(), True),
            T.StructField("n_channels", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_png_meta(bytes(p)) or {} for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    **{
                        f: pd.array([m.get(f) for m in metas], dtype="Int32")
                        for f in ("width", "height", "bit_depth", "color_type", "n_channels")
                    },
                }
            )

    return df.select("doc_id", binary_col).mapInPandas(run, out_schema)


# -- video: REAL ISO-BMFF (MP4) box parser (pure bytes, no video libs) -------


def encode_mp4_header(duration_ms: int, timescale: int = 1000,
                      major_brand: bytes = b"isom") -> bytes:
    """Minimal byte-exact ftyp + moov/mvhd box chain (public ISO base
    media file format): enough structure for duration/timescale
    metadata, mirroring what a real probe reads."""
    import struct

    ftyp = b"ftyp" + major_brand + struct.pack(">I", 0x200) + b"isomiso2"
    ftyp = struct.pack(">I", 8 + len(ftyp) - 4) + ftyp
    duration = duration_ms * timescale // 1000
    mvhd_payload = (
        struct.pack(">B3x", 0)          # version 0, flags
        + struct.pack(">II", 0, 0)       # creation/modification time
        + struct.pack(">I", timescale)
        + struct.pack(">I", duration)
        + b"\x00" * 80                   # rate/volume/matrix/next_track etc.
    )
    mvhd = struct.pack(">I", 8 + len(mvhd_payload)) + b"mvhd" + mvhd_payload
    moov = struct.pack(">I", 8 + len(mvhd)) + b"moov" + mvhd
    return ftyp + moov


def parse_mp4_meta(payload: bytes) -> dict | None:
    """Parse (major_brand, timescale, duration_ms) by walking top-level
    boxes to moov/mvhd — a REAL ISO-BMFF reader (box framing, nested
    walk, version-0/1 mvhd layouts)."""
    import struct

    def walk(buf, pos, end):
        while pos + 8 <= end:
            (size,) = struct.unpack_from(">I", buf, pos)
            box = buf[pos + 4 : pos + 8]
            if size < 8:
                return
            yield box, pos + 8, min(pos + size, end)
            pos += size

    if len(payload) < 16:
        return None
    brand = None
    ts = dur = None
    for box, s, e in walk(payload, 0, len(payload)):
        if box == b"ftyp" and e - s >= 4:
            brand = payload[s : s + 4].decode("ascii", "replace")
        elif box == b"moov":
            for inner, is_, ie in walk(payload, s, e):
                if inner == b"mvhd" and ie - is_ >= 4:
                    version = payload[is_]
                    if version == 0 and ie - is_ >= 20:
                        ts, dur = struct.unpack_from(">II", payload, is_ + 12)
                    elif version == 1 and ie - is_ >= 32:
                        ts = struct.unpack_from(">I", payload, is_ + 20)[0]
                        dur = struct.unpack_from(">Q", payload, is_ + 24)[0]
    if brand is None or ts is None or not ts:
        return None
    return {
        "major_brand": brand,
        "timescale": ts,
        "duration_ms": dur * 1000 // ts,
    }


def video_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Video metadata extraction over MP4 payloads (mapInPandas; reads
    header boxes only, payloads never shuffle)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("major_brand", T.StringType(), True),
            T.StructField("timescale", T.IntegerType(), True),
            T.StructField("duration_ms", T.LongType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_mp4_meta(bytes(p)) or {} for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "major_brand": [m.get("major_brand") for m in metas],
                    "timescale": pd.array(
                        [m.get("timescale") for m in metas], dtype="Int32"
                    ),
                    "duration_ms": pd.array(
                        [m.get("duration_ms") for m in metas], dtype="Int64"
                    ),
                }
            )

    return df.select("doc_id", binary_col).mapInPandas(run, out_schema)


# -- image #2: REAL JPEG/JFIF marker-segment parser (pure bytes) -------------
#
# The fourth pure-byte codec (PNG/WAV/MP4/JPEG): JPEG is the dominant
# web image format, and its metadata lives in marker segments (ITU
# T.81 B.1): 0xFF <marker>, then for non-standalone markers a 2-byte
# big-endian length INCLUDING the length field. Frame geometry is in
# the SOFn segment (precision, height, width, component count);
# SOF2 means progressive. Same contract as the reference's multimodal
# decode surface (sdks/python/apache_beam/ml/ MLTransform-style byte
# plumbing): payloads never shuffle, ~a few dozen bytes read per row.


def encode_jpeg_header(
    width: int,
    height: int,
    n_components: int = 3,
    progressive: bool = False,
    comment: bytes = b"",
) -> bytes:
    """Minimal structurally-valid JPEG prefix (SOI + JFIF APP0 +
    optional COM + SOFn + EOI) — synthesizes metadata-parse fixtures;
    no entropy-coded data (parsers stop at SOF/SOS)."""
    import struct

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload

    app0 = b"JFIF\x00" + bytes([1, 2, 0]) + struct.pack(">HH", 72, 72) + b"\x00\x00"
    sof_marker = 0xC2 if progressive else 0xC0
    comps = b"".join(
        bytes([i + 1, 0x22 if i == 0 else 0x11, 0 if i == 0 else 1])
        for i in range(n_components)
    )
    sof = bytes([8]) + struct.pack(">HH", height, width) + bytes([n_components]) + comps
    out = b"\xff\xd8" + seg(0xE0, app0)
    if comment:
        out += seg(0xFE, comment)
    return out + seg(sof_marker, sof) + b"\xff\xd9"


def parse_jpeg_meta(payload: bytes) -> dict | None:
    """REAL JPEG metadata decode: SOI check, marker-segment walk
    (standalone markers, fill bytes, APPn/COM/DQT skipped by declared
    length) to the first SOFn frame header. Returns width/height/
    precision/n_components/progressive or None for anything that is
    not a well-formed JPEG prefix (truncated segment, missing SOI,
    SOS/EOI before any SOF)."""
    import struct

    n = len(payload)
    if n < 4 or payload[0] != 0xFF or payload[1] != 0xD8:
        return None
    pos = 2
    while pos + 1 < n:
        if payload[pos] != 0xFF:
            return None  # desynchronized marker stream
        while pos + 1 < n and payload[pos + 1] == 0xFF:
            pos += 1  # fill bytes
        if pos + 1 >= n:
            return None
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9 or marker == 0xDA:  # EOI / SOS before SOF
            return None
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # standalone
            continue
        if pos + 2 > n:
            return None
        (length,) = struct.unpack_from(">H", payload, pos)
        if length < 2 or pos + length > n:
            return None
        is_sof = 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC)
        if is_sof:
            if length < 8:
                return None
            precision = payload[pos + 2]
            height, width = struct.unpack_from(">HH", payload, pos + 3)
            n_components = payload[pos + 7]
            if length != 8 + 3 * n_components:
                return None
            return {
                "width": width,
                "height": height,
                "precision": precision,
                "n_components": n_components,
                "progressive": marker == 0xC2,
            }
        pos += length
    return None


def jpeg_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """JPEG metadata extraction (mapInPandas; marker walk reads a few
    dozen bytes per row, payloads never shuffle — same plumbing
    contract as image_meta/audio_meta/video_meta)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("precision", T.IntegerType(), True),
            T.StructField("n_components", T.IntegerType(), True),
            T.StructField("progressive", T.BooleanType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_jpeg_meta(bytes(p)) or {} for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    **{
                        f: pd.array([m.get(f) for m in metas], dtype="Int32")
                        for f in ("width", "height", "precision", "n_components")
                    },
                    "progressive": pd.array(
                        [m.get("progressive") for m in metas], dtype="boolean"
                    ),
                }
            )

    return df.select("doc_id", binary_col).mapInPandas(run, out_schema)


# --- GIF (the fifth pure-byte format: PNG/WAV/MP4/JPEG/GIF) -----------------


def encode_gif_header(
    width: int,
    height: int,
    img_width: int | None = None,
    img_height: int | None = None,
    gct_exp: int | None = 1,
    interlaced: bool = False,
    version: str = "89a",
    comment: bytes = b"",
    gce: bool = False,
) -> bytes:
    """Minimal structurally-valid GIF (header + logical screen
    descriptor + optional global color table + optional GCE/comment
    extensions + first image descriptor + 1-byte LZW stub + trailer) —
    synthesizes metadata-parse fixtures. ``gct_exp=None`` omits the
    global color table; a comment longer than 255 bytes exercises
    multi-sub-block skipping."""
    import struct

    iw = width if img_width is None else img_width
    ih = height if img_height is None else img_height
    packed = 0
    if gct_exp is not None:
        if not 0 <= gct_exp <= 7:
            raise ValueError(f"gct_exp={gct_exp} outside the 3-bit GIF range 0..7")
        packed = 0x80 | gct_exp
    out = b"GIF" + version.encode("ascii")
    out += struct.pack("<HH", width, height) + bytes([packed, 0, 0])
    if gct_exp is not None:
        out += bytes(3 * (1 << (gct_exp + 1)))  # zeroed palette
    if gce:
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    if comment:
        out += b"\x21\xfe"
        for i in range(0, len(comment), 255):
            chunk = comment[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    ipacked = 0x40 if interlaced else 0
    out += b"\x2c" + struct.pack("<HHHH", 0, 0, iw, ih) + bytes([ipacked])
    out += b"\x02\x01\x00\x00"  # LZW min code size + 1 data sub-block + term
    return out + b"\x3b"


def parse_gif_meta(payload: bytes) -> dict | None:
    """REAL GIF metadata decode: signature/version check, logical
    screen descriptor, global-color-table skip by declared size,
    extension-block walk (sub-block chains skipped by length bytes) to
    the FIRST image descriptor. Returns version/width/height/
    gct_entries/img_width/img_height/interlaced, or None for anything
    not a well-formed GIF prefix (bad signature, truncation anywhere,
    unknown block introducer, trailer before any image)."""
    import struct

    n = len(payload)
    if n < 13 or payload[:3] != b"GIF":
        return None
    version = payload[3:6].decode("ascii", "replace")
    if version not in ("87a", "89a"):
        return None
    width, height = struct.unpack_from("<HH", payload, 6)
    packed = payload[10]
    gct_entries = (1 << ((packed & 0x07) + 1)) if packed & 0x80 else 0
    pos = 13 + 3 * gct_entries
    if pos > n:
        return None  # truncated palette
    while pos < n:
        introducer = payload[pos]
        pos += 1
        if introducer == 0x3B:  # trailer before any image descriptor
            return None
        if introducer == 0x21:  # extension: label + sub-block chain
            if pos >= n:
                return None
            pos += 1  # label
            while True:
                if pos >= n:
                    return None
                size = payload[pos]
                pos += 1 + size
                if pos > n:
                    return None
                if size == 0:
                    break
            continue
        if introducer == 0x2C:  # image descriptor
            if pos + 9 > n:
                return None
            left, top, iw, ih = struct.unpack_from("<HHHH", payload, pos)
            ipacked = payload[pos + 8]
            return {
                "version": version,
                "width": width,
                "height": height,
                "gct_entries": gct_entries,
                "img_width": iw,
                "img_height": ih,
                "interlaced": bool(ipacked & 0x40),
            }
        return None  # unknown introducer: desynchronized
    return None


def gif_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """GIF metadata extraction (mapInPandas; the walk reads tens of
    bytes plus the declared palette skip per row, payloads never
    shuffle — the shared multimodal plumbing contract)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("version", T.StringType(), True),
            T.StructField("width", T.IntegerType(), True),
            T.StructField("height", T.IntegerType(), True),
            T.StructField("gct_entries", T.IntegerType(), True),
            T.StructField("img_width", T.IntegerType(), True),
            T.StructField("img_height", T.IntegerType(), True),
            T.StructField("interlaced", T.BooleanType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_gif_meta(bytes(p)) or {} for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "version": pd.array(
                        [m.get("version") for m in metas], dtype="string"
                    ),
                    **{
                        f: pd.array([m.get(f) for m in metas], dtype="Int32")
                        for f in (
                            "width",
                            "height",
                            "gct_entries",
                            "img_width",
                            "img_height",
                        )
                    },
                    "interlaced": pd.array(
                        [m.get("interlaced") for m in metas], dtype="boolean"
                    ),
                }
            )

    return df.select("doc_id", binary_col).mapInPandas(run, out_schema)


def encode_flac_streaminfo(
    sample_rate: int,
    total_samples: int,
    n_channels: int = 1,
    bits: int = 16,
    min_block: int = 1152,
    max_block: int = 4096,
    vorbis_vendor: bytes = b"",
    padding: int = 0,
) -> bytes:
    """Minimal canonical FLAC metadata prefix (public FLAC format spec):
    the ``fLaC`` magic, the mandatory STREAMINFO block first, then an
    optional VORBIS_COMMENT block (whose CONTENT is little-endian while
    every FLAC block header is big-endian — the classic mixed-endian
    trap) and an optional PADDING block. The last block carries the
    last-metadata-block flag; audio frames would follow it."""
    import struct

    blocks: list[tuple[int, bytes]] = []
    packed = (
        (sample_rate << 44)
        | ((n_channels - 1) << 41)
        | ((bits - 1) << 36)
        | total_samples
    )
    streaminfo = b"".join(
        [
            struct.pack(">HH", min_block, max_block),
            b"\x00" * 6,  # min/max frame size: unknown
            struct.pack(">Q", packed),
            b"\x00" * 16,  # unset MD5
        ]
    )
    blocks.append((0, streaminfo))
    if vorbis_vendor:
        blocks.append(
            (4, struct.pack("<I", len(vorbis_vendor)) + vorbis_vendor
             + struct.pack("<I", 0))
        )
    if padding:
        blocks.append((1, b"\x00" * padding))
    out = [b"fLaC"]
    for i, (btype, body) in enumerate(blocks):
        last = 0x80 if i == len(blocks) - 1 else 0
        out.append(bytes([last | btype]) + len(body).to_bytes(3, "big") + body)
    return b"".join(out)


def parse_flac_meta(payload: bytes) -> dict | None:
    """Parse STREAMINFO (and walk the remaining metadata blocks) from a
    FLAC byte prefix — a REAL decoder: pure byte/bit arithmetic, no
    audio library. Malformed framing returns None; a structurally valid
    STREAMINFO with spec-invalid fields (zero sample rate, more than 8
    channels) raises — silent zeros would poison aggregates downstream."""
    import struct

    if len(payload) < 8 or payload[:4] != b"fLaC":
        return None
    pos = 4
    first = True
    info: dict | None = None
    n_blocks = 0
    vendor_len = None
    padding_bytes = 0
    saw_last_flag = False
    while pos + 4 <= len(payload):
        hdr = payload[pos]
        btype = hdr & 0x7F
        length = int.from_bytes(payload[pos + 1 : pos + 4], "big")
        body = payload[pos + 4 : pos + 4 + length]
        if len(body) != length:
            return None  # truncated block
        if first:
            if btype != 0 or length != 34:
                return None  # STREAMINFO must come first, 34 bytes
            first = False
        n_blocks += 1
        if btype == 0:
            min_block, max_block = struct.unpack_from(">HH", body, 0)
            (packed,) = struct.unpack_from(">Q", body, 10)
            sample_rate = packed >> 44
            n_channels = ((packed >> 41) & 0x7) + 1
            bits = ((packed >> 36) & 0x1F) + 1
            total_samples = packed & ((1 << 36) - 1)
            if sample_rate == 0:
                raise ValueError("FLAC STREAMINFO: sample rate 0 is invalid")
            if n_channels > 8:
                raise ValueError(
                    f"FLAC STREAMINFO: {n_channels} channels exceeds the spec max of 8"
                )
            info = {
                "sample_rate": sample_rate,
                "n_channels": n_channels,
                "bits": bits,
                "total_samples": total_samples,
                "min_block": min_block,
                "max_block": max_block,
            }
        elif btype == 4 and len(body) >= 4:
            (vendor_len,) = struct.unpack_from("<I", body, 0)  # LE content
        elif btype == 1:
            padding_bytes += length
        pos += 4 + length
        if hdr & 0x80:
            saw_last_flag = True
            break  # last-metadata-block flag: audio frames follow
    if info is None:
        return None
    if not saw_last_flag:
        # The block walk fell off the end of the payload without ever
        # seeing the last-metadata-block flag — truncated framing, even
        # when the truncation happens to land on a block boundary
        # (ADVICE r10: the docstring promises None for malformed framing).
        return None
    info["n_blocks"] = n_blocks
    info["vendor_len"] = vendor_len
    info["padding_bytes"] = padding_bytes
    return info


def flac_meta(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """FLAC metadata extraction (mapInPandas; the walk reads a few tens
    of bytes per row and payloads never shuffle — the shared multimodal
    plumbing contract)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("sample_rate", T.IntegerType(), True),
            T.StructField("channels", T.IntegerType(), True),
            T.StructField("bits", T.IntegerType(), True),
            T.StructField("total_samples", T.LongType(), True),
            T.StructField("max_block", T.IntegerType(), True),
            T.StructField("n_blocks", T.IntegerType(), True),
            T.StructField("vendor_len", T.IntegerType(), True),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [parse_flac_meta(bytes(p)) or {} for p in pdf[binary_col]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "sample_rate": pd.array(
                        [m.get("sample_rate") for m in metas], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [m.get("n_channels") for m in metas], dtype="Int32"
                    ),
                    "bits": pd.array([m.get("bits") for m in metas], dtype="Int32"),
                    "total_samples": pd.array(
                        [m.get("total_samples") for m in metas], dtype="Int64"
                    ),
                    "max_block": pd.array(
                        [m.get("max_block") for m in metas], dtype="Int32"
                    ),
                    "n_blocks": pd.array(
                        [m.get("n_blocks") for m in metas], dtype="Int32"
                    ),
                    "vendor_len": pd.array(
                        [m.get("vendor_len") for m in metas], dtype="Int32"
                    ),
                }
            )

    return df.select("doc_id", binary_col).mapInPandas(run, out_schema)


def average_hash(
    pixels: bytes, width: int, height: int, grid: int = 8
) -> tuple[int, int]:
    """Perceptual average-hash (aHash) of a gray-8 image: average-pool
    to a ``grid x grid`` thumbnail (integer block means), threshold each
    cell against the integer mean of the thumbnail, pack the 64 bits
    row-major into two unsigned 32-bit halves (hi = bits 32-63). The
    standard cheap image near-dup fingerprint: small pixel noise that
    cancels inside a block leaves the hash bit-identical."""
    bw, bh = width // grid, height // grid
    if bw == 0 or bh == 0 or width % grid or height % grid:
        raise ValueError(f"image {width}x{height} not poolable to {grid}x{grid}")
    pooled = []
    for gr in range(grid):
        for gc in range(grid):
            s = 0
            for r in range(gr * bh, (gr + 1) * bh):
                row = r * width
                for c in range(gc * bw, (gc + 1) * bw):
                    s += pixels[row + c]
            pooled.append(s // (bw * bh))
    mean = sum(pooled) // (grid * grid)
    lo = hi = 0
    for i, v in enumerate(pooled):
        if v >= mean:
            if i < 32:
                lo |= 1 << i
            else:
                hi |= 1 << (i - 32)
    return hi, lo


def resize_gray_box(
    pixels: bytes, width: int, height: int, factor: int
) -> tuple[bytes, int, int]:
    """Box-filter downscale of a gray-8 image by an integer factor:
    each output pixel is the integer mean of a ``factor x factor``
    input block (the resize primitive batch image pipelines apply
    before feature extraction). Returns (pixels, new_w, new_h)."""
    if factor <= 0 or width % factor or height % factor:
        raise ValueError(f"{width}x{height} not divisible by factor {factor}")
    nw, nh = width // factor, height // factor
    out = bytearray(nw * nh)
    area = factor * factor
    for gr in range(nh):
        for gc in range(nw):
            s = 0
            for r in range(gr * factor, (gr + 1) * factor):
                base = r * width
                for c in range(gc * factor, (gc + 1) * factor):
                    s += pixels[base + c]
            out[gr * nw + gc] = s // area
    return bytes(out), nw, nh


def decimate_wav(payload: bytes, factor: int) -> bytes | None:
    """Integer-factor audio downsample (resample-by-decimation) of a
    16-bit mono PCM WAV: keep every ``factor``-th sample (offset 0) and
    re-encode a valid WAV at ``sample_rate // factor`` — the cheap
    anti-aliasing-free resample batch audio pipelines use for feature
    extraction. Returns the new WAV bytes, or None if the input is not
    a mono 16-bit PCM WAV."""
    import struct

    if factor <= 0:
        raise ValueError(f"bad factor {factor}")
    if len(payload) < 44 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        chunk_id = payload[pos : pos + 4]
        (chunk_size,) = struct.unpack_from("<I", payload, pos + 4)
        if chunk_id == b"fmt ":
            fmt = struct.unpack_from("<HHIIHH", payload, pos + 8)
        elif chunk_id == b"data":
            data = payload[pos + 8 : pos + 8 + chunk_size]
        pos += 8 + chunk_size + (chunk_size & 1)
    if fmt is None or data is None or fmt[0] != 1 or fmt[1] != 1 or fmt[5] != 16:
        return None  # requires PCM (wFormatTag 1), mono, 16-bit
    sample_rate = fmt[2]
    n = len(data) // 2
    samples = struct.unpack_from(f"<{n}h", data)
    kept = samples[::factor]
    return encode_wav_header(
        n_samples=len(kept), sample_rate=sample_rate // factor
    ) + struct.pack(f"<{len(kept)}h", *kept)
