"""Multimodal columns: image/audio/video as opaque ``binary`` payloads
with typed metadata; decode / feature-extract / resize / frame-sample as
Arrow-batched ``mapInPandas`` stages.

The Spark-side plumbing (schema, partitioning, UDF signature, batch
shape) is real and tested. The actual codec step is STUBBED: the image /
audio libraries are not in this container, so ``_decode_stub`` derives a
deterministic fake from the payload bytes, and the real-codec hook raises
``NotImplementedError`` unless a decoder import succeeds (import-try
gate). Swapping in PIL/ffmpeg changes only the inner function — the
distributed plan is identical.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("payload", BinaryType(), False),
        StructField("mime", StringType(), True),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("n_frames", IntegerType(), True),
        StructField("feature", ArrayType(FloatType()), False),
    ]
)

FEATURE_DIM = 16


def _try_real_decoder():
    try:  # pragma: no cover - decoder libs absent in this container
        import PIL.Image  # noqa: F401

        return PIL.Image
    except Exception:
        return None


PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _decode_png_header(payload: bytes) -> dict | None:
    """Real (dependency-free) PNG decode of the IHDR chunk: width/height
    are the two big-endian uint32s at offsets 16/20 (PNG spec: 8-byte
    signature, 4-byte length, 'IHDR', then W,H). Returns None if the
    payload is not a PNG or is truncated."""
    if not payload.startswith(PNG_MAGIC) or len(payload) < 24:
        return None
    if payload[12:16] != b"IHDR":
        return None
    w, h = struct.unpack(">II", payload[16:24])
    return {"width": w, "height": h, "n_frames": 1}


def _decode_wav_header(payload: bytes) -> dict | None:
    """Real (dependency-free) WAV decode of the RIFF/fmt/data headers:
    walks the chunk list, reads channels/bits from 'fmt ' and computes the
    sample-frame count from the 'data' chunk size / block-align. Returns
    None if not a RIFF/WAVE or malformed."""
    if len(payload) < 12 or payload[0:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, block_align, data_size = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if cid == b"fmt " and pos + 8 + 16 <= len(payload):
            (block_align,) = struct.unpack("<H", payload[pos + 20 : pos + 22])
        elif cid == b"data":
            data_size = size
        pos += 8 + size + (size % 2)
    if not block_align or data_size is None:
        return None
    return {"width": None, "height": None, "n_frames": data_size // block_align}


GIF_MAGICS = (b"GIF87a", b"GIF89a")


def _decode_gif_header(payload: bytes) -> dict | None:
    """Real (dependency-free) GIF decode: width/height are the LE uint16s
    of the logical screen descriptor (offsets 6/8), and n_frames counts
    image descriptors (0x2C) by walking the block stream per the GIF89a
    spec — global/local color tables skipped by their flag sizes,
    extensions (0x21) and image data skipped sub-block by sub-block.
    Returns None if not a GIF or the walk runs off a malformed stream."""
    if len(payload) < 13 or payload[0:6] not in GIF_MAGICS:
        return None
    w, h = struct.unpack("<HH", payload[6:10])
    flags = payload[10]
    pos = 13
    if flags & 0x80:  # global color table: 3 * 2^(N+1) bytes
        pos += 3 * (2 << (flags & 0x07))
    frames = 0

    def skip_subblocks(p: int) -> int:
        while p < len(payload):
            size = payload[p]
            p += 1
            if size == 0:
                return p
            p += size
        return p

    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            break
        if b == 0x21:  # extension: label byte then sub-blocks
            pos = skip_subblocks(pos + 2)
        elif b == 0x2C:  # image descriptor
            frames += 1
            if pos + 10 > len(payload):
                return None
            lflags = payload[pos + 9]
            pos += 10
            if lflags & 0x80:  # local color table
                pos += 3 * (2 << (lflags & 0x07))
            pos += 1  # LZW minimum code size
            pos = skip_subblocks(pos)
        else:
            return None  # malformed stream
    if frames == 0:
        return None
    return {"width": w, "height": h, "n_frames": frames}


_MP4_CONTAINERS = {b"moov", b"trak", b"mdia", b"minf", b"stbl"}


def _decode_mp4_header(payload: bytes) -> dict | None:
    """Real (dependency-free) MP4 / ISO-BMFF decode: a recursive box walk
    ('ftyp' brand gate; 64-bit largesize and to-end-of-file sizes per the
    spec) that reads width/height from the first non-degenerate 'tkhd'
    (16.16 fixed point, version 0 and 1 layouts) and the frame count from
    the 'stsz' sample counts. Returns None if not ISO-BMFF or the walk
    runs off a malformed box tree."""
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        return None
    found: dict = {"w": None, "h": None, "frames": 0, "bad": False}

    def boxes(start: int, end: int):
        """Yield (btype, body_start, box_end); sets the bad flag and
        stops on malformed sizes (largesize and to-end handled)."""
        p = start
        while p + 8 <= end and not found["bad"]:
            size = int.from_bytes(payload[p : p + 4], "big")
            btype = payload[p + 4 : p + 8]
            body = p + 8
            if size == 1:  # 64-bit largesize
                if p + 16 > end:
                    found["bad"] = True
                    return
                size = int.from_bytes(payload[p + 8 : p + 16], "big")
                body = p + 16
            elif size == 0:  # box extends to end of enclosing scope
                size = end - p
            if size < body - p or p + size > end:
                found["bad"] = True
                return
            yield btype, body, p + size
            p += size

    def trak_handler(start: int, end: int, depth: int) -> bytes:
        """The trak's mdia/hdlr handler_type (b'vide' for video)."""
        if depth > 16:
            found["bad"] = True
            return b""
        for btype, body, box_end in boxes(start, end):
            if btype == b"hdlr" and body + 12 <= box_end:
                return payload[body + 8 : body + 12]
            if btype in _MP4_CONTAINERS:
                h = trak_handler(body, box_end, depth + 1)
                if h:
                    return h
        return b""

    def walk(start: int, end: int, depth: int, in_video: bool) -> None:
        if depth > 16:  # spec trees are ~6 deep; adversarial nesting
            found["bad"] = True  # must not exhaust the Python stack
            return
        for btype, body, box_end in boxes(start, end):
            if btype == b"trak":
                # gate tkhd/stsz on THIS trak's handler: an audio
                # track's stsz holds sample counts in the millions and
                # must not contaminate the video frame count
                vid = trak_handler(body, box_end, depth + 1) == b"vide"
                walk(body, box_end, depth + 1, vid)
            elif btype in _MP4_CONTAINERS:
                walk(body, box_end, depth + 1, in_video)
            elif in_video and btype == b"tkhd" and body + 4 <= box_end:
                ver = payload[body]
                off = body + 4 + (84 if ver == 1 else 72)
                if off + 8 <= box_end:
                    w = int.from_bytes(payload[off : off + 2], "big")
                    h = int.from_bytes(payload[off + 4 : off + 6], "big")
                    if w and h and found["w"] is None:
                        found["w"], found["h"] = w, h
            elif in_video and btype == b"stsz" and body + 12 <= box_end:
                found["frames"] += int.from_bytes(
                    payload[body + 8 : body + 12], "big"
                )

    walk(0, len(payload), 0, in_video=False)
    if found["bad"] or (found["w"] is None and found["frames"] == 0):
        return None
    return {
        "width": found["w"],
        "height": found["h"],
        "n_frames": found["frames"] or 1,
    }


_JPEG_SOF_MARKERS = {0xC0, 0xC1, 0xC2, 0xC3}  # baseline..lossless SOF
_JPEG_STANDALONE = set(range(0xD0, 0xD8)) | {0x01}  # RSTn, TEM: no length


def _decode_jpeg_header(payload: bytes) -> dict | None:
    """Real (dependency-free) JPEG decode: SOI gate, then the standard
    marker walk (2-byte big-endian segment lengths; RSTn/TEM stand-alone
    markers and FF fill bytes skipped per the spec) to the first SOFn
    frame header, whose payload is [precision u8][height u16][width u16].
    Returns None if not a JPEG, if the walk runs off a malformed stream,
    or if entropy data (SOS) / EOI arrives before any SOF."""
    if len(payload) < 4 or payload[0:2] != b"\xff\xd8":
        return None
    pos = 2
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            return None
        marker = payload[pos + 1]
        if marker == 0xFF:  # fill byte before a marker
            pos += 1
            continue
        if marker in _JPEG_STANDALONE:
            pos += 2
            continue
        if marker in (0xD8, 0xD9, 0xDA):  # second SOI / EOI / SOS: no SOF seen
            return None
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if seglen < 2 or pos + 2 + seglen > len(payload):
            return None
        if marker in _JPEG_SOF_MARKERS:
            if seglen < 7:
                return None
            h, w = struct.unpack(">HH", payload[pos + 5 : pos + 9])
            if w == 0 or h == 0:
                return None
            return {"width": w, "height": h, "n_frames": 1}
        pos += 2 + seglen
    return None


_BMP_DIB_SIZES = {40, 52, 56, 108, 124}  # INFOHEADER..V5: same dim layout


def _decode_bmp_header(payload: bytes) -> dict | None:
    """Real (dependency-free) BMP decode of the BITMAPINFOHEADER:
    'BM' magic AND a known DIB header size at offset 14 — the 2-byte
    magic alone matches 1/65536 of arbitrary binaries (and the 12-byte
    COREHEADER layout, whose dims are 16-bit at different offsets),
    which would route opaque payloads off the stub lane into garbage
    dimensions. biWidth / biHeight are LE int32 at offsets 18 / 22
    (height may be negative for top-down DIBs — absolute value)."""
    if len(payload) < 26 or payload[0:2] != b"BM":
        return None
    (dib_size,) = struct.unpack("<I", payload[14:18])
    if dib_size not in _BMP_DIB_SIZES:
        return None
    w, h = struct.unpack("<ii", payload[18:26])
    return {"width": w, "height": abs(h), "n_frames": 1}


def _md5_features(payload: bytes) -> list[float]:
    """Deterministic FEATURE_DIM-float embedding derived from md5(payload)
    — the feature-extraction model hook (a real encoder ships here in
    production; declared stub). The payload is hashed ONCE; each lane
    re-hashes the 16-byte digest, not the payload — multi-MB media would
    otherwise be hashed (and copied) FEATURE_DIM times per row."""
    base = hashlib.md5(payload).digest()
    feats = []
    for i in range(FEATURE_DIM):
        hh = hashlib.md5(base + bytes([i])).digest()
        (u,) = struct.unpack("<I", hh[:4])
        feats.append((u / 2**32) * 2.0 - 1.0)
    return feats


def _decode_stub(payload: bytes, kind: str) -> dict:
    """Decode dispatch: REAL header parse for PNG (IHDR width/height),
    WAV (RIFF sample-frame count), GIF (logical screen descriptor +
    frame-count block walk) and BMP (InfoHeader) — every fixture kind
    decodes real metadata; the md5-derived deterministic fake remains
    only for genuinely opaque payloads (the codec stub — swap via
    _try_real_decoder()). Feature vector is md5-derived in all lanes."""
    real = (
        _decode_png_header(payload)
        or _decode_wav_header(payload)
        or _decode_gif_header(payload)
        or _decode_bmp_header(payload)
        or _decode_jpeg_header(payload)
        or _decode_mp4_header(payload)
    )
    if real is not None:
        return {**real, "feature": _md5_features(payload)}
    h = hashlib.md5(payload).digest()
    w = 64 + h[0] % 192
    ht = 64 + h[1] % 192
    frames = 1 if kind == "image" else 1 + h[2] % 32
    return {"width": w, "height": ht, "n_frames": frames,
            "feature": _md5_features(payload)}


def decode_features(
    media: DataFrame,
    num_partitions: int | None = None,
    use_real_codec: bool = False,
) -> DataFrame:
    """media(media_id, kind, payload, mime) -> per-media typed features.
    Arrow batches in, Arrow batches out; payloads never hit the driver.
    The deterministic stub decoder is the default; ``use_real_codec=True``
    is the production hook (raises until a codec is wired in)."""
    if num_partitions:
        media = media.repartition(num_partitions, F.xxhash64("media_id"))

    def run(batches) -> Iterator:
        import pandas as pd

        if use_real_codec:
            decoder = _try_real_decoder()
            raise NotImplementedError(
                "real codec path not wired in this container"
                if decoder is not None
                else "no image/audio codec library available"
            )
        for pdf in batches:
            out = []
            for mid, kind, payload in zip(pdf["media_id"], pdf["kind"], pdf["payload"]):
                d = _decode_stub(bytes(payload), kind)
                out.append(
                    {
                        "media_id": int(mid),
                        "kind": kind,
                        "width": d["width"],
                        "height": d["height"],
                        "n_frames": d["n_frames"],
                        "feature": d["feature"],
                    }
                )
            yield pd.DataFrame(
                out,
                columns=["media_id", "kind", "width", "height", "n_frames", "feature"],
            )

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 8) -> DataFrame:
    """video -> (media_id, frame_idx): deterministic frame sampling plan
    (indices only; frame decode itself is the stubbed codec step). A
    frame-less payload (n_frames null or 0 — e.g. an empty container)
    yields no rows instead of crashing the query on an illegal
    sequence(0, -1) bound."""
    feats = decode_features(media.filter(F.col("kind") == "video"))
    idx = F.when(
        F.col("n_frames") >= 1,
        F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n)),
    ).otherwise(F.array().cast("array<int>"))
    return feats.select("media_id", F.explode(idx).alias("frame_idx"))


def synth_png(width: int, height: int, trailer: bytes = b"") -> bytes:
    """Minimal deterministic PNG: signature + IHDR(w, h) + opaque tail."""
    ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"
    return (
        PNG_MAGIC + struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + trailer
    )


def synth_wav(n_samples: int, channels: int = 2, bits: int = 16) -> bytes:
    """Minimal deterministic PCM WAV: RIFF + fmt + zeroed data chunk."""
    block_align = channels * bits // 8
    data = b"\x00" * (n_samples * block_align)
    fmt = struct.pack("<HHIIHH", 1, channels, 44_100,
                      44_100 * block_align, block_align, bits)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def synth_gif(width: int, height: int, n_frames: int = 1) -> bytes:
    """Minimal deterministic GIF89a: logical screen descriptor (no global
    color table), then per frame a graphic-control extension + image
    descriptor (no local table) + a tiny LZW data sub-block, trailer."""
    out = b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"
    for _ in range(n_frames):
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"  # GCE: 4-byte block + term
        out += b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
        out += b"\x02\x02\x4c\x01\x00"  # LZW min code 2, one 2-byte sub-block
    return out + b"\x3b"


def synth_jpeg(width: int, height: int) -> bytes:
    """Minimal deterministic JFIF JPEG: SOI + APP0(JFIF 1.1) + SOF0
    (baseline, 3 components) + EOI. Canonical fixed layout — SOI(2)
    APP0(2+16) puts the SOF0 marker at byte offset 20, so height/width
    sit at the constant 1-based byte positions 26/28 the in-query SQL
    recheck and the DuckDB oracle read (same device as the WAV/MP4
    fixtures); the Python decoder walks the markers for real."""
    app0 = (
        struct.pack(">H", 16) + b"JFIF\x00" + b"\x01\x01" + b"\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    sof0 = (
        struct.pack(">H", 17) + b"\x08" + struct.pack(">HH", height, width)
        + b"\x03" + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
    )
    return b"\xff\xd8" + b"\xff\xe0" + app0 + b"\xff\xc0" + sof0 + b"\xff\xd9"


def synth_bmp(width: int, height: int) -> bytes:
    """Minimal deterministic BMP: BITMAPFILEHEADER + BITMAPINFOHEADER
    (pixel data omitted — header-only fixture, like the PNG)."""
    info = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24, 0, 0, 0, 0, 0, 0)
    return b"BM" + struct.pack("<IHHI", 14 + 40, 0, 0, 14 + 40) + info


_MP4_MATRIX = struct.pack(
    ">9i", 0x1_0000, 0, 0, 0, 0x1_0000, 0, 0, 0, 0x4000_0000
)


def synth_mp4(width: int, height: int, n_frames: int) -> bytes:
    """Minimal deterministic MP4 (ISO-BMFF): ftyp, then moov{mvhd,
    trak{tkhd, mdia{hdlr('vide'), minf{stbl{stsz}}}}} with spec-sized v0
    boxes — tkhd carries width/height as 16.16 fixed point, stsz carries
    the sample (frame) count with a constant sample_size so no per-sample
    table follows. Canonical fixed layout: every box at a deterministic
    offset, which is what lets the in-query SQL recheck read the fields
    at constant positions (same device as the WAV fixture)."""

    def box(btype: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", 8 + len(payload)) + btype + payload

    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 0x200))
    mvhd = box(
        b"mvhd",
        b"\x00\x00\x00\x00" + struct.pack(">IIII", 0, 0, 600, 600)
        + struct.pack(">ih", 0x1_0000, 0x100) + b"\x00" * 10
        + _MP4_MATRIX + b"\x00" * 24 + struct.pack(">I", 2),
    )
    tkhd = box(
        b"tkhd",
        b"\x00\x00\x00\x07" + struct.pack(">IIIII", 0, 0, 1, 0, 600)
        + b"\x00" * 8 + struct.pack(">hhhh", 0, 0, 0, 0) + _MP4_MATRIX
        + struct.pack(">II", width << 16, height << 16),
    )
    hdlr = box(
        b"hdlr", b"\x00" * 4 + b"\x00" * 4 + b"vide" + b"\x00" * 12 + b"\x00"
    )
    stsz = box(b"stsz", b"\x00" * 4 + struct.pack(">II", 1, n_frames))
    mdia = box(b"mdia", hdlr + box(b"minf", box(b"stbl", stsz)))
    return ftyp + box(b"moov", mvhd + box(b"trak", tkhd + mdia))


def synth_media_rows(n: int = 64, seed: int = 42) -> list[tuple]:
    """Deterministic media fixture rows (media_id, kind, payload, mime):
    even images alternate REAL PNG and REAL BMP headers, half the odd
    images are REAL JFIF JPEGs (marker-walked), every other audio is
    a REAL WAV (RIFF-parsed), every other video alternates a REAL
    multi-frame GIF (block-walked) and a REAL MP4 (ISO-BMFF box tree);
    the rest stay opaque fakes so the md5 stub lane is exercised too.
    Shared by synth_media_df and the DuckDB oracle renderer
    (oracles._multimodal_sql inlines these payloads as hex)."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        opaque = hashlib.md5(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        if kind == "image" and i % 2 == 0:
            if i % 4 == 0:
                payload, mime = synth_png(32 + i, 16 + i, trailer=opaque), "image/png"
            else:
                payload, mime = synth_bmp(24 + i, 12 + i), "image/bmp"
        elif kind == "image" and i % 4 == 1:
            payload, mime = synth_jpeg(31 + i, 17 + i), "image/jpeg"
        elif kind == "audio" and i % 2 == 1:
            payload, mime = synth_wav(100 + i * 7), "audio/wav"
        elif kind == "video" and i % 2 == 0:
            if i % 4 == 0:
                payload, mime = (
                    synth_gif(48 + i, 27 + i, n_frames=2 + i % 5),
                    "image/gif",
                )
            else:
                payload, mime = (
                    synth_mp4(320 + i, 180 + i, n_frames=10 + i % 17),
                    "video/mp4",
                )
        else:
            payload, mime = opaque, f"{kind}/x-fake"
        rows.append((i, kind, payload, mime))
    return rows


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    from ..session import local_df

    return local_df(
        spark,
        synth_media_rows(n, seed),
        "media_id long, kind string, payload binary, mime string",
    )
