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


def _decode_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode: dimensions and a FEATURE_DIM-float
    feature vector derived from md5(payload). Marked stub — replace with
    the real codec via _try_real_decoder()."""
    h = hashlib.md5(payload).digest()
    w = 64 + h[0] % 192
    ht = 64 + h[1] % 192
    frames = 1 if kind == "image" else 1 + h[2] % 32
    feats = []
    for i in range(FEATURE_DIM):
        hh = hashlib.md5(payload + bytes([i])).digest()
        (u,) = struct.unpack("<I", hh[:4])
        feats.append((u / 2**32) * 2.0 - 1.0)
    return {"width": w, "height": ht, "n_frames": frames, "feature": feats}


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
    (indices only; frame decode itself is the stubbed codec step)."""
    feats = decode_features(media.filter(F.col("kind") == "video"))
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )


def synth_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic opaque media fixtures (binary payloads + metadata)."""
    kinds = ["image", "audio", "video"]
    from ..session import local_df

    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.md5(f"{seed}:{i}".encode()).digest() * (4 + i % 7)
        rows.append((i, kind, payload, f"{kind}/x-fake"))
    return local_df(
        spark, rows, "media_id long, kind string, payload binary, mime string"
    )
