"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side contract (schema, partitioning, UDF signatures, Arrow batch
shape) is real and tested; the actual codec work (JPEG decode, resampling)
is STUBBED behind an import-try — the container ships no image/audio
libraries, so when PIL/soundfile are absent each stub produces a
DETERMINISTIC FAKE (seeded from the content digest) with the same schema,
keeping every downstream operator exercisable.
"""

from __future__ import annotations

import hashlib
from typing import Iterator, Optional

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_type", StringType()),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("format", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("channels", IntegerType()),
        StructField("decode_ok", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)

_FEATURE_DIM = 64


def _have_pil() -> bool:
    try:
        import PIL.Image  # noqa: F401

        return True
    except ImportError:
        return False


def _fake_decode(content: bytes) -> tuple[int, int, int, np.ndarray]:
    """Deterministic fake decode: dimensions + feature vector seeded from
    the content digest. Marks the stub path — replace with PIL/libav when
    the cluster image ships them."""
    dig = hashlib.blake2b(content or b"", digest_size=32).digest()
    w = 16 + dig[0] % 64
    h = 16 + dig[1] % 64
    c = 3
    rng = np.random.RandomState(int.from_bytes(dig[2:6], "little"))
    feats = rng.randn(_FEATURE_DIM).astype(np.float32)
    return w, h, c, feats


def decode_features_fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas: media rows → decoded metadata + feature vector.

    Real path (PIL present): open → size → 8x8 grayscale thumbnail as the
    feature vector. Stub path: deterministic fake with identical schema."""
    use_pil = _have_pil()
    for pdf in batches:
        rows = {
            "media_ref": [],
            "media_type": [],
            "width": [],
            "height": [],
            "channels": [],
            "decode_ok": [],
            "features": [],
        }
        for i in range(len(pdf)):
            ref = pdf["media_ref"].iloc[i]
            mtype = pdf["media_type"].iloc[i]
            content = pdf["content"].iloc[i]
            if use_pil and mtype == "image":
                try:
                    import io

                    import PIL.Image

                    img = PIL.Image.open(io.BytesIO(content))
                    w, h = img.size
                    thumb = np.asarray(
                        img.convert("L").resize((8, 8)), dtype=np.float32
                    ).ravel()
                    rows["width"].append(w)
                    rows["height"].append(h)
                    rows["channels"].append(len(img.getbands()))
                    rows["decode_ok"].append(1)
                    rows["features"].append(thumb)
                except Exception:
                    rows["width"].append(None)
                    rows["height"].append(None)
                    rows["channels"].append(None)
                    rows["decode_ok"].append(0)
                    rows["features"].append(None)
            else:
                w, h, c, feats = _fake_decode(content)
                rows["width"].append(w)
                rows["height"].append(h)
                rows["channels"].append(c)
                rows["decode_ok"].append(1)
                rows["features"].append(feats)
            rows["media_ref"].append(ref)
            rows["media_type"].append(mtype)
        yield pd.DataFrame(rows)


def decode_features_df(media: DataFrame) -> DataFrame:
    """media(MEDIA_SCHEMA) → DECODED_SCHEMA, partition-parallel.
    Repartitions by media_ref hash first so giant binaries spread out."""
    return media.repartition(
        media.sparkSession.sparkContext.defaultParallelism, "media_ref"
    ).mapInPandas(decode_features_fn, schema=DECODED_SCHEMA)


RESIZED_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("thumb", BinaryType()),  # row-major grayscale bytes
    ]
)


def make_resize_fn(target: int = 32):
    """mapInPandas: image rows → fixed-size thumbnails.

    Real path uses PIL when available; stub path emits a deterministic
    target×target grayscale buffer derived from the content digest, so the
    Spark plumbing (schema, batch shape, binary output) is fully exercised
    without image libraries."""
    use_pil = _have_pil()

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_ref": [], "width": [], "height": [], "thumb": []}
            for i in range(len(pdf)):
                content = pdf["content"].iloc[i]
                rows["media_ref"].append(pdf["media_ref"].iloc[i])
                if use_pil:
                    try:
                        import io

                        import PIL.Image

                        img = PIL.Image.open(io.BytesIO(content)).convert("L")
                        img = img.resize((target, target))
                        rows["width"].append(target)
                        rows["height"].append(target)
                        rows["thumb"].append(img.tobytes())
                        continue
                    except Exception:
                        pass
                dig = hashlib.blake2b(content or b"", digest_size=32).digest()
                rng = np.random.RandomState(int.from_bytes(dig[:4], "little"))
                rows["width"].append(target)
                rows["height"].append(target)
                rows["thumb"].append(
                    rng.randint(0, 256, size=target * target, dtype=np.uint8).tobytes()
                )
            yield pd.DataFrame(rows)

    return fn


FRAMES_SCHEMA = StructType(
    [
        StructField("media_ref", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_ms", IntegerType()),
        StructField("features", ArrayType(FloatType())),
    ]
)


def make_frame_sample_fn(n_frames: int = 4, fps_ms: int = 1000):
    """mapInPandas: video rows → n_frames sampled frame-feature rows each
    (1 input row → N output rows, the frame-explosion shape). The decoder
    is STUBBED (no libav in this container): frame features are
    deterministic from (content digest, frame index); timestamps follow
    the sampling grid."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {"media_ref": [], "frame_idx": [], "ts_ms": [], "features": []}
            for i in range(len(pdf)):
                ref = pdf["media_ref"].iloc[i]
                content = pdf["content"].iloc[i]
                dig = hashlib.blake2b(content or b"", digest_size=32).digest()
                for f in range(n_frames):
                    rng = np.random.RandomState(
                        int.from_bytes(dig[:4], "little") + f
                    )
                    rows["media_ref"].append(ref)
                    rows["frame_idx"].append(f)
                    rows["ts_ms"].append(f * fps_ms)
                    rows["features"].append(rng.randn(_FEATURE_DIM).astype(np.float32))
            yield pd.DataFrame(rows)

    return fn


def resize_images_df(media: DataFrame, target: int = 32) -> DataFrame:
    return media.filter(F.col("media_type") == "image").mapInPandas(
        make_resize_fn(target), schema=RESIZED_SCHEMA
    )


def frame_sample_df(media: DataFrame, n_frames: int = 4) -> DataFrame:
    return media.filter(F.col("media_type") == "video").mapInPandas(
        make_frame_sample_fn(n_frames), schema=FRAMES_SCHEMA
    )


def synth_media_df(spark, docs_extracted: DataFrame) -> DataFrame:
    """Build a media table from extracted media spans: deterministic binary
    payload per media_ref (content = blake2b-keyed bytes) — the dev-scale
    stand-in for fetching blobs from object storage."""
    refs = (
        docs_extracted.filter(F.col("kind") == "media")
        .select("media_ref")
        .where(F.col("media_ref").isNotNull())
        .distinct()
    )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            content = [
                hashlib.blake2b((r or "").encode(), digest_size=32).digest() * 8
                for r in pdf["media_ref"]
            ]
            ext = [(r or "").rsplit(".", 1)[-1].lower() if "." in (r or "") else "" for r in pdf["media_ref"]]
            mtype = [
                "image"
                if e in ("jpg", "jpeg", "png", "gif", "webp")
                else ("video" if e in ("mp4", "webm") else "other")
                for e in ext
            ]
            yield pd.DataFrame(
                {
                    "media_ref": pdf["media_ref"],
                    "media_type": mtype,
                    "content": content,
                    "format": ext,
                    "width": [None] * n,
                    "height": [None] * n,
                    "duration_ms": [None] * n,
                }
            )

    return refs.mapInPandas(gen, schema=MEDIA_SCHEMA)
