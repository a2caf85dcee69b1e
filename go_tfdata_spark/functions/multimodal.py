"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

The reference ships real image codecs on its typed rows (AddImage PNG
encode, GetImage JPEG/PNG/GIF decode — tfdata/core/example.go:131-146).
This container has no image/audio libraries, so the DECODE step is stubbed
(deterministic fake or NotImplementedError), but the Spark-side plumbing —
schema, Arrow batch shape, mapInPandas partitioning — is real and tested:
swapping the stub for PIL/torchaudio changes one function body, not the
pipeline.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# media row: opaque payload + typed metadata (FIXTURES-style open schema)
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), False),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)

HAVE_PIL = False
try:  # pragma: no cover - not present in this container
    import PIL.Image  # noqa: F401

    HAVE_PIL = True
except Exception:
    pass


def _fake_decode(payload: bytes) -> np.ndarray:
    """Deterministic stand-in for an image decoder: derive an 8x8 'pixel'
    grid from the payload bytes. Replace with PIL decode when available."""
    if payload is None:
        payload = b""
    arr = np.frombuffer((payload * (64 // max(len(payload), 1) + 1))[:64], dtype=np.uint8)
    return arr.reshape(8, 8).astype(np.float32) / 255.0


def decode_and_featurize(df: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """mapInPandas stage: binary payload -> (dims, n_bytes, 16-dim feature).

    Real plumbing: Arrow batches of binary columns in, typed struct rows
    out; runs fully parallel per input partition, no driver involvement.
    The decode itself is the stub (`_fake_decode`); with PIL installed it
    would decode real images (NotImplementedError path kept explicit)."""

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if HAVE_PIL:  # pragma: no cover
                raise NotImplementedError("real decoder not wired in this sandbox")
            grids = [_fake_decode(p) for p in pdf["payload"]]
            feats = [g.mean(axis=0).tolist() + g.mean(axis=1).tolist() for g in grids]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": [g.shape[1] for g in grids],
                    "height": [g.shape[0] for g in grids],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return df.mapInPandas(_featurize, FEATURE_SCHEMA)


def frame_sample(df: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: explode a synthetic frame index from
    metadata (`meta['n_frames']`), keep every nth — the decode of each
    frame would plug into `decode_and_featurize`."""
    n_frames = F.coalesce(F.element_at("meta", F.lit("n_frames")).cast("int"), F.lit(0))
    return (
        df.filter(F.col("kind") == "video")
        .withColumn("frame_idx", F.explode(F.sequence(F.lit(0), n_frames - 1)))
        .filter(F.pmod(F.col("frame_idx"), F.lit(every_nth)) == 0)
    )


def synthetic_media(spark, n: int = 100, seed: int = 3) -> DataFrame:
    """Deterministic fake media table (payload = md5-derived bytes)."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.element_at(
            F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
            (F.pmod(F.xxhash64("id", F.lit(seed)), F.lit(3)) + 1).cast("int"),
        ).alias("kind"),
        F.unhex(F.md5(F.concat(F.lit("m"), F.col("id").cast("string")))).alias("payload"),
        F.create_map(
            F.lit("n_frames"), (F.pmod(F.xxhash64("id", F.lit(seed + 1)), F.lit(50)) + 1).cast("string")
        ).alias("meta"),
    )
