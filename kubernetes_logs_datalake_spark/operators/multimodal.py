"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed in Arrow-batched Python.

The Spark-side architecture is real and tested — schema, partitioning,
``mapInPandas`` batch shape, deterministic outputs. The actual media
decode is STUBBED (``decode_image`` raises ``NotImplementedError`` or
produces a deterministic fake): the image/audio libraries are not in
this environment. Swapping in PIL/torchaudio later changes only the
body of the decode functions, not the distributed plumbing.

At 100 TB of media this is the shape that works: binary payloads stay
columnar in parquet, batches stream through Arrow into Python (never
row-at-a-time), and heavy decode parallelizes per input split.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("width", T.IntegerType()),
                    T.StructField("height", T.IntegerType()),
                    T.StructField("duration_ms", T.IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 16

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
        T.StructField("decoded_ok", T.BooleanType()),
    ]
)


def _fake_decode(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real decoder: derive FEATURE_DIM
    floats from the payload digest. Replace with a real
    decode→resize→embed pipeline when media libs are available."""
    digest = hashlib.sha256(payload or b"").digest()
    return [b / 255.0 for b in digest[:FEATURE_DIM]]


def decode_image(payload: bytes):  # pragma: no cover - intentional stub
    """Real image decode (PIL) — unavailable in this environment."""
    raise NotImplementedError("image decode requires PIL/opencv; use extract_features' fake path")


def extract_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """payload binary → fixed-dim float feature vector, via mapInPandas.

    Arrow streams batches of (media_id, payload) into Python; each batch
    is processed vectorized and yields (media_id, feature,
    decoded_ok). Column pruning applies — only the two needed columns
    cross the language boundary.
    """
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "feature": feats,
                    "decoded_ok": [True] * len(pdf),
                }
            )

    return df.select("media_id", "payload").mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plumbing: one output row per sampled frame
    timestamp (decode stubbed). Demonstrates the explode shape: a 2-hour
    video at 1 fps becomes 7200 rows without materializing frames until
    the decode stage."""
    from pyspark.sql import functions as F

    n_frames = (F.coalesce(F.col("meta.duration_ms"), F.lit(0)) / every_ms).cast("int")
    return df.select(
        "media_id",
        F.explode(F.sequence(F.lit(0), F.greatest(n_frames - 1, F.lit(0)))).alias("frame_idx"),
    ).withColumn("frame_ts_ms", F.col("frame_idx") * every_ms)
